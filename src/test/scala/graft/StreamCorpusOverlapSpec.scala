package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamCorpusOverlap
import graft.textops.CurationOps

/** Streaming KMV corpus-overlap: the maintained sketch's estimate must
  * equal the batch operator EXACTLY (the bottom-k membership property),
  * regardless of how ingest is micro-batched.
  */
class StreamCorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  private val K = 128
  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
  private lazy val corpusA = docs.filter($"doc_id" % 2 === 0)
  private lazy val corpusB = docs.filter($"doc_id" % 2 === 1)

  private def batchRow() = {
    val r = CurationOps.corpusOverlapKmv(corpusA, corpusB, "text", k = K)
      .collect().head
    (r.getAs[Long]("sketch_size"), r.getAs[Long]("kth_min"),
      r.getAs[Long]("n_both"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Double]("est_jaccard"), r.getAs[Double]("est_contain_a"),
      r.getAs[Double]("est_contain_b"), r.getAs[Double]("est_union"))
  }

  test("streamed sketch over random splits equals the batch operator exactly") {
    implicit val sqlCtx = spark.sqlContext
    val session = new StreamCorpusOverlap.OverlapSession("text", K)
    val rows = corpusA.as[(Long, String)].collect().toSeq
    val rnd = new scala.util.Random(11)
    val stream = MemoryStream[(Long, String)]
    val q = session.start(stream.toDS().toDF("doc_id", "text"))
    rows.groupBy(_ => rnd.nextInt(4)).values.foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val ref = StreamCorpusOverlap.sketch(corpusB, "text", K)
    val e = session.overlapWith(ref)
    val b = batchRow()
    assert((e.sketchSize, e.kthMin, e.nBoth, e.nA, e.nB,
      e.estJaccard, e.estContainA, e.estContainB, e.estUnion) == b)
    assert(e.sketchSize == K)
    assert(e.nBoth > 0, "fixture corpora must overlap")
  }

  test("estimate before any ingest (or vs an empty reference) is defined, not NaN") {
    val e0 = StreamCorpusOverlap.estimate(Vector.empty, Vector.empty, K)
    assert(e0.sketchSize == 0L && e0.kthMin == 0L)
    assert(e0.estJaccard == 0.0 && e0.estContainA == 0.0 &&
      e0.estContainB == 0.0 && e0.estUnion == 0.0)
    // one-sided: reference empty → containment vs it is 0, jaccard 0
    val ka = StreamCorpusOverlap.sketch(corpusA, "text", K)
    val e1 = StreamCorpusOverlap.estimate(ka, Vector.empty, K)
    assert(e1.nA > 0L && e1.nB == 0L)
    assert(e1.estJaccard == 0.0 && e1.estContainB == 0.0)
    assert(!e1.estJaccard.isNaN && !e1.estContainA.isNaN)
  }

  test("durable sketch: restart + replay + auto-compaction all preserve exactness") {
    val path = java.nio.file.Files.createTempDirectory("kmv").toFile.getAbsolutePath
    val a = new StreamCorpusOverlap.DurableOverlapSession(
      spark, path, "text", K, compactEvery = 2)
    val rows = corpusA.as[(Long, String)].collect().toSeq
    val splits = rows.grouped((rows.size + 2) / 3).toSeq
    a.ingest(splits(0).toDF("doc_id", "text"), 0L)
    a.ingest(splits(1).toDF("doc_id", "text"), 1L) // triggers a fold
    // "restart": a fresh session over the same path
    val b = new StreamCorpusOverlap.DurableOverlapSession(
      spark, path, "text", K, compactEvery = 2)
    b.ingest(splits(2).toDF("doc_id", "text"), 2L)
    val ref = StreamCorpusOverlap.sketch(corpusB, "text", K)
    val e = b.overlapWith(ref)
    val batch = batchRow()
    assert((e.sketchSize, e.kthMin, e.nBoth, e.nA, e.nB,
      e.estJaccard, e.estContainA, e.estContainB, e.estUnion) == batch)
    // replay of the newest batch: identical directory, identical sketch
    val s0 = b.currentSketch
    b.ingest(splits(2).toDF("doc_id", "text"), 2L)
    assert(b.currentSketch == s0)
  }

  test("merge is idempotent and order-free; redelivery changes nothing") {
    val sa = StreamCorpusOverlap.sketch(corpusA, "text", K)
    val sb = StreamCorpusOverlap.sketch(corpusB, "text", K)
    assert(StreamCorpusOverlap.merge(sa, sa, K) == sa)
    assert(StreamCorpusOverlap.merge(sa, sb, K) ==
      StreamCorpusOverlap.merge(sb, sa, K))
    val session = new StreamCorpusOverlap.OverlapSession("text", K)
    session.ingest(corpusA)
    val s0 = session.currentSketch
    session.ingest(corpusA.limit(20)) // redelivery subset
    assert(session.currentSketch == s0)
  }
}
