package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamContamination
import graft.textops.CurationOps

/** Streaming contamination scoring: the static-benchmark stateless
  * stream equals the batch operator row-for-row over RANDOMIZED
  * micro-batch splits (the funnel-twin convention), the growing-
  * benchmark foreachBatch runner scores each batch against the
  * benchmark as of that batch, and the benchmark state is mergeable
  * (idempotent + order-insensitive).
  */
class StreamContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  private def docsDF(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def mkDocs(seed: Int, count: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1L to count.toLong).map { i =>
      val len = 3 + rnd.nextInt(8)
      (i, Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  private def batchScores(docs: Seq[(Long, String)],
      bench: DataFrame): Map[Long, (Long, Long, Double)] =
    CurationOps.contaminationScore(docsDF(docs), bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("scoreStream equals batch contaminationScore over randomized splits") {
    implicit val sqlCtx = spark.sqlContext
    val bench = docsDF(Seq(
      (100L, "alpha bravo charlie delta"),
      (101L, "echo foxtrot golf hotel india")))
    // degenerate shapes ride along: empty text and a below-n two-word
    // doc (single whole-text shingle)
    val docs = mkDocs(seed = 7, count = 40) ++
      Seq((900L, ""), (901L, "alpha bravo"))
    val rnd = new scala.util.Random(13)
    val batches = docs.groupBy(_ => rnd.nextInt(4)).values.toSeq

    val stream = MemoryStream[(Long, String)]
    val name = s"contam_${System.nanoTime()}"
    val q = StreamContamination.scoreStream(
        stream.toDS().toDF("doc_id", "text"), bench, "doc_id", "text", n = 3)
      .writeStream.format("memory").queryName(name).start()
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    val streamed = spark.table(name)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    q.stop()

    val batch = batchScores(docs, bench)
    assert(streamed == batch)
    assert(!streamed.contains(900L)) // zero-shingle doc dropped, like explode
    assert(streamed.contains(901L)) // below-n doc scores via its whole-text shingle
    assert(streamed.values.exists(_._3 > 0.0), "fixture must exercise real overlap")
  }

  test("runScoring scores each micro-batch against the benchmark as of that batch") {
    implicit val sqlCtx = spark.sqlContext
    val bench0 = docsDF(Seq((100L, "alpha bravo charlie delta")))
    val delta = docsDF(Seq((101L, "echo foxtrot golf hotel")))
    val docs1 = Seq((1L, "alpha bravo charlie delta echo"),
      (2L, "echo foxtrot golf hotel india"))
    val docs2 = Seq((3L, "alpha bravo charlie delta echo"),
      (4L, "echo foxtrot golf hotel india"))

    var state = StreamContamination.benchmarkHashes(bench0, "text", n = 3)
    val emitted = scala.collection.mutable.Map.empty[Long, Map[Long, (Long, Long, Double)]]
    val stream = MemoryStream[(Long, String)]
    val q = StreamContamination.runScoring(
        stream.toDS().toDF("doc_id", "text"), () => state, "doc_id", "text", n = 3) {
      (scored, batchId) =>
        val rows = scored.as[(Long, Long, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        if (rows.nonEmpty) emitted(batchId) = rows
    }
    stream.addData(docs1: _*); q.processAllAvailable()
    state = StreamContamination.mergeBenchmark(state, delta, "text", n = 3)
    stream.addData(docs2: _*); q.processAllAvailable()
    q.stop()

    val byBatch = emitted.toSeq.sortBy(_._1).map(_._2)
    assert(byBatch.size == 2)
    assert(byBatch(0) == batchScores(docs1, bench0))
    assert(byBatch(1) == batchScores(docs2, bench0.union(delta)))
    // doc 2 (eval overlap only with the late-registered set) scores 0
    // before the merge and doc 4 scores > 0 after it — the growth is
    // actually observed, not vacuously equal
    assert(byBatch(0)(2L)._2 == 0L && byBatch(1)(4L)._2 > 0L)
  }

  test("mergeBenchmark is idempotent and order-insensitive") {
    val a = docsDF(Seq((1L, "alpha bravo charlie delta")))
    val b = docsDF(Seq((2L, "echo foxtrot golf hotel")))
    def hs(df: DataFrame): Set[Long] = df.as[Long].collect().toSet
    val base = StreamContamination.benchmarkHashes(a, "text", n = 3)
    val once = StreamContamination.mergeBenchmark(base, b, "text", n = 3)
    val twice = StreamContamination.mergeBenchmark(once, b, "text", n = 3)
    assert(hs(once) == hs(twice))
    val ba = StreamContamination.mergeBenchmark(
      StreamContamination.benchmarkHashes(b, "text", n = 3), a, "text", n = 3)
    assert(hs(once) == hs(ba))
  }
}
