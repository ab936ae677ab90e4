package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamVectorIndex
import graft.vectors.Vectors

/** Incremental IVF index: split-independence of the build, exact
  * search at full probe (≡ bruteTopK), immediate searchability of new
  * vectors, and replay-idempotent ingest.
  */
class StreamVectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val queries = emb.filter($"vec_id" < 8)
  private lazy val centers: Array[Array[Double]] =
    emb.filter($"vec_id" < 8).orderBy($"vec_id")
      .select($"embedding".cast("array<double>")).as[Seq[Double]]
      .collect().map(_.toArray)

  private def newSession() =
    new StreamVectorIndex.IvfIndexSession(spark, "vec_id", "embedding", centers)

  test("incremental build over random splits equals the one-shot index") {
    implicit val sqlCtx = spark.sqlContext
    val one = newSession()
    one.ingest(emb)
    val inc = newSession()
    val rows = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val rnd = new scala.util.Random(31)
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = inc.start(stream.toDS().toDF("vec_id", "embedding"))
    rows.groupBy(_ => rnd.nextInt(4)).values.foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    def cells(s: StreamVectorIndex.IvfIndexSession) =
      s.index.select($"cell", $"id").as[(Int, String)].collect().toSet
    assert(cells(inc) == cells(one))
    def top(s: StreamVectorIndex.IvfIndexSession) =
      s.search(queries, k = 3, nProbe = 4)
        .as[(String, Int, String, Double)].collect().toSet
    assert(top(inc) == top(one))
  }

  test("full probe equals brute force exactly") {
    val s = newSession()
    s.ingest(emb)
    val got = s.search(queries, k = 3, nProbe = centers.length)
      .as[(String, Int, String, Double)].collect().toSet
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1.toString, r._2, r._3.toString, r._4)).toSet
    assert(got == brute)
  }

  test("new vectors are searchable the moment their batch commits; replay grows nothing") {
    implicit val sqlCtx = spark.sqlContext
    val s = newSession()
    val base = emb.filter($"vec_id" >= 8 && $"vec_id" < 50)
    s.ingest(base)
    val q0 = queries.limit(1)
    val before = s.search(q0, k = 5, nProbe = centers.length)
      .select($"neighbor_id").as[String].collect().toSet
    // a near-duplicate of query 0 arrives: it must become the top hit
    val qv = queries.orderBy($"vec_id").select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().head
    val twin = qv.updated(0, qv.head + 0.001)
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = s.start(stream.toDS().toDF("vec_id", "embedding"))
    stream.addData((999L, twin)); q.processAllAvailable()
    val after = s.search(q0, k = 5, nProbe = centers.length)
      .as[(String, Int, String, Double)].collect()
    assert(!before.contains("999"))
    assert(after.find(_._2 == 1).map(_._3).contains("999"))
    val countAfter = s.index.count()
    stream.addData((999L, twin)); q.processAllAvailable() // redelivery
    q.stop()
    assert(s.index.count() == countAfter)
  }

  test("durable index: contents survive a session RESTART, replay commits are idempotent, " +
       "search equals the in-memory session") {
    val base = java.nio.file.Files.createTempDirectory("durable-ivf").toString
    def newDurable() = new StreamVectorIndex.DurableIvfIndexSession(
      spark, s"$base/index", "vec_id", "embedding", centers)
    val b1 = emb.filter($"vec_id" >= 8 && $"vec_id" < 30)
    val b2 = emb.filter($"vec_id" >= 30 && $"vec_id" < 50)
    newDurable().ingest(b1, 0L)
    // restart: NEW session object, same path — batch 1 must see batch
    // 0's ids from DISK
    val s2 = newDurable()
    assert(s2.index.count() == b1.count())
    s2.ingest(b2.unionByName(b1.limit(3)), 1L) // 3 redelivered ids
    assert(s2.index.count() == b1.count() + b2.count()) // redelivered ids kept once
    // replay batch 1 wholesale: its own directory is excluded on read,
    // the recommit reproduces it — index unchanged
    s2.ingest(b2.unionByName(b1.limit(3)), 1L)
    assert(s2.index.count() == b1.count() + b2.count())
    // search over the committed table equals the in-memory session
    val mem = newSession()
    mem.ingest(b1.unionByName(b2))
    def top(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Int, String, Double)].collect().toSet
    assert(top(s2.search(queries, k = 3, nProbe = centers.length)) ==
      top(mem.search(queries, k = 3, nProbe = centers.length)))
  }

  test("upsert re-points an id's vector, delete removes it — in-memory session") {
    val s = newSession()
    val base = emb.filter($"vec_id" >= 8 && $"vec_id" < 40)
    s.ingest(base)
    val qv = queries.orderBy($"vec_id").select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().head
    val twin = qv.updated(0, qv.head + 0.001)
    val far = qv.map(x => -x)
    val q0 = queries.limit(1)
    s.ingest(Seq((999L, far)).toDF("vec_id", "embedding"))
    val n0 = s.index.count()
    // upsert replaces 999's vector without growing the index
    s.upsert(Seq((999L, twin)).toDF("vec_id", "embedding"))
    assert(s.index.count() === n0)
    val top1 = s.search(q0, k = 5, nProbe = centers.length)
      .filter($"rank" === 1).select($"neighbor_id").as[String].collect().head
    assert(top1 === "999")
    // delete removes it from index and results
    s.delete(Seq("999"))
    assert(s.index.filter($"id" === "999").count() === 0L)
    val ids = s.search(q0, k = 5, nProbe = centers.length)
      .select($"neighbor_id").as[String].collect().toSet
    assert(!ids.contains("999"))
  }

  test("durable upsert/delete: newest version wins, tombstones survive restart and compaction") {
    val base = java.nio.file.Files.createTempDirectory("durable-ivf-ud").toString
    val path = s"$base/index"
    def newDurable() = new StreamVectorIndex.DurableIvfIndexSession(
      spark, path, "vec_id", "embedding", centers)
    val corpus = emb.filter($"vec_id" >= 8 && $"vec_id" < 40)
    val qv = queries.orderBy($"vec_id").select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().head
    val twin = qv.updated(0, qv.head + 0.001)
    val far = qv.map(x => -x)
    val q0 = queries.limit(1)
    val s = newDurable()
    s.ingest(corpus, 0L)
    s.ingest(Seq((999L, far)).toDF("vec_id", "embedding"), 1L)
    val n0 = s.index.count()
    s.upsert(Seq((999L, twin)).toDF("vec_id", "embedding"), 2L)
    assert(s.index.count() === n0) // out-versioned, not duplicated
    val top1 = s.search(q0, k = 5, nProbe = centers.length)
      .filter($"rank" === 1).select($"neighbor_id").as[String].collect().head
    assert(top1 === "999")
    s.delete(Seq("999"), 3L)
    assert(s.index.filter($"id" === "999").count() === 0L)
    // restart: tombstone resolution comes from disk
    val s2 = newDurable()
    assert(s2.index.filter($"id" === "999").count() === 0L)
    assert(s2.index.count() === corpus.count())
    // compaction (through the session's ledger-schema fold) concat-folds
    // dead versions without changing winners
    assert(s2.compact() > 0)
    assert(s2.index.count() === corpus.count())
    assert(s2.index.filter($"id" === "999").count() === 0L)
  }
}
