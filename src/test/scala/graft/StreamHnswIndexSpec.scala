package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamHnswIndex
import graft.vectors.Vectors

/** Incremental HNSW maintenance: exact search-equality with the batch
  * index over random ingest splits (the graph is a deterministic
  * function of the corpus set — maintenance must reproduce it, not
  * approximate it), replay idempotence, and immediate searchability.
  */
class StreamHnswIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val queries = emb.filter($"vec_id" < 8)

  /** Fixed ladder — must match the batch call's `planes` (the session
    * pins what the batch operator's autoPlanes would re-size).
    */
  private val P = 3

  private def newSession() = new StreamHnswIndex.HnswIndexSession(
    spark, "vec_id", "embedding", dim = 64, planesPerLayer = Seq(P, P, P))

  test("incremental build over random splits searches EXACTLY like the batch index") {
    implicit val sqlCtx = spark.sqlContext
    val s = newSession()
    val rows = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val rnd = new scala.util.Random(7)
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = s.start(stream.toDS().toDF("vec_id", "embedding"))
    rows.groupBy(_ => rnd.nextInt(5)).values.foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val inc = s.search(queries, k = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val batch = Vectors.hnswTopK(emb, queries, "vec_id", "embedding",
        k = 3, dim = 64, planes = P)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(inc == batch)
    assert(inc.nonEmpty)
  }

  test("redelivery grows nothing and changes no edges") {
    val s = newSession()
    val b1 = emb.filter($"vec_id" < 30)
    s.ingest(b1)
    val n0 = s.index.count()
    val e0 = s.edges(0).count()
    s.ingest(b1) // full redelivery
    assert(s.index.count() == n0)
    assert(s.edges(0).count() == e0)
    assert(e0 > 0)
  }

  test("a new near-duplicate becomes the top hit immediately after its batch") {
    val s = newSession()
    s.ingest(emb.filter($"vec_id" >= 8 && $"vec_id" < 50))
    val qv = queries.orderBy($"vec_id").select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().head
    val twin = qv.updated(0, qv.head + 0.001)
    s.ingest(Seq((999L, twin)).toDF("vec_id", "embedding"))
    val hit = s.search(queries.limit(1), k = 3)
      .as[(Long, Int, Long, Double)].collect().find(_._2 == 1)
    assert(hit.map(_._3).contains(999L))
  }
}
