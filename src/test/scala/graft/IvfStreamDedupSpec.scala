package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamDedup
import graft.vectors.Vectors

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivfTopK: deterministic, well-formed, recall beats hyperplane LSH here") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Vectors.ivfTopK(emb, queries, "vec_id", "embedding", 3,
      nCentroids = 8, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect()
    // shape: ≤3 per query, contiguous ranks, no self-matches
    val byQ = ivf.groupBy(_._1)
    assert(byQ.size == 8)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      rs.foreach { case (_, _, n) => assert(n != q) }
    }
    val ivfPairs = ivf.map(r => (r._1, r._3)).toSet
    val recall = ivfPairs.intersect(brute).size.toDouble / brute.size
    info(f"IVF recall@3 = $recall%.2f (probing 4/8 cells)")
    assert(recall >= 0.5, s"recall=$recall") // probing half the cells
    // determinism
    val again = Vectors.ivfTopK(emb, queries, "vec_id", "embedding", 3,
      nCentroids = 8, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect()
    assert(again.toSet == ivf.toSet)
  }

  test("ivfTopK with nProbe = nCentroids equals brute force") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(200)
    val queries = emb.filter($"vec_id" < 4)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val ivf = Vectors.ivfTopK(emb, queries, "vec_id", "embedding", 3,
      nCentroids = 4, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == brute)
  }
}

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  // offset well past epoch 0: a row whose event time equals the initial
  // watermark (epoch 0) is considered late and silently dropped
  private def ts(s: Long) = new java.sql.Timestamp((1700000000L + s) * 1000)

  test("streaming dedup keeps first occurrence within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = stream.toDS().toDF("ts", "doc_id", "text")
    val deduped = StreamDedup.dedupStream(df, "text", "ts", horizon = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1
    stream.addData((ts(0), 1L, "alpha content"), (ts(10), 2L, "beta content"))
    q.processAllAvailable()
    // batch 2: doc 3 duplicates doc 1's content across batches → dropped
    stream.addData((ts(20), 3L, "alpha content"), (ts(30), 4L, "gamma content"))
    q.processAllAvailable()
    val ids = spark.sql("SELECT doc_id FROM dedup_out").as[Long].collect().sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 4L))
  }
}
