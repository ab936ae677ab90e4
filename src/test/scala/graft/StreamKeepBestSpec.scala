package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.StreamKeepBest
import graft.textops.CurationOps

/** Streamed ≡ batch for the keep-best dedup panel — EXACT (the winner
  * argmax is a total order, sizes are additive under the ids-arrive-
  * once contract).
  */
class StreamKeepBestSpec extends SparkSpec {
  import spark.implicits._

  // ~20 distinct contents with case/punct variants and varying quality
  private def docs(seed: Int, n: Int): Seq[(Long, String, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val c = rnd.nextInt(20)
      val body = s"content number $c words ${"pad " * rnd.nextInt(4)}".trim
      val text = if (rnd.nextBoolean()) body.toUpperCase + "!!!" else body
      (i.toLong, text, text.length.toLong)
    }
  }

  private def sortedRows(df: DataFrame) =
    df.orderBy("key").collect().toSeq

  test("in-memory session equals the batch panel under random batching") {
    val d = docs(31, 160)
    val batch = CurationOps.keepBestPanel(
      d.toDF("id", "text", "q"), "id", "text", "q")
    val session = new StreamKeepBest.KeepBestSession(spark, "id", "text", "q")
    val rnd = new scala.util.Random(7)
    d.groupBy(_ => rnd.nextInt(6)).values.foreach { b =>
      session.ingest(b.toDF("id", "text", "q"))
    }
    assert(sortedRows(session.currentPanel) === sortedRows(batch))
  }

  test("a later higher-quality variant SWAPS the survivor; a worse one does not") {
    val session = new StreamKeepBest.KeepBestSession(spark, "id", "text", "q")
    session.ingest(Seq((1L, "hello world", 11L)).toDF("id", "text", "q"))
    session.ingest(Seq((2L, "Hello, World!", 13L)).toDF("id", "text", "q"))
    val after = session.currentPanel.collect().head
    assert(after.getAs[Long]("win_id") == 2L && after.getAs[Long]("group_size") == 2L)
    session.ingest(Seq((3L, "HELLO WORLD", 5L)).toDF("id", "text", "q"))
    val last = session.currentPanel.collect().head
    assert(last.getAs[Long]("win_id") == 2L && last.getAs[Long]("group_size") == 3L)
  }

  test("durable session: restart, replay, compaction preserve the panel") {
    val dir = Files.createTempDirectory("keepbest_ledger").toString
    val d = docs(47, 120)
    val batches = d.grouped(40).toSeq
    def mk() = new StreamKeepBest.DurableKeepBestSession(
      spark, dir, "id", "text", "q")
    val s1 = mk()
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("id", "text", "q"), i.toLong)
    }
    val expect = sortedRows(CurationOps.keepBestPanel(
      d.toDF("id", "text", "q"), "id", "text", "q"))
    assert(sortedRows(s1.currentPanel) === expect)
    s1.ingest(batches.head.toDF("id", "text", "q"), 0L) // replay overwrites
    assert(sortedRows(s1.currentPanel) === expect)
    val s2 = mk() // restart from disk
    assert(sortedRows(s2.currentPanel) === expect)
    import org.apache.spark.sql.types._
    graft.streaming.DurableLedger.compact(spark, dir, StructType(Seq(
      StructField("key", StringType), StructField("win_id", LongType),
      StructField("win_quality", LongType), StructField("group_size", LongType))))
    assert(sortedRows(s2.currentPanel) === expect)
  }
}
