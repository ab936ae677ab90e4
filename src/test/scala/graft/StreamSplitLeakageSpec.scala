package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{DurableLedger, StreamSplitLeakage}
import graft.textops.CurationOps

/** Streamed ≡ batch for the split-leakage audit — EXACT (all columns
  * are integer counts), by count additivity: split assignment is a
  * pure (seed, group) hash every batch computes identically.
  */
class StreamSplitLeakageSpec extends SparkSpec {
  import spark.implicits._

  // duplicated texts scattered across groups → cross-split leakage
  private def docs(seed: Int, n: Int): Seq[(Long, Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val text =
        if (rnd.nextInt(3) == 0) s"shared opening ${rnd.nextInt(8)}"
        else s"unique text $i"
      (i.toLong, (rnd.nextInt(16)).toLong, text)
    }
  }

  private def sortedRows(df: DataFrame) =
    df.orderBy("h").collect().toSeq

  test("in-memory session equals the batch audit under random batching") {
    val d = docs(5, 200)
    val whole = d.toDF("doc_id", "grp", "text")
    val session = new StreamSplitLeakage.LeakageSession(
      spark, "doc_id", "grp", md5($"text"), seed = "s1")
    val rnd = new scala.util.Random(9)
    d.groupBy(_ => rnd.nextInt(6)).values.foreach { b =>
      session.ingest(b.toDF("doc_id", "grp", "text"))
    }
    val batch = CurationOps.splitLeakage(
      whole, "doc_id", "grp", md5($"text"), seed = "s1")
    assert(sortedRows(batch).nonEmpty, "fixture must actually leak")
    assert(sortedRows(session.currentLeakage) === sortedRows(batch))
  }

  test("durable session: restart, replay, compaction preserve the audit") {
    val dir = Files.createTempDirectory("leak_ledger").toString
    val d = docs(11, 150)
    val batches = d.grouped(50).toSeq
    def mk() = new StreamSplitLeakage.DurableLeakageSession(
      spark, dir, "doc_id", "grp", md5($"text"), seed = "s2")
    val s1 = mk()
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "grp", "text"), i.toLong)
    }
    val expect = sortedRows(CurationOps.splitLeakage(
      d.toDF("doc_id", "grp", "text"), "doc_id", "grp", md5($"text"), seed = "s2"))
    assert(expect.nonEmpty, "fixture must actually leak")
    assert(sortedRows(s1.currentLeakage) === expect)
    // replay: same batch id overwrites — counts are additive, so a
    // naive append would double them
    s1.ingest(batches.head.toDF("doc_id", "grp", "text"), 0L)
    assert(sortedRows(s1.currentLeakage) === expect)
    // restart from disk
    val s2 = mk()
    assert(sortedRows(s2.currentLeakage) === expect)
    // compaction is a free sum-fold
    import org.apache.spark.sql.types._
    DurableLedger.compact(spark, dir, StructType(Seq(
      StructField("h", StringType), StructField("n_train", LongType),
      StructField("n_val", LongType), StructField("n_test", LongType),
      StructField("n_docs", LongType))))
    assert(sortedRows(s2.currentLeakage) === expect)
  }

  test("a later batch flips a clean key to leaked — the live-monitor point") {
    // two docs, same key, groups chosen (by seed scan) to split apart
    val base = Seq((1L, 0L, "dup text"), (2L, 0L, "dup text"))
    val seed = (1 to 60).map(i => s"p$i").find { s =>
      CurationOps.groupedSplit(
          Seq((1L, 0L, "x"), (2L, 1L, "x")).toDF("doc_id", "grp", "text"),
          "doc_id", "grp", s)
        .select($"split").distinct().count() == 2
    }.getOrElse(fail("no seed separated groups 0 and 1"))
    val session = new StreamSplitLeakage.LeakageSession(
      spark, "doc_id", "grp", md5($"text"), seed)
    session.ingest(base.toDF("doc_id", "grp", "text"))
    assert(session.currentLeakage.count() == 0, "same group: no leakage yet")
    session.ingest(Seq((3L, 1L, "dup text")).toDF("doc_id", "grp", "text"))
    val leaked = session.currentLeakage.collect()
    assert(leaked.length == 1 && leaked.head.getAs[Long]("n_docs") == 3L)
  }
}
