package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.{DurableLedger, StreamPmi}
import graft.textops.CurationOps

/** Streamed ≡ batch for the PMI panel — EXACT equality including the
  * ratio doubles (same integer count inputs, same fixed op nest), by
  * count additivity. Durable twin: restart, replay-overwrite, and
  * compaction all preserve the derived table bit-for-bit.
  */
class StreamPmiSpec extends SparkSpec {
  import spark.implicits._

  private def docs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val phrases = Seq("new york", "machine learning", "hot dog",
      "data pipeline", "the cat", "a dog")
    (1 to n).map { i =>
      val words = Seq.fill(6)(phrases(rnd.nextInt(phrases.length))) ++
        Seq.fill(4)(s"w${rnd.nextInt(30)}")
      (i.toLong, rnd.shuffle(words).mkString(" "))
    }
  }

  private def rowsOf(df: DataFrame): Seq[org.apache.spark.sql.Row] = df.collect().toSeq

  test("in-memory session equals the batch PMI table under random batching") {
    val d = docs(7, 120)
    val whole = d.toDF("doc_id", "text")
    val session = new StreamPmi.PmiSession(spark, "text", minCount = 3, k = 20)
    val rnd = new scala.util.Random(13)
    d.groupBy(_ => rnd.nextInt(5)).values.foreach { b =>
      session.ingest(b.toDF("doc_id", "text"))
    }
    assert(rowsOf(session.currentPmi) ===
      rowsOf(CurationOps.pmiCollocations(whole, "text", minCount = 3, k = 20)))
  }

  test("durable session: restart, replay, compaction preserve the table") {
    val dir = Files.createTempDirectory("pmi_ledger").toString
    val d = docs(21, 90)
    val batches = d.grouped(30).toSeq
    val s1 = new StreamPmi.DurablePmiSession(spark, dir, "text", minCount = 3, k = 20)
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "text"), i.toLong)
    }
    val expect = rowsOf(CurationOps.pmiCollocations(
      d.toDF("doc_id", "text"), "text", minCount = 3, k = 20))
    assert(rowsOf(s1.currentPmi) === expect)
    // replay: same batch id, same rows — both ledgers overwrite, no double count
    s1.ingest(batches.head.toDF("doc_id", "text"), 0L)
    assert(rowsOf(s1.currentPmi) === expect)
    // restart: a fresh session over the same root
    val s2 = new StreamPmi.DurablePmiSession(spark, dir, "text", minCount = 3, k = 20)
    assert(rowsOf(s2.currentPmi) === expect)
    // compaction folds both ledgers without changing the sums
    import org.apache.spark.sql.types._
    DurableLedger.compact(spark, s"$dir/big", StructType(Seq(
      StructField("w1", StringType), StructField("w2", StringType),
      StructField("n", LongType))))
    DurableLedger.compact(spark, s"$dir/uni", StructType(Seq(
      StructField("w", StringType), StructField("nu", LongType))))
    assert(rowsOf(s2.currentPmi) === expect)
  }
}
