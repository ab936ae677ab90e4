package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.streaming.{DurableLedger, StreamDrift}
import graft.textops.CurationOps

/** Streamed ≡ batch for the corpus-drift monitor — EXACT equality
  * including the chi-square doubles (same integer count inputs, same
  * fixed per-row op nest), by count additivity. Durable twin: the
  * reference ledger seeds once (a restart ignores the constructor
  * frame), and restart, replay-overwrite, and compaction preserve the
  * derived table bit-for-bit.
  */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private def docs(seed: Int, n: Int, shift: Boolean): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val base = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val drifted = if (shift) Seq("spam", "casino", "pills") else Seq()
    (1 to n).map { i =>
      val words = Seq.fill(8)(base(rnd.nextInt(base.length))) ++
        drifted.flatMap(w => Seq.fill(rnd.nextInt(3))(w)) ++
        Seq.fill(3)(s"w${rnd.nextInt(20)}")
      (i.toLong, rnd.shuffle(words).mkString(" "))
    }
  }

  private def rowsOf(df: DataFrame): Seq[org.apache.spark.sql.Row] = df.collect().toSeq

  test("in-memory session equals the batch drift table under random batching") {
    val ref = docs(3, 100, shift = false).toDF("doc_id", "text")
    val nw = docs(11, 80, shift = true)
    val session = new StreamDrift.DriftSession(spark, ref, "text", minTotal = 5, k = 25)
    val rnd = new scala.util.Random(17)
    nw.groupBy(_ => rnd.nextInt(4)).values.foreach { b =>
      session.ingest(b.toDF("doc_id", "text"))
    }
    val expect = rowsOf(CurationOps.corpusDrift(
      ref, nw.toDF("doc_id", "text"), "text", minTotal = 5, k = 25))
    assert(rowsOf(session.currentDrift) === expect)
    // the drifted tokens surface in the table at all
    assert(expect.exists(r => Set("spam", "casino", "pills")(r.getString(0))))
  }

  test("durable session: seeding, restart, replay, compaction preserve the table") {
    val dir = Files.createTempDirectory("drift_ledger").toString
    val ref = docs(5, 90, shift = false).toDF("doc_id", "text")
    val nw = docs(23, 60, shift = true)
    val batches = nw.grouped(20).toSeq
    val s1 = new StreamDrift.DurableDriftSession(spark, dir, ref, "text",
      minTotal = 5, k = 25)
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "text"), i.toLong)
    }
    val expect = rowsOf(CurationOps.corpusDrift(
      ref, nw.toDF("doc_id", "text"), "text", minTotal = 5, k = 25))
    assert(rowsOf(s1.currentDrift) === expect)
    // replay: redelivering batch 0 overwrites, no double count
    s1.ingest(batches.head.toDF("doc_id", "text"), 0L)
    assert(rowsOf(s1.currentDrift) === expect)
    // restart: a DIFFERENT (wrong) ref frame must be ignored — the
    // seeded ledger is the baseline of record
    val wrongRef = docs(99, 10, shift = true).toDF("doc_id", "text")
    val s2 = new StreamDrift.DurableDriftSession(spark, dir, wrongRef, "text",
      minTotal = 5, k = 25)
    assert(rowsOf(s2.currentDrift) === expect)
    // compaction folds the streaming ledger without changing the sums
    DurableLedger.compact(spark, s"$dir/new", StructType(Seq(
      StructField("w", StringType), StructField("nb", LongType))))
    assert(rowsOf(s2.currentDrift) === expect)
  }
}
