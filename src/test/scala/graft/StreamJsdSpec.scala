package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.{DurableLedger, StreamJsd}
import graft.textops.CurationOps

/** Streamed ≡ batch for the JSD similarity panel — EXACT equality
  * including the divergence doubles (per-word terms are fixed-point
  * longs before any cross-row sum), by count additivity. Durable twin:
  * restart, replay-overwrite, and compaction preserve the matrix
  * bit-for-bit.
  */
class StreamJsdSpec extends SparkSpec {
  import spark.implicits._

  private val Groups = Seq("de", "en", "fr")

  private def docs(seed: Int, n: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    val shared = Seq("data", "table", "row", "scan", "join")
    val perGroup = Map(
      "de" -> Seq("der", "und", "nicht"),
      "en" -> Seq("the", "and", "not"),
      "fr" -> Seq("le", "et", "pas"))
    (1 to n).map { _ =>
      val g = Groups(rnd.nextInt(Groups.length))
      val words = Seq.fill(6)(shared(rnd.nextInt(shared.length))) ++
        Seq.fill(4)(perGroup(g)(rnd.nextInt(3))) ++
        Seq.fill(2)(s"w${rnd.nextInt(15)}")
      (g, rnd.shuffle(words).mkString(" "))
    }
  }

  private def rowsOf(df: DataFrame): Seq[org.apache.spark.sql.Row] =
    df.orderBy("g_a", "g_b").collect().toSeq

  test("in-memory session equals the batch JSD matrix under random batching") {
    val d = docs(9, 120)
    val whole = d.toDF("lang", "text")
    val session = new StreamJsd.JsdSession(spark, "lang", "text", Groups)
    val rnd = new scala.util.Random(31)
    d.groupBy(_ => rnd.nextInt(5)).values.foreach { b =>
      session.ingest(b.toDF("lang", "text"))
    }
    val expect = rowsOf(CurationOps.jsDivergenceByGroup(
      whole, "lang", "text", Groups))
    assert(rowsOf(session.currentJsd) === expect)
    // sanity: distinct per-group vocab ⇒ strictly positive divergences
    assert(expect.forall(_.getAs[Double]("jsd") > 0.0))
  }

  test("durable session: restart, replay, compaction preserve the matrix") {
    val dir = Files.createTempDirectory("jsd_ledger").toString
    val d = docs(41, 90)
    val batches = d.grouped(30).toSeq
    val s1 = new StreamJsd.DurableJsdSession(spark, dir, "lang", "text", Groups)
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("lang", "text"), i.toLong)
    }
    val expect = rowsOf(CurationOps.jsDivergenceByGroup(
      d.toDF("lang", "text"), "lang", "text", Groups))
    assert(rowsOf(s1.currentJsd) === expect)
    // replay: same batch id, identical rows — overwrite, no double count
    s1.ingest(batches.head.toDF("lang", "text"), 0L)
    assert(rowsOf(s1.currentJsd) === expect)
    // restart: a fresh session over the same root
    val s2 = new StreamJsd.DurableJsdSession(spark, dir, "lang", "text", Groups)
    assert(rowsOf(s2.currentJsd) === expect)
    // compaction folds the ledger without changing the sums
    import org.apache.spark.sql.types._
    DurableLedger.compact(spark, dir, StructType(Seq(
      StructField("w", StringType), StructField("g", StringType),
      StructField("n", LongType))))
    assert(rowsOf(s2.currentJsd) === expect)
  }
}
