package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sketch.QDigest
import graft.streaming.{DurableLedger, StreamQDigest}

/** Streamed ≡ batch for the q-digest — BIT-EXACT (the maintained state
  * is the additive leaf histogram, not merged digests, so the derived
  * digest is the batch build itself, stronger than the merge-error
  * envelope).
  */
class StreamQDigestSpec extends SparkSpec {
  import spark.implicits._

  private val LogU = 10
  private val K = 16

  private def values(seed: Int, n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => rnd.nextInt(1 << LogU).toLong)
  }

  private def sortedRows(df: DataFrame) = df.orderBy("id").collect().toSeq

  test("in-memory session ≡ the batch digest under random batching") {
    val vs = values(7, 2500)
    val batch = QDigest.digestTable(vs.toDF("v"), col("v"), LogU, K)
    val session = new StreamQDigest.QDigestSession(spark, col("v"), LogU, K)
    val rnd = new scala.util.Random(3)
    vs.groupBy(_ => rnd.nextInt(6)).values.foreach { b =>
      session.ingest(b.toDF("v"))
    }
    assert(sortedRows(session.currentDigest) === sortedRows(batch))
  }

  test("grouped session ≡ batch digestByGroup under random batching (q160 live)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(_ =>
      (s"host${rnd.nextInt(7)}", rnd.nextInt(1 << LogU).toLong))
    val df = rows.toDF("host", "v")
    val batch = QDigest.digestByGroup(df, col("host"), col("v"), LogU, K)
      .orderBy("group", "id").collect().toSeq
    val session = new StreamQDigest.GroupedQDigestSession(
      spark, col("host"), col("v"), LogU, K)
    rows.groupBy(_ => rnd.nextInt(5)).values.foreach { b =>
      session.ingest(b.toDF("host", "v"))
    }
    assert(session.currentDigests.orderBy("group", "id").collect().toSeq
      === batch)
    // each group's panel IS the flat digest of that group's values
    // (the shared-derivation claim, checked per group)
    rows.map(_._1).distinct.foreach { h =>
      val flat = QDigest.digestTable(
        rows.filter(_._1 == h).map(_._2).toDF("v"), col("v"), LogU, K)
        .orderBy("id").collect().toSeq.map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val grouped = batch.filter(_.getString(0) == h).map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(grouped === flat, s"host $h")
    }
  }

  test("durable session: restart, replay, compaction preserve the digest") {
    val dir = Files.createTempDirectory("qdigest_ledger").toString
    val vs = values(19, 1800)
    val batches = vs.grouped(600).toSeq
    def mk() = new StreamQDigest.DurableQDigestSession(spark, dir, col("v"), LogU, K)
    val s1 = mk()
    batches.zipWithIndex.foreach { case (b, i) => s1.ingest(b.toDF("v"), i.toLong) }
    val expect = sortedRows(QDigest.digestTable(vs.toDF("v"), col("v"), LogU, K))
    assert(sortedRows(s1.currentDigest) === expect)
    s1.ingest(batches.head.toDF("v"), 0L) // replay overwrites, counts not doubled
    assert(sortedRows(s1.currentDigest) === expect)
    val s2 = mk() // restart from disk
    assert(sortedRows(s2.currentDigest) === expect)
    import org.apache.spark.sql.types._
    DurableLedger.compact(spark, dir, StructType(Seq(
      StructField("v", LongType), StructField("cnt", LongType))))
    assert(sortedRows(s2.currentDigest) === expect)
  }
}
