package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.{DurableLedger, StreamDomainCap}
import graft.textops.CurationOps

/** Streamed ≡ batch for per-domain cap retention — EXACT by the top-k
  * fold law under the total (quality desc, id asc) order.
  */
class StreamDomainCapSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private def docs(seed: Int, n: Int): Seq[(Long, String, Double)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong, s"d${rnd.nextInt(12)}", (rnd.nextInt(1000) / 10.0))
    }
  }

  private def sortedRows(df: DataFrame) =
    df.orderBy("grp", "rk").collect().toSeq

  test("in-memory session ≡ the batch retention under random batching") {
    val d = docs(13, 400)
    val whole = d.toDF("doc_id", "grp", "q")
    val batch = CurationOps.domainCapRetention(whole, "doc_id", "grp", "q", K)
    val session = new StreamDomainCap.DomainCapSession(spark, "doc_id", "grp", "q", K)
    val rnd = new scala.util.Random(4)
    d.groupBy(_ => rnd.nextInt(7)).values.foreach { b =>
      session.ingest(b.toDF("doc_id", "grp", "q"))
    }
    assert(sortedRows(session.currentRetained) === sortedRows(batch))
  }

  test("eviction is permanent: a document outside the cap never re-enters") {
    val session = new StreamDomainCap.DomainCapSession(spark, "doc_id", "grp", "q", 2)
    session.ingest(Seq((1L, "a", 5.0), (2L, "a", 4.0)).toDF("doc_id", "grp", "q"))
    assert(session.currentRetained.count() == 2)
    // two better docs arrive -> 1 and 2 evicted
    session.ingest(Seq((3L, "a", 9.0), (4L, "a", 8.0)).toDF("doc_id", "grp", "q"))
    val kept = session.currentRetained.select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
    // a low-quality batch cannot resurrect anything
    session.ingest(Seq((5L, "a", 1.0)).toDF("doc_id", "grp", "q"))
    assert(session.currentRetained.select($"doc_id").as[Long].collect().toSet
      == Set(3L, 4L))
  }

  test("durable session: restart, replay, compaction preserve the retention") {
    val dir = Files.createTempDirectory("domaincap_ledger").toString
    val d = docs(29, 300)
    val batches = d.grouped(100).toSeq
    def mk() = new StreamDomainCap.DurableDomainCapSession(
      spark, dir, "doc_id", "grp", "q", K)
    val s1 = mk()
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "grp", "q"), i.toLong)
    }
    val expect = sortedRows(CurationOps.domainCapRetention(
      d.toDF("doc_id", "grp", "q"), "doc_id", "grp", "q", K))
    assert(sortedRows(s1.currentRetained) === expect)
    s1.ingest(batches.head.toDF("doc_id", "grp", "q"), 0L) // replay overwrites
    assert(sortedRows(s1.currentRetained) === expect)
    val s2 = mk()
    assert(sortedRows(s2.currentRetained) === expect)
    import org.apache.spark.sql.types._
    DurableLedger.compact(spark, dir, StructType(Seq(
      StructField("doc_id", LongType), StructField("grp", StringType),
      StructField("q", DoubleType))))
    assert(sortedRows(s2.currentRetained) === expect)
  }
}
