package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.{DurableLedger, StreamHostGraph}

/** Streamed ≡ batch for the host in-degree panel — EXACT (integer
  * counts; pages arrive once, so per-batch distinct-page counts are
  * additive across batches).
  */
class StreamHostGraphSpec extends SparkSpec {
  import spark.implicits._

  private def pages(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val links = (0 until 1 + rnd.nextInt(3)).map { _ =>
        s"""<a href="https://h${rnd.nextInt(6)}.test/p$i">x</a>"""
      } ++ (if (rnd.nextInt(4) == 0) Seq("""<a href="/rel">r</a>""") else Nil)
      (i.toLong, s"<html><body>${links.mkString}</body></html>")
    }
  }

  private def sortedRows(df: DataFrame) = df.orderBy("host").collect().toSeq

  test("in-memory session equals the batch rollup under random batching") {
    val d = pages(3, 150)
    val whole = d.toDF("doc_id", "page")
    val batch = StreamHostGraph.hostInDegree(whole, "doc_id", "page")
    val session = new StreamHostGraph.HostGraphSession(spark, "doc_id", "page")
    val rnd = new scala.util.Random(8)
    d.groupBy(_ => rnd.nextInt(5)).values.foreach { b =>
      session.ingest(b.toDF("doc_id", "page"))
    }
    assert(sortedRows(session.currentInDegree) === sortedRows(batch))
  }

  test("durable session: restart, replay, compaction preserve the panel") {
    val dir = Files.createTempDirectory("hostgraph_ledger").toString
    val d = pages(17, 120)
    val batches = d.grouped(40).toSeq
    def mk() = new StreamHostGraph.DurableHostGraphSession(spark, dir, "doc_id", "page")
    val s1 = mk()
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "page"), i.toLong)
    }
    val expect = sortedRows(
      StreamHostGraph.hostInDegree(d.toDF("doc_id", "page"), "doc_id", "page"))
    assert(sortedRows(s1.currentInDegree) === expect)
    s1.ingest(batches.head.toDF("doc_id", "page"), 0L) // replay overwrites
    assert(sortedRows(s1.currentInDegree) === expect)
    val s2 = mk() // restart from disk
    assert(sortedRows(s2.currentInDegree) === expect)
    import org.apache.spark.sql.types._
    DurableLedger.compact(spark, dir, StructType(Seq(
      StructField("host", StringType), StructField("n_links", LongType),
      StructField("n_pages", LongType))))
    assert(sortedRows(s2.currentInDegree) === expect)
  }
}
