package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.{DurableLedger, StreamAnchorText}
import graft.textops.TextAnalysis

/** Streamed ≡ batch for the anchor-text panel — EXACT (integer counts;
  * pages arrive once, so per-batch distinct-page counts are additive
  * across batches), the StreamHostGraph argument one key wider.
  */
class StreamAnchorTextSpec extends SparkSpec {
  import spark.implicits._

  private val Anchors = Seq("buy now", "Read More", "  home  ", "")

  private def pages(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val links = (0 until 1 + rnd.nextInt(3)).map { _ =>
        s"""<a href="https://h${rnd.nextInt(5)}.test/p$i">${Anchors(rnd.nextInt(Anchors.size))}</a>"""
      } ++ (if (rnd.nextInt(4) == 0) Seq("""<a href="/rel">skip me</a>""") else Nil)
      (i.toLong, s"<html><body>${links.mkString}</body></html>")
    }
  }

  private def sortedRows(df: DataFrame) =
    df.orderBy("host", "anchor").collect().toSeq

  test("in-memory session equals the batch rollup under random batching") {
    val d = pages(5, 150)
    val batch = TextAnalysis.anchorTextPanel(
      d.toDF("doc_id", "page"), "doc_id", "page")
    val session = new StreamAnchorText.AnchorTextSession(spark, "doc_id", "page")
    val rnd = new scala.util.Random(11)
    d.groupBy(_ => rnd.nextInt(5)).values.foreach { b =>
      session.ingest(b.toDF("doc_id", "page"))
    }
    assert(sortedRows(session.currentPanel) === sortedRows(batch))
  }

  test("durable session: restart, replay, compaction preserve the panel") {
    val dir = Files.createTempDirectory("anchor_ledger").toString
    val d = pages(23, 120)
    val batches = d.grouped(40).toSeq
    def mk() = new StreamAnchorText.DurableAnchorTextSession(spark, dir, "doc_id", "page")
    val s1 = mk()
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "page"), i.toLong)
    }
    val expect = sortedRows(TextAnalysis.anchorTextPanel(
      d.toDF("doc_id", "page"), "doc_id", "page"))
    assert(sortedRows(s1.currentPanel) === expect)
    s1.ingest(batches.head.toDF("doc_id", "page"), 0L) // replay overwrites
    assert(sortedRows(s1.currentPanel) === expect)
    val s2 = mk() // restart from disk
    assert(sortedRows(s2.currentPanel) === expect)
    import org.apache.spark.sql.types._
    DurableLedger.compact(spark, dir, StructType(Seq(
      StructField("host", StringType), StructField("anchor", StringType),
      StructField("n_links", LongType), StructField("n_pages", LongType))))
    assert(sortedRows(s2.currentPanel) === expect)
  }
}
