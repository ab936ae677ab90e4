package graft.examples

import org.apache.spark.sql.SparkSession

import graft.functions.{BpeishTokenizer, JsonRepair}
import graft.ingest.{Blocks, CorpusDoc, Dedup}

/** Sample usage of the ingest path at the library's public surface:
  * combined scrape text → shredded corpus rows → exact-dup stubs +
  * boilerplate strip. Run: `sbt "runMain graft.examples.IngestDemo"`.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ingest-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val boiler = (b: String) => s"Nav\nLogo\nBanner\n$b\nFoot1\nFoot2\nFoot3"
    val combinedA =
      (0 until 5).map(i => Blocks.format(s"https://a.example/p$i", boiler(s"Page body $i"))).mkString +
        Blocks.format("https://a.example/dup", boiler("Page body 0"))
    val docs = Seq(
      CorpusDoc("a.example", "v1", combinedA),
      CorpusDoc("b.example", "v1", Blocks.format("https://b.example/", "solo body")),
      CorpusDoc("timeout.example", "v1", Blocks.format("https://timeout.example/", "partial scrape"))).toDS()

    // S1 validity gate: scrape stats filter invalid scrapes out of the
    // corpus before extraction (tokens, success rate, timeout).
    import graft.plans.{Merge => M}
    val scrapeStats = Seq(
      ("a.example", 500, 6, 0, false),
      ("b.example", 40, 1, 0, false),
      ("timeout.example", 900, 3, 2, true)) // timed out → invalid
      .toDF("etld1", "tokens", "urls_scraped", "urls_failed", "timed_out")
    val validCompanies = scrapeStats
      .filter(M.scrapeValid($"tokens", $"urls_scraped", $"urls_failed", $"timed_out"))
      .select($"etld1")
    println("valid scrapes:")
    validCompanies.show(false)
    val validDocs = docs.join(validCompanies, "etld1").as[CorpusDoc]

    val pages = Blocks.shred(validDocs)
    println(s"shredded pages: ${pages.count()}")
    val deduped = Dedup.dedupCorpus(pages)
    deduped.orderBy("etld1", "page_seq")
      .select($"etld1", $"page_seq", $"url", $"body")
      .show(20, truncate = false)

    println("repaired: " + JsonRepair.repair("```json\n[\"Item with \"quotes\" inside\"]\n```"))
    println("tokens: " + BpeishTokenizer.count("Hello, world! This is a test of 123 tokens."))

    // Chunk the deduped corpus per the certificates strategy.
    import graft.chunk.{Chunker, ChunkingStrat}
    val chunkInput = deduped.filter(!_.body.startsWith("[duplicate"))
      .groupByKey(p => (p.etld1, p.version_id))
      .mapGroups((k, it) => (k._1, k._2, it.toSeq.sortBy(_.page_seq).map(_.body).mkString("\n")))
    val chunks = Chunker.chunkDocs(
      chunkInput, ChunkingStrat("certificates", 5, 0.0, 25), graft.functions.WhitespaceTokenizer)
    chunks.orderBy("etld1", "chunk_start")
      .select($"etld1", $"chunk_start", $"chunk_end", $"tokens")
      .show(20, truncate = false)
    spark.stop()
  }
}
