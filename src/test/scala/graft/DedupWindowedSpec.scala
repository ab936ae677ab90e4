package graft

import graft.ingest.{CorpusPage, Dedup}

/** Equivalence of the window/posexplode dedup with the exact grouped
  * form, on seeded random corpora shaped like the differential fuzzer's
  * (boilerplate carriers, exact dups, outliers, empty pages).
  */
class DedupWindowedSpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpora(seed: Int, nCompanies: Int): Seq[CorpusPage] = {
    val rnd = new scala.util.Random(seed)
    val words = "alpha bravo charlie delta echo foxtrot golf hotel".split(" ")
    def line() = (0 until rnd.nextInt(6)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    (0 until nCompanies).flatMap { c =>
      val header = (0 until rnd.nextInt(5)).map(_ => line()).mkString("\n")
      val footer = (0 until rnd.nextInt(5)).map(_ => line()).mkString("\n")
      val useBoiler = rnd.nextDouble() < 0.7
      val nPages = rnd.nextInt(11)
      val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until nPages).foreach { _ =>
        val core = (0 until rnd.nextInt(5)).map(_ => line()).mkString("\n")
        if (rnd.nextDouble() < 0.25 && bodies.nonEmpty)
          bodies += bodies(rnd.nextInt(bodies.length)) // exact dup
        else if (useBoiler && rnd.nextDouble() < 0.9)
          bodies += s"$header\n$core\n$footer"
        else bodies += core
      }
      bodies.zipWithIndex.map { case (b, i) =>
        CorpusPage(s"c$c.example", "v1", i, s"https://c$c.example/p$i", b)
      }
    }
  }

  test("windowed dedup ≡ grouped dedup on 60 random companies") {
    val pages = randomCorpora(seed = 7, nCompanies = 60)
    val ds = spark.createDataset(pages)
    val grouped = Dedup.dedupCorpus(ds).collect()
      .map(p => (p.etld1, p.page_seq) -> p.body).toMap
    val windowed = Dedup.dedupCorpusWindowed(ds).collect()
      .map(p => (p.etld1, p.page_seq) -> p.body).toMap
    assert(windowed.keySet == grouped.keySet)
    var diffs = 0
    grouped.foreach { case (k, body) =>
      if (windowed(k) != body) {
        diffs += 1
        if (diffs <= 3) info(s"DIVERGES at $k:\n  grouped : ${body.take(120)}\n  windowed: ${windowed(k).take(120)}")
      }
    }
    assert(diffs == 0, s"$diffs divergent pages")
  }

  test("windowed dedup on a second seed") {
    val pages = randomCorpora(seed = 99, nCompanies = 40)
    val ds = spark.createDataset(pages)
    val grouped = Dedup.dedupCorpus(ds).collect()
      .map(p => (p.etld1, p.page_seq) -> p.body).toMap
    val windowed = Dedup.dedupCorpusWindowed(ds).collect()
      .map(p => (p.etld1, p.page_seq) -> p.body).toMap
    assert(windowed == grouped)
  }
}
