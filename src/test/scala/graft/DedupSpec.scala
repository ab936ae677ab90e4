package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Blocks, CorpusPage, Dedup}

/** Dedup behavior pinned to `scraper_app/tests/test_dedup_util.py`,
  * including the 251-block synthetic dataset (200 unique pages with
  * 10-line header + 6-line footer boilerplate, 50 exact-body duplicates,
  * 1 outlier without boilerplate exercising the 95% vote).
  */
class DedupSpec extends AnyFunSuite {

  private def mkBlock(url: String, body: String): String =
    Blocks.format(url, body)

  private def mkCombined(pairs: (String, String)*): String =
    pairs.map { case (u, b) => mkBlock(u, b) }.mkString

  // ---- synthetic dataset (FIXTURES.md §1) -------------------------------

  private val header =
    """Home | Products | About | Contact | Blog
      |Free shipping on orders over $50
      |Search products...
      |My Account   Cart (0)   Wishlist
      |========================================
      |ACME Industrial Fabrication
      |Precision Sheet Metal & Custom Parts
      |========================================
      |[ Sale items ]  [ New arrivals ]  [ Clearance ]
      |Category: All
      |""".stripMargin

  private val footer =
    """========================================
      |Payment Methods: Visa  Mastercard  PayPal  Apple Pay
      |
      |
      |(c) 2024 ACME Industrial Fabrication. All rights reserved.
      |Powered by Shopify""".stripMargin

  private val uniqueBodies: Vector[String] = (0 until 200).toVector.map { i =>
    header +
      f"Product: Widget $i%04d - SKU $i%04d\n" +
      "\n" +
      s"This is the main description for widget number $i.\n" +
      s"It spans a couple of lines and mentions spec $i.\n" +
      "\n" +
      f"   ID-PAD-$i%05d   \n" +
      "Thanks for shopping with us.\n" +
      footer
  }

  private val outlierBody =
    "Access denied\nPlease complete the security check to continue.\nRay ID: 12345"

  private val combined: String = {
    val uniques = uniqueBodies.zipWithIndex.map { case (b, i) =>
      (s"https://acme.example/product/$i", b)
    }
    val dups = (0 until 50).map { i =>
      (s"https://acme.example/dup/$i", uniqueBodies(i))
    }
    val outlier = Seq(("https://acme.example/error", outlierBody))
    mkCombined(uniques ++ dups ++ outlier: _*)
  }

  // ---- unit behaviors ----------------------------------------------------

  test("iterBlocks streams 251 blocks") {
    assert(Blocks.iterBlocks(combined).length == 251)
  }

  test("hashBody excludes URL: same body different URL collides") {
    val a = Blocks.bodyOf(mkBlock("https://a.example/x", "Line one\nLine two"))
    val b = Blocks.bodyOf(mkBlock("https://b.example/y", "Line one\nLine two"))
    assert(Dedup.hashBody(a) == Dedup.hashBody(b))
    assert(Dedup.hashBody(a) != Dedup.hashBody("Line one\nLine three"))
  }

  test("prefix + body reproduce the block") {
    val block = mkBlock("https://example.com", "Some content\nMore content")
    assert(Blocks.prefixOf(block) + Blocks.bodyOf(block) == block)
  }

  test("detect: common header of 3+ lines, no footer") {
    val pages = Seq(
      "Nav\nLogo\nBanner\nUnique A\nTail A",
      "Nav\nLogo\nBanner\nUnique B\nOther B",
      "Nav\nLogo\nBanner\nSomething C\nEnd C"
    ).map(Blocks.splitKeepEnds)
    val (h, f) = Dedup.detectCommonHeaderFooter(pages)
    assert(h.map(_.stripLineEnd) == Vector("Nav", "Logo", "Banner"))
    assert(f.isEmpty)
  }

  test("detect: below min lines is ignored") {
    val pages = Seq(
      "Nav\nLogo\nUnique A",
      "Nav\nLogo\nUnique B",
      "Nav\nLogo\nUnique C"
    ).map(Blocks.splitKeepEnds)
    val (h, f) = Dedup.detectCommonHeaderFooter(pages)
    assert(h.isEmpty && f.isEmpty)
  }

  test("detect: single page yields nothing") {
    val (h, f) = Dedup.detectCommonHeaderFooter(
      Seq(Blocks.splitKeepEnds("A\nB\nC")))
    assert(h.isEmpty && f.isEmpty)
  }

  test("detect: header preferred when header+footer overlap") {
    val pages = Seq(
      "X\nY\nZ\nX\nY\nZ",
      "X\nY\nZ\nX\nY\nZ",
      "X\nY\nZ\nX\nY\nZ"
    ).map(Blocks.splitKeepEnds)
    val (h, f) = Dedup.detectCommonHeaderFooter(pages)
    assert(h.nonEmpty)
    assert(f.isEmpty)
  }

  test("strip is a no-op when body does not carry the boilerplate") {
    val body = Blocks.splitKeepEnds("Different\nContent\nEntirely")
    val out = Dedup.stripBoilerplate(body,
      Vector("Nav\n", "Logo\n", "Banner\n"), Vector.empty)
    assert(out == body)
  }

  test("empty and whitespace-only input returned unchanged") {
    assert(Dedup.dedupCombined("") == "")
    assert(Dedup.dedupCombined("   \n  ").trim == "")
  }

  test("duplicate blocks are stubbed, not dropped") {
    val c = mkCombined(
      ("https://example.com/a", "Line one\nLine two"),
      ("https://example.com/b", "Line one\nLine two"))
    val out = Dedup.dedupCombined(c)
    assert(Blocks.iterBlocks(out).length == 2)
    assert(out.contains("https://example.com/a"))
    assert(out.contains("https://example.com/b"))
    assert(out.contains("[duplicate"))
    assert("Line one".r.findAllIn(out).length == 1)
  }

  test("three duplicates: one full + two stubs") {
    val c = mkCombined(
      ("https://e.com/1", "Same body line one\nTwo"),
      ("https://e.com/2", "Same body line one\nTwo"),
      ("https://e.com/3", "Same body line one\nTwo"))
    val out = Dedup.dedupCombined(c)
    assert("Same body line one".r.findAllIn(out).length == 1)
    assert("\\[duplicate".r.findAllIn(out).length == 2)
  }

  test("no boilerplate, no dups → byte-identical") {
    val c = mkCombined(
      ("https://e.com/1", "Alpha\nBravo"),
      ("https://e.com/2", "Charlie\nDelta"),
      ("https://e.com/3", "Echo\nFoxtrot"))
    assert(Dedup.dedupCombined(c) == c)
  }

  // ---- synthetic dataset integration ------------------------------------

  test("synthetic: 50 duplicate stubs produced") {
    val out = Dedup.dedupCombined(combined)
    assert("\\[duplicate".r.findAllIn(out).length == 50)
    assert(Blocks.iterBlocks(out).length == 251)
  }

  test("synthetic: header/footer stripped from carriers, outlier intact") {
    val out = Dedup.dedupCombined(combined)
    // Boilerplate appears 0 times after stripping (all carriers matched).
    assert(!out.contains("Free shipping on orders over $50"))
    assert(!out.contains("Powered by Shopify"))
    // Unique content survives.
    assert(out.contains("This is the main description for widget number 7."))
    // The outlier page (no boilerplate) is untouched.
    assert(out.contains("Please complete the security check to continue."))
  }

  test("synthetic: whitespace-padded identifier lines survive verbatim") {
    val out = Dedup.dedupCombined(combined)
    assert(out.contains("   ID-PAD-00007   \n"))
  }
}

/** Distributed wrapper parity: dedupCorpus over rows == dedupCombined. */
class DedupSparkSpec extends SparkSpec {
  import graft.ingest.{Blocks => B}

  test("dedupCorpus matches single-node dedup per company") {
    import spark.implicits._
    val bodies = Vector(
      "Nav\nLogo\nBanner\nUnique A\nFoot1\nFoot2\nFoot3",
      "Nav\nLogo\nBanner\nUnique B\nFoot1\nFoot2\nFoot3",
      "Nav\nLogo\nBanner\nUnique C\nFoot1\nFoot2\nFoot3",
      "Nav\nLogo\nBanner\nUnique A\nFoot1\nFoot2\nFoot3" // dup of page 0
    )
    val pages = bodies.zipWithIndex.map { case (b, i) =>
      CorpusPage("acme.example", "v1", i, s"https://acme.example/$i", b)
    } ++ Vector(CorpusPage("other.example", "v1", 0, "https://other.example/", "Solo page"))

    val out = Dedup.dedupCorpus(spark.createDataset(pages))
      .collect().sortBy(p => (p.etld1, p.page_seq))

    val acme = out.filter(_.etld1 == "acme.example")
    assert(acme.length == 4)
    assert(acme(3).body == Dedup.StubText)
    // Header stripped (>=3 common leading lines across unique pages).
    assert(!acme(0).body.contains("Nav"))
    assert(acme(0).body.contains("Unique A"))
    // Company with a single page untouched.
    assert(out.find(_.etld1 == "other.example").get.body == "Solo page")
  }
}
