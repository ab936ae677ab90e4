package graft

import org.apache.spark.sql.functions._

import graft.textops.TextAnalysis

/** Round-9 web-signal additions: outlink (web-graph edge) extraction
  * drop/classify rules and the mojibake / encoding-damage counters.
  */
class OutlinksEncodingSpec extends SparkSpec {
  import spark.implicits._

  test("outlinkEdges: absolute/relative classify, fragment/mailto/javascript drop") {
    val pages = Seq(
      (1L, """<a href="https://a.test/x">one</a><a href="/rel/p">two</a>"""),
      (2L, """<a href="#frag">skip</a><a href="mailto:x@y.test">skip</a>"""),
      (3L, """<A HREF="HTTP://UP.TEST/q">caps</A>"""),
      (4L, """<a href="javascript:void(0)">skip</a>"""),
      (5L, """<a class="n" href="https://a.test/x#sec">fragment strips</a>"""),
      (6L, "no links here"),
      // an attribute that merely ENDS in "href" is not an edge — the
      // pattern requires a whitespace boundary before the name
      (7L, """<a data-href="/decoy">no real href</a>"""),
      (8L, """<a data-href="/decoy" href="https://b.test/r">real one kept</a>"""))
      .toDF("id", "page")
    val out = TextAnalysis.outlinkEdges(pages, "id", "page")
      .as[(Long, String, Option[String], Int)].collect().toSeq.sorted
    assert(out == Seq(
      (1L, "/rel/p", None, 0),
      (1L, "https://a.test/x", Some("a.test"), 1),
      (3L, "HTTP://UP.TEST/q", Some("up.test"), 1),
      (5L, "https://a.test/x", Some("a.test"), 1),
      (8L, "https://b.test/r", Some("b.test"), 1)))
  }

  test("outlinkEdges: multiple links per page keep multiplicity") {
    val pages = Seq(
      (1L, """<a href="https://a.test/1">x</a><a href="https://a.test/1">x</a>"""))
      .toDF("id", "page")
    val out = TextAnalysis.outlinkEdges(pages, "id", "page").count()
    assert(out == 2L, "duplicate edges are real in-degree mass, not deduped here")
  }

  test("encodingQuality: each artifact class counted separately; ratio exact") {
    val docs = Seq(
      (1L, "clean ascii text"),
      (2L, "cafÃ©"),             // one UTF-8-as-Latin-1 bigram
      (3L, "bad�char"),               // one replacement char
      (4L, "xy"),                    // one C1 control
      (5L, "Ã©�"),    // one of each
      (6L, "")).toDF("id", "text")
    val out = TextAnalysis.encodingQuality(docs, "id", "text")
      .select($"id", $"n_replacement", $"n_c1", $"n_double_utf8", $"is_clean")
      .as[(Long, Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0L, 0L, 0L, 1)))
    assert(out(2L) == ((2L, 0L, 0L, 1L, 0)))
    assert(out(3L) == ((3L, 1L, 0L, 0L, 0)))
    assert(out(4L) == ((4L, 0L, 1L, 0L, 0)))
    assert(out(5L) == ((5L, 1L, 1L, 1L, 0)))
    assert(out(6L) == ((6L, 0L, 0L, 0L, 1)), "empty text is clean, ratio 0")
    // damage ratio: doc 4 = 1 artifact / 3 chars * 1000, rounded at 9
    val ratio = TextAnalysis.encodingQuality(docs, "id", "text")
      .filter($"id" === 4L).select($"damage_per_kchar").as[Double].head()
    assert(ratio == math.rint(1000.0 / 3.0 * 1e9) / 1e9 ||
      math.abs(ratio - 1000.0 / 3.0) < 1e-6)
  }

  test("ibanValidCol: published vectors, check-digit rejects, malformed input") {
    val cases = Seq(
      ("GB82WEST12345698765432", true),   // the ISO 13616 example
      ("DE89370400440532013000", true),   // published DE example
      ("gb82west12345698765432", true),   // case-normalized
      ("GB82WEST12345698765431", false),  // last digit off
      ("GB00WEST12345698765432", false),  // wrong check digits
      ("1E82WEST12345698765432", false),  // digit country code
      ("GB82", false),                    // too short
      ("GB82 WEST 1234 5698 7654 32", false)) // spaces not normalized here
    val out = cases.map(_._1).toDF("iban")
      .select($"iban", graft.textops.TextAnalysis.ibanValidCol($"iban").as("v"))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (n, exp) => assert(out(n) == exp, s"'$n'") }
    val nulls = Seq(Tuple1[String](null)).toDF("iban")
      .select(graft.textops.TextAnalysis.ibanValidCol($"iban")).as[Boolean].collect()
    assert(nulls.toSeq == Seq(false))
  }

  test("encodingQuality: C1 char after a lead byte is NOT double-counted as both") {
    // U+00C3 U+0085: a continuation-range char that is ALSO C1 — the
    // bigram counter and the C1 counter both see it (documented: the
    // signals are independent counters, the score sums them)
    val docs = Seq((1L, "Ã")).toDF("id", "text")
    val out = TextAnalysis.encodingQuality(docs, "id", "text")
      .select($"n_c1", $"n_double_utf8").as[(Long, Long)].head()
    assert(out == ((1L, 1L)))
  }
}
