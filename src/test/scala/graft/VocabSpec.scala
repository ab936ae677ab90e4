package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.vocab.{BruteSearch, Concept, Mapping, Ontology}

class VocabSpec extends AnyFunSuite {

  private val cnc = Concept("process", "CNC Machining",
    "urn:p/cnc", Seq("CNC milling", "computer numerical control", "CNC"), Nil)
  private val weld = Concept("process", "Welding", "urn:p/weld", Seq("MIG welding"), Nil)
  private val pipe = Concept("material", "Copper Pipe 1/2in", "urn:m/pipe", Nil, Nil)
  private val vocab = Seq(cnc, weld, pipe)

  // ---- T8 brute search ---------------------------------------------------

  test("brute: case-insensitive word-boundary match") {
    assert(BruteSearch.search("We offer cnc machining services.", vocab) ==
      Set("CNC Machining"))
  }

  test("brute: no match inside a longer word") {
    assert(BruteSearch.search("The CNCX-9000 is not a match target", vocab).isEmpty)
    assert(BruteSearch.search("ExpertCNC work", vocab).isEmpty) // preceded by word char
  }

  test("brute: match at string end and with punctuation boundary") {
    assert(BruteSearch.search("Our specialty: CNC", vocab) == Set("CNC Machining"))
    assert(BruteSearch.search("CNC, welding, and more", vocab) ==
      Set("CNC Machining", "Welding"))
  }

  test("brute: overlapping labels both detected") {
    // "CNC Machining" contains "CNC" — both labels hit the same concept;
    // a shorter different-concept label inside a longer one still counts.
    val shortAndLong = Seq(
      Concept("x", "Steel", "urn:x/steel", Nil, Nil),
      Concept("x", "Steel Tube", "urn:x/tube", Nil, Nil))
    assert(BruteSearch.search("We stock Steel Tube here", shortAndLong) ==
      Set("Steel", "Steel Tube"))
  }

  test("brute: labels with regex metacharacters are literal") {
    assert(BruteSearch.search("Copper Pipe 1/2in available now", vocab) ==
      Set("Copper Pipe 1/2in"))
  }

  test("brute: multiple labels of one concept count once") {
    assert(BruteSearch.search("cnc and CNC milling and computer numerical control", vocab) ==
      Set("CNC Machining"))
  }

  test("brute: empty text and empty vocab") {
    assert(BruteSearch.search("", vocab).isEmpty)
    assert(BruteSearch.search("anything", Nil).isEmpty)
  }

  // ---- T10 match/split ---------------------------------------------------

  test("matchAndSplit consumes exactly the known labels") {
    val results = Set("CNC milling", "family owned", "MIG welding", "iso9001")
    val (matched, unmatched) = Mapping.matchAndSplit(vocab, results)
    assert(matched == Set("CNC Machining", "Welding"))
    assert(unmatched == Set("family owned", "iso9001"))
  }

  test("matchAndSplit is case-sensitive (set intersection semantics)") {
    val (matched, unmatched) = Mapping.matchAndSplit(vocab, Set("cnc milling"))
    assert(matched.isEmpty)
    assert(unmatched == Set("cnc milling"))
  }

  // ---- T12 mapping -------------------------------------------------------

  test("applyMapping drops hallucinated unknowns and unknown labels") {
    val keywords = Set("biotech", "made-up-capability", "laser stuff")
    val raw = Map(
      "biotech" -> "MIG welding",          // maps via altLabel → Welding
      "not-in-input" -> "CNC",             // hallucinated unknown → dropped
      "made-up-capability" -> "No Such",   // unknown known-label → dropped
      "laser stuff" -> null)               // null known → dropped
    val (known2unknown, unmapped) = Mapping.applyMapping(vocab, keywords, raw)
    assert(known2unknown == Map("Welding" -> Set("biotech")))
    assert(unmapped == Set("made-up-capability", "laser stuff"))
  }

  test("applyMapping groups multiple unknowns under one concept") {
    val keywords = Set("a", "b", "c")
    val raw = Map("a" -> "CNC", "b" -> "CNC milling", "c" -> "Welding")
    val (k2u, unmapped) = Mapping.applyMapping(vocab, keywords, raw)
    assert(k2u == Map("CNC Machining" -> Set("a", "b"), "Welding" -> Set("c")))
    assert(unmapped.isEmpty)
  }

  // ---- T20 ontology flatten ----------------------------------------------

  private val nt =
    """<urn:s/root> <http://www.w3.org/2000/01/rdf-schema#label> "Root" .
      |<urn:s/machining> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:s/root> .
      |<urn:s/machining> <http://www.w3.org/2000/01/rdf-schema#label> "Machining" .
      |<urn:s/cnc> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:s/machining> .
      |<urn:s/cnc> <http://www.w3.org/2000/01/rdf-schema#label> "CNC Machining" .
      |<urn:s/cnc> <http://www.w3.org/2004/02/skos/core#altLabel> "CNC milling" .
      |<urn:s/cnc> <http://www.w3.org/2004/02/skos/core#altLabel> "computer numerical control" .
      |""".stripMargin

  test("ontology flatten: ancestors are the label path from the root") {
    val concepts = Ontology.flatten(Ontology.parseNTriples(nt), "urn:s/root", "process")
    assert(concepts.map(_.name) == Vector("Machining", "CNC Machining"))
    val cncC = concepts.find(_.name == "CNC Machining").get
    assert(cncC.ancestors == Seq("Machining"))
    assert(cncC.altLabels == Seq("CNC milling", "computer numerical control"))
    assert(cncC.matchLabels == Set("CNC Machining", "CNC milling", "computer numerical control"))
  }

  test("ontology flatten: duplicate labels raise") {
    val dup = nt +
      """<urn:s/cnc2> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:s/root> .
        |<urn:s/cnc2> <http://www.w3.org/2000/01/rdf-schema#label> "CNC Machining" .
        |""".stripMargin
    assertThrows[IllegalArgumentException] {
      Ontology.flatten(Ontology.parseNTriples(dup), "urn:s/root", "process")
    }
  }

  test("ontology flatten: missing label raises") {
    val missing =
      """<urn:s/x> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:s/root> .
        |""".stripMargin
    assertThrows[IllegalArgumentException] {
      Ontology.flatten(Ontology.parseNTriples(missing), "urn:s/root", "process")
    }
  }
}

class VocabSparkSpec extends SparkSpec {
  import graft.vocab.{BruteSearch, Concept, Mapping}

  private val vocab = Seq(
    Concept("process", "CNC Machining", "urn:p/cnc", Seq("CNC"), Nil),
    Concept("process", "Welding", "urn:p/weld", Seq("MIG welding"), Nil))

  test("searchColumn matches the set-level function") {
    import spark.implicits._
    val texts = Seq(
      ("a", "We do CNC and welding work"),
      ("b", "Nothing relevant here"),
      ("c", "MIG WELDING specialists"))
    val df = texts.toDF("id", "text")
    val out = BruteSearch.searchColumn(df, "text", vocab)
      .select("id", "brute_concepts").as[(String, Seq[String])].collect().toMap
    texts.foreach { case (id, text) =>
      assert(out(id).toSet == BruteSearch.search(text, vocab), s"row $id")
    }
  }

  test("matchAndSplitDf ≡ matchAndSplit on every row") {
    import spark.implicits._
    val rows = Seq(
      ("r1", Seq("CNC", "family owned", "MIG welding")),
      ("r2", Seq("nothing known")),
      ("r3", Seq.empty[String]))
    val df = rows.toDF("id", "results")
    val got = Mapping.matchAndSplitDf(df, "results", vocab)
      .select("id", "matched_concepts", "unmatched_keywords")
      .as[(String, Seq[String], Seq[String])].collect()
      .map(r => r._1 -> (r._2.toSet, r._3.toSet)).toMap
    rows.foreach { case (id, results) =>
      assert(got(id) == Mapping.matchAndSplit(vocab, results.toSet), s"row $id")
    }
  }
}
