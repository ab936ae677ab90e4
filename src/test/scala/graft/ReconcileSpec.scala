package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.reconcile._
import graft.vocab.Concept

class ParsersSpec extends AnyFunSuite {
  test("search response: plain, fenced, broken-quoted, invalid") {
    assert(Parsers.parseSearchResponse("""["Front Brake Kit", "Rear Brake Kit"]""") ==
      Set("Front Brake Kit", "Rear Brake Kit"))
    assert(Parsers.parseSearchResponse("```json\n[\"item1\", \"item2\"]\n```") ==
      Set("item1", "item2"))
    assert(Parsers.parseSearchResponse("""["Item with "quotes" inside"]""") ==
      Set("""Item with "quotes" inside"""))
    assert(Parsers.parseSearchResponse("total garbage").isEmpty)
    assert(Parsers.parseSearchResponse("").isEmpty)
    assert(Parsers.parseSearchResponse(null).isEmpty)
  }

  test("mapping response: object with null values; non-object raises") {
    val m = Parsers.parseMappingResponse(
      """{"biotech": "Pharmaceutical Industry", "made-up": null}""")
    assert(m == Map("biotech" -> "Pharmaceutical Industry", "made-up" -> null))
    assertThrows[IllegalArgumentException](Parsers.parseMappingResponse("[1,2]"))
    assertThrows[IllegalArgumentException](Parsers.parseMappingResponse(""))
  }

  test("binary response parses; invalid raises") {
    val b = Parsers.parseBinaryResponse(
      """{"answer": true, "confidence": 85, "reason": "clearly a manufacturer"}""")
    assert(b == Parsers.BinaryResult(answer = true, 85, "clearly a manufacturer"))
    assertThrows[IllegalArgumentException](Parsers.parseBinaryResponse("nope"))
  }

  test("business desc parses") {
    val d = Parsers.parseBusinessDescResponse(
      """{"name": "Acme Corp", "description": "Makes widgets."}""")
    assert(d == Parsers.BusinessDesc("Acme Corp", "Makes widgets."))
  }

  test("addresses: defaults country US, uppercases, skips bad entries") {
    val out = Parsers.parseAddressesResponse(
      """[{"city":"Phoenix","state":"AZ","address_lines":["123 Main St"],"postal_code":"85001"},
        | {"city":"Tempe","state":"AZ","country":"us"},
        | "not an object"]""".stripMargin)
    assert(out.length == 2)
    assert(out(0).country == "US" && out(0).city == "Phoenix")
    assert(out(0).address_lines == Seq("123 Main St"))
    assert(out(1).country == "US")
    assert(Parsers.parseAddressesResponse("""{"city":"X"}""").isEmpty) // non-list
  }
}

class AddressMergeSpec extends AnyFunSuite {
  private val base = Address(null, "Phoenix", "AZ", "US", Nil, null, null,
    None, None, null, Nil, Nil)
  private val full = base.copy(name = "HQ", address_lines = Seq("123 Main St"),
    county = "Maricopa", postal_code = "85001", latitude = Some(33.4),
    longitude = Some(-112.0), phone_numbers = Seq("555-1", "555-2"),
    fax_numbers = Seq("555-9"))

  test("same base hash merges; fields first-non-null; A coords kept") {
    val b = base.copy(latitude = Some(1.0), longitude = Some(2.0),
      phone_numbers = Seq("555-1"))
    val m = AddressMerge.merge(full, b).get
    assert(m.name == "HQ" && m.postal_code == "85001")
    assert(m.latitude.contains(33.4) && m.longitude.contains(-112.0))
    assert(m.phone_numbers == Seq("555-1")) // intersection
    assert(m.fax_numbers.isEmpty)           // intersection with empty
  }

  test("conflicting postal codes do not merge") {
    assert(AddressMerge.merge(full, base.copy(postal_code = "85002")).isEmpty)
  }

  test("different city does not merge") {
    assert(AddressMerge.merge(full, base.copy(city = "Tucson")).isEmpty)
  }

  test("line-union quirk: disjoint address lines still merge by default") {
    val a = base.copy(address_lines = Seq("1 First St"))
    val b = base.copy(address_lines = Seq("2 Second St"))
    assert(AddressMerge.merge(a, b).nonEmpty)              // bug-compatible
    assert(AddressMerge.merge(a, b, lineUnionQuirk = false).isEmpty) // corrected
  }

  test("dedupe walks adjacent pairs in order") {
    val tucson = base.copy(city = "Tucson")
    val out = AddressMerge.dedupe(Seq(full, base, tucson, base.copy(name = "B2")))
    // full+base merge; tucson blocks the final base from reaching index 0.
    assert(out.length == 3)
    assert(out(0).name == "HQ")
    assert(out(1).city == "Tucson")
    assert(out(2).name == "B2")
  }
}

class GroundTruthSpec extends AnyFunSuite {
  import GroundTruth._

  test("concepts: only the last correction applies") {
    val logs = Seq(
      Correction(remove = Set("A"), add = Set("X")),
      Correction(remove = Set("B"), add = Set("Y")))
    assert(finalConceptResults(Set("A", "B", "C"), logs) == Set("A", "C", "Y"))
    assert(finalConceptResults(Set("A"), Nil) == Set("A"))
  }

  test("keywords: all corrections fold in order") {
    val logs = Seq(
      Correction(remove = Set("A"), add = Set("X")),
      Correction(remove = Set("X"), add = Set("Z")))
    assert(finalKeywordResults(Set("A", "B"), logs) == Set("B", "Z"))
  }
}

class ReconcileGoldenSpec extends AnyFunSuite {
  // FIXTURES.md §8: two chunks — one brute-only hit, one llm+mapping hit.
  private val vocab = Seq(
    Concept("certificate", "ISO 9001", "urn:c/iso9001", Seq("ISO9001"), Nil),
    Concept("certificate", "AS9100", "urn:c/as9100", Nil, Nil))

  test("golden: certificates reconcile over 2 chunks") {
    val chunks = Seq(
      ChunkEvidence("example.com", "certificates", 0, 9182,
        brute = Seq("ISO 9001"),
        search_response = """["ISO 9001"]"""),
      ChunkEvidence("example.com", "certificates", 9182, 15000,
        brute = Seq(),
        search_response = """["iso9001 certified", "family owned"]"""))
    val mappingResponse = """{"iso9001 certified": "ISO 9001", "family owned": null}"""

    val r = Reconcile.reconcileConcepts(vocab, chunks, mappingResponse)
    assert(r.results == Seq("ISO 9001"))
    assert(r.mapping == Map("ISO 9001" -> Seq("iso9001 certified")))
    assert(r.unmapped_llm == Seq("family owned"))
    assert(r.chunked_stats.length == 2)
    val c1 = r.chunked_stats(0)
    assert(c1.results == Seq("ISO 9001") && c1.mapping.isEmpty && c1.brute == Seq("ISO 9001"))
    val c2 = r.chunked_stats(1)
    assert(c2.results == Seq("ISO 9001"))
    assert(c2.llm == Seq("family owned", "iso9001 certified"))
    assert(c2.mapping == Map("ISO 9001" -> Seq("iso9001 certified")))
    assert(c2.unmapped_llm == Seq("family owned"))
  }

  test("dummy mapping response ({}): pure brute/vocab path") {
    val chunks = Seq(ChunkEvidence("e.com", "certificates", 0, 10,
      Seq("AS9100"), """["AS9100"]"""))
    val r = Reconcile.reconcileConcepts(vocab, chunks, "{}")
    assert(r.results == Seq("AS9100"))
    assert(r.mapping.isEmpty && r.unmapped_llm.isEmpty)
  }

  test("keyword reconcile unions chunk sets") {
    assert(Reconcile.reconcileKeywords(Seq(
      """["brackets", "flanges"]""", """["flanges", "tubes"]""", "garbage")) ==
      Seq("brackets", "flanges", "tubes"))
  }
}

class TriplesSpec extends AnyFunSuite {
  import graft.emit.Triples

  test("uri_strip percent-encodes everything outside the safe set") {
    assert(Triples.uriStrip("example.com") == "example.com")
    assert(Triples.uriStrip("ISO 9001") == "ISO%209001")
    assert(Triples.uriStrip("a/b&c") == "a%2Fb%26c")
    assertThrows[IllegalArgumentException](Triples.uriStrip(null))
  }

  private val vocab = Seq(
    Concept("certificate", "ISO 9001", "urn:c/iso9001", Nil, Nil),
    Concept("industry", "Aerospace", "urn:i/aero", Nil, Nil),
    Concept("process", "CNC Machining", "urn:p/cnc", Nil, Nil),
    Concept("material", "Aluminum", "urn:m/al", Nil, Nil),
    Concept("naics", "NAICS 332710", "urn:n/332710", Nil, Nil),
    Concept("naics", "NAICS 336411", "urn:n/336411", Nil, Nil),
    Concept("ownership", "Woman-Owned", "urn:o/woman-owned", Seq("WOSB"), Nil))
  private val byName = vocab.map(c => c.name -> c).toMap

  private val mfg = graft.emit.MfgOut(
    etld1 = "example.com", name = "Acme Corp", web_address = "https://example.com",
    founded_in = Some(1984), num_employees = Some(120),
    email_addresses = Seq("info@example.com"),
    business_desc = "Precision sheet metal.",
    products = Seq("Brake Kit"),
    certificates = Seq("ISO 9001"), industries = Seq("Aerospace"),
    process_caps = Seq("CNC Machining"), material_caps = Seq("Aluminum"),
    addresses = Seq(Address("HQ", "Phoenix", "AZ", "US", Seq("123 Main St"),
      null, "85001", Some(33.4), Some(-112.0), null, Seq("555-1"), Nil)),
    business_statuses = Seq("WOSB"),
    primary_naics = Some("332710"),
    secondary_naics = Seq("336411"))

  test("golden manufacturer emits the expected structure") {
    val ts = Triples.forManufacturer(mfg, byName)
    val mfgUri = s"${Triples.SDK}example.com-company-instance"
    def has(s: String, p: String, o: String) =
      assert(ts.exists(t => t.s == s && t.p == p && t.o == o), s"missing <$s> <$p> $o")

    has(mfgUri, Triples.RdfType, s"${Triples.IofCore}Manufacturer")
    has(mfgUri, Triples.RdfsLabel, "Acme Corp")
    has(mfgUri, s"${Triples.SDK}hasCertificate",
      s"${Triples.SDK}ISO%209001-certificate-individual")
    has(s"${Triples.SDK}ISO%209001-certificate-individual", Triples.RdfType, "urn:c/iso9001")
    // per-company process instance vs shared certificate individual
    has(mfgUri, s"${Triples.SDK}hasProcessCapability",
      s"${Triples.SDK}example.com-CNC%20Machining-process-capability-instance")
    // WKT geometry is POINT(lng lat)
    val wkt = ts.find(_.p == s"${Triples.Geo}asWKT").get
    assert(wkt.o == "POINT(-112.0 33.4)")
    assert(wkt.datatype == s"${Triples.Geo}wktLiteral")
    // founded year is a typed int literal
    val founded = ts.find(_.p == s"${Triples.SDK}hasOrganizationYearOfEstablishment").get
    assert(founded.o == "1984" && founded.datatype == Triples.XsdInt)
    // ownership status resolves via altLabel to a GLOBAL individual named
    // by the concept (reference ttl_generator_service.py:201-206)
    has(mfgUri, s"${Triples.SDK}hasOwnershipStatusClassifier",
      s"${Triples.SDK}Woman-Owned-ownership-status-individual")
    has(s"${Triples.SDK}Woman-Owned-ownership-status-individual",
      Triples.RdfType, "urn:o/woman-owned")
    // NAICS lookup key is "NAICS " + code; individual is {name}-individual
    has(mfgUri, s"${Triples.SDK}hasPrimaryNAICSClassifier",
      s"${Triples.SDK}NAICS%20332710-individual")
    has(s"${Triples.SDK}NAICS%20332710-individual", Triples.RdfType, "urn:n/332710")
    has(mfgUri, s"${Triples.SDK}hasSecondaryNAICSClassifier",
      s"${Triples.SDK}NAICS%20336411-individual")
    has(s"${Triples.SDK}NAICS%20336411-individual", Triples.RdfType, "urn:n/336411")
  }

  test("NAICS/ownership lenient skip, element raise, unknown-concept raise") {
    // strict=true with all three families missing: skipped, not raised
    // (reference hardcodes strict=False for them)
    val none = mfg.copy(business_statuses = Nil, primary_naics = None,
      secondary_naics = Nil)
    val ts = Triples.forManufacturer(none, byName, strict = true)
    assert(!ts.exists(_.p.endsWith("NAICSClassifier")) &&
      !ts.exists(_.p.endsWith("hasOwnershipStatusClassifier")))
    // empty element raises even lenient
    assertThrows[IllegalArgumentException](
      Triples.forManufacturer(mfg.copy(secondary_naics = Seq("")), byName))
    assertThrows[IllegalArgumentException](
      Triples.forManufacturer(mfg.copy(business_statuses = Seq("")), byName))
    // a code/status absent from the ontology raises regardless of strict
    assertThrows[IllegalArgumentException](
      Triples.forManufacturer(mfg.copy(primary_naics = Some("999999")), byName))
    assertThrows[IllegalArgumentException](
      Triples.forManufacturer(mfg.copy(business_statuses = Seq("Nonesuch")), byName))
  }

  test("latitude range check raises") {
    val bad = mfg.copy(addresses = Seq(mfg.addresses.head.copy(latitude = Some(91.0))))
    assertThrows[IllegalArgumentException](Triples.forManufacturer(bad, byName))
  }

  test("strict mode raises on missing required field; lenient skips") {
    val noName = mfg.copy(name = null)
    assertThrows[IllegalArgumentException](
      Triples.forManufacturer(noName, byName, strict = true))
    val ts = Triples.forManufacturer(noName, byName, strict = false)
    assert(!ts.exists(t => t.p == Triples.RdfsLabel && t.o == "Acme Corp"))
  }

  test("N-Triples serialization escapes literals") {
    val t = graft.emit.Triple("http://s", "http://p", "line1\n\"quoted\"", objectIsLiteral = true)
    assert(Triples.toNTriple(t) == """<http://s> <http://p> "line1\n\"quoted\"" .""")
  }

  test("validation flags non-http subjects") {
    val (ok, n, issues) = Triples.validate(Seq(
      graft.emit.Triple("http://a", "http://p", "x", objectIsLiteral = true),
      graft.emit.Triple("urn:bad", "http://p", "x", objectIsLiteral = true)))
    assert(!ok && n == 2 && issues.length == 1)
  }
}
