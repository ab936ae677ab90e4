package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans._

class CustomIdSpec extends AnyFunSuite {
  test("render matches the reference grammar") {
    assert(SearchChunkId("example.com", "CERTIFICATE", 0, 9182).render ==
      "example.com>CERTIFICATE>llm_search>chunk>0:9182")
    assert(MappingId("example.com", "CERTIFICATE").render ==
      "example.com>CERTIFICATE>mapping")
    assert(SingleChunkId("example.com", "is_manufacturer", 0, 120).render ==
      "example.com>is_manufacturer>chunk>0:120")
  }

  test("parse round-trips every shape") {
    val ids: Seq[CustomId] = Seq(
      SearchChunkId("a.com", "PRODUCT", 10, 20),
      MappingId("a.com", "PRODUCT"),
      SingleChunkId("a.com", "business_desc", 0, 5))
    ids.foreach(id => assert(CustomId.parse(id.render).contains(id)))
    assert(CustomId.parse("garbage").isEmpty)
  }

  test("etld1 is the first >-segment (reference batch_file_station.py:212)") {
    assert(CustomId.etld1Of("example.com>X>mapping") == "example.com")
  }
}

class LedgerSpec extends SparkSpec {
  import spark.implicits._

  private def ledgerDf(rows: (String, String, String)*) =
    rows.toDF("custom_id", "batch_id", "response_json")

  test("missingRequests is the anti-join frontier") {
    val expected = Seq("a>F>mapping", "b>F>mapping", "c>F>mapping").toDF("custom_id")
    val ledger = ledgerDf(("a>F>mapping", null, null))
    val missing = Ledger.missingRequests(expected, ledger)
      .select("custom_id").as[String].collect().toSet
    assert(missing == Set("b>F>mapping", "c>F>mapping"))
  }

  test("incompleteRequests gates on answered rows only") {
    val expected = Seq("a", "b").toDF("custom_id")
    val ledger = ledgerDf(("a", "batch1", """{"ok":1}"""), ("b", "batch1", null))
    val incomplete = Ledger.incompleteRequests(expected, ledger)
      .select("custom_id").as[String].collect().toSet
    assert(incomplete == Set("b"))
  }

  test("upsertRequests never clobbers existing rows") {
    val ledger = ledgerDf(("a", "batch1", """{"answered":true}"""))
    val fresh = ledgerDf(("a", null, null), ("b", null, null))
    val merged = Ledger.upsertRequests(ledger, fresh)
      .select("custom_id", "response_json").as[(String, Option[String])]
      .collect().toMap
    assert(merged("a").contains("""{"answered":true}"""))
    assert(merged("b").isEmpty)
  }

  test("ingestResponses attaches blobs by custom_id, keeps old answers") {
    val ledger = ledgerDf(("a", "b1", null), ("b", "b1", """{"old":1}"""), ("c", null, null))
    val responses = Seq(("a", """{"new":1}""")).toDF("custom_id", "response_json")
    val out = Ledger.ingestResponses(ledger, responses)
      .select("custom_id", "response_json").as[(String, Option[String])]
      .collect().toMap
    assert(out("a").contains("""{"new":1}"""))
    assert(out("b").contains("""{"old":1}"""))
    assert(out("c").isEmpty)
  }

  test("resetMissing nulls batch_id only for unanswered unreturned rows") {
    val ledger = ledgerDf(
      ("a", "b1", null),            // shipped in b1, no result → reset
      ("b", "b1", """{"ok":1}"""),  // answered → keep
      ("c", "b2", null))            // different batch → keep
    val returned = Seq("b").toDF("custom_id")
    val out = Ledger.resetMissing(ledger, "b1", returned)
      .select("custom_id", "batch_id").as[(String, Option[String])]
      .collect().toMap
    assert(out("a").isEmpty)
    assert(out("b").contains("b1"))
    assert(out("c").contains("b2"))
  }

  test("T27: nullPresentFields / deletePresentRequests / deleteEmptyDeferred") {
    val deferred = Seq(
      ("a.com", "v1", """{"deferred":1}""", """["kw"]"""),
      ("b.com", "v1", """{"deferred":2}""", null))
      .toDF("etld1", "version_id", "certificates", "products")
    val present = Seq(("a.com", "certificates")).toDF("etld1", "field_type")
    val fields = Seq("certificates", "products")

    // a.com's certificates nulled, its products kept; b.com untouched
    val nulled = Ledger.nullPresentFields(deferred, present, fields)
    val byId = nulled.select("etld1", "certificates", "products")
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId("a.com") == (None, Some("""["kw"]""")))
    assert(byId("b.com") == (Some("""{"deferred":2}"""), None))

    // a.com's certificate requests deleted, everything else survives
    val ledger = Seq(
      ("a.com", "certificates", "a.com>certificates>mapping"),
      ("a.com", "products", "a.com>products>llm_search>chunk>0:5"),
      ("b.com", "certificates", "b.com>certificates>mapping"))
      .toDF("etld1", "field_type", "custom_id")
    val kept = Ledger.deletePresentRequests(ledger, present)
      .select("custom_id").as[String].collect().toSet
    assert(kept == Set("a.com>products>llm_search>chunk>0:5", "b.com>certificates>mapping"))

    // a fully-null deferred row is deleted; partially-filled rows stay
    import org.apache.spark.sql.functions.{lit, when}
    val emptied = Ledger.deleteEmptyDeferred(
      nulled.withColumn("products",
        when($"etld1" === "a.com", lit(null)).otherwise($"products")), fields)
    assert(emptied.select("etld1").as[String].collect().toSeq == Seq("b.com"))
  }

  test("responseContent extracts the assistant message") {
    val blob = """{"custom_id":"x","response":{"status_code":200,"body":{"choices":[{"message":{"content":"[\"ISO 9001\"]"}}]}}}"""
    val got = Seq(blob).toDF("response_json")
      .select(Ledger.responseContent(org.apache.spark.sql.functions.col("response_json")).as("c"))
      .as[String].head()
    assert(got == """["ISO 9001"]""")
  }
}

class RequestBlobSpec extends SparkSpec {
  import spark.implicits._

  test("blob line matches the fixture shape (input_tokens excluded)") {
    val df = Seq(("example.com>certificates>llm_search>chunk>0:9182", "<prompt>", "<chunk text>"))
      .toDF("custom_id", "prompt", "context")
    val line = df.select(RequestBlob.bodyJson(
      org.apache.spark.sql.functions.col("custom_id"), "gpt-4o-mini",
      org.apache.spark.sql.functions.col("prompt"),
      org.apache.spark.sql.functions.col("context"), 7500).as("j")).as[String].head()
    assert(line ==
      """{"custom_id":"example.com>certificates>llm_search>chunk>0:9182","body":{"model":"gpt-4o-mini","messages":[{"role":"system","content":"<prompt>"},{"role":"user","content":"<chunk text>"}],"max_tokens":7500}}""")
  }
}

class PackerSpec extends SparkSpec {
  import spark.implicits._

  private def mkRows(n: Int, tokens: Int, lineLen: Int) =
    (1 to n).map(i => (f"id$i%03d", "x" * lineLen, tokens))
      .toDF("custom_id", "body_json", "input_tokens")

  test("request-count limit closes files") {
    val packed = Packer.pack(mkRows(10, 1, 5).coalesce(1),
      Packer.PackLimits(maxRequests = 3, maxTokens = 1000, maxBytes = 1000000))
    val byFile = packed.groupBy("file_id").count()
      .as[(String, Long)].collect().toMap
    assert(byFile.values.toSeq.sorted == Seq(1L, 3L, 3L, 3L))
  }

  test("token limit closes files (line never split)") {
    val packed = Packer.pack(mkRows(6, 4, 5).coalesce(1),
      Packer.PackLimits(maxRequests = 100, maxTokens = 10, maxBytes = 1000000))
    // 4-token lines, cap 10 → 2 per file.
    val counts = packed.groupBy("file_id").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 2))
    assert(counts.size == 3)
  }

  test("byte limit accounts for newline per line") {
    // line of 9 bytes + \n = 10; cap 20 → 2 lines per file.
    val packed = Packer.pack(mkRows(4, 1, 9).coalesce(1),
      Packer.PackLimits(maxRequests = 100, maxTokens = 1000, maxBytes = 20))
    val counts = packed.groupBy("file_id").count().as[(String, Long)].collect()
    assert(counts.map(_._2).forall(_ == 2) && counts.length == 2)
  }

  test("oversized single line gets its own file instead of looping") {
    val rows = Seq(
      ("small1", "x" * 5, 1),
      ("huge", "y" * 500, 1),
      ("small2", "z" * 5, 1)).toDF("custom_id", "body_json", "input_tokens")
    val packed = Packer.pack(rows.coalesce(1),
      Packer.PackLimits(maxRequests = 100, maxTokens = 1000, maxBytes = 50))
    val byId = packed.select("custom_id", "file_id").as[(String, String)].collect().toMap
    assert(byId("huge") != byId("small1"))
    assert(byId("small2") != byId("huge"))
  }

  test("packing is per-partition namespaced") {
    val packed = Packer.pack(mkRows(20, 1, 5).repartition(2),
      Packer.PackLimits(maxRequests = 4, maxTokens = 1000, maxBytes = 1000000))
    val files = packed.select("file_id").distinct().as[String].collect()
    assert(files.forall(_.matches("\\d+-\\d+")))
    // every file respects the request cap
    val counts = packed.groupBy("file_id").count().as[(String, Long)].collect()
    assert(counts.forall(_._2 <= 4))
  }
}

class ExchangeSpec extends SparkSpec {
  import spark.implicits._
  import graft.exchange.MockExchange

  test("mock exchange round-trips content; missing ids produce no rows") {
    val requests = Seq(
      ("a>F>llm_search>chunk>0:5", """{"custom_id":"a"}"""),
      ("b>F>llm_search>chunk>0:5", """{"custom_id":"b"}"""))
      .toDF("custom_id", "body_json")
    val ex = new MockExchange((id, _) =>
      if (id.startsWith("a")) """["ISO 9001"]""" else null)
    val responses = ex.execute(requests)
    val rows = responses.as[(String, String)].collect().toMap
    assert(rows.keySet == Set("a>F>llm_search>chunk>0:5"))
    val content = responses
      .select(plans.Ledger.responseContent(org.apache.spark.sql.functions.col("response_json")).as("c"))
      .as[String].head()
    assert(content == """["ISO 9001"]""")
  }
}
