package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.chunk.{Chunker, ChunkingStrat}
import graft.exchange.MockExchange
import graft.functions.WhitespaceTokenizer
import graft.ingest.{Blocks, CorpusDoc, Dedup}
import graft.plans.{Ledger, Packer, RequestBlob, SearchChunkId, MappingId}
import graft.reconcile.{ChunkEvidence, Reconcile}
import graft.vocab.{BruteSearch, Concept}

/** SURVEY.md §7.3 minimum end-to-end slice: one manufacturer's scraped
  * text → certificates field → triples, with `MockExchange` standing in
  * for the LLM. Exercises every structural risk: chunk offsets as join
  * keys, set semantics, the async exchange boundary, and reconcile.
  *
  * Run: `sbt "runMain graft.examples.EndToEndSlice"`.
  */
object EndToEndSlice {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-slice")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val vocab = Seq(
      Concept("certificate", "ISO 9001", "urn:c/iso9001", Seq("ISO9001"), Nil),
      Concept("certificate", "AS9100", "urn:c/as9100", Nil, Nil))

    // 1. corpus: one company, 3 pages (one with boilerplate-free cert talk)
    val pages = Seq(
      "We are ISO 9001 certified since 1999.\nPrecision parts.",
      "Our AS9100 aerospace program.\nQuality first.",
      "Contact us for quotes.\nFamily owned and iso9001 certified shop.")
    val combined = pages.zipWithIndex.map { case (b, i) =>
      Blocks.format(s"https://acme.example/p$i", b)
    }.mkString
    val corpus = Blocks.shred(Seq(CorpusDoc("acme.example", "v1", combined)).toDS())
    val deduped = Dedup.dedupCorpus(corpus)

    // 2. chunks under the certificates strategy (tiny budget to force >1 chunk)
    val docs = deduped.groupByKey(p => (p.etld1, p.version_id))
      .mapGroups((k, it) => (k._1, k._2, it.toSeq.sortBy(_.page_seq).map(_.body).mkString("\n")))
    val chunks = Chunker.chunkDocs(docs, ChunkingStrat("certificates", 10, 0.0, 25), WhitespaceTokenizer)

    // 3. brute search per chunk (broadcast vocab)
    val withBrute = BruteSearch.searchColumn(chunks.toDF(), "text", vocab, "brute")

    // 4. request frontier: search requests per chunk + one mapping request
    val searchReqs = withBrute.select(
      concat_ws(">", $"etld1", lit("certificates"), lit("llm_search"), lit("chunk"),
        concat($"chunk_start", lit(":"), $"chunk_end")).as("custom_id"),
      $"text", $"tokens")
      .withColumn("body_json", RequestBlob.bodyJson($"custom_id", "gpt-4o-mini",
        lit("<search prompt>"), $"text", 7500))
      .withColumn("input_tokens", $"tokens")
    val emptyLedger = Seq.empty[(String, String, String)]
      .toDF("custom_id", "batch_id", "response_json")
    val frontier = Ledger.missingRequests(searchReqs, emptyLedger)
    println(s"frontier: ${frontier.count()} search requests to create")

    // 5. pack into JSONL files under limits
    val packed = Packer.pack(frontier.select("custom_id", "body_json", "input_tokens")
      .coalesce(1), Packer.PackLimits(2, 1000000, 1000000))
    packed.select("custom_id", "file_id").show(20, truncate = false)

    // 6. mock exchange answers per chunk content
    val exchange = new MockExchange((id, body) =>
      if (id.contains("llm_search")) {
        if (body.contains("AS9100")) """["AS9100"]"""
        else if (body.contains("iso9001")) """["iso9001 certified", "family owned"]"""
        else """["ISO 9001"]"""
      } else null)
    val responses = exchange.execute(frontier)

    // 7. reconcile: evidence rows + the (dummy-eligible) mapping response
    val evidence = withBrute.select($"etld1", lit("certificates").as("field_type"),
      $"chunk_start", $"chunk_end", $"brute",
      concat_ws(">", $"etld1", lit("certificates"), lit("llm_search"), lit("chunk"),
        concat($"chunk_start", lit(":"), $"chunk_end")).as("custom_id"))
      .join(responses, "custom_id")
      .withColumn("search_response", Ledger.responseContent($"response_json"))
      .select($"etld1", $"field_type", $"chunk_start", $"chunk_end", $"brute",
        $"search_response")
      .as[ChunkEvidence]
    val mappingResponses = Seq(("acme.example", "certificates",
      """{"iso9001 certified": "ISO 9001", "family owned": null}""")).toDS()
    val results = Reconcile.reconcileConceptsDs(vocab, evidence, mappingResponses)
    results.show(truncate = false)
    val r = results.collect().head.result

    // 8. triples for the certificates field
    val mfg = graft.emit.MfgOut("acme.example", "Acme", "https://acme.example",
      None, None, Nil, null, Nil, r.results, Nil, Nil, Nil, Nil)
    val triples = graft.emit.Triples.emit(Seq(mfg).toDS(), vocab)
    triples.collect().map(graft.emit.Triples.toNTriple).foreach(println)
    val (valid, nSubjects, issues) = graft.emit.Triples.validate(triples.collect().toSeq)
    println(s"rdf valid=$valid subjects=$nSubjects issues=${issues.mkString(";")}")
    spark.stop()
  }
}
