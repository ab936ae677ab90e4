package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.ConnectedComponents
import graft.textops.{CurationOps, NearDup}

/** The full training-corpus curation flow, chained over the test
  * `documents` table — the composition a 100 TB pipeline runs, at
  * demo scale. Run: `sbt "runMain graft.examples.CurationPipelineDemo"`.
  *
  * Stage order matters and mirrors production practice:
  *  1. quality gate FIRST (cheapest per row, kills the most volume);
  *  2. decontamination next (broadcast probe, no shuffle);
  *  3. near-dup clustering on the survivors (the expensive stage runs
  *     on the smallest corpus) — symmetric MinHash pairs PLUS the
  *     directional containment sweep (small-doc-inside-big-doc copies
  *     Jaccard can't see) feed one components pass;
  *  4. per-domain budget after dedup (the FineWeb cap), then CCNet
  *     perplexity bucketing (keep head+middle, the paper's default);
  *  5. token-budget mix LAST so budgets are filled with clean,
  *     deduplicated, fluent documents only.
  *
  * Before everything: Unicode NFC canonicalization (composed and
  * decomposed spellings must collide in every hash downstream) and a
  * script-mix sanity gate.
  *
  * Alongside the text flow: soft-dedup weights grade the residual
  * duplication hard dedup leaves behind, and the semantic stage
  * (kmeans‖ codebook → cluster-balanced subsample → HNSW neighbors)
  * runs the same curation discipline in embedding space.
  */
object CurationPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-curation-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val raw = Tables.load(spark, sfDir, "documents")
      .repartition(4, $"doc_id")
    val total = raw.count()

    // 0. Unicode NFC canonicalization + script sanity — BEFORE any
    // hash-based stage (composed vs decomposed spellings must collide
    // in every dedup key downstream), and a wrong-script gate: this
    // corpus is Latin-script, so a high non-Latin fraction means
    // mislabeling or mojibake (real pipelines gate per language).
    val docs = graft.textops.TextAnalysis.scriptMix(
        raw.withColumn("text", graft.functions.TextNormalize.nfcCol($"text")),
        "text")
      .filter($"n_cp" === 0 || $"cyrillic_frac" + $"han_frac" <= 0.5)
      .select(raw.columns.map(col).toSeq: _*)
    val nScript = docs.count()

    // 1. Gopher-rule quality gate
    val keepIds = CurationOps.qualityGate(docs, "doc_id", "text")
      .filter($"keep" === 1).select($"doc_id")
    val quality = docs.join(keepIds, "doc_id")
    val nQuality = quality.count()

    // 2. benchmark decontamination (every 10th doc plays the eval set).
    // 8-gram collision: the synthetic corpus draws from a small
    // vocabulary, so short shingles collide everywhere — real pipelines
    // use 8-13-gram windows for exactly this reason (only genuinely
    // shared passages match).
    val bench = docs.filter($"doc_id" % 10 === 0)
    // persist: everything downstream (LSH pairs, counts, the mix) reads
    // the survivors several times — without this the quality gate and
    // the shingle-probe UDF recompute per action
    val clean = CurationOps.decontaminationFilter(
      quality.filter($"doc_id" % 10 =!= 0), bench, "doc_id", "text", n = 8)
      .persist()
    val nClean = clean.count()

    // 3. near-dup clustering -> drop non-canonical copies. Symmetric
    // MinHash pairs + DIRECTIONAL containment pairs (canonicalized to
    // undirected edges) feed one components pass, so a notice fully
    // quoted inside a longer page collapses into the same cluster even
    // though its Jaccard is negligible.
    val mhPairs = NearDup.minhashLshPairs(
      clean, "doc_id", "text", n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    val cPairs = NearDup.containmentPairs(
        clean, "doc_id", "text", n = 3, threshold = 0.9, maxPostings = 200)
      .select(least($"id_a", $"id_b").as("id_a"),
        greatest($"id_a", $"id_b").as("id_b")).distinct()
    val pairs = mhPairs.select($"id_a", $"id_b")
      .union(cPairs).distinct()
    val dropIds = ConnectedComponents.dedupClusters(pairs, "id_a", "id_b")
      .filter($"keep" === 0).select($"doc_id")
    val deduped = clean.join(dropIds, Seq("doc_id"), "left_anti").persist()
    val nDeduped = deduped.count()

    // 3b. soft-dedup weights on the survivors: hard dedup above removed
    // the copies; the GRADED duplication that remains (shared
    // boilerplate prefixes, partial overlaps) becomes a per-doc
    // sampling weight the trainer can consume instead of a drop
    val softW = CurationOps.softDedupWeights(deduped, "doc_id", "text", n = 3)
      .select(($"weight_e9".cast("double") / 1e9).as("w"))
      .agg(min($"w").as("min_w"), avg($"w").as("avg_w"))
      .as[(Double, Double)].head()

    // 3c. per-domain budget (the FineWeb cap): synthesize each doc's
    // crawl URL (the demo corpus carries a source, not a URL), walk the
    // PSL to its registrable domain, keep the k best docs per domain by
    // length — one boilerplate-heavy domain cannot flood the mix
    val withDomain = deduped
      .withColumn("url", concat(lit("https://www."), $"source", lit(".example"),
        ($"doc_id" % 7).cast("string"), lit(".co.uk/p/"), $"doc_id".cast("string")))
      .withColumn("etld1", graft.functions.UrlUtil.etld1Col($"url"))
    val capped = CurationOps.domainCapRetention(
        withDomain, "doc_id", "etld1", "n_chars", k = 40)
      .select(deduped.columns.map(col).toSeq: _*).persist()
    val nCapped = capped.count()

    // 4. CCNet bucketing: keep head+middle (the paper's default cut —
    // the tail third of token mass is the least-fluent text)
    val buckets = CurationOps.perplexityBuckets(capped, "doc_id", "text")
    val fluentIds = buckets.filter($"bucket" =!= "tail").select($"doc_id")
    val fluent = capped.join(fluentIds, "doc_id").persist()
    val nFluent = fluent.count()

    // 4b. corpus length statistics through the mergeable histogram
    // path (the thresholds the next curation iteration's gates read)
    val lenStats = CurationOps.lengthPercentilesByHistogram(fluent, "lang", "text")
      .agg(sum($"n_docs").as("docs"), max($"p99_tokens").as("p99"))
      .as[(Long, Double)].head()

    // 5. per-language token-budget mix
    val mixed = CurationOps.tokenBudgetMix(
      fluent, "doc_id", "lang", "text",
      budgets = Map("en" -> 2000L, "de" -> 1000L, "fr" -> 1000L, "es" -> 500L),
      salt = "demo")

    // 6. train a BPE vocabulary on the SURVIVING corpus (tokenizers are
    // learned after curation, not before — contaminated/duplicate text
    // would skew the merge statistics) and report the compression the
    // learned vocabulary buys over whitespace tokens.
    val merges = graft.textops.Bpe.train(fluent, "text", numMerges = 50)
    val bpeTok = graft.textops.BpeTokenizer(merges)
    val bpeCountUdf = udf((t: String) => bpeTok.count(t))
    val tokStats = fluent
      .select(size(graft.textops.TextTokens.wordsCol($"text")).cast("long").as("words"),
        bpeCountUdf($"text").cast("long").as("bpe"),
        length($"text").cast("long").as("chars"))
      .agg(sum($"words").as("words"), sum($"bpe").as("bpe"), sum($"chars").as("chars"))
      .as[(Long, Long, Long)].head()

    // 7. semantic stage over the embeddings table: distributed kmeans‖
    // codebook -> topic-balanced subsample (caps any one semantic
    // cluster's share of the mix) -> HNSW neighbors for the
    // retrieval/hard-negative stages
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centers = graft.vectors.Vectors.kmeansParallelFit(
      emb.select($"vec_id", $"embedding"), "vec_id", "embedding",
      k = 8, rounds = 2, oversample = 8.0, seed = 42, lloydIters = 2)
    val codebook = graft.vectors.Vectors.centroidsDF(spark, centers)
    val balanced = graft.vectors.Vectors.clusterBalancedSample(
      emb, "vec_id", "embedding", codebook, "cid", "cv", k = 20, salt = "demo")
    val nBalanced = balanced.count()
    val ann = graft.vectors.Vectors.hnswTopK(
      emb, emb.filter($"vec_id" < 4), "vec_id", "embedding", k = 3, dim = 64)
    val nAnn = ann.count()

    // 8. the LM quality pass the CCNet pipeline actually deploys:
    // train the KN bigram LM on the curated survivors, filter the RAW
    // corpus against it (predictable-text keep), and run the
    // coarse-to-fine retrieval cascade (binary -> SQ8 -> exact) the
    // serving side uses over the same embeddings
    val lm = CurationOps.knBigramLm(fluent, "text", minCount = 2)
    val lmKept = CurationOps.knDocFilter(docs, "doc_id", "text", lm,
        pThreshold = 0.03, maxRareFrac = 0.5)
      .filter($"keep" === 1).count()
    val cascade = graft.vectors.Vectors.cascadeTopK(
      emb, emb.filter($"vec_id" < 4), "vec_id", "embedding",
      k = 3, dim = 64, mBinary = 24, mSq = 8)
    val nCascade = cascade.count()

    println(f"corpus:        $total%6d docs")
    println(f"nfc + script:  $nScript%6d kept (NFC-canonicalized, wrong-script dropped)")
    println(f"quality gate:  $nQuality%6d kept")
    println(f"decontaminated:$nClean%6d kept (bench = every 10th doc)")
    println(f"deduplicated:  $nDeduped%6d kept (MinHash + containment edges)")
    println(f"soft weights:  min ${softW._1}%.3f avg ${softW._2}%.3f (graded residual duplication)")
    println(f"domain cap:    $nCapped%6d kept (<=40 per eTLD+1, best-by-length)")
    println(f"ccnet buckets: $nFluent%6d kept (head+middle token mass)")
    println(f"length stats:  ${lenStats._1}%6d docs, max per-lang p99 = ${lenStats._2}%.1f tokens (histogram path)")
    println(f"semantic mix:  $nBalanced%6d vectors kept (<=20 per kmeans|| cell); " +
      f"HNSW top-3 for 4 queries -> $nAnn%d rows")
    println(s"BPE (50 merges): ${tokStats._3} chars -> ${tokStats._2} tokens " +
      s"(whitespace words: ${tokStats._1})")
    println(f"KN LM filter:  $lmKept%6d of $total raw docs the curated-corpus LM finds predictable")
    println(f"cascade ANN:   binary->SQ8->exact top-3 for 4 queries -> $nCascade%d rows")
    println("mixed corpus by language:")
    mixed.groupBy($"lang")
      .agg(count(lit(1)).as("docs"), sum($"n_tokens").as("tokens"))
      .orderBy($"lang").show(false)
    spark.stop()
  }
}
