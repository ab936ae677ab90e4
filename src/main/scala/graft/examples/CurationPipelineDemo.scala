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
  *  4. CCNet perplexity bucketing on the deduplicated corpus (keep
  *     head+middle, the paper's default);
  *  5. token-budget mix LAST so budgets are filled with clean,
  *     deduplicated, fluent documents only.
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

    val docs = Tables.load(spark, sfDir, "documents")
      .repartition(4, $"doc_id")
    val total = docs.count()

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
      .agg(min($"weight").as("min_w"), avg($"weight").as("avg_w"))
      .as[(Double, Double)].head()

    // 4. CCNet bucketing: keep head+middle (the paper's default cut —
    // the tail third of token mass is the least-fluent text)
    val buckets = CurationOps.perplexityBuckets(deduped, "doc_id", "text")
    val fluentIds = buckets.filter($"bucket" =!= "tail").select($"doc_id")
    val fluent = deduped.join(fluentIds, "doc_id").persist()
    val nFluent = fluent.count()

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
    println(f"quality gate:  $nQuality%6d kept")
    println(f"decontaminated:$nClean%6d kept (bench = every 10th doc)")
    println(f"deduplicated:  $nDeduped%6d kept (MinHash + containment edges)")
    println(f"soft weights:  min ${softW._1}%.3f avg ${softW._2}%.3f (graded residual duplication)")
    println(f"ccnet buckets: $nFluent%6d kept (head+middle token mass)")
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
