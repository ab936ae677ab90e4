package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.temporal.Temporal
import graft.textops.CurationOps

/** Corpus-curation and event-time operator coverage (q29-q34): the
  * training-data-pipeline surface beyond dedup/ANN — repetition
  * filters, benchmark decontamination, stratified sampling, TF-IDF
  * keywords, sessionization, and as-of joins. Every query is
  * DuckDB-oracled; floating-point outputs are exact integer ratios or
  * decimal-summed, per the engine-wide float policy.
  */
object Curation {

  import TextOps.docsParallel

  /** Every 10th document plays the "held-out benchmark" for the
    * decontamination check — mirrored literally in the oracle SQL.
    */
  private val BenchMod = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Gopher-style repetition signals: pure per-row array math,
    // zero shuffles (PlanCheck asserts no aggregate in the plan).
    "q29_repetition_stats" -> { (s, dir) =>
      import s.implicits._
      CurationOps.repetitionStats(docsParallel(s, dir), "doc_id", "text")
        .orderBy($"doc_id")
    },

    // ---- n-gram-collision decontamination of the corpus against a
    // benchmark subset (broadcast the benchmark shingle hashes).
    "q30_decontamination" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
      CurationOps.decontaminate(
          docs.filter($"doc_id" % BenchMod =!= 0),
          docs.filter($"doc_id" % BenchMod === 0),
          "doc_id", "text", n = 3)
        .orderBy($"doc_id")
    },

    // ---- TF-IDF top-3 characteristic terms per document (exact linear
    // idf — see CurationOps.tfidfTopK for the determinism argument).
    "q31_tfidf_topk" -> { (s, dir) =>
      import s.implicits._
      CurationOps.tfidfTopK(docsParallel(s, dir), "doc_id", "text", k = 3)
        .orderBy($"doc_id", $"rk")
    },

    // ---- deterministic stratified sample: 20 docs per language by
    // salted-md5 rank (reproducible training-mix balancing).
    "q32_stratified_sample" -> { (s, dir) =>
      import s.implicits._
      CurationOps.stratifiedSample(
          Tables.load(s, dir, "documents"), "doc_id", "lang", k = 20, salt = "strat")
        .select($"doc_id", $"lang", $"rk")
        .orderBy($"lang", $"rk")
    },

    // ---- gap-based sessionization of the event stream (30-minute
    // inactivity gap), via Spark's native session_window.
    "q33_sessionize" -> { (s, dir) =>
      import s.implicits._
      Temporal.sessionize(
          Tables.load(s, dir, "events"), "user_id", "ts", "value", "30 minutes")
        .orderBy($"user_id", $"session_start")
    },

    // ---- as-of join: each purchase matched to the user's most recent
    // view at-or-before it (union + running-last window — one shuffle,
    // no range join).
    "q34_asof_join" -> { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts".as("purchase_ts"))
      val views = e.filter($"event_type" === "view")
        .select($"event_id".as("view_event_id"), $"user_id", $"ts")
      Temporal.asofJoin(
          purchases, views, keyCol = "user_id",
          leftTsCol = "purchase_ts", rightTsCol = "ts",
          pickCols = Seq("view_event_id" -> "view_event_id", "ts" -> "view_ts"))
        .orderBy($"event_id")
    },

    // ---- dedup clustering: MinHash-LSH pairs (q17's exact parameters)
    // -> connected components -> cluster id + canonical-keep flag. The
    // step that turns pair detection into an actual dedup decision.
    "q35_dedup_clusters" -> { (s, dir) =>
      import s.implicits._
      val pairs = graft.textops.NearDup.minhashLshPairs(
        docsParallel(s, dir), "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      graft.graph.ConnectedComponents.dedupClusters(pairs, "id_a", "id_b")
        .orderBy($"doc_id")
    },

    // ---- leakage-safe splitting (q35's clusters become the SPLIT
    // key, so a near-dup pair can never straddle train/eval — the
    // failure q147 audits, prevented by construction): cluster-hash
    // buckets 80/10/10, singletons hash themselves.
    "q173_cluster_safe_split" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
      val pairs = graft.textops.NearDup.minhashLshPairs(
        docs, "doc_id", "text", n = 3, bands = 16, rowsPerBand = 4,
        threshold = 0.5)
      val clusters = graft.graph.ConnectedComponents.dedupClusters(
        pairs, "id_a", "id_b")
      CurationOps.clusterSafeSplit(docs.select($"doc_id"), "doc_id",
          clusters, "doc_id", "cluster_id",
          salt = "split", trainPct = 80, validPct = 10)
        .orderBy($"doc_id")
    },

    // ---- Gopher-rule composite quality gate: every signal an exact
    // integer ratio, keep = AND of the published thresholds (pure
    // per-row array math, zero shuffles like q29).
    "q36_quality_gate" -> { (s, dir) =>
      import s.implicits._
      CurationOps.qualityGate(docsParallel(s, dir), "doc_id", "text")
        .orderBy($"doc_id")
    },

    // ---- token-budget training mix: per-language budgets consumed in
    // salted-md5 order (deterministic mixture sampling by token count).
    "q37_token_budget_mix" -> { (s, dir) =>
      import s.implicits._
      CurationOps.tokenBudgetMix(
          docsParallel(s, dir), "doc_id", "lang", "text",
          budgets = MixBudgets, salt = "mix")
        .orderBy($"lang", $"cum_tokens")
    },

    // ---- curriculum mix schedule (the staged-training consumer of
    // the mix family: anneal from char-mass weights to doc-count
    // weights over 10 steps, a 1000-row budget Hamilton-apportioned
    // WITHIN each step): per-step exact-sum quotas, all integer, all
    // windows partitioned by step.
    "q170_mix_schedule" -> { (s, dir) =>
      import s.implicits._
      val srcs = docsParallel(s, dir).groupBy($"source")
        .agg(sum($"n_chars").as("w0"), count(lit(1)).as("w1"))
      CurationOps.mixSchedule(srcs, "source", "w0", "w1",
          steps = 10, budget = 1000L)
        .orderBy($"step", $"source")
    },

    // ---- per-stratum corpus length statistics: the distribution
    // summary that tunes curation thresholds (percentile_cont is the
    // SQL-standard linear interpolation on exact integer token counts,
    // so values agree across engines).
    "q38_length_percentiles" -> { (s, dir) =>
      import s.implicits._
      CurationOps.lengthPercentiles(docsParallel(s, dir), "lang", "text")
        .orderBy($"lang")
    },

    // ---- q38 through the VALUE-HISTOGRAM reformulation (the 100 TB
    // shape: percentile_cont sorts each stratum's full row set in one
    // aggregation buffer; the histogram path shuffles only the bounded
    // (stratum, length, count) table and windows over THAT). The
    // oracle is q38's naive percentile_cont query — the gate proves the
    // scale reformulation is bit-for-bit EXACT, not approximate.
    "q111_length_histogram" -> { (s, dir) =>
      import s.implicits._
      CurationOps.lengthPercentilesByHistogram(docsParallel(s, dir), "lang", "text")
        .orderBy($"lang")
    },

    // ---- concat-and-chop sequence packing: each doc's global token
    // span and training-sequence range in deterministic per-language
    // order (512-token sequences).
    "q39_sequence_pack" -> { (s, dir) =>
      import s.implicits._
      CurationOps.sequencePack(docsParallel(s, dir), "doc_id", "lang", "text",
          seqLen = 512, salt = "pack")
        .orderBy($"lang", $"start_offset")
    },

    // ---- C4-style cross-document segment dedup: repeated 3-word spans
    // removed from every doc but their first (doc_id, seg_idx) holder,
    // with the cleaned text reconstructed.
    "q40_segment_dedup" -> { (s, dir) =>
      import s.implicits._
      CurationOps.segmentDedup(docsParallel(s, dir), "doc_id", "text", segWords = SegWords)
        .orderBy($"doc_id")
    },

    // ---- PII scrub over a contact blob derived from real customer
    // columns (the synthetic corpus carries no digits or addresses, so
    // the fixture column manufactures deterministic emails/phones/SSNs
    // from c_custkey — including a phone-shaped digit run INSIDE an
    // email local part every third row, which is exactly the case the
    // email-first redaction order exists for).
    "q41_pii_scrub" -> { (s, dir) =>
      import s.implicits._
      val k = $"c_custkey"
      val blob = concat(
        $"c_name", lit(" "),
        lower(regexp_replace($"c_name", "Customer#", "c")), lit("@corp.example call "),
        format_string("(%03d) %03d-%04d", k % 1000, (k * 7) % 1000, k % 10000),
        lit(" ssn "),
        format_string("%03d-%02d-%04d", (k * 3) % 1000, k % 100, (k * 11) % 10000),
        when(k % 3 === 0,
            concat(lit(" alt x555."), format_string("%03d", (k % 900) + 100), lit("."),
              format_string("%04d", k % 10000), lit("@mail.example")))
          .otherwise(lit("")))
      val counts = graft.textops.TextAnalysis.piiCounts($"text")
      Tables.load(s, dir, "customer")
        .select(k, blob.as("text"))
        .select(k,
          counts.getField("emails").as("emails"),
          counts.getField("phones").as("phones"),
          counts.getField("ssns").as("ssns"),
          graft.textops.TextAnalysis.redactPii($"text").as("redacted"))
        .orderBy(k)
    },

    // ---- unigram surprisal in whole bits: the exact-integer surrogate
    // for LM-perplexity quality scoring (rare-word-heavy docs score
    // high).
    "q42_unigram_surprisal" -> { (s, dir) =>
      import s.implicits._
      CurationOps.unigramSurprisal(docsParallel(s, dir), "doc_id", "text")
        .orderBy($"doc_id")
    },

    // ---- bigram conditional surprisal: next-token predictability in
    // whole bits — the exact-integer surrogate for LM-perplexity
    // filtering one model order up from q42 (incoherent word salad
    // scores high even when every individual word is common).
    "q56_bigram_surprisal" -> { (s, dir) =>
      import s.implicits._
      CurationOps.bigramSurprisal(docsParallel(s, dir), "doc_id", "text")
        .orderBy($"doc_id")
    },

    // ---- boundary-preserving next-fit packing: q39's complement for
    // objectives that must not split documents; sequential fold made
    // scalable by per-(lang, shard) secondary sort.
    "q43_pack_next_fit" -> { (s, dir) =>
      import s.implicits._
      CurationOps.packNextFit(docsParallel(s, dir), "doc_id", "lang", "text",
          seqLen = 512, nShards = PackShards, salt = "packfit")
        .withColumnRenamed("stratum", "lang")
        .orderBy($"lang", $"shard", $"bin_idx", $"bin_offset")
    },

    // ---- bucketed time-proximity range join: views within ±5 minutes
    // of each purchase (any user) — the equi-join form of a non-equi
    // |Δt| predicate.
    "q44_time_proximity" -> { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"event_id", $"ts".as("purchase_ts"))
      val views = e.filter($"event_type" === "view").select($"ts")
      graft.temporal.Temporal.proximityAgg(
          purchases, views, Seq("event_id"), "purchase_ts", "ts", radiusSec = 300)
        .withColumnRenamed("n_near", "n_near_views")
        .orderBy($"event_id")
    },

    // ---- hopping (sliding) event-time window: 10-minute windows every
    // 5 minutes — each event lands in exactly size/slide windows (the
    // overlap factor is the explode cost, the knob a 100 TB stream
    // tunes). Same `window()` operator Structured Streaming uses.
    "q50_hopping_window" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select($"w.start".as("w_start"), $"w.end".as("w_end"),
          $"event_type", $"n_events", $"sum_value")
        .orderBy($"w_start", $"event_type")
    },

    // ---- PPS systematic sample: token-weighted document selection in
    // exact integer arithmetic (every 500th token plants a sampling
    // point; the doc covering it is selected).
    "q55_pps_sample" -> { (s, dir) =>
      import s.implicits._
      CurationOps.ppsSample(docsParallel(s, dir), "doc_id", "lang", "text",
          step = 500, salt = "pps")
        .orderBy($"lang", $"pick_point")
    },

    // ---- ordered funnel staging: the farthest view → click → purchase
    // chain each user completes IN ORDER (a purchase before any view
    // does not count). Two stacked cumulative-max windows over the same
    // (user, ts, event_id) total order — strictly-before frames, ONE
    // shuffle, then the per-user rollup; never a self-join of the event
    // log against itself per stage.
    "q60_funnel_stages" -> { (s, dir) =>
      import s.implicits._
      Temporal.funnelStages(Tables.load(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type",
          stages = Seq("view", "click", "purchase"))
        .orderBy($"user_id")
    },

    // ---- windowed funnel: q60 with a 30-minute conversion horizon per
    // transition — chain flags become chain-completion timestamps so
    // "within horizon of the closest prior completion" stays a
    // cumulative-max window (still one shuffle, no self-join).
    "q63_funnel_windowed" -> { (s, dir) =>
      import s.implicits._
      Temporal.funnelStagesWithin(Tables.load(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type",
          stages = Seq("view", "click", "purchase"), horizonSec = 1800L)
        .orderBy($"user_id")
    },

    // ---- weekly retention cohorts: users bucketed by first-activity
    // week × how many return in week 0, +1, +2, … — the engagement
    // matrix behind every retention curve. Two aggregations keyed on
    // user_id (AQE reuses the hash partitioning), then a broadcast-size
    // rollup; week offsets are exact integer day arithmetic on
    // week-truncated dates, so both engines agree bit-for-bit.
    // cohort_week ships as an ISO yyyy-MM-dd STRING at the gate: a DATE
    // column round-trips as datetime.date from Spark parquet but as a
    // midnight Timestamp from DuckDB's pandas materialization — strings
    // are identical under any harness (operator itself stays DateType).
    "q61_retention_cohorts" -> { (s, dir) =>
      import s.implicits._
      Temporal.retentionCohorts(Tables.load(s, dir, "events"), "user_id", "ts")
        .withColumn("cohort_week", date_format($"cohort_week", "yyyy-MM-dd"))
        .orderBy($"cohort_week", $"week_offset")
    },

    // ---- lead/lag inter-event gaps per user: the dwell-time signal
    // (windows over the (user, ts, event_id) total order — deterministic
    // tiebreak, so both engines agree row-for-row).
    "q47_event_gaps" -> { (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, dir, "events")
        .select($"event_id", $"user_id", $"ts", $"event_type",
          (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))).as("prev_gap_us"),
          (unix_micros(lead($"ts", 1).over(w)) - unix_micros($"ts")).as("next_gap_us"),
          lag($"event_type", 1).over(w).as("prev_type"))
        .orderBy($"event_id")
    },

    // ---- fastText-shaped hashed linear classifier: tokens hash into
    // weight buckets, document score = mean bucket weight. Weights are
    // derived from the bucket id (oracle-mirrorable stand-in for
    // trained parameters); the plan is the production shape — broadcast
    // weight join + one map-side-combined aggregate.
    "q65_quality_classifier" -> { (s, dir) =>
      import s.implicits._
      CurationOps.hashedLinearScore(docsParallel(s, dir), "doc_id", "text",
          buckets = ClassifierBuckets)
        .orderBy($"doc_id")
    },

    // ---- Zipf frequency-spectrum fit over the corpus vocabulary:
    // ln(freq) ~ ln(rank) by the explicit moment formula (identical
    // sums both engines — a builtin regr_slope is free to use a
    // different update scheme per engine).
    "q66_zipf_law" -> { (s, dir) =>
      CurationOps.zipfSlope(docsParallel(s, dir), "text")
    },

    // ---- alpha=0.5 temperature mixture over sources: per-stratum
    // token targets proportional to sqrt(stratum mass), filled in
    // salted-md5 order. Integer-quantized weights keep the target
    // arithmetic exact across engines.
    "q67_temperature_mix" -> { (s, dir) =>
      import s.implicits._
      CurationOps.temperatureMix(docsParallel(s, dir), "doc_id", "source",
          "text", totalBudget = TempMixBudget, salt = "temp")
        .orderBy($"source", $"cum_tokens")
    },

    // ---- per-document character entropy: zero-shuffle per-row array
    // math (the q29/q36 convention) — the gibberish/boilerplate signal.
    "q68_char_entropy" -> { (s, dir) =>
      import s.implicits._
      import graft.textops.TextAnalysis
      // n_chars counts the SAME filtered char-split both engines use for
      // the entropy (Spark length() is UTF-16 code units, DuckDB len()
      // is code points — they diverge on non-BMP chars; the char-split
      // count is code points by construction on both sides)
      docsParallel(s, dir).select($"doc_id",
          size(filter(split($"text", ""), c => length(c) > 0)).as("n_chars"),
          TextAnalysis.charAlphabetCol($"text").as("n_alphabet"),
          TextAnalysis.charEntropyCol($"text").as("entropy"))
        .orderBy($"doc_id")
    },

    // ---- BM25 retrieval: rank the corpus against a bag of query terms
    // (the query side of q62's inverted index). Corpus stream filtered
    // to query terms pre-shuffle; df + corpus stats broadcast; top-k as
    // TakeOrderedAndProject.
    "q69_bm25_search" -> { (s, dir) =>
      import s.implicits._
      graft.textops.Retrieval.bm25TopK(docsParallel(s, dir), "doc_id", "text",
          Bm25Query, k = Bm25K)
        .orderBy($"rk")
    },

    // ---- burst detection over per-type hourly event counts (crawl/
    // ingest monitoring): z-score vs the trailing 6 hours, exact
    // integer window sums, z rounded before the flag compare.
    "q117_event_bursts" -> { (s, dir) =>
      import s.implicits._
      Temporal.eventBursts(Tables.load(s, dir, "events"), "event_type", "ts")
        .orderBy($"event_type", $"hour")
    },

    // ---- query-likelihood (Dirichlet μ=2000) ranking over the same
    // query — the LM-based ranker beside BM25; candidates score ALL
    // query terms (absent terms contribute smoothed background mass).
    "q116_ql_search" -> { (s, dir) =>
      import s.implicits._
      graft.textops.Retrieval.qlTopK(docsParallel(s, dir), "doc_id", "text",
          Bm25Query, k = Bm25K)
        .orderBy($"rk")
    },

    // ---- canonical selection over q17's near-dup clusters: keep the
    // highest-quality doc per cluster (the actual dedup decision q35's
    // min-id convention approximates).
    "q70_canonical_dedup" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
      val pairs = graft.textops.NearDup.minhashLshPairs(
        docs, "doc_id", "text", n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      CurationOps.canonicalDedup(docs, "doc_id", "text", pairs, "id_a", "id_b")
        .orderBy($"doc_id")
    },

    // ---- DSIR-style importance weights against the English subcorpus
    // as the selection target: hashed unigram+bigram buckets, add-1
    // smoothed log-likelihood ratio per doc.
    "q71_importance_weights" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
      CurationOps.importanceWeights(docs, docs.filter($"lang" === "en"),
          "doc_id", "text", buckets = DsirBuckets)
        .orderBy($"doc_id")
    },

    // ---- epoch-repeat upsampling: every source replayed whole toward
    // a per-source token budget (integer epochs, capped) — the
    // repetition half of a UniMax-style mixing policy.
    "q73_epoch_repeat" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
        .withColumn("n_tokens", size(graft.textops.TextTokens.wordsCol($"text")))
      CurationOps.epochRepeat(docs, "doc_id", "source", "n_tokens",
          budgetPerStratum = EpochBudget, maxEpochs = EpochMax)
        .orderBy($"doc_id", $"epoch")
    },

    // ---- reciprocal-rank fusion: q69's BM25 list fused with a
    // conjunctive term-coverage list (distinct query terms, then total
    // tf — all-integer ordering) — rank-based hybrid retrieval. Both
    // input lists are top-Bm25K frames, so fusion never touches
    // corpus-sized data.
    "q75_rrf_fusion" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = docsParallel(s, dir)
      // one tokenization pass serves BM25 (stats + hits) and the
      // coverage table — the digest is checkpointed inside
      val dig = graft.textops.Retrieval.queryTermDigest(
        docs, "doc_id", "text", Bm25Query)
      val bm = graft.textops.Retrieval.bm25FromDigest(dig, "doc_id",
        Bm25Query, k = Bm25K).select($"doc_id", $"rk")
      val tf = dig
        .select($"doc_id", explode($"__qhits").as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      // bounded top-k rank (post-limit frame): non-foldable constant
      // partition key, the bm25TopK convention — no global window
      val covW = Window.partitionBy(pmod($"doc_id", lit(1)))
        .orderBy($"nq".desc, $"tft".desc, $"doc_id")
      val cov = tf.groupBy($"doc_id")
        .agg(countDistinct($"term").as("nq"), sum($"tf").as("tft"))
        .orderBy($"nq".desc, $"tft".desc, $"doc_id").limit(Bm25K)
        .withColumn("rk", row_number().over(covW))
        .select($"doc_id", $"rk")
      graft.textops.Retrieval.rrfFuse(Seq(bm, cov), "doc_id", "rk",
          rrfK = RrfK, topK = RrfTopK)
        .orderBy($"rk")
    },

    // ---- nDCG@k over the q69/q75 rankings: graded relevance = distinct
    // query terms matched (exact integer both engines), so the evaluator
    // runs on the same two top-k lists the retrieval suite produces. The
    // coverage list ranks BY relevance (ties broken like the ideal
    // order), so its ndcg is exactly 1 — a built-in sanity anchor; the
    // BM25 list scores by tf/dl too, so its ndcg is a real < 1 value.
    "q76_ndcg_eval" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = docsParallel(s, dir)
      // one tokenization pass serves BM25 (stats + hits), coverage,
      // and relevance — the digest is checkpointed inside
      val dig = graft.textops.Retrieval.queryTermDigest(
        docs, "doc_id", "text", Bm25Query)
      val bm = graft.textops.Retrieval.bm25FromDigest(dig, "doc_id",
          Bm25Query, k = Bm25K)
        .select(lit("bm25").as("query_id"), $"doc_id", $"rk")
      val tf = dig
        .select($"doc_id", explode($"__qhits").as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      // bounded top-k rank (post-limit frame): non-foldable constant
      // partition key, the bm25TopK convention — no global window
      val covW = Window.partitionBy(pmod($"doc_id", lit(1)))
        .orderBy($"nq".desc, $"tft".desc, $"doc_id")
      val cov = tf.groupBy($"doc_id")
        .agg(countDistinct($"term").as("nq"), sum($"tf").as("tft"))
        .orderBy($"nq".desc, $"tft".desc, $"doc_id").limit(Bm25K)
        .withColumn("rk", row_number().over(covW))
        .select(lit("coverage").as("query_id"), $"doc_id", $"rk")
      val rel = tf.groupBy($"doc_id")
        .agg(countDistinct($"term").cast("double").as("rel"))
      val ranked = bm.unionByName(cov)
        .join(rel, Seq("doc_id"), "left")
        .na.fill(0.0, Seq("rel"))
      graft.textops.Retrieval.ndcgAtK(ranked, "query_id", "rk", "rel", k = NdcgK)
        .orderBy($"query_id")
    },

    // ---- winnowed-span cross-doc dedup: the shift-robust upgrade of
    // q40 — chunk boundaries are content-defined local minima of
    // shingle hashes, so a one-word insert upstream can't hide a
    // duplicated tail (q40's fixed windows would all shift).
    "q77_span_dedup" -> { (s, dir) =>
      import s.implicits._
      CurationOps.winnowedSpanDedup(docsParallel(s, dir), "doc_id", "text",
          shingleWords = SpanK, winnowRadius = SpanR)
        .orderBy($"doc_id")
    },

    // ---- CCNet head/middle/tail perplexity buckets: docs ordered by
    // the q42 surprisal surrogate, split at 1/3 and 2/3 of cumulative
    // token mass (exact-integer boundary math; two-phase cumsum — no
    // single-partition window).
    "q79_perplexity_buckets" -> { (s, dir) =>
      import s.implicits._
      CurationOps.perplexityBuckets(docsParallel(s, dir), "doc_id", "text")
        .orderBy($"doc_id")
    },

    // ---- deterministic training order: seeded md5 permutation +
    // round-robin shards via the two-phase global rank (no
    // single-partition window).
    "q82_train_order" -> { (s, dir) =>
      import s.implicits._
      CurationOps.trainOrder(docsParallel(s, dir), "doc_id",
          seed = TrainSeed, shards = TrainShards)
        .orderBy($"doc_id")
    },

    // ---- FIM span split: half the docs (hash-selected) cut at two
    // hash-derived character offsets into prefix/middle/suffix —
    // infilling-model data prep, pure per-row column math.
    "q83_fim_split" -> { (s, dir) =>
      import s.implicits._
      CurationOps.fimSplit(docsParallel(s, dir), "doc_id", "text")
        .orderBy($"doc_id")
    },

    // ---- T5-style span corruption (q83's denoising sibling): block-
    // deterministic span placement, sentinel-indexed corrupted/targets
    // pair, ~10% noise density — every column oracle-checkable because
    // the placement law is pure salted-hash integer math.
    "q171_span_corruption" -> { (s, dir) =>
      import s.implicits._
      CurationOps.spanCorruption(docsParallel(s, dir), "doc_id", "text",
          salt = "sc")
        .orderBy($"doc_id")
    },

    // ---- best-representative dedup (q81's keep rule upgraded: among
    // normalized-key duplicates keep the LONGEST raw text, not the
    // smallest id): every third doc gains an upper-cased variant with
    // appended punctuation — same dedup key, longer raw bytes — and
    // must LOSE its kept flag to it.
    "q172_dedup_keep_best" -> { (s, dir) =>
      import s.implicits._
      val base = docsParallel(s, dir).select($"doc_id", $"text")
      val variants = base.filter($"doc_id" % 3 === 0).select(
        ($"doc_id" + 100000L).as("doc_id"),
        concat(upper($"text"), lit(" !!!")).as("text"))
      val all = base.unionByName(variants)
        .withColumn("q", length($"text").cast("long"))
      CurationOps.dedupKeepBest(all, "doc_id", "text", "q")
        .orderBy($"doc_id")
    },

    // ---- per-doc contamination fraction vs the q30 benchmark split:
    // every corpus doc scored (0.0 when clean), exact-integer ratio —
    // the thresholdable report q30's flag list can't give.
    "q85_contamination_score" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
      CurationOps.contaminationScore(
          docs.filter($"doc_id" % BenchMod =!= 0),
          docs.filter($"doc_id" % BenchMod === 0),
          "doc_id", "text", n = 3)
        .orderBy($"doc_id")
    },

    // ---- EXACT duplicated-span removal (Lee et al. ExactSubstr
    // guarantee): every duplicated word span >= ExactSpanT is found via
    // per-position T-shingle hashes — the exactness q77's winnowing
    // only approximates (a span whose chunk boundaries differ between
    // copies slips through winnowing; it cannot slip through this).
    "q86_exact_span_dedup" -> { (s, dir) =>
      import s.implicits._
      CurationOps.exactSpanDedup(docsParallel(s, dir), "doc_id", "text",
          minSpanWords = ExactSpanT)
        .orderBy($"doc_id")
    },

    // ---- leakage-safe grouped split: every SOURCE lands wholly in
    // train, val, or test by a salted 60-bit hash of the group key
    // alone — group-level assignment keeps shared-content groups from
    // straddling an evaluation boundary and is stable under
    // incremental ingest. Broadcast group table (distinct sources ≪
    // corpus — the corpus never shuffles); integer hash thresholds, no
    // float boundary.
    "q91_grouped_split" -> { (s, dir) =>
      import s.implicits._
      CurationOps.groupedSplit(
          docsParallel(s, dir).select($"doc_id", $"source"),
          "doc_id", "source", seed = SplitSeed, trainPct = 80, valPct = 10)
        .orderBy($"doc_id")
    },

    // ---- corpus snapshot diff: the previous corpus version is
    // derived deterministically on BOTH engines (drop every 11th doc →
    // 'added'; append ' EDIT' to every 13th → 'changed'; retire a
    // shifted copy of every 17th → 'removed'), then classified by one
    // full-outer id join over (id, md5) — text never crosses the
    // shuffle. The audit table an incremental curation run starts
    // from.
    "q95_snapshot_diff" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir).select($"doc_id", $"text")
      val old = docs.filter($"doc_id" % 11 =!= 0)
        .withColumn("text",
          when($"doc_id" % 13 === 0, concat($"text", lit(" EDIT")))
            .otherwise($"text"))
        .unionByName(docs.filter($"doc_id" % 17 === 0)
          .select(($"doc_id" + 1000000L).as("doc_id"),
            lit("retired document").as("text")))
      CurationOps.snapshotDiff(old, docs, "doc_id", "text")
        .orderBy($"doc_id")
    },

    // ---- q35's clustering through the alternating large-star/
    // small-star path, FORCED distributed (localEdgeLimit = 0):
    // O(log² n)-round CC gated against the same transitive-closure
    // oracle as the min-label path — the two algorithms must agree
    // exactly.
    "q84_dedup_clusters_star" -> { (s, dir) =>
      import s.implicits._
      val pairs = graft.textops.NearDup.minhashLshPairs(
        docsParallel(s, dir), "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      graft.graph.ConnectedComponents.dedupClusters(pairs, "id_a", "id_b",
          algorithm = "star", localEdgeLimit = 0)
        .orderBy($"doc_id")
    },

    // ---- interpolated Kneser-Ney bigram LM trained corpus-wide: one
    // row per bigram type (count ≥ 5) with raw/context/continuation
    // counts and the smoothed probability. D = 3/4 makes every term a
    // ratio of exact integers — three fixed-order IEEE divisions, no
    // float accumulation anywhere (doc-level scores stay with q56's
    // whole-bit surprisal). One bigram groupBy shuffle; the
    // context/continuation tables are vocabulary-sized broadcasts.
    "q103_kn_bigram_lm" -> { (s, dir) =>
      import s.implicits._
      CurationOps.knBigramLm(docsParallel(s, dir), "text", minCount = 5)
        .orderBy($"w1", $"w2")
    },

    // ---- PMI collocation mining (Church & Hanks): top bigrams by
    // p(w1,w2)/(p(w1)p(w2)) with the log DROPPED — monotone, so the
    // ranking is identical and no cross-engine ln enters the gate; the
    // ratio is one fixed left-associative IEEE chain over exact
    // integer counts. Counts are the same additive statistics the
    // incremental KN session maintains.
    "q126_pmi_collocations" -> { (s, dir) =>
      import s.implicits._
      CurationOps.pmiCollocations(docsParallel(s, dir), "text",
        minCount = 5, k = 30)
    },

    // ---- corpus drift: per-word chi-square contributions of the two
    // corpus halves against the pooled expectation — each row an
    // independent fixed float nest over integer counts (nothing float
    // accumulates across rows), top-30 most divergent words.
    "q127_corpus_drift" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
      CurationOps.corpusDrift(
        docs.filter($"doc_id" % 3 =!= 0), docs.filter($"doc_id" % 3 === 0),
        "text", minTotal = 10, k = 30)
    },

    // ---- vocabulary coverage / OOV rate: corpus top-20 vocabulary
    // (count desc, word asc — deterministic at the boundary), per-doc
    // out-of-vocabulary token mass. The vocab is a TakeOrdered over
    // the distinct-word rollup, broadcast back into the (doc, word)
    // relation; integer-over-integer fraction.
    "q128_vocab_coverage" -> { (s, dir) =>
      import s.implicits._
      CurationOps.vocabCoverage(docsParallel(s, dir), "doc_id", "text",
          vocabSize = 20)
        .orderBy($"doc_id")
    },

    // ---- pairwise Jensen-Shannon divergence between per-language
    // unigram distributions — the corpus-similarity matrix. Per-word
    // pair terms are rounded to micro fixed-point BEFORE the cross-row
    // sum (exact long arithmetic, partition-order invariant — the PCA
    // moments discipline).
    "q129_js_divergence" -> { (s, dir) =>
      import s.implicits._
      CurationOps.jsDivergenceByGroup(docsParallel(s, dir), "lang", "text",
          groupValues = Seq("de", "en", "es", "fr", "zh"))
        .orderBy($"g_a", $"g_b")
    },

    // ---- content-defined segmentation (CDC at word granularity):
    // boundaries where the engine-wide 60-bit hash of the trailing
    // 3-word span ≡ 0 mod 8 — shift-robust block table (chunk widths
    // + md5s). Pure per-row HOF math until the final chunk emission.
    "q131_cdc_segments" -> { (s, dir) =>
      import s.implicits._
      CurationOps.cdcSegments(docsParallel(s, dir), "doc_id", "text",
          window = 3, mask = 7)
        .orderBy($"doc_id", $"chunk_idx")
    },

    // ---- CDC block-level dedup audit: docs augmented with a fixed
    // boilerplate tail on doc_id % 4 == 0, so identical content-defined
    // blocks recur across documents at SHIFTED offsets — exactly the
    // case a fixed-grid segmenter misattributes; first occurrence by
    // (doc_id, chunk_idx) keeps, per-doc duplicate counts + word mass.
    "q133_cdc_dedup" -> { (s, dir) =>
      import s.implicits._
      val aug = docsParallel(s, dir).select($"doc_id",
        concat($"text", when($"doc_id" % 4 === 0, lit(" " + CdcBoiler))
          .otherwise(lit(""))).as("text"))
      CurationOps.cdcDedupStats(aug, "doc_id", "text")
        .orderBy($"doc_id")
    },

    // ---- CDC block-level snapshot diff (the q95 old/new convention:
    // PREFIX edits on doc_id % 13, docs missing from old on % 11): per
    // new doc, how many content-defined blocks the old version already had
    // — the incremental re-embed/re-index bill, which CDC keeps small
    // under edits where a fixed grid would invalidate every block
    // after the edit point.
    "q134_cdc_block_diff" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir).select($"doc_id", $"text")
      val old = docs.filter($"doc_id" % 11 =!= 0)
        .withColumn("text",
          when($"doc_id" % 13 === 0, concat(lit("EDIT PREFIX "), $"text"))
            .otherwise($"text"))
      CurationOps.cdcBlockDiff(old, docs, "doc_id", "text")
        .orderBy($"doc_id")
    },

    // ---- Heaps'-law vocabulary-growth fit: V(N) sampled at every doc
    // boundary via two two-phase cumsums (doc offsets, then
    // first-occurrence events merged with boundaries), regression
    // moments in nano fixed-point before the cross-row sum.
    "q139_heaps_law" -> { (s, dir) =>
      import s.implicits._
      CurationOps.heapsLaw(docsParallel(s, dir), "doc_id", "text")
    },

    // ---- Efraimidis-Spirakis weighted sample without replacement:
    // deterministic u from the salted 60-bit md5, key = -ln(u)/w, k
    // smallest keys ARE the sample (a mergeable bottom-k — the
    // streaming twin folds on it). One TakeOrdered; weight = token
    // mass.
    "q132_weighted_sample" -> { (s, dir) =>
      import s.implicits._
      val toks = docsParallel(s, dir).select($"doc_id",
        size(graft.textops.TextTokens.wordsCol($"text")).cast("long")
          .as("n_tokens"))
      CurationOps.weightedSample(toks, "doc_id", "n_tokens",
        k = 60, salt = "es")
    },

    // ---- the trained KN LM applied as the CCNet-style document
    // filter: integer unseen/rare-bigram counters against the
    // broadcast LM (float comparisons feed counters — nothing float
    // accumulates), unrounded fraction, keep flag.
    "q104_kn_doc_filter" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
      val lm = CurationOps.knBigramLm(docs, "text", minCount = 5)
      CurationOps.knDocFilter(docs, "doc_id", "text", lm,
          pThreshold = 0.03, maxRareFrac = 0.25)
        .orderBy($"doc_id")
    },

    // ---- interpolated Kneser-Ney TRIGRAM LM (the order KenLM ships):
    // the full continuation-count recursion — trigram discounts backing
    // off to bigram-continuation probabilities backing off to unigram
    // continuation mass — with every term a ratio of exact integers
    // (D = 3/4) evaluated in a fixed op nest, mirrored term by term.
    "q105_kn_trigram_lm" -> { (s, dir) =>
      import s.implicits._
      CurationOps.knTrigramLm(docsParallel(s, dir), "text", minCount = 5)
        .orderBy($"w1", $"w2", $"w3")
    },

    // ---- the TRIGRAM LM applied as the doc filter — the q104
    // deployment step at the order the deployment actually ships
    // (trigram models are sparser, so the keep fraction is calibrated
    // higher; both branches exercised at gate scale).
    "q107_kn_doc_filter3" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
      val lm = CurationOps.knTrigramLm(docs, "text", minCount = 5)
      CurationOps.knDocFilter3(docs, "doc_id", "text", lm,
          pThreshold = 0.03, maxRareFrac = 0.95)
        .orderBy($"doc_id")
    },

    // ---- dataset-PAIR overlap via bottom-k (KMV/theta) sketches:
    // the k smallest distinct shingle hashes of A∪B with per-corpus
    // membership bits estimate Jaccard, directional containment, and
    // union cardinality — the "how much does dump B duplicate dump A"
    // diagnostic, without materializing the intersection. Exact
    // integers until the final fixed-order divisions; the bottom-k is
    // TakeOrdered (no global sort), driver state bounded by k.
    "q98_corpus_overlap_kmv" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
      CurationOps.corpusOverlapKmv(
        docs.filter($"doc_id" % 2 === 0),
        docs.filter($"doc_id" % 2 === 1), "text", k = 128)
    },

    // ---- rendezvous (HRW) shard assignment: argmax over per-shard
    // 60-bit salted hashes, pure per-row (transform + array_max struct
    // argmax — no explode, no shuffle). The stable-resharding property
    // (add a shard → only winners move, all to the new shard) is
    // spec-pinned.
    "q144_rendezvous_shards" -> { (s, dir) =>
      import s.implicits._
      CurationOps.rendezvousShards(
          Tables.load(s, dir, "documents").select($"doc_id"),
          "doc_id", numShards = RvShards, salt = RvSalt)
        .orderBy($"doc_id")
    },

    // ---- domain-suffix blocklist: hosts synthesized as in q94,
    // suffix-exploded (≤ label count) into a broadcast equi-join
    // probe — N blocklist entries cost one hash lookup per suffix,
    // never N regex passes.
    "q145_domain_blocklist" -> { (s, dir) =>
      import s.implicits._
      val hosts = Tables.load(s, dir, "documents").select($"doc_id",
        concat($"source", lit(".example"), ($"doc_id" % 3).cast("string"),
          lit(".co.uk")).as("host"))
      CurationOps.domainBlocklist(hosts, "doc_id", "host", BlockRules)
        .orderBy($"doc_id")
    },

    // ---- Luhn-validated card-number PII detection: candidate digit
    // strings derived deterministically per doc (md5-digit prefix +
    // doc_id check digit → ~10% validate), checksum as per-row HOF
    // math mirrored digit-for-digit into the oracle.
    "q146_luhn_pii" -> { (s, dir) =>
      import s.implicits._
      val cands = Tables.load(s, dir, "documents").select($"doc_id",
        concat(
          rpad(regexp_replace(md5($"doc_id".cast("string")), "[a-f]", ""), 15, "7"),
          ($"doc_id" % 10).cast("string")).as("candidate"))
      cands.withColumn("luhn_valid",
          graft.textops.TextAnalysis.luhnValidCol($"candidate").cast("int"))
        .orderBy($"doc_id")
    },

    // ---- train/eval leakage audit: a grouped split (pseudo-shard
    // groups — the naive doc-bucket split) composed with the 8-word
    // PREFIX fingerprint, the corpus's actual duplication channel
    // (openings are shared; whole docs are not) — every key whose
    // copies straddle a split boundary, with per-split counts.
    // Broadcast split table, one conditional-sum groupBy; text never
    // shuffles.
    "q147_split_leakage" -> { (s, dir) =>
      import s.implicits._
      val docs = docsParallel(s, dir)
        .select($"doc_id", ($"doc_id" % 64).cast("long").as("grp"), $"text")
      CurationOps.splitLeakage(
          docs, "doc_id", "grp",
          md5(array_join(slice(split($"text", " "), 1, 8), " ")),
          seed = SplitSeed, trainPct = 80, valPct = 10)
        .orderBy($"h")
    }
  )

  /** q144 constants (mirrored into the oracle). */
  private val RvShards = 12
  private val RvSalt = "hrw"

  /** q145's blocklist: one apex match, one subdomain-deep match, one
    * entry nothing matches (exercises the clean path).
    */
  private val BlockRules = Seq("example0.co.uk", "src3.example1.co.uk", "nohit.test")

  /** q82's epoch seed and shard fan-out — mirrored into the oracle. */
  private val TrainSeed = "epoch1"
  private val TrainShards = 8

  /** q91's split seed and the exact integer hash thresholds
    * (⌊2⁶⁰·pct/100⌋ — computed once here, interpolated into the oracle
    * so neither engine touches a float boundary).
    */
  private val SplitSeed = "split42"
  private val SplitTrainLo = ((BigInt(1) << 60) * 80 / 100).toLong
  private val SplitValLo = ((BigInt(1) << 60) * 90 / 100).toLong

  /** q86's exact-span threshold (words) — mirrored into the oracle's
    * slicing and coverage-window arithmetic.
    */
  private val ExactSpanT = 5

  /** Shared q35/q84 oracle: both the min-label and the star CC paths
    * must produce the identical cluster labeling.
    */
  private lazy val DedupClustersOracle: String =
    TextOps.minhashPairsCte(bands = 16, rowsPerBand = 4, threshold = 0.5)
      .replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, edges AS (
        |  SELECT id_a AS s, id_b AS d FROM mh_pairs
        |  UNION
        |  SELECT id_b, id_a FROM mh_pairs
        |), reach(s, d) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        |)
        |SELECT s AS doc_id,
        |       LEAST(s, MIN(d)) AS cluster_id,
        |       CASE WHEN LEAST(s, MIN(d)) = s THEN 1 ELSE 0 END AS keep
        |FROM reach GROUP BY s""".stripMargin

  /** q43's shard fan-out per language — mirrored into the oracle. */
  private val PackShards = 4

  /** q40's segment width in words — mirrored into the oracle's slicing
    * arithmetic.
    */
  private val SegWords = 3

  /** Per-language token budgets for q37 — mirrored literally into the
    * oracle's CASE expression.
    */
  private val MixBudgets: Map[String, Long] =
    Map("en" -> 2000L, "de" -> 1000L, "fr" -> 1000L, "es" -> 500L)

  /** q65's weight-table width — mirrored into the oracle's hash-mod. */
  private val ClassifierBuckets = 1024

  /** q67's corpus-wide token budget — mirrored into the oracle. */
  private val TempMixBudget = 5000L

  /** q69's query bag (terms that occur in the synthetic corpus — the
    * DemoVocab labels) and result size, mirrored into the oracle.
    */
  private val Bm25Query = Seq("spark", "join", "window")
  private val Bm25K = 20

  /** q71's hashed-feature table width — mirrored into the oracle. */
  private val DsirBuckets = 4096

  /** q73's per-source token budget and epoch cap — mirrored into the
    * oracle. ~3× the typical sf0.01 per-source mass (1.1-1.6k tokens),
    * so epochs spread over 2..cap instead of saturating at 1.
    */
  private val EpochBudget = 4500L
  private val EpochMax = 3

  /** q75's RRF smoothing constant (the standard 60) and fused cut. */
  private val RrfK = 60
  private val RrfTopK = 10

  /** q76's evaluation cut — below Bm25K so the rank<=k filter is live. */
  private val NdcgK = 10

  /** q77's shingle width and winnow radius — mirrored into the
    * oracle's slicing and window-frame arithmetic. Boundary probability
    * ≈ 1/(2·radius+1), so chunks average ~7 words.
    */
  private val SpanK = 3
  private val SpanR = 3

  // The shared words CTE (TextOps.WordsCte) is the DuckDB twin of
  // TextTokens.wordsCol — one definition for every tokenizing oracle.
  private val WordsCte = TextOps.WordsCte

  /** q103/q104 shared KN mirror: bigram/context/continuation counts
    * and the thresholded `lm` CTE with the fixed-order probability.
    * Expects the `words` CTE in scope.
    */
  private val KnLmCtes =
    """, bg AS (
      |  SELECT ws[i] AS w1, ws[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM words, unnest(generate_series(1, len(ws) - 1)) t(i)
      |  WHERE len(ws) >= 2
      |  GROUP BY 1, 2),
      |cx AS (
      |  SELECT w1, CAST(SUM(n) AS BIGINT) AS ctx, CAST(COUNT(*) AS BIGINT) AS n1f
      |  FROM bg GROUP BY w1),
      |ct AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM bg GROUP BY w2),
      |bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_types FROM bg),
      |lm AS (
      |  SELECT bg.w1, bg.w2, bg.n, cx.ctx, cx.n1f, ct.n1b, bt.b_types,
      |         CAST(GREATEST(4 * bg.n - 3, 0) AS DOUBLE) / CAST(4 * cx.ctx AS DOUBLE)
      |         + CAST(3 * cx.n1f * ct.n1b AS DOUBLE) / CAST(4 * cx.ctx AS DOUBLE)
      |           / CAST(bt.b_types AS DOUBLE) AS p_kn
      |  FROM bg JOIN cx USING (w1) JOIN ct USING (w2), bt
      |  WHERE bg.n >= 5)""".stripMargin

  /** q104 constants: rare-bigram probability cut and keep fraction. */
  private val KnPThreshold = 0.03
  private val KnMaxRareFrac = 0.25

  /** q107 constants: trigram models are far sparser, so the keep
    * fraction is calibrated higher (checked at sf0.01: both keep
    * branches populated).
    */
  private val Kn3PThreshold = 0.03
  private val Kn3MaxRareFrac = 0.95

  /** q105/q107 shared KN-trigram mirror: trigram/context/continuation/
    * middle tables, the q103-shape bigram-continuation tables, and the
    * thresholded `lm3` CTE carrying the fixed p0→inner→outer nest.
    * Expects the `words` CTE in scope.
    */
  private val Kn3Ctes =
    """, tg AS (
      |  SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM words, unnest(generate_series(1, len(ws) - 2)) t(i)
      |  WHERE len(ws) >= 3
      |  GROUP BY 1, 2, 3),
      |cx3 AS (
      |  SELECT w1, w2, CAST(SUM(n) AS BIGINT) AS ctx3,
      |         CAST(COUNT(*) AS BIGINT) AS f3
      |  FROM tg GROUP BY w1, w2),
      |c23 AS (
      |  SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS c23
      |  FROM tg GROUP BY w2, w3),
      |mid AS (
      |  SELECT w2, CAST(SUM(c23) AS BIGINT) AS nctx2,
      |         CAST(COUNT(*) AS BIGINT) AS m2
      |  FROM c23 GROUP BY w2),
      |bg3 AS (
      |  SELECT ws[i] AS bw1, ws[i+1] AS bw2, CAST(COUNT(*) AS BIGINT) AS bn
      |  FROM words, unnest(generate_series(1, len(ws) - 1)) t(i)
      |  WHERE len(ws) >= 2
      |  GROUP BY 1, 2),
      |ct3 AS (SELECT bw2 AS w3, CAST(COUNT(*) AS BIGINT) AS n1b FROM bg3 GROUP BY bw2),
      |bt3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_types FROM bg3),
      |lm3 AS (
      |  SELECT tg.w1, tg.w2, tg.w3, tg.n, cx3.ctx3, cx3.f3, c23.c23,
      |         mid.nctx2, mid.m2, ct3.n1b, bt3.b_types,
      |         CAST(GREATEST(4 * tg.n - 3, 0) AS DOUBLE) / CAST(4 * cx3.ctx3 AS DOUBLE)
      |         + CAST(3 * cx3.f3 AS DOUBLE) / CAST(4 * cx3.ctx3 AS DOUBLE)
      |           * (CAST(GREATEST(4 * c23.c23 - 3, 0) AS DOUBLE) / CAST(4 * mid.nctx2 AS DOUBLE)
      |              + CAST(3 * mid.m2 AS DOUBLE) / CAST(4 * mid.nctx2 AS DOUBLE)
      |                * (CAST(ct3.n1b AS DOUBLE) / CAST(bt3.b_types AS DOUBLE))) AS p_kn3
      |  FROM tg
      |  JOIN cx3 USING (w1, w2)
      |  JOIN c23 USING (w2, w3)
      |  JOIN mid USING (w2)
      |  JOIN ct3 USING (w3)
      |  , bt3
      |  WHERE tg.n >= 5)""".stripMargin

  /** Per-doc token COUNTS as a CTE — the DuckDB twin of
    * `size(TextTokens.wordsCol(text))`. ONE definition for q37/q38/q39:
    * a tokenizer change that drifts from the Spark side is a silent
    * gate hash mismatch, so no oracle inlines its own copy.
    */
  /** Generated q139 oracle: the same point construction (plain-window
    * cumsums — the oracle may centralize), the same nano-fixed-point
    * moments, the same unrounded-slope intercept nest.
    */
  private val HeapsSql: String = {
    def s(f: String) = s"(CAST($f AS DOUBLE) / 1000000000.0)"
    val (sx, sy, sxy, sxx) = (s("fsx"), s("fsy"), s("fsxy"), s("fsxx"))
    val np = "CAST(n_points AS DOUBLE)"
    val slope = s"(($np * $sxy - $sx * $sy) / ($np * $sxx - $sx * $sx))"
    s"""WITH words AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |                             w -> len(w) > 0) AS ws
       |  FROM documents),
       |dn AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n
       |       FROM words WHERE len(ws) > 0),
       |docoff AS (
       |  SELECT doc_id, ws, n,
       |    CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n
       |         AS BIGINT) AS strt
       |  FROM dn),
       |gidx AS (SELECT strt + i AS g, ws[i] AS w
       |         FROM docoff, unnest(generate_series(1, len(ws))) t(i)),
       |firsts AS (SELECT CAST(MIN(g) AS BIGINT) AS idx, 1 AS is_first
       |           FROM gidx GROUP BY w),
       |bounds AS (SELECT strt + n AS idx, 0 AS is_first FROM docoff),
       |ev AS (SELECT idx, is_first FROM firsts
       |       UNION ALL SELECT idx, is_first FROM bounds),
       |cum AS (SELECT idx, is_first,
       |          SUM(is_first) OVER (ORDER BY idx ASC, is_first DESC
       |            ROWS UNBOUNDED PRECEDING) AS c
       |        FROM ev),
       |pts AS (SELECT idx AS nd, c AS vd FROM cum WHERE is_first = 0),
       |fpts AS (SELECT
       |    CAST(round(ln(CAST(nd AS DOUBLE)) * 1000000000.0) AS BIGINT) AS fx,
       |    CAST(round(ln(CAST(vd AS DOUBLE)) * 1000000000.0) AS BIGINT) AS fy,
       |    CAST(round(ln(CAST(nd AS DOUBLE)) * ln(CAST(vd AS DOUBLE)) * 1000000000.0) AS BIGINT) AS fxy,
       |    CAST(round(ln(CAST(nd AS DOUBLE)) * ln(CAST(nd AS DOUBLE)) * 1000000000.0) AS BIGINT) AS fxx
       |  FROM pts),
       |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       |    CAST(SUM(fx) AS BIGINT) AS fsx, CAST(SUM(fy) AS BIGINT) AS fsy,
       |    CAST(SUM(fxy) AS BIGINT) AS fsxy, CAST(SUM(fxx) AS BIGINT) AS fsxx
       |  FROM fpts)
       |SELECT n_points,
       |  (SELECT CAST(SUM(n) AS BIGINT) FROM dn) AS n_tokens,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts) AS n_types,
       |  round($slope, 6) AS heaps_beta,
       |  round(exp(($sy - $slope * $sx) / $np), 6) AS heaps_k
       |FROM sums""".stripMargin
  }

  /** The fixed boilerplate tail the q133 gate plants so duplicated
    * content-defined blocks exist in the test corpus (shared verbatim
    * with the oracle SQL).
    */
  private val CdcBoiler =
    "subscribe to our newsletter for updates terms of service apply " +
      "all rights reserved contact us at the address below privacy " +
      "policy cookie settings do not sell my information thank you"

  /** CDC chunk-table CTE (the q131 oracle's body, reusable): chunks of
    * `src` — a relation with `(doc_id, text)` — as
    * `chunks(doc_id, chunk_idx, n_words, chunk_md5)`. Relational mirror
    * of [[graft.textops.CurationOps.cdcSegments]] at window = 3,
    * mask = 7.
    */
  private def CdcChunksCte(src: String): String =
    "WITH " + cdcChunksCteBody(src, "")

  /** The chunk CTE chain WITHOUT the leading WITH and with `p`-prefixed
    * CTE names, so two corpus versions can be chunked in one statement
    * (q134). Final CTE: `${p}chunks(doc_id, chunk_idx, n_words,
    * chunk_md5)`.
    */
  private def cdcChunksCteBody(src: String, p: String): String =
    s"""${p}words AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |                             w -> len(w) > 0) AS ws
       |  FROM $src),
       |${p}flags AS (
       |  SELECT doc_id, q, ws[q] AS w,
       |    CASE WHEN q BETWEEN 3 AND len(ws) - 1
       |          AND CAST(('0x' || substr(md5(array_to_string(ws[q - 2 : q], ' ')), 1, 15)) AS BIGINT) % 8 = 0
       |         THEN 1 ELSE 0 END AS f
       |  FROM ${p}words, unnest(generate_series(1, len(ws))) t(q)),
       |${p}seg AS (
       |  SELECT doc_id, q, w,
       |    COALESCE(SUM(f) OVER (PARTITION BY doc_id ORDER BY q
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
       |  FROM ${p}flags),
       |${p}chunks AS (
       |  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |         CAST(COUNT(*) AS BIGINT) AS n_words,
       |         md5(string_agg(w, ' ' ORDER BY q)) AS chunk_md5
       |  FROM ${p}seg GROUP BY doc_id, chunk_idx)""".stripMargin

  /** Generated q129 oracle: the per-word JSD pair terms transliterate
    * [[graft.textops.CurationOps.jsDivergenceByGroup]]'s op nest
    * symbol-for-symbol (p, q, m, half·p·log2(p/m), zero-total guard,
    * round to micro fixed-point before the sum).
    */
  private val JsDivergenceSql: String = {
    val gs = Seq("de", "en", "es", "fr", "zh")
    val pairs = for { i <- gs.indices; j <- (i + 1) until gs.size }
      yield (gs(i), gs(j))
    def term(a: String, b: String): String = {
      val p = s"(CAST(n_$a AS DOUBLE) / CAST(t_$a AS DOUBLE))"
      val q = s"(CAST(n_$b AS DOUBLE) / CAST(t_$b AS DOUBLE))"
      val m = s"(($p + $q) / CAST(2.0 AS DOUBLE))"
      s"CAST(round(CASE WHEN t_$a > 0 AND t_$b > 0 THEN " +
        s"(CASE WHEN n_$a > 0 THEN CAST(0.5 AS DOUBLE) * $p * log2($p / $m) ELSE 0.0 END" +
        s" + CASE WHEN n_$b > 0 THEN CAST(0.5 AS DOUBLE) * $q * log2($q / $m) ELSE 0.0 END)" +
        s" ELSE 0.0 END * 1000000.0) AS BIGINT)"
    }
    val cntCols = gs.map(g =>
      s"CAST(SUM(CASE WHEN lang = '$g' THEN 1 ELSE 0 END) AS BIGINT) AS n_$g")
      .mkString(",\n         ")
    val totCols = gs.map(g => s"CAST(SUM(n_$g) AS BIGINT) AS t_$g")
      .mkString(", ")
    val sumCols = pairs.map { case (a, b) =>
      s"COALESCE(CAST(SUM(${term(a, b)}) AS BIGINT), 0) AS s_${a}_$b"
    }.mkString(",\n         ")
    val unions = pairs.map { case (a, b) =>
      s"SELECT '$a' AS g_a, '$b' AS g_b, CAST(s_${a}_$b AS DOUBLE) / 1000000.0 AS jsd FROM sums"
    }.mkString("\n  UNION ALL ")
    s"""WITH words AS (
       |  SELECT lang, list_filter(string_split_regex(lower(text), '\\s+'),
       |                           w -> len(w) > 0) AS ws
       |  FROM documents
       |), tok AS (SELECT lang, unnest(ws) AS w FROM words),
       |cnt AS (
       |  SELECT w,
       |         $cntCols
       |  FROM tok GROUP BY w),
       |tot AS (SELECT $totCols FROM cnt),
       |sums AS (
       |  SELECT $sumCols
       |  FROM cnt, tot)
       |SELECT g_a, g_b, jsd FROM (
       |  $unions)
       |ORDER BY g_a, g_b""".stripMargin
  }

  private val ToksCte =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |         len(list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0)) AS n_tokens
      |  FROM documents
      |)""".stripMargin

  /** Micros-truncated event view: Spark reads ts as ns and truncates to
    * micros in Tables.load, so the oracle must compare/aggregate at the
    * SAME precision — truncate FIRST, then do gap arithmetic, or an
    * event pair a few ns under the gap could sessionize differently.
    */
  private val EventsUsCte =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      |  FROM events
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q29_repetition_stats" -> (WordsCte +
      """, g AS (
        |  SELECT doc_id, ws,
        |    list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1]) AS gs
        |  FROM words)
        |SELECT doc_id, len(ws) AS n_words,
        |  CASE WHEN len(ws) > 0 THEN
        |    CAST(list_max(list_transform(list_distinct(ws),
        |                                 w2 -> len(list_filter(ws, x -> x = w2)))) AS DOUBLE)
        |      / len(ws) ELSE 0.0 END AS top_word_frac,
        |  CASE WHEN len(gs) > 0 THEN
        |    CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs)
        |    ELSE 0.0 END AS dup_bigram_frac,
        |  CASE WHEN (CASE WHEN len(ws) > 0 THEN
        |               CAST(list_max(list_transform(list_distinct(ws),
        |                             w2 -> len(list_filter(ws, x -> x = w2)))) AS DOUBLE)
        |                 / len(ws) ELSE 0.0 END) > 0.2
        |         OR (CASE WHEN len(gs) > 0 THEN
        |               CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs)
        |               ELSE 0.0 END) > 0.6
        |    THEN 1 ELSE 0 END AS repetitive
        |FROM g""".stripMargin),

    "q30_decontamination" -> (TextOps.ShinglesCte +
      s""", xs AS (
        |  SELECT DISTINCT doc_id, ${TextOps.HashSql} AS h FROM sh
        |), bench AS (
        |  SELECT doc_id AS bench_id, h FROM xs WHERE doc_id % $BenchMod = 0
        |), corpus AS (
        |  SELECT doc_id, h FROM xs WHERE doc_id % $BenchMod <> 0
        |)
        |SELECT c.doc_id,
        |       COUNT(DISTINCT c.h) AS n_shared_shingles,
        |       COUNT(DISTINCT b.bench_id) AS n_bench_docs
        |FROM corpus c JOIN bench b ON c.h = b.h
        |GROUP BY 1""".stripMargin),

    // Same distinct-hash relation as q30; LEFT join keeps clean docs at
    // n_shared = 0, and the score is an unrounded exact-integer ratio.
    "q85_contamination_score" -> (TextOps.ShinglesCte +
      s""", xs AS (
        |  SELECT DISTINCT doc_id, ${TextOps.HashSql} AS h FROM sh
        |), bench AS (
        |  SELECT DISTINCT h FROM xs WHERE doc_id % $BenchMod = 0
        |), corpus AS (
        |  SELECT doc_id, h FROM xs WHERE doc_id % $BenchMod <> 0
        |)
        |SELECT c.doc_id,
        |       COUNT(DISTINCT c.h) AS n_shingles,
        |       COUNT(DISTINCT CASE WHEN b.h IS NOT NULL THEN c.h END) AS n_shared,
        |       CAST(COUNT(DISTINCT CASE WHEN b.h IS NOT NULL THEN c.h END) AS DOUBLE)
        |         / COUNT(DISTINCT c.h) AS contamination
        |FROM corpus c LEFT JOIN bench b ON c.h = b.h
        |GROUP BY 1""".stripMargin),

    "q31_tfidf_topk" -> (WordsCte +
      """, t AS (SELECT doc_id, unnest(ws) AS term FROM words),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |         CAST(tf AS DOUBLE) * n_docs * 1000000 / df AS score
        |  FROM tf JOIN dfreq USING (term), n)
        |SELECT doc_id, term, score, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |WHERE rk <= 3""".stripMargin),

    "q32_stratified_sample" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |           ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20""".stripMargin,

    // New-session rule is STRICT `>`: Spark merges touching session
    // windows, so an event exactly `gap` after the previous one still
    // extends the session (pinned by TemporalSpec).
    "q33_sessionize" -> (EventsUsCte +
      """, marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |sessions AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                             ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, sid""".stripMargin),

    // Connected components in SQL: symmetrize the q17 pair list, take
    // the transitive closure as a recursive CTE (UNION dedup guarantees
    // termination), then label = min reachable id. Fine at oracle scale;
    // the Spark side's label propagation is the form that scales.
    "q35_dedup_clusters" -> DedupClustersOracle,

    // cluster-safe split mirror: the q35 recursive-closure oracle as a
    // derived table, singleton fallback to the own id, the same
    // 60-bit salted hash mod 100
    "q173_cluster_safe_split" ->
      s"""SELECT doc_id, cluster_id,
        |  CASE WHEN b < 80 THEN 'train'
        |       WHEN b < 90 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM (
        |  SELECT d.doc_id,
        |         COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
        |         CAST(('0x' || substr(md5('split:' || CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |  FROM documents d
        |  LEFT JOIN ($DedupClustersOracle) cl ON d.doc_id = cl.doc_id)
        |ORDER BY doc_id""".stripMargin,

    // q84 runs the SAME clustering through the alternating
    // large-star/small-star path (forced distributed): identical
    // oracle, because the algorithms must agree exactly — the
    // equivalence spec promoted to a driver-gate guarantee.
    "q84_dedup_clusters_star" -> DedupClustersOracle,

    // Signals computed in a subquery so `keep` can reference them once
    // (bit-identical doubles: every ratio is int/int in one division,
    // thresholds are the same literals on both engines).
    "q36_quality_gate" -> (WordsCte +
      """, g AS (
        |  SELECT doc_id, ws,
        |    list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1]) AS gs
        |  FROM words),
        |l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        |sig AS (
        |  SELECT g.doc_id AS doc_id, len(ws) AS n_words,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / len(ws)
        |      ELSE 0.0 END AS avg_word_len,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST(len(list_filter(ws, x -> contains(x, '#') OR contains(x, '...'))) AS DOUBLE)
        |        / len(ws) ELSE 0.0 END AS symbol_word_frac,
        |    CASE WHEN len(ls) > 0 THEN
        |      CAST(len(list_filter(ls, x -> starts_with(x, '- ') OR starts_with(x, '* ')
        |                                    OR starts_with(x, '• '))) AS DOUBLE)
        |        / len(ls) ELSE 0.0 END AS bullet_line_frac,
        |    CASE WHEN len(ls) > 0 THEN
        |      CAST(len(list_filter(ls, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS DOUBLE)
        |        / len(ls) ELSE 0.0 END AS ellipsis_line_frac,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        |        / len(ws) ELSE 0.0 END AS alpha_word_frac,
        |    len(list_intersect(ws, ['the','and','of','to','in','is','a'])) AS stop_hits,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST(list_max(list_transform(list_distinct(ws),
        |                                   w2 -> len(list_filter(ws, x -> x = w2)))) AS DOUBLE)
        |        / len(ws) ELSE 0.0 END AS top_word_frac,
        |    CASE WHEN len(gs) > 0 THEN
        |      CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs)
        |      ELSE 0.0 END AS dup_bigram_frac
        |  FROM g JOIN l ON g.doc_id = l.doc_id)
        |SELECT doc_id, n_words, avg_word_len, symbol_word_frac, bullet_line_frac,
        |  ellipsis_line_frac, alpha_word_frac, stop_hits, top_word_frac, dup_bigram_frac,
        |  CASE WHEN n_words BETWEEN 50 AND 100000
        |        AND avg_word_len BETWEEN 3.0 AND 10.0
        |        AND symbol_word_frac <= 0.1
        |        AND bullet_line_frac < 0.9
        |        AND ellipsis_line_frac < 0.3
        |        AND alpha_word_frac >= 0.8
        |        AND stop_hits >= 2
        |        AND top_word_frac <= 0.2
        |        AND dup_bigram_frac <= 0.6
        |    THEN 1 ELSE 0 END AS keep
        |FROM sig""".stripMargin),

    // CAST the window SUM to BIGINT: DuckDB's SUM(BIGINT) OVER returns
    // HUGEINT, which pandas materializes as float64 — the driver harness
    // then hashes "2000.0" against Spark's "2000" and mismatches.
    "q37_token_budget_mix" -> (ToksCte +
      """, cum AS (
        |  SELECT doc_id, lang, n_tokens,
        |         CAST(SUM(n_tokens) OVER (PARTITION BY lang
        |           ORDER BY md5('mix' || CAST(doc_id AS VARCHAR)), doc_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM toks)
        |SELECT doc_id, lang, n_tokens, cum_tokens FROM cum
        |WHERE lang IN ('de', 'en', 'es', 'fr')
        |  AND cum_tokens <= CASE lang
        |    WHEN 'de' THEN 1000 WHEN 'en' THEN 2000
        |    WHEN 'es' THEN 500 WHEN 'fr' THEN 1000 ELSE 0 END""".stripMargin),

    "q38_length_percentiles" -> (ToksCte +
      """
        |SELECT lang, COUNT(*) AS n_docs,
        |       MIN(n_tokens) AS min_tokens,
        |       quantile_cont(n_tokens, 0.5) AS p50_tokens,
        |       quantile_cont(n_tokens, 0.9) AS p90_tokens,
        |       quantile_cont(n_tokens, 0.99) AS p99_tokens,
        |       MAX(n_tokens) AS max_tokens,
        |       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens
        |FROM toks GROUP BY lang""".stripMargin),

    // Same naive quantile_cont query as q38: the histogram engine path
    // must reproduce it bit-for-bit (quantile_cont evaluates
    // (1-f)·lo + f·hi at position q·(N-1) — the exact arithmetic the
    // engine's histogram interpolation mirrors).
    "q111_length_histogram" -> (ToksCte +
      """
        |SELECT lang, COUNT(*) AS n_docs,
        |       MIN(n_tokens) AS min_tokens,
        |       quantile_cont(n_tokens, 0.5) AS p50_tokens,
        |       quantile_cont(n_tokens, 0.9) AS p90_tokens,
        |       quantile_cont(n_tokens, 0.99) AS p99_tokens,
        |       MAX(n_tokens) AS max_tokens,
        |       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens
        |FROM toks GROUP BY lang""".stripMargin),

    // CAST as in q37: keep every offset column BIGINT end-to-end so the
    // driver's pandas read never sees a HUGEINT→float64 promotion.
    "q39_sequence_pack" -> (ToksCte +
      """, cum AS (
        |  SELECT doc_id, lang, n_tokens,
        |         CAST(SUM(n_tokens) OVER (PARTITION BY lang
        |           ORDER BY md5('pack' || CAST(doc_id AS VARCHAR)), doc_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_offset
        |  FROM toks WHERE n_tokens > 0)
        |SELECT doc_id, lang, n_tokens, end_offset,
        |       end_offset - n_tokens AS start_offset,
        |       (end_offset - n_tokens) // 512 AS first_seq,
        |       (end_offset - 1) // 512 AS last_seq
        |FROM cum""".stripMargin),

    // Oracle-side first-occurrence uses a ROW_NUMBER window — semantically
    // the argmin(struct) the Spark side computes (the (doc_id, seg_idx)
    // order is total), just in the form DuckDB optimizes; both engines
    // bucket by the SAME 60-bit md5 hash so even a hash collision
    // resolves identically.
    "q40_segment_dedup" -> (WordsCte +
      s""", segs AS (
        |  SELECT doc_id, i AS seg_idx,
        |         array_to_string(ws[(i*$SegWords+1):((i+1)*$SegWords)], ' ') AS seg
        |  FROM words, unnest(generate_series(0, CAST(ceil(len(ws)/$SegWords.0) AS INT) - 1)) t(i)
        |), hashed AS (
        |  SELECT doc_id, seg_idx, seg,
        |         CAST(('0x' || substr(md5(seg), 1, 15)) AS BIGINT) AS h
        |  FROM segs
        |), ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, seg_idx) AS rn
        |  FROM hashed)
        |SELECT doc_id, COUNT(*) AS n_segs,
        |       CAST(COUNT(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |       COALESCE(array_to_string(list(seg ORDER BY seg_idx) FILTER (WHERE rn = 1), ' '),
        |                '') AS kept_text
        |FROM ranked GROUP BY doc_id""".stripMargin),

    // The blob, patterns, and replacement order mirror the Spark side
    // exactly; the oracle regexes drop the Java-only (?<!…)/(?!…) digit
    // guards (RE2 has no lookaround), which is sound here because every
    // manufactured phone/SSN in the blob is whitespace- or
    // punctuation-delimited — the guarded and unguarded patterns agree
    // on this data (guard semantics are pinned by CurationOpsSpec).
    "q41_pii_scrub" ->
      """WITH blob AS (
        |  SELECT c_custkey,
        |    c_name || ' ' || lower(replace(c_name, 'Customer#', 'c')) || '@corp.example'
        |      || ' call ' || printf('(%03d) %03d-%04d',
        |                            c_custkey % 1000, (c_custkey * 7) % 1000, c_custkey % 10000)
        |      || ' ssn ' || printf('%03d-%02d-%04d',
        |                           (c_custkey * 3) % 1000, c_custkey % 100, (c_custkey * 11) % 10000)
        |      || CASE WHEN c_custkey % 3 = 0
        |              THEN ' alt x555.' || printf('%03d', (c_custkey % 900) + 100) || '.'
        |                   || printf('%04d', c_custkey % 10000) || '@mail.example'
        |              ELSE '' END AS text
        |  FROM customer)
        |SELECT c_custkey,
        |  len(regexp_extract_all(text, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS emails,
        |  len(regexp_extract_all(text,
        |      '(\+?1[ .-]?)?(\([0-9]{3}\)[ .-]?|[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}')) AS phones,
        |  len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS ssns,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
        |    '(\+?1[ .-]?)?(\([0-9]{3}\)[ .-]?|[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}',
        |    '<PHONE>', 'g') AS redacted
        |FROM blob""".stripMargin,

    // Same tf-compressed algebra as the Spark side: per-(doc, term)
    // counts first, then the frequency join — sum(tf * bits) over that
    // equals the per-token sum exactly.
    "q42_unigram_surprisal" -> (WordsCte +
      """, t AS (SELECT doc_id, unnest(ws) AS term FROM words),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |freq AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |       CAST(SUM(tf * len(bin(total // cnt))) AS BIGINT) AS sum_bits,
        |       CAST(SUM(tf * len(bin(total // cnt))) AS DOUBLE) / SUM(tf) AS mean_bits
        |FROM tf JOIN freq USING (term), tot
        |GROUP BY doc_id""".stripMargin),

    // Bigrams by 1-based list index (range(1, len) is empty below two
    // words, dropping short docs exactly like the Spark zip_with form);
    // prefix counts roll up from the bigram table so both engines
    // aggregate the identical integer quotients.
    "q56_bigram_surprisal" -> (WordsCte +
      """, idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM words),
        |big AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM idx),
        |tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM big GROUP BY 1, 2, 3),
        |c2 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS cnt2 FROM tf GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(cnt2) AS BIGINT) AS cnt1 FROM c2 GROUP BY 1)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(tf * len(bin(cnt1 // cnt2))) AS BIGINT) AS sum_bits,
        |       CAST(SUM(tf * len(bin(cnt1 // cnt2))) AS DOUBLE) / SUM(tf) AS mean_bits
        |FROM tf JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY doc_id""".stripMargin),

    // Sequential fold as a recursive CTE: one step per row within each
    // (lang, shard) group, chained on the ROW_NUMBER of the same salted
    // order the Spark side secondary-sorts by. `fill` carries the
    // running bin occupancy; the CASE mirrors the next-fit rule
    // (close-and-open on overflow, oversized doc occupies a bin alone).
    "q43_pack_next_fit" -> (ToksCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""", ord AS (
        |  SELECT doc_id, lang, doc_id % $PackShards AS shard, n_tokens,
        |         ROW_NUMBER() OVER (PARTITION BY lang, doc_id % $PackShards
        |           ORDER BY md5('packfit' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM toks WHERE n_tokens > 0
        |), pack AS (
        |  SELECT doc_id, lang, shard, n_tokens, rn,
        |         CAST(0 AS BIGINT) AS bin_idx, CAST(0 AS BIGINT) AS bin_offset,
        |         CAST(n_tokens AS BIGINT) AS fill
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.doc_id, o.lang, o.shard, o.n_tokens, o.rn,
        |    CASE WHEN p.fill + o.n_tokens <= 512 THEN p.bin_idx ELSE p.bin_idx + 1 END,
        |    CASE WHEN p.fill + o.n_tokens <= 512 THEN p.fill ELSE CAST(0 AS BIGINT) END,
        |    CASE WHEN p.fill + o.n_tokens <= 512 THEN p.fill + o.n_tokens
        |         ELSE CAST(o.n_tokens AS BIGINT) END
        |  FROM pack p JOIN ord o
        |    ON o.lang = p.lang AND o.shard = p.shard AND o.rn = p.rn + 1
        |)
        |SELECT doc_id, lang, shard, n_tokens, bin_idx, bin_offset FROM pack""".stripMargin),

    // The naive form of the Spark side's bucketed equi join — DuckDB
    // plans the |Δt| predicate as an IEJoin, fine at oracle scale.
    "q44_time_proximity" -> (EventsUsCte +
      """, p AS (
        |  SELECT event_id, ts AS purchase_ts FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT ts AS view_ts FROM e WHERE event_type = 'view')
        |SELECT p.event_id, p.purchase_ts,
        |       COUNT(v.view_ts) AS n_near_views,
        |       MIN(ABS(epoch_us(v.view_ts) - epoch_us(p.purchase_ts))) AS min_gap_us
        |FROM p LEFT JOIN v
        |  ON ABS(epoch_us(v.view_ts) - epoch_us(p.purchase_ts)) <= 300000000
        |GROUP BY 1, 2""".stripMargin),

    // Each event expands to its two covering window starts (k = 0, 1
    // slide steps back), mirroring Spark's epoch-aligned assignment.
    "q50_hopping_window" -> (EventsUsCte +
      """, exp AS (
        |  SELECT make_timestamp(((epoch_us(ts) // 300000000) - k) * 300000000) AS w_start,
        |         make_timestamp(((epoch_us(ts) // 300000000) - k + 2) * 300000000) AS w_end,
        |         event_type, value
        |  FROM e, (VALUES (0), (1)) t(k))
        |SELECT w_start, w_end, event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM exp GROUP BY 1, 2, 3""".stripMargin),

    // CAST as in q37/q39 — HUGEINT window SUM must not leak to pandas.
    "q55_pps_sample" -> (ToksCte +
      """, cum AS (
        |  SELECT doc_id, lang, n_tokens,
        |         CAST(SUM(n_tokens) OVER (PARTITION BY lang
        |           ORDER BY md5('pps' || CAST(doc_id AS VARCHAR)), doc_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_offset
        |  FROM toks WHERE n_tokens > 0)
        |SELECT doc_id, lang, n_tokens, end_offset,
        |       end_offset - n_tokens AS start_offset,
        |       ((end_offset - n_tokens + 499) // 500) * 500 AS pick_point
        |FROM cum
        |WHERE ((end_offset - n_tokens + 499) // 500) * 500 < end_offset""".stripMargin),

    // Chain-completion timestamps as running maxima over the identical
    // strictly-before frames; epoch_us mirrors unix_micros exactly.
    "q63_funnel_windowed" -> (EventsUsCte +
      """, s0 AS (
        |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us,
        |    CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS c0
        |  FROM e),
        |s1 AS (
        |  SELECT *, MAX(c0) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p1
        |  FROM s0),
        |s1c AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND p1 IS NOT NULL
        |                  AND us - p1 <= 1800 * 1000000 THEN us END AS c1
        |  FROM s1),
        |s2 AS (
        |  SELECT *, MAX(c1) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p2
        |  FROM s1c),
        |s2c AS (
        |  SELECT *, CASE WHEN event_type = 'purchase' AND p2 IS NOT NULL
        |                  AND us - p2 <= 1800 * 1000000 THEN us END AS c2
        |  FROM s2)
        |SELECT user_id,
        |  GREATEST(CASE WHEN MAX(c0) IS NOT NULL THEN 1 ELSE 0 END,
        |           CASE WHEN MAX(c1) IS NOT NULL THEN 2 ELSE 0 END,
        |           CASE WHEN MAX(c2) IS NOT NULL THEN 3 ELSE 0 END) AS funnel_stage
        |FROM s2c GROUP BY user_id""".stripMargin),

    // Same week-truncation + integer day/7 offsets; DISTINCT user-weeks
    // before the rollup mirrors the Spark-side distinct.
    // cohort_week as ISO VARCHAR — mirrors the Spark side's date_format
    // so neither harness's date/timestamp materialization can diverge.
    "q61_retention_cohorts" -> (EventsUsCte +
      """, uw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM e),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id)
        |SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', c.cohort_week, uw.week) // 7 AS INTEGER) AS week_offset,
        |       COUNT(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin),

    // Same strictly-before cumulative-max windows over the identical
    // (user, ts, event_id) total order; GREATEST of the stage maxima.
    "q60_funnel_stages" -> (EventsUsCte +
      """, s1 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    COALESCE(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS view_before
        |  FROM e),
        |s2 AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND view_before = 1
        |                 THEN 1 ELSE 0 END AS chain_click FROM s1),
        |s3 AS (
        |  SELECT *, COALESCE(MAX(chain_click) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS click_chain_before
        |  FROM s2),
        |s4 AS (
        |  SELECT *, CASE WHEN event_type = 'purchase' AND click_chain_before = 1
        |                 THEN 1 ELSE 0 END AS chain_purchase FROM s3)
        |SELECT user_id,
        |  GREATEST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
        |           MAX(chain_click) * 2, MAX(chain_purchase) * 3) AS funnel_stage
        |FROM s4 GROUP BY user_id""".stripMargin),

    "q47_event_gaps" -> (EventsUsCte +
      """
        |SELECT event_id, user_id, ts, event_type,
        |  epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS prev_gap_us,
        |  epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS next_gap_us,
        |  LAG(event_type) OVER w AS prev_type
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin),

    "q34_asof_join" -> (EventsUsCte +
      """, p AS (
        |  SELECT event_id, user_id, ts AS purchase_ts FROM e
        |  WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT event_id AS view_event_id, user_id, ts FROM e
        |  WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.purchase_ts,
        |       v.view_event_id, v.ts AS view_ts
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.ts <= p.purchase_ts""".stripMargin),

    // Mirrors CurationOps.hashedLinearScore: the 60-bit md5 hash mod
    // bucket count, derived centi-weight (bucket % 201 - 100), one
    // division at the end. SUMs cast to BIGINT (DuckDB HUGEINT turns
    // into float64 in the driver's pandas harness); keep compares the
    // ROUNDED score, like the Spark side.
    "q65_quality_classifier" -> (WordsCte +
      s""", tok AS (SELECT doc_id, unnest(ws) AS w FROM words),
        |b AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $ClassifierBuckets AS bucket
        |  FROM tok),
        |scored AS (
        |  SELECT doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |         CAST(SUM(bucket % 201 - 100) AS BIGINT) AS raw_score,
        |         SUM(bucket % 201 - 100) / (COUNT(*) * 100.0) AS score
        |  FROM b GROUP BY doc_id)
        |SELECT doc_id, n_tokens, raw_score, score, score >= 0 AS keep
        |FROM scored""".stripMargin),

    // Mirrors CurationOps.zipfSlope: same rank tiebreak, same four
    // moment sums, same explicit slope/intercept formula.
    "q66_zipf_law" -> (WordsCte +
      """, tok AS (SELECT unnest(ws) AS term FROM words),
        |counts AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
        |ranked AS (
        |  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rk
        |  FROM counts),
        |sums AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
        |         CAST(SUM(c) AS BIGINT) AS n_tokens,
        |         SUM(ln(rk)) AS sx, SUM(ln(c)) AS sy,
        |         SUM(ln(rk) * ln(c)) AS sxy, SUM(ln(rk) * ln(rk)) AS sxx
        |  FROM ranked)
        |SELECT n_types, n_tokens,
        |       ROUND((n_types * sxy - sx * sy) / (n_types * sxx - sx * sx), 6)
        |         AS zipf_slope,
        |       ROUND((sy - ((n_types * sxy - sx * sy) / (n_types * sxx - sx * sx)) * sx)
        |         / n_types, 6) AS zipf_intercept
        |FROM sums""".stripMargin),

    // Mirrors CurationOps.spanCorruption: positioned words via
    // generate_series subscripts, the salted-hash placement law
    // (o = h%17, len = 1+(h//17)%3 inside blocks of 20), sentinel =
    // block index, both strings assembled by ORDER BY pos string_agg
    // (null pieces skip on both engines; COALESCE '' for the
    // nothing-masked doc)
    "q171_span_corruption" -> (WordsCte + """,
        |wp AS (
        |  SELECT doc_id, i - 1 AS pos, ws[i] AS w
        |  FROM words, unnest(generate_series(1, len(ws))) AS u(i)),
        |m AS (
        |  SELECT doc_id, pos, w, pos // 20 AS block,
        |         CAST(('0x' || substr(md5('sc:' || CAST(doc_id AS VARCHAR) || ':' || CAST(pos // 20 AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM wp),
        |c AS (
        |  SELECT doc_id, pos, block, w,
        |         h % 17 AS o, 1 + (h // 17) % 3 AS ln, pos % 20 AS off
        |  FROM m),
        |p AS (
        |  SELECT doc_id, pos, block,
        |    CASE WHEN off >= o AND off < o + ln THEN 1 ELSE 0 END AS masked,
        |    CASE WHEN off < o OR off >= o + ln THEN w
        |         WHEN off = o THEN '<extra_id_' || CAST(block AS VARCHAR) || '>' END AS cpiece,
        |    CASE WHEN off = o THEN '<extra_id_' || CAST(block AS VARCHAR) || '> ' || w
        |         WHEN off > o AND off < o + ln THEN w END AS tpiece
        |  FROM c)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(masked) AS BIGINT) AS n_masked,
        |       CAST(COUNT(DISTINCT CASE WHEN masked = 1 THEN block END) AS BIGINT) AS n_spans,
        |       COALESCE(string_agg(cpiece, ' ' ORDER BY pos), '') AS corrupted,
        |       COALESCE(string_agg(tpiece, ' ' ORDER BY pos), '') AS targets
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // Mirrors CurationOps.dedupKeepBest over the variant-augmented
    // corpus: the q81 normalization chain, winner = max quality then
    // min id via the boring two-step (max per key, then min id among
    // maxima) instead of an argmax-struct — independent formulation,
    // same total order
    "q172_dedup_keep_best" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, upper(text) || ' !!!' FROM documents
        |  WHERE doc_id % 3 = 0),
        |k AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS quality,
        |    md5(trim(regexp_replace(regexp_replace(regexp_replace(
        |      lower(text), '[0-9]+', '0', 'g'),
        |      '[^a-z0-9 \t\n\x0B\f\r]+', ' ', 'g'),
        |      '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS kk
        |  FROM base),
        |g AS (
        |  SELECT kk, CAST(COUNT(*) AS BIGINT) AS group_size,
        |         MAX(quality) AS mq
        |  FROM k GROUP BY kk),
        |w AS (
        |  SELECT k.kk, MIN(k.doc_id) AS win
        |  FROM k JOIN g ON k.kk = g.kk AND k.quality = g.mq
        |  GROUP BY k.kk)
        |SELECT k.doc_id, k.quality, g.group_size,
        |       CASE WHEN k.doc_id = w.win THEN 1 ELSE 0 END AS kept
        |FROM k JOIN g ON k.kk = g.kk JOIN w ON k.kk = w.kk
        |ORDER BY k.doc_id""".stripMargin,

    // Mirrors CurationOps.mixSchedule: integer lerp between endpoint
    // weights, per-step Hamilton apportionment (base //, remainder
    // rank within the step, exact-sum top-ups), every SUM-derived
    // value CAST to BIGINT
    "q170_mix_schedule" ->
      """WITH m AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w0,
        |         CAST(COUNT(*) AS BIGINT) AS w1
        |  FROM documents GROUP BY 1),
        |g AS (
        |  SELECT m.source, t.step, m.w0 * (10 - t.step) + m.w1 * t.step AS w
        |  FROM m, unnest(generate_series(1, 10)) AS t(step)),
        |b AS (
        |  SELECT step, source, w,
        |    CAST((1000 * w) // CAST(SUM(w) OVER (PARTITION BY step) AS BIGINT) AS BIGINT) AS base,
        |    CAST((1000 * w) % CAST(SUM(w) OVER (PARTITION BY step) AS BIGINT) AS BIGINT) AS rem
        |  FROM g),
        |r AS (
        |  SELECT step, source, w, base,
        |    CAST(1000 - SUM(base) OVER (PARTITION BY step) AS BIGINT) AS leftover,
        |    ROW_NUMBER() OVER (PARTITION BY step ORDER BY rem DESC, source ASC) AS rk
        |  FROM b)
        |SELECT step, source, w,
        |       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM r ORDER BY step, source""".stripMargin,

    // Mirrors CurationOps.temperatureMix: integer-quantized sqrt
    // weights, exact integer target division (// = Spark's div), the
    // q37-style salted-md5 greedy fill. Strata keyed on source, not
    // lang, so this needs its own toks CTE.
    "q67_temperature_mix" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
        |                              w -> len(w) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tt AS (SELECT * FROM t WHERE n_tokens > 0),
        |wts AS (
        |  SELECT source,
        |         CAST(SUM(n_tokens) AS BIGINT) AS stratum_tokens,
        |         CAST(floor(sqrt(CAST(SUM(n_tokens) AS DOUBLE)) * 1000000) AS BIGINT) AS w
        |  FROM tt GROUP BY source),
        |tw AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM wts),
        |tgt AS (
        |  SELECT source, stratum_tokens,
        |         (CAST($TempMixBudget AS BIGINT) * w) // tw AS target_tokens
        |  FROM wts, tw),
        |cum AS (
        |  SELECT doc_id, source, n_tokens,
        |         CAST(SUM(n_tokens) OVER (PARTITION BY source
        |           ORDER BY md5('temp' || CAST(doc_id AS VARCHAR)), doc_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM tt)
        |SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens, g.target_tokens
        |FROM cum c JOIN tgt g USING (source)
        |WHERE c.cum_tokens <= g.target_tokens""".stripMargin,

    // Mirrors TextAnalysis.charEntropyCol: per-char counts via the
    // distinct-scan, Σ c·log2(c) in double, rounded at 6. Spaces are
    // characters too (both sides split on '' and drop only empties).
    "q68_char_entropy" ->
      """WITH cs AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split(text, ''), c -> len(c) > 0) AS chars
        |  FROM documents)
        |SELECT doc_id,
        |       len(chars) AS n_chars,
        |       len(list_distinct(chars)) AS n_alphabet,
        |       CASE WHEN len(chars) > 0 THEN
        |         ROUND(log2(len(chars)) -
        |           list_sum(list_transform(
        |             list_transform(list_distinct(chars),
        |               d -> CAST(len(list_filter(chars, c -> c = d)) AS DOUBLE)),
        |             c -> c * log2(c))) / len(chars), 6)
        |       ELSE 0.0 END AS entropy
        |FROM cs""".stripMargin,

    // Mirrors Retrieval.bm25TopK literal for literal: k1/b enter only
    // as the parsed constants 2.2 / 1.2 / 0.25 / 0.75, every other
    // input is an exact integer, and rank is taken over the ROUNDED
    // score with a doc-id tiebreak, so both engines order identically.
    "q69_bm25_search" -> (WordsCte +
      s""", base AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM words),
        |qt AS (SELECT doc_id, dl, term FROM base
        |       WHERE term IN (${Bm25Query.map(t => s"'$t'").mkString(", ")})),
        |tf AS (SELECT doc_id, term, dl, COUNT(*) AS tf FROM qt GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |                 CAST(SUM(len(ws)) AS BIGINT) AS total_tokens FROM words),
        |scored AS (
        |  SELECT doc_id,
        |         ROUND(SUM(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |               * tf * 2.2
        |               / (tf + 1.2 * (0.25 + 0.75 * dl
        |                   / (CAST(total_tokens AS DOUBLE) / n_docs)))), 6) AS score
        |  FROM tf JOIN dfreq USING (term), stats
        |  GROUP BY doc_id)
        |SELECT doc_id, score, rk FROM (
        |  SELECT doc_id, score,
        |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
        |  FROM scored)
        |WHERE rk <= $Bm25K""".stripMargin),

    // Mirrors Temporal.eventBursts literal for literal: integer window
    // sums (count/sum/sum-of-squares), one fixed float nest, round at
    // 6 before the burst compare.
    "q117_event_bursts" -> (EventsUsCte +
      """, hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, hour, c,
        |         COUNT(c) OVER w AS n,
        |         CAST(SUM(c) OVER w AS BIGINT) AS s,
        |         CAST(SUM(c * c) OVER w AS BIGINT) AS ss
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)),
        |sel AS (
        |  SELECT event_type, hour, c,
        |         ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_prev,
        |         ROUND((c - CAST(s AS DOUBLE) / n)
        |               / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
        |                      / (n - 1) + 1.0), 6) AS z
        |  FROM win WHERE n >= 3)
        |SELECT event_type, hour, c, mean_prev, z,
        |       CAST(z >= 3.0 AS INTEGER) AS burst
        |FROM sel ORDER BY event_type, hour""".stripMargin),

    // Mirrors Retrieval.qlTopK literal for literal: μ enters only as
    // the parsed 2000.0, cf/tf/dl/T are exact integers, one ln per
    // term, rank over the ROUNDED score with a doc-id tiebreak.
    "q116_ql_search" -> (WordsCte +
      s""", base AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM words),
        |qt AS (SELECT doc_id, dl, term FROM base
        |       WHERE term IN (${Bm25Query.map(t => s"'$t'").mkString(", ")})),
        |tf AS (SELECT doc_id, term, dl, COUNT(*) AS tf FROM qt GROUP BY 1, 2, 3),
        |cf AS (SELECT term, COUNT(*) AS cf FROM qt GROUP BY 1),
        |stats AS (SELECT CAST(SUM(len(ws)) AS BIGINT) AS total_tokens FROM words),
        |cand AS (SELECT DISTINCT doc_id, dl FROM tf),
        |grid AS (
        |  SELECT c.doc_id, c.dl, f.term, f.cf, s.total_tokens,
        |         COALESCE(t.tf, 0) AS tf
        |  FROM cand c CROSS JOIN cf f CROSS JOIN stats s
        |  LEFT JOIN tf t ON t.doc_id = c.doc_id AND t.term = f.term),
        |scored AS (
        |  SELECT doc_id,
        |         ROUND(SUM(ln((tf + 2000.0 * cf / CAST(total_tokens AS DOUBLE))
        |               / (dl + 2000.0))), 6) AS score
        |  FROM grid GROUP BY doc_id)
        |SELECT doc_id, score, rk FROM (
        |  SELECT doc_id, score,
        |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
        |  FROM scored)
        |WHERE rk <= $Bm25K""".stripMargin),

    // q35's recursive connected-components CTE + the q19 quality
    // formula; the per-cluster pick windows on the ROUNDED quality with
    // a doc-id tiebreak (same ordering key both engines).
    "q70_canonical_dedup" ->
      (TextOps.minhashPairsCte(bands = 16, rowsPerBand = 4, threshold = 0.5)
        .replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, edges AS (
          |  SELECT id_a AS s, id_b AS d FROM mh_pairs
          |  UNION
          |  SELECT id_b, id_a FROM mh_pairs
          |), reach(s, d) AS (
          |  SELECT s, d FROM edges
          |  UNION
          |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
          |), cl AS (
          |  SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id FROM reach GROUP BY s
          |), qual AS (
          |  SELECT doc_id,
          |         round((CASE WHEN len(qws) BETWEEN 10 AND 100000 THEN 1.0
          |                     WHEN len(qws) > 0 THEN 0.5 ELSE 0.0 END)
          |               * (0.5 + 0.5 * CASE WHEN len(qws) > 0
          |                    THEN CAST(len(list_distinct(qws)) AS DOUBLE) / len(qws)
          |                    ELSE 0.0 END), 6) AS quality
          |  FROM (SELECT doc_id,
          |               list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS qws
          |        FROM documents)
          |), lab AS (
          |  SELECT q.doc_id, COALESCE(cl.cluster_id, q.doc_id) AS cluster_id, q.quality
          |  FROM qual q LEFT JOIN cl ON q.doc_id = cl.doc_id)
          |SELECT doc_id, cluster_id, quality,
          |       CASE WHEN ROW_NUMBER() OVER (PARTITION BY cluster_id
          |              ORDER BY quality DESC, doc_id) = 1 THEN 1 ELSE 0 END AS keep
          |FROM lab""".stripMargin),

    // Mirrors CurationOps.importanceWeights: 60-bit md5 feature hash
    // mod bucket count, add-1 smoothing, the ln-ratio formula written
    // textually identically (the q66 libm precedent; per-doc sum
    // rounded at 6).
    "q71_importance_weights" ->
      s"""WITH fw AS (
        |  SELECT doc_id, lang,
        |         list_filter(string_split_regex(lower(text), '\\s+'), w -> len(w) > 0) AS ws
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang,
        |         unnest(ws || list_transform(generate_series(1, len(ws) - 1),
        |                                     i -> ws[i] || ' ' || ws[i+1])) AS feat
        |  FROM fw),
        |fb AS (
        |  SELECT doc_id, lang,
        |         CAST(('0x' || substr(md5(feat), 1, 15)) AS BIGINT) % $DsirBuckets AS bucket
        |  FROM f),
        |tc AS (SELECT bucket, COUNT(*) AS ct FROM fb WHERE lang = 'en' GROUP BY 1),
        |rc AS (SELECT bucket, COUNT(*) AS cr FROM fb GROUP BY 1),
        |tot AS (SELECT CAST((SELECT COALESCE(SUM(ct), 0) FROM tc) + $DsirBuckets AS DOUBLE) AS tb,
        |               CAST((SELECT COALESCE(SUM(cr), 0) FROM rc) + $DsirBuckets AS DOUBLE) AS rb),
        |scored AS (
        |  SELECT fb.doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_feats,
        |         ROUND(SUM(ln(((COALESCE(ct, 0) + 1.0) * rb) / ((cr + 1.0) * tb))), 6) AS log_ratio
        |  FROM fb JOIN rc USING (bucket) LEFT JOIN tc USING (bucket), tot
        |  GROUP BY fb.doc_id)
        |SELECT doc_id, n_feats, log_ratio,
        |       ROUND(log_ratio / n_feats, 6) AS avg_log_ratio,
        |       log_ratio >= 0 AS keep
        |FROM scored""".stripMargin,

    // Mirrors CurationOps.epochRepeat: integer `//` division (exact on
    // both engines where a double floor could wobble on a knife-edge
    // quotient), LEAST/GREATEST clamps, unnest(generate_series) as the
    // explode twin.
    "q73_epoch_repeat" ->
      s"""WITH toks AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split_regex(lower(text), '\\s+'), w -> len(w) > 0)) AS n_tokens
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |         CAST(LEAST($EpochMax, GREATEST(1, $EpochBudget // SUM(n_tokens))) AS INT) AS n_copies
        |  FROM toks GROUP BY source)
        |SELECT doc_id, source,
        |       CAST(unnest(generate_series(1, n_copies)) AS INT) AS epoch,
        |       n_copies
        |FROM toks JOIN m USING (source)""".stripMargin,

    // Mirrors Retrieval.rrfFuse over the q69 BM25 chain + the
    // all-integer coverage ranking: contributions rounded at 9 and
    // summed as DECIMAL (exact, order-independent), cast to double,
    // ranked with a doc-id tiebreak.
    "q75_rrf_fusion" -> (WordsCte +
      s""", base AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM words),
        |qt AS (SELECT doc_id, dl, term FROM base
        |       WHERE term IN (${Bm25Query.map(t => s"'$t'").mkString(", ")})),
        |tf AS (SELECT doc_id, term, dl, COUNT(*) AS tf FROM qt GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |                 CAST(SUM(len(ws)) AS BIGINT) AS total_tokens FROM words),
        |scored AS (
        |  SELECT doc_id,
        |         ROUND(SUM(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |               * tf * 2.2
        |               / (tf + 1.2 * (0.25 + 0.75 * dl
        |                   / (CAST(total_tokens AS DOUBLE) / n_docs)))), 6) AS score
        |  FROM tf JOIN dfreq USING (term), stats
        |  GROUP BY doc_id),
        |bm AS (SELECT doc_id, rk FROM (
        |  SELECT doc_id,
        |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
        |  FROM scored) WHERE rk <= $Bm25K),
        |cov AS (SELECT doc_id, rk FROM (
        |  SELECT doc_id,
        |         ROW_NUMBER() OVER (ORDER BY nq DESC, tft DESC, doc_id) AS rk
        |  FROM (SELECT doc_id, COUNT(DISTINCT term) AS nq, SUM(tf) AS tft
        |        FROM tf GROUP BY doc_id)) WHERE rk <= $Bm25K),
        |u AS (SELECT doc_id, rk FROM bm UNION ALL SELECT doc_id, rk FROM cov),
        |fused AS (
        |  SELECT doc_id,
        |         CAST(SUM(CAST(ROUND(1.0 / ($RrfK + rk), 9) AS DECIMAL(12,9))) AS DOUBLE) AS rrf_score,
        |         CAST(COUNT(*) AS INT) AS n_lists
        |  FROM u GROUP BY doc_id)
        |SELECT doc_id, rrf_score, n_lists, rk FROM (
        |  SELECT doc_id, rrf_score, n_lists,
        |         ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rk
        |  FROM fused)
        |WHERE rk <= $RrfTopK""".stripMargin),

    // Mirrors Retrieval.ndcgAtK over the q75 rank lists: gains
    // rel/log2(rk+1) rounded at 9 and summed as DECIMAL (exact,
    // order-independent), ideal rank = (rel DESC, rk ASC) row_number,
    // ndcg rounded at 6 with the idcg=0 guard.
    "q76_ndcg_eval" -> (WordsCte +
      s""", base AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM words),
        |qt AS (SELECT doc_id, dl, term FROM base
        |       WHERE term IN (${Bm25Query.map(t => s"'$t'").mkString(", ")})),
        |tf AS (SELECT doc_id, term, dl, COUNT(*) AS tf FROM qt GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |                 CAST(SUM(len(ws)) AS BIGINT) AS total_tokens FROM words),
        |scored AS (
        |  SELECT doc_id,
        |         ROUND(SUM(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |               * tf * 2.2
        |               / (tf + 1.2 * (0.25 + 0.75 * dl
        |                   / (CAST(total_tokens AS DOUBLE) / n_docs)))), 6) AS score
        |  FROM tf JOIN dfreq USING (term), stats
        |  GROUP BY doc_id),
        |bm AS (SELECT doc_id, rk FROM (
        |  SELECT doc_id,
        |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
        |  FROM scored) WHERE rk <= $Bm25K),
        |cov AS (SELECT doc_id, rk FROM (
        |  SELECT doc_id,
        |         ROW_NUMBER() OVER (ORDER BY nq DESC, tft DESC, doc_id) AS rk
        |  FROM (SELECT doc_id, COUNT(DISTINCT term) AS nq, SUM(tf) AS tft
        |        FROM tf GROUP BY doc_id)) WHERE rk <= $Bm25K),
        |rel AS (SELECT doc_id, CAST(COUNT(DISTINCT term) AS DOUBLE) AS rel
        |        FROM tf GROUP BY doc_id),
        |rl AS (
        |  SELECT 'bm25' AS query_id, bm.doc_id, bm.rk, COALESCE(rel, 0.0) AS rel
        |  FROM bm LEFT JOIN rel USING (doc_id)
        |  UNION ALL
        |  SELECT 'coverage', cov.doc_id, cov.rk, COALESCE(rel, 0.0)
        |  FROM cov LEFT JOIN rel USING (doc_id)),
        |cut AS (
        |  SELECT query_id, rk, rel,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY rel DESC, rk ASC) AS irk
        |  FROM rl WHERE rk <= $NdcgK),
        |agg AS (
        |  SELECT query_id,
        |    CAST(SUM(CAST(ROUND(rel / log2(rk + 1.0), 9) AS DECIMAL(18,9))) AS DOUBLE) AS dcg,
        |    CAST(SUM(CAST(ROUND(rel / log2(irk + 1.0), 9) AS DECIMAL(18,9))) AS DOUBLE) AS idcg
        |  FROM cut GROUP BY query_id)
        |SELECT query_id, dcg, idcg,
        |       CASE WHEN idcg > 0 THEN ROUND(dcg / idcg, 6) ELSE 0.0 END AS ndcg
        |FROM agg""".stripMargin),

    // Mirrors winnowedSpanDedup stage for stage: same shingle md5s,
    // same centered-min boundary rule (MIN ignores the null tail
    // hashes on both engines), same running-count chunk ids, and the
    // q40 first-occurrence convention (ROW_NUMBER over the chunk hash
    // ordered by (doc_id, cid) = the Spark side's min(struct) argmin —
    // both engines compare the identical md5 chunk key, so even a
    // collision resolves identically).
    "q77_span_dedup" -> (WordsCte +
      s""", p AS (
        |  SELECT doc_id, ws, CAST(t.j AS BIGINT) AS j
        |  FROM words, unnest(generate_series(1, len(ws))) AS t(j)
        |  WHERE len(ws) > 0
        |), f AS (
        |  SELECT doc_id, j, ws[j] AS word,
        |         CASE WHEN j + $SpanK - 1 <= len(ws)
        |              THEN md5(array_to_string(ws[j:(j + $SpanK - 1)], ' ')) END AS h
        |  FROM p
        |), m AS (
        |  SELECT doc_id, j, word, h,
        |         MIN(h) OVER (PARTITION BY doc_id ORDER BY j
        |           ROWS BETWEEN $SpanR PRECEDING AND $SpanR FOLLOWING) AS hmin
        |  FROM f
        |), c AS (
        |  SELECT doc_id, j, word,
        |         SUM(CASE WHEN j = 1 OR (h IS NOT NULL AND h = hmin)
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY j ROWS UNBOUNDED PRECEDING) - 1 AS cid
        |  FROM m
        |), chunks AS (
        |  SELECT doc_id, cid, array_to_string(list(word ORDER BY j), ' ') AS chunk
        |  FROM c GROUP BY doc_id, cid
        |), ranked AS (
        |  SELECT doc_id, cid, chunk,
        |         ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, cid) AS rn
        |  FROM chunks)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |       CAST(COUNT(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |       COALESCE(array_to_string(list(chunk ORDER BY cid) FILTER (WHERE rn = 1), ' '),
        |                '') AS kept_text
        |FROM ranked GROUP BY doc_id""".stripMargin),

    // Mirrors exactSpanDedup stage for stage: per-position width-T
    // shingle md5s, first occurrence via ROW_NUMBER over the hash
    // ordered by (doc_id, j) (= the Spark side's min(struct) argmin —
    // both engines compare the identical md5 key), coverage via the
    // T-1-preceding running MAX, per-doc rebuild from kept positions.
    "q86_exact_span_dedup" -> (WordsCte +
      s""", p AS (
        |  SELECT doc_id, ws, CAST(t.j AS BIGINT) AS j
        |  FROM words, unnest(generate_series(1, len(ws))) AS t(j)
        |  WHERE len(ws) > 0
        |), f AS (
        |  SELECT doc_id, j, ws[j] AS word,
        |         CASE WHEN j + $ExactSpanT - 1 <= len(ws)
        |              THEN md5(array_to_string(ws[j:(j + $ExactSpanT - 1)], ' ')) END AS h
        |  FROM p
        |), d AS (
        |  SELECT doc_id, j, word, h,
        |         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, j) AS rn
        |  FROM f
        |), c AS (
        |  SELECT doc_id, j, word,
        |         CASE WHEN h IS NOT NULL AND rn > 1 THEN 1 ELSE 0 END AS dup
        |  FROM d
        |), cov AS (
        |  SELECT doc_id, j, word,
        |         MAX(dup) OVER (PARTITION BY doc_id ORDER BY j
        |           ROWS BETWEEN ${ExactSpanT - 1} PRECEDING AND CURRENT ROW) AS rm
        |  FROM c)
        |SELECT doc_id, COUNT(*) AS n_words,
        |       CAST(SUM(rm) AS BIGINT) AS n_dropped,
        |       COALESCE(array_to_string(list(word ORDER BY j) FILTER (WHERE rm = 0), ' '),
        |                '') AS kept_text
        |FROM cov GROUP BY doc_id""".stripMargin),

    // CCNet buckets: the q42 surprisal CTE chain, then ONE ordered
    // cumulative token sum (the Spark side's two-phase cumsum reduces
    // to the same values) and exact-integer third boundaries.
    "q79_perplexity_buckets" -> (WordsCte +
      """, t AS (SELECT doc_id, unnest(ws) AS term FROM words),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |freq AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq),
        |s AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |         CAST(SUM(tf * len(bin(total // cnt))) AS DOUBLE) / SUM(tf) AS mean_bits
        |  FROM tf JOIN freq USING (term), tot
        |  GROUP BY doc_id),
        |c AS (
        |  SELECT *, CAST(SUM(n_tokens) OVER (ORDER BY mean_bits, doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |            AS cum_tokens
        |  FROM s),
        |tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM s)
        |SELECT doc_id, n_tokens, mean_bits, cum_tokens,
        |       CASE WHEN cum_tokens * 3 <= total THEN 'head'
        |            WHEN cum_tokens * 3 <= total * 2 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM c, tt""".stripMargin),

    // Same md5(seed:id) sort key (lower-hex on both engines, ':' via
    // concat), one ordered rank (the Spark side's two-phase rank
    // produces the same values), round-robin shard arithmetic.
    "q82_train_order" ->
      s"""WITH k AS (
        |  SELECT doc_id,
        |         md5('$TrainSeed' || ':' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY k, doc_id) AS BIGINT) AS position
        |  FROM k)
        |SELECT doc_id, position,
        |       CAST((position - 1) % $TrainShards AS INT) AS shard,
        |       CAST((position - 1) // $TrainShards AS BIGINT) AS shard_pos
        |FROM r""".stripMargin,

    // Same 60-bit md5 hash (first 15 hex chars as BIGINT — positive, so
    // % matches Spark's pmod), same salts, same substr arithmetic.
    "q83_fim_split" ->
      """WITH h AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    CAST(('0x' || substr(md5('fim-a:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % (length(text) + 1) AS a,
        |    CAST(('0x' || substr(md5('fim-b:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % (length(text) + 1) AS b,
        |    CAST(('0x' || substr(md5('fim-apply:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 2 AS ap
        |  FROM documents)
        |SELECT doc_id,
        |       CASE WHEN ap = 0 THEN 1 ELSE 0 END AS fim_applied,
        |       CASE WHEN ap = 0 THEN substr(text, 1, CAST(LEAST(a, b) AS INT))
        |            ELSE text END AS prefix,
        |       CASE WHEN ap = 0 THEN substr(text, CAST(LEAST(a, b) AS INT) + 1,
        |                                    CAST(GREATEST(a, b) - LEAST(a, b) AS INT))
        |            ELSE '' END AS middle,
        |       CASE WHEN ap = 0 THEN substr(text, CAST(GREATEST(a, b) AS INT) + 1,
        |                                    n - CAST(GREATEST(a, b) AS INT))
        |            ELSE '' END AS suffix
        |FROM h""".stripMargin,

    // Same salted 60-bit md5 uniform per DISTINCT group, same exact
    // integer thresholds (interpolated from the one Scala computation).
    "q91_grouped_split" ->
      s"""WITH g AS (
        |  SELECT source,
        |         CAST(('0x' || substr(md5('$SplitSeed' || ':' || source), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT DISTINCT source FROM documents)),
        |sp AS (
        |  SELECT source,
        |         CASE WHEN h < $SplitTrainLo THEN 'train'
        |              WHEN h < $SplitValLo THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM g)
        |SELECT doc_id, source, split
        |FROM documents JOIN sp USING (source)""".stripMargin,

    // The same derived old snapshot (drop %11, edit %13, retire a
    // shifted %17 copy), md5 per side, full-outer id join.
    "q95_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 13 = 0 THEN text || ' EDIT' ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, 'retired document' AS text
        |  FROM documents WHERE doc_id % 17 = 0),
        |o AS (SELECT doc_id, md5(text) AS old_hash FROM old),
        |n AS (SELECT doc_id, md5(text) AS new_hash FROM documents)
        |SELECT doc_id, old_hash, new_hash,
        |       CASE WHEN old_hash IS NULL THEN 'added'
        |            WHEN new_hash IS NULL THEN 'removed'
        |            WHEN old_hash = new_hash THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n USING (doc_id)""".stripMargin,

    // KN mirror: bigram pairs from the shared words CTE, the three
    // count tables, and the identical (4n−3)⁺/(4·ctx) +
    // 3·n1f·n1b/(4·ctx)/b_types fixed-order arithmetic.
    "q103_kn_bigram_lm" -> (WordsCte + KnLmCtes +
      "\nSELECT w1, w2, n, ctx, n1f, n1b, b_types, p_kn FROM lm"),

    // PMI mirror: the q103 bigram relation + unigram counts + the two
    // totals, the identical left-associative ratio chain, top-30 under
    // the same total order.
    "q126_pmi_collocations" -> (WordsCte +
      """, bg AS (
        |  SELECT ws[i] AS w1, ws[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS n12
        |  FROM words, unnest(generate_series(1, len(ws) - 1)) t(i)
        |  WHERE len(ws) >= 2
        |  GROUP BY 1, 2),
        |uw AS (SELECT unnest(ws) AS w FROM words),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS nu FROM uw GROUP BY 1),
        |nb AS (SELECT CAST(SUM(n12) AS BIGINT) AS n_b FROM bg),
        |nu AS (SELECT CAST(SUM(nu) AS BIGINT) AS n_u FROM uni)
        |SELECT bg.w1, bg.w2, bg.n12, u1.nu AS n1, u2.nu AS n2,
        |       CAST(bg.n12 AS DOUBLE) * CAST(nu.n_u AS DOUBLE)
        |         / CAST(u1.nu AS DOUBLE) / CAST(u2.nu AS DOUBLE)
        |         * CAST(nu.n_u AS DOUBLE) / CAST(nb.n_b AS DOUBLE) AS pmi_ratio
        |FROM bg JOIN uni u1 ON bg.w1 = u1.w JOIN uni u2 ON bg.w2 = u2.w, nb, nu
        |WHERE bg.n12 >= 5
        |ORDER BY pmi_ratio DESC, w1 ASC, w2 ASC LIMIT 30""".stripMargin),

    // Drift mirror: conditional-sum word counts across the halves,
    // pooled-expectation chi-square per row (identical op nest, zero
    // guard included), top-30 under the same total order.
    "q127_corpus_drift" ->
      """WITH words AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             w -> len(w) > 0) AS ws
        |  FROM documents
        |), w AS (SELECT doc_id, unnest(ws) AS item FROM words),
        |counts AS (
        |  SELECT item AS w,
        |         CAST(SUM(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |         CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM w GROUP BY 1),
        |totals AS (SELECT CAST(SUM(na) AS BIGINT) AS ta,
        |                  CAST(SUM(nb) AS BIGINT) AS tb FROM counts)
        |SELECT w, na, nb,
        |       CASE WHEN ta > 0 AND tb > 0 THEN
        |         (CAST(na AS DOUBLE)
        |            - CAST(na + nb AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |         * (CAST(na AS DOUBLE)
        |            - CAST(na + nb AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |         / (CAST(na + nb AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |         + (CAST(nb AS DOUBLE)
        |            - CAST(na + nb AS DOUBLE) * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |         * (CAST(nb AS DOUBLE)
        |            - CAST(na + nb AS DOUBLE) * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |         / (CAST(na + nb AS DOUBLE) * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |       ELSE 0.0 END AS chi2
        |FROM counts, totals
        |WHERE na + nb >= 10
        |ORDER BY chi2 DESC, w ASC LIMIT 30""".stripMargin,

    // Vocabulary mirror: same (doc, word) rollup, same top-20 total
    // order, LEFT-join membership, integer-over-integer fraction.
    "q128_vocab_coverage" ->
      """WITH words AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             w -> len(w) > 0) AS ws
        |  FROM documents
        |), dw AS (
        |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM (SELECT doc_id, unnest(ws) AS w FROM words) GROUP BY 1, 2
        |), vocab AS (
        |  SELECT w FROM (
        |    SELECT w, CAST(SUM(k) AS BIGINT) AS n FROM dw GROUP BY 1
        |    ORDER BY n DESC, w ASC LIMIT 20)
        |), per AS (
        |  SELECT dw.doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
        |         CAST(SUM(CASE WHEN v.w IS NULL THEN k ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM dw LEFT JOIN vocab v ON dw.w = v.w GROUP BY 1)
        |SELECT d.doc_id,
        |       COALESCE(n_tokens, 0) AS n_tokens,
        |       COALESCE(n_oov, 0) AS n_oov,
        |       CASE WHEN COALESCE(n_tokens, 0) > 0
        |            THEN CAST(n_oov AS DOUBLE) / n_tokens ELSE 0.0 END AS oov_frac
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // JSD mirror: conditional-sum per-language word counts, the
    // identical per-word fixed nest rounded to micro fixed-point
    // BEFORE the cross-row sum, pair sums unpivoted by UNION ALL.
    "q129_js_divergence" -> JsDivergenceSql,

    // CDC-dedup mirror: the shared chunk CTE over the boilerplate-
    // augmented corpus, first occurrence as rn = 1 under the identical
    // (doc_id, chunk_idx) total order, per-doc rollup.
    "q133_cdc_dedup" -> (CdcChunksCte(
      "(SELECT doc_id, text || CASE WHEN doc_id % 4 = 0 THEN ' " +
        CdcBoiler + "' ELSE '' END AS text FROM documents) aug") +
      """
        |, ranked AS (
        |  SELECT doc_id, chunk_idx, n_words,
        |    ROW_NUMBER() OVER (PARTITION BY chunk_md5
        |      ORDER BY doc_id, chunk_idx) AS rn
        |  FROM chunks)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  CAST(SUM(CASE WHEN rn > 1 THEN n_words ELSE 0 END) AS BIGINT) AS dup_words
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // Block-diff mirror: two prefixed chunk CTE chains (old = prefix-
    // edited documents minus the % 11 rows), DISTINCT old block set,
    // left join on (doc_id, chunk_md5), per-doc rollup.
    "q134_cdc_block_diff" -> ("WITH " +
      cdcChunksCteBody(
        "(SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN 'EDIT PREFIX ' || text ELSE text END AS text FROM documents WHERE doc_id % 11 <> 0) oldv",
        "o") + ",\n" +
      cdcChunksCteBody("documents", "n") +
      """
        |, ob AS (SELECT DISTINCT doc_id, chunk_md5 FROM ochunks)
        |SELECT n.doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |  CAST(SUM(CASE WHEN ob.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_reused,
        |  CAST(SUM(CASE WHEN ob.chunk_md5 IS NULL THEN n.n_words ELSE 0 END) AS BIGINT) AS fresh_words
        |FROM nchunks n LEFT JOIN ob
        |  ON n.doc_id = ob.doc_id AND n.chunk_md5 = ob.chunk_md5
        |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin),

    // Heaps mirror (generated — see HeapsSql).
    "q139_heaps_law" -> HeapsSql,

    // HRW mirror: identical salted 60-bit hashes per (shard, doc),
    // argmax via ROW_NUMBER ordered (w DESC, s DESC) — the struct-max
    // tiebreak direction.
    "q144_rendezvous_shards" ->
      s"""WITH c AS (
        |  SELECT doc_id, s,
        |         CAST(('0x' || substr(md5('$RvSalt:' || CAST(s AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS w
        |  FROM documents, unnest(generate_series(0, ${RvShards - 1})) t(s)),
        |r AS (
        |  SELECT doc_id, s,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w DESC, s DESC) AS rn
        |  FROM c)
        |SELECT doc_id, CAST(s AS INT) AS shard FROM r WHERE rn = 1""".stripMargin,

    // same host synthesis, suffix explode via list slicing, broadcast
    // rules as VALUES, min-rule verdict
    "q145_domain_blocklist" ->
      s"""WITH h AS (
        |  SELECT doc_id,
        |         source || '.example' || CAST(doc_id % 3 AS VARCHAR) || '.co.uk' AS host
        |  FROM documents),
        |p AS (SELECT doc_id, host, string_split(lower(host), '.') AS parts FROM h),
        |s AS (
        |  SELECT doc_id, array_to_string(parts[i:], '.') AS suf
        |  FROM p, unnest(generate_series(1, len(parts))) t(i)),
        |b AS (SELECT * FROM (VALUES ${BlockRules.map(r => s"('$r')").mkString(", ")}) v(rule)),
        |m AS (SELECT doc_id, MIN(rule) AS rule FROM s JOIN b ON s.suf = b.rule GROUP BY doc_id)
        |SELECT h.doc_id, h.host,
        |       CASE WHEN m.rule IS NOT NULL THEN 1 ELSE 0 END AS blocked, m.rule
        |FROM h LEFT JOIN m USING (doc_id)""".stripMargin,

    // identical candidate synthesis (md5-digit prefix rpad-truncated
    // to 15 + doc_id check digit) and the digit-for-digit Luhn sum
    // (1-based from the right: odd positions plain, even doubled-9)
    "q146_luhn_pii" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         rpad(regexp_replace(md5(CAST(doc_id AS VARCHAR)), '[a-f]', '', 'g'), 15, '7')
        |           || CAST(doc_id % 10 AS VARCHAR) AS candidate
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, candidate, i,
        |         CAST(substr(reverse(candidate), i, 1) AS INT) AS dg
        |  FROM c, unnest(generate_series(1, length(candidate))) t(i)),
        |s AS (
        |  SELECT doc_id, candidate,
        |         SUM(CASE WHEN i % 2 = 1 THEN dg
        |                  WHEN dg * 2 > 9 THEN dg * 2 - 9 ELSE dg * 2 END) AS tot
        |  FROM d GROUP BY doc_id, candidate)
        |SELECT doc_id, candidate,
        |       CASE WHEN tot % 10 = 0 THEN 1 ELSE 0 END AS luhn_valid
        |FROM s""".stripMargin,

    // q91's split mirror over the pseudo-shard groups + the 8-word
    // prefix fingerprint; leaked = key present in >1 split
    "q147_split_leakage" ->
      s"""WITH g AS (
        |  SELECT grp,
        |         CAST(('0x' || substr(md5('$SplitSeed' || ':' || CAST(grp AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
        |  FROM (SELECT DISTINCT doc_id % 64 AS grp FROM documents)),
        |sp AS (
        |  SELECT grp,
        |         CASE WHEN hh < $SplitTrainLo THEN 'train'
        |              WHEN hh < $SplitValLo THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM g),
        |k AS (
        |  SELECT md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS h, split
        |  FROM documents d JOIN sp ON d.doc_id % 64 = sp.grp),
        |a AS (
        |  SELECT h,
        |         CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |         CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        |         CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
        |         COUNT(*) AS n_docs
        |  FROM k GROUP BY h)
        |SELECT h, n_train, n_val, n_test, n_docs FROM a
        |WHERE (CASE WHEN n_train > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_val > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_test > 0 THEN 1 ELSE 0 END) > 1""".stripMargin,

    // A-ES mirror: identical hash → u → -ln(u)/w nest; selection on
    // the RAW key, the emitted key rounded at 9 (libm ln is not
    // correctly rounded — a raw last-ulp mismatch surfaced at sf0.1).
    "q132_weighted_sample" -> (ToksCte +
      """, keyed AS (
        |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    -ln((CAST(('0x' || substr(md5('es' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
        |        / CAST('1152921504606846976' AS DOUBLE))
        |      / CAST(n_tokens AS DOUBLE) AS es_key
        |  FROM toks WHERE n_tokens > 0),
        |sel AS (SELECT doc_id, n_tokens, es_key FROM keyed
        |        ORDER BY es_key ASC, doc_id ASC LIMIT 60)
        |SELECT doc_id, n_tokens, round(es_key, 9) AS es_key FROM sel""".stripMargin),

    // CDC mirror (relational formulation of the per-row HOF math):
    // per-position trailing-window hashes through the engine-wide
    // 60-bit md5 idiom, boundary flags cumsum'd into chunk ids
    // (1-PRECEDING keeps the boundary word in its chunk), chunks
    // reassembled by ordered string_agg.
    "q131_cdc_segments" ->
      (CdcChunksCte("documents") +
        "\nSELECT doc_id, chunk_idx, n_words, chunk_md5 FROM chunks" +
        "\nORDER BY doc_id, chunk_idx"),

    // The trained LM applied: per-doc bigram tokens LEFT-joined to the
    // thresholded LM, integer unseen/rare counters (a float COMPARISON
    // per row feeds a counter; nothing float accumulates), unrounded
    // fraction, keep flag.
    "q104_kn_doc_filter" -> (WordsCte + KnLmCtes +
      s""",
        |toks AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |  FROM words, unnest(generate_series(1, len(ws) - 1)) t(i)
        |  WHERE len(ws) >= 2),
        |st AS (
        |  SELECT doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |         CAST(SUM(CASE WHEN lm.p_kn IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
        |         CAST(SUM(CASE WHEN lm.p_kn IS NOT NULL AND lm.p_kn < $KnPThreshold
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |  FROM toks LEFT JOIN lm ON toks.w1 = lm.w1 AND toks.w2 = lm.w2
        |  GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_unseen, n_rare,
        |       CAST(n_unseen + n_rare AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS rare_frac,
        |       CASE WHEN CAST(n_unseen + n_rare AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        |                 <= $KnMaxRareFrac THEN 1 ELSE 0 END AS keep
        |FROM st""".stripMargin),

    // KN-trigram mirror: trigram/context/continuation/middle tables
    // plus the q103 bigram-continuation tables, and the identical
    // fixed nest — p0, inner, outer — of integer-ratio IEEE ops
    // (shared CTE chain with q107's filter).
    "q105_kn_trigram_lm" -> (WordsCte + Kn3Ctes +
      "\nSELECT w1, w2, w3, n, ctx3, f3, c23, nctx2, m2, n1b, b_types, p_kn3 FROM lm3"),

    // The trigram LM applied as the doc filter (the q104 shape one
    // order up): trigram tokens LEFT-joined to the thresholded trigram
    // LM, integer unseen/rare counters, unrounded fraction, keep flag.
    "q107_kn_doc_filter3" -> (WordsCte + Kn3Ctes +
      s""",
        |toks3 AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3
        |  FROM words, unnest(generate_series(1, len(ws) - 2)) t(i)
        |  WHERE len(ws) >= 3),
        |st3 AS (
        |  SELECT doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_trigrams,
        |         CAST(SUM(CASE WHEN lm3.p_kn3 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
        |         CAST(SUM(CASE WHEN lm3.p_kn3 IS NOT NULL AND lm3.p_kn3 < $Kn3PThreshold
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |  FROM toks3 LEFT JOIN lm3
        |    ON toks3.w1 = lm3.w1 AND toks3.w2 = lm3.w2 AND toks3.w3 = lm3.w3
        |  GROUP BY doc_id)
        |SELECT doc_id, n_trigrams, n_unseen, n_rare,
        |       CAST(n_unseen + n_rare AS DOUBLE) / CAST(n_trigrams AS DOUBLE) AS rare_frac,
        |       CASE WHEN CAST(n_unseen + n_rare AS DOUBLE) / CAST(n_trigrams AS DOUBLE)
        |                 <= $Kn3MaxRareFrac THEN 1 ELSE 0 END AS keep
        |FROM st3""".stripMargin),

    // KMV mirror: per-side shingle CTEs (the ShinglesCte shape with a
    // parity filter), the engine-wide 60-bit md5 hash, membership
    // max-merge, bottom-128 by hash, then the identical fixed-order
    // divisions (2^60 inlined as the exact double literal).
    "q98_corpus_overlap_kmv" ->
      """WITH wa AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents WHERE doc_id % 2 = 0),
        |wb AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents WHERE doc_id % 2 = 1),
        |sa AS (
        |  SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |  FROM wa, unnest(generate_series(1, len(ws) - 2)) t(i) WHERE len(ws) >= 3
        |  UNION ALL
        |  SELECT array_to_string(ws, ' ') FROM wa WHERE len(ws) BETWEEN 1 AND 2),
        |sb AS (
        |  SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |  FROM wb, unnest(generate_series(1, len(ws) - 2)) t(i) WHERE len(ws) >= 3
        |  UNION ALL
        |  SELECT array_to_string(ws, ' ') FROM wb WHERE len(ws) BETWEEN 1 AND 2),
        |ha AS (SELECT DISTINCT CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h FROM sa),
        |hb AS (SELECT DISTINCT CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h FROM sb),
        |u AS (
        |  SELECT h, MAX(ia) AS ia, MAX(ib) AS ib FROM (
        |    SELECT h, 1 AS ia, 0 AS ib FROM ha
        |    UNION ALL
        |    SELECT h, 0 AS ia, 1 AS ib FROM hb) t
        |  GROUP BY h),
        |sk AS (SELECT h, ia, ib FROM u ORDER BY h ASC LIMIT 128),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS sketch_size,
        |         COALESCE(MAX(h), 0) AS kth_min,
        |         CAST(COALESCE(SUM(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_both,
        |         CAST(COALESCE(SUM(ia), 0) AS BIGINT) AS n_a,
        |         CAST(COALESCE(SUM(ib), 0) AS BIGINT) AS n_b
        |  FROM sk)
        |SELECT sketch_size, kth_min, n_both, n_a, n_b,
        |       CASE WHEN sketch_size = 0 THEN 0.0
        |            ELSE CAST(n_both AS DOUBLE) / CAST(sketch_size AS DOUBLE) END AS est_jaccard,
        |       CASE WHEN n_a = 0 THEN 0.0
        |            ELSE CAST(n_both AS DOUBLE) / CAST(n_a AS DOUBLE) END AS est_contain_a,
        |       CASE WHEN n_b = 0 THEN 0.0
        |            ELSE CAST(n_both AS DOUBLE) / CAST(n_b AS DOUBLE) END AS est_contain_b,
        |       CASE WHEN sketch_size = 128
        |            THEN CAST(sketch_size - 1 AS DOUBLE) * 1.152921504606846976e18
        |                 / CAST(kth_min AS DOUBLE)
        |            ELSE CAST(sketch_size AS DOUBLE) END AS est_union
        |FROM ag""".stripMargin
  )
}
