package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for pre-training data pipelines:
  * repetition signals (Gopher-style), benchmark decontamination,
  * deterministic stratified sampling, and TF-IDF keyword extraction.
  *
  * All four are column-first (whole-stage codegen'd) with the shuffle
  * structure chosen for the 100 TB case:
  *  - repetition stats are pure per-row array math — zero shuffles;
  *  - decontamination broadcasts the (small) benchmark shingle set;
  *  - stratified sampling and TF-IDF top-k use `row_number` filters
  *    that Spark rewrites to `WindowGroupLimit` (map-side partial
  *    top-k before the shuffle).
  */
object CurationOps {

  /** The engine-wide tokenization (see [[TextTokens]]) so curation
    * signals compose with the near-dup/quality suite.
    */
  private def wordsCol(text: Column): Column = TextTokens.wordsCol(text)

  // ---- repetition signals (Gopher-style) ---------------------------------

  /** Word bigrams of a token array ("a b", "b c", …); empty below 2. */
  private def bigramsExpr(ws: Column): Column =
    when(size(ws) >= 2,
      transform(sequence(lit(0), size(ws) - 2),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(2)))))
      .otherwise(array().cast("array<string>"))

  /** (w1, w2) struct bigrams of a token array; empty below 2 words.
    * The size guard matters: an empty/whitespace-only document makes
    * `size(ws) - 1` NEGATIVE, and an unguarded `slice` with a negative
    * length is a Spark runtime exception that kills the whole job —
    * the [[bigramsExpr]] discipline, shared by every n-gram builder.
    */
  private[textops] def bigramStructsExpr(ws: Column): Column =
    when(size(ws) >= 2,
      zip_with(
        slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** (w1, w2, w3) struct trigrams; empty below 3 words (same guard). */
  private[textops] def trigramStructsExpr(ws: Column): Column =
    when(size(ws) >= 3,
      zip_with(
        zip_with(
          slice(ws, lit(1), size(ws) - 2), slice(ws, lit(2), size(ws) - 2),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(ws, lit(3), size(ws) - 2),
        (p, c) => struct(
          p.getField("w1").as("w1"), p.getField("w2").as("w2"), c.as("w3"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string,w3:string>>"))

  /** Frequency share of the most common word (0.0 for empty docs). */
  private def topWordFracExpr(ws: Column): Column =
    when(size(ws) > 0,
        array_max(transform(array_distinct(ws), w => size(filter(ws, x => x === w))))
          .cast("double") / size(ws))
      .otherwise(lit(0.0))

  /** Duplicate fraction among word bigrams (0.0 when fewer than 2). */
  private def dupBigramFracExpr(gs: Column): Column =
    when(size(gs) > 0,
        (size(gs) - size(array_distinct(gs))).cast("double") / size(gs))
      .otherwise(lit(0.0))

  /** Per-document repetition signals, the standard pre-training filters
    * from the Gopher/MassiveText rules: the frequency share of the most
    * common word and the duplicate fraction among word bigrams. Both are
    * exact integer ratios (one double division) so the DuckDB oracle is
    * bit-identical. `repetitive` flags documents past the published-ish
    * thresholds (top word > 20 %, duplicate bigrams > 60 %).
    *
    * Shape note: everything is per-row array arithmetic — no explode, no
    * aggregate, no shuffle. The top-word count is O(words × distinct)
    * per row, which is the right trade at scale: documents are chunked
    * upstream (SURVEY T4-T7) so row length is bounded, and the
    * alternative (explode + two groupBys) shuffles every token.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Tokenize and build bigrams in staged projections: the HOFs here
    // are CodegenFallback with no cross-expression CSE, so referencing
    // the raw expressions from every output column would re-tokenize the
    // document 3-4x per row. Staged aliases are NOT collapsed back by
    // CollapseProject (the expressions are non-cheap, multi-referenced).
    val ws = col("__ws")
    val gs = col("__gs")
    df.select(col(idCol), wordsCol(col(textCol)).as("__ws"))
      .select(col(idCol), ws, bigramsExpr(ws).as("__gs"))
      .select(
        col(idCol),
        size(ws).as("n_words"),
        topWordFracExpr(ws).as("top_word_frac"),
        dupBigramFracExpr(gs).as("dup_bigram_frac"))
      .withColumn("repetitive",
        (col("top_word_frac") > 0.2 || col("dup_bigram_frac") > 0.6).cast("int"))
  }

  // ---- composite quality gate (Gopher rules) -----------------------------

  /** Gopher/MassiveText-style composite document filter (Rae et al.
    * 2021, appendix A1.1), adapted to the engine's exact-integer-ratio
    * float policy so every signal — and therefore the keep decision —
    * is bit-identical in the DuckDB oracle:
    *
    *  - 50 ≤ word count ≤ 100,000
    *  - 3 ≤ mean word length ≤ 10
    *  - symbol-word fraction ('#' or '...') ≤ 0.1
    *  - bullet-started line fraction < 0.9
    *  - ellipsis-ended line fraction < 0.3
    *  - ≥ 80 % of words contain an [a-z] letter
    *  - ≥ 2 distinct English stop words present
    *  - not repetitive: top-word share ≤ 0.2, duplicate bigrams ≤ 0.6
    *
    * Same zero-shuffle shape as [[repetitionStats]]: per-row array math
    * only. Lines are split with limit -1 (trailing empty lines kept, as
    * DuckDB's string_split does).
    */
  def qualityGate(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = col("__ws")
    val gs = col("__gs")
    val ls = col("__ls")
    val stop = array(TextAnalysis.Profiles("en").map(lit): _*)
    def frac(n: Column, d: Column): Column =
      when(d > 0, n.cast("double") / d).otherwise(lit(0.0))
    df.select(col(idCol), col(textCol), wordsCol(col(textCol)).as("__ws"))
      .select(col(idCol), ws, bigramsExpr(ws).as("__gs"),
        split(col(textCol), "\n", -1).as("__ls"))
      .select(
        col(idCol),
        size(ws).as("n_words"),
        frac(aggregate(transform(ws, w => length(w)), lit(0), (a, x) => a + x), size(ws))
          .as("avg_word_len"),
        frac(size(filter(ws, w => w.contains("#") || w.contains("..."))), size(ws))
          .as("symbol_word_frac"),
        frac(size(filter(ls, l => l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• "))),
          size(ls)).as("bullet_line_frac"),
        frac(size(filter(ls, l => l.endsWith("...") || l.endsWith("…"))), size(ls))
          .as("ellipsis_line_frac"),
        frac(size(filter(ws, w => w.rlike("[a-z]"))), size(ws)).as("alpha_word_frac"),
        size(array_intersect(ws, stop)).as("stop_hits"),
        topWordFracExpr(ws).as("top_word_frac"),
        dupBigramFracExpr(gs).as("dup_bigram_frac"))
      .withColumn("keep",
        (col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("avg_word_len") >= 3.0 && col("avg_word_len") <= 10.0 &&
          col("symbol_word_frac") <= 0.1 &&
          col("bullet_line_frac") < 0.9 &&
          col("ellipsis_line_frac") < 0.3 &&
          col("alpha_word_frac") >= 0.8 &&
          col("stop_hits") >= 2 &&
          col("top_word_frac") <= 0.2 &&
          col("dup_bigram_frac") <= 0.6).cast("int"))
  }

  // ---- benchmark decontamination -----------------------------------------

  /** Flags corpus documents sharing any word n-gram with a benchmark
    * set — the GPT-3/Llama-style n-gram-collision decontamination
    * check. Returns one row per contaminated corpus document with the
    * number of shared distinct shingles and of benchmark documents hit.
    *
    * Scale shape: shingles are reduced to the engine-wide 60-bit md5
    * hash ([[NearDup.shingleHash60]]) and the benchmark side — small by
    * definition (eval sets are MBs, the corpus is TBs) — is broadcast,
    * so the corpus is scanned once with no shuffle.
    */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    def hashes(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
          explode(NearDup.shinglesCol(col(textCol), n)).as("shingle"))
        .select(col(as), NearDup.shingleHash60(col("shingle")).as("h"))
    // Only the (small) benchmark side is deduped pre-join; the corpus
    // side flows straight into the broadcast join with NO shuffle — a
    // pre-join corpus distinct would shuffle every corpus shingle, and
    // both final aggregates are countDistinct so it buys nothing
    // (shinglesCol already emits distinct shingles per doc anyway).
    hashes(corpus, idCol)
      .join(broadcast(hashes(benchmark, "bench_id").distinct()), "h")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("h")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  /** Per-document contamination SCORE — the reporting complement of
    * [[decontaminate]]'s flag list: EVERY corpus document gets
    * `contamination = |distinct shingle hashes ∩ benchmark| /
    * |distinct shingle hashes|` (0.0 for clean docs), the number a
    * curation run publishes ("0.8% of documents carry >5% benchmark
    * overlap") and thresholds instead of hard-dropping. Same broadcast
    * shape as [[decontaminate]] — the corpus never shuffles for the
    * probe; the per-doc aggregates are map-side combined. The ratio is
    * an UNROUNDED division of exact integers, so it is bit-identical
    * across engines (a round-at-6 of integer-derived ratios is NOT —
    * the q65 lesson).
    */
  def contaminationScore(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val benchHashes = benchmark
      .select(explode(NearDup.shinglesCol(col(textCol), n)).as("s"))
      .select(NearDup.shingleHash60(col("s")).as("h")).distinct()
    corpus
      .select(col(idCol),
        explode(NearDup.shinglesCol(col(textCol), n)).as("s"))
      .select(col(idCol), NearDup.shingleHash60(col("s")).as("h"))
      .join(broadcast(benchHashes.withColumn("__hit", lit(1))), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("h")).as("n_shingles"),
        countDistinct(when(col("__hit").isNotNull, col("h"))).as("n_shared"))
      .withColumn("contamination",
        col("n_shared").cast("double") / col("n_shingles").cast("double"))
  }

  /** Bloom-filter decontamination pre-pass — [[decontaminate]]'s scale
    * path when the benchmark side outgrows a broadcast hash set. An
    * exact-set broadcast carries 8+ bytes per distinct benchmark
    * shingle; the Bloom filter carries ~14 bits per item at 0.1% fpp
    * (~5× smaller, constant-time probe, no join at all on the corpus
    * side — the probe is a per-row map, so the corpus never shuffles
    * and never explodes into join rows).
    *
    * The filter is built DISTRIBUTED (`stat.bloomFilter` merges
    * per-partition sketches, the same mergeable-sketch shape as HLL)
    * and broadcast once. Guarantee: NO false negatives — every doc the
    * exact join would flag is flagged here, so running [[decontaminate]]
    * on only the flagged docs equals running it on the full corpus
    * (spec-pinned). False positives are bounded by `fpp` per probe and
    * only cost wasted verify work, never a missed contamination.
    *
    * The probe is a Scala UDF: Spark's bloom-probe expression
    * (`BloomFilterMightContain`) is internal to runtime row-group
    * filtering and not public API. One boxed call per corpus shingle is
    * the price of the no-join shape; flagged rows then re-verify
    * exactly. Not gate-oracled: Bloom bit layouts are
    * implementation-specific (DuckDB cannot reproduce them) — the
    * containment and composition properties are spec-pinned instead.
    */
  def decontaminateBloomFlags(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, fpp: Double): DataFrame = {
    val spark = corpus.sparkSession
    val benchHashes = benchmark
      .select(explode(NearDup.shinglesCol(col(textCol), n)).as("shingle"))
      .select(NearDup.shingleHash60(col("shingle")).as("h"))
      .distinct()
      .persist() // consumed twice: sizing count + filter build
    val bfB =
      try {
        val expected = math.max(1L, benchHashes.count())
        val bf = benchHashes.stat.bloomFilter("h", expected, fpp)
        spark.sparkContext.broadcast(bf)
      } finally {
        // both consumers are actions that completed above; the returned
        // plan reads only the broadcast filter, never this frame
        benchHashes.unpersist()
      }
    val mightContain = udf((h: Long) => bfB.value.mightContainLong(h))
    corpus
      .select(col(idCol), explode(NearDup.shinglesCol(col(textCol), n)).as("shingle"))
      .select(col(idCol), NearDup.shingleHash60(col("shingle")).as("h"))
      .filter(mightContain(col("h")))
      .groupBy(col(idCol))
      .agg(countDistinct(col("h")).as("n_suspect_shingles"))
  }

  // ---- soft dedup: reweight instead of drop ------------------------------

  /** Soft deduplication (SoftDedup — She et al., "SoftDedup: an
    * Efficient Data Reweighting Method for Speeding Up Language Model
    * Pre-training", ACL 2024): instead of HARD-dropping duplicates,
    * every document gets a sampling weight inversely proportional to
    * its "commonness" — how duplicated its content is across the
    * corpus — so repeated content contributes less training signal
    * without discarding its unique parts. Commonness here is the mean
    * corpus document-frequency of the document's distinct word
    * n-gram shingles (a shingle shared by 3 documents contributes 3):
    * exact duplicates triple their every shingle's df, near-duplicates
    * raise it on the shared prefix only — the graded signal hard dedup
    * (q11/q81) collapses to a binary.
    *
    * Emits `(id, n_shingles, sum_df, commonness_e9 = sum_df*1e9 div
    * n_shingles, weight_e9 = n_shingles*1e9 div sum_df)` — ALL-LONG
    * columns. The ratios are scaled-integer (nano) fixed-point, pure
    * 64-bit integer division on both engines (Spark `div`, DuckDB
    * `//`): the r8 attempt quantized doubles with `round(x, 9)` and
    * stayed driver-red because `ROUND(DOUBLE, 9)` itself is not
    * portable across DuckDB versions (float-multiply+rint in some,
    * exact decimal in others) and never equals Spark's BigDecimal
    * HALF_UP by construction. Integer `+ * div` is the only
    * cross-engine-pinned arithmetic, so the gate emits no floats at
    * all. Range: sum_df ≤ ~10^7 at sf0.1, ×10^9 < 2^63. A fully
    * unique document has commonness_e9 = weight_e9 = 1_000_000_000;
    * weight_e9 is the reciprocal, in (0, 1e9].
    *
    * Scale shape (the q42 unigram-surprisal shape): distinct
    * (doc, shingle-hash) pairs → map-side-combined df aggregate →
    * join back ON THE SHINGLE HASH → per-doc aggregate. Every stage
    * shuffles on a key (no cross product, no window); the 60-bit
    * hash keeps the shuffle narrow.
    */
  def softDedupWeights(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = df
      .select(col(idCol), explode(NearDup.shinglesCol(col(textCol), n)).as("s"))
      .select(col(idCol), NearDup.shingleHash60(col("s")).as("h"))
      .distinct()
      // two consumers (the df aggregate and the probe join) — without
      // the checkpoint the corpus-wide explode + distinct runs TWICE
      // (verified in the executed plan: two parquet scans); eager=false
      // so the first action materializes it (the q78 convention)
      .localCheckpoint(eager = false)
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    sh.join(dfreq, "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("sum_df"))
      .withColumn("commonness_e9",
        expr("sum_df * CAST(1000000000 AS BIGINT) div n_shingles"))
      .withColumn("weight_e9",
        expr("n_shingles * CAST(1000000000 AS BIGINT) div sum_df"))
  }

  /** Tokenizer fertility panel — the multilingual budget signal the
    * mix family consumes: the SAME text costs different token counts
    * per language under one vocabulary (fertility = tokens per word;
    * compression = bytes per token), and a token-budgeted mix
    * (q37/q67/q170) that ignores fertility silently under-samples
    * high-fertility languages. Per group: docs, words, UTF-8 bytes,
    * tokens under the injected [[graft.functions.Tokenizer]], and the
    * two scaled-integer ratios `tokens_per_kword = tokens·1000 div
    * words` and `bytes_per_token_e3 = bytes·1000 div tokens`
    * (zero-guarded). Spec-verified rather than oracled: the tokenizer
    * is engine-side (a BPE walk is not SQL-expressible — the
    * q-digest/BPE boundary).
    *
    * Scale shape: one per-row tokenize (the one UDF builtins can't
    * reach — a bounded string walk) + one map-side-combinable groupBy
    * on the language key.
    */
  def tokenizerFertility(df: DataFrame, groupCol: String, textCol: String,
      tokenizer: graft.functions.Tokenizer): DataFrame = {
    // ONE definition of "tokens of a text column" engine-wide — the
    // chunker/budget UDF, not a local twin that could drift on nulls
    val tok = (c: Column) =>
      TextAnalysis.tokenCountUdf(tokenizer)(c).cast("long")
    df.select(col(groupCol),
        TextTokens.wordsCol(col(textCol)).as("__ws"),
        octet_length(col(textCol)).cast("long").as("__bytes"),
        tok(col(textCol)).as("__toks"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("__ws")).cast("long")).as("n_words"),
        sum(col("__bytes")).as("n_bytes"),
        sum(col("__toks")).as("n_tokens"))
      .withColumn("tokens_per_kword",
        expr("CASE WHEN n_words > 0 THEN n_tokens * 1000 div n_words ELSE 0 END"))
      .withColumn("bytes_per_token_e3",
        expr("CASE WHEN n_tokens > 0 THEN n_bytes * 1000 div n_tokens ELSE 0 END"))
  }

  /** Curriculum mix schedule — the per-STEP twin of
    * [[graft.ingest.Frontier.apportion]], and the thing a staged
    * training run actually consumes (start natural-text-heavy, end
    * code-heavy; anneal a contaminated source out): each source
    * carries two endpoint weights, step `s` of `S` uses the integer
    * lerp `w(s) = w0·(S−s) + w1·s`, and the per-step fetch budget
    * splits by Hamilton largest-remainder within the step — base
    * `⌊B·w/totₛ⌋` plus one top-up per largest remainder (source-asc
    * ties). Per step, quotas sum to EXACTLY `B`; everything is 64-bit
    * integer arithmetic (`budget · w(s) < 2^63` — w(s) ≤
    * max(w0,w1)·S).
    *
    * Emits one row per (step, source): `(step, source, w, quota)`.
    *
    * Scale shape: steps explode per source row (S × sources rows —
    * the schedule grain, thousands at worst), then every pass is a
    * window PARTITIONED BY step (totals, leftover, remainder rank) —
    * parallel across steps, never a single-task window, no collect,
    * no join.
    */
  def mixSchedule(sources: DataFrame, srcCol: String, w0Col: String,
      w1Col: String, steps: Int, budget: Long): DataFrame = {
    require(steps >= 1, s"steps must be positive: $steps")
    require(budget >= 0, s"budget must be non-negative: $budget")
    val src = sources
      .select(col(srcCol), col(w0Col).cast("long").as("__w0"),
        col(w1Col).cast("long").as("__w1"))
    // enforce what the integer law needs (the apportion convention):
    // a NEGATIVE weight breaks div/`//` parity (they only agree on
    // nonnegatives — the file's own pinned rule), and a zero endpoint
    // SUM zeroes some step's total, turning that step's quotas NULL.
    // Two bounded jobs: limit-1 scan + one two-column aggregate.
    require(src.filter(col("__w0") < 0 || col("__w1") < 0 ||
        col("__w0").isNull || col("__w1").isNull).limit(1).count() == 0L,
      "endpoint weights must be non-negative")
    // only the w1 endpoint sum must be positive: step S's total is
    // S·Σw1 (the w0 coefficient is zero there), and every earlier
    // step's total ≥ s·Σw1 ≥ Σw1 — so Σw1 > 0 keeps ALL step totals
    // positive while a pure-w1 schedule (Σw0 = 0) stays legal
    require(src.agg(coalesce(sum(col("__w1")), lit(0L))).head().getLong(0) > 0L,
      "the w1 endpoint needs positive total weight (step S's total is S*sum(w1))")
    val w = Window.partitionBy(col("step"))
    val wr = w.orderBy(col("__rem").desc, col(srcCol).asc)
    src
      .withColumn("step", explode(sequence(lit(1), lit(steps))))
      .withColumn("w",
        col("__w0") * (lit(steps) - col("step")) + col("__w1") * col("step"))
      .withColumn("__tot", sum(col("w")).over(w))
      .withColumn("__base", expr(s"($budget * w) div __tot"))
      .withColumn("__rem", expr(s"($budget * w) % __tot"))
      .withColumn("__left", lit(budget) - sum(col("__base")).over(w))
      .withColumn("__rk", row_number().over(wr))
      .withColumn("quota",
        col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .select(col("step"), col(srcCol), col("w"), col("quota"))
  }

  // ---- deterministic stratified sampling ---------------------------------

  /** Up to `k` rows per stratum, chosen by md5 rank over a salted key —
    * deterministic across engines and runs (the md5 hex string orders
    * identically everywhere), so a sampled corpus is reproducible and
    * oracle-checkable. This is the language/source-balancing primitive
    * for training mixes.
    *
    * The `rk <= k` filter over `row_number` plans as `WindowGroupLimit`:
    * each map task keeps at most k rows per stratum before the shuffle,
    * so a 100 TB stratum moves only k × tasks rows, not its full volume.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String, k: Int, salt: String): DataFrame = {
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Contamination FILTER for unbounded/streaming corpora: drop any
    * document sharing a word n-gram with the benchmark set. The
    * benchmark's shingle hashes — small by definition — are collected
    * once and broadcast as a probe set; each document is then a pure
    * per-row membership test, so the same call works on a batch frame
    * and on a streaming one (no state, no watermark, no shuffle —
    * exactly how decontamination survives an unbounded feed).
    *
    * Uses the scalar twin of the engine-wide 60-bit md5 shingle hash,
    * so a document is dropped here iff [[decontaminate]] flags it
    * (spec'd batch-equal; the UDF probe is the per-row price of
    * statelessness — the batch form stays the codegen'd join).
    */
  def decontaminationFilter(
      docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val benchHashes = benchmark
      .select(explode(NearDup.shinglesCol(col(textCol), n)).as("s"))
      .select(NearDup.shingleHash60(col("s")).as("h"))
      .distinct().as[Long].collect().toSet
    val bc = spark.sparkContext.broadcast(benchHashes)
    val contaminated = udf((text: String) =>
      text != null &&
        NearDup.wordShingles(text, n)
          .exists(s => bc.value.contains(NearDup.shingleHash60(s))))
    docs.filter(!contaminated(col(textCol)))
  }

  // ---- token-budget corpus mixing ----------------------------------------

  /** Deterministic training-mix sampling: within each stratum (source/
    * language), walk documents in salted-md5 order and keep them while
    * the running token total stays within that stratum's budget — the
    * "mix 30% code, 60% web, 10% books by token count" primitive.
    * Strata without a budget contribute nothing. Reproducible across
    * engines and runs (same md5 order as [[stratifiedSample]]; the
    * running sum is exact integer arithmetic).
    *
    * Scale shape: one shuffle on the stratum, one sort per partition
    * for the running sum. The cut is by CUMULATIVE tokens, so unlike
    * `stratifiedSample` there is no map-side group limit — the window
    * must see the stratum in order; budget-sized strata keep this
    * bounded (the output is at most budget tokens per stratum, and the
    * sort is the same one the sample would need anyway).
    */
  def tokenBudgetMix(
      df: DataFrame, idCol: String, stratumCol: String, textCol: String,
      budgets: Map[String, Long], salt: String): DataFrame = {
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (stratum, b)) =>
        when(col(stratumCol) === stratum, lit(b)).otherwise(acc)
      }
    // membership check FIRST: without it a zero-token document in an
    // unbudgeted stratum would pass `cum_tokens (0) <= budget (0)`
    df.filter(col(stratumCol).isInCollection(budgets.keys.toSeq))
      .select(col(idCol), col(stratumCol),
        size(wordsCol(col(textCol))).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  // ---- sequence packing (concat-and-chop) --------------------------------

  /** GPT-style sequence packing offsets: documents are concatenated in
    * deterministic (salted-md5, id) order within each stratum and
    * chopped into fixed `seqLen`-token training sequences; each document
    * gets its global token span and the range of sequences it lands in
    * (a doc may straddle a boundary — the attention mask handles that
    * downstream, which is why concat-and-chop wastes no tokens).
    * Zero-token documents are dropped (they occupy no span).
    *
    * All arithmetic is exact integers (`div`, not double division — a
    * per-shard stream past 2^53 cumulative tokens would silently lose
    * boundary exactness in a double mantissa), so the assignment is
    * reproducible and oracle-checkable. One shuffle per stratum for the
    * running sum — the same per-shard packing shape production uses
    * (each shard packs its own stream; no global order exists at 100 TB
    * and none is needed).
    */
  def sequencePack(
      df: DataFrame, idCol: String, stratumCol: String, textCol: String,
      seqLen: Int, salt: String): DataFrame = {
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(stratumCol),
        size(wordsCol(col(textCol))).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("end_offset", sum(col("n_tokens")).over(w))
      .withColumn("start_offset", col("end_offset") - col("n_tokens"))
      .withColumn("first_seq", expr(s"start_offset div $seqLen"))
      .withColumn("last_seq", expr(s"(end_offset - 1) div $seqLen"))
  }

  // ---- sequence packing (boundary-preserving next-fit) -------------------

  /** Row shape entering the per-group packing fold. */
  case class PackIn(doc_id: Long, stratum: String, shard: Long, n_tokens: Long)

  /** [[packNextFit]] output: bin assignment within (stratum, shard). */
  case class PackOut(doc_id: Long, stratum: String, shard: Long,
      n_tokens: Long, bin_idx: Long, bin_offset: Long)

  /** Boundary-preserving next-fit sequence packing: the complement of
    * [[sequencePack]] for objectives that must NOT split a document
    * (contrastive pairs, instruction tuning). Documents are walked in
    * deterministic (salted-md5, id) order and appended to the current
    * `seqLen`-token bin while they fit; a doc that does not fit closes
    * the bin and opens the next (next-fit, the streaming-friendly bin
    * packing rule). A doc longer than `seqLen` occupies a bin alone —
    * the same oversized-isolation call the JSONL packer makes
    * (reference loops forever there; see Packer).
    *
    * The fold is inherently sequential, so scale comes from sharding,
    * not windows: docs are split into `nShards` sub-streams per stratum
    * (`doc_id % nShards` — numeric ids; mirrored literally in the
    * oracle), each (stratum, shard) group is hash-shuffled to one
    * partition, secondary-sorted, and packed in a single forward pass
    * (`sortWithinPartitions` + `mapPartitions` — the classic secondary
    * sort; no group ever needs to fit in memory, the fold carries three
    * longs of state). Bins are per-shard, which production packing
    * accepts anyway: no global order exists across a 100 TB corpus, and
    * next-fit quality is unaffected by sharding. Zero-token docs are
    * dropped (they occupy no span).
    */
  def packNextFit(
      df: DataFrame, idCol: String, stratumCol: String, textCol: String,
      seqLen: Int, nShards: Int, salt: String): DataFrame = {
    require(seqLen > 0 && nShards > 0, s"seqLen/nShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df
      .select(col(idCol).cast("long").as("doc_id"), col(stratumCol).as("stratum"),
        size(wordsCol(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("__k", md5(concat(lit(salt), col("doc_id").cast("string"))))
    toks
      .repartition(col("stratum"), col("shard"))
      .sortWithinPartitions(col("stratum"), col("shard"), col("__k"), col("doc_id"))
      .select($"doc_id", $"stratum", $"shard", $"n_tokens").as[PackIn]
      .mapPartitions { it =>
        // several (stratum, shard) groups share a partition; the fold
        // resets on every group-key change (rows arrive group-contiguous
        // by the secondary sort above)
        var key: (String, Long) = null
        var bin = 0L
        var fill = 0L
        it.map { r =>
          val k = (r.stratum, r.shard)
          if (k != key) { key = k; bin = 0L; fill = 0L }
          if (fill > 0 && fill + r.n_tokens > seqLen) { bin += 1; fill = 0L }
          val off = fill
          fill += r.n_tokens
          PackOut(r.doc_id, r.stratum, r.shard, r.n_tokens, bin, off)
        }
      }
      .toDF()
  }

  // ---- PPS systematic sampling -------------------------------------------

  /** Systematic sampling proportional to size (PPS): walk each
    * stratum's documents in deterministic salted-md5 order, lay their
    * token counts end to end, and select every document whose span
    * covers a sampling point (multiples of `step` tokens, from 0).
    * Inclusion probability ∝ min(1, tokens/step) — the weighted
    * sampling primitive for token-weighted corpus audits/evals, in
    * exact integer arithmetic (no `u^(1/w)` floats, so the DuckDB
    * oracle is bit-identical). A doc longer than `step` covers several
    * points but is selected once (`pick_point` = its first).
    *
    * Same shuffle shape as [[tokenBudgetMix]]: one window per stratum.
    */
  def ppsSample(
      df: DataFrame, idCol: String, stratumCol: String, textCol: String,
      step: Long, salt: String): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(stratumCol),
        size(wordsCol(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("end_offset", sum(col("n_tokens")).over(w))
      .withColumn("start_offset", col("end_offset") - col("n_tokens"))
      .withColumn("pick_point",
        expr(s"((start_offset + $step - 1) div $step) * $step"))
      .filter(col("pick_point") < col("end_offset"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006,
    * exponential-jumps form): every row draws a deterministic uniform
    * `u ∈ (0, 1]` from the salted 60-bit md5 of its id and scores
    * `key = −ln(u) / w`; the k smallest keys ARE a weighted
    * without-replacement sample — the classic one-pass scheme whose
    * selection is a BOTTOM-K SKETCH and therefore mergeable
    * (bottom-k of a union = bottom-k of concatenated bottom-k's, the
    * [[stratifiedSample]]/StreamSample argument — so the same operator
    * streams, and shards can sample independently then fold). Rows
    * with non-positive weight are excluded (they cannot be drawn).
    *
    * Cross-engine exactness: `u` is an integer-over-integer double and
    * the key one fixed `ln` + division nest per row — but libm `ln`
    * is NOT guaranteed correctly rounded, and a last-ulp disagreement
    * surfaced at sf0.1 (one key differing at 1e-20). The SELECTION
    * orders on the raw key (a boundary swap would need two keys within
    * one ulp at rank k — measure-zero on continuous keys); the EMITTED
    * key is rounded at 9 (the ndcg-gain precedent), putting the ulp
    * channel twelve orders below the emitted precision. Scale shape:
    * per-row math + ONE `TakeOrdered` — no shuffle carries more than
    * k rows.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h60 = NearDup.shingleHash60(
      concat(lit(salt), col(idCol).cast("string")))
    val u = (h60 + lit(1L)).cast("double") /
      lit(1152921504606846976.0) // 2^60: u in (0, 1], key = -ln(u)/w >= 0
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("es_key").asc, col(idCol).asc)
      .limit(k)
      .withColumn("es_key", round(col("es_key"), 9))
  }

  // ---- corpus length statistics ------------------------------------------

  /** Per-stratum token-count distribution summary (min/p50/p90/p99/max,
    * mean, docs) — the numbers that set curation thresholds (length
    * gates, chunk budgets). `percentile_cont` is the SQL-standard
    * linear interpolation over exact integer token counts, computed
    * identically by Spark and DuckDB; the mean goes through an exact
    * integer sum divided once.
    *
    * One map-side-combined aggregation per stratum; the percentile
    * aggregate sorts within each (small) group.
    */
  def lengthPercentiles(
      df: DataFrame, stratumCol: String, textCol: String): DataFrame =
    df.select(col(stratumCol), size(wordsCol(col(textCol))).as("n_tokens"))
      .groupBy(col(stratumCol))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY n_tokens)").as("p50_tokens"),
        expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY n_tokens)").as("p90_tokens"),
        expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY n_tokens)").as("p99_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("mean_tokens"))

  /** [[lengthPercentiles]] recomputed through the VALUE HISTOGRAM — the
    * 100 TB shape. `percentile_cont` buffers every group's values for a
    * per-group sort: a billion-document stratum sorts a billion rows in
    * one aggregation buffer. But token counts live on a bounded integer
    * domain (a length can't exceed the longest document — ~10⁶ distinct
    * values regardless of corpus size), so the exact distribution IS
    * the corpus-size-independent table `(stratum, length, count)` — a
    * map-side-combined groupBy whose shuffle moves at most
    * |strata|·|distinct lengths| rows. Quantiles come from cumulative
    * counts over that table (a window over the BOUNDED histogram, not
    * the corpus), interpolated with exactly `percentile_cont`'s
    * arithmetic — `(1-f)·lo + f·hi` at position `q·(N-1)`, the formula
    * DuckDB's `quantile_cont` evaluates float-for-float (the q111 gate
    * hash-compares raw doubles against it; the one both-covering-row
    * case folds to the same two products and one add).
    *
    * The histogram is also MERGEABLE (counts are associative integers),
    * which `percentile_cont` is not — [[graft.streaming.StreamLengthStats]]
    * maintains it incrementally and recovers bit-identical statistics
    * at any point in the stream.
    */
  def lengthPercentilesByHistogram(
      df: DataFrame, stratumCol: String, textCol: String): DataFrame =
    percentilesFromHistogram(lengthHistogram(df, stratumCol, textCol), stratumCol)

  /** Phase 1 (shared with the streaming twin): the exact token-length
    * distribution `(stratumCol, v, cnt)`.
    */
  private[graft] def lengthHistogram(
      df: DataFrame, stratumCol: String, textCol: String): DataFrame =
    df.select(col(stratumCol), size(wordsCol(col(textCol))).as("v"))
      .groupBy(col(stratumCol), col("v"))
      .agg(count(lit(1)).as("cnt"))

  /** Phase 2 (shared with the streaming twin): [[lengthPercentiles]]'s
    * exact output columns from a `(stratumCol, v, cnt)` histogram.
    * Accepts un-combined histograms (duplicate `(stratum, v)` rows from
    * a ledger fold) — counts re-combine in the first aggregation.
    */
  private[graft] def percentilesFromHistogram(
      histRaw: DataFrame, stratumCol: String): DataFrame = {
    val hist = histRaw.groupBy(col(stratumCol), col("v"))
      .agg(sum(col("cnt")).as("cnt"))
    val byV = Window.partitionBy(col(stratumCol)).orderBy(col("v"))
    val whole = Window.partitionBy(col(stratumCol))
    val cum = hist
      .withColumn("cumEnd", sum(col("cnt")).over(byV))
      .withColumn("cumStart", col("cumEnd") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(whole))
    // percentile_cont at q: position q·(N-1); the row(s) whose
    // cumulative range covers the floor/ceil positions contribute
    // (1-f)·lo and f·hi — summed, bit-identical to the two-product
    // one-add evaluation (zero terms preserve double bits).
    def pct(q: Double): Column = {
      val pos = lit(q) * (col("n") - lit(1)).cast("double")
      val idxLo = floor(pos)
      val idxHi = least(idxLo + lit(1.0), (col("n") - lit(1)).cast("double"))
      val frac = pos - idxLo
      val loPart = when(col("cumStart") <= idxLo && idxLo < col("cumEnd"),
        (lit(1.0) - frac) * col("v")).otherwise(lit(0.0))
      val hiPart = when(col("cumStart") <= idxHi && idxHi < col("cumEnd"),
        frac * col("v")).otherwise(lit(0.0))
      sum(loPart + hiPart)
    }
    cum.groupBy(col(stratumCol)).agg(
      max(col("n")).as("n_docs"),
      min(col("v")).as("min_tokens"),
      pct(0.5).as("p50_tokens"),
      pct(0.9).as("p90_tokens"),
      pct(0.99).as("p99_tokens"),
      max(col("v")).as("max_tokens"),
      (sum(col("v") * col("cnt")).cast("double") / max(col("n"))).as("mean_tokens"))
  }

  // ---- cross-document segment dedup (C4-style, keep first) ---------------

  /** C4-style cross-document span deduplication: each document is cut
    * into consecutive `segWords`-word segments (the last may be short),
    * and every segment that already occurred earlier in the corpus —
    * "earlier" meaning the globally smallest `(doc_id, seg_idx)` — is
    * dropped from later documents. Returns per-document segment counts
    * and the reconstructed text with only first-occurrence segments, the
    * repeated-span removal C4 applies at three-sentence granularity
    * (Raffel et al. 2020 §2.2; fixed word windows here because span
    * semantics, not sentence splitting, is the operator).
    *
    * Scale shape: segments reduce to the engine-wide 60-bit md5 hash and
    * the first occurrence per hash is `min(struct(doc_id, seg_idx))` — a
    * map-side-combinable aggregate, so a boilerplate segment repeated
    * 10^6 times still combines to one row per map task BEFORE the
    * shuffle. (A `row_number` window over the hash would sort each
    * hash's full multiplicity in one task — exactly the skew this
    * avoids.) Then one hash-join back and one groupBy per document for
    * the rebuild. Empty documents carry no segments and are dropped.
    */
  def segmentDedup(
      df: DataFrame, idCol: String, textCol: String, segWords: Int): DataFrame = {
    require(segWords > 0, s"segWords must be positive, got $segWords")
    val ws = col("__ws")
    // Guarded: sequence(0, -1) yields a DESCENDING [0, -1] array, so an
    // empty doc must short-circuit to an empty segment list instead.
    val nSegs = ceil(size(ws) / lit(segWords.toDouble)).cast("long")
    val segsExpr = when(size(ws) > 0,
        transform(sequence(lit(0L), nSegs - 1),
          i => concat_ws(" ", slice(ws, (i * segWords + 1).cast("int"), lit(segWords)))))
      .otherwise(array().cast("array<string>"))
    val segs = df
      .select(col(idCol), wordsCol(col(textCol)).as("__ws"))
      .select(col(idCol), posexplode(segsExpr).as(Seq("seg_idx", "seg")))
      .withColumn("__h", NearDup.shingleHash60(col("seg")))
    val firsts = segs
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol).as("fid"), col("seg_idx").as("fidx"))).as("__first"))
    segs.join(firsts, "__h")
      .withColumn("__keep",
        col(idCol) === col("__first.fid") && col("seg_idx") === col("__first.fidx"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segs"),
        (count(lit(1)) - sum(col("__keep").cast("long"))).as("n_dropped"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("__keep"), struct(col("seg_idx"), col("seg"))))),
            s => s.getField("seg"))).as("kept_text"))
  }

  // ---- winnowed-span cross-document dedup (shift-robust) ------------------

  /** Shift-robust cross-document span deduplication — the
    * arbitrary-offset upgrade of [[segmentDedup]]. Chunk boundaries are
    * CONTENT-DEFINED: a word position opens a new chunk when its
    * `shingleWords`-word shingle's md5 is the minimum over the centered
    * `2*winnowRadius+1`-shingle window (the winnowing local-minimum
    * selection of Schleimer/Wilkerson/Aiken SIGMOD'03, used here as the
    * local-extremum boundary rule of content-defined chunking, Manber
    * '94). Because a boundary depends only on the words around it,
    * inserting one word early in a document shifts every fixed window
    * [[segmentDedup]] hashes but leaves every boundary after the next
    * local minimum in place — a duplicated tail still cuts into
    * byte-identical chunks and dedups. First occurrence = globally
    * smallest `(doc_id, chunk_idx)`, exactly [[segmentDedup]]'s
    * convention.
    *
    * Scale shape: ONE shuffle on the doc id feeds both per-document
    * windows (local-min scan + boundary running count — both
    * PARTITIONED by doc, so a task holds at most one document's words,
    * never a corpus-shaped partition); chunk first-occurrence is the
    * same map-side-combinable `min(struct)` aggregate as
    * [[segmentDedup]] (a boilerplate chunk repeated 10^6 times combines
    * to one row per map task BEFORE the shuffle); then one equi-join
    * back on the chunk hash and one per-document rebuild. Empty
    * documents carry no words and are dropped, as in [[segmentDedup]].
    */
  def winnowedSpanDedup(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int, winnowRadius: Int): DataFrame = {
    val chunks = winnowedChunks(df, idCol, textCol, shingleWords, winnowRadius)
    val firsts = chunks
      .groupBy(col("__ch"))
      .agg(min(struct(col(idCol).as("fid"), col("cid").as("fidx"))).as("__first"))
    rebuildKept(chunks.join(firsts, "__ch")
      .withColumn("__keep",
        col(idCol) === col("__first.fid") && col("cid") === col("__first.fidx")),
      idCol)
  }

  /** [[winnowedSpanDedup]]'s chunking phase as a standalone relation:
    * content-defined chunks `(idCol, cid, chunk, __ch)` (per-doc
    * windows only — no cross-document dependency, which is what makes
    * the streaming twin possible). Shared with
    * [[graft.streaming.StreamSpanDedup]].
    */
  private[graft] def winnowedChunks(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int, winnowRadius: Int): DataFrame = {
    require(shingleWords > 0, s"shingleWords must be positive, got $shingleWords")
    require(winnowRadius > 0, s"winnowRadius must be positive, got $winnowRadius")
    val k = shingleWords
    val ws = col("__ws")
    // (word, shingle-hash) rows built array-side in ONE pass so the
    // word array itself is never duplicated across exploded rows; the
    // hash is null past the last full shingle (doc tail / short docs).
    val perWord = df
      .select(col(idCol), wordsCol(col(textCol)).as("__ws"))
      .where(size(ws) > 0)
      .select(col(idCol), posexplode(
          transform(sequence(lit(0), size(ws) - 1), j =>
            struct(
              element_at(ws, (j + 1).cast("int")).as("word"),
              when(j <= size(ws) - k,
                md5(concat_ws(" ", slice(ws, (j + 1).cast("int"), lit(k))))).as("h"))))
        .as(Seq("j", "__wh")))
      .select(col(idCol), col("j"),
        col("__wh.word").as("word"), col("__wh.h").as("__h"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("j"))
    // a document always opens at word 0; min() ignores the null tail
    // hashes, and an all-null frame (doc shorter than k) yields a null
    // __hmin so only the forced word-0 boundary fires
    val boundary = col("j") === 0 ||
      (col("__h").isNotNull && col("__h") === col("__hmin"))
    val chunked = perWord
      .withColumn("__hmin",
        min(col("__h")).over(byDoc.rowsBetween(-winnowRadius, winnowRadius)))
      .withColumn("cid",
        sum(boundary.cast("long")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    chunked
      .groupBy(col(idCol), col("cid"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("j"), col("word")))),
          s => s.getField("word"))).as("chunk"))
      .withColumn("__ch", md5(col("chunk")))
  }

  /** Per-doc rebuild over a flagged chunk relation (`__keep` column):
    * chunk/drop counts plus the kept text in chunk order. Shared by
    * [[winnowedSpanDedup]] and the streaming twin.
    */
  private[graft] def rebuildKept(flagged: DataFrame, idCol: String): DataFrame =
    flagged.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        (count(lit(1)) - sum(col("__keep").cast("long"))).as("n_dropped"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("__keep"), struct(col("cid"), col("chunk"))))),
            s => s.getField("chunk"))).as("kept_text"))

  // ---- exact duplicated-span removal (suffix-array-grade) -----------------

  /** EXACT duplicated-span removal at a fixed word threshold — the
    * guarantee [[winnowedSpanDedup]] approximates (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022 — the ExactSubstr component, there built on a corpus suffix
    * array): EVERY word span of length ≥ `minSpanWords` that occurs
    * more than once in the corpus is found and all but its first
    * occurrence removed. Winnowing only catches spans that share a
    * SELECTED fingerprint chunk — a duplicated span whose chunk
    * boundaries differ between the two copies (different surrounding
    * context → different local minima) slips through; this operator
    * cannot miss, because it hashes every position.
    *
    * The suffix-array property re-expressed relationally: a span of
    * length L ≥ T duplicated anywhere has ALL of its L−T+1 width-T
    * sub-shingles duplicated, and conversely a width-T shingle
    * occurring twice IS a duplicated span of length ≥ T. So (1) hash
    * the width-T shingle at every word position, (2) first occurrence
    * per hash = global `min(struct(doc_id, j))`, (3) a position is
    * REMOVED iff one of the ≤ T shingles covering it is a NON-first
    * occurrence of a duplicated hash, (4) rebuild each document from
    * its kept positions. First copies keep all their words; later
    * copies lose exactly the duplicated span (plus nothing else —
    * precision: every removed word sits inside an exactly-duplicated
    * width-T run). Documented divergence from the suffix-array
    * formulation: a SELF-overlapping periodic repeat ("x x x x x", T=2)
    * keeps only the first word, not the first full period — the
    * first-occurrence rule is per-shingle, not per-maximal-span.
    *
    * Scale shape: the shingle relation is one row per corpus word
    * (LINEAR — the price of exactness; the suffix array is the same
    * asymptotics). First-occurrence is the [[segmentDedup]]
    * map-side-combinable `min(struct)` (a boilerplate shingle repeated
    * 10^6 times combines to one row per map task before the shuffle);
    * the flag join is an equi-join on the hash (AQE skew-join for hot
    * boilerplate); coverage is a doc-partitioned running `max` window
    * (row frame of T−1 — a task holds one document's words); rebuild
    * is one per-document aggregate.
    */
  def exactSpanDedup(
      df: DataFrame, idCol: String, textCol: String, minSpanWords: Int): DataFrame = {
    require(minSpanWords > 1, s"minSpanWords must exceed 1, got $minSpanWords")
    val t = minSpanWords
    val ws = col("__ws")
    val perWord = df
      .select(col(idCol), wordsCol(col(textCol)).as("__ws"))
      .where(size(ws) > 0)
      .select(col(idCol), posexplode(
          transform(sequence(lit(0), size(ws) - 1), j =>
            struct(
              element_at(ws, (j + 1).cast("int")).as("word"),
              when(j <= size(ws) - t,
                md5(concat_ws(" ", slice(ws, (j + 1).cast("int"), lit(t))))).as("h"))))
        .as(Seq("j", "__wh")))
      .select(col(idCol), col("j"),
        col("__wh.word").as("word"), col("__wh.h").as("__h"))
    val firsts = perWord.where(col("__h").isNotNull)
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol).as("fid"), col("j").as("fj"))).as("__first"))
    // left join: tail positions (null hash) carry no shingle and can
    // only be removed by an earlier covering shingle
    val flagged = perWord.join(firsts, Seq("__h"), "left")
      .withColumn("__dup",
        (col("__h").isNotNull &&
          !(col(idCol) === col("__first.fid") && col("j") === col("__first.fj")))
          .cast("int"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("j"))
    val covered = flagged.withColumn("__rm",
      max(col("__dup")).over(byDoc.rowsBetween(-(t - 1), 0)))
    covered.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("__rm").cast("long")).as("n_dropped"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("__rm") === 0, struct(col("j"), col("word"))))),
            s => s.getField("word"))).as("kept_text"))
  }

  // ---- unigram surprisal scoring -----------------------------------------

  /** Per-document mean unigram surprisal in whole bits: each token
    * scores `floor-ish log2(total_tokens / count(token))` computed as
    * the BINARY DIGIT COUNT of the integer quotient — `length(bin(total
    * div cnt))` — so the signal is exact integer arithmetic end to end
    * and bit-identical across engines. This is the cross-engine-exact
    * surrogate for LM-perplexity filtering (CCNet/DCLM score documents
    * with a real LM; a libm `log` would hinge on ulp agreement between
    * engines, so the quantized form is the policy-compliant shape —
    * swap in a model UDF upstream for production scoring). High mean
    * bits = rare-word-heavy (or noisy) document; low = common-word
    * prose.
    *
    * Scale shape: tokens are first reduced to per-document term counts
    * (map-side combined, like [[tfidfTopK]]), so the frequency join
    * moves distinct (doc, term) pairs rather than every token; the
    * corpus total is a broadcast single row. The term join relies on
    * AQE for hot-term skew; the frequency table itself is 1 row per
    * distinct term.
    */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tf feeds the frequency aggregate AND the per-token join; freq
    // feeds the total AND the join — without the checkpoints each
    // consumer re-runs the corpus explode (the executed plan showed
    // THREE parquet scans; the q78 eager=false convention)
    val tf = df
      .select(col(idCol), explode(wordsCol(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val freq = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
      .localCheckpoint(eager = false)
    val total = freq.agg(sum(col("cnt")).as("total"))
    tf.join(freq, "term")
      .join(broadcast(total))
      .withColumn("__bits", length(bin(expr("total div cnt"))).cast("long"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("__bits")).as("sum_bits"),
        (sum(col("tf") * col("__bits")).cast("double") / sum(col("tf"))).as("mean_bits"))
  }

  /** Adjacent word pairs as (w1, w2) structs; empty below 2 words.
    * `zip_with` pads the shifted copy with nulls past its end, so the
    * final (last-word, null) pair is filtered off.
    */
  private def bigramPairsCol(ws: Column): Column =
    filter(
      zip_with(ws, slice(ws, lit(2), size(ws)),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)

  /** Per-document mean CONDITIONAL (bigram) surprisal in whole bits:
    * each adjacent pair (w1, w2) scores the binary digit count of
    * `prefix_count(w1) div bigram_count(w1, w2)` — an exact-integer
    * surrogate for −log2 P(w2 | w1), the next-token-predictability
    * signal a real LM perplexity filter (CCNet/DCLM-style) computes
    * with a trained model. Context counts are the bigram-PREFIX totals
    * (occurrences of w1 followed by anything), not raw unigram counts,
    * so the quotient is ≥ 1 and the estimate is a proper conditional
    * distribution over observed continuations. Everything up to the
    * final per-doc mean is integer arithmetic — bit-identical across
    * engines per the float policy. Documents with fewer than two
    * tokens contribute no bigrams and are absent from the output.
    *
    * Scale shape: tokens reduce to per-document bigram counts first
    * (map-side combined), so the frequency joins move distinct
    * (doc, w1, w2) triples rather than every token; the corpus bigram
    * and prefix tables are one row per distinct bigram / prefix. Hot
    * prefixes ("the", "of") are skewed join keys — AQE skew-join
    * handles them, same contract as [[unigramSurprisal]].
    */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tf2/c2 each have two consumers — checkpoint so the bigram
    // explode runs once (the unigramSurprisal rationale)
    val tf2 = df
      .select(col(idCol), explode(bigramPairsCol(wordsCol(col(textCol)))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val c2 = tf2.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("cnt2"))
      .localCheckpoint(eager = false)
    val c1 = c2.groupBy(col("w1")).agg(sum(col("cnt2")).as("cnt1"))
    tf2.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .withColumn("__bits", length(bin(expr("cnt1 div cnt2"))).cast("long"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("__bits")).as("sum_bits"),
        (sum(col("tf") * col("__bits")).cast("double") / sum(col("tf"))).as("mean_bits"))
  }

  // ---- TF-IDF keyword extraction -----------------------------------------

  /** Top-k characteristic terms per document by tf·idf with the linear
    * idf variant `idf = N / df` (scaled by 1e6): the score is a chain of
    * IEEE double multiplies and one divide in a fixed order, so ranking
    * and emitted values are bit-identical across engines — the `log`-idf
    * variant would hinge on libm ulp agreement. Computed in DOUBLE from
    * the start (not long): long `tf * N * 1e6` would silently wrap past
    * 2^63 at large corpus counts in Spark while DuckDB raises — double
    * degrades gracefully (rounds above 2^53, identically on both
    * engines). Ranking order is unchanged for any monotone idf when
    * comparing within a document against ties broken alphabetically.
    *
    * Shuffle structure: one groupBy for term frequencies, one for
    * document frequencies (both map-side combined), a broadcast of the
    * single-row corpus count, and a `WindowGroupLimit`-planned top-k.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // tf feeds the df aggregate AND the score join — checkpoint so
    // the corpus explode runs once. The n_docs scan stays separate on
    // purpose: it must count zero-word documents too, and it reads
    // only the pruned id column.
    val tf = docs
      .select(col(idCol), explode(wordsCol(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf
      .join(dfreq, "term")
      .join(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs") * lit(1000000.0) / col("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("score"), col("rk"))
  }

  // ---- hashed linear quality classifier ----------------------------------

  /** fastText-shaped document scorer: every token hashes into one of
    * `buckets` weight slots and the document's score is the mean slot
    * weight. The weight table here is DERIVED (integer centi-weights
    * from the bucket id — a deterministic, oracle-mirrorable stand-in
    * for trained parameters); the plan shape is the production one: a
    * BROADCAST join of the weight table against exploded tokens, one
    * map-side-combined aggregate per document. Swapping in real learned
    * weights changes the table, not the plan.
    *
    * Scoring is exact-integer until the single final division
    * (`raw_score` is a sum of ints in [-100, 100]), so the gate hashes
    * deterministic values; `keep` mirrors a calibrated threshold at 0.
    */
  def hashedLinearScore(
      df: DataFrame, idCol: String, textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    val weights = spark.range(buckets.toLong)
      .select(col("id").as("bucket"), (col("id") % 201 - 100).as("w"))
    val toks = df
      .select(col(idCol), explode(wordsCol(col(textCol))).as("__tok"))
      .select(col(idCol),
        (NearDup.shingleHash60(col("__tok")) % buckets).as("bucket"))
    toks.join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("raw_score"))
      // NO round(): raw_score and n_tokens are exact integers, so the
      // single IEEE division is bit-identical on any engine — while
      // round-at-6 is NOT (Spark rounds the exact binary value via
      // BigDecimal, DuckDB multiplies by 1e6 in floating point first;
      // they disagree by one ulp on boundary values — caught at sf0.1,
      // where one of 5000 docs landed on such a boundary)
      .withColumn("score",
        col("raw_score") / (col("n_tokens").cast("double") * 100.0))
      .withColumn("keep", col("score") >= 0)
  }

  // ---- temperature-weighted mixture sampling -----------------------------

  /** Multinomial temperature resampling of a stratified corpus (the
    * alpha=0.5 upsampling rule from multilingual pretraining): each
    * stratum's share of `totalBudget` tokens is proportional to
    * sqrt(stratum_tokens), then docs fill their stratum's target in
    * salted-md5 order (same greedy window as [[tokenBudgetMix]], with
    * the budget COMPUTED from the corpus instead of configured).
    *
    * Weights are integer-quantized — `floor(sqrt(tokens) * 1e6)` — so
    * the target arithmetic is exact long division, reproducible across
    * engines to the last token (a double Σweights would be
    * summation-order-dependent in the final ulp, and a target one token
    * off IS a different sample). IEEE sqrt is correctly rounded, so the
    * quantized weights themselves are engine-independent. Envelope:
    * totalBudget * Σw must stay under 2^63 — at 100 TB (Σw ≈ 1e12·1e6
    * over all strata) drop the quantization factor accordingly.
    *
    * Shuffles: one stratum aggregate (map-side combined), a broadcast
    * of the tiny per-stratum target table, one per-stratum window — the
    * same scale shape as tokenBudgetMix.
    */
  def temperatureMix(
      df: DataFrame, idCol: String, stratumCol: String, textCol: String,
      totalBudget: Long, salt: String): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    val toks = df.select(col(idCol), col(stratumCol),
        size(wordsCol(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val weighted = toks.groupBy(col(stratumCol))
      .agg(sum(col("n_tokens")).as("stratum_tokens"))
      .withColumn("w",
        floor(sqrt(col("stratum_tokens").cast("double")) * 1e6).cast("long"))
    val totalW = weighted.agg(sum(col("w")).as("tw"))
    val targets = weighted.crossJoin(broadcast(totalW))
      .withColumn("target_tokens", expr(s"($totalBudget * w) div tw"))
      .select(col(stratumCol), col("stratum_tokens"), col("target_tokens"))
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val win = Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.withColumn("cum_tokens", sum(col("n_tokens")).over(win))
      .join(broadcast(targets), Seq(stratumCol))
      .filter(col("cum_tokens") <= col("target_tokens"))
      .select(col(idCol), col(stratumCol), col("n_tokens"),
        col("cum_tokens"), col("target_tokens"))
  }

  // ---- epoch-repeat upsampling (data mixing with repetition) -------------

  /** UniMax-style epoch repetition: every stratum is replayed whole
    * `min(maxEpochs, max(1, budget div mass))` times, so small strata
    * get upsampled toward a per-stratum token budget while large ones
    * run once — the integer-epoch half of a mixing policy (the
    * fractional greedy fill is [[temperatureMix]]'s job).
    *
    * One map-side-combined mass aggregate (rows = strata), broadcast
    * back, then a NARROW `explode(sequence(...))` — no shuffle ever
    * carries more than the stratum table. `div` is exact integer
    * division on both engines (a double `floor(budget / mass)` could
    * round a knife-edge quotient differently).
    */
  def epochRepeat(
      df: DataFrame, idCol: String, stratumCol: String, weightCol: String,
      budgetPerStratum: Long, maxEpochs: Int): DataFrame = {
    require(budgetPerStratum > 0, s"budget must be positive: $budgetPerStratum")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    val mass = df.groupBy(col(stratumCol))
      .agg(sum(col(weightCol)).cast("long").as("__mass"))
      .withColumn("n_copies",
        least(lit(maxEpochs.toLong),
          greatest(lit(1L), expr(s"$budgetPerStratum div __mass"))).cast("int"))
    df.join(broadcast(mass.select(col(stratumCol), col("n_copies"))), Seq(stratumCol))
      .withColumn("epoch", explode(sequence(lit(1), col("n_copies"))))
      .select(col(idCol), col(stratumCol), col("epoch"), col("n_copies"))
  }

  // ---- canonical selection over near-dup clusters ------------------------

  /** The production step AFTER near-dup clustering: keep exactly one
    * document per cluster — the highest-quality member — instead of
    * q35's arbitrary min-id convention. Singletons (docs in no pair)
    * keep themselves.
    *
    * Quality is [[TextAnalysis.qualityScore]] (already rounded at 6, so
    * the ordering key is engine-stable) with a doc-id tiebreak. The
    * cluster labels come from [[graft.graph.ConnectedComponents]] — the
    * same min-label frame q35 gates. The label frame is one row per
    * CLUSTERED doc: on a duplicate-heavy web corpus (the workload
    * canonical dedup exists for) that is a constant fraction of the
    * corpus, NOT an always-small dimension — so the broadcast is
    * SIZE-CONDITIONAL: the label frame (already materialized by the
    * component solve, so the count is a cheap cached-RDD pass) gets the
    * hint only when it has at most `broadcastLabelLimit` rows; above
    * that the join ships unhinted and AQE picks shuffle-vs-broadcast
    * from measured sizes (a forced hint would bypass
    * `autoBroadcastJoinThreshold` and OOM at scale). The per-cluster
    * pick is one `row_number` window partitioned by cluster id.
    * Shuffles: the component computation itself, the label join when
    * the hint is withheld and AQE declines to broadcast, + one window
    * partitioned by cluster.
    */
  def canonicalDedup(
      df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, idACol: String, idBCol: String,
      broadcastLabelLimit: Long = 1L << 20): DataFrame = {
    // checkpointed BEFORE the size gate: the count action and the join
    // both read materialized blocks, so the component solve runs once
    // instead of once per consumer
    val labelFrame = graft.graph.ConnectedComponents
      .dedupClusters(pairs, idACol, idBCol)
      .select(col("doc_id").as(idCol), col("cluster_id"))
      .localCheckpoint(eager = false)
    val clusters =
      if (labelFrame.count() <= broadcastLabelLimit) broadcast(labelFrame)
      else labelFrame
    val words = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val scored = df.select(col(idCol), size(words).as("__nw"),
        when(size(words) > 0,
            size(array_distinct(words)).cast("double") / size(words))
          .otherwise(lit(0.0)).as("__dr"))
      .select(col(idCol),
        TextAnalysis.qualityScore(col("__nw"), col("__dr")).as("quality"))
    val win = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col(idCol))
    scored.join(clusters, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("keep", (row_number().over(win) === 1).cast("int"))
      .select(col(idCol), col("cluster_id"), col("quality"), col("keep"))
  }

  // ---- hashed n-gram importance weights (data selection) -----------------

  /** DSIR-style importance weights: score every corpus document by how
    * much its hashed n-gram distribution looks like a TARGET corpus
    * versus the raw corpus — the data-selection signal for steering a
    * pretraining mix toward a quality domain. Features are unigrams +
    * bigrams hashed into `buckets` slots; the weight is the summed
    * log-likelihood ratio under add-1-smoothed bucket distributions,
    *
    *   Σ_f ln( (ct_f + 1) · (R + B) / ((cr_f + 1) · (T + B)) )
    *
    * over every feature OCCURRENCE f in the doc (ct/cr = target/raw
    * bucket counts, T/R their totals, B = bucket count).
    *
    * Scale shape: two corpus-wide bucket aggregates (map-side combined,
    * at most `buckets` rows each), broadcast of the merged bucket table
    * + the 1-row totals into the per-doc scoring join, one final
    * aggregate per doc. No shuffle ever carries more than the exploded
    * feature stream, and that only once.
    *
    * Determinism: counts are exact integers; the single ln per distinct
    * (bucket) row is the q66 libm precedent, with the final per-doc sum
    * rounded at 6. Every corpus feature's bucket exists in the raw
    * counts by construction, so the stats join is inner with a
    * coalesced target side.
    */
  def importanceWeights(
      corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def feats(df: DataFrame) = {
      val ws = wordsCol(col(textCol))
      df.select(col(idCol), ws.as("__ws"))
        .select(col(idCol),
          explode(concat(col("__ws"), bigramsExpr(col("__ws")))).as("__f"))
        .select(col(idCol),
          (NearDup.shingleHash60(col("__f")) % buckets).as("bucket"))
    }
    // NOTE (r14, examined and left as-is): tCounts/rCounts each feed
    // the stats broadcast AND the totals aggregate, so the corpus/
    // target feature pass behind each runs twice — but the duplicate
    // passes run CONCURRENTLY (independent broadcast builds) on idle
    // cores, and materializing the bucket tables (eager or lazy
    // localCheckpoint) measured flat-to-worse across repeated local
    // A/B sessions: the serialization costs what the dedup saves
    // here. At cluster scale, where a redundant corpus pass is real
    // cost and cores are not idle, checkpoint both frames (they are
    // at most `buckets` rows) and accept the serialization.
    val tCounts = feats(target).groupBy(col("bucket"))
      .agg(count(lit(1)).as("ct"))
    val rCounts = feats(corpus).groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr"))
    val stats = rCounts.join(tCounts, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct"))
    // empty target degrades to uniform p_t = 1/B (coalesced 0 totals)
    val totals = tCounts.agg(coalesce(sum(col("ct")), lit(0L)).as("t_tot"))
      .crossJoin(rCounts.agg(coalesce(sum(col("cr")), lit(0L)).as("r_tot")))
      .select((col("t_tot") + buckets).cast("double").as("tb"),
        (col("r_tot") + buckets).cast("double").as("rb"))
    feats(corpus).join(broadcast(stats), "bucket")
      .join(broadcast(totals))
      // textually mirrored in the oracle
      .withColumn("__lr",
        log(((col("ct") + lit(1.0)) * col("rb")) / ((col("cr") + lit(1.0)) * col("tb"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("__lr")), 6).as("log_ratio"))
      .withColumn("avg_log_ratio", round(col("log_ratio") / col("n_feats"), 6))
      .withColumn("keep", col("log_ratio") >= 0)
  }

  /** FIM (fill-in-the-middle) span split for infilling-model data prep
    * (Bavarian et al., "Efficient Training of Language Models to Fill
    * in the Middle", 2022): a deterministic fraction of documents
    * (1 in `applyEvery` — the paper's default FIM rate is 0.5) is cut
    * at two pseudo-random character offsets into (prefix, middle,
    * suffix); the trainer then serializes PSM/SPM order with sentinel
    * tokens downstream. Unselected docs pass through whole.
    *
    * Everything derives from the 60-bit cross-engine md5 hash
    * ([[NearDup.shingleHash60]]) of salted ids — cut points are
    * `hash mod (len+1)`, selection is `hash mod applyEvery == 0` — so
    * the same corpus always yields the same splits on any engine or
    * cluster layout, and the transform is pure per-row column math
    * (zero shuffles, codegen'd, trivially 100 TB-safe).
    */
  def fimSplit(df: DataFrame, idCol: String, textCol: String,
      salt: String = "fim", applyEvery: Int = 2): DataFrame = {
    require(applyEvery >= 1, s"applyEvery must be positive, got $applyEvery")
    def h(tag: String) = NearDup.shingleHash60(
      concat_ws(":", lit(s"$salt-$tag"), col(idCol).cast("string")))
    val len = length(col(textCol))
    val a = pmod(h("a"), (len + 1).cast("long"))
    val b = pmod(h("b"), (len + 1).cast("long"))
    val lo = least(a, b).cast("int")
    val hi = greatest(a, b).cast("int")
    val applied = pmod(h("apply"), lit(applyEvery.toLong)) === 0
    df.select(
      col(idCol),
      when(applied, 1).otherwise(0).as("fim_applied"),
      when(applied, col(textCol).substr(lit(1), lo))
        .otherwise(col(textCol)).as("prefix"),
      when(applied, col(textCol).substr(lo + 1, hi - lo))
        .otherwise(lit("")).as("middle"),
      when(applied, col(textCol).substr(hi + 1, len - hi))
        .otherwise(lit("")).as("suffix"))
  }

  /** Leakage-safe train/valid/test split — assign by dedup CLUSTER,
    * not by doc: a doc-keyed hash split puts near-duplicate twins on
    * opposite sides of the boundary, and the eval set silently scores
    * memorization ([[splitLeakage]]/q147 AUDITS that failure after the
    * fact; this prevents it by construction — every member of a
    * cluster hashes the same key, so a near-dup pair can never
    * straddle splits). Docs in no pair are their own singleton
    * cluster. Buckets: 60-bit salted hash of the cluster id mod 100 —
    * `[0, trainPct)` train, `[trainPct, trainPct+validPct)` valid,
    * rest test; deterministic, reproducible, re-derivable.
    *
    * `clusters` is (id, cluster) from
    * [[graft.graph.ConnectedComponents.dedupClusters]] (pair members
    * only — absent docs default to themselves).
    *
    * Scale shape: ONE id-keyed left join (cluster table ≤ pair
    * members ≪ corpus; size-gated broadcast or honest sort-merge) +
    * per-row hash math. The expensive part — pairs and components —
    * is the upstream dedup work the pipeline already ran.
    */
  def clusterSafeSplit(docs: DataFrame, idCol: String,
      clusters: DataFrame, cIdCol: String, cClusterCol: String,
      salt: String, trainPct: Int, validPct: Int): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"bad split percentages: $trainPct/$validPct")
    val c = clusters.select(col(cIdCol).as("__cid"),
      col(cClusterCol).as("__cluster"))
    docs.join(c, col(idCol) === col("__cid"), "left")
      .withColumn("cluster_id", coalesce(col("__cluster"), col(idCol)))
      .withColumn("__b", NearDup.shingleHash60(concat_ws(":",
        lit(salt), col("cluster_id").cast("string"))) % 100)
      .withColumn("split",
        when(col("__b") < trainPct, "train")
          .when(col("__b") < trainPct + validPct, "valid")
          .otherwise("test"))
      .select(col(idCol), col("cluster_id"), col("split"))
  }

  /** Best-representative exact dedup — q81's keep rule upgraded from
    * "smallest id" to "highest quality", which is what production
    * curation actually keeps: normalized-key duplicates (casing,
    * punctuation, digit variants of one page) differ in their RAW
    * bytes, and the pipeline should keep the longest / best-scored
    * raw text, not whichever arrived first. Winner per key =
    * argmax(quality, then smallest id) — a total order, so the
    * survivor set is deterministic under any partitioning.
    *
    * Emits one row per input doc: `(id, quality, group_size, kept)`.
    *
    * Scale shape: keys are md5 digests (fixed-width shuffle, never
    * the text); ONE map-side-combinable groupBy (max_by struct +
    * count) and ONE keyed join back — no window over the corpus, no
    * quality sort anywhere.
    */
  def dedupKeepBest(df: DataFrame, idCol: String, textCol: String,
      qualityCol: String): DataFrame = {
    val keyed = keyedFor(df, idCol, textCol, qualityCol)
      // two consumers (the winner aggregate and the join back): one
      // materialization, or the text normalizes twice
      .localCheckpoint(eager = false)
    val winners = panelOfKeyed(keyed, idCol)
      .select(col("key"), col("win_id"), col("group_size"))
    keyed.join(winners, "key")
      .select(col(idCol), col("quality"), col("group_size"),
        (col(idCol).cast("long") === col("win_id")).cast("int").as("kept"))
  }

  private def keyedFor(df: DataFrame, idCol: String, textCol: String,
      qualityCol: String): DataFrame = {
    // the winner argmax negates the id for the smallest-id tiebreak,
    // so the id column MUST be numeric: a string id would cast to null
    // nid inside max(struct(...)) and silently crown a wrong/null
    // winner — fail loudly at plan time instead
    require(df.schema(idCol).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType],
      s"id column '$idCol' must be numeric (argmax tiebreak negates it); " +
        s"got ${df.schema(idCol).dataType.simpleString} — hash it to long first")
    df.select(col(idCol),
      md5(TextTokens.dedupKeyCol(col(textCol))).as("key"),
      col(qualityCol).cast("long").as("quality"))
  }

  /** The `(key, win_id, win_quality, group_size)` PANEL
    * [[dedupKeepBest]] derives its per-doc flags from — exposed
    * because the panel is the MERGEABLE form a streaming session
    * maintains: panels over disjoint batches merge by key (winners
    * re-argmax, sizes sum — argmax over a total order is associative
    * and commutative), so a live crawl keeps the survivor set current
    * without ever re-reading old text. State is keyed by the md5
    * dedup key — bounded by distinct content, not arrivals.
    */
  def keepBestPanel(df: DataFrame, idCol: String, textCol: String,
      qualityCol: String): DataFrame =
    panelOfKeyed(keyedFor(df, idCol, textCol, qualityCol), idCol)

  private def panelOfKeyed(keyed: DataFrame, idCol: String): DataFrame =
    keyed.groupBy(col("key"))
      .agg(max(struct(col("quality"),
          negate(col(idCol).cast("long")).as("nid"))).as("__mx"),
        count(lit(1)).as("group_size"))
      .select(col("key"),
        negate(col("__mx").getField("nid")).as("win_id"),
        col("__mx").getField("quality").as("win_quality"),
        col("group_size"))

  /** T5/UL2-style span corruption — [[fimSplit]]'s denoising sibling
    * (the objective that masks SPANS and asks the model to emit them
    * behind sentinel tokens): deterministic, cross-engine-exact span
    * placement so the corrupted corpus is reproducible and
    * oracle-checkable. Words partition into fixed blocks of
    * `blockWords`; block `b` of a doc draws a 60-bit salted hash and
    * masks the span starting at offset `h mod 17` with length
    * `1 + (h div 17) mod 3` (clipped by the block edge — only the
    * final partial block can miss its span entirely). Non-overlap is
    * by construction (span stays inside its block: 17 + 3 ≤ 20), the
    * sentinel index is the block index, and the noise density is
    * ~2/20 = 10% in expectation — the T5 neighborhood.
    *
    * Emits one row per doc WITH AT LEAST ONE WORD: `(id, n_words,
    * n_masked, n_spans, corrupted, targets)` where `corrupted` is the
    * text with each span replaced by its `<extra_id_b>` sentinel and
    * `targets` the span contents prefixed by their sentinels — the
    * standard encoder/decoder pair.
    *
    * Scale shape: one posexplode (word-bounded), per-row hash/CASE
    * math, ONE map-side-combinable groupBy assembling both strings
    * from sorted piece structs — no join, no window; the corpus
    * shuffles once, keyed by doc.
    */
  def spanCorruption(df: DataFrame, idCol: String, textCol: String,
      salt: String, blockWords: Int = 20): DataFrame = {
    require(blockWords >= 20, s"blockWords must be >= 20 (span offset+len reach 19): $blockWords")
    val wp = df.select(col(idCol),
        posexplode(TextTokens.wordsCol(col(textCol))).as(Seq("pos", "w")))
      .withColumn("block", expr(s"pos div $blockWords"))
      .withColumn("h", NearDup.shingleHash60(concat_ws(":",
        lit(salt), col(idCol).cast("string"), col("block").cast("string"))))
      .withColumn("o", col("h") % 17)
      .withColumn("ln", expr("1 + (h div 17) % 3"))
      .withColumn("off", col("pos") % blockWords)
      .withColumn("masked",
        (col("off") >= col("o") && col("off") < col("o") + col("ln")).cast("int"))
    val sentinel = concat(lit("<extra_id_"), col("block").cast("string"), lit(">"))
    val cpiece = when(col("masked") === 0, col("w"))
      .when(col("off") === col("o"), sentinel)
    val tpiece = when(col("off") === col("o"), concat(sentinel, lit(" "), col("w")))
      .when(col("masked") === 1, col("w"))
    def joined(piece: Column) = array_join(transform(
      array_sort(collect_list(when(piece.isNotNull,
        struct(col("pos"), piece.as("p"))))),
      x => x.getField("p")), " ")
    wp.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("masked")).as("n_masked"),
        count_distinct(when(col("masked") === 1, col("block"))).as("n_spans"),
        joined(cpiece).as("corrupted"),
        joined(tpiece).as("targets"))
  }

  /** Deterministic global training order + shard assignment: every row
    * gets a position in a seeded pseudo-random permutation of the whole
    * corpus (sort key = `md5(seed:id)` — new seed, new epoch order) and
    * a round-robin shard, so distributed training readers get (a) a
    * reproducible shuffle — re-running the job yields byte-identical
    * shards — and (b) shard sizes balanced within one row without
    * counting first. The position is a TWO-PHASE global rank
    * ([[zipfSlope]]'s pattern): range-partition on the key order, rank
    * within each partition (partitioned window — parallel), add
    * driver-computed per-partition offsets (one row per shuffle
    * partition) broadcast back. No stage holds the corpus in one task;
    * writers then `partitionBy(shard)` and sort by `shard_pos`.
    */
  def trainOrder(df: DataFrame, idCol: String, seed: String, shards: Int): DataFrame = {
    require(shards >= 1, s"shard count must be positive, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(idCol))
      .withColumn("__k", md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
    val parted = keyed
      .repartitionByRange(col("__k"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false) // size agg + rank must see same pids
    val sizes = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sizes.map { case (pid, n) => val off = acc; acc += n; (pid, off) }
    val offs = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val localWin = Window.partitionBy(col("__pid")).orderBy(col("__k"), col(idCol))
    parted
      .withColumn("__lr", row_number().over(localWin))
      .join(offs, "__pid")
      .withColumn("position", col("__lr") + col("__off"))
      .withColumn("shard", ((col("position") - 1) % shards).cast("int"))
      .withColumn("shard_pos", expr(s"(position - 1) DIV $shards"))
      .select(col(idCol), col("position"), col("shard"), col("shard_pos"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data",
    * LREC 2020): documents are ordered by LM score — here the
    * exact-integer unigram-surprisal surrogate ([[unigramSurprisal]];
    * a real LM plugs into the same shape — and split into
    * head / middle / tail at 1/3 and 2/3 of cumulative TOKEN mass, the
    * paper's per-language split. The head (most fluent third) is what
    * CCNet-descended pipelines keep or upweight.
    *
    * The corpus-wide cumulative token sum is TWO-PHASE, never a
    * single-partition `Window.orderBy` ([[zipfSlope]]'s pattern):
    * range-partition on the score order, cumsum within each partition
    * (partitioned window — parallel), then add per-partition token-mass
    * offsets computed on the driver (one row per shuffle partition —
    * control-plane sized) and broadcast back. Boundaries compare in
    * exact integer arithmetic (`3·cum ≤ total`), so bucket labels are
    * bit-identical across engines. The partition assignment is pinned
    * with `localCheckpoint` because the size aggregate and the cumsum
    * window must see the SAME pids.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val scored = unigramSurprisal(df, idCol, textCol)
    val parted = scored
      .repartitionByRange(col("mean_bits").asc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val sizes = parted.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sizes.map { case (pid, t) => val off = acc; acc += t; (pid, off) }
    val total = acc
    val offs = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val localWin = Window.partitionBy(col("__pid"))
      .orderBy(col("mean_bits").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .withColumn("__lc", sum(col("n_tokens")).over(localWin))
      .join(offs, "__pid")
      .withColumn("cum_tokens", col("__lc") + col("__off"))
      .withColumn("bucket",
        when(col("cum_tokens") * 3 <= lit(total), "head")
          .when(col("cum_tokens") * 3 <= lit(total) * 2, "middle")
          .otherwise("tail"))
      .select(col(idCol), col("n_tokens"), col("mean_bits"),
        col("cum_tokens"), col("bucket"))
  }

  // ---- corpus frequency-spectrum statistics ------------------------------

  /** Zipf fit over the corpus vocabulary: regress ln(frequency) on
    * ln(rank) and report the slope/intercept (a well-curated natural
    * corpus slopes near -1; deviations flag synthetic or boilerplate
    * text). The regression uses the explicit moment formula — both
    * engines build the SAME four sums from the SAME per-row libm values,
    * so the rounded result agrees (a builtin `regr_slope` is free to
    * use a different update scheme per engine).
    *
    * Ranking is a TWO-PHASE global rank over the VOCABULARY (not the
    * corpus): range-partition on the rank order, `row_number` within
    * each partition (a PARTITIONED window — every partition ranks in
    * parallel), then add per-partition row-count offsets computed on
    * the driver (one row per shuffle partition — control-plane sized)
    * and broadcast back. Equivalent to the single-partition
    * `Window.orderBy` reduction but with no stage that holds the whole
    * vocabulary in one task — at web-corpus vocab sizes (10⁹ types)
    * that single task is otherwise the job's bottleneck. The partition
    * assignment is pinned with `localCheckpoint` because two downstream
    * consumers (the size aggregate and the ranking window) must see the
    * SAME pids — `repartitionByRange` samples its bounds, so a
    * recompute could move rows across partitions between the two
    * passes. Rank values are independent of where the range bounds
    * fall, since (c desc, term) is a total order.
    */
  def zipfSlope(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(explode(wordsCol(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val parted = counts
      .repartitionByRange(col("c").desc, col("term"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val sizes = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sizes.map { case (pid, n) => val off = acc; acc += n; (pid, off) }
    val offs = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val localWin = Window.partitionBy(col("__pid"))
      .orderBy(col("c").desc, col("term"))
    val ranked = parted
      .withColumn("__lr", row_number().over(localWin))
      .join(offs, "__pid")
      .withColumn("rk", col("__lr") + col("__off"))
      .withColumn("x", log(col("rk").cast("double")))
      .withColumn("y", log(col("c").cast("double")))
    ranked.agg(
        count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("n", col("n_types").cast("double"))
      .select(col("n_types"), col("n_tokens"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"),
        round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("n"), 6)
          .as("zipf_intercept"))
  }

  /** Heaps'-law fit: regress ln V(N) on ln N over the corpus's
    * vocabulary-growth curve — V(N) = distinct word types within the
    * first N tokens of the canonical corpus order (doc_id asc, token
    * position asc), sampled at every document boundary. A natural
    * corpus fits V ≈ K·N^β with β ≈ 0.4–0.6; a flat curve (tiny β)
    * flags template/boilerplate corpora, β near 1 flags id-like junk
    * tokens — the vocabulary-growth twin of [[zipfSlope]]'s frequency
    * spectrum.
    *
    * Construction, all shuffle-honest:
    *  1. doc offsets = two-phase cumsum of per-doc token counts in
    *     doc-id order (the [[perplexityBuckets]] pattern);
    *  2. each word's FIRST global token index = map-side-combined
    *     `min(offset + pos)`;
    *  3. V at each boundary = two-phase cumsum of first-occurrence
    *     events merged with boundary events on the global index (a
    *     first AT the boundary index counts — `is_first` sorts before
    *     the boundary at equal index);
    *  4. regression moments per point are rounded to nano fixed-point
    *     longs BEFORE the cross-row sum (the JSD/PCA discipline), so
    *     the fit is partition-order exact; β and K = e^intercept round
    *     at 6.
    */
  def heapsLaw(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("__id"), wordsCol(col(textCol)).as("__ws"))
      .select(col("__id"), col("__ws"), size(col("__ws")).cast("long").as("__n"))
      .filter(col("__n") > 0)
    // phase 1: doc offsets (cum tokens BEFORE each doc) in doc-id order
    val parted = toks.repartitionByRange(col("__id").asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val sizes = parted.groupBy(col("__pid"))
      .agg(sum(col("__n")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sizes.map { case (pid, t) => val off = acc; acc += t; (pid, off) }
    val nTokens = acc
    val offs = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val docWin = Window.partitionBy(col("__pid")).orderBy(col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val docs = parted
      .withColumn("__lc", sum(col("__n")).over(docWin))
      .join(offs, "__pid")
      .withColumn("__start", col("__lc") + col("__off") - col("__n"))
      .select(col("__id"), col("__ws"), col("__n"), col("__start"))
      .localCheckpoint(eager = false)
    // phase 2: first global index per word; boundary events per doc
    val firsts = docs
      .select(col("__start"), posexplode(col("__ws")).as(Seq("__p", "__w")))
      .groupBy(col("__w"))
      .agg(min(col("__start") + col("__p") + 1).as("idx"))
      .select(col("idx"), lit(1L).as("is_first"))
    val bounds = docs.select((col("__start") + col("__n")).as("idx"),
      lit(0L).as("is_first"))
    val events = firsts.unionByName(bounds)
    // phase 3: two-phase cumsum of firsts over the merged index order
    val eParted = events.repartitionByRange(col("idx").asc, col("is_first").desc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val eSizes = eParted.groupBy(col("__pid"))
      .agg(sum(col("is_first")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var eAcc = 0L
    val eOffsets = eSizes.map { case (pid, t) => val off = eAcc; eAcc += t; (pid, off) }
    val nTypes = eAcc
    val eOffs = broadcast(eOffsets.toSeq.toDF("__pid", "__eoff"))
    val eWin = Window.partitionBy(col("__pid"))
      .orderBy(col("idx").asc, col("is_first").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val points = eParted
      .withColumn("__lc", sum(col("is_first")).over(eWin))
      .join(eOffs, "__pid")
      .filter(col("is_first") === 0L)
      .select(col("idx").as("nd"), (col("__lc") + col("__eoff")).as("vd"))
    // phase 4: fixed-point regression moments
    val x = log(col("nd").cast("double"))
    val y = log(col("vd").cast("double"))
    def fp(c: Column): Column = round(c * lit(1000000000.0)).cast("long")
    val sums = points.agg(
      count(lit(1)).as("n_points"),
      sum(fp(x)).as("fsx"), sum(fp(y)).as("fsy"),
      sum(fp(x * y)).as("fsxy"), sum(fp(x * x)).as("fsxx"))
    val n = col("n_points").cast("double")
    val (sx, sy) = (col("fsx").cast("double") / lit(1000000000.0),
      col("fsy").cast("double") / lit(1000000000.0))
    val (sxy, sxx) = (col("fsxy").cast("double") / lit(1000000000.0),
      col("fsxx").cast("double") / lit(1000000000.0))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    sums.select(col("n_points"),
        lit(nTokens).as("n_tokens"), lit(nTypes).as("n_types"),
        round(slope, 6).as("heaps_beta"),
        round(exp((sy - slope * sx) / n), 6).as("heaps_k"))
  }

  // ---- dataset assembly: leakage-safe splits and snapshot diffs ----------

  /** Leakage-safe train/validation/test split: every row of a GROUP
    * (eTLD+1 domain, source feed, author — whatever unit shares content
    * that must not straddle an evaluation boundary) lands in the SAME
    * split, decided by a salted 60-bit md5 hash of the group key alone
    * (the [[NearDup.shingleHash60]] uniform both engines compute
    * identically). Hash-of-group (vs hash-of-row) is what makes the
    * split leakage-safe AND ingest-stable: new rows of a known group
    * join their group's split, and re-running over a grown corpus never
    * migrates an existing group.
    *
    * Split thresholds are exact integers — group is `train` iff
    * `h60 < ⌊2⁶⁰·trainPct/100⌋`, `val` iff below the train+val bound —
    * so no float boundary can disagree across engines.
    *
    * Scale: the decision runs on the DISTINCT group table (web-scale
    * eTLD+1 count ~10⁷ — control-plane sized next to the corpus) and is
    * broadcast back; the corpus itself never shuffles. A group table
    * past broadcast range downgrades gracefully to a shuffled equi-join
    * on the group key.
    */
  def groupedSplit(df: DataFrame, idCol: String, groupCol: String,
      seed: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"percentages out of range: train=$trainPct val=$valPct")
    val trainLo = ((BigInt(1) << 60) * trainPct / 100).toLong
    val valLo = ((BigInt(1) << 60) * (trainPct + valPct) / 100).toLong
    val groups = df.select(col(groupCol).as("__g")).distinct()
      .withColumn("__h",
        NearDup.shingleHash60(concat_ws(":", lit(seed), col("__g").cast("string"))))
      .withColumn("split",
        when(col("__h") < trainLo, "train")
          .when(col("__h") < valLo, "val")
          .otherwise("test"))
      .select(col("__g"), col("split"))
    df.join(broadcast(groups), df(groupCol) === col("__g"))
      .drop("__g")
  }

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998): `shard(doc) = argmax_s hash(salt:s:doc)` — the
    * STABLE sharding a growing corpus wants: adding shard n+1 moves
    * only the ~1/(n+1) of documents whose new weight wins, and every
    * moved document moves TO the new shard (spec-pinned); a mod-N
    * rehash would move (n-1)/n of the corpus and invalidate every
    * co-located index/cache next to it.
    *
    * Scale shape: pure per-row math — the candidate weights are a
    * `transform` over a literal shard sequence and the argmax is an
    * `array_max` over (weight, shard) structs, so the plan is a
    * codegen'd map over the scan: no explode, no shuffle, no join.
    * Weights are the engine-exact 60-bit md5 ([[NearDup.shingleHash60]])
    * mirrored into the oracle.
    */
  def rendezvousShards(df: DataFrame, idCol: String, numShards: Int,
      salt: String): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val cand = transform(sequence(lit(0), lit(numShards - 1)), s =>
      struct(
        NearDup.shingleHash60(concat_ws(":",
          lit(salt), s.cast("string"), col(idCol).cast("string"))).as("w"),
        s.as("s")))
    df.withColumn("shard", array_max(cand).getField("s"))
  }

  /** Train/eval contamination audit over a grouped split (the q91 ∘
    * dedup-key composition a release gate runs): assign splits with
    * [[groupedSplit]], key every document by a content fingerprint
    * (`keyCol` — exact md5, a normalized dedup key, or a prefix
    * fingerprint for the shared-opening near-dup channel), and report
    * each key that appears in MORE THAN ONE split — the leakage an
    * eval number silently inherits when duplicated content straddles
    * the train/val/test boundary (grouped splitting prevents
    * WITHIN-group leakage by construction; this measures the
    * cross-group duplicate channel it cannot).
    *
    * Emits one row per leaked key: `(h, n_train, n_val, n_test,
    * n_docs)`. Scale shape: broadcast split table (distinct groups ≪
    * corpus), ONE map-side-combined conditional-sum groupBy over the
    * key, leaked filter on the counts — text never shuffles.
    */
  def splitLeakage(df: DataFrame, idCol: String, groupCol: String,
      keyCol: Column, seed: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    splitLeakageFromCounts(
      splitKeyCounts(df, idCol, groupCol, keyCol, seed, trainPct, valPct))

  /** [[splitLeakage]]'s sufficient statistic — per-key per-split doc
    * counts `(h, n_train, n_val, n_test, n_docs)`. ADDITIVE: split
    * assignment is a pure hash of (seed, group), so every batch
    * assigns its own rows identically and count frames from disjoint
    * batches merge by sum — the [[graft.streaming.StreamPmi]] seam
    * argument, which is what lets a streaming session maintain the
    * audit without re-reading the corpus.
    */
  def splitKeyCounts(df: DataFrame, idCol: String, groupCol: String,
      keyCol: Column, seed: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    groupedSplit(df, idCol, groupCol, seed, trainPct, valPct)
      .select(keyCol.as("h"), col("split"))
      .groupBy(col("h"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
        count(lit(1)).as("n_docs"))

  /** The leaked-key filter over (possibly merged) [[splitKeyCounts]]
    * frames: every key present in more than one split.
    */
  def splitLeakageFromCounts(counts: DataFrame): DataFrame =
    counts.filter(
      (when(col("n_train") > 0, 1).otherwise(0) +
        when(col("n_val") > 0, 1).otherwise(0) +
        when(col("n_test") > 0, 1).otherwise(0)) > 1)

  /** Domain-suffix blocklist filter (the Dolma/CCNet URL-filtering
    * step): a document's host is blocked iff the host itself or ANY of
    * its parent-domain suffixes is a blocklist entry — `a.b.c.d`
    * checks `a.b.c.d`, `b.c.d`, `c.d`, `d`. Emits every document with
    * `(blocked, rule)` — rule = the lexicographically-least matching
    * entry, null when clean.
    *
    * Scale shape: the host explodes into its ≤ label-count suffixes
    * (a constant ~5 fan-out, nothing like a pattern scan) and probes
    * the blocklist through a BROADCAST equi-join — N patterns cost
    * one hash lookup, not N regex passes; a million-entry production
    * blocklist stays a broadcast table. Per-doc verdict is a
    * map-side-combined min/groupBy, and the final left join keys on
    * the id only.
    */
  def domainBlocklist(df: DataFrame, idCol: String, hostCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist")
    val spark = df.sparkSession
    import spark.implicits._
    val rules = blocklist.map(_.toLowerCase).distinct.toDF("rule")
    val parts = split(lower(col(hostCol)), "\\.")
    val sufs = transform(sequence(lit(1), size(parts)), i =>
      array_join(slice(parts, i, size(parts) - i + 1), "."))
    val hits = df
      .select(col(idCol), explode(sufs).as("suf"))
      .join(broadcast(rules), col("suf") === col("rule"))
      .groupBy(col(idCol))
      .agg(min(col("rule")).as("rule"))
    df.select(col(idCol), col(hostCol))
      .join(hits, Seq(idCol), "left")
      .withColumn("blocked", when(col("rule").isNotNull, 1).otherwise(0))
  }

  /** Per-domain cap retention (the FineWeb/RefinedWeb "domain budget"
    * step): keep at most `k` documents per group (eTLD+1 domain, source
    * feed), picking the best by a quality column with a deterministic
    * id tiebreak — the guard against a single boilerplate-heavy domain
    * flooding a crawl-derived corpus after dedup.
    *
    * Shape: `row_number` behind `(group)` partitioning with a TOTAL
    * order (`quality desc, id asc` — ties can't flip rows across
    * engines), filtered to `rk <= k`. Spark compiles the rank filter to
    * `WindowGroupLimit`: every map task pre-truncates its partition's
    * groups to the top-k BEFORE the shuffle, so the exchange moves
    * O(groups·k) rows, not the corpus — the same partial-limit shape at
    * 100 TB. A pathologically hot domain is exactly what the cap
    * removes, so skew self-heals at the map side.
    */
  def domainCapRetention(df: DataFrame, idCol: String, groupCol: String,
      qualityCol: String, k: Int): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    df.withColumn("rk",
        row_number().over(Window.partitionBy(col(groupCol))
          .orderBy(col(qualityCol).desc, col(idCol).asc)))
      .filter(col("rk") <= k)
  }

  /** Corpus snapshot diff: classify every document id across two corpus
    * versions as `added` / `removed` / `changed` / `unchanged` by
    * content hash — the audit table an incremental curation run starts
    * from (what must be re-chunked, re-embedded, re-deduped) and the
    * natural MERGE input for the ledger seams. One full-outer equi-join
    * on the id; text never crosses the shuffle — both sides reduce to
    * `(id, md5)` at the scan, so the join moves two hash columns (at
    * 100 TB the honest sort-merge shape, or a co-located join when both
    * snapshots share a bucketing layout).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__id"), md5(col(textCol)).as("old_hash"))
    val n = newDf.select(col(idCol).as("__id"), md5(col(textCol)).as("new_hash"))
    o.join(n, Seq("__id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed"))
      .select(col("__id").as(idCol), col("old_hash"), col("new_hash"), col("status"))
  }

  /** Interpolated Kneser-Ney smoothed bigram language model, trained
    * corpus-wide (Kneser & Ney 1995; the KenLM formulation at order 2
    * with one fixed discount) — the LM component CCNet-style
    * perplexity filtering deploys, here as its trained TABLE: one row
    * per bigram type with count ≥ `minCount`, carrying the raw count
    * `n`, the context mass `ctx` = c(w1·), the fan-out
    * `n1f` = N1+(w1·), the continuation count `n1b` = N1+(·w2), the
    * corpus bigram-type total `b_types`, and the smoothed probability
    *
    *   P(w2|w1) = (n − D)⁺/ctx + D·n1f/ctx · n1b/b_types,  D = 3/4.
    *
    * Float discipline: with D = 3/4 every term is a ratio of exact
    * integers — p is computed as
    * `(4n−3)⁺/(4·ctx) + 3·n1f·n1b/(4·ctx)/b_types`, three IEEE
    * divisions and one add in a fixed order, so the DuckDB mirror is
    * bit-identical and there is NO float accumulation anywhere (the
    * reason this gate emits the LM rather than per-doc log scores:
    * a log-prob sum would order-depend; whole-bit doc surprisal
    * already exists as q56).
    *
    * Scale shape: one explode + one map-side-combined groupBy on the
    * bigram (the q56 shuffle), then context/continuation tables are
    * VOCABULARY-sized — broadcast back onto the bigram table, and the
    * type total rides a broadcast single-row frame. Nothing shuffles
    * twice.
    */
  def knBigramLm(df: DataFrame, textCol: String, minCount: Int = 5): DataFrame =
    knLmFromCounts(
      // three consumers; lazy — materializes inside the first
      // consumer's job (the final action's broadcast builds)
      bigramCounts(df, textCol).localCheckpoint(eager = false),
      minCount)

  /** The mergeable SUFFICIENT STATISTIC of [[knBigramLm]]: corpus-wide
    * `(w1, w2, n)` bigram counts. Counts are additive, so two corpora's
    * tables merge by `groupBy(w1, w2).sum(n)` — the property the
    * incremental LM session ([[graft.streaming.StreamKnLm]]) is built
    * on.
    */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ws = wordsCol(col(textCol))
    df.select(explode(bigramStructsExpr(ws)).as("bg"))
      .select($"bg.w1".as("w1"), $"bg.w2".as("w2"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
  }

  /** Derive the smoothed LM from a `(w1, w2, n)` count table — every
    * context/continuation statistic is a function of the counts, so
    * the derivation is the same whether the counts came from one batch
    * pass or an incremental merge.
    */
  def knLmFromCounts(big: DataFrame, minCount: Int): DataFrame = {
    val spark = big.sparkSession
    import spark.implicits._
    val ctx = big.groupBy($"w1")
      .agg(sum($"n").as("ctx"), count(lit(1)).as("n1f"))
    val cont = big.groupBy($"w2").agg(count(lit(1)).as("n1b"))
    val btotal = big.agg(count(lit(1)).as("b_types"))
    big
      .join(broadcast(ctx), Seq("w1"))
      .join(broadcast(cont), Seq("w2"))
      .crossJoin(broadcast(btotal))
      .filter($"n" >= minCount)
      .select($"w1", $"w2", $"n", $"ctx", $"n1f", $"n1b", $"b_types",
        (greatest(lit(4L) * $"n" - 3L, lit(0L)).cast("double") /
          (lit(4L) * $"ctx").cast("double") +
          (lit(3L) * $"n1f" * $"n1b").cast("double") /
            (lit(4L) * $"ctx").cast("double") / $"b_types".cast("double"))
          .as("p_kn"))
  }

  /** PMI collocation mining (Church & Hanks 1990) — the phrase table a
    * tokenizer-vocabulary or quality pipeline extracts from a corpus:
    * the top-`k` bigrams by pointwise mutual information among those
    * with count ≥ `minCount`, with the LOG DROPPED — PMI is reported
    * as the exact ratio `p(w1,w2)/(p(w1)p(w2))` = `n12·Nu²/(n1·n2·Nb)`
    * (log is monotone, so the ranking is identical, and no
    * cross-engine `ln` rounding enters the gate). The ratio is
    * evaluated as ONE fixed left-associative IEEE chain over exact
    * integer counts — bit-identical in the DuckDB mirror — because the
    * integer numerator `n12·Nu²` would overflow int64 at web scale.
    *
    * Scale shape: [[bigramCounts]]' single shuffle + a vocabulary-
    * bounded unigram table joined twice (broadcast — the [[knBigramLm]]
    * precedent: per-WORD tables broadcast, per-bigram ones never), two
    * single-row totals, and a `TakeOrdered` top-k. Counts are additive
    * sufficient statistics — the same mergeable shape the incremental
    * KN session maintains, so a live PMI panel derives from ledgers of
    * `(w1,w2,n)` + `(w,nu)` by the identical arithmetic.
    */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Int = 5, k: Int = 30): DataFrame =
    pmiFromCounts(bigramCounts(df, textCol), unigramCounts(df, textCol),
      minCount, k)

  /** The other additive sufficient statistic PMI needs beside
    * [[bigramCounts]]: corpus-wide `(w, nu)` occurrence counts — one
    * map-side-combined groupBy, mergeable by `groupBy(w).sum(nu)`.
    */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(wordsCol(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("nu"))
  }

  /** Derive the PMI table from `(w1, w2, n)` bigram + `(w, nu)` unigram
    * count tables — the derivation is count-only, so it is the same
    * whether the counts came from one batch pass or an incremental
    * ledger merge (the [[knLmFromCounts]] property; the streaming twin
    * [[graft.streaming.StreamPmi]] is built on exactly this seam).
    */
  def pmiFromCounts(big: DataFrame, uni: DataFrame,
      minCount: Int, k: Int): DataFrame = {
    val spark = big.sparkSession
    import spark.implicits._
    // materialize each count table once: `uni` feeds TWO broadcast
    // builds plus the n_u total and `big` the n_b total plus the main
    // join side — left lazy, each consumer re-runs the corpus
    // explode+groupBy behind it (r14 profile: 3 concurrent corpus-pass
    // jobs per q126 invocation). EAGER, the r13 rule: lazy blocks race
    // when the first consumers are concurrent broadcast builds. Both
    // frames are count tables (vocabulary/bigram-type-sized), not
    // corpus-sized.
    val bigC = big.localCheckpoint()
    val uniC = uni.localCheckpoint()
    val nb = bigC.agg(sum($"n").as("n_b"))
    val nu = uniC.agg(sum($"nu").as("n_u"))
    bigC.filter($"n" >= minCount)
      .join(broadcast(uniC.select($"w".as("w1"), $"nu".as("n1"))), Seq("w1"))
      .join(broadcast(uniC.select($"w".as("w2"), $"nu".as("n2"))), Seq("w2"))
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      .select($"w1", $"w2", $"n".as("n12"), $"n1", $"n2",
        ($"n".cast("double") * $"n_u".cast("double") / $"n1".cast("double")
          / $"n2".cast("double") * $"n_u".cast("double") / $"n_b".cast("double"))
          .as("pmi_ratio"))
      .orderBy($"pmi_ratio".desc, $"w1".asc, $"w2".asc)
      .limit(k)
  }

  /** Content-defined segmentation at word granularity (the CDC idea —
    * LBFS/Muthitacharoen et al. 2001, FastCDC lineage — applied to
    * text): a chunk boundary falls AFTER word `i` whenever the 60-bit
    * hash of the `window`-word span ending at `i` is ≡ 0 mod
    * `mask + 1`, so boundaries are decided by LOCAL CONTENT, not
    * offsets — inserting a word early in a document re-chunks only up
    * to the next surviving boundary (shift-robust, expected chunk
    * length `mask + 1` words), where a fixed-width segmenter
    * ([[segmentDedup]]'s `segWords` grid) re-chunks everything after
    * the edit. Emits one row per chunk with its width and md5 — the
    * block table a storage-style dedup or an incremental re-crawl
    * differ joins on. Uses the engine-wide shingle hash
    * ([[NearDup.shingleHash60]]) so the oracle reproduces boundaries
    * bit-for-bit.
    *
    * Scale shape: pure per-row HOF math (sequence/filter/transform
    * over the word array — no explode until the final per-chunk
    * emission, no shuffle at all); documents with no words emit no
    * rows. The last word never hosts a boundary (the trailing
    * remainder always merges into the final chunk).
    */
  def cdcSegments(df: DataFrame, idCol: String, textCol: String,
      window: Int = 3, mask: Int = 7): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(mask > 0 && ((mask & (mask + 1)) == 0),
      s"mask must be 2^k - 1, got $mask")
    val ws = col("__ws")
    val n = size(ws)
    // 1-based boundary positions p (chunk break after word p): the
    // sequence() guard is the segmentDedup empty-doc lesson — a
    // descending sequence(window, n-1) on short docs must short-circuit
    val bpos = when(n >= window + 1,
      filter(sequence(lit(window), n - 1), p =>
        NearDup.shingleHash60(
          array_join(slice(ws, p - lit(window) + 1, lit(window)), " "))
          % lit(mask + 1) === 0))
      .otherwise(array().cast("array<int>"))
    // chunk bounds: 0 ++ boundaries ++ n — chunk j spans words
    // (b[j]+1 .. b[j+1]) in 1-based positions. MATERIALIZED as a
    // column before the per-chunk transform: inlined, the boundary
    // scan's window hashes would re-evaluate per element_at reference
    // (~3 × chunks times per doc — measured 5.5 s → the fix puts q131
    // at fractions of a second at sf0.1); CollapseProject keeps
    // multiply-referenced non-cheap aliases materialized.
    val bounds = col("__bounds")
    val chunks = transform(sequence(lit(0), size(bounds) - 2), j =>
      struct(
        j.cast("long").as("chunk_idx"),
        (element_at(bounds, j + 2) - element_at(bounds, j + 1)).cast("long")
          .as("n_words"),
        md5(array_join(
          slice(ws, element_at(bounds, j + 1) + 1,
            element_at(bounds, j + 2) - element_at(bounds, j + 1)), " "))
          .as("chunk_md5")))
    df.select(col(idCol), wordsCol(col(textCol)).as("__ws"))
      .filter(n > 0)
      .withColumn("__bounds", concat(array(lit(0)), bpos, array(n)))
      .select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol), col("c.chunk_idx").as("chunk_idx"),
        col("c.n_words").as("n_words"), col("c.chunk_md5").as("chunk_md5"))
  }

  /** Block-level dedup audit over [[cdcSegments]]' content-defined
    * chunks — the "what would a block store save" table: a chunk is a
    * DUPLICATE iff an identical chunk (same md5) exists earlier in the
    * corpus order (first occurrence by `(doc_id, chunk_idx)` keeps —
    * the [[exactSpanDedup]] min-struct discipline, applied per block
    * instead of per span). Per document: chunk count, duplicated-chunk
    * count, and the duplicated word mass — the dedup-ratio panel a
    * storage layer or a re-crawl differ reads, and because the blocks
    * are content-defined it keeps attributing duplicates correctly
    * when boilerplate shifts position between documents.
    *
    * Scale shape: one map-side-combined `min(struct)` groupBy over
    * the chunk table (rows = distinct blocks), one shuffled equi-join
    * back on the md5 (the honest shape — the block table is
    * corpus-sized), one per-doc rollup.
    */
  def cdcDedupStats(df: DataFrame, idCol: String, textCol: String,
      window: Int = 3, mask: Int = 7): DataFrame = {
    val chunks = cdcSegments(df, idCol, textCol, window, mask)
    val firsts = chunks.groupBy(col("chunk_md5"))
      .agg(min(struct(col(idCol), col("chunk_idx"))).as("__first"))
      .select(col("chunk_md5"),
        col("__first").getField(idCol).as("__fid"),
        col("__first").getField("chunk_idx").as("__fidx"))
    chunks.join(firsts, Seq("chunk_md5"))
      .withColumn("__dup",
        col(idCol) =!= col("__fid") || col("chunk_idx") =!= col("__fidx"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__dup"), lit(1L)).otherwise(lit(0L))).as("n_dup_chunks"),
        sum(when(col("__dup"), col("n_words")).otherwise(lit(0L))).as("dup_words"))
  }

  /** Block-level snapshot diff — the incremental-cost estimator
    * [[snapshotDiff]] can't give: for every document in the NEW
    * snapshot, how many of its content-defined blocks already existed
    * in the OLD version of the SAME document (reusable: their chunk
    * embeddings / index entries / dedup verdicts carry over) versus
    * how many are fresh work. Because boundaries are content-defined
    * ([[cdcSegments]]), an edit near the top of a document leaves the
    * downstream blocks' hashes INTACT — a fixed-width grid would
    * invalidate everything after the edit, overstating the re-process
    * bill by orders of magnitude on append-mostly corpora.
    *
    * Scale shape: two chunk passes (per-row HOF math), one equi-join
    * on `(doc_id, chunk_md5)` — both sides hash-only projections, text
    * never crosses the shuffle (the [[snapshotDiff]] discipline) — and
    * a per-doc rollup. Unchanged docs report 100% reuse; added docs
    * report zero.
    */
  def cdcBlockDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String,
      window: Int = 3, mask: Int = 7): DataFrame = {
    val oldBlocks = cdcSegments(oldDf, idCol, textCol, window, mask)
      .select(col(idCol), col("chunk_md5")).distinct()
      .withColumn("__old", lit(1))
    cdcSegments(newDf, idCol, textCol, window, mask)
      .join(oldBlocks, Seq(idCol, "chunk_md5"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("__old").isNotNull, lit(1L)).otherwise(lit(0L)))
          .as("n_reused"),
        sum(when(col("__old").isNull, col("n_words")).otherwise(lit(0L)))
          .as("fresh_words"))
  }

  /** Vocabulary coverage / OOV-rate audit: build the corpus top-`vocabSize`
    * word vocabulary (count desc, word asc — deterministic at the rank
    * boundary) and report, per document, how many of its tokens fall
    * outside it — the tokenizer-fit signal a curation pipeline watches
    * when deciding whether a vocabulary (or the corpus mix feeding it)
    * needs retraining, and a quality gate in its own right (high OOV
    * mass ⇒ mojibake, code-switching, or boilerplate the tokenizer
    * will shred into bytes).
    *
    * Scale shape: ONE corpus-sized shuffle to the `(doc, word)` count
    * relation; the vocabulary is derived from its (much smaller)
    * distinct-word rollup as a `TakeOrdered` top-V and BROADCAST back
    * — the corpus never joins vocabulary-sized state through a
    * shuffle. Docs with no tokens surface with zero counts (left
    * join), `oov_frac` guarded to 0.0.
    */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val spark = df.sparkSession
    import spark.implicits._
    val docWord = df
      .select(col(idCol), explode(wordsCol(col(textCol))).as("w"))
      .groupBy(col(idCol), $"w").agg(count(lit(1)).as("k"))
    val vocab = docWord.groupBy($"w").agg(sum($"k").as("n"))
      .orderBy($"n".desc, $"w".asc).limit(vocabSize)
      .select($"w", lit(1).as("__in_vocab"))
    val perDoc = docWord
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(sum($"k").as("n_tokens"),
        sum(when($"__in_vocab".isNull, $"k").otherwise(lit(0L))).as("n_oov"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "n_oov"))
      .withColumn("oov_frac", when($"n_tokens" > 0,
        $"n_oov".cast("double") / $"n_tokens").otherwise(lit(0.0)))
  }

  /** Pairwise Jensen-Shannon divergence between per-group unigram
    * distributions — the corpus-similarity matrix (Lin 1991; the
    * "how far apart are these sources/languages/snapshots" panel a
    * mixing policy consults before setting weights). For every group
    * pair (a < b in `groupValues` order),
    *
    *   JSD(P‖Q) = ½·Σ_w p·log2(p/m) + ½·Σ_w q·log2(q/m),  m = (p+q)/2
    *
    * Cross-engine exactness: each word's pair term is a fixed IEEE
    * nest over exact integer counts, ROUNDED TO FIXED POINT (micro
    * units, round-half-away) BEFORE summation — the PCA-moments
    * discipline — so the cross-row sum is exact long arithmetic and
    * partition-order-invariant; the reported `jsd` is the fixed-point
    * sum divided back once. A group absent from the data (zero total)
    * yields 0.0 against every partner (the corpusDrift zero-guard
    * lesson), never NaN.
    *
    * Scale shape: one corpus explode → (word, group) counts →
    * vocabulary-wide conditional-sum rollup (rows = vocab, columns =
    * |G| longs); totals are a broadcast single row; ALL pair sums come
    * out of ONE aggregate over that rollup. |G|²/2 columns — meant for
    * the handful-of-groups regime (languages, sources, snapshots), not
    * thousands.
    */
  def jsDivergenceByGroup(df: DataFrame, groupCol: String, textCol: String,
      groupValues: Seq[String]): DataFrame =
    jsDivergenceFromCounts(groupedUnigramCounts(df, groupCol, textCol),
      groupValues)

  /** The additive sufficient statistic of the JSD matrix (and any
    * other distribution-comparison panel): per-group word occurrence
    * counts `(w, g, n)` — mergeable by `groupBy(w, g).sum(n)`, the
    * seam the streaming twin [[graft.streaming.StreamJsd]] folds on.
    */
  def groupedUnigramCounts(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("g"),
        explode(wordsCol(col(textCol))).as("w"))
      .groupBy($"w", $"g").agg(count(lit(1)).as("n"))
  }

  /** Derive the JSD matrix from a `(w, g, n)` count frame — count-only
    * ([[pmiFromCounts]] discipline), so ledger-merged deltas yield the
    * batch table exactly, fixed-point sums included.
    */
  def jsDivergenceFromCounts(counts: DataFrame,
      groupValues: Seq[String]): DataFrame = {
    require(groupValues.nonEmpty && groupValues.distinct == groupValues,
      s"groupValues must be non-empty and distinct: $groupValues")
    val spark = counts.sparkSession
    import spark.implicits._
    val gs = groupValues.sorted
    val wideAggs = gs.map(g =>
      sum(when($"g" === g, $"n").otherwise(lit(0L))).as(s"n_$g"))
    val wide = counts.groupBy($"w").agg(wideAggs.head, wideAggs.tail: _*)
    val totAggs = gs.map(g => sum(col(s"n_$g")).as(s"t_$g"))
    val totals = wide.agg(totAggs.head, totAggs.tail: _*)
    val pairs = for {
      i <- gs.indices; j <- (i + 1) until gs.size
    } yield (gs(i), gs(j))
    def fpTerm(a: String, b: String): Column = {
      val (na, nb) = (col(s"n_$a"), col(s"n_$b"))
      val (ta, tb) = (col(s"t_$a"), col(s"t_$b"))
      val p = na.cast("double") / ta.cast("double")
      val q = nb.cast("double") / tb.cast("double")
      val m = (p + q) / lit(2.0)
      val half = lit(0.5)
      val term =
        when(na > 0, half * p * log2(p / m)).otherwise(lit(0.0)) +
          when(nb > 0, half * q * log2(q / m)).otherwise(lit(0.0))
      round(when(ta > 0 && tb > 0, term).otherwise(lit(0.0)) * lit(1000000.0))
        .cast("long")
    }
    val sumAggs = pairs.map { case (a, b) =>
      coalesce(sum(fpTerm(a, b)), lit(0L)).as(s"s_${a}_$b")
    }
    val sums = wide.crossJoin(broadcast(totals))
      .agg(sumAggs.head, sumAggs.tail: _*)
    val rows = array(pairs.map { case (a, b) =>
      struct(lit(a).as("g_a"), lit(b).as("g_b"),
        (col(s"s_${a}_$b").cast("double") / lit(1000000.0)).as("jsd"))
    }: _*)
    sums.select(explode(rows).as("r"))
      .select($"r.g_a".as("g_a"), $"r.g_b".as("g_b"), $"r.jsd".as("jsd"))
  }

  /** Corpus drift audit (the "what changed between two crawls" table):
    * per-word chi-square contributions of corpus A vs corpus B against
    * the pooled expectation — the top-`k` most divergent words with
    * their raw counts, the statistician's replacement for eyeballing
    * frequency lists. Every row's statistic is an INDEPENDENT fixed
    * nest of IEEE ops over exact integer counts (no accumulation — the
    * gate never sums floats across rows), so the table is cross-engine
    * exact; words below `minTotal` pooled occurrences are excluded
    * (chi-square is meaningless at tiny expectations).
    *
    * Scale shape: ONE conditional-sum groupBy over the union (each
    * word row carries both halves' counts — no join between the
    * corpora), two single-row totals broadcast, per-row math,
    * `TakeOrdered` top-k.
    */
  def corpusDrift(a: DataFrame, b: DataFrame, textCol: String,
      minTotal: Long = 10, k: Int = 30): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val words = a.select(explode(wordsCol(col(textCol))).as("w"), lit(1L).as("in_a"))
      .unionByName(
        b.select(explode(wordsCol(col(textCol))).as("w"), lit(0L).as("in_a")))
    val counts = words.groupBy($"w")
      .agg(sum($"in_a").as("na"), sum(lit(1L) - $"in_a").as("nb"))
    corpusDriftFromCounts(counts, minTotal, k)
  }

  /** Derive the drift table from an already-merged `(w, na, nb)` count
    * frame — the count-only seam of [[corpusDrift]] ([[pmiFromCounts]]
    * discipline): per-side word counts are ADDITIVE, so a frame merged
    * from per-batch deltas yields the exact batch table, doubles
    * included (same integer inputs, same fixed op nest). The streaming
    * twin [[graft.streaming.StreamDrift]] maintains the new-crawl side
    * incrementally against a fixed reference side on this seam.
    */
  def corpusDriftFromCounts(counts: DataFrame, minTotal: Long,
      k: Int): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val totals = counts.agg(sum($"na").as("ta"), sum($"nb").as("tb"))
    val ea = ($"na" + $"nb").cast("double") * $"ta".cast("double") /
      ($"ta" + $"tb").cast("double")
    val eb = ($"na" + $"nb").cast("double") * $"tb".cast("double") /
      ($"ta" + $"tb").cast("double")
    val ca = ($"na".cast("double") - ea) * ($"na".cast("double") - ea) / ea
    val cb = ($"nb".cast("double") - eb) * ($"nb".cast("double") - eb) / eb
    counts.filter($"na" + $"nb" >= minTotal)
      .crossJoin(broadcast(totals))
      // an empty half would put 0 in a denominator (the corpusOverlapKmv
      // zero-guard lesson): no drift is measurable against nothing
      .select($"w", $"na", $"nb",
        when($"ta" > 0 && $"tb" > 0, ca + cb).otherwise(lit(0.0)).as("chi2"))
      .orderBy($"chi2".desc, $"w".asc)
      .limit(k)
  }

  /** Interpolated Kneser-Ney TRIGRAM language model (the order KenLM
    * ships for CCNet-style filtering), trained corpus-wide with the
    * [[knBigramLm]] exactness discipline — D = 3/4 keeps every term a
    * ratio of exact integers, so the recursion
    *
    *   P(w3|w1w2) = (c₁₂₃−D)⁺/c₁₂· + D·N1+(w₁w₂·)/c₁₂· · Pc(w3|w2)
    *   Pc(w3|w2)  = (N1+(·w₂w₃)−D)⁺/N1+(·w₂·)
    *                + D·M(w₂)/N1+(·w₂·) · Pc(w3)
    *   Pc(w3)     = N1+(·w₃)/B
    *
    * (continuation counts at every lower order — the Kneser-Ney point:
    * a word's backoff weight is how many CONTEXTS it completes, not
    * how often it occurs) evaluates as a fixed nest of IEEE ops over
    * integer inputs, bit-identical in the DuckDB mirror. One row per
    * trigram type with count ≥ `minCount`, carrying every component
    * count and the smoothed probability.
    *
    * Scale shape: one explode + one map-side-combined groupBy on the
    * trigram (the corpus-sized shuffle). The derived tables split in
    * two classes: per-WORD tables (`mid`, `cont`, `btotal`) are
    * vocabulary-bounded and always broadcast; per-BIGRAM-TYPE tables
    * (`ctx3` keyed (w1,w2), `cont23` keyed (w2,w3)) are vocab²-bounded
    * — billions of rows on a web-scale corpus — so their joins are
    * SIZE-CONDITIONAL (the canonicalDedup `broadcastLabelLimit`
    * discipline): hinted only under `broadcastTypeLimit` rows,
    * otherwise shipped unhinted so AQE picks shuffle-vs-broadcast from
    * measured sizes. Above the limit both joins shuffle on a prefix /
    * suffix of the (w1,w2,w3) key the trigram frame already hashed on.
    */
  def knTrigramLm(df: DataFrame, textCol: String, minCount: Int = 5,
      broadcastTypeLimit: Long = 1L << 20): DataFrame =
    knTrigramLmFromCounts(
      trigramCounts(df, textCol),
      // bigram-level continuation — the q103 tables, rebuilt here so
      // the two LMs stay independent
      bigramCounts(df, textCol),
      minCount, broadcastTypeLimit)

  /** The mergeable SUFFICIENT STATISTIC of the trigram order:
    * corpus-wide `(w1, w2, w3, n)` counts — additive like
    * [[bigramCounts]], the property the incremental trigram session
    * ([[graft.streaming.StreamKnLm.KnTrigramLmSession]]) is built on.
    */
  def trigramCounts(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ws = wordsCol(col(textCol))
    df.select(explode(trigramStructsExpr(ws)).as("tg"))
      .select($"tg.w1".as("w1"), $"tg.w2".as("w2"), $"tg.w3".as("w3"))
      .groupBy($"w1", $"w2", $"w3").agg(count(lit(1)).as("n"))
  }

  /** Derive the smoothed trigram LM from its two count tables —
    * `tri0 (w1, w2, w3, n)` and `big0 (w1, w2, n)` — the
    * [[knLmFromCounts]] discipline one order up: every KN statistic is
    * a function of the counts, so one batch pass and an incremental
    * merge derive the IDENTICAL model (spec-pinned in
    * `StreamKnLmSpec`).
    */
  def knTrigramLmFromCounts(tri0: DataFrame, big0: DataFrame,
      minCount: Int, broadcastTypeLimit: Long = 1L << 20): DataFrame = {
    val spark = tri0.sparkSession
    import spark.implicits._
    // Checkpoint discipline re-measured r13: tri/cont23/big stay EAGER
    // — each is forced to materialize early anyway (size-gate counts,
    // broadcast builds), and lazy variants measured flat-to-slower
    // (lazy tri pushed the whole explode+groupBy into the first gate
    // count, ~0.4 s worse; lazy big makes two concurrent broadcast
    // builds race on the same uncomputed blocks).
    val tri = tri0.localCheckpoint() // five aggregate consumers below
    val ctx3 = tri.groupBy($"w1", $"w2")
      .agg(sum($"n").as("ctx3"), count(lit(1)).as("f3"))
      .localCheckpoint(eager = false) // counted by the size gate below
    // trigram-level continuation: distinct w1 preceding (w2, w3)
    val cont23 = tri.groupBy($"w2", $"w3").agg(count(lit(1)).as("c23"))
      .localCheckpoint() // consumed as a join side AND re-aggregated
    val mid = cont23.groupBy($"w2")
      .agg(sum($"c23").as("nctx2"), count(lit(1)).as("m2"))
    // the bigram-TYPE statistics (continuation counts, type total) are
    // functions of the bigram count table's KEYS only
    val big = big0.select($"w1".as("bw1"), $"w2".as("bw2"), $"n".as("bn"))
      .localCheckpoint()
    val cont = big.groupBy($"bw2").agg(count(lit(1)).as("n1b"))
      .withColumnRenamed("bw2", "w3")
    val btotal = big.agg(count(lit(1)).as("b_types"))
    // bigram-TYPE-keyed sides: broadcast only when provably small (the
    // frames are checkpointed, so the count is a cheap cached pass)
    def gated(t: DataFrame): DataFrame =
      if (t.count() <= broadcastTypeLimit) broadcast(t) else t
    tri
      .join(gated(ctx3), Seq("w1", "w2"))
      .join(gated(cont23), Seq("w2", "w3"))
      .join(broadcast(mid), Seq("w2"))
      .join(broadcast(cont), Seq("w3"))
      .crossJoin(broadcast(btotal))
      .filter($"n" >= minCount)
      .select($"w1", $"w2", $"w3", $"n", $"ctx3", $"f3", $"c23", $"nctx2",
        $"m2", $"n1b", $"b_types",
        {
          val p0 = $"n1b".cast("double") / $"b_types".cast("double")
          val inner =
            greatest(lit(4L) * $"c23" - 3L, lit(0L)).cast("double") /
              (lit(4L) * $"nctx2").cast("double") +
              (lit(3L) * $"m2").cast("double") /
                (lit(4L) * $"nctx2").cast("double") * p0
          (greatest(lit(4L) * $"n" - 3L, lit(0L)).cast("double") /
            (lit(4L) * $"ctx3").cast("double") +
            (lit(3L) * $"f3").cast("double") /
              (lit(4L) * $"ctx3").cast("double") * inner)
            .as("p_kn3")
        })
  }

  /** The [[knBigramLm]] model APPLIED as a document filter — the
    * CCNet deployment step, kept integer-exact: for every document,
    * the bigram total, how many of its bigram tokens are UNSEEN in the
    * (min-count-thresholded) LM, and how many carry a smoothed
    * probability below `pThreshold`. All three are integer COUNTS (a
    * per-row float comparison feeds a counter; nothing float ever
    * accumulates), plus the unrounded rare-fraction ratio — so the
    * gate stays hash-stable while still exercising the trained
    * probabilities. `keep` flags documents whose rare+unseen fraction
    * stays under `maxRareFrac` (documents the LM finds predictable —
    * the low-perplexity bucket CCNet keeps).
    *
    * Scale shape: docs explode to bigram tokens once; the LM probe
    * table is keyed (w1, w2) — bigram-TYPE-bounded (vocab², NOT
    * vocabulary-bounded), so the probe join is SIZE-CONDITIONAL:
    * broadcast-hinted only when the thresholded LM is provably under
    * `broadcastLmLimit` rows, otherwise a plain shuffled join AQE can
    * still promote from measured sizes. Map-side-combined counts, one
    * shuffle by doc id either way.
    */
  def knDocFilter(df: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, pThreshold: Double, maxRareFrac: Double,
      broadcastLmLimit: Long = 1L << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ws = wordsCol(col(textCol))
    val toks = df
      .select(col(idCol), explode(bigramStructsExpr(ws)).as("bg"))
      .select(col(idCol), $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    // checkpoint BEFORE the size gate so the count action and the join
    // read materialized blocks instead of re-deriving the LM twice
    val probe = lm.select($"w1", $"w2", $"p_kn").localCheckpoint(eager = false)
    val gatedProbe =
      if (probe.count() <= broadcastLmLimit) broadcast(probe) else probe
    toks
      .join(gatedProbe, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when($"p_kn".isNull, 1L).otherwise(0L)).as("n_unseen"),
        sum(when($"p_kn".isNotNull && $"p_kn" < pThreshold, 1L).otherwise(0L))
          .as("n_rare"))
      .withColumn("rare_frac",
        ($"n_unseen" + $"n_rare").cast("double") / $"n_bigrams".cast("double"))
      .withColumn("keep", ($"rare_frac" <= maxRareFrac).cast("int"))
  }

  /** [[knDocFilter]] at the TRIGRAM order — the filter a deployment
    * that trains [[knTrigramLm]] (the order KenLM ships) actually
    * applies, same integer-counter discipline: per document, the
    * trigram-token total, how many are UNSEEN in the thresholded
    * trigram LM, how many carry `p_kn3 < pThreshold`, the unrounded
    * rare fraction, and the keep flag. Trigram models are far sparser
    * than bigram ones, so deployments calibrate `maxRareFrac` higher
    * (unseen-trigram mass is normal even on clean text).
    *
    * Scale shape: docs explode to trigram tokens once; the LM probe is
    * trigram-TYPE-keyed (vocab³-bounded — NEVER force-broadcast), so
    * the probe join is size-conditional exactly like the parent's; one
    * shuffle by doc id for the counters.
    */
  def knDocFilter3(df: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, pThreshold: Double, maxRareFrac: Double,
      broadcastLmLimit: Long = 1L << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ws = wordsCol(col(textCol))
    val toks = df
      .select(col(idCol), explode(trigramStructsExpr(ws)).as("tg"))
      .select(col(idCol), $"tg.w1".as("w1"), $"tg.w2".as("w2"),
        $"tg.w3".as("w3"))
    val probe = lm.select($"w1", $"w2", $"w3", $"p_kn3")
      .localCheckpoint(eager = false)
    val gatedProbe =
      if (probe.count() <= broadcastLmLimit) broadcast(probe) else probe
    toks
      .join(gatedProbe, Seq("w1", "w2", "w3"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when($"p_kn3".isNull, 1L).otherwise(0L)).as("n_unseen"),
        sum(when($"p_kn3".isNotNull && $"p_kn3" < pThreshold, 1L).otherwise(0L))
          .as("n_rare"))
      .withColumn("rare_frac",
        ($"n_unseen" + $"n_rare").cast("double") / $"n_trigrams".cast("double"))
      .withColumn("keep", ($"rare_frac" <= maxRareFrac).cast("int"))
  }

  /** KMV (k-minimum-values) sketch comparison of two corpora's shingle
    * sets — the dataset-PAIR overlap diagnostic (which crawl snapshots
    * or published dumps duplicate each other, and how much) that
    * doc-level dedup (q11/q17) and doc-level containment (q80/q85)
    * can't give without materializing the cross-corpus intersection.
    * Bottom-k / theta-sketch estimation (Beyer et al. SIGMOD 2007;
    * Broder 1997's fixed-size MinHash): keep the k smallest DISTINCT
    * 60-bit shingle hashes of A∪B with per-corpus membership bits,
    * then inside that uniform sample
    *
    *  - `est_jaccard`     = n_both / sketch_size,
    *  - `est_contain_a`   = n_both / n_a  (≈ |A∩B| / |A|),
    *  - `est_contain_b`   = n_both / n_b,
    *  - `est_union`       = (k−1)·2⁶⁰ / kth_min  (exact count when the
    *    union is smaller than k — the sketch IS the union then).
    *
    * Every statistic is exact-integer until one (or two, for
    * est_union) IEEE double ops in a fixed order, so the DuckDB oracle
    * is bit-identical. Scale shape: shingle→hash is the engine-wide
    * codegen'd md5, membership collapses in ONE map-side-combined
    * groupBy on the hash, and the bottom-k is a sort+limit Spark
    * executes as TakeOrdered (per-partition top-k, driver merge of
    * k·partitions rows) — no global sort, no second shuffle, driver
    * state bounded by k. The sketches are mergeable by construction
    * (union = re-min), so per-dump sketches can be precomputed and
    * compared later without touching the corpora.
    */
  def corpusOverlapKmv(a: DataFrame, b: DataFrame, textCol: String,
      k: Int = 128, shingleWords: Int = 3): DataFrame = {
    require(k >= 2, s"need k >= 2: $k")
    def hashes(df: DataFrame, ia: Int, ib: Int): DataFrame = df
      .select(explode(NearDup.shinglesCol(col(textCol), shingleWords)).as("__sh"))
      .select(NearDup.shingleHash60(col("__sh")).as("h"),
        lit(ia).as("ia"), lit(ib).as("ib"))
    val sketch = hashes(a, 1, 0).union(hashes(b, 0, 1))
      .groupBy(col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .orderBy(col("h").asc)
      .limit(k)
    val twoTo60 = lit(1.152921504606846976e18) // 2^60, exact in double
    // zero-guarded ratio: comparing an empty corpus (or two) must give
    // defined 0.0 statistics, not 0/0 NaN — mirrors the streaming
    // session's estimate() so streamed ≡ batch holds on empty inputs
    def ratio(num: Column, den: Column): Column =
      when(den === 0L, lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
    sketch
      .agg(
        count(lit(1)).as("sketch_size"),
        coalesce(max(col("h")), lit(0L)).as("kth_min"),
        coalesce(sum(when(col("ia") === 1 && col("ib") === 1, 1L).otherwise(0L)),
          lit(0L)).as("n_both"),
        coalesce(sum(col("ia").cast("long")), lit(0L)).as("n_a"),
        coalesce(sum(col("ib").cast("long")), lit(0L)).as("n_b"))
      .select(
        col("sketch_size"), col("kth_min"), col("n_both"), col("n_a"), col("n_b"),
        ratio(col("n_both"), col("sketch_size")).as("est_jaccard"),
        ratio(col("n_both"), col("n_a")).as("est_contain_a"),
        ratio(col("n_both"), col("n_b")).as("est_contain_b"),
        when(col("sketch_size") === k,
            (col("sketch_size") - 1).cast("double") * twoTo60 /
              col("kth_min").cast("double"))
          .otherwise(col("sketch_size").cast("double"))
          .as("est_union"))
  }
}
