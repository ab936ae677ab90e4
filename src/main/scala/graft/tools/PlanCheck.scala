package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

import graft.SparkEntry

/** Physical-plan audit: asserts every gate query compiles to the plan
  * shape intended for scale (filters/projections reaching the parquet
  * scan, dimension joins broadcast, top-k as TakeOrdered, no accidental
  * cartesian products). Run:
  * `sbt "runMain graft.tools.PlanCheck [sfDir]"` — exits nonzero on any
  * violation so it can gate commits.
  */
object PlanCheck {

  final case class Expectation(
      query: String,
      mustContain: Seq[String] = Nil,
      mustNotContain: Seq[String] = Nil)

  /** Per-query plan contracts. `CartesianProduct` is globally forbidden;
    * broadcast nested-loop joins are allowed only where the query is
    * an intentional small-side cross score (ANN top-k).
    */
  val expectations: Seq[Expectation] = Seq(
    Expectation("q01_pricing_summary", mustContain = Seq("HashAggregate")),
    Expectation("q02_filter_pushdown",
      // filter and 4-column projection reach the scan
      mustContain = Seq("PushedFilters: [IsNotNull(l_shipdate)", "ReadSchema: struct<l_orderkey")),
    Expectation("q03_broadcast_join_agg", mustContain = Seq("BroadcastHashJoin")),
    Expectation("q04_multi_join_revenue", mustContain = Seq("BroadcastHashJoin")),
    Expectation("q05_semi_join_exists", mustContain = Seq("LeftSemi")),
    Expectation("q06_anti_join_frontier", mustContain = Seq("LeftAnti")),
    // rn=1 must plan as WindowGroupLimit (map-side partial top-1 per
    // group before the shuffle — the thing that keeps this query viable
    // at 100 TB instead of sorting every group's full contents).
    Expectation("q07_first_per_group", mustContain = Seq("WindowGroupLimit")),
    Expectation("q09_topk_orders", mustContain = Seq("TakeOrderedAndProject")),
    // the hash-order sample must be a one-pass top-k, not a global sort
    Expectation("q28_random_sample", mustContain = Seq("TakeOrderedAndProject")),
    Expectation("q22_cosine_topk", mustContain = Seq("BroadcastNestedLoopJoin")),
    // repetition signals are pure per-row array math — any aggregate in
    // the plan means an accidental explode/groupBy crept in
    Expectation("q29_repetition_stats", mustNotContain = Seq("HashAggregate", "ObjectHashAggregate")),
    // the composite quality gate is likewise pure per-row array math
    Expectation("q36_quality_gate", mustNotContain = Seq("HashAggregate", "ObjectHashAggregate")),
    // the benchmark shingle set must broadcast (the corpus side never
    // shuffles for this join)
    Expectation("q30_decontamination",
      mustContain = Seq("BroadcastHashJoin"), mustNotContain = Seq("SortMergeJoin")),
    // top-k per doc / per stratum must keep the map-side partial limit
    Expectation("q31_tfidf_topk", mustContain = Seq("WindowGroupLimit")),
    Expectation("q32_stratified_sample", mustContain = Seq("WindowGroupLimit")),
    // the as-of join is the union+window formulation: NO join operator
    // (a range join would explode at scale)
    Expectation("q34_asof_join",
      mustContain = Seq("Window"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct")),
    // first-occurrence must stay a map-side-combinable min(struct)
    // aggregate — a Window over the segment hash would sort each hash's
    // full multiplicity in one task (boilerplate-segment skew)
    Expectation("q40_segment_dedup",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Window ")),
    // PII scrub is chained regexp_replace — pure per-row, no aggregates
    Expectation("q41_pii_scrub",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate")),
    Expectation("q42_unigram_surprisal", mustContain = Seq("HashAggregate")),
    // bigram surprisal must reduce to per-doc bigram counts before the
    // frequency joins (a per-token join would move the whole corpus)
    Expectation("q56_bigram_surprisal", mustContain = Seq("HashAggregate")),
    // the trade-graph extraction (whose dim-broadcast contract is
    // q04's, same star joins) now runs ONCE inside the eager edge
    // checkpoint — re-deriving it per iteration was the round-6 scan
    // audit's finding — so the visible readout is checkpoint-truncated
    // (the q78 situation); it must stay cross-product-free
    Expectation("q57_pagerank_trade",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // the heavy-hitter top-k must be a one-pass TakeOrdered over the
    // counted trigrams, never a global sort of the frequency table
    Expectation("q59_top_ngrams", mustContain = Seq("TakeOrderedAndProject")),
    // funnel staging is windows + one rollup — any join operator means
    // a per-stage self-join of the event log crept in
    Expectation("q60_funnel_stages",
      mustContain = Seq("Window"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct")),
    // the whole quality report is ONE aggregation pass over the scan
    Expectation("q64_quality_report",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct")),
    // the windowed funnel keeps q60's no-join contract
    Expectation("q63_funnel_windowed",
      mustContain = Seq("Window"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct")),
    // cohort join is an equi join on user_id — never a nested loop
    Expectation("q61_retention_cohorts",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    // postings collect is the object-hash aggregate; the n_docs side
    // must broadcast (never a shuffled join for a 1-row bound)
    Expectation("q62_inverted_index",
      mustContain = Seq("ObjectHashAggregate", "BroadcastNestedLoopJoin")),
    // the weight table must broadcast — a shuffled join on bucket would
    // move the entire exploded token stream
    Expectation("q65_quality_classifier",
      mustContain = Seq("BroadcastHashJoin"), mustNotContain = Seq("SortMergeJoin")),
    // two-phase vocabulary rank: the ranking window must be PARTITIONED
    // (by __pid — "[__pid]" is the window's partition-spec bracket; an
    // unpartitioned Window.orderBy would hold the whole vocabulary in
    // one task) and the per-partition offset table must broadcast
    Expectation("q66_zipf_law",
      mustContain = Seq("HashAggregate", "Window",
        "windowspecdefinition(__pid", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // the per-stratum target table is tiny and must broadcast into the
    // greedy fill (the corpus side keeps its window partitioning)
    Expectation("q67_temperature_mix",
      mustContain = Seq("BroadcastHashJoin", "Window"),
      mustNotContain = Seq("SortMergeJoin")),
    // per-row array math like q29/q36 — an aggregate means an
    // accidental explode/groupBy crept in
    Expectation("q68_char_entropy",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate")),
    // df + corpus stats are tiny frames that must broadcast into the
    // scoring join; the top-k is an orderBy+limit the planner must run
    // as per-partition heaps, never a global sort
    Expectation("q69_bm25_search",
      mustContain = Seq("BroadcastHashJoin", "TakeOrderedAndProject"),
      mustNotContain = Seq("SortMergeJoin")),
    // cluster labels are one row per CLUSTERED doc (never the corpus)
    // and must broadcast into the quality frame; the per-cluster pick
    // is a single window
    Expectation("q70_canonical_dedup",
      mustContain = Seq("BroadcastHashJoin", "Window")),
    // the merged bucket table (≤`buckets` rows) and 1-row totals must
    // broadcast — a shuffled join on bucket would move the entire
    // exploded feature stream twice
    Expectation("q71_importance_weights",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin")),
    // the broadcast query side joins the bucketed corpus stream once;
    // same-label rows are dropped at the join, before the scorer
    Expectation("q72_hard_negatives",
      mustContain = Seq("BroadcastHashJoin", "Window"),
      mustNotContain = Seq("SortMergeJoin")),
    // per-stratum copy counts broadcast back into a narrow explode —
    // nothing but the stratum table ever shuffles
    Expectation("q73_epoch_repeat",
      mustContain = Seq("BroadcastHashJoin", "Generate"),
      mustNotContain = Seq("SortMergeJoin")),
    // greedy MMR runs k bounded driver rounds (each a TakeOrdered over
    // the checkpointed pool); the returned frame is the assembled picks
    Expectation("q74_mmr_select",
      mustContain = Seq("LocalTableScan")),
    // the BM25 input keeps its broadcast stats joins; the fused cut
    // must stay a one-pass TakeOrdered, never a global sort
    Expectation("q75_rrf_fusion",
      mustContain = Seq("BroadcastHashJoin", "TakeOrderedAndProject"),
      mustNotContain = Seq("SortMergeJoin")),
    // the evaluator windows and aggregates per query over top-k-sized
    // lists; the BM25 input keeps its broadcast stats joins
    Expectation("q76_ndcg_eval",
      mustContain = Seq("HashAggregate", "Window", "BroadcastHashJoin")),
    // SemDeDup: the executed plan is checkpoint-truncated (the q58
    // situation — assignment + sweep live behind the localCheckpoint),
    // so the broadcast-codebook and partitioned-window contracts are
    // asserted in VectorsSpec on the uncheckpointed plan; here, the
    // visible pair phase must join partitioned BY CELL (sort-merge or
    // shuffled-hash — never a cross product of the corpus with itself)
    Expectation("q78_semantic_dedup",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // CCNet buckets: the corpus cumsum must be the two-phase form — a
    // __pid-PARTITIONED window plus a broadcast offset join (q66's
    // contract); an unpartitioned Window.orderBy would pull the whole
    // scored corpus through one task
    Expectation("q79_perplexity_buckets",
      mustContain = Seq("windowspecdefinition(__pid", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // containment: the pair phase must join ON THE SHINGLE KEY with a
    // map-side-combined pair aggregate — never any flavor of cross
    // product (the df cap exists precisely to keep the shingle join
    // bounded)
    Expectation("q80_containment_pairs",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // normalized dedup is ONE map-side-combined hash-groupBy over the
    // codegen'd regex key — no join, no window, nothing else
    Expectation("q81_normalized_dedup",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct", "Window")),
    // training order: the global rank must be the two-phase form — a
    // __pid-partitioned window + broadcast offset join (q66/q79's
    // contract)
    Expectation("q82_train_order",
      mustContain = Seq("windowspecdefinition(__pid", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // FIM split is pure per-row column math (q29/q36/q68's contract):
    // any aggregate, join, or window means something crept in
    Expectation("q83_fim_split",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct")),
    // star-CC gate twin: the per-round phases live behind
    // localCheckpoints (q58's situation); the visible readout must stay
    // cross-product-free
    Expectation("q84_dedup_clusters_star",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // the benchmark shingle set must broadcast into the probe (q30's
    // contract): the corpus side never shuffles for the join
    Expectation("q85_contamination_score",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // kmeans‖-fed sweep reads the checkpointed assignment like q78;
    // the visible readout must stay cross-product-free
    Expectation("q87_kmeans_codebook",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // soft dedup: df aggregate + join ON THE SHINGLE HASH + per-doc
    // aggregate (the q42 shape) — map-side-combinable aggregates, no
    // window (a df window over the shingle would sort each boilerplate
    // shingle's full multiplicity in one task), no cross product
    Expectation("q89_soft_dedup_weights",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct", "BroadcastNestedLoopJoin")),
    // cluster-balanced sample: the per-cell cap must keep the q32
    // WindowGroupLimit (map-side partial top-k per cell before the
    // shuffle); the assignment's intentional cross score is against
    // the BROADCAST codebook (the q22 situation)
    Expectation("q90_cluster_balanced_sample",
      mustContain = Seq("WindowGroupLimit", "BroadcastNestedLoopJoin")),
    // HNSW beam descent: the per-round phases live behind
    // localCheckpoints (q58's situation — layer graphs + beam ranks are
    // spec-asserted in HnswSpec); the only intentional cross score is
    // the entry against the broadcast top layer, inside the checkpoint;
    // the visible readout must stay cross-product-free
    Expectation("q88_hnsw_topk",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // exact-span dedup: first-occurrence must stay the q40 map-side
    // min(struct) aggregate (a row_number window over the shingle hash
    // would sort each boilerplate hash's full multiplicity in one
    // task); the coverage window must be PARTITIONED by the doc id
    Expectation("q86_exact_span_dedup",
      mustContain = Seq("HashAggregate", "windowspecdefinition(doc_id"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // grouped split: the per-group decision table must BROADCAST back
    // into the corpus (the corpus never shuffles for its split label)
    Expectation("q91_grouped_split",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct", "Window")),
    // SQ8 top-k: the quantized query side is the q22 intentional
    // broadcast cross score. The stats pass (one map-side-combined
    // min/max aggregate) runs as its own driver-collected job BEFORE
    // this plan (the kmeans-codebook situation), so no aggregate may
    // appear in the search plan itself
    Expectation("q92_sq8_topk",
      mustContain = Seq("BroadcastNestedLoopJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // semantic contamination: the benchmark broadcasts (the q78
    // assignment plan); the max_by collapses map-side — the corpus
    // never shuffles by anything but its id
    Expectation("q93_semantic_contamination",
      mustContain = Seq("BroadcastNestedLoopJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct", "Window")),
    // URL normalize/eTLD+1 is a pure per-row map (the PSL UDF) — no
    // aggregate, join, or window may creep in
    Expectation("q94_url_etld1",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct")),
    // cluster budget mix: codebook broadcast (the q78 cross score);
    // the budget window must be PARTITIONED by the cell
    Expectation("q96_cluster_budget_mix",
      mustContain = Seq("BroadcastNestedLoopJoin", "windowspecdefinition(cell"),
      mustNotContain = Seq("CartesianProduct")),
    // snapshot diff: one full-outer equi-join over (id, md5) — never
    // any flavor of cross product, and both inputs reduce to two
    // columns before the join (text stays at the scan)
    Expectation("q95_snapshot_diff",
      mustContain = Seq("FullOuter"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // rotated SQ8: the q92 contract — rotation is per-row (one UDF
    // projection), stats collect runs as its own prior job, search is
    // the broadcast cross score
    Expectation("q97_rotated_sq8_topk",
      mustContain = Seq("BroadcastNestedLoopJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // KMV sketch: ONE map-side-combined groupBy on the hash, bottom-k
    // as TakeOrdered — never a global Sort+collect, never a join
    Expectation("q98_corpus_overlap_kmv",
      mustContain = Seq("TakeOrderedAndProject", "HashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct")),
    // binary ANN: integer popcount cross score, query side broadcast
    Expectation("q99_binary_topk",
      mustContain = Seq("BroadcastNestedLoopJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // matryoshka: prefix shortlist (broadcast cross score, k-filtered
    // window), then the rerank joins the BOUNDED shortlist broadcast
    // against the full-vector corpus — the corpus must not shuffle
    Expectation("q100_matryoshka_topk",
      mustContain = Seq("BroadcastNestedLoopJoin", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // IVF-SQ8: the probed query side broadcasts and the candidate join
    // is a cell equi-join — the corpus shuffles for nothing
    Expectation("q101_ivf_sq8_topk",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // cascade: stage 1 is the broadcast popcount cross score; stages
    // 2/3 join the BOUNDED survivor sets broadcast — the corpus never
    // shuffles at any stage
    Expectation("q102_cascade_topk",
      mustContain = Seq("BroadcastNestedLoopJoin", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // KN bigram LM: one bigram groupBy; the vocabulary-sized
    // context/continuation tables broadcast back — the bigram table
    // must not shuffle again for the joins
    Expectation("q103_kn_bigram_lm",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // the LM probe must broadcast; doc stats are one map-side-combined
    // aggregate on the doc id
    Expectation("q104_kn_doc_filter",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // trigram KN: the trigram table is an eager checkpoint; per-WORD
    // count tables always broadcast, and the bigram-TYPE-keyed tables
    // (ctx3/cont23) broadcast here because the size gate measured them
    // small — at gate scale every join is a BroadcastHashJoin (the
    // forced-shuffle twin of the gate is spec-pinned equal in
    // CurationOpsSpec)
    Expectation("q105_kn_trigram_lm",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // PCA deterministic core: one map-side-combined aggregate on the
    // dimension id, dim-sized windows, NO join anywhere
    Expectation("q106_pca_variance_rank",
      mustContain = Seq("HashAggregate", "Window"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct")),
    // trigram doc filter: the q104 shape one order up — the
    // (size-gated) LM probe broadcasts at gate scale; doc counters are
    // one map-side-combined aggregate on the doc id
    Expectation("q107_kn_doc_filter3",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // two-pass heavy hitters: the verify pass is a broadcast left-semi
    // (candidate set is bounded by sketch capacity × partitions) into
    // one map-side-combined count; the full type table never shuffles
    Expectation("q108_heavy_hitters",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin", "LeftSemi"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // JW entity pairs: dictionary built by a map-side-combined count,
    // prefix-block equi-join (dictionary-sized → broadcast at gate
    // scale), native JW verify on candidates only — never a cross join
    Expectation("q109_jw_entity_pairs",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // domain cap: the rank filter must keep the map-side partial-limit
    // shape (k per domain per task crosses the exchange, not the corpus)
    Expectation("q110_domain_cap",
      mustContain = Seq("WindowGroupLimit"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // histogram percentiles: one map-side-combined aggregate builds the
    // bounded (stratum, length, count) table; windows run over THAT,
    // never the corpus; no join anywhere
    Expectation("q111_length_histogram",
      mustContain = Seq("HashAggregate", "Window"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct")),
    // grouped heavy hitters: same contract as q108 — broadcast
    // left-semi verify into a map-side-combined count, bounded totals
    // broadcast; the per-group type table never shuffles
    Expectation("q112_heavy_hitters_grouped",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin", "LeftSemi"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // cross-corpus near-dup: band-bucket equi joins + candidate-bounded
    // verify, like q17 — never a cross join
    Expectation("q113_cross_corpus_pairs",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct")),
    // NFC normalization is a pure per-row map (JDK normalizer UDF) —
    // the q94 contract: no aggregate, join, or window may creep in
    Expectation("q114_nfc_normalize",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct")),
    // script-mix is pure per-row column math — same per-row contract
    Expectation("q115_script_mix",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct")),
    // QL ranking: the q69 contract — bounded stats broadcast into the
    // scoring joins, top-k as per-partition heaps, never a global sort
    Expectation("q116_ql_search",
      mustContain = Seq("TakeOrderedAndProject"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // bursts: one map-side-combined (type, hour) count, windows over
    // the bounded hourly table — no join anywhere near the event log
    Expectation("q117_event_bursts",
      mustContain = Seq("HashAggregate", "Window"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct")),
    // CMS table: ONE map-side-combined aggregate over ≤ depth·width
    // keys — no join anywhere; the summary, not the type table,
    // crosses the exchange
    Expectation("q118_cms_sketch",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct")),
    // CMS estimates: the bounded sketch/probe tables broadcast into
    // the lookup joins; probe top-50 is a TakeOrdered, not a sort
    Expectation("q119_cms_estimates",
      mustContain = Seq("BroadcastHashJoin", "TakeOrderedAndProject"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // HLL registers: pure per-row bit math into one map-side-combined
    // max over 2^p keys — no join
    Expectation("q120_hll_registers",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct")),
    // HLL estimate: the register fold collapses to a single-row
    // aggregate — still no join
    Expectation("q121_hll_estimate",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct")),
    // Bloom probe: the ≤ m-row bit table broadcasts into a left-semi
    // membership join — the corpus side never shuffles for the lookup
    Expectation("q122_bloom_probe",
      mustContain = Seq("BroadcastHashJoin", "LeftSemi"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // C4 line cleaning is pure per-row array math — the q29/q36/q115
    // contract: no aggregate, join, or window may creep in
    Expectation("q123_c4_line_filter",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct")),
    // Heaps fit: both cumsums are PARTITIONED two-phase windows (the
    // q66 contract) with broadcast offset joins — no global-sort window
    Expectation("q139_heaps_law",
      mustContain = Seq("windowspecdefinition(__pid", "HashAggregate",
        "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // CDC block dedup: map-side-combined min(struct) over the chunk
    // table + the md5 equi-join + per-doc rollup — no window (the
    // first-occurrence pick must stay an aggregate, the q40/q86 rule)
    Expectation("q133_cdc_dedup",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("Window ", "CartesianProduct")),
    // CDC block diff: hash-only projections into the (doc, md5)
    // equi-join — text never crosses the shuffle; no window
    Expectation("q134_cdc_block_diff",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("Window ", "CartesianProduct")),
    // A-ES weighted sample: per-row key math + ONE TakeOrdered — no
    // join, window, or global sort may creep in
    Expectation("q132_weighted_sample",
      mustContain = Seq("TakeOrderedAndProject"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "Window ", "CartesianProduct")),
    // CDC segmentation is per-row HOF math + one explode — no
    // aggregate, join, or window may creep in
    Expectation("q131_cdc_segments",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window ", "CartesianProduct")),
    // WARC round trip: per-segment blob assembly (collect_list) then a
    // stateless per-row parse explode — no join anywhere
    Expectation("q136_warc_roundtrip",
      mustContain = Seq("ObjectHashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct")),
    // phrase search: term-filtered postings equi-joins + one count
    // aggregate — never a window or cross product
    Expectation("q138_phrase_search",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("Window ", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // code-switch: one line explode into a map-side-combined per-doc
    // rollup — no join or window on the engine side
    Expectation("q140_code_switch",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "Window ", "CartesianProduct")),
    // proximity search: bucketed range join of term-filtered postings
    // (the q44 contract) — bounded equi-join, never a cross product
    Expectation("q141_proximity_search",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("Window ", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // markdown extraction is chained per-row regex — the q135 contract
    Expectation("q142_markdown_extract",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct")),
    // HTTP split is pure per-row column math
    Expectation("q137_http_split",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct")),
    // HTML extraction is chained per-row regex — the q41 contract
    Expectation("q135_html_extract",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct")),
    // readability is pure per-row HOF math — the q29/q36/q123 contract
    Expectation("q130_readability",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "Window", "CartesianProduct")),
    // vocab coverage: the top-V vocabulary must be a one-pass
    // TakeOrdered over the distinct-word rollup and BROADCAST back
    // into the (doc, word) relation — never a shuffled join against
    // V-bounded state
    Expectation("q128_vocab_coverage",
      mustContain = Seq("TakeOrderedAndProject", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct")),
    // JSD matrix: map-side-combined rollups; the single-row totals
    // frame rides a broadcast nested-loop (the q22 sanctioned shape);
    // no shuffled join anywhere
    Expectation("q129_js_divergence",
      mustContain = Seq("HashAggregate", "BroadcastNestedLoopJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // grouped HLL: per-row bit math into one map-side-combined max
    // over groups × 2^p keys — still no join
    Expectation("q124_hll_grouped",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct")),
    // CMS inner product: sketch-sized sides only — the cell join and
    // the single-row truth×estimate combine must both be broadcast
    Expectation("q125_cms_inner_product",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // PMI: the bigram shuffle + vocabulary-bounded unigram broadcasts
    // (the knBigramLm precedent) + top-k as TakeOrdered
    Expectation("q126_pmi_collocations",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin",
        "TakeOrderedAndProject"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // drift: ONE conditional-sum groupBy over the union (no join
    // between the corpora), broadcast totals, top-k as TakeOrdered
    Expectation("q127_corpus_drift",
      mustContain = Seq("HashAggregate", "TakeOrderedAndProject", "Union"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),

    // ---- round-9 completion sweep: every remaining gate gets its
    // explicit shuffle/broadcast/window contract (no default rows —
    // main() now FAILS a query with no entry here).
    // running-sum file packing: one Window pass, no join
    Expectation("q08_running_sum_pack", mustContain = Seq("Window")),
    // set intersect joins exploded members; the per-doc rollup combines
    Expectation("q10_set_intersect", mustContain = Seq("HashAggregate", "BroadcastHashJoin")),
    // exact dedup = hash-groupBy min(struct); a Window here would sort
    // each hash's full multiplicity in one task (q40's skew lesson)
    Expectation("q11_exact_dedup_docs",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Window ")),
    Expectation("q12_event_time_window", mustContain = Seq("HashAggregate")),
    // collect_set needs the object-hash aggregate, never sort-based
    Expectation("q13_group_collect_set",
      mustContain = Seq("ObjectHashAggregate"), mustNotContain = Seq("SortAggregate")),
    // driver-computed dim×dim control-plane emission: the plan IS a
    // local table — any FileScan would mean the moments re-read data
    Expectation("q143_jacobi_first_sweep",
      mustContain = Seq("LocalTableScan"), mustNotContain = Seq("FileScan")),
    // same control-plane emission contract: the allocation runs on the
    // dim-bounded spectrum, the plan is a local table
    Expectation("q151_opq_allocation",
      mustContain = Seq("LocalTableScan"), mustNotContain = Seq("FileScan")),
    // q143's multi-sweep sibling: same driver dim×dim control-plane
    // emission after the one distributed moment aggregate
    Expectation("q159_jacobi_two_sweeps",
      mustContain = Seq("LocalTableScan"), mustNotContain = Seq("FileScan")),
    Expectation("q14_json_extract_agg", mustContain = Seq("HashAggregate")),
    // multi-label matcher explodes its hits; the match itself is the
    // codegen-asserted native expression below
    Expectation("q15_brute_vocab_search", mustContain = Seq("Generate")),
    // declared exhaustive oracle (weak-by-design): shingle-share join +
    // per-pair rollup; sizes broadcast
    Expectation("q16_ngram_jaccard_pairs",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin")),
    // LSH: the band-key self-join is the data-scale shuffle; signature
    // tables join broadcast
    Expectation("q17_minhash_lsh_pairs",
      mustContain = Seq("SortMergeJoin", "BroadcastHashJoin")),
    Expectation("q18_simhash_pairs",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin")),
    // quality scoring / lang-id / z-order keys are pure per-row column
    // math — an aggregate means an accidental explode/groupBy crept in
    Expectation("q19_text_quality",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate")),
    Expectation("q20_lang_id",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate")),
    Expectation("q48_zorder_layout",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate")),
    // winnowing explodes k-gram windows then reduces per doc
    Expectation("q21_doc_fingerprint", mustContain = Seq("Generate")),
    // ANN top-k through hyperplane buckets: per-query group limit +
    // broadcast bucket probe (BNLJ ban lifted only for q22's oracle)
    Expectation("q23_lsh_topk",
      mustContain = Seq("WindowGroupLimit", "BroadcastHashJoin")),
    Expectation("q24_embedding_near_dup", mustContain = Seq("BroadcastHashJoin")),
    Expectation("q25_set_except",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin")),
    Expectation("q26_group_into_map", mustContain = Seq("ObjectHashAggregate")),
    // grouping-set families plan as Expand feeding ONE aggregate pass
    Expectation("q27_rollup_revenue", mustContain = Seq("Expand", "HashAggregate")),
    Expectation("q46_cube_revenue", mustContain = Seq("Expand", "HashAggregate")),
    Expectation("q50_hopping_window", mustContain = Seq("Expand", "HashAggregate")),
    // session windows must use the native MergingSessions operator
    Expectation("q33_sessionize", mustContain = Seq("MergingSessions")),
    // iterative star-CC / kNN-graph readouts are checkpoint-truncated
    // (the q57 situation) — the visible slice must stay product-free
    Expectation("q35_dedup_clusters",
      mustNotContain = Seq("BroadcastNestedLoopJoin")),
    Expectation("q58_knn_graph",
      mustNotContain = Seq("BroadcastNestedLoopJoin")),
    // budgeted/weighted sampling: rank window over the salted key
    Expectation("q37_token_budget_mix", mustContain = Seq("Window")),
    Expectation("q55_pps_sample", mustContain = Seq("Window")),
    Expectation("q38_length_percentiles", mustContain = Seq("ObjectHashAggregate")),
    // two-phase pack: per-shard window ranks, no corpus-wide sort join
    Expectation("q39_sequence_pack", mustContain = Seq("Window")),
    // next-fit packing is the one genuine per-partition imperative op
    Expectation("q43_pack_next_fit", mustContain = Seq("MapPartitions")),
    // radius-bucket proximity: bucket explode + equi-join, never a
    // range nested loop
    Expectation("q44_time_proximity",
      mustContain = Seq("Generate"), mustNotContain = Seq("BroadcastNestedLoopJoin")),
    // deletion-variant linkage: variant explode + EQUI-join only
    Expectation("q45_editdist_pairs",
      mustContain = Seq("Generate"), mustNotContain = Seq("BroadcastNestedLoopJoin")),
    Expectation("q51_editdist_triangles",
      mustContain = Seq("Generate", "HashAggregate"),
      mustNotContain = Seq("BroadcastNestedLoopJoin")),
    Expectation("q47_event_gaps", mustContain = Seq("Window")),
    Expectation("q49_pivot_priority", mustContain = Seq("HashAggregate")),
    // batch-UDF media seam: typed mapPartitions (the mapInPandas shape)
    Expectation("q52_media_decode", mustContain = Seq("MapPartitions")),
    Expectation("q53_except_all", mustContain = Seq("HashAggregate", "Union")),
    Expectation("q54_string_agg", mustContain = Seq("ObjectHashAggregate")),
    // span dedup: k-gram explode, per-span window, doc-level rebuild
    Expectation("q77_span_dedup", mustContain = Seq("Generate", "Window")),
    // HRW sharding is pure per-row struct-argmax — no explode, no
    // shuffle, no aggregate
    Expectation("q144_rendezvous_shards",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate", "Generate")),
    // blocklist probe: suffix explode + BROADCAST rules join (a
    // shuffled join here means the rules table lost its broadcast)
    Expectation("q145_domain_blocklist",
      mustContain = Seq("Generate", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin")),
    // Luhn is per-row HOF math — aggregates mean an accidental explode
    Expectation("q146_luhn_pii",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate", "Generate")),
    // leakage audit: broadcast split table + ONE conditional-sum rollup
    Expectation("q147_split_leakage",
      mustContain = Seq("HashAggregate", "BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin")),
    // outlinks: one extract_all + link-bounded explode; no join, no
    // aggregate — edges are the product
    Expectation("q148_outlinks",
      mustContain = Seq("Generate"),
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "BroadcastHashJoin", "SortMergeJoin")),
    // encoding damage is per-row split-count math — any explode or
    // aggregate means the counting shape regressed
    Expectation("q149_encoding_quality",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate", "Generate")),
    // robots: line explode + per-HOST windows (never global) + the
    // URL-side host-keyed rule join; CartesianProduct would mean the
    // prefix test lost its host equi-key
    Expectation("q150_robots_admission",
      mustContain = Seq("Generate", "Window", "HashAggregate")),
    // schedule: per-HOST slot window; the URL-side delay join must
    // BROADCAST (the robots-parse internals may host-key-shuffle —
    // scale-correct for a million-host robots table)
    // the budget must map-side truncate each host to maxPerHost rows
    // BEFORE the exchange (r10: the filter moved onto the raw
    // row_number so InferWindowGroupLimit fires — the previous
    // derived-column filter shipped every URL into the window sort)
    Expectation("q152_fetch_schedule",
      mustContain = Seq("WindowGroupLimit", "BroadcastHashJoin")),
    // in-degree: edge explode + ONE rollup; no join
    Expectation("q153_host_indegree",
      mustContain = Seq("Generate", "HashAggregate"),
      mustNotContain = Seq("BroadcastHashJoin", "SortMergeJoin")),
    // IBAN is per-row HOF math — aggregates mean an accidental explode
    Expectation("q154_iban_pii",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate", "Generate")),
    // recrawl plan: one URL-keyed equi-join + per-row CASE — no
    // window, no aggregate, no cartesian
    Expectation("q158_recrawl_plan",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "Window", "Generate")),
    // sitemap composition: blob build is ONE collect_list rollup, the
    // parse an entry-bounded explode; the sitemap-URL join keys on host
    Expectation("q157_sitemap_frontier",
      mustContain = Seq("Generate", "ObjectHashAggregate")),
    // q-digest emissions are control-plane local tables (the
    // distributed stage is the universe-bounded leaf groupBy the
    // collect consumed) — the q143/q151 contract
    Expectation("q155_qdigest",
      mustContain = Seq("LocalTableScan"), mustNotContain = Seq("FileScan")),
    Expectation("q156_qdigest_quantiles",
      mustContain = Seq("LocalTableScan"), mustNotContain = Seq("FileScan")),
    // the grouped digest is the one q-digest that must NOT collect:
    // map-side-combined (host, leaf) counts, then per-group
    // compression WHERE THE DATA SITS (MapGroups) — hosts are
    // unbounded at 100 TB, so a LocalTableScan here would mean a
    // driver-side fold over every host
    Expectation("q160_qdigest_by_host",
      mustContain = Seq("MapGroups", "HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // trap panel: map-side-combinable (host, template) aggregate, the
    // per-host total window runs over the AGGREGATED relation (rows
    // per host = its template count, never its URL count)
    Expectation("q161_crawl_traps",
      mustContain = Seq("HashAggregate", "Window"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // sitemapindex parse: per-blob regex explode, no state, no shuffle
    // beyond the gate's output sort (the q157/q136 segment argument)
    Expectation("q162_sitemap_index",
      mustContain = Seq("Generate"),
      mustNotContain = Seq("Window", "CartesianProduct", "BroadcastNestedLoopJoin")),
    // URL canonicalization: pure per-row map (the q83 contract) — the
    // UDF is a bounded string walk, no shuffle beyond the output sort
    Expectation("q163_url_canonical",
      mustNotContain = Seq("Window", "HashAggregate", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // anchor panel: zipped extract_all explode + ONE map-side-combinable
    // rollup; no join (the q153 shape with the anchor key added)
    Expectation("q164_anchor_text",
      mustContain = Seq("Generate", "HashAggregate"),
      mustNotContain = Seq("BroadcastHashJoin", "SortMergeJoin",
        "CartesianProduct")),
    // host PageRank (redistributed): every round ends in an eager
    // localCheckpoint (the rank frame is read twice per round — see
    // PageRank.ranks), so the visible readout is checkpoint-truncated
    // (the q57/q78 situation); it must stay cross-product-free
    Expectation("q165_host_pagerank",
      mustNotContain = Seq("CartesianProduct")),
    // priority fold: BOTH side tables (host-grained in-degree,
    // (host,template)-grained traps) broadcast against the URL
    // relation — a sort-merge here would shuffle billions of URLs to
    // join a panel of thousands
    Expectation("q166_frontier_priority",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // redirect resolution: each doubling ends in an eager checkpoint
    // (the map is read twice per round — see Redirects.resolve), so
    // the visible readout is the terminal-probe equi-join only; it
    // must stay cross-product-free
    Expectation("q167_redirect_resolve",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // apportionment: the remainder rank must be the PARTITIONED
    // two-phase window (WindowAudit holds the no-single-task-window
    // line); the two 1-row aggregates broadcast back — their
    // nested-loop joins are intentional single-row crosses
    Expectation("q168_budget_apportion",
      mustContain = Seq("Window"),
      mustNotContain = Seq("CartesianProduct")),
    // HITS: every half-step ends in an eager checkpoint (score frames
    // feed the next half-step AND their max aggregate), so the visible
    // readout is the final node⋈hub⋈auth equi-joins; cross-product-free
    Expectation("q169_host_hits",
      mustNotContain = Seq("CartesianProduct")),
    // mix schedule: step explode + windows PARTITIONED BY step — no
    // join anywhere, and never a single-task (empty-partition) window
    Expectation("q170_mix_schedule",
      mustContain = Seq("Window", "Generate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct")),
    // span corruption: word-bounded posexplode + ONE string-assembling
    // rollup (collect_list → ObjectHashAggregate); no join, no window
    Expectation("q171_span_corruption",
      mustContain = Seq("Generate", "ObjectHashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "BroadcastHashJoin",
        "Window", "CartesianProduct")),
    // keep-best dedup: one key rollup (max_by-of-struct has no hash
    // impl → partial+final SortAggregate, still map-side combined —
    // the sort is per-partition on the md5 key, never a quality sort
    // of the corpus) + one keyed join back; never a window
    Expectation("q172_dedup_keep_best",
      mustContain = Seq("SortAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // cluster-safe split: the cluster table joins the corpus on the
    // doc id (small side broadcasts here; honest sort-merge at scale)
    // + per-row hash math — never a cross product
    Expectation("q173_cluster_safe_split",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // bitext margin: the broadcast cross score is the q22 intentional
    // shape; the rank/mean windows partition by endpoint id
    Expectation("q174_bitext_margin",
      mustContain = Seq("BroadcastNestedLoopJoin", "Window"),
      mustNotContain = Seq("CartesianProduct")),
    // digest length floor: the walk is control-plane; the visible
    // admission pass is per-row math against a literal — no join, no
    // window, no aggregate beyond none at all
    Expectation("q175_digest_length_floor",
      mustNotContain = Seq("Window", "HashAggregate", "ObjectHashAggregate",
        "SortMergeJoin", "BroadcastHashJoin", "CartesianProduct")),
    // bucketed bitext margin: the candidate join is a HASH equi-join
    // on the bucket key — the whole point vs q174's broadcast cross
    // score; no nested-loop anywhere
    Expectation("q176_bitext_lsh_margin",
      mustContain = Seq("BroadcastHashJoin", "Window"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    // budgeted schedule: the hardCap LITERAL must keep the map-side
    // WindowGroupLimit even though the quota bound is dynamic; delay
    // and budget tables broadcast
    Expectation("q177_budgeted_schedule",
      mustContain = Seq("WindowGroupLimit", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct")),
    // status triage: per-row CASE + ONE host rollup — no join, no
    // window, no explode
    Expectation("q178_status_triage",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("BroadcastHashJoin", "SortMergeJoin",
        "Window", "Generate", "CartesianProduct")),
    // DSv2 warc file source: the host-prefix filter must reach the
    // scan (directory pruning + record-side skip), never a cross
    // product anywhere downstream
    Expectation("q179_warc_source",
      mustContain = Seq("PushedFilters=[StringStartsWith(host,src1)"),
      mustNotContain = Seq("CartesianProduct")),
    // write→read: the sink ran eagerly inside the gate fn; the
    // visible plan is the read back under the pushed host filter
    Expectation("q187_warc_write_roundtrip",
      mustContain = Seq("PushedFilters=[StringStartsWith(host,src1)"),
      mustNotContain = Seq("CartesianProduct")),
    // the scan's SupportsReportStatistics sizes the warc relation from
    // real bytes, so the host dimension must broadcast (never a
    // sort-merge join against the store)
    Expectation("q188_warc_host_join",
      mustContain = Seq("BroadcastHashJoin", "HashAggregate"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // the streaming loop ran eagerly inside the gate fn; the visible
    // plan is the sink read-back under the pushed host filter
    Expectation("q189_warc_stream_archive",
      mustContain = Seq("PushedFilters=[StringStartsWith(host,src1)"),
      mustNotContain = Seq("CartesianProduct")),
    // the fuse rule must rewrite the authored regex chain: the fused
    // expression present, NO regexp_replace surviving anywhere
    Expectation("q186_dedup_fuse_rule",
      mustContain = Seq("graft_dedup_key", "HashAggregate"),
      mustNotContain = Seq("regexp_replace", "Window ",
        "CartesianProduct")),
    // the vocab-below-explode rule must rewrite the authored
    // chunk-explode × match: span scan below the Generate, slice
    // above it, NO per-chunk matcher surviving anywhere
    Expectation("q190_vocab_below_explode",
      mustContain = Seq("graft_vocab_spans", "graft_vocab_slice",
        "Generate"),
      mustNotContain = Seq("graft_vocab_match", "CartesianProduct")),
    // plain PQ-ADC: broadcast-query cross score (the q22 intentional
    // shape) + the per-query rank window
    Expectation("q180_pq_adc_topk",
      mustContain = Seq("BroadcastNestedLoopJoin", "Window"),
      mustNotContain = Seq("CartesianProduct")),
    // IVF-PQ: candidates come from the HASH equi-join on the cell id —
    // the whole point vs q180's cross score
    Expectation("q181_ivf_pq_topk",
      mustContain = Seq("BroadcastHashJoin", "Window"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    // DSIR panel: word explode + ONE map-side-combinable rollup onto
    // ≤256 keys — no join anywhere
    Expectation("q182_dsir_buckets",
      mustContain = Seq("Generate", "HashAggregate"),
      mustNotContain = Seq("BroadcastHashJoin", "SortMergeJoin",
        "Window", "CartesianProduct")),
    // bigram-featured panel: q182's shape over the wider feature space
    Expectation("q184_dsir_bigram_buckets",
      mustContain = Seq("Generate", "HashAggregate"),
      mustNotContain = Seq("BroadcastHashJoin", "SortMergeJoin",
        "Window", "CartesianProduct")),
    // DSIR scoring: pure per-row array math against a broadcast
    // literal — the corpus shuffles for nothing (no explode, no
    // aggregate, no join)
    Expectation("q183_dsir_score",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "Generate", "BroadcastHashJoin", "SortMergeJoin", "Window",
        "CartesianProduct")),
    // bigram scoring keeps the same pure-map shape (feature widening
    // is per-row array construction, not an explode)
    Expectation("q185_dsir_bigram_score",
      mustNotContain = Seq("HashAggregate", "ObjectHashAggregate",
        "Generate", "BroadcastHashJoin", "SortMergeJoin", "Window",
        "CartesianProduct")))

  /** Native expressions that must stay INSIDE whole-stage codegen in
    * the named query's executed plan — a static contract alongside
    * `expectations` above.
    */
  val codegenAsserted: Map[String, String] = Map(
    // native vocab-match expression (T8 perf path)
    "q15_brute_vocab_search" -> "graft_vocab_match",
    // fused hyperplane-bucket expression (ANN bucket key)
    "q23_lsh_topk" -> "graft_hyperplane_buckets",
    // fused L2-norm expression (per-row norm before the pair join)
    "q24_embedding_near_dup" -> "graft_norm_l2",
    // native deletion-variant expression (the edit-distance join's
    // fan-out stage; the HOF reference form would be CodegenFallback)
    "q45_editdist_pairs" -> "graft_deletion_variants",
    // q72 buckets with the same fused expression as q23
    "q72_hard_negatives" -> "graft_hyperplane_buckets",
    // native Jaro-Winkler verify (the fuzzy-linkage join's hot filter)
    "q109_jw_entity_pairs" -> "graft_jaro_winkler",
    // fused single-pass dedup-key normalizer (replaced the three-pass
    // regexp_replace chain — the r10→r11 q81 perf fix)
    "q81_normalized_dedup" -> "graft_dedup_key")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var failures = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      // codegen stage markers (*) only exist in the FINAL adaptive plan,
      // so the codegen assertion needs the query executed first
      if (codegenAsserted.contains(name)) df.collect()
      val qe: QueryExecution = df.queryExecution
      val plan = qe.executedPlan.toString
      // every gate MUST carry an explicit contract — a silent default
      // row is how the r7 window/broadcast hazards went unasserted
      val expOpt = expectations.find(_.query == name)
      val exp = expOpt.getOrElse(Expectation(name))
      val globallyForbidden =
        if (name == "q22_cosine_topk" || name == "q23_lsh_topk") Nil
        else Seq("CartesianProduct")
      val missing = (if (expOpt.isEmpty) Seq("EXPLICIT-CONTRACT") else Nil) ++
        exp.mustContain.filterNot(plan.contains)
      val present = (exp.mustNotContain ++ globallyForbidden).filter(plan.contains)
      // native expressions must stay INSIDE whole-stage codegen — their
      // operator line carries the `*(n)` codegen marker (a
      // CodegenFallback impl would split the stage).
      val codegenBroken = codegenAsserted.get(name).filterNot(expr =>
        plan.linesIterator.exists(l => l.contains(expr) && l.contains("*(")))
      if (missing.isEmpty && present.isEmpty && codegenBroken.isEmpty) println(s"PASS $name")
      else {
        failures += 1
        val cg = codegenBroken.map(e => s" not_codegen=$e").getOrElse("")
        println(s"FAIL $name missing=${missing.mkString("|")} forbidden=${present.mkString("|")}$cg")
      }
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
