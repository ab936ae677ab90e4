package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.vectors.Vectors

/** Similarity-search coverage over the `embeddings` table. The
  * brute-force top-k is the DuckDB-oracled baseline (cosine computed
  * with the identical op order both sides, then rounded to 6 decimals
  * before ranking so a last-ulp wobble cannot flip ranks); the LSH
  * variant is the scale path, recall-tested against brute in specs.
  */
object VectorOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact ANN baseline: brute-force cosine top-3 for 8 queries.
    "q22_cosine_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.bruteTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 3)
        .withColumnRenamed("rank", "rnk")
        .orderBy($"query_id", $"rnk")
    },

    // ---- bitext margin mining (the CCMatrix/LASER alignment law):
    // even vec_ids are side A, odd side B; k=4 neighborhoods, best
    // margin pair per source with the acceptance flag. Shifted-e6
    // integer fixed point end to end (div ≡ // only on nonnegatives).
    "q174_bitext_margin" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.bitextMarginPairs(
          emb.filter($"vec_id" % 2 === 0), emb.filter($"vec_id" % 2 === 1),
          "vec_id", "embedding", k = 4, thresholdE6 = 1020000L)
        .orderBy($"src_id")
    },

    // ---- bucketed bitext margin (q174's candidate-bounded scale
    // path): the same margin law over hyperplane-bucket candidates —
    // pairs AND neighborhoods come only from the shared-bucket hash
    // join (3 planes → 8 buckets at this SF), never a cross score.
    "q176_bitext_lsh_margin" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.bitextMarginPairsBucketed(
          emb.filter($"vec_id" % 2 === 0), emb.filter($"vec_id" % 2 === 1),
          "vec_id", "embedding", k = 4, thresholdE6 = 1020000L,
          planes = 3, dim = 64)
        .orderBy($"src_id")
    },

    // ---- LSH-bucketed ANN (oracled: the hyperplane constants are
    // embedded into the DuckDB SQL from the same seeded array; recall
    // vs q22 additionally asserted in VectorsSpec).
    "q23_lsh_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.lshTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
        k = 3, planes = 4, dim = 64)
        .withColumnRenamed("rank", "rnk")
        .orderBy($"query_id", $"rnk")
    },

    // ---- NN-Descent k-NN graph: every vector's top-3 neighbors after
    // seeding from 3 independent LSH tables + 2 co-neighbor refinement
    // rounds (the HNSW-flavored third scale path; oracled by unrolling
    // the rounds as CTEs with the same constants).
    "q58_knn_graph" -> { (s, dir) =>
      import s.implicits._
      Vectors.knnGraph(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, planes = KnnPlanes, dim = 64, rounds = 2, tables = KnnTables)
        .withColumnRenamed("rank", "rnk")
        .orderBy($"query_id", $"rnk")
    },

    // ---- embedding-cosine near-dup pairs (oracled like q23).
    // The synthetic embeddings are near-orthogonal (max pairwise cosine
    // ≈ 0.51), so the demo threshold is 0.4; production near-dup
    // thresholds (0.9+) plug into the same operator. The AUTO variant:
    // plane count derives from the corpus size (bucket count ∝ N — a
    // fixed plane count is quadratic in N within buckets) and two
    // independent tables union their candidates; the oracle computes
    // the identical plane count from COUNT(*) and masks the same
    // seeded hyperplane ladder.
    "q24_embedding_near_dup" -> { (s, dir) =>
      import s.implicits._
      graft.textops.NearDup.embeddingPairsAuto(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4)
        .orderBy($"id_a", $"id_b")
    },

    // ---- hard-negative mining: each query's top-3 most-similar
    // vectors with a DIFFERENT label (contrastive-training negatives),
    // through the same oracled LSH bucket join as q23.
    "q72_hard_negatives" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.hardNegatives(emb, emb.filter($"vec_id" < 8),
        "vec_id", "embedding", "label", k = 3, planes = 4, dim = 64)
        .withColumnRenamed("rank", "rnk")
        .orderBy($"query_id", $"rnk")
    },

    // ---- MMR diversity selection: greedy top-5 balancing relevance to
    // a fixed seeded anchor against redundancy with the already-picked
    // set (oracled by unrolling the 5 rounds as CTEs, the q58
    // precedent).
    "q74_mmr_select" -> { (s, dir) =>
      import s.implicits._
      Vectors.mmrSelect(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        MmrAnchor, lambda = MmrLambda, k = MmrK)
        .orderBy($"rnk")
    },

    // ---- SemDeDup semantic dedup: centroid assignment (demo codebook
    // = the first 8 vectors by id — production feeds kmeansFit/kmeans‖
    // output through the same signature) + the paper's greedy
    // keep-lowest-centroid-sim sweep at the q24 threshold. Oracled:
    // assignment argmax, sweep rank, and the exists-earlier-neighbor
    // predicate all mirror as window + join SQL.
    "q78_semantic_dedup" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.semanticDedup(emb, "vec_id", "embedding",
        emb.filter($"vec_id" < SemCentroids), "vec_id", "embedding",
        threshold = SemThreshold, maxCellSize = SemMaxCell)
        .withColumnRenamed("id", "vec_id")
        .orderBy($"vec_id")
    },

    // ---- kmeans‖ codebook END-TO-END: the distributed fit
    // (Bahmani et al. VLDB 2012 — seed by smallest salted hash, two
    // md5-affine admission rounds, candidates weighted by nearest
    // assignment, the K heaviest as centers; lloydIters=0 keeps every
    // center a RAW data vector, so the oracle needs no cross-engine
    // float averaging) feeding the q78 sweep. The oracle unrolls the
    // admission rounds as CTEs with the identical hash draws and the
    // identical sequential elementwise d² (DuckDB's list_sum over
    // list_transform reproduces the JVM loop bit-for-bit — verified
    // empirically). The one inexact channel is the per-round total
    // cost (an order-dependent double sum on both engines): an
    // admission flips only if a row's 60-bit uniform lands within an
    // ulp of its threshold — measure-zero, the operator's documented
    // caveat.
    "q87_kmeans_codebook" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val centers = Vectors.kmeansParallelFit(emb.select($"vec_id", $"embedding"),
        "vec_id", "embedding", k = KmK, rounds = KmRounds,
        oversample = KmOversample, seed = 42, lloydIters = 0)
      Vectors.semanticDedup(emb, "vec_id", "embedding",
          Vectors.centroidsDF(s, centers), "cid", "cv",
          threshold = SemThreshold, maxCellSize = SemMaxCell)
        .withColumnRenamed("id", "vec_id")
        .orderBy($"vec_id")
    },

    // ---- cluster-balanced subsample: argmax-centroid assignment (the
    // q78 mirror) + up-to-k per cell by salted md5 rank (the q32
    // mirror) — semantic-topic balancing for a training mix.
    "q90_cluster_balanced_sample" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.clusterBalancedSample(emb, "vec_id", "embedding",
        emb.filter($"vec_id" < SemCentroids), "vec_id", "embedding",
        k = CbsK, salt = CbsSalt)
        .withColumnRenamed("id", "vec_id")
        .orderBy($"cell", $"rk")
    },

    // ---- int8 scalar-quantized ANN (FAISS SQ8 shape): per-dimension
    // affine codes over L2-normalized vectors under corpus [min, max]
    // stats, candidates ranked by the INT64 squared-L2 code distance
    // (offsets cancel in the difference; monotone with cosine on unit
    // vectors) — the whole gate is integer-exact (no float rounding
    // channel anywhere in the ranking). 4× memory cut; at scale the
    // same codes feed the bucketed LSH/IVF joins unchanged. Recall vs
    // the float brute baseline pinned in VectorsSpec.
    "q92_sq8_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.sqTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
          k = 3, dim = 64)
        .orderBy($"query_id", $"rnk")
    },

    // ---- embedding-space contamination screen: max round-6 cosine vs
    // a benchmark embedding subset (every 61st vector), nearest bench
    // id via the q78 argmax tiebreak, flag at the q24 threshold — the
    // semantic complement of q85's n-gram contamination score (catches
    // paraphrased benchmark leakage token overlap misses). Broadcast
    // bench + partial max_by: the corpus shuffles only by its own id.
    "q93_semantic_contamination" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.semanticContamination(emb, "vec_id", "embedding",
          emb.filter($"vec_id" % ContamBenchMod === ContamBenchRem),
          "vec_id", "embedding", threshold = SemThreshold)
        .withColumnRenamed("id", "vec_id")
        .orderBy($"vec_id")
    },

    // ---- cluster-aware TOKEN budgets (round-6 operator, now gated):
    // q78's argmax cell assignment feeding q37's per-stratum
    // token-budget window — each semantic TOPIC's token mass capped in
    // salted-md5 order. Documents join their embeddings by id (the
    // honest equi-join at scale), the codebook broadcasts, cells 4-7
    // are unbudgeted (membership filter exercised).
    "q96_cluster_budget_mix" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val docs = graft.queries.TextOps.docsParallel(s, dir)
        .select($"doc_id", $"text")
        .join(emb.select($"vec_id".as("doc_id"), $"embedding"), Seq("doc_id"))
      Vectors.clusterBudgetMix(docs, "doc_id", "text", "embedding",
          emb.filter($"vec_id" < SemCentroids), "vec_id", "embedding",
          budgets = CbmBudgets, salt = CbmSalt)
        .orderBy($"cell", $"cum_tokens")
    },

    // ---- HNSW-style layered graph ANN: deterministic md5 level draw
    // (layer j ⇔ hash60 ≡ 0 mod fanout^j), per-layer LSH-seeded
    // top-degree NSW graphs, beam descent with exact re-scoring.
    // Oracled by unrolling the layers as CTEs (the q58 precedent);
    // recall additionally pinned vs brute in HnswSpec.
    "q88_hnsw_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.hnswTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
        k = HnswK, dim = 64, beam = HnswBeam, degree = HnswDegree,
        layers = HnswLayers, fanout = HnswFanout,
        tables = HnswTables, hops = HnswHops)
        .orderBy($"query_id", $"rnk")
    },

    // ---- q92's SQ8 with the signed-Hadamard rotation (H·D/√dim, the
    // OPQ-lite pre-transform) applied to the unit vectors before
    // quantization: variance spreads evenly across dimensions so each
    // uint8 slot's 256 levels are spent where the data is. Rotation is
    // orthogonal — code-space L2 still tracks cosine — and every
    // butterfly element is one add/subtract of identical doubles, so
    // the gate stays integer-exact end to end (the oracle unrolls the
    // 6 rounds as CTEs).
    "q97_rotated_sq8_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.rotatedSqTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
          k = 3, dim = SqDim)
        .orderBy($"query_id", $"rnk")
    },

    // ---- binary (1-bit) quantized ANN: per-dimension sign bits packed
    // into 32-bit words, candidates ranked by popcount-of-xor Hamming
    // distance — the 32×-memory shortlist stage ahead of an exact
    // re-rank. Pure integer ranking (no float channel at all); the
    // oracle states the ground truth independently as the
    // per-dimension sign-disagreement count, which the packed popcount
    // must equal.
    "q99_binary_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.binaryTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
          k = 3, dim = SqDim)
        .orderBy($"query_id", $"rnk")
    },

    // ---- Matryoshka two-stage retrieval: cosine shortlist over the
    // first 16 dimensions only (4× less vector IO — the corpus side
    // of stage 1 never carries the full vector), exact 64-dim re-rank
    // of the 12-deep shortlist. Both stages (round-6 cosine desc, id
    // asc); srnk in the output makes the re-rank's effect auditable.
    "q100_matryoshka_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.matryoshkaTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
          k = 3, dimPrefix = MatPrefix, shortlist = MatShortlist)
        .orderBy($"query_id", $"rnk")
    },

    // ---- IVF-SQ8 gated end-to-end (FAISS "IVF,SQ8"): the q78 fixture
    // codebook (vec_id < 8) assigns cells by argmin L2, queries probe
    // their top-3 cells, and the candidates inside probed cells rank
    // by the q92 INT64 code distance under GLOBAL corpus stats — cell
    // pruning composed with integer-exact quantized ranking, every
    // stage mirrored (assignment via the q87 argmin discipline,
    // quantization via the q92 CTEs).
    "q101_ivf_sq8_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val centers = emb.filter($"vec_id" < 8).orderBy($"vec_id")
        .select($"embedding".cast("array<double>"))
        .as[Seq[Double]].collect().map(_.toArray)
      Vectors.ivfSqTopKWith(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
          k = 3, dim = SqDim, centers, nProbe = IvfSqProbe)
        .orderBy($"query_id", $"rnk")
    },

    // ---- plain PQ gated end-to-end (the last un-oracled ANN member):
    // q101's fixture-codebook recipe applied to product quantization —
    // centroids are the vec_id < 4 vectors quantized UNDER CORPUS
    // STATS (the q92 CTEs), corpus codes are per-subspace INT64 argmin
    // with the (d2 ASC, cid ASC) tie discipline, and candidates rank
    // by the symmetric-ADC sum of the query's per-(subspace, centroid)
    // block distances — every stage integer-exact, zero float channel.
    "q180_pq_adc_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val centers = emb.filter($"vec_id" < 4).orderBy($"vec_id")
        .select($"embedding".cast("array<double>"))
        .as[Seq[Double]].collect().map(_.toArray)
      Vectors.pqAdcTopKWith(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
          k = 3, dim = SqDim, m = PqM, centers)
        .orderBy($"query_id", $"rnk")
    },

    // ---- IVF-PQ gated end-to-end (the production ANN composition,
    // now oracled whole): q101's fixture coarse quantizer (vec_id < 8
    // cells, argmin float L2 with the (d2 ASC, cid ASC) ties, 3-cell
    // probes) prunes candidates, q180's integer PQ-ADC (vec_id < 4
    // codebook under corpus stats) ranks them — the equi join on the
    // cell id composed with m INT64 table lookups.
    "q181_ivf_pq_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val cells = emb.filter($"vec_id" < 8).orderBy($"vec_id")
        .select($"embedding".cast("array<double>"))
        .as[Seq[Double]].collect().map(_.toArray)
      val pqCenters = emb.filter($"vec_id" < 4).orderBy($"vec_id")
        .select($"embedding".cast("array<double>"))
        .as[Seq[Double]].collect().map(_.toArray)
      Vectors.ivfPqAdcTopKWith(emb, emb.filter($"vec_id" < 8), "vec_id",
          "embedding", k = 3, dim = SqDim, m = PqM, cells, pqCenters,
          nProbe = IvfSqProbe)
        .orderBy($"query_id", $"rnk")
    },

    // ---- the coarse-to-fine retrieval CASCADE: binary Hamming
    // shortlist (24) → SQ8 integer re-rank (8) → exact float cosine
    // top-3. Per-candidate cost rises ~30× per stage while candidates
    // fall — the cascaded-retrieval economics in one gate. Each
    // stage's mirror is its own gate's oracle (q99 → q92 → q22),
    // composed as three k-filtered window ranks.
    "q102_cascade_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.cascadeTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
          k = 3, dim = SqDim, mBinary = CascBin, mSq = CascSq)
        .orderBy($"query_id", $"rnk")
    },

    // ---- the learned-rotation path's DETERMINISTIC CORE, gated: the
    // fixed-point (round(x·2^20)) per-dimension moments pcaRotationFit
    // accumulates (spec-pinned identical to its internal BigInt sums),
    // the derived variances, and the pcaRank explained-variance
    // selector at 95% — the driver-green row the Jacobi eigensolve
    // (data-dependent, spec-only) builds on.
    "q106_pca_variance_rank" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.pcaVarianceRank(emb, "embedding", SqDim, fracTwentieths = 19)
        .orderBy($"d")
    },

    // ---- the Jacobi eigensolve's FIRST FIXED SWEEP, gated (the q106
    // follow-through): 28 two-sided 2×2 rotations in cyclic order over
    // the d=8 fixed-point covariance — the identical rotation sequence
    // pcaRotationFit runs (shared jacobiSweeps), mirrored into one
    // generated unrolled DuckDB expression chain with the same IEEE op
    // order (column half-step, then row + V half-step reading the
    // column-updated state). Cells quantized at 6 digits and
    // -0.0-normalized on both engines.
    "q143_jacobi_first_sweep" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.jacobiFirstSweep(emb, "embedding", JacobiDim)
        .orderBy($"i", $"j")
    },

    // ---- OPQ subspace allocation, gated (q143's companion — the
    // last spec-only piece of the learned-rotation prep): exact
    // integer variance numerators ranked, then the greedy
    // balanced-product assignment unrolled in the oracle step by step
    // — every emitted column an exact integer.
    "q151_opq_allocation" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.opqAllocationRank(emb, "embedding", JacobiDim, OpqM)
        .orderBy($"rnk")
    },

    // ---- the MULTI-sweep Jacobi eigensolve, gated (r9 VERDICT #5 —
    // q143 gates the first sweep; this runs TWO full cyclic sweeps,
    // 56 rotations, through the shared jacobiSweeps loop and the
    // oracle's doubled unroll). At d=8 two cyclic sweeps drive the
    // off-diagonal mass down ~10³× (spec-pinned in VectorsSpec) — the
    // convergent eigensolve, not just its opening move. Emission is
    // scaled-integer e6 (floor(x·10⁶+0.5) both engines): no rounded
    // doubles in new gates (the r9 ROUND-portability lesson).
    "q159_jacobi_two_sweeps" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.jacobiSweepTable(emb, "embedding", JacobiDim, sweeps = 2)
        .orderBy($"i", $"j")
    }
  )

  /** q151: subspaces the d=8 spectrum allocates into (sub = 4 dims
    * each) — the oracle's greedy unroll is generated for exactly this
    * m.
    */
  private val OpqM = 2

  /** q143: first-sweep gate dimension — 8 keeps the unrolled oracle's
    * 3-CTE-per-rotation chain (28 rotations) generated, not hand-held.
    */
  private val JacobiDim = 8

  /** Generates the q143 oracle: the exact-integer moment aggregate
    * (q106's quantization), the covariance pivot, then per rotation
    * (p,q) in cyclic order three chained CTEs — phi (with the 1e-14
    * skip guard; phi = 0 makes the update an exact IEEE identity),
    * c/s, the column half-step, and the row + V half-step — each cell
    * expression written in the same order [[Vectors.jacobiSweeps]]
    * computes it.
    */
  /** Generates the q151 oracle: the q106/q143 exact-moment CTE
    * restricted to `dim` axes, the integer variance numerators ranked
    * (ivar DESC, d ASC), then [[graft.vectors.Vectors.opqAssignByProduct]]'s
    * greedy unrolled — per rank one (choose, update) CTE pair over
    * running double products `pa`/`pb` (every multiply a single
    * correctly-rounded IEEE op, same order as the Scala loop) and
    * integer slot counters with the capacity guard and first-on-tie
    * argmin. m = 2 only (the gate's configuration).
    */
  private def opqAllocOracleSql(dim: Int, m: Int): String = {
    require(m == 2, "oracle unroll is generated for m = 2")
    val sub = dim / m
    val wCols = (1 to dim).map(k =>
      s"MAX(CASE WHEN rnk = $k THEN CAST(ivar AS DOUBLE) END) AS w$k")
      .mkString(", ")
    val steps = (1 to dim).map { k =>
      val pk = k - 1
      s"""s$k AS (
         |  SELECT *, CASE WHEN na$pk >= $sub THEN 1
         |                 WHEN nb$pk >= $sub THEN 0
         |                 WHEN pb$pk < pa$pk THEN 1 ELSE 0 END AS a$k
         |  FROM t$pk),
         |t$k AS (
         |  SELECT *,
         |    CASE WHEN a$k = 0 THEN pa$pk * w$k ELSE pa$pk END AS pa$k,
         |    CASE WHEN a$k = 1 THEN pb$pk * w$k ELSE pb$pk END AS pb$k,
         |    na$pk + CASE WHEN a$k = 0 THEN 1 ELSE 0 END AS na$k,
         |    nb$pk + CASE WHEN a$k = 1 THEN 1 ELSE 0 END AS nb$k
         |  FROM s$k)""".stripMargin
    }.mkString(",\n")
    val alloc = (1 to dim).map(k =>
      s"SELECT $k AS rnk, a$k AS subspace FROM t$dim")
      .mkString(" UNION ALL ")
    s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (
       |  SELECT i - 1 AS d, CAST(floor(v[i] * 1048576.0 + 0.5) AS BIGINT) AS qv
       |  FROM e, unnest(generate_series(1, $dim)) t(i)),
       |mo AS (SELECT d, COUNT(*) AS n, SUM(qv) AS s, SUM(qv * qv) AS p FROM q GROUP BY d),
       |vv AS (SELECT d, p * n - s * s AS ivar FROM mo),
       |r AS (SELECT d, ivar, ROW_NUMBER() OVER (ORDER BY ivar DESC, d ASC) AS rnk FROM vv),
       |w AS (SELECT $wCols FROM r),
       |t0 AS (SELECT *, 1.0 AS pa0, 1.0 AS pb0, 0 AS na0, 0 AS nb0 FROM w),
       |$steps,
       |alloc AS ($alloc)
       |SELECT r.rnk, r.d, CAST(r.ivar AS VARCHAR) AS ivar, alloc.subspace
       |FROM r JOIN alloc ON r.rnk = alloc.rnk ORDER BY r.rnk""".stripMargin
  }

  /** Generates the q143/q159 oracle: `sweeps` full cyclic sweeps
    * unrolled — 3 chained CTEs per rotation in the engine's exact
    * IEEE op order. Emission: q143 keeps its original `round(x,6)`
    * doubles (green across driver rounds); q159 emits scaled-integer
    * e6 columns (`e6 = true`) — `floor(x·10⁶ + 0.5)` on both engines,
    * because `ROUND(DOUBLE, n)` itself proved DuckDB-version-
    * dependent (the r9 q89 lesson) and new gates emit no rounded
    * doubles.
    */
  private def jacobiSweepOracleSql(dim: Int, sweeps: Int = 1,
      e6: Boolean = false): String = {
    def aN(i: Int, j: Int) = s"a_${i}_$j"
    def vN(i: Int, j: Int) = s"v_${i}_$j"
    val cells = for { i <- 0 until dim; j <- 0 until dim } yield (i, j)
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qv AS (
         |  SELECT vec_id, i - 1 AS d, CAST(floor(v[i] * 1048576.0 + 0.5) AS BIGINT) AS q
         |  FROM e, unnest(generate_series(1, $dim)) t(i)),
         |pp AS (
         |  SELECT a.d AS i, b.d AS j, SUM(a.q * b.q) AS p
         |  FROM qv a JOIN qv b USING (vec_id) GROUP BY 1, 2),
         |sm AS (SELECT d AS i, SUM(q) AS s, COUNT(*) AS n FROM qv GROUP BY 1),
         |mn AS (SELECT i, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0 AS mu, n FROM sm),
         |cc0 AS (
         |  SELECT pp.i, pp.j,
         |         CAST(pp.p AS DOUBLE) / CAST(mi.n AS DOUBLE) / 1099511627776.0 - mi.mu * mj.mu AS cov
         |  FROM pp JOIN mn mi ON mi.i = pp.i JOIN mn mj ON mj.i = pp.j),
         |f0 AS (SELECT
         |""".stripMargin)
    val covCells = cells.map { case (i, j) =>
      s"  MAX(CASE WHEN i = $i AND j = $j THEN cov END) AS ${aN(i, j)}"
    }
    val vInit = cells.map { case (i, j) =>
      s"  CAST(${if (i == j) "1.0" else "0.0"} AS DOUBLE) AS ${vN(i, j)}"
    }
    sb.append((covCells ++ vInit).mkString(",\n")).append("\n  FROM cc0)")
    var r = 0
    for (_ <- 0 until sweeps; p <- 0 until dim - 1; q <- p + 1 until dim) {
      r += 1
      sb.append(s""",
        |g$r AS (SELECT *, CASE WHEN abs(${aN(p, q)}) > 1e-14
        |  THEN 0.5 * atan2(2.0 * ${aN(p, q)}, ${aN(q, q)} - ${aN(p, p)})
        |  ELSE 0.0 END AS phi FROM f${r - 1})""".stripMargin)
      sb.append(s""",
        |gg$r AS (SELECT *, cos(phi) AS c_r, sin(phi) AS s_r FROM g$r)""".stripMargin)
      val half1 = cells.map { case (i, j) =>
        if (j == p) s"c_r * ${aN(i, p)} - s_r * ${aN(i, q)} AS ${aN(i, p)}"
        else if (j == q) s"s_r * ${aN(i, p)} + c_r * ${aN(i, q)} AS ${aN(i, q)}"
        else aN(i, j)
      } ++ cells.map { case (i, j) => vN(i, j) } ++ Seq("c_r", "s_r")
      sb.append(s",\nh$r AS (SELECT ${half1.mkString(", ")} FROM gg$r)")
      val half2 = cells.map { case (i, j) =>
        if (i == p) s"c_r * ${aN(p, j)} - s_r * ${aN(q, j)} AS ${aN(p, j)}"
        else if (i == q) s"s_r * ${aN(p, j)} + c_r * ${aN(q, j)} AS ${aN(q, j)}"
        else aN(i, j)
      } ++ cells.map { case (i, j) =>
        if (j == p) s"c_r * ${vN(i, p)} - s_r * ${vN(i, q)} AS ${vN(i, p)}"
        else if (j == q) s"s_r * ${vN(i, p)} + c_r * ${vN(i, q)} AS ${vN(i, q)}"
        else vN(i, j)
      }
      sb.append(s",\nf$r AS (SELECT ${half2.mkString(", ")} FROM h$r)")
    }
    val rows = cells.map { case (i, j) =>
      if (e6)
        s"SELECT $i AS i, $j AS j, " +
          s"CAST(floor(${aN(i, j)} * 1000000.0 + 0.5) AS BIGINT) AS a_e6, " +
          s"CAST(floor(${vN(i, j)} * 1000000.0 + 0.5) AS BIGINT) AS v_e6 FROM f$r"
      else
        s"SELECT $i AS i, $j AS j, round(${aN(i, j)}, 6) + 0.0 AS a, " +
          s"round(${vN(i, j)}, 6) + 0.0 AS v FROM f$r"
    }
    sb.append("\n").append(rows.mkString("\nUNION ALL\n"))
    sb.toString
  }

  /** q101: queries probe 3 of the 8 fixture cells. */
  private val IvfSqProbe = 3

  /** q180: 8 subspaces of width 8 over the 64-dim table; the fixture
    * codebook is the vec_id < 4 vectors (ksub = 4).
    */
  private val PqM = 8

  /** q102 cascade widths: 24 binary survivors → 8 SQ8 survivors → 3. */
  private val CascBin = 24
  private val CascSq = 8

  /** q100 constants: 64→16 prefix (the MRL 4× truncation), 12-deep
    * shortlist re-ranked to 3.
    */
  private val MatPrefix = 16
  private val MatShortlist = 12

  /** q90 constants: q78's codebook, 20 per cell, fixed salt. */
  private val CbsK = 20
  private val CbsSalt = "cbs"

  /** q92's quantization width (the embeddings table dimension). */
  private val SqDim = 64

  /** q96 constants: budgets for cells 0-3 only (4-7 unbudgeted — the
    * membership filter is exercised), salt mirrored into the oracle.
    */
  private val CbmSalt = "cbm"
  private val CbmBudgets: Map[String, Long] =
    Map("0" -> 1200L, "1" -> 800L, "2" -> 800L, "3" -> 1200L)

  /** q93's benchmark selector: every 61st vector (≈ N/61 rows — bench
    * members themselves stay in the corpus, so verbatim leakage scores
    * max_sim = 1.0 and the flag=1 path is always exercised).
    */
  private val ContamBenchMod = 61
  private val ContamBenchRem = 3

  /** q88 constants = the operator defaults (HNSW practice: M = 16
    * out-edges, ef = 16 ≥ k): 3 layers at fanout 8 (top layer ≈ N/64 —
    * entry stays broadcast-sized), 2 independent tables per layer
    * graph with the bucket ladder SIZED TO EACH LAYER'S membership
    * (autoPlanes — the oracle mirrors it with a per-layer COUNT(*)
    * CTE and the q24 masked ladder), 2 hops per layer. Recall@3 =
    * 1.00 vs brute at sf0.001 (HnswSpec's sweep: degree is the
    * lever — 4 → 0.58).
    */
  private val HnswK = 3
  private val HnswBeam = 16
  private val HnswDegree = 16
  private val HnswLayers = 3
  private val HnswFanout = 8L
  private val HnswTables = 2
  private val HnswHops = 2

  /** q78 constants: codebook = first 8 ids (mirrored as `vec_id < 8`),
    * threshold from q24 (the synthetic embeddings are near-orthogonal;
    * production near-dup thresholds (0.9+) plug in unchanged).
    */
  private val SemCentroids = 8
  private val SemThreshold = 0.4

  /** semanticDedup's oversized-cell cap, passed EXPLICITLY by every
    * gate query and interpolated into the oracle SQL's sub-cell mirror
    * — a default drift would otherwise silently desync the engines.
    */
  private val SemMaxCell = 4096L

  /** q87 constants: fit geometry mirrored into the oracle's unrolled
    * admission rounds. lloydIters=0 (centers stay raw data vectors —
    * no cross-engine float averaging); expected candidates ≈
    * 1 + rounds·oversample ≈ 17 ≫ k, so the heaviest-K path (not the
    * pad path) is the one exercised.
    */
  private val KmK = 4
  private val KmRounds = 2
  private val KmOversample = 8.0

  /** q74 constants — the anchor is one seeded hyperplane row (embedded
    * literally in the oracle; `Double.toString` round-trips exactly).
    */
  private val MmrAnchor: Array[Double] = Vectors.hyperplanes(1, 64, seed = 7).head
  private val MmrLambda = 0.5
  private val MmrK = 5

  /** q58 constants: 3 independent tables of 3-plane buckets measured
    * best on the near-orthogonal synthetic embeddings (recall@3 0.60 at
    * sf0.001 vs 0.26 for one 4-plane table; see VectorsSpec).
    */
  private val KnnTables = 3
  private val KnnPlanes = 3

  /** Hyperplane-bucket expression over a DOUBLE[] column `v`, generated
    * from [[Vectors.hyperplanes]] — the SAME constants the Spark side
    * buckets with (Double.toString round-trips exactly, and only the
    * dot-product SIGN feeds the bucket, so engine agreement is robust).
    * Defaults must match q23's queries entry (planes=4, dim=64);
    * q58 passes its own planes and per-table seeds; q24 uses the
    * masked data-dependent form below.
    */
  /** The q174/q176 shared margin chain over a `scored (src_id,
    * tgt_id, sim_e6)` CTE — the engine's `marginFromScored` mirrored
    * once (k = 4, threshold 1 020 000, e6-shifted integers).
    */
  private val BitextChainSql: String =
    """
      |r AS (
      |  SELECT src_id, tgt_id, sim_e6,
      |    ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY sim_e6 DESC, tgt_id ASC) AS rx,
      |    ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY sim_e6 DESC, src_id ASC) AS ry
      |  FROM scored),
      |m AS (
      |  SELECT src_id, tgt_id, sim_e6,
      |    CAST(SUM(CASE WHEN rx <= 4 THEN sim_e6 ELSE 0 END) OVER (PARTITION BY src_id) AS BIGINT) AS sa,
      |    CAST(SUM(CASE WHEN ry <= 4 THEN sim_e6 ELSE 0 END) OVER (PARTITION BY tgt_id) AS BIGINT) AS sb,
      |    least(CAST(COUNT(*) OVER (PARTITION BY src_id) AS BIGINT), 4) AS na,
      |    least(CAST(COUNT(*) OVER (PARTITION BY tgt_id) AS BIGINT), 4) AS nb
      |  FROM r),
      |g AS (
      |  SELECT src_id, tgt_id, sim_e6,
      |    CAST((2 * sim_e6 * 1000000) // greatest(sa // na + sb // nb, 1) AS BIGINT) AS margin_e6
      |  FROM m),
      |best AS (
      |  SELECT src_id, tgt_id, sim_e6, margin_e6,
      |    ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY margin_e6 DESC, tgt_id ASC) AS rb
      |  FROM g)
      |SELECT src_id, tgt_id, sim_e6, margin_e6,
      |       CASE WHEN margin_e6 >= 1020000 THEN 1 ELSE 0 END AS accepted
      |FROM best WHERE rb = 1
      |ORDER BY src_id""".stripMargin

  private def bucketSql(v: String, planes: Int = 4, dim: Int = 64, seed: Int = 42): String =
    Vectors.hyperplanes(planes, dim, seed).zipWithIndex.map { case (plane, p) =>
      s"(CASE WHEN list_dot_product($v, [${plane.mkString(", ")}]) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** q24's data-dependent twin of [[bucketSql]]: emits the full
    * `maxPlanes` hyperplane ladder (prefix-stable — `Vectors.hyperplanes`
    * draws rows sequentially from one seeded stream, so plane p is the
    * same array for any total count) with each bit MASKED by
    * `p < nplanes`, where `nplanes` comes from a COUNT(*) CTE via the
    * same integer formula as `NearDup.autoPlanes`.
    */
  private def maskedBucketSql(v: String, maxPlanes: Int, dim: Int, seed: Int): String =
    Vectors.hyperplanes(maxPlanes, dim, seed).zipWithIndex.map { case (plane, p) =>
      s"(CASE WHEN $p < nplanes AND list_dot_product($v, [${plane.mkString(", ")}]) >= 0" +
        s" THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** `NearDup.autoPlanes` in DuckDB: ceil(log2(N/target)) as integer
    * bit arithmetic — `len(bin(q))` is 1 for q=0 ('0') and the bit
    * length otherwise, exactly `64 - numberOfLeadingZeros` — clamped
    * the same way (LEAST outside GREATEST).
    */
  private def autoPlanesSql(nExpr: String): String =
    s"LEAST(${graft.textops.NearDup.EmbedMaxPlanes}, " +
      s"GREATEST(${graft.textops.NearDup.EmbedMinPlanes}, " +
      s"len(bin((GREATEST($nExpr, 1) - 1) // ${graft.textops.NearDup.EmbedTargetBucket}))))"

  val oracle: Map[String, String] = Map(
    // SQ8 mirror: the identical L2 normalization (one IEEE division
    // per element), per-dim min/max CTE collected into ordered lists
    // (the Spark side's driver-collected stats array), the identical
    // (x − mn) * 255.0 / span affine in the identical op order (three
    // IEEE double ops → bit-identical pre-round value; round-half-up
    // agrees on positives), then pure INT64 squared code distances.
    "q92_sq8_topk" ->
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |e AS (
        |  SELECT vec_id,
        |         CASE WHEN sqrt(list_dot_product(v, v)) = 0
        |              THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
        |         END AS v
        |  FROM e0),
        |st AS (
        |  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
        |  FROM e, unnest(generate_series(1, $SqDim)) t(i)
        |  GROUP BY i),
        |stats AS (
        |  SELECT list(mn ORDER BY i) AS mns, list(mx - mn ORDER BY i) AS spans
        |  FROM st),
        |qz AS (
        |  SELECT vec_id,
        |         list_transform(generate_series(1, $SqDim), i ->
        |           CASE WHEN spans[i] = 0 THEN 0
        |                ELSE CAST(LEAST(GREATEST(
        |                       round((v[i] - mns[i]) * 255.0 / spans[i]), 0.0), 255.0)
        |                     AS BIGINT) END) AS q
        |  FROM e, stats),
        |qq AS (SELECT vec_id AS query_id, q AS qv FROM qz WHERE vec_id < 8),
        |sc AS (
        |  SELECT query_id, z.vec_id AS neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, $SqDim),
        |                i -> (qv[i] - z.q[i]) * (qv[i] - z.q[i]))) AS BIGINT) AS qdist
        |  FROM qq, qz z WHERE z.vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, qdist,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY qdist ASC, neighbor_id ASC) AS rnk
        |  FROM sc)
        |SELECT query_id, rnk, neighbor_id, qdist FROM ranked WHERE rnk <= 3""".stripMargin,

    // q92's mirror with the signed-Hadamard rotation unrolled between
    // normalization and quantization: the md5-parity sign diagonal,
    // six butterfly CTEs (b = 1..32; each element ONE add or subtract
    // of identical doubles), the exact /√64 scale — then the identical
    // integer-exact SQ8 pipeline over the rotated vectors.
    "q97_rotated_sq8_topk" -> {
      val sign =
        s"""r0 AS (
          |  SELECT vec_id, list_transform(generate_series(1, $SqDim), i ->
          |    v[i] * (CASE WHEN CAST(('0x' || substr(md5('rot42:' || CAST(i-1 AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
          |                 THEN 1.0 ELSE -1.0 END)) AS v
          |  FROM e),""".stripMargin
      val rounds = Seq(1, 2, 4, 8, 16, 32).zipWithIndex.map { case (b, ix) =>
        val mask = (SqDim - 1) ^ b
        s"""r${ix + 1} AS (
          |  SELECT vec_id, list_transform(generate_series(1, $SqDim), i ->
          |    CASE WHEN ((i-1) & $b) = 0
          |         THEN v[((i-1) & $mask)+1] + v[((i-1) | $b)+1]
          |         ELSE v[((i-1) & $mask)+1] - v[((i-1) | $b)+1] END) AS v
          |  FROM r$ix),""".stripMargin
      }.mkString("\n")
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |e AS (
        |  SELECT vec_id,
        |         CASE WHEN sqrt(list_dot_product(v, v)) = 0
        |              THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
        |         END AS v
        |  FROM e0),
        |$sign
        |$rounds
        |er AS (
        |  SELECT vec_id, list_transform(v, x -> x / sqrt(${SqDim}.0)) AS v
        |  FROM r6),
        |st AS (
        |  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
        |  FROM er, unnest(generate_series(1, $SqDim)) t(i)
        |  GROUP BY i),
        |stats AS (
        |  SELECT list(mn ORDER BY i) AS mns, list(mx - mn ORDER BY i) AS spans
        |  FROM st),
        |qz AS (
        |  SELECT vec_id,
        |         list_transform(generate_series(1, $SqDim), i ->
        |           CASE WHEN spans[i] = 0 THEN 0
        |                ELSE CAST(LEAST(GREATEST(
        |                       round((v[i] - mns[i]) * 255.0 / spans[i]), 0.0), 255.0)
        |                     AS BIGINT) END) AS q
        |  FROM er, stats),
        |qq AS (SELECT vec_id AS query_id, q AS qv FROM qz WHERE vec_id < 8),
        |sc AS (
        |  SELECT query_id, z.vec_id AS neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, $SqDim),
        |                i -> (qv[i] - z.q[i]) * (qv[i] - z.q[i]))) AS BIGINT) AS qdist
        |  FROM qq, qz z WHERE z.vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, qdist,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY qdist ASC, neighbor_id ASC) AS rnk
        |  FROM sc)
        |SELECT query_id, rnk, neighbor_id, qdist FROM ranked WHERE rnk <= 3""".stripMargin
    },

    // Binary-ANN ground truth stated independently: Hamming distance
    // as the count of dimensions whose SIGNS disagree (provably equal
    // to the engine's popcount over packed 32-bit words), integer
    // throughout, same (distance asc, id asc) rank discipline.
    "q99_binary_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |sc AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, $SqDim), i ->
        |           CASE WHEN (qv[i] > 0) <> (e.v[i] > 0) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        |  FROM q, e WHERE e.vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, hamming,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY hamming ASC, neighbor_id ASC) AS rnk
        |  FROM sc)
        |SELECT query_id, rnk, neighbor_id, hamming FROM ranked WHERE rnk <= 3""".stripMargin,

    // Matryoshka mirror: truncated-prefix cosine (DuckDB list slice is
    // 1-based end-inclusive), shortlist rank, then the full-dimension
    // q22 cosine over the surviving pairs — identical op order and
    // rank discipline in both stages.
    "q100_matryoshka_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |tq AS (SELECT query_id, qv[1:$MatPrefix] AS tqv FROM q),
        |tc AS (SELECT vec_id AS neighbor_id, v[1:$MatPrefix] AS tv FROM e),
        |s1 AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_dot_product(tqv, tv) /
        |               (sqrt(list_dot_product(tqv, tqv)) * sqrt(list_dot_product(tv, tv))), 6) AS short_cos
        |  FROM tq, tc WHERE query_id <> neighbor_id),
        |sh AS (
        |  SELECT query_id, neighbor_id, short_cos,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY short_cos DESC, neighbor_id ASC) AS srnk
        |  FROM s1),
        |cand AS (SELECT query_id, neighbor_id, srnk FROM sh WHERE srnk <= $MatShortlist),
        |rr AS (
        |  SELECT c.query_id, c.neighbor_id, c.srnk,
        |         round(list_dot_product(q.qv, e.v) /
        |               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
        |  FROM cand c
        |  JOIN q ON c.query_id = q.query_id
        |  JOIN e ON c.neighbor_id = e.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, srnk, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        |  FROM rr)
        |SELECT query_id, rnk, neighbor_id, cosine, srnk FROM ranked WHERE rnk <= 3""".stripMargin,

    // IVF-SQ8 mirror: fixture codebook (vec_id < 8, cid = vec_id),
    // argmin-L2 cell assignment with the q87 (dist ASC, cid ASC) tie
    // discipline, top-3 probe cells per query by the same rank, then
    // the q92 unit/stats/quantize CTEs over the FULL corpus and the
    // integer code distance restricted to probed cells.
    "q101_ivf_sq8_topk" ->
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb AS (SELECT vec_id AS cid, v AS cv FROM e0 WHERE vec_id < 8),
        |cd AS (
        |  SELECT e0.vec_id, cb.cid,
        |         list_sum(list_transform(generate_series(1, $SqDim),
        |           i -> (e0.v[i] - cb.cv[i]) * (e0.v[i] - cb.cv[i]))) AS d2
        |  FROM e0, cb),
        |asn AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id
        |                              ORDER BY d2 ASC, cid ASC) AS rn
        |    FROM cd) t WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cid AS cell FROM (
        |    SELECT vec_id, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id
        |                              ORDER BY d2 ASC, cid ASC) AS rn
        |    FROM cd WHERE vec_id < 8) t WHERE rn <= $IvfSqProbe),
        |e AS (
        |  SELECT vec_id,
        |         CASE WHEN sqrt(list_dot_product(v, v)) = 0
        |              THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
        |         END AS v
        |  FROM e0),
        |st AS (
        |  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
        |  FROM e, unnest(generate_series(1, $SqDim)) t(i)
        |  GROUP BY i),
        |stats AS (
        |  SELECT list(mn ORDER BY i) AS mns, list(mx - mn ORDER BY i) AS spans
        |  FROM st),
        |qz AS (
        |  SELECT vec_id,
        |         list_transform(generate_series(1, $SqDim), i ->
        |           CASE WHEN spans[i] = 0 THEN 0
        |                ELSE CAST(LEAST(GREATEST(
        |                       round((v[i] - mns[i]) * 255.0 / spans[i]), 0.0), 255.0)
        |                     AS BIGINT) END) AS q
        |  FROM e, stats),
        |cq AS (SELECT qz.vec_id AS neighbor_id, asn.cell, qz.q AS nq
        |       FROM qz JOIN asn USING (vec_id)),
        |qq AS (SELECT p.query_id, p.cell, qz.q AS qv
        |       FROM probes p JOIN qz ON qz.vec_id = p.query_id),
        |sc AS (
        |  SELECT qq.query_id, cq.neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, $SqDim),
        |                i -> (qq.qv[i] - cq.nq[i]) * (qq.qv[i] - cq.nq[i]))) AS BIGINT) AS qdist
        |  FROM qq JOIN cq USING (cell)
        |  WHERE cq.neighbor_id <> qq.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, qdist,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY qdist ASC, neighbor_id ASC) AS rnk
        |  FROM sc)
        |SELECT query_id, rnk, neighbor_id, qdist FROM ranked WHERE rnk <= 3""".stripMargin,

    // Plain-PQ mirror: the q92 unit/stats/quantize CTEs, centroid codes
    // from qz (vec_id < 4), one `sd` relation holding EVERY
    // (vector, centroid, subspace) INT64 block distance — corpus codes
    // are its per-(vector, subspace) argmin and the query ADC sum
    // re-joins it on the assigned code, so encode and scoring share
    // literally one distance derivation.
    "q180_pq_adc_topk" ->
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |e AS (
        |  SELECT vec_id,
        |         CASE WHEN sqrt(list_dot_product(v, v)) = 0
        |              THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
        |         END AS v
        |  FROM e0),
        |st AS (
        |  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
        |  FROM e, unnest(generate_series(1, $SqDim)) t(i)
        |  GROUP BY i),
        |stats AS (
        |  SELECT list(mn ORDER BY i) AS mns, list(mx - mn ORDER BY i) AS spans
        |  FROM st),
        |qz AS (
        |  SELECT vec_id,
        |         list_transform(generate_series(1, $SqDim), i ->
        |           CASE WHEN spans[i] = 0 THEN 0
        |                ELSE CAST(LEAST(GREATEST(
        |                       round((v[i] - mns[i]) * 255.0 / spans[i]), 0.0), 255.0)
        |                     AS BIGINT) END) AS q
        |  FROM e, stats),
        |cb AS (SELECT vec_id AS cid, q AS cq FROM qz WHERE vec_id < 4),
        |sd AS (
        |  SELECT z.vec_id, cb.cid, j.j,
        |         CAST(list_sum(list_transform(generate_series(1, ${SqDim / PqM}), i ->
        |           (z.q[(j.j-1)*${SqDim / PqM} + i] - cb.cq[(j.j-1)*${SqDim / PqM} + i]) *
        |           (z.q[(j.j-1)*${SqDim / PqM} + i] - cb.cq[(j.j-1)*${SqDim / PqM} + i]))) AS BIGINT) AS d2
        |  FROM qz z, cb, unnest(generate_series(1, $PqM)) j(j)),
        |enc AS (
        |  SELECT vec_id, j, cid AS code FROM (
        |    SELECT vec_id, j, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id, j
        |                              ORDER BY d2 ASC, cid ASC) AS rn
        |    FROM sd) t WHERE rn = 1),
        |adc AS (
        |  SELECT qsd.vec_id AS query_id, enc.vec_id AS neighbor_id,
        |         CAST(SUM(qsd.d2) AS BIGINT) AS adist
        |  FROM enc JOIN sd qsd ON qsd.j = enc.j AND qsd.cid = enc.code
        |  WHERE qsd.vec_id < 8 AND enc.vec_id <> qsd.vec_id
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, neighbor_id, adist,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY adist ASC, neighbor_id ASC) AS rnk
        |  FROM adc)
        |SELECT query_id, rnk, neighbor_id, adist FROM ranked WHERE rnk <= 3""".stripMargin,

    // IVF-PQ mirror: q101's cd/asn/probes CTEs (float cell space) +
    // q180's qz/cb/sd/enc CTEs (integer PQ space); the ADC sum joins
    // through (neighbor cell = a probed cell of the query) — cell
    // membership is unique per neighbor and probes unique per
    // (query, cell), so the join never duplicates a pair.
    "q181_ivf_pq_topk" ->
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cells AS (SELECT vec_id AS ccid, v AS ccv FROM e0 WHERE vec_id < 8),
        |cd AS (
        |  SELECT e0.vec_id, cells.ccid,
        |         list_sum(list_transform(generate_series(1, $SqDim),
        |           i -> (e0.v[i] - cells.ccv[i]) * (e0.v[i] - cells.ccv[i]))) AS d2
        |  FROM e0, cells),
        |asn AS (
        |  SELECT vec_id, ccid AS cell FROM (
        |    SELECT vec_id, ccid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id
        |                              ORDER BY d2 ASC, ccid ASC) AS rn
        |    FROM cd) t WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, ccid AS cell FROM (
        |    SELECT vec_id, ccid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id
        |                              ORDER BY d2 ASC, ccid ASC) AS rn
        |    FROM cd WHERE vec_id < 8) t WHERE rn <= $IvfSqProbe),
        |e AS (
        |  SELECT vec_id,
        |         CASE WHEN sqrt(list_dot_product(v, v)) = 0
        |              THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
        |         END AS v
        |  FROM e0),
        |st AS (
        |  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
        |  FROM e, unnest(generate_series(1, $SqDim)) t(i)
        |  GROUP BY i),
        |stats AS (
        |  SELECT list(mn ORDER BY i) AS mns, list(mx - mn ORDER BY i) AS spans
        |  FROM st),
        |qz AS (
        |  SELECT vec_id,
        |         list_transform(generate_series(1, $SqDim), i ->
        |           CASE WHEN spans[i] = 0 THEN 0
        |                ELSE CAST(LEAST(GREATEST(
        |                       round((v[i] - mns[i]) * 255.0 / spans[i]), 0.0), 255.0)
        |                     AS BIGINT) END) AS q
        |  FROM e, stats),
        |cb AS (SELECT vec_id AS cid, q AS cq FROM qz WHERE vec_id < 4),
        |sd AS (
        |  SELECT z.vec_id, cb.cid, j.j,
        |         CAST(list_sum(list_transform(generate_series(1, ${SqDim / PqM}), i ->
        |           (z.q[(j.j-1)*${SqDim / PqM} + i] - cb.cq[(j.j-1)*${SqDim / PqM} + i]) *
        |           (z.q[(j.j-1)*${SqDim / PqM} + i] - cb.cq[(j.j-1)*${SqDim / PqM} + i]))) AS BIGINT) AS d2
        |  FROM qz z, cb, unnest(generate_series(1, $PqM)) j(j)),
        |enc AS (
        |  SELECT vec_id, j, cid AS code FROM (
        |    SELECT vec_id, j, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id, j
        |                              ORDER BY d2 ASC, cid ASC) AS rn
        |    FROM sd) t WHERE rn = 1),
        |adc AS (
        |  SELECT qsd.vec_id AS query_id, enc.vec_id AS neighbor_id,
        |         CAST(SUM(qsd.d2) AS BIGINT) AS adist
        |  FROM enc
        |  JOIN sd qsd ON qsd.j = enc.j AND qsd.cid = enc.code
        |  JOIN asn ON asn.vec_id = enc.vec_id
        |  JOIN probes p ON p.query_id = qsd.vec_id AND p.cell = asn.cell
        |  WHERE enc.vec_id <> qsd.vec_id
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, neighbor_id, adist,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY adist ASC, neighbor_id ASC) AS rnk
        |  FROM adc)
        |SELECT query_id, rnk, neighbor_id, adist FROM ranked WHERE rnk <= 3""".stripMargin,

    // Cascade mirror: q99's sign-disagreement Hamming rank filtered at
    // 24, q92's quantization CTEs re-ranking the survivors at 8, q22's
    // cosine over the remainder at 3 — three window ranks, each with
    // its stage's (distance, id) tie discipline.
    "q102_cascade_topk" ->
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qv0 AS (SELECT vec_id AS query_id, v AS qv FROM e0 WHERE vec_id < 8),
        |h1 AS (
        |  SELECT query_id, e0.vec_id AS neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, $SqDim), i ->
        |           CASE WHEN (qv[i] > 0) <> (e0.v[i] > 0) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        |  FROM qv0, e0 WHERE e0.vec_id <> query_id),
        |s1 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           ROW_NUMBER() OVER (PARTITION BY query_id
        |                              ORDER BY hamming ASC, neighbor_id ASC) AS rn
        |    FROM h1) t WHERE rn <= $CascBin),
        |e AS (
        |  SELECT vec_id,
        |         CASE WHEN sqrt(list_dot_product(v, v)) = 0
        |              THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
        |         END AS v
        |  FROM e0),
        |st AS (
        |  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
        |  FROM e, unnest(generate_series(1, $SqDim)) t(i)
        |  GROUP BY i),
        |stats AS (
        |  SELECT list(mn ORDER BY i) AS mns, list(mx - mn ORDER BY i) AS spans
        |  FROM st),
        |qz AS (
        |  SELECT vec_id,
        |         list_transform(generate_series(1, $SqDim), i ->
        |           CASE WHEN spans[i] = 0 THEN 0
        |                ELSE CAST(LEAST(GREATEST(
        |                       round((v[i] - mns[i]) * 255.0 / spans[i]), 0.0), 255.0)
        |                     AS BIGINT) END) AS q
        |  FROM e, stats),
        |h2 AS (
        |  SELECT s1.query_id, s1.neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, $SqDim),
        |                i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i]))) AS BIGINT) AS qdist
        |  FROM s1
        |  JOIN qz a ON a.vec_id = s1.query_id
        |  JOIN qz b ON b.vec_id = s1.neighbor_id),
        |s2 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           ROW_NUMBER() OVER (PARTITION BY query_id
        |                              ORDER BY qdist ASC, neighbor_id ASC) AS rn
        |    FROM h2) t WHERE rn <= $CascSq),
        |h3 AS (
        |  SELECT s2.query_id, s2.neighbor_id,
        |         round(list_dot_product(q.qv, c.v) /
        |               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
        |  FROM s2
        |  JOIN qv0 q ON q.query_id = s2.query_id
        |  JOIN e0 c ON c.vec_id = s2.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        |  FROM h3)
        |SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3""".stripMargin,

    // q78's assignment mirror feeding q37's cum-token window mirror:
    // same round-6 argmax, same md5(salt||id) fill order, same BIGINT
    // window-sum cast (the HUGEINT→float64 pandas hazard), budgets as
    // a CASE over the stringified cell.
    "q96_cluster_budget_mix" -> {
      val budgetCase = CbmBudgets.toSeq.sortBy(_._1)
        .map { case (c, b) => s"WHEN '$c' THEN $b" }.mkString(" ")
      val cellList = CbmBudgets.keys.toSeq.sorted.map(c => s"'$c'").mkString(", ")
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT id AS cid, v AS cv FROM e WHERE id < $SemCentroids),
        |s AS (
        |  SELECT id, cid,
        |         round(list_dot_product(v, cv) /
        |               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) AS csim
        |  FROM e, c),
        |a AS (
        |  SELECT id, cid AS cell FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id
        |                                 ORDER BY csim DESC, cid ASC) AS rn
        |    FROM s) WHERE rn = 1),
        |words AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), w -> len(w) > 0) AS ws
        |  FROM documents),
        |toks AS (
        |  SELECT w.doc_id, CAST(a.cell AS VARCHAR) AS cell, len(ws) AS n_tokens
        |  FROM words w JOIN a ON a.id = w.doc_id),
        |cum AS (
        |  SELECT doc_id, cell, n_tokens,
        |         CAST(SUM(n_tokens) OVER (PARTITION BY cell
        |           ORDER BY md5('$CbmSalt' || CAST(doc_id AS VARCHAR)), doc_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM toks)
        |SELECT doc_id, cell, n_tokens, cum_tokens FROM cum
        |WHERE cell IN ($cellList)
        |  AND cum_tokens <= CASE cell $budgetCase ELSE 0 END""".stripMargin
    },

    // q78's assignment mirror (argmax via csim DESC, cid ASC window)
    // with the benchmark as the codebook and a threshold flag.
    "q93_semantic_contamination" ->
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT id AS cid, v AS cv FROM e
        |      WHERE id % $ContamBenchMod = $ContamBenchRem),
        |s AS (
        |  SELECT id, cid,
        |         round(list_dot_product(v, cv) /
        |               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) AS csim
        |  FROM e, c),
        |a AS (
        |  SELECT id, cid, csim FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id
        |                                 ORDER BY csim DESC, cid ASC) AS rn
        |    FROM s) WHERE rn = 1)
        |SELECT id AS vec_id, cid AS nearest_bench, csim AS max_sim,
        |       CASE WHEN csim >= $SemThreshold THEN 1 ELSE 0 END AS contaminated
        |FROM a""".stripMargin,

    "q23_lsh_topk" ->
      s"""WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 8),
        |c AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
        |  FROM embeddings),
        |qb AS (SELECT query_id, qv, ${bucketSql("qv")} AS bucket FROM q),
        |cb AS (SELECT neighbor_id, nv, ${bucketSql("nv")} AS bucket FROM c),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_dot_product(qv, nv) /
        |               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6) AS cosine
        |  FROM qb JOIN cb USING (bucket) WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3""".stripMargin,

    // NN-Descent rounds unrolled as CTEs; UNION (not UNION ALL)
    // mirrors the Spark side's union+distinct candidate sets, and the
    // same round-6 + id tiebreak makes each round's top-k selection
    // identical, so the fixed point of the iteration matches exactly.
    "q58_knn_graph" -> {
      val k = 3
      def topkSql(pairs: String, out: String) =
        s"""${out}s AS (
           |  SELECT p.src, p.dst,
           |         round(list_dot_product(x.v, y.v) /
           |               (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS cosine
           |  FROM $pairs p JOIN e x ON x.id = p.src JOIN e y ON y.id = p.dst),
           |$out AS (
           |  SELECT src, dst, cosine, rnk FROM (
           |    SELECT src, dst, cosine,
           |           ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst ASC) AS rnk
           |    FROM ${out}s) WHERE rnk <= $k)""".stripMargin
      def roundSql(i: Int) =
        s"""u$i AS (SELECT src, dst FROM g${i - 1} UNION SELECT dst, src FROM g${i - 1}),
           |p$i AS (
           |  SELECT a.dst AS src, b.dst AS dst FROM u$i a JOIN u$i b ON a.src = b.src
           |  WHERE a.dst <> b.dst
           |  UNION SELECT src, dst FROM g${i - 1}),
           |${topkSql(s"p$i", s"g$i")}""".stripMargin
      val seedJoins = (0 until KnnTables).map { t =>
        s"""SELECT x.id AS src, y.id AS dst
           |    FROM bt$t x JOIN bt$t y ON x.bucket = y.bucket AND x.id <> y.id"""
          .stripMargin
      }.mkString("\n    UNION ALL\n    ")
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${(0 until KnnTables).map(t =>
              s"bt$t AS (SELECT id, ${bucketSql("v", planes = KnnPlanes, seed = 42 + t)} AS bucket FROM e)")
            .mkString(",\n")},
         |p0 AS (
         |  SELECT DISTINCT src, dst FROM (
         |    $seedJoins)),
         |${topkSql("p0", "g0")},
         |${roundSql(1)},
         |${roundSql(2)}
         |SELECT src AS query_id, rnk, dst AS neighbor_id, cosine FROM g2""".stripMargin
    },

    // Mirrors NearDup.embeddingPairsAuto: nplanes from COUNT(*) (same
    // integer formula as autoPlanes), two independent masked hyperplane
    // tables (seeds 42/43), DISTINCT candidate union, then one exact
    // cosine verify over the vectors joined back.
    "q24_embedding_near_dup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |np AS (SELECT ${autoPlanesSql("COUNT(*)")} AS nplanes FROM e),
        |b AS (
        |  SELECT vec_id, v, 0 AS tbl,
        |         ${maskedBucketSql("v", graft.textops.NearDup.EmbedMaxPlanes, 64, 42)} AS bucket
        |  FROM e, np
        |  UNION ALL
        |  SELECT vec_id, v, 1 AS tbl,
        |         ${maskedBucketSql("v", graft.textops.NearDup.EmbedMaxPlanes, 64, 43)} AS bucket
        |  FROM e, np),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM b x JOIN b y
        |    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
        |pairs AS (
        |  SELECT c.id_a, c.id_b,
        |         round(list_dot_product(a.v, z.v) /
        |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(z.v, z.v))), 6) AS cosine
        |  FROM cand c JOIN e a ON c.id_a = a.vec_id JOIN e z ON c.id_b = z.vec_id)
        |SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.4""".stripMargin,

    // q23's bucket join with the label carried through and the
    // same-label rows dropped at the candidate stage.
    "q72_hard_negatives" ->
      s"""WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
        |  FROM embeddings WHERE vec_id < 8),
        |c AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv, label AS nl
        |  FROM embeddings),
        |qb AS (SELECT query_id, qv, ql, ${bucketSql("qv")} AS bucket FROM q),
        |cb AS (SELECT neighbor_id, nv, nl, ${bucketSql("nv")} AS bucket FROM c),
        |scored AS (
        |  SELECT query_id, neighbor_id, nl,
        |         round(list_dot_product(qv, nv) /
        |               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6) AS cosine
        |  FROM qb JOIN cb USING (bucket)
        |  WHERE query_id <> neighbor_id AND ql <> nl),
        |ranked AS (
        |  SELECT query_id, neighbor_id, nl, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, neighbor_id, nl AS neighbor_label, cosine
        |FROM ranked WHERE rnk <= 3""".stripMargin,

    // MMR rounds unrolled as CTEs (the q58 precedent): each round
    // recomputes the running max-similarity against the latest pick
    // with the same GREATEST-of-rounded accumulation and takes the
    // argmax of round(lam*rel - com*ms, 6) with an id tiebreak. The
    // anchor vector, its norm, and the lambda/complement literals are
    // interpolated from the SAME Scala doubles the operator computes
    // with (Double.toString round-trips exactly).
    "q74_mmr_select" -> {
      val anchorLits = MmrAnchor.mkString(", ")
      val anchorNorm = {
        var s = 0.0; var i = 0
        while (i < MmrAnchor.length) { s += MmrAnchor(i) * MmrAnchor(i); i += 1 }
        math.sqrt(s)
      }
      val lam = MmrLambda.toString
      val com = (1.0 - MmrLambda).toString
      val rounds = (2 to MmrK).map { i =>
        s"""r$i AS (
           |  SELECT r.id, r.v, r.rel,
           |         GREATEST(r.ms, round(list_dot_product(r.v, p.v) /
           |           (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(p.v, p.v))), 6)) AS ms
           |  FROM r${i - 1} r, p${i - 1} p WHERE r.id <> p.id),
           |p$i AS (
           |  SELECT id, v, rel, round($lam * rel - $com * ms, 6) AS score
           |  FROM r$i ORDER BY score DESC, id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val out = (1 to MmrK).map(i =>
        s"SELECT $i AS rnk, id AS vec_id, rel AS relevance, score AS mmr_score FROM p$i")
        .mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |r1 AS (
         |  SELECT id, v,
         |         round(list_dot_product(v, [$anchorLits]) /
         |               (sqrt(list_dot_product(v, v)) * $anchorNorm), 6) AS rel,
         |         0.0 AS ms
         |  FROM e),
         |p1 AS (
         |  SELECT id, v, rel, round($lam * rel - 0.0, 6) AS score
         |  FROM r1 ORDER BY score DESC, id LIMIT 1),
         |$rounds
         |SELECT rnk, vec_id, relevance, mmr_score FROM (
         |  $out) ORDER BY rnk""".stripMargin
    },

    "q22_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 8),
        |c AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
        |  FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_dot_product(qv, nv) /
        |               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6) AS cosine
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3""".stripMargin,

    // bitext margin mirror: the q22 cosine op order quantized at e6
    // and shifted nonnegative, both neighborhood means as integer
    // top-k window sums div k, the same guarded ratio
    "q174_bitext_margin" ->
      ("""WITH a AS (
        |  SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |b AS (
        |  SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS nv
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |scored AS (
        |  SELECT src_id, tgt_id,
        |         CAST(floor(list_dot_product(qv, nv) /
        |              (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) * 1000000.0 + 0.5) AS BIGINT)
        |           + 1000000 AS sim_e6
        |  FROM a, b),""".stripMargin + BitextChainSql),

    // bucketed bitext-margin mirror: the q23 plane embedding produces
    // the candidate join, then the SAME chain as q174
    "q176_bitext_lsh_margin" ->
      (s"""WITH a AS (
        |  SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |b AS (
        |  SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS nv
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |qb AS (SELECT src_id, qv, ${bucketSql("qv", planes = 3)} AS bucket FROM a),
        |cb AS (SELECT tgt_id, nv, ${bucketSql("nv", planes = 3)} AS bucket FROM b),
        |scored AS (
        |  SELECT src_id, tgt_id,
        |         CAST(floor(list_dot_product(qv, nv) /
        |              (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) * 1000000.0 + 0.5) AS BIGINT)
        |           + 1000000 AS sim_e6
        |  FROM qb JOIN cb USING (bucket)),""".stripMargin + BitextChainSql),

    // SemDeDup mirror: same codebook (vec_id < 8), same round-6 cosine
    // op order, argmax assignment via (csim DESC, cid ASC) window,
    // sub-cell split mirror at SemMaxCell, sweep rank via
    // (csim ASC, id ASC) per (cell, sub), duplicate = exists an
    // earlier in-sub-cell item within threshold.
    "q78_semantic_dedup" ->
      (s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8)""".stripMargin
        + SemSweepSql),

    // kmeans‖ fit -> assign -> sweep, fully unrolled: seed by smallest
    // salted md5, two admission rounds (the identical 60-bit hash
    // uniforms; d² is the identical sequential elementwise sum —
    // DuckDB's list_sum(list_transform) reproduces the JVM loop
    // bit-for-bit), candidate order (round, string-id), weights by
    // nearest assignment with the (d², index) tiebreak, heaviest-K
    // codebook (lloydIters=0: centers are RAW data vectors — no float
    // averaging crosses the engine boundary), then the shared SemDeDup
    // sweep mirror.
    // q78's assignment mirror + q32's salted-rank mirror.
    "q90_cluster_balanced_sample" ->
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT id AS cid, v AS cv FROM e WHERE id < $SemCentroids),
         |s AS (
         |  SELECT id, cid,
         |         round(list_dot_product(v, cv) /
         |               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) AS csim
         |  FROM e, c),
         |a AS (
         |  SELECT id, cid AS cell, csim AS centroid_sim FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id
         |                                 ORDER BY csim DESC, cid ASC) AS rn
         |    FROM s) WHERE rn = 1),
         |r AS (
         |  SELECT id, cell, centroid_sim,
         |         ROW_NUMBER() OVER (PARTITION BY cell
         |           ORDER BY md5('$CbsSalt' || CAST(id AS VARCHAR)), id) AS rk
         |  FROM a)
         |SELECT id AS vec_id, cell, centroid_sim, rk FROM r WHERE rk <= $CbsK""".stripMargin,

    // HNSW beam descent unrolled (the q58 precedent): md5 level
    // membership (layer j ⇔ h60 ≡ 0 mod fanout^j), per-layer bucketed
    // top-degree symmetrized edges with the same per-layer seed
    // offsets as the Spark side, entry beam scored against the FULL
    // top layer, one expansion CTE per lower layer, identical round-6
    // cosine + id tiebreaks throughout — the search is a total
    // deterministic function of the input on both engines.
    "q88_hnsw_topk" -> {
      def cosSql(a: String, b: String) =
        s"round(list_dot_product($a, $b) /\n" +
          s"               (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      def layerSql(j: Int, mem: String): String = {
        val np = s"np$j AS (SELECT ${autoPlanesSql("COUNT(*)")} AS nplanes FROM $mem),\n"
        val bs = np + (0 until HnswTables).map { t =>
          s"b${j}t$t AS (SELECT id, " +
            s"${maskedBucketSql("v", graft.textops.NearDup.EmbedMaxPlanes, 64,
              42 + j * HnswTables + t)} AS bucket FROM $mem, np$j)"
        }.mkString(",\n")
        val pu = (0 until HnswTables).map { t =>
          s"SELECT x.id AS src, y.id AS dst FROM b${j}t$t x " +
            s"JOIN b${j}t$t y ON x.bucket = y.bucket AND x.id <> y.id"
        }.mkString("\n    UNION ALL\n    ")
        s"""$bs,
           |p$j AS (SELECT DISTINCT src, dst FROM (
           |    $pu)),
           |s$j AS (SELECT p.src, p.dst, ${cosSql("x.v", "y.v")} AS cosine
           |        FROM p$j p JOIN e x ON x.id = p.src JOIN e y ON y.id = p.dst),
           |t$j AS (SELECT src, dst FROM (
           |    SELECT src, dst,
           |           ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst ASC) AS rnk
           |    FROM s$j) WHERE rnk <= $HnswDegree),
           |g$j AS (SELECT src, dst FROM t$j UNION SELECT dst, src FROM t$j)""".stripMargin
      }
      def beamStep(j: Int, h: Int, prev: String, out: String): String =
        s"""x${j}h$h AS (SELECT query_id, cand FROM (
           |    SELECT b.query_id, g.dst AS cand FROM $prev b JOIN g$j g ON g.src = b.cand
           |    UNION
           |    SELECT query_id, cand FROM $prev)),
           |xs${j}h$h AS (SELECT x.query_id, x.cand, ${cosSql("q.qv", "ev.v")} AS cosine
           |         FROM x${j}h$h x JOIN q ON q.query_id = x.query_id JOIN e ev ON ev.id = x.cand),
           |$out AS (SELECT query_id, cand, cosine, rnk FROM (
           |    SELECT query_id, cand, cosine,
           |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand ASC) AS rnk
           |    FROM xs${j}h$h) WHERE rnk <= $HnswBeam)""".stripMargin
      // one beamStep per (layer, hop), descending — names chain
      // beam2 -> beam1h1 -> beam1h2 -> beam0h1 -> beam0h2
      val steps = {
        var prev = "beam2"
        val sb = new StringBuilder
        for (j <- (HnswLayers - 2) to 0 by -1; h <- 1 to HnswHops) {
          val out = s"beam${j}h$h"
          sb.append(",\n").append(beamStep(j, h, prev, out))
          prev = out
        }
        (sb.toString, prev)
      }
      val topMod = (0 until HnswLayers - 1).foldLeft(1L)((a, _) => a * HnswFanout)
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |hh AS (SELECT id, v,
         |         CAST(('0x' || substr(md5('hnsw42:' || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
         |       FROM e),
         |q AS (SELECT id AS query_id, v AS qv FROM e WHERE id < 8),
         |m2 AS (SELECT id, v FROM hh WHERE h60 % $topMod = 0),
         |m1 AS (SELECT id, v FROM hh WHERE h60 % $HnswFanout = 0),
         |${layerSql(1, "m1")},
         |${layerSql(0, "e")},
         |en AS (SELECT q.query_id, m.id AS cand, ${cosSql("q.qv", "m.v")} AS cosine
         |       FROM q, m2 m),
         |beam2 AS (SELECT query_id, cand, cosine, rnk FROM (
         |    SELECT query_id, cand, cosine,
         |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand ASC) AS rnk
         |    FROM en) WHERE rnk <= $HnswBeam)${steps._1}
         |SELECT query_id, rnk, cand AS neighbor_id, cosine FROM (
         |    SELECT query_id, cand, cosine,
         |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand ASC) AS rnk
         |    FROM ${steps._2} WHERE cand <> query_id) WHERE rnk <= $HnswK""".stripMargin
    },

    "q87_kmeans_codebook" ->
      (s"""WITH e0 AS (SELECT CAST(vec_id AS VARCHAR) AS sid,
        |                    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c0 AS (SELECT 0 AS rnd, sid, v FROM e0
        |       ORDER BY md5('km42-seed:' || sid), sid LIMIT 1),
        |d1 AS (SELECT e0.sid, e0.v,
        |         MIN(list_sum(list_transform(generate_series(1, len(e0.v)),
        |             i -> (e0.v[i] - cc.v[i]) * (e0.v[i] - cc.v[i])))) AS d2
        |       FROM e0, c0 cc GROUP BY e0.sid, e0.v),
        |t1 AS (SELECT SUM(d2) AS total FROM d1),
        |a1 AS (SELECT 1 AS rnd, sid, v FROM d1, t1
        |       WHERE CAST(('0x' || substr(md5('km42-r1:' || sid), 1, 15)) AS BIGINT)
        |             / 1152921504606846976.0 < $KmOversample * d2 / total),
        |c1 AS (SELECT * FROM c0 UNION ALL SELECT * FROM a1),
        |d2r AS (SELECT e0.sid, e0.v,
        |          MIN(list_sum(list_transform(generate_series(1, len(e0.v)),
        |              i -> (e0.v[i] - cc.v[i]) * (e0.v[i] - cc.v[i])))) AS d2
        |        FROM e0, c1 cc GROUP BY e0.sid, e0.v),
        |t2 AS (SELECT SUM(d2) AS total FROM d2r),
        |a2 AS (SELECT 2 AS rnd, sid, v FROM d2r, t2
        |       WHERE CAST(('0x' || substr(md5('km42-r2:' || sid), 1, 15)) AS BIGINT)
        |             / 1152921504606846976.0 < $KmOversample * d2 / total),
        |c2 AS (SELECT * FROM c1 UNION ALL SELECT * FROM a2),
        |cand AS (SELECT sid, v,
        |                ROW_NUMBER() OVER (ORDER BY rnd, sid) - 1 AS cidx
        |         FROM c2),
        |asn AS (SELECT sid, cidx FROM (
        |          SELECT e0.sid, cand.cidx,
        |                 ROW_NUMBER() OVER (PARTITION BY e0.sid ORDER BY
        |                   list_sum(list_transform(generate_series(1, len(e0.v)),
        |                     i -> (e0.v[i] - cand.v[i]) * (e0.v[i] - cand.v[i]))) ASC,
        |                   cand.cidx ASC) AS rn
        |          FROM e0, cand) WHERE rn = 1),
        |w AS (SELECT c.cidx, c.v, COUNT(a.sid) AS wt
        |      FROM cand c LEFT JOIN asn a USING (cidx)
        |      GROUP BY c.cidx, c.v),
        |code AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY wt DESC, cidx ASC) - 1
        |                     AS BIGINT) AS cid,
        |                v AS cv
        |         FROM w ORDER BY wt DESC, cidx ASC LIMIT $KmK),
        |e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT cid, cv FROM code)""".stripMargin
        + SemSweepSql),

    // PCA deterministic core: the identical fixed-point quantization
    // (floor(x·2^20 + 0.5) BIGINT — math.round's half rule, NOT SQL
    // round()), exact HUGEINT moment sums (stringified — they exceed
    // int64), the identical fixed-order variance formula, and an
    // explained-variance CUMSUM kept in EXACT INTEGERS (ivar = p·n −
    // s²; the per-dim denominator n²·2^40 is constant so it cancels) —
    // a float running sum would diverge because DuckDB's window
    // aggregates accumulate in segment-tree order, not sequentially.
    // sel at 95% is the integer comparison 20·cum_before < 19·total.
    "q106_pca_variance_rank" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (
        |  SELECT i - 1 AS d, CAST(floor(v[i] * 1048576.0 + 0.5) AS BIGINT) AS qv
        |  FROM e, unnest(generate_series(1, $SqDim)) t(i)),
        |m AS (
        |  SELECT d, COUNT(*) AS n_vecs, SUM(qv) AS s_int, SUM(qv * qv) AS p_int
        |  FROM q GROUP BY d),
        |v AS (
        |  SELECT d, n_vecs, s_int, p_int,
        |         CAST(p_int AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1099511627776.0
        |           - (CAST(s_int AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1048576.0)
        |             * (CAST(s_int AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1048576.0)
        |           AS variance,
        |         p_int * n_vecs - s_int * s_int AS ivar
        |  FROM m),
        |r AS (
        |  SELECT d, n_vecs, CAST(s_int AS VARCHAR) AS s, CAST(p_int AS VARCHAR) AS p,
        |         variance, ivar,
        |         ROW_NUMBER() OVER (ORDER BY ivar DESC, d ASC) AS rnk,
        |         SUM(ivar) OVER (ORDER BY ivar DESC, d ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(ivar) OVER () AS total
        |  FROM v)
        |SELECT d, n_vecs, s, p, variance, rnk,
        |       CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_frac,
        |       CAST((cum - ivar) * 20 < total * 19 AS INT) AS sel
        |FROM r""".stripMargin,

    // generated: q106's moment quantization -> covariance pivot -> 28
    // cyclic rotations unrolled as 3 CTEs each, same IEEE op order as
    // Vectors.jacobiSweeps (column half-step, then row + V half-step)
    "q143_jacobi_first_sweep" -> jacobiSweepOracleSql(JacobiDim),
    "q159_jacobi_two_sweeps" ->
      jacobiSweepOracleSql(JacobiDim, sweeps = 2, e6 = true),

    // generated greedy unroll — see opqAllocOracleSql
    "q151_opq_allocation" -> opqAllocOracleSql(JacobiDim, 2)
  )

  /** Shared SemDeDup sweep mirror (q78/q87): expects CTEs `e(id, v)`
    * (the corpus) and `c(cid, cv)` (the codebook) to be in scope.
    * Mirrors semanticDedup's argmax assignment, the SemMaxCell
    * sub-cell split (md5-affine — identical on both engines; reduces
    * to sub=0 whenever no cell exceeds the cap), the per-(cell, sub)
    * sweep rank and the earlier-neighbor duplicate predicate.
    */
  private def SemSweepSql: String =
    s""",
      |s AS (
      |  SELECT id, v, cid,
      |         round(list_dot_product(v, cv) /
      |               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) AS csim
      |  FROM e, c),
      |a AS (
      |  SELECT id, v, cid AS cell, csim AS centroid_sim FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id
      |                                 ORDER BY csim DESC, cid ASC) AS rn
      |    FROM s) WHERE rn = 1),
      |cz AS (SELECT cell, COUNT(*) AS cn FROM a GROUP BY cell),
      |aa AS (
      |  SELECT a.*, CASE WHEN cn <= $SemMaxCell THEN 0
      |    ELSE CAST(('0x' || substr(md5('semsub:' || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)
      |         % CAST(CEIL(cn / ${SemMaxCell}.0) AS BIGINT) END AS sub
      |  FROM a JOIN cz USING (cell)),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cell, sub
      |                               ORDER BY centroid_sim ASC, id ASC) AS rnk
      |  FROM aa),
      |d AS (
      |  SELECT DISTINCT x.id FROM r x JOIN r y
      |    ON x.cell = y.cell AND x.sub = y.sub AND y.rnk < x.rnk
      |  WHERE round(list_dot_product(x.v, y.v) /
      |              (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6)
      |        >= $SemThreshold)
      |SELECT r.id AS vec_id, r.cell, r.rnk, r.centroid_sim,
      |       CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS keep
      |FROM r LEFT JOIN d ON r.id = d.id""".stripMargin
}
