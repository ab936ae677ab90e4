package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.textops.NearDup

/** The three classic MERGEABLE summaries (Agarwal et al., "Mergeable
  * Summaries", PODS 2012) as cross-engine-exact tables — the telemetry
  * layer a 100 TB pipeline ships alongside the corpus itself:
  *
  *  - Count-Min (Cormode & Muthukrishnan 2005): `depth × width`
  *    counters; point frequency estimates that only ever OVERcount.
  *    Merges by cell-wise SUM (additive — at-least-once delivery
  *    inflates, so the durable session overwrites by batch id).
  *  - HyperLogLog (Flajolet et al. 2007): `2^p` registers holding the
  *    max leading-zero rank observed per substream; distinct-count
  *    estimates. Merges by register-wise MAX (idempotent — replay-safe
  *    by construction).
  *  - Bloom filter (Bloom 1970): `k` bit positions per item over `m`
  *    bits; membership with false positives, never false negatives.
  *    Merges by bit-set UNION (idempotent).
  *
  * Everything here is DERIVED FROM THE SHARED 60-BIT MD5 HASH
  * ([[NearDup.shingleHash60]], the `HashSql` mirror the shingle gates
  * already cross-verify), with row/position salts folded into the
  * hashed string (`"i:item"`) — so unlike library sketches (opaque
  * binary blobs, e.g. the DataSketches HLL behind
  * [[graft.streaming.StreamDistinctCount]]), every cell of every
  * summary is an INTEGER a DuckDB oracle reproduces exactly. That is
  * the point of this module: the driver gates hash-compare the
  * sketches themselves (q118/q120) and their estimates (q119/q121),
  * not just their error envelopes.
  *
  * Scale shape (all three): one explode bounded by the salt count,
  * then one map-side-combined aggregate whose KEY SPACE is the sketch
  * size (`depth·width` / `2^p` / `≤ m` — thousands), never the item
  * type count. The shuffle moves a bounded summary regardless of
  * corpus size; the reduce side holds kilobytes. Estimates join
  * probes against the sketch with the SKETCH broadcast — the probe
  * stream never shuffles.
  *
  * Float discipline: the estimator gates are integer end-to-end except
  * one fixed-order IEEE expression (HLL's `est_raw`), built from
  * exactly-representable constants (`2^53`, `m²`) and single mul/div
  * steps — no accumulation, no `ln` (the linear-counting correction
  * needs `ln`, whose last-ulp rounding is NOT pinned across engines;
  * it is spec-verified instead of gated).
  */
object Sketches {

  /** `hash60("salt:item")` — the salted cross-engine uniform. */
  private def saltedHash(salt: Int, item: Column): Column =
    NearDup.shingleHash60(concat_ws(":", lit(salt.toString), item))

  // ---- Count-Min -----------------------------------------------------------

  /** The `(sk_row, bucket, cnt)` Count-Min table of `itemCol`:
    * `cnt(i, b)` = number of item OCCURRENCES whose row-`i` salted
    * hash lands in bucket `b`. One explode (×`depth`) + one
    * map-side-combined groupBy over ≤ `depth·width` keys.
    */
  def cmsTable(items: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth > 0 && width > 0, s"bad CMS shape: $depth x $width")
    val cells = (0 until depth).map { i =>
      struct(lit(i.toLong).as("sk_row"),
        pmod(saltedHash(i, col(itemCol)), lit(width.toLong)).as("bucket"))
    }
    items.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.sk_row").as("sk_row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` against a CMS table:
    * `cms_est(item) = min_i cnt(i, h_i(item))` — ≥ the true count by
    * construction (the only error is collision overcount). The sketch
    * (bounded) broadcasts; the probe stream never shuffles for the
    * lookup, only for its own `min` groupBy (keyed by probe item —
    * bounded by the probe set).
    */
  def cmsEstimates(probes: DataFrame, itemCol: String, sketch: DataFrame,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val cells = (0 until depth).map { i =>
      struct(lit(i.toLong).as("sk_row"),
        pmod(saltedHash(i, col(itemCol)), lit(width.toLong)).as("bucket"))
    }
    probes.select(col(itemCol).as("item"), explode(array(cells: _*)).as("c"))
      .select(col("item"), col("c.sk_row").as("sk_row"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("sk_row", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** CMS inner-product estimate (Cormode & Muthukrishnan 2005 §4.2):
    * `⟨fa, fb⟩ ≈ min_i Σ_b a_i[b]·b_i[b]` — ≥ the true inner product
    * (collision terms only ADD), the sketch-space answer to "how much
    * do two corpora's frequency vectors overlap" that never joins the
    * corpora themselves. Both inputs are [[cmsTable]] outputs with the
    * SAME shape; they are sketch-sized, so the right side broadcasts
    * and a depth-row fold finishes on the driver side of the plan. A
    * row with no colliding buckets estimates 0 (reinstated via the
    * left join — the estimator's min must see it).
    *
    * 100 TB note: cell counts are int64 corpus frequencies; the
    * per-cell product of two web-scale hot cells can near 2^63 — at
    * that scale shrink cells by sharding the corpus into several
    * sketches and summing estimates (inner product is bilinear), or
    * widen the sketch.
    */
  def cmsInnerProduct(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.select(col("sk_row"), col("bucket"), col("cnt").as("cnt_b"))
    val perRow = a.join(broadcast(bb), Seq("sk_row", "bucket"))
      .groupBy(col("sk_row"))
      .agg(sum(col("cnt") * col("cnt_b")).as("ipr"))
    a.select(col("sk_row")).distinct()
      .join(perRow, Seq("sk_row"), "left")
      .agg(min(coalesce(col("ipr"), lit(0L))).as("cms_ip"))
  }

  // ---- HyperLogLog ---------------------------------------------------------

  /** Register width: the hash contributes `p` index bits and
    * `W = 60 − p` rank bits; ranks run 1..`W+1`.
    */
  private def hllW(p: Int): Int = 60 - p

  /** The `(idx, r)` HLL register table of the DISTINCT values of
    * `itemCol` at precision `p` (`m = 2^p` registers): `idx` = top `p`
    * hash bits, `r` = max over the substream of
    * (leading zeros of the low `W` bits) + 1. Registers that observe
    * no value are ABSENT (semantically rank 0 — [[hllEstimate]]
    * reinstates them). `bin()` gives the bit length identically in
    * both engines (`rank = W + 1 − bitlen(rest)`, all-zero rest
    * saturating at `W + 1`), so every cell is cross-engine-exact.
    */
  /** The per-row HLL (idx, rank) column pair for `item` at precision
    * `p` — the shared substream split [[hllRegisters]]/
    * [[hllRegistersByGroup]] fold and other modules (the sketched
    * trap panel) reuse, so every register table in the engine is the
    * same hash recipe.
    */
  private[graft] def hllRegisterCols(item: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"bad HLL precision: $p")
    val w = hllW(p)
    val h = saltedHash(0, item)
    val rest = h.bitwiseAND(lit((1L << w) - 1))
    (shiftright(h, w),
      when(rest === 0L, lit(w + 1))
        .otherwise(lit(w + 1) - length(bin(rest))).cast("long"))
  }

  def hllRegisters(items: DataFrame, itemCol: String, p: Int = 8): DataFrame = {
    val (idx, rank) = hllRegisterCols(col(itemCol), p)
    items.select(idx.as("idx"), rank.as("rank"))
      .groupBy(col("idx"))
      .agg(max(col("rank")).as("r"))
  }

  /** Per-GROUP register tables (`(group, idx, r)`) — the distinct-count
    * telemetry panel one level down (distinct URLs per domain, distinct
    * shingles per language): one map-side-combined max over
    * `groups × 2^p` keys, still summary-sized. Register rows merge by
    * max WITHIN a group; groups are independent.
    */
  def hllRegistersByGroup(items: DataFrame, groupCol: String, itemCol: String,
      p: Int = 8): DataFrame = {
    val (idx, rank) = hllRegisterCols(col(itemCol), p)
    items.select(col(groupCol).as("grp"), idx.as("idx"), rank.as("rank"))
      .groupBy(col("grp"), col("idx"))
      .agg(max(col("rank")).as("r"))
  }

  /** One-row HLL estimate from a register table: the exact-integer
    * harmonic numerator `z_int = Σ_idx 2^(K − r_idx)` (`K = W + 1`,
    * absent registers contribute `2^K`; max `m·2^K < 2^63` for
    * p ≥ 6 — exact in int64), the zero-register count, and the raw
    * Flajolet estimate `α_m·m²/Z` evaluated as ONE fixed-order IEEE
    * expression over `z_int` (`Z = z_int/2^K`; `2^K` and `m²` are
    * exactly representable, so the only roundings are the final
    * mul/div chain — bit-identical across engines). The small-range
    * linear-counting correction needs `ln` (rounding not pinned
    * cross-engine) — spec-verified, not gated.
    */
  def hllEstimate(registers: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    val k = hllW(p) + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(cast(1 as bigint), cast($k - r as int))")).as("z_present"))
      .select(lit(m.toLong).as("m"),
        (lit(m.toLong) - col("n_present")).as("zeros"),
        (coalesce(col("z_present"), lit(0L)) +
          (lit(m.toLong) - col("n_present")) * lit(1L << k)).as("z_int"))
      .withColumn("est_raw",
        lit(alpha) * lit(m.toDouble * m.toDouble) * lit(math.pow(2.0, k)) /
          col("z_int").cast("double"))
  }

  // ---- Bloom ---------------------------------------------------------------

  /** The SET-BIT table of a Bloom filter over the distinct values of
    * `itemCol`: `k` salted-hash positions per item over `m` bits, kept
    * as distinct `(pos)` rows (≤ `m` of them — the bounded, unionable,
    * oracle-visible form of the bit array). The built-in
    * `bloom_filter_agg` behind [[graft.textops.CurationOps
    * .decontaminate]] is the codegen'd production probe; THIS form is
    * its cross-engine-verifiable twin.
    */
  def bloomBits(items: DataFrame, itemCol: String,
      k: Int = 3, mBits: Int = 16384): DataFrame = {
    require(k > 0 && mBits > 0, s"bad Bloom shape: k=$k m=$mBits")
    val positions = (0 until k).map(i =>
      pmod(saltedHash(i, col(itemCol)), lit(mBits.toLong)))
    items.select(explode(array(positions: _*)).as("pos")).distinct()
  }

  /** Per-id membership counts of `probe`'s items against a bit table:
    * `n_items` = distinct items carried by the id, `n_hits` = how many
    * of them the filter claims present (ALL `k` positions set —
    * ≥ the true containment count; the surplus is the filter's false
    * positives, identical across engines because the bits are). The
    * bit table broadcasts (≤ `m` longs); the probe side aggregates on
    * its own (id, item) keys only.
    */
  def bloomProbe(probe: DataFrame, idCol: String, itemCol: String,
      bits: DataFrame, k: Int = 3, mBits: Int = 16384): DataFrame = {
    val positions = (0 until k).map(i =>
      pmod(saltedHash(i, col("item")), lit(mBits.toLong)))
    val pairs = probe.select(col(idCol).as("id"), col(itemCol).as("item")).distinct()
    val hits = pairs
      .select(col("id"), col("item"), explode(array(positions: _*)).as("pos"))
      .join(broadcast(bits), Seq("pos"), "left_semi")
      .groupBy(col("id"), col("item"))
      .agg(count(lit(1)).as("n_set"))
      .filter(col("n_set") === k)
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    pairs.groupBy(col("id")).agg(count(lit(1)).as("n_items"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), col("n_items"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }
}
