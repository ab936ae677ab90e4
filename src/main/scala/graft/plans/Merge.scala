package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S5 — keyed upsert (MERGE) shapes for the entity tables (reference
  * Mongo save/bulk_write keyed by unique indexes,
  * `core/src/core/services/manufacturer_service.py:33-210`).
  *
  * On Delta these are literal `MERGE INTO`; the DataFrame formulations
  * below are the exact equivalent plans and run anywhere parquet does.
  */
object Merge {

  /** Last-writer-wins upsert: rows from `updates` replace same-key rows
    * in `existing`; unmatched keys insert. (`WHEN MATCHED UPDATE SET *
    * WHEN NOT MATCHED INSERT *`.)
    */
  def upsert(existing: DataFrame, updates: DataFrame, key: String): DataFrame =
    existing.join(updates.select(key), Seq(key), "left_anti")
      .unionByName(updates, allowMissingColumns = true)

  /** Versioned upsert: keep the row with the highest `versionCol` per
    * key (ties: updates win). Restatement-safe — replaying the same
    * updates is a no-op.
    */
  def upsertLatest(existing: DataFrame, updates: DataFrame, key: String,
      versionCol: String): DataFrame = {
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** SCD type-2 apply: merge a batch of attribute updates into a
    * validity-interval history table (`valid_from`/`valid_to`, open
    * rows have `valid_to` NULL). The warehouse-standard dimension
    * history — on Delta a two-branch `MERGE INTO` (close + insert);
    * this is the equivalent window formulation, one shuffle on the key.
    *
    * Semantics per key, with updates applied in `tsCol` order:
    *  - an update whose attributes differ from the in-effect row closes
    *    it (`valid_to` = update ts) and opens a new row;
    *  - an update equal to the in-effect attributes is a no-op, so
    *    replaying a batch is idempotent;
    *  - already-closed history rows pass through untouched.
    *
    * Stale updates — older than the key's latest known transition
    * (`max(coalesce(valid_to, valid_from))` over ALL its history rows,
    * open or closed) — are DROPPED (the standard CDC guard: history is
    * never rewritten retroactively, including re-opening inside an
    * already-closed interval). This is also what makes replaying an
    * already-applied batch a true no-op: without it, a replayed update
    * would sit before the now-open row and resurrect a stale interval.
    * Conflicting same-(key, ts) updates in one batch resolve to the
    * greatest attribute tuple (deterministic; CDC input with no total
    * order has no "right" answer, so the pick is stable rather than
    * meaningful). An update at EXACTLY the open row's `valid_from`
    * supersedes it, leaving a zero-length interval.
    */
  def scd2Apply(history: DataFrame, updates: DataFrame, key: String,
      attrCols: Seq[String], tsCol: String): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 needs at least one tracked attribute")
    val attrs = attrCols.map(col)
    val closed = history.filter(col("valid_to").isNotNull)
    val open = history.filter(col("valid_to").isNull)
      .select(col(key) +: attrs :+ col("valid_from").as("__ts") :+ lit(1).as("__state"): _*)
    // CDC guard bound: the latest transition the key has EVER seen
    val bound = history.groupBy(col(key))
      .agg(max(coalesce(col("valid_to"), col("valid_from"))).as("__bound"))
    val wTie = Window.partitionBy(col(key), col(tsCol))
      .orderBy(struct(attrCols.map(col): _*).desc)
    val ups = updates
      .withColumn("__tie", row_number().over(wTie)).filter(col("__tie") === 1)
      .select(col(key) +: attrs :+ col(tsCol).as("__ts") :+ lit(0).as("__state"): _*)
      .join(bound, Seq(key), "left")
      .filter(col("__bound").isNull || col("__ts") >= col("__bound"))
      .drop("__bound")
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__state").desc, struct(attrs: _*).asc)
    val cand = open.unionByName(ups)
      .withColumn("__prev", lag(struct(attrs: _*), 1).over(w))
      .withColumn("__changed",
        col("__prev").isNull || col("__prev") =!= struct(attrs: _*))
      .filter(col("__changed"))
    cand
      .withColumn("valid_from", col("__ts"))
      .withColumn("valid_to", lead(col("__ts"), 1).over(w))
      .select(col(key) +: attrs :+ col("valid_from") :+ col("valid_to"): _*)
      .unionByName(closed.select(col(key) +: attrs :+ col("valid_from") :+ col("valid_to"): _*))
  }

  /** Scrape validity predicate (reference
    * `url_scraper_service.py:87-102`): tokens > 30, success rate > 0.8,
    * not timed out. Zero attempted URLs is a 0.0 success rate in the
    * reference (`get_success_rate`'s else-branch), so such scrapes are
    * INVALID — token count alone cannot rescue them.
    */
  def scrapeValid(tokens: Column, urlsScraped: Column, urlsFailed: Column,
      timedOut: Column): Column = {
    val attempted = urlsScraped + urlsFailed
    val rate = when(attempted === 0, lit(0.0))
      .otherwise(urlsScraped.cast("double") / attempted.cast("double"))
    tokens > 30 && rate > 0.8 && !timedOut
  }

  /** Extractable-document gate (reference `new_extract_queue_bot.py:81-82`):
    * 50 < tokens < 125,000.
    */
  def docSizeValid(tokens: Column): Column = tokens > 50 && tokens < 125000
}
