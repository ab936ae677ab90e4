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
