package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S10 — CSV report sinks (reference orphan-request reports,
  * `data_etl_app/src/data_etl_app/services/batch_file_generator.py:73-109,203-208`).
  */
object Reports {

  /** Orphan requests: ledger rows whose custom_id is no longer expected
    * by any deferred plan — the inverse of the T23 frontier. These are
    * re-planned or garbage-collected; the report records them first.
    */
  def orphanRequests(ledger: DataFrame, expected: DataFrame): DataFrame =
    ledger.join(expected.select(col("custom_id")), Seq("custom_id"), "left_anti")

  /** Write a report DataFrame as a single CSV with header (reports are
    * human-scale; the coalesce is intentional).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
