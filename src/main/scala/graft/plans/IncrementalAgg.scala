package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (partial-aggregate) view maintenance: keep a per-key
  * snapshot of algebraic aggregate STATE and fold each arriving batch
  * into it, so a running 100 TB rollup costs one pass over the NEW data
  * per refresh instead of a rescan of history — the batch twin of what
  * a streaming aggregation's state store does, materialized as a table
  * the rest of the engine can MERGE/read (same ledger-upsert shape as
  * `Ledger.upsert`).
  *
  * Only algebraic aggregates qualify (count/sum/min/max and anything
  * derivable from them — avg = sum/count); holistic ones (exact median)
  * don't decompose. Sums follow the engine-wide exact-decimal policy so
  * a snapshot folded batch-by-batch is bit-identical to a full
  * recompute, regardless of batch boundaries (spec'd).
  */
object IncrementalAgg {

  /** Aggregate one batch to per-key state: `(keys…, n, total)` with the
    * total in exact decimal(38,2).
    */
  def countSumState(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(38,2)").as("total"))

  /** Fold a batch's state into the snapshot (associative + commutative
    * merge, so refresh order never matters): union partials, re-merge
    * per key. Pass the running snapshot (or an empty frame of the same
    * schema) and the NEW batch's [[countSumState]].
    */
  def merge(snapshot: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    snapshot.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("total")).cast("decimal(38,2)").as("total"))

  /** Read the snapshot out as final values (`avg` derived from state —
    * one double division, per the float policy).
    */
  def finalize(snapshot: DataFrame, keys: Seq[String]): DataFrame =
    snapshot.select(
      keys.map(col) ++ Seq(col("n"),
        col("total").cast("double").as("sum_value"),
        (col("total").cast("double") / col("n")).as("avg_value")): _*)
}
