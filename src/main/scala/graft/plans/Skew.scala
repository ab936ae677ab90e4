package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation + co-location utilities for the 100 TB layout.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`) already splits skewed
  * sort-merge partitions at runtime; these helpers cover the cases AQE
  * cannot: skewed AGGREGATION keys (a single hot company/etld1 whose
  * group lands on one task) and joins where the build side is too big
  * to broadcast but small enough to replicate `buckets` times.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates: phase 1
    * aggregates (key, salt) partials, phase 2 merges partials per key.
    * `partial` aggregates raw rows; `merge` combines partial columns of
    * the same (aliased) names. Correct for any algebraic aggregate
    * (count→sum, sum→sum, min→min, max→max, …).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
      .drop("__salt")
  }

  /** Salted count+sum — the common hot-key rollup. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame =
    saltedAgg(df, keys, buckets,
      partial = Seq(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s")),
      merge = Seq(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valueCol")))

  /** Salted equi-join: the skewed left side gets a random salt in
    * [0, buckets); the right side is replicated once per salt value.
    * Output equals the plain join (each left row meets the full right
    * key group exactly once); the hot key's rows spread over `buckets`
    * tasks at the cost of a `buckets`× right-side shuffle volume.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    // right/full outer would duplicate unmatched right rows once per
    // salt (the right side is replicated before the join)
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft("__salt") === replicatedRight("__salt").cast("long"),
        joinType)
      .drop(replicatedRight(key))
      .drop(saltedLeft("__salt")).drop(replicatedRight("__salt"))
  }

  /** Write a table bucketed by `key` so equal keys co-locate: repeated
    * joins/aggregations on `key` then shuffle neither side (the 100 TB
    * co-located-join story; locally demonstrated in `SkewSpec`).
    */
  def writeBucketed(df: DataFrame, key: String, numBuckets: Int, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
