package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All engine queries read through here so the scan layer stays in one
  * place: at 100 TB these would be Delta/Parquet tables with
  * partition pruning + data skipping; locally they are single parquet
  * files. Column pruning and predicate pushdown are delegated to
  * Catalyst — callers `select`/`filter` and the scan narrows.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") loadEvents(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across generator versions, so probe the footer
    * instead of assuming either:
    *  - micros (possibly NTZ): read natively, cast to session-TZ
    *    timestamp (all sessions pin spark.sql.session.timeZone=UTC, so
    *    the NTZ→LTZ cast is value-identity and downstream window/
    *    date_trunc math is unchanged);
    *  - nanos: Spark's vectorized reader rejects it at schema
    *    inference, so fall back to an explicit user schema with ts as
    *    BIGINT — raw nanos per-query, no session-wide
    *    `spark.sql.legacy.parquet.nanosAsLong` mutation that would leak
    *    into unrelated nanos-typed reads — then truncate to micros
    *    (the same truncation DuckDB applies casting ns→TIMESTAMP).
    */
  private def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val tsIsTimestamp = scala.util.Try {
      val dt = spark.read.parquet(path).schema("ts").dataType
      dt == TimestampType || dt == TimestampNTZType
    }.getOrElse(false)
    if (tsIsTimestamp)
      spark.read.parquet(path).withColumn("ts", col("ts").cast(TimestampType))
    else {
      val df = spark.read
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING")
        .parquet(path)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    }
  }
}
