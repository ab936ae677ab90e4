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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects at schema inference; an explicit user schema with
      // ts as BIGINT reads the raw nanos per-query — no session-wide
      // `spark.sql.legacy.parquet.nanosAsLong` mutation that would leak
      // into unrelated nanos-typed reads — then truncate to micros
      // (same truncation DuckDB applies when casting ns→TIMESTAMP).
      val df = spark.read
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING")
        .parquet(s"$dir/$name.parquet")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
