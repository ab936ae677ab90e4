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
      // reader rejects; read it as raw nanos and truncate to micros
      // (same truncation DuckDB applies when casting ns→TIMESTAMP).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
