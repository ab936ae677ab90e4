package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
    val path = s"$dir/$name.parquet"
    if (name == "events") loadEvents(spark, path)
    else schemaOf(spark, path) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None => spark.read.parquet(path) // surface the real error
    }
  }

  /** SCHEMA cache, the catalog-table equivalent (metadata only — the
    * DATA is re-read from parquet on every invocation): a bare
    * `spark.read.parquet(path)` re-infers the schema from file footers
    * on every call (~75 ms warm), and the bench/verify mains call
    * `load` a few times per query — at a real deployment the schema
    * lives in the catalog and is never re-inferred per query. Keyed by
    * absolute path; the driver's testdata is immutable for a process
    * lifetime. `None` records a file whose footer the vectorized
    * reader rejects at inference (TIMESTAMP(NANOS) events — see
    * [[loadEvents]]). Scope caveat: entries are never invalidated, a
    * transient IO failure caches `None` permanently (self-healing —
    * the bare-read fallback surfaces the real error, at inference cost
    * per call), and a schema inferred under one session's conf is
    * reused process-wide. Fine for the immutable-testdata mains this
    * serves; a reuse beyond them should key on (session, path) or
    * cache successes only.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[StructType]]()

  private def schemaOf(spark: SparkSession, path: String): Option[StructType] =
    schemaCache.computeIfAbsent(path,
      _ => scala.util.Try(spark.read.parquet(path).schema).toOption)

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
    val inferredSchema = schemaOf(spark, path)
    val tsIsTimestamp = inferredSchema.exists { s =>
      scala.util.Try {
        val dt = s("ts").dataType
        dt == TimestampType || dt == TimestampNTZType
      }.getOrElse(false)
    }
    if (tsIsTimestamp)
      spark.read.schema(inferredSchema.get).parquet(path)
        .withColumn("ts", col("ts").cast(TimestampType))
    else {
      val df = spark.read
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING")
        .parquet(path)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    }
  }
}
