package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.temporal.Temporal

/** Streaming twin of [[Temporal.eventBursts]] (q117) — live burst
  * monitoring over an event stream: per-(type, hour) counts are
  * ADDITIVE integers, so the stream state is the bounded hourly table
  * ([[Temporal.hourlyCounts]], the batch operator's own phase) merged
  * by integer addition, and [[Temporal.burstsFromHourly]] recovers
  * the batch z-scores BIT-FOR-BIT at any stream point — the
  * [[StreamLengthStats]] histogram discipline applied to the event
  * log.
  *
  * The in-memory session is at-least-once (a redelivered batch double
  * counts — counts carry no batch identity); the durable session
  * commits each batch's delta rows to a [[DurableLedger]] directory
  * keyed by batch id, so replay OVERWRITES (exactly-once counts),
  * restarts resume, and compaction's row concatenation re-combines in
  * the read-side aggregation.
  */
object StreamEventBursts {

  /** In-memory session. */
  final class EventBurstsSession(spark: SparkSession,
      typeCol: String, tsCol: String,
      lookback: Int = 6, zThreshold: Double = 3.0) {
    @volatile private var state: DataFrame = emptyHourly(spark)

    /** The merged `(event_type, hour, c)` table. */
    def hourly: DataFrame = state

    /** Batch-identical burst scores as of the last ingest. */
    def currentBursts: DataFrame =
      Temporal.burstsFromHourly(state, lookback, zThreshold)

    def ingest(batch: DataFrame): DataFrame = {
      val delta = Temporal.hourlyCounts(batch, typeCol, tsCol)
      state = state.union(delta)
        .groupBy(col("event_type"), col("hour")).agg(sum(col("c")).as("c"))
        .localCheckpoint()
      currentBursts
    }

    def start(events: DataFrame)(sink: (DataFrame, Long) => Unit): StreamingQuery =
      events.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          sink(ingest(batch), batchId)
        }
        .start()
  }

  private val HourlySchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("hour", TimestampType),
    StructField("c", LongType)))

  private def emptyHourly(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], HourlySchema)

  /** Durable session. */
  final class DurableEventBurstsSession(spark: SparkSession, ledgerPath: String,
      typeCol: String, tsCol: String,
      lookback: Int = 6, zThreshold: Double = 3.0, compactEvery: Int = 0) {

    /** Committed delta rows. */
    def hourly: DataFrame = DurableLedger.load(spark, ledgerPath, HourlySchema)

    def currentBursts: DataFrame =
      Temporal.burstsFromHourly(hourly, lookback, zThreshold)

    def ingest(batch: DataFrame, batchId: Long): DataFrame = {
      val delta = Temporal.hourlyCounts(batch, typeCol, tsCol)
        .select(col("event_type").cast("string").as("event_type"),
          col("hour").cast("timestamp").as("hour"), col("c").cast("long").as("c"))
      DurableLedger.commit(delta, ledgerPath, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, ledgerPath, HourlySchema, compactEvery)
      currentBursts
    }

    def start(events: DataFrame, checkpointLocation: Option[String] = None)(
        sink: (DataFrame, Long) => Unit): StreamingQuery = {
      val w = events.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) =>
          sink(ingest(batch, batchId), batchId)
        }
        .start()
    }
  }
}
