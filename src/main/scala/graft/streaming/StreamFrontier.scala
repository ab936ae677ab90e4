package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The politeness scheduler ([[graft.ingest.Frontier.schedule]]) as a
  * MAINTAINED session — the form a live crawler actually runs: URLs
  * arrive in micro-batches as they are discovered, and each batch's
  * admitted URLs receive the NEXT free fetch slots on their hosts.
  *
  * State per host is one number — the count of slots already handed
  * out — so the session is a per-host counter fold, never a frontier
  * scan: slot continuation is `base(host) + rank-within-batch`, the
  * per-host budget spans batches (`base + rank < maxPerHost`), and
  * `fetch_offset_ms = slot × delay_ms` exactly as in the batch
  * scheduler.
  *
  * ORDERING-LAW DIVERGENCE from the batch scheduler, stated precisely
  * (the reason this is a twin and not a re-derivation): the batch
  * `schedule` orders each host's WHOLE frontier by (priority desc, id
  * asc) before assigning slots; a live session cannot — a slot handed
  * out in batch t is a fetch that may already be in flight, so a
  * higher-priority URL arriving in batch t+1 CANNOT preempt it.
  * Streamed slot assignment is therefore FIFO-BY-ARRIVAL across
  * batches and priority-ordered only WITHIN each batch. The exact
  * equivalence law, spec-pinned: streamed ≡ batch over the union iff
  * every host's arrivals are priority-monotone across batches (each
  * batch's priorities for a host sit below the previous batch's, with
  * the id tiebreak respected at equality); what holds UNCONDITIONALLY
  * is the invariant set — per-host slots are gapless 0,1,2,… in
  * arrival order, the budget is enforced across batches, the offset
  * law is exact, and within any single batch the assignment order is
  * the batch scheduler's.
  */
object StreamFrontier {

  /** One batch's schedule continuation against per-host base counts
    * (`(host, base)` — hosts absent start at 0). Shared by the
    * in-memory and durable sessions, so their per-batch behavior is
    * one code path.
    */
  private[streaming] def scheduleBatch(batch: DataFrame, idCol: String,
      hostCol: String, priorityCol: Column, delays: DataFrame,
      baseCounts: DataFrame, defaultDelayMs: Long,
      maxPerHost: Int): DataFrame = {
    val d = delays.withColumnRenamed(hostCol, "__dhost")
    val b = baseCounts.withColumnRenamed(hostCol, "__bhost")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(priorityCol.desc, col(idCol).asc)
    batch
      .join(broadcast(d), batch(hostCol) === col("__dhost"), "left")
      .withColumn("delay_ms", coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .drop("__dhost")
      .join(b, batch(hostCol) === col("__bhost"), "left")
      .withColumn("__base", coalesce(col("base"), lit(0L)))
      .drop("__bhost", "base")
      // two-stage budget: `rn <= maxPerHost` on the RAW row_number
      // fires the WindowGroupLimit map-side truncation (base ≥ 0
      // makes it a valid upper bound), then the exact cross-batch
      // budget filters on the continued slot
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerHost)
      .withColumn("slot", (col("__base") + col("__rn") - 1).cast("long"))
      .drop("__base", "__rn")
      .filter(col("slot") < maxPerHost)
      .withColumn("fetch_offset_ms", col("slot") * col("delay_ms"))
  }

  /** In-memory session: the maintained state is the scheduled-rows
    * frame itself (slots are part of the output contract, so the
    * ledger IS the state); per-host base counts derive from it.
    */
  final class FrontierSession(spark: SparkSession, idCol: String,
      hostCol: String, priorityCol: Column, delays: DataFrame,
      defaultDelayMs: Long, maxPerHost: Int) {
    @volatile private var scheduled: DataFrame = null

    /** Everything scheduled so far (all batches, slot-continued). */
    def currentSchedule: DataFrame = {
      require(scheduled != null, "schedule requested before any ingest")
      scheduled
    }

    def ingest(batch: DataFrame): Unit = {
      val base =
        if (scheduled == null)
          batch.sparkSession.createDataFrame(
            batch.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField(hostCol, StringType),
              StructField("base", LongType))))
        else scheduled.groupBy(col(hostCol))
          .agg(count(lit(1)).as("base"))
      val rows = scheduleBatch(batch, idCol, hostCol, priorityCol, delays,
        base, defaultDelayMs, maxPerHost)
      scheduled = (if (scheduled == null) rows else scheduled.unionByName(rows))
        .localCheckpoint()
    }

    def start(rows: DataFrame): StreamingQuery =
      rows.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private val ScheduleSchema = StructType(Seq(
    StructField("id", LongType), StructField("host", StringType),
    StructField("priority", LongType), StructField("delay_ms", LongType),
    StructField("slot", LongType), StructField("fetch_offset_ms", LongType)))

  /** Durable session (fixed `(id, host, priority)` input columns, the
    * ledger schema): per-batch scheduled rows committed under the
    * batch id, per-host base counts recomputed from the ledger
    * EXCLUDING the current batch — so a replay after a crash derives
    * the identical slots (the rows are a pure function of (batch,
    * prior ledger)) and [[DurableLedger.commit]]'s first-writer-wins
    * publication keeps a concurrent duplicate writer harmless.
    * Restart is just reopening the path.
    */
  final class DurableFrontierSession(spark: SparkSession, path: String,
      delays: DataFrame, defaultDelayMs: Long, maxPerHost: Int,
      compactEvery: Int = 0) {

    def currentSchedule: DataFrame =
      DurableLedger.load(spark, path, ScheduleSchema)

    def ingest(batch: DataFrame, batchId: Long): Unit = {
      val prior = DurableLedger.load(spark, path, ScheduleSchema,
        excludeBatch = Some(batchId))
      val base = prior.groupBy(col("host")).agg(count(lit(1)).as("base"))
      val rows = scheduleBatch(
        batch.select(col("id"), col("host"), col("priority")),
        "id", "host", col("priority"), delays, base, defaultDelayMs,
        maxPerHost)
        .select("id", "host", "priority", "delay_ms", "slot",
          "fetch_offset_ms")
      DurableLedger.commit(rows, path, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, path, ScheduleSchema, compactEvery)
    }

    def start(rows: DataFrame,
        checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = rows.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingest(batch, batchId)
      }.start()
    }
  }
}
