package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ingest.Frontier

/** The crawl CONTROL LOOP as a maintained session — the product the
  * three wave-planning operators compose into: fetch results stream
  * in, the per-host health panel folds them, and each next wave is
  * `triage → apportion → scheduleBudgeted` over the panel's CURRENT
  * state, so a host that crossed its error threshold in any prior
  * batch contributes zero quota to every subsequent wave until its
  * ratio recovers (the scheduler's backoff made closed-loop).
  *
  * State is the mergeable status panel — per host, five 64-bit
  * counters `(n_fetches, n_2xx..n_5xx)` — NEVER the fetch log: counts
  * sum across batches exactly, so unlike [[StreamFrontier]]'s
  * FIFO-slot divergence the equivalence law here is UNCONDITIONAL
  * (spec-pinned): the streamed panel after any batch split equals
  * [[Frontier.statusTriage]] over the union of the logs, and the wave
  * planned from it is the batch-planned wave, bit for bit.
  *
  * Wave composition (one code path, [[waveOf]]):
  *  - triage: `error_ppm = (n_4xx + n_5xx) · 10⁶ div n_fetches`,
  *    `backoff = error_ppm ≥ backoffPpm` — [[Frontier.statusTriage]]'s
  *    exact integer law over the folded panel;
  *  - mass: `n_2xx` for non-backoff hosts (budget follows demonstrated
  *    fetch success; a blended mass — backlog, priority sums — drops
  *    into [[Frontier.apportion]] unchanged, which is why [[triage]]
  *    is public);
  *  - quotas: largest-remainder apportionment of the wave budget over
  *    that mass — backoff hosts are EXCLUDED from the budget table,
  *    and [[Frontier.scheduleBudgeted]]'s unbudgeted-host contract
  *    ("absent hosts fetch NOTHING") turns exclusion into enforcement;
  *  - schedule: per-host priority windows at politeness spacing under
  *    those quotas.
  *
  * No eligible host (all backoff, or no successes yet) plans an EMPTY
  * wave rather than throwing — a paused crawler, not a crashed one.
  *
  * Scale shape: state is host-grained (counters), every batch step is
  * one map-side-combinable groupBy + a broadcast-sized panel merge;
  * wave planning shuffles only the URL relation through the one
  * schedule window. The durable twin commits each batch's DELTA
  * panel under its batch id ([[DurableLedger]] OCC), so restart and
  * replay re-derive identical waves.
  */
object StreamCrawlControl {

  /** One log slice's mergeable panel: per-host status-class counts
    * ([[Frontier.statusTriage]]'s aggregate WITHOUT the derived
    * ratio — ratios do not merge; counters do).
    */
  private[streaming] def panelOf(log: DataFrame, hostCol: String,
      statusCol: String): DataFrame = {
    val s = col(statusCol)
    def cls(lo: Int, hi: Int) =
      sum(when(s >= lo && s <= hi, 1L).otherwise(0L))
    log.groupBy(col(hostCol).as("host"))
      .agg(count(lit(1)).as("n_fetches"),
        cls(200, 299).as("n_2xx"), cls(300, 399).as("n_3xx"),
        cls(400, 499).as("n_4xx"), cls(500, 599).as("n_5xx"))
  }

  private val PanelCols = Seq("n_fetches", "n_2xx", "n_3xx", "n_4xx", "n_5xx")

  private[streaming] def mergePanels(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("host"))
      .agg(sum(col(PanelCols.head)).as(PanelCols.head),
        PanelCols.tail.map(c => sum(col(c)).as(c)): _*)

  /** [[Frontier.statusTriage]]'s derived columns over a folded panel —
    * public so callers can apportion their own mass from it.
    */
  def triageOf(panel: DataFrame, backoffPpm: Long): DataFrame = {
    require(backoffPpm >= 0, s"backoffPpm must be non-negative: $backoffPpm")
    panel
      .withColumn("error_ppm",
        expr("(n_4xx + n_5xx) * CAST(1000000 AS BIGINT) div n_fetches"))
      .withColumn("backoff", (col("error_ppm") >= backoffPpm).cast("int"))
  }

  /** Plan one wave from a folded panel: triage, success-mass
    * apportionment of `budget` over non-backoff hosts, budgeted
    * politeness schedule of `urls`. Output is
    * [[Frontier.scheduleBudgeted]]'s.
    */
  def waveOf(panel: DataFrame, backoffPpm: Long,
      urls: DataFrame, idCol: String, hostCol: String,
      priorityCol: org.apache.spark.sql.Column,
      delays: DataFrame, defaultDelayMs: Long,
      budget: Long, hardCap: Int): DataFrame = {
    val spark = panel.sparkSession
    val mass = triageOf(panel, backoffPpm)
      .filter(col("backoff") === 0 && col("n_2xx") > 0)
      .select(col("host"), col("n_2xx").as("mass"))
    // apportion requires positive total mass; an all-backoff (or
    // never-successful) panel plans an empty wave instead
    val budgets =
      if (mass.limit(1).count() == 0L)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("host", StringType),
            StructField("quota", LongType))))
      else Frontier.apportion(mass, "host", "mass", budget)
        .select(col("host"), col("quota"))
    Frontier.scheduleBudgeted(urls, idCol, hostCol, priorityCol,
      delays, defaultDelayMs, budgets, "host", "quota", hardCap)
  }

  /** In-memory session: the maintained state is the folded panel. */
  final class ControlSession(hostCol: String, statusCol: String) {
    @volatile private var panel: DataFrame = null

    def currentPanel: DataFrame = {
      require(panel != null, "panel requested before any ingest")
      panel
    }

    def ingest(logBatch: DataFrame): Unit = {
      val p = panelOf(logBatch, hostCol, statusCol)
      panel = (if (panel == null) p else mergePanels(panel, p))
        .localCheckpoint()
    }

    def nextWave(backoffPpm: Long, urls: DataFrame, idCol: String,
        uHostCol: String, priorityCol: org.apache.spark.sql.Column,
        delays: DataFrame, defaultDelayMs: Long,
        budget: Long, hardCap: Int): DataFrame =
      waveOf(currentPanel, backoffPpm, urls, idCol, uHostCol, priorityCol,
        delays, defaultDelayMs, budget, hardCap)

    def start(log: DataFrame): StreamingQuery =
      log.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private val PanelSchema = StructType(
    StructField("host", StringType) +:
      PanelCols.map(c => StructField(c, LongType)))

  /** Durable twin (fixed `(host, status)` input columns): each batch
    * commits its DELTA panel under the batch id — a pure function of
    * the batch alone, so replay publishes identical rows and
    * [[DurableLedger.commit]]'s first-writer-wins keeps duplicates
    * harmless; the folded panel is one sum over the ledger. Restart
    * is reopening the path. Commits carry per-directory `host`
    * min/max stats, so [[panelSlice]] reads prune batch directories
    * (and the compaction segment) whose host range provably misses.
    */
  final class DurableControlSession(spark: SparkSession, path: String,
      compactEvery: Int = 0) {

    private def fold(ledger: DataFrame): DataFrame =
      ledger.groupBy(col("host"))
        .agg(sum(col(PanelCols.head)).as(PanelCols.head),
          PanelCols.tail.map(c => sum(col(c)).as(c)): _*)

    def currentPanel: DataFrame =
      fold(DurableLedger.load(spark, path, PanelSchema))

    /** The panel restricted to hosts in `[loHost, hiHost]` — the
      * operational read ("how is this host family doing?") that pays
      * for the stats: directories whose host range cannot overlap are
      * never scanned ([[DurableLedger.loadWhere]]; pruning is a
      * superset read, the real filter applies below, so results are
      * identical with or without stats — spec-pinned, including after
      * compaction folds the stats).
      */
    def panelSlice(loHost: String, hiHost: String): DataFrame =
      fold(DurableLedger.loadWhere(spark, path, PanelSchema,
          Seq(DurableLedger.Bound("host", Some(loHost), Some(hiHost))))
        .filter(col("host") >= loHost && col("host") <= hiHost))

    def ingest(logBatch: DataFrame, batchId: Long): Unit = {
      val delta = panelOf(logBatch.select(col("host"), col("status")),
        "host", "status")
      DurableLedger.commit(delta, path, batchId, statsCols = Seq("host"))
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, path, PanelSchema, compactEvery)
    }

    /** Out-of-band compaction (the maintenance turn when
      * `compactEvery` is off). Returns folded directory count.
      */
    def compactNow(): Int = DurableLedger.compact(spark, path, PanelSchema)

    def nextWave(backoffPpm: Long, urls: DataFrame, idCol: String,
        uHostCol: String, priorityCol: org.apache.spark.sql.Column,
        delays: DataFrame, defaultDelayMs: Long,
        budget: Long, hardCap: Int): DataFrame =
      waveOf(currentPanel, backoffPpm, urls, idCol, uHostCol, priorityCol,
        delays, defaultDelayMs, budget, hardCap)

    def start(log: DataFrame,
        checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = log.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingest(batch, batchId)
      }.start()
    }
  }
}
