package graft.exchange

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{Ledger, Packer}

/** The deferred/batch exchange — the reference's OpenAI Batch flow
  * (SURVEY.md §3.3; `batch_file_station.py:120-420`) restated as two
  * restartable jobs around a file boundary:
  *
  *  1. '''ship''': pending ledger rows (`batch_id` null) → JSONL files
  *     under the packer limits → hand file paths to a [[BatchApi]] →
  *     stamp `batch_id`;
  *  2. '''collect''': read result JSONL (`spark.read.json`), MERGE
  *     responses by `custom_id`, and reset `batch_id := null` on
  *     requests the batch lost so the next ship re-sends them.
  *
  * Everything between the two calls lives in tables + files — the
  * 24-hour completion window means each side must be runnable in a
  * fresh session with no driver state (SURVEY.md §7.5 risk 2). The spec
  * proves that by running ship and collect in separate "sessions" over
  * the same parquet ledger.
  */
object BatchExchange {

  /** External batch API boundary: receives request files, returns a
    * batch id; later exposes result files per batch id. Local mock in
    * tests; the real impl is driver-side HTTP (out of engine scope).
    */
  trait BatchApi extends Serializable {
    def submit(requestFiles: Seq[String]): String
    /** Paths of result JSONL files, or None while still running. */
    def results(batchId: String): Option[Seq[String]]
  }

  /** Ship pending rows: pack → write one JSONL file per `file_id` →
    * write a manifest → submit → return the ledger with `batch_id`
    * stamped on shipped rows. `workDir` holds the request files.
    *
    * The manifest (`_manifest.json`, written atomically via
    * temp+rename AFTER the data files) is the commit record: a crash
    * mid-write leaves no manifest, and the next ship overwrites the
    * partial files — the API is only ever handed a completed file set.
    */
  def ship(ledger: DataFrame, api: BatchApi, workDir: String,
      limits: Packer.PackLimits = Packer.StationLimits,
      maxBatchTokens: Long = Long.MaxValue): (DataFrame, Option[String]) = {
    val spark = ledger.sparkSession
    import spark.implicits._
    // maxBatchTokens caps the WHOLE batch in the quota's real dimension:
    // the reference wires api_key_bundle.batch_queue_limit into the
    // packer as max_tokens_per_file with max_files=1
    // (`batch_file_station.py:450`). Rows are taken in custom_id order
    // until the running token total hits the cap — a DETERMINISTIC
    // subset: an unordered limit() here would re-evaluate differently
    // per downstream action, shipping one subset to the API while
    // stamping another onto the ledger. See [[tokenCappedPrefix]] for
    // why the running sum is two-phase.
    val pendingAll = Ledger.pendingForShipment(ledger)
    val pending =
      if (maxBatchTokens < Long.MaxValue) tokenCappedPrefix(pendingAll, maxBatchTokens)
      else pendingAll
    if (pending.isEmpty) return (ledger, None)
    // persisted so ONE materialized pack feeds the file write, the
    // manifest count, and the batch_id stamp
    val packed = Packer.pack(
      pending.select("custom_id", "body_json", "input_tokens").coalesce(1), limits)
      .persist()
    // one JSONL file per pack bucket; the API gets the actual data
    // files, not the partition directories Spark writes them under.
    // File listing and the manifest go through the Hadoop FileSystem
    // API so workDir may live on any filesystem, not just local disk.
    val outDir = s"$workDir/requests"
    packed.select($"file_id", $"body_json").write.mode("overwrite")
      .partitionBy("file_id").text(outDir)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(outPath)
      .filter(_.getPath.getName.startsWith("file_id="))
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(_.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString).sorted.toSeq
    // one batch's ids are control-plane sized (≤ packer maxRequests);
    // collecting them pins the exact shipped set for the stamp join and
    // lets the pack cache release before returning
    val shippedIds = packed.select($"custom_id").as[String].collect().toSeq
    packed.unpersist()
    writeManifest(fs, outDir, files, shippedIds.length.toLong)
    val batchId = api.submit(files)
    val shippedDf = shippedIds.toDF("custom_id").withColumn("__shipped", lit(true))
    val stamped = ledger.join(broadcast(shippedDf), Seq("custom_id"), "left")
      .withColumn("batch_id",
        when($"__shipped" && col("batch_id").isNull, lit(batchId))
          .otherwise(col("batch_id")))
      .drop("__shipped")
    (stamped, Some(batchId))
  }

  /** The maximal custom_id-ordered prefix whose running `input_tokens`
    * total stays within `maxBatchTokens`.
    *
    * The running sum is TWO-PHASE (the zipfSlope rank pattern):
    * range-partition on custom_id, a PARTITIONED running-sum window,
    * then per-partition token totals cumulated on the driver (one row
    * per shuffle partition — control-plane sized) and broadcast back as
    * offsets. The packed ship OUTPUT is control-plane sized, but this
    * INPUT is the entire pending frontier — an unpartitioned
    * `Window.orderBy` would pull all of it through one task. Partition
    * assignment is pinned with `localCheckpoint` because the offset
    * aggregate and the window must see the SAME pids
    * (`repartitionByRange` samples its bounds). The selected prefix is
    * identical to the single-window formulation: custom_id is a total
    * order, so per-partition cumsum + preceding-partition offsets IS
    * the global running sum.
    */
  private[graft] def tokenCappedPrefix(
      pendingAll: DataFrame, maxBatchTokens: Long): DataFrame = {
    val spark = pendingAll.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val parted = pendingAll
      .repartitionByRange(col("custom_id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val sums = parted.groupBy(col("__pid"))
      .agg(sum(col("input_tokens")).cast("long").as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, t) => val off = acc; acc += t; (pid, off) }
    val w = Window.partitionBy(col("__pid")).orderBy(col("custom_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .join(broadcast(offsets.toSeq.toDF("__pid", "__off")), "__pid")
      .withColumn("__cum", sum(col("input_tokens")).over(w) + col("__off"))
      .filter(col("__cum") <= maxBatchTokens)
      .drop("__cum", "__pid", "__off")
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      outDir: String, files: Seq[String], nRequests: Long): Unit = {
    val json =
      s"""{"n_files":${files.length},"n_requests":$nRequests,"files":[${
        files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"").mkString(",")
      }]}"""
    val tmp = new org.apache.hadoop.fs.Path(outDir, "._manifest.json.tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val dst = new org.apache.hadoop.fs.Path(outDir, "_manifest.json")
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"manifest rename failed: $tmp -> $dst")
  }

  /** The committed file set of the last completed ship, or None if no
    * completed ship exists (crashed mid-write or never ran).
    */
  def readManifest(workDir: String,
      hadoopConf: org.apache.hadoop.conf.Configuration): Option[(Seq[String], Long)] = {
    // the caller must supply the session's hadoopConfiguration — the
    // same conf ship() wrote with — so non-default filesystems (s3a
    // credentials etc.) resolve; a bare `new Configuration()` default
    // silently dropped them
    val p = new org.apache.hadoop.fs.Path(s"$workDir/requests", "_manifest.json")
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    import scala.jdk.CollectionConverters._
    Some((node.get("files").elements().asScala.map(_.asText()).toSeq,
      node.get("n_requests").asLong()))
  }

  /** Collect one batch's results (no-op while the API reports it
    * running): ingest responses by custom_id; unanswered shipped rows
    * get `batch_id` reset for re-ship.
    */
  def collect(ledger: DataFrame, api: BatchApi, batchId: String): DataFrame =
    api.results(batchId) match {
      case None => ledger // still running
      case Some(paths) => ingestResults(ledger, batchId, paths)
    }

  /** Ingest already-downloaded result files for one batch — split out of
    * [[collect]] so callers that fetch the result paths themselves (the
    * station pass gates on the fetch succeeding BEFORE marking the batch
    * processed) do not hit the API a second time.
    */
  def ingestResults(ledger: DataFrame, batchId: String, paths: Seq[String]): DataFrame = {
    val spark = ledger.sparkSession
    import spark.implicits._
    val raw = spark.read.text(paths: _*)
    val responses = raw.select(
      get_json_object($"value", "$.custom_id").as("custom_id"),
      $"value".as("response_json"))
      .filter($"custom_id".isNotNull)
    val ingested = Ledger.ingestResponses(ledger, responses)
    Ledger.resetMissing(ingested, batchId, responses.select("custom_id"))
  }
}
