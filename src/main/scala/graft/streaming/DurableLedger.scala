package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Durable, replay-idempotent ledger persistence for the streaming
  * sessions — the parquet deployment seam the in-memory
  * localCheckpointed ledgers document ("a production deployment keys
  * the ledger in a Delta/parquet table and merges only the batch's
  * rows"). With it, a dedup or index session survives a process
  * restart: state is on disk, not in the driver.
  *
  * Layout: `<path>/b<batchId>/` — ONE directory per committed
  * micro-batch, holding that batch's NEW rows only, written with
  * overwrite. Two properties follow:
  *
  *  - exactly-once ledger contents without a transaction log: a batch
  *    replayed after a crash rewrites ITS OWN directory and touches
  *    nothing else (the idempotent-foreachBatch sink discipline).
  *    Writers must derive the committed rows deterministically from
  *    (batch, ledger-excluding-this-batch) — the sessions here
  *    anti-join the batch against [[load]] with `excludeBatch` set to
  *    the current id, so a replay cannot read back its own partial
  *    write;
  *  - O(batch) commit cost: the ledger grows by one append per batch,
  *    never an O(corpus) rewrite — the property that makes a
  *    continuously-ingesting 100 TB corpus affordable. Readers union
  *    the batch directories; an out-of-band compaction job may fold
  *    old directories without changing semantics, and a Delta MERGE
  *    drops into the same seam unchanged.
  */
object DurableLedger {

  private def dir(path: String, batchId: Long) = s"$path/b$batchId"

  /** Batch ids present under `path` (sorted ascending). */
  def batches(path: String): Seq[Long] = {
    val d = new java.io.File(path)
    if (!d.isDirectory) Nil
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
      .flatMap(f => scala.util.Try(f.getName.drop(1).toLong).toOption)
      .sorted
  }

  /** The ledger contents, excluding `excludeBatch`'s directory when
    * set (pass the CURRENT batch id from inside foreachBatch, so a
    * replay never reads its own earlier partial write). Empty frame
    * with `schema` when nothing is committed yet.
    */
  def load(spark: SparkSession, path: String, schema: StructType,
      excludeBatch: Option[Long] = None): DataFrame = {
    val ids = batches(path).filterNot(excludeBatch.contains)
    if (ids.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(ids.map(dir(path, _)): _*)
  }

  /** Overwrite-commit `rows` as batch `batchId`'s directory. */
  def commit(rows: DataFrame, path: String, batchId: Long): Unit =
    rows.write.mode("overwrite").parquet(dir(path, batchId))
}
