package graft.sources

import java.io.OutputStream
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.Warc

/** The write half of `format("warc")` — `df.write.format("warc")
  * .save(dir)`: each task STREAMS its partition's records through
  * [[Warc.format]] (byte-identical to the codec the reader and the
  * blob path parse) into per-key temp files, so a corpus written here
  * round-trips through either read path exactly and a multi-GB task
  * partition never buffers on-heap (records flow straight to the
  * filesystem stream; only the open stream handles live in memory).
  *
  * Input columns: `warc_type`, `target_uri`, `warc_date` (strings,
  * null → empty) and `payload` (binary, null → empty). An optional
  * `host` column combined with `option("partitionByHost", true)`
  * writes the hive-layout store (`host=<h>/part-*.warc`) whose
  * directories the read side prunes — the layout a 100 TB crawl
  * store wants. `option("compress", "gzip")` emits `.warc.gz`
  * segments (JDK gzip; the reader treats them as whole-file splits);
  * `option("compress", "record-gzip")` emits one gzip member per
  * record — the CommonCrawl layout the reader can split.
  *
  * `mode("overwrite")` truncates: existing data files under the
  * target (and its `host=` subdirectories) are deleted on the driver
  * when the batch write is planned — before any task runs, non-atomic
  * by design (the same visibility window every non-transactional file
  * sink has; the [[graft.streaming.DurableLedger]] seam is the
  * transactional alternative). Dotfiles/underscore files are spared,
  * matching what the read side ignores.
  *
  * Task commit protocol: every attempt writes to a UNIQUE temp file
  * and renames into place on task commit. The FINAL name is a pure
  * function of (write job, partition) — `part-<job uuid>-p<id>` for
  * batch, `part-<query id>-e<epoch>-p<id>` for streaming — so rename
  * is the idempotency line. Within ONE batch job Spark's task-commit
  * coordinator already serializes attempts (one commit per
  * partition); the deterministic names close the cases the
  * coordinator cannot: a streaming epoch REPLAYED after a restart
  * re-commits with fresh coordinator state (the pre-r12 name embedded
  * the per-attempt task id, so a replay published DUPLICATE files;
  * now it collides on the same name and drops a byte-identical copy),
  * and any coordinator-less runner gets the same protection for
  * speculative twins. Job abort deletes temps. All
  * file access goes through the SESSION Hadoop conf captured at
  * planning ([[SerializableHadoopConf]]) so executors resolve the
  * same filesystem the driver did. No job-level manifest: a WARC
  * store is append-shaped, and readers list files, never a log.
  *
  * `df.writeStream.format("warc")` (append mode) archives a live
  * stream into the same store layout: one file set per micro-batch,
  * epoch-deterministic names, replay-idempotent by the rename
  * protocol under Structured Streaming's deterministic-batch
  * contract. The store then feeds `readStream.format("warc")`
  * downstream — the crawl → archive → extract loop entirely on this
  * source.
  */
final class WarcWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  private def partitionByHost =
    "true".equalsIgnoreCase(info.options.getOrDefault("partitionByHost", "false"))
  private def compress =
    info.options.getOrDefault("compress", "none").toLowerCase

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new WarcBatchWrite(path, info.schema(), partitionByHost, compress,
        truncate = doTruncate)
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(!doTruncate,
        "the warc sink is append-only as a streaming sink (no complete/truncate mode)")
      new WarcStreamingWrite(path, info.schema(), partitionByHost, compress,
        info.queryId())
    }
  }
}

final class WarcBatchWrite(path: String, schema: StructType,
    partitionByHost: Boolean, compress: String, truncate: Boolean)
    extends BatchWrite {
  require(Set("none", "gzip", "record-gzip").contains(compress),
    s"compress must be none | gzip | record-gzip: $compress")

  /** Delete existing DATA files (recursively; `_`/`.` names spared,
    * the read side's ignore set) — the overwrite contract. Runs on
    * the driver, once, before the writer factory ships.
    */
  private def truncateNow(conf: org.apache.hadoop.conf.Configuration): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return
    val it = fs.listFiles(root, true)
    val doomed = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val st = it.next()
      val base = st.getPath.getName
      if (st.isFile && !base.startsWith("_") && !base.startsWith("."))
        doomed += st.getPath
    }
    doomed.foreach(fs.delete(_, false))
  }

  // one tag per write JOB (driver-side): attempts of a task share it,
  // separate appends to the same store do not. The FULL 128-bit UUID:
  // a truncated tag colliding across two appends would make the rename
  // protocol silently drop a NON-identical file as a presumed duplicate
  // — collision probability must be negligible, not merely small
  private val jobTag =
    java.util.UUID.randomUUID().toString.replace("-", "")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    if (truncate) truncateNow(conf.value)
    new WarcWriterFactory(path, schema, partitionByHost, compress, jobTag, conf)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private final case class WarcCommit(files: Seq[String])
    extends WriterCommitMessage

final class WarcWriterFactory(path: String, schema: StructType,
    partitionByHost: Boolean, compress: String, jobTag: String,
    conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(path, schema, partitionByHost, compress,
      fileTag = f"$jobTag-p$partitionId%05d", conf)
}

/** Streaming half of the sink: epoch-deterministic file names
  * (`part-<queryId>-e<epoch>-p<partition>`, the FULL dash-stripped
  * query UUID), so a replayed micro-batch after restart re-derives the
  * same names and the rename protocol drops the duplicates —
  * exactly-once files under Structured Streaming's deterministic-batch
  * contract. The query id is checkpoint-stable (restarts keep it), and
  * carrying all 128 bits keeps a cross-query tag collision (which
  * would silently drop a NON-identical file as a presumed duplicate)
  * out of practical reach. Epoch commit is the task-level rename;
  * `commit(epochId)` has nothing left to do.
  */
final class WarcStreamingWrite(path: String, schema: StructType,
    partitionByHost: Boolean, compress: String, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  require(Set("none", "gzip", "record-gzip").contains(compress),
    s"compress must be none | gzip | record-gzip: $compress")
  private val qTag = queryId.replace("-", "")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    new WarcStreamingWriterFactory(path, schema, partitionByHost, compress,
      qTag, conf)
  }
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

final class WarcStreamingWriterFactory(path: String, schema: StructType,
    partitionByHost: Boolean, compress: String, qTag: String,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(path, schema, partitionByHost, compress,
      fileTag = f"$qTag-e$epochId-p$partitionId%05d", conf)
}

/** Streams records per output file (one per host under
  * `partitionByHost`, else one per task): the temp file opens at the
  * key's FIRST record and every record's bytes go straight through it
  * ([[Warc.format]], gzip-wrapped when whole-file compression is on),
  * so task memory holds open streams, never content. Publish is
  * temp-write + rename on commit; `fileTag` IS the final name's
  * identity (`part-<fileTag>`), deterministic across attempts and
  * replays — see the rename-idempotency protocol in the builder doc.
  */
final class WarcDataWriter(path: String, schema: StructType,
    partitionByHost: Boolean, compress: String, fileTag: String,
    conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {

  private val gzip = compress == "gzip"
  private val recordGzip = compress == "record-gzip"

  private val idx = Map(
    "warc_type" -> schema.fieldNames.indexOf("warc_type"),
    "target_uri" -> schema.fieldNames.indexOf("target_uri"),
    "warc_date" -> schema.fieldNames.indexOf("warc_date"),
    "payload" -> schema.fieldNames.indexOf("payload"),
    "host" -> schema.fieldNames.indexOf("host"))
  require(idx("payload") >= 0, "warc write requires a payload column")
  require(!partitionByHost || idx("host") >= 0,
    "partitionByHost requires a host column")

  /** key → (temp path, final path, open stream). LinkedHashMap keeps
    * commit order deterministic.
    */
  private val open = scala.collection.mutable.LinkedHashMap
    .empty[String, (Path, Path, OutputStream)]

  private def str(row: InternalRow, name: String): String = {
    val i = idx(name)
    if (i < 0 || row.isNullAt(i)) ""
    else row.get(i, org.apache.spark.sql.types.StringType)
      .asInstanceOf[UTF8String].toString
  }

  private def streamFor(key: String): OutputStream =
    open.getOrElseUpdate(key, {
      val dir = if (partitionByHost) s"$path/host=$key" else path
      val ext = if (gzip || recordGzip) ".warc.gz" else ".warc"
      val fin = new Path(dir, s"part-$fileTag$ext")
      val tmp = new Path(dir,
        s".part-$fileTag-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val fs = fin.getFileSystem(conf.value)
      val raw = fs.create(tmp, true)
      val out: OutputStream = if (gzip) new GZIPOutputStream(raw) else raw
      (tmp, fin, out)
    })._3

  override def write(row: InternalRow): Unit = {
    val payload =
      if (row.isNullAt(idx("payload"))) Array.emptyByteArray
      else row.getBinary(idx("payload"))
    val rec = Warc.format(Seq(Warc.WarcRecord(
      str(row, "warc_type"), str(row, "target_uri"), str(row, "warc_date"),
      payload)))
    val key = if (partitionByHost) str(row, "host") else ""
    // record-gzip: each record is its OWN gzip member (the CommonCrawl
    // layout — the read side can then split the compressed file)
    streamFor(key).write(if (recordGzip) GzipMembers.gzipMember(rec) else rec)
  }

  override def commit(): WriterCommitMessage = {
    val files = open.map { case (_, (tmp, fin, out)) =>
      out.close() // GZIPOutputStream.close finishes the member
      val fs = fin.getFileSystem(conf.value)
      if (!fs.rename(tmp, fin)) {
        // a speculative twin already published this task's file; the
        // content is a pure function of the partition, so drop ours
        fs.delete(tmp, false)
      }
      fin.toString
    }.toSeq
    open.clear()
    WarcCommit(files)
  }

  override def abort(): Unit = {
    open.values.foreach { case (tmp, _, out) =>
      scala.util.Try(out.close())
      scala.util.Try(tmp.getFileSystem(conf.value).delete(tmp, false))
    }
    open.clear()
  }

  override def close(): Unit = {
    open.values.foreach { case (tmp, _, out) =>
      scala.util.Try(out.close())
      scala.util.Try(tmp.getFileSystem(conf.value).delete(tmp, false))
    }
    open.clear()
  }
}
