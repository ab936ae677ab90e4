package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.Warc

/** The write half of `format("warc")` — `df.write.format("warc")
  * .save(dir)`: each task serializes its partition's records through
  * [[Warc.format]] (byte-identical to the codec the reader and the
  * blob path parse), so a corpus written here round-trips through
  * either read path exactly.
  *
  * Input columns: `warc_type`, `target_uri`, `warc_date` (strings,
  * null → empty) and `payload` (binary, null → empty). An optional
  * `host` column combined with `option("partitionByHost", true)`
  * writes the hive-layout store (`host=<h>/part-*.warc`) whose
  * directories the read side prunes — the layout a 100 TB crawl
  * store wants. `option("compress", "gzip")` emits `.warc.gz`
  * segments (JDK gzip; the reader treats them as whole-file splits).
  *
  * Task commit protocol: every attempt writes to a UNIQUE temp file
  * and renames into place on task commit (rename is the publish —
  * speculative duplicates of one task collide on the same final name,
  * first wins, the loser's rename failure aborts a file that is
  * byte-identical anyway); job abort deletes temps. No job-level
  * manifest: a WARC store is append-shaped, and readers list files,
  * never a log — the [[graft.streaming.DurableLedger]] seam is the
  * transactional alternative when one is needed.
  */
final class WarcWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new WarcBatchWrite(path, info.schema(),
        partitionByHost =
          "true".equalsIgnoreCase(info.options.getOrDefault("partitionByHost", "false")),
        compress = info.options.getOrDefault("compress", "none").toLowerCase)
  }
}

final class WarcBatchWrite(path: String, schema: StructType,
    partitionByHost: Boolean, compress: String) extends BatchWrite {
  require(Set("none", "gzip", "record-gzip").contains(compress),
    s"compress must be none | gzip | record-gzip: $compress")
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new WarcWriterFactory(path, schema, partitionByHost, compress)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private final case class WarcCommit(files: Seq[String])
    extends WriterCommitMessage

final class WarcWriterFactory(path: String, schema: StructType,
    partitionByHost: Boolean, compress: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(path, schema, partitionByHost, compress,
      partitionId, taskId)
}

/** Buffers records per output file (one per host under
  * `partitionByHost`, else one per task), serializes with
  * [[Warc.format]], publishes via temp-write + rename on commit.
  */
final class WarcDataWriter(path: String, schema: StructType,
    partitionByHost: Boolean, compress: String, partitionId: Int, taskId: Long)
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

  private val buffers =
    scala.collection.mutable.LinkedHashMap.empty[String, ByteArrayOutputStream]
  private val temps = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]

  private def str(row: InternalRow, name: String): String = {
    val i = idx(name)
    if (i < 0 || row.isNullAt(i)) ""
    else row.get(i, org.apache.spark.sql.types.StringType)
      .asInstanceOf[UTF8String].toString
  }

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
    val bytes = if (recordGzip) GzipMembers.gzipMember(rec) else rec
    buffers.getOrElseUpdate(key, new ByteArrayOutputStream()).write(bytes)
  }

  override def commit(): WriterCommitMessage = {
    val conf = new Configuration()
    val ext = if (gzip || recordGzip) ".warc.gz" else ".warc"
    val files = buffers.map { case (key, bos) =>
      val dir = if (partitionByHost) s"$path/host=$key" else path
      val fin = new Path(dir, f"part-$partitionId%05d-$taskId$ext")
      val tmp = new Path(dir, s".part-$partitionId-$taskId-${System.nanoTime()}.tmp")
      val fs = fin.getFileSystem(conf)
      val out = fs.create(tmp, true)
      try {
        if (gzip) {
          val gz = new GZIPOutputStream(out)
          gz.write(bos.toByteArray); gz.finish(); gz.close()
        } else { out.write(bos.toByteArray); out.close() }
      } finally scala.util.Try(out.close())
      temps += ((tmp, fin))
      if (!fs.rename(tmp, fin)) {
        // a speculative twin already published this task's file; the
        // content is a pure function of the partition, so drop ours
        fs.delete(tmp, false)
      }
      fin.toString
    }.toSeq
    WarcCommit(files)
  }

  override def abort(): Unit = {
    val conf = new Configuration()
    temps.foreach { case (tmp, _) =>
      scala.util.Try(tmp.getFileSystem(conf).delete(tmp, false))
    }
  }

  override def close(): Unit = buffers.clear()
}
