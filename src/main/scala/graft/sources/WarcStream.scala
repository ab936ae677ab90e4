package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("warc")` — the continuous-ingest half of
  * the WARC file source: a live crawl store grows by segment files,
  * and each micro-batch processes exactly the files that appeared
  * since the last committed offset (file-level exactly-once through
  * the checkpointed offset log; a file is assumed COMPLETE when
  * listed — the [[WarcDataWriter]] temp-write + rename publication
  * guarantees that for stores this library writes, and any
  * atomic-rename producer matches the contract).
  *
  * The offset is the SET of `length:path` entries seen so far
  * (order-canonicalized JSON). That keeps the source log-free and
  * correct under out-of-order file names, at the cost of offset size
  * linear in total file count — right for segment-grained stores
  * (thousands of multi-GB files), and the documented trade against a
  * compacted file log for million-file layouts. Host-directory
  * pruning and pushed filters apply exactly as in the batch scan;
  * per-batch files split at `maxSplitBytes` through the same
  * record-boundary discipline and the SAME reader.
  */
final class WarcMicroBatchStream(paths: Seq[String], pushed: Array[Filter],
    required: StructType, maxSplitBytes: Long, splittable: Boolean,
    recordGzip: Boolean = false, maxFilesPerTrigger: Int = 0,
    openCostBytes: Long = 4L * 1024 * 1024, maxBytesPerTrigger: Long = 0L)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private def listNow(): Seq[String] = {
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val out = ArrayBuffer.empty[String]
    paths.foreach { one =>
      val root = new Path(one)
      val fs = root.getFileSystem(hconf)
      if (fs.exists(root)) {
        val it = fs.listFiles(root, true)
        while (it.hasNext) {
          val st = it.next()
          val base = st.getPath.getName
          if (st.isFile && st.getLen > 0 &&
              !base.startsWith("_") && !base.startsWith(".") &&
              WarcDataSource.dirMayMatch(pushed,
                WarcDataSource.dirHost(st.getPath.toString)))
            out += s"${st.getLen}:${st.getPath.toString}"
        }
      }
    }
    out.sorted.toSeq
  }

  override def initialOffset(): Offset = WarcFilesOffset(Nil)

  override def latestOffset(): Offset = WarcFilesOffset(listNow())

  // ---- admission control: bound each micro-batch's intake ----------
  // A restart against a year of backlog (or the first run over an
  // existing 100 TB store) would otherwise plan ONE batch over every
  // segment; `maxFilesPerTrigger` / `maxBytesPerTrigger` take the
  // fresh files in canonical (sorted length:path) order up to the
  // budget — bytes is the better budget when segment sizes vary, and
  // both compose (whichever bites first). At least one file is always
  // admitted (a segment larger than the byte budget must still
  // drain). The offset after each batch is start ∪ taken, so the
  // backlog drains in bounded, checkpointed steps, each exactly-once
  // like any other batch.
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.{ReadLimit => RL}
    val limits = Seq(
      if (maxFilesPerTrigger > 0) Some(RL.maxFiles(maxFilesPerTrigger)) else None,
      if (maxBytesPerTrigger > 0) Some(RL.maxBytes(maxBytesPerTrigger)) else None
    ).flatten
    limits match {
      case Nil => RL.allAvailable()
      case Seq(one) => one
      case many => RL.compositeLimit(many.toArray)
    }
  }

  private def entryLen(e: String): Long =
    e.substring(0, e.indexOf(':')).toLong

  private def admit(fresh: Seq[String],
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Seq[String] =
    limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        fresh.take(mf.maxFiles())
      case mb: org.apache.spark.sql.connector.read.streaming.ReadMaxBytes =>
        // always admit the first file, then stop before the budget bursts
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var used = 0L
        fresh.foreach { e =>
          val len = entryLen(e)
          if (out.isEmpty || used + len <= mb.maxBytes()) { out += e; used += len }
        }
        out.toSeq
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.foldLeft(fresh)((acc, l) => admit(acc, l))
      case _ => fresh
    }

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val seen = start.asInstanceOf[WarcFilesOffset].files
    val fresh = listNow().filterNot(seen.toSet)
    WarcFilesOffset((seen ++ admit(fresh, limit)).sorted)
  }

  override def reportLatestOffset(): Offset = WarcFilesOffset(listNow())

  override def deserializeOffset(json: String): Offset =
    WarcFilesOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcFilesOffset].files.toSet
    val fresh = end.asInstanceOf[WarcFilesOffset].files.filterNot(seen)
    // a path reappearing under a DIFFERENT length means the segment
    // was appended to or overwritten in place — the immutability
    // contract is violated, and silently replanning the whole file
    // would re-emit every record it already produced. Fail loudly
    // instead (the offset keys on length:path, so the violation is
    // detectable exactly here).
    val seenLen = seen.iterator.map { e =>
      val i = e.indexOf(':')
      e.substring(i + 1) -> e.substring(0, i)
    }.toMap
    val files = fresh.map { entry =>
      val i = entry.indexOf(':')
      val len = entry.substring(0, i).toLong
      val p = entry.substring(i + 1)
      seenLen.get(p).foreach { old =>
        throw new IllegalStateException(
          s"warc stream source: $p changed length ($old -> $len) after " +
            "being processed — segment files must be immutable " +
            "(write via temp + atomic rename, as the warc sink does)")
      }
      (p, len)
    }
    // listNow already applied directory pruning, so pass no filters
    // here (re-applying is harmless but redundant); chunking + bin
    // packing are the batch scan's exact law
    WarcDataSource.planChunks(files, Array.empty, splittable, recordGzip,
      maxSplitBytes, openCostBytes)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, pushed, recordGzip,
      new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Canonical-order file-set offset. Equality is set equality because
  * the entry list is sorted at construction; JSON is one array of
  * strings (paths escaped minimally — quotes and backslashes).
  */
final case class WarcFilesOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object WarcFilesOffset {
  def fromJson(json: String): WarcFilesOffset = {
    val t = json.trim
    require(t.startsWith("[") && t.endsWith("]"), s"bad warc offset: $json")
    val body = t.substring(1, t.length - 1)
    if (body.isEmpty) return WarcFilesOffset(Nil)
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var esc = false
    body.foreach { ch =>
      if (esc) { sb.append(ch); esc = false }
      else if (ch == '\\' && inStr) esc = true
      else if (ch == '"') {
        if (inStr) { out += sb.toString; sb.clear() }
        inStr = !inStr
      } else if (inStr) sb.append(ch)
      // commas/whitespace between strings are skipped
    }
    WarcFilesOffset(out.toSeq)
  }
}
