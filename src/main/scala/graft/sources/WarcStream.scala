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
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

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

  // ---- Trigger.AvailableNow ----------------------------------------
  // Without this, Spark falls back to ONE unbounded batch and IGNORES
  // the admission limits (MicroBatchExecution's documented fallback) —
  // the exact backlog-restart hazard admission control exists for. The
  // contract: snapshot the listing when the query starts; every batch
  // admits from the snapshot under the configured limits; the query
  // terminates once the committed offset reaches the snapshot. Files
  // landing mid-run wait for the next start (or a continuous trigger).
  private var prepared: Seq[String] = null

  override def prepareForTriggerAvailableNow(): Unit = prepared = listNow()

  /** The file universe for this planning call: the AvailableNow
    * snapshot when prepared, a fresh listing otherwise.
    */
  private def universe(): Seq[String] =
    if (prepared != null) prepared else listNow()

  override def latestOffset(): Offset = WarcFilesOffset(universe())

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

  private[graft] def admit(fresh: Seq[String],
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Seq[String] =
    limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        fresh.take(mf.maxFiles())
      case mb: org.apache.spark.sql.connector.read.streaming.ReadMaxBytes =>
        // STRICT PREFIX of the canonical order: admit until the first
        // file that does not fit, then stop — never skip-and-continue.
        // Skipping an over-budget file while admitting later smaller
        // ones starved a large segment indefinitely in a continuously
        // growing store (it was only admitted when it happened to head
        // the fresh list); the prefix guarantees every file is admitted
        // within a bounded number of batches, matching upstream Spark's
        // maxBytesPerTrigger semantics. The first file always admits
        // even past the budget (a segment larger than the whole budget
        // must still drain).
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var used = 0L
        val it = fresh.iterator
        var full = false
        while (!full && it.hasNext) {
          val e = it.next()
          val len = entryLen(e)
          if (out.isEmpty || used + len <= mb.maxBytes()) { out += e; used += len }
          else full = true
        }
        out.toSeq
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.foldLeft(fresh)((acc, l) => admit(acc, l))
      case _ => fresh
    }

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val seen = start.asInstanceOf[WarcFilesOffset].files
    val fresh = universe().filterNot(seen.toSet)
    WarcFilesOffset((seen ++ admit(fresh, limit)).sorted)
  }

  override def reportLatestOffset(): Offset = WarcFilesOffset(universe())

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
  * strings with FULL string escaping (quotes, backslashes, and control
  * characters as `\uXXXX`), so the round trip through the checkpoint
  * offset log is exact for any legal path.
  */
final case class WarcFilesOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.map { f =>
      val sb = new StringBuilder("\"")
      f.foreach {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"').toString
    }.mkString("[", ",", "]")
}

object WarcFilesOffset {
  /** Parse a JSON string array. Decodes the FULL JSON escape set
    * (`\" \\ \/ \b \f \n \r \t \uXXXX`) — this scanner also parses the
    * Spark-produced `paths` option ([[WarcDataSource.resolvePaths]]),
    * which escapes control and non-ASCII characters the standard way;
    * a decoder handling only quote/backslash silently mangled such
    * paths (`\n` → literal `n`) and missed the files. An escape
    * outside the JSON set fails loudly rather than guessing.
    */
  def fromJson(json: String): WarcFilesOffset = {
    val t = json.trim
    require(t.startsWith("[") && t.endsWith("]"), s"bad warc offset: $json")
    val body = t.substring(1, t.length - 1)
    if (body.isEmpty) return WarcFilesOffset(Nil)
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < body.length) {
      val ch = body.charAt(i)
      if (inStr && ch == '\\') {
        require(i + 1 < body.length, s"dangling escape in warc offset: $json")
        body.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            require(i + 5 < body.length, s"truncated \\u escape: $json")
            sb.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other =>
            throw new IllegalArgumentException(
              s"unsupported JSON escape \\$other in warc offset/paths: $json")
        }
      } else if (ch == '"') {
        if (inStr) { out += sb.toString; sb.clear() }
        inStr = !inStr
        i += 1
      } else {
        if (inStr) sb.append(ch)
        // commas/whitespace between strings are skipped
        i += 1
      }
    }
    WarcFilesOffset(out.toSeq)
  }
}
