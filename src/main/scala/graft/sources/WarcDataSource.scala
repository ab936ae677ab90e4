package graft.sources

import java.util.{Locale, Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("warc")` — the DSv2 file source that makes WARC
  * segment FILES the pipeline's first stage (previously segments
  * entered as pre-loaded blob columns that [[graft.ingest.Warc.records]]
  * explodes; correct, but a 100 TB crawl store is a directory tree,
  * not a column). Same record grammar as [[graft.ingest.Warc.parse]]
  * (WARC/1.0 subset, `Content-Length`-honoring — never split-based);
  * `WarcSourceSpec` pins reader ≡ blob-parser record-for-record,
  * including the embedded-version-line trap and malformed-record
  * resilience.
  *
  * Output schema (fixed):
  * `(segment, host, warc_type, target_uri, warc_date, payload)` —
  * `host` is the `host=` partition-directory value when the file lives
  * under one (the hive-layout crawl store), otherwise the lowercased
  * authority of `WARC-Target-URI`.
  *
  * Scale features, in pipeline order:
  *  - **Partition pruning**: `host=<h>` directory segments are
  *    captured at planning; `host` filters (`=`, `IN`, prefix) drop
  *    whole files before any byte is read.
  *  - **Record-boundary splits**: files split at `maxSplitBytes`
  *    (default 128 MiB) BYTE ranges; each reader syncs forward to the
  *    first VALIDATED record start at-or-after its range start
  *    (strict token header names + `Content-Length` reaching EOF or a
  *    next record marker), owns every record whose start lies in its
  *    range, and reads past range end to finish its last record — the
  *    text-format split discipline. A payload that embeds a bare
  *    `WARC/1.0` line (the q136 trap) fails strict validation and
  *    cannot fool sync; a payload embedding a byte-exact COMPLETE
  *    valid record chain is the inherent ambiguity of entering any
  *    length-delimited stream mid-file — store such corpora
  *    record-gzipped or set `splittable=false`.
  *  - **Filter pushdown**: `host` / `target_uri` / `warc_type`
  *    equality, `IN`, and prefix filters are applied record-side
  *    BEFORE payload materialization (Spark re-applies them above the
  *    scan, so reader-side evaluation only ever skips work).
  *  - **Column pruning**: when `payload` is pruned the reader never
  *    copies payload bytes — `Content-Length` lets it SEEK over them,
  *    so a metadata-only query reads headers, not the corpus.
  *
  * Options: `maxSplitBytes` (long), `splittable` (default true),
  * `recordGzip` (member-per-record compressed segments),
  * `maxFilesPerTrigger` (streaming reads: admission control — at most
  * N fresh files per micro-batch, so a backlog drains in bounded
  * checkpointed steps; default unlimited).
  */
final class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WarcTable(WarcDataSource.resolvePaths(properties))
}

object WarcDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("segment", StringType),
    StructField("host", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("payload", BinaryType)))

  private val HostDir = ".*/host=([^/]+)(/.*)?".r

  /** Load paths from DSv2 properties: `path` (single load / SQL DDL
    * OPTIONS) or `paths` (the JSON string array `load(p1, p2, …)`
    * sets — Spark JSON-escapes each element, so paths containing
    * commas or quotes arrive intact). Parsed with the same
    * quote/escape-aware scanner the stream offsets use
    * ([[WarcFilesOffset.fromJson]]) rather than a comma split, which
    * silently shredded any path with a comma in it.
    */
  def resolvePaths(properties: JMap[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths"))
      .map(json => WarcFilesOffset.fromJson(json).files.filter(_.nonEmpty))
      .getOrElse(Nil)
    val single = Option(properties.get("path")).toSeq
    val all = (single ++ multi).distinct
    require(all.nonEmpty, "the warc source requires at least one load path")
    all
  }

  /** `host=` partition value captured from a file path, if any. */
  def dirHost(path: String): Option[String] = path match {
    case HostDir(h, _) => Some(h)
    case _ => None
  }

  /** Lowercased authority of a URI (scheme and single `:port`
    * dropped) — the record-side `host` when no partition directory
    * provides one.
    */
  def hostOf(uri: String): String = {
    if (uri == null) return null
    var h = uri
    val si = h.indexOf("://")
    if (si >= 0) h = h.substring(si + 3)
    val sl = h.indexOf('/')
    if (sl >= 0) h = h.substring(0, sl)
    if (h.count(_ == ':') == 1) {
      val i = h.indexOf(':')
      if (h.substring(i + 1).forall(_.isDigit)) h = h.substring(0, i)
    }
    h.toLowerCase(Locale.ROOT)
  }

  /** The subset of `filters` this source evaluates record-side (and,
    * for `host`, uses for file pruning). Everything else is left to
    * Spark above the scan.
    */
  def pushable(filters: Array[Filter]): Array[Filter] = filters.filter {
    case EqualTo(a, _) => Schema.fieldNames.contains(a) && a != "payload"
    case In(a, _) => Schema.fieldNames.contains(a) && a != "payload"
    case StringStartsWith(a, _) => Schema.fieldNames.contains(a) && a != "payload"
    case _ => false
  }

  /** Does a (possibly null) string column value pass every pushed
    * filter naming it? Null never passes (SQL comparison semantics).
    */
  def passes(filters: Array[Filter], name: String, value: String): Boolean =
    filters.forall {
      case EqualTo(a, v) if a == name => value != null && value == v
      case In(a, vs) if a == name =>
        value != null && vs.exists(v => v != null && v == value)
      case StringStartsWith(a, p) if a == name =>
        value != null && value.startsWith(p)
      case _ => true
    }

  /** Can a file under `host=<h>` possibly satisfy the host filters?
    * (Planning-time pruning; files with no captured host always can.)
    */
  def dirMayMatch(filters: Array[Filter], h: Option[String]): Boolean =
    h.forall(passes(filters, "host", _))

  /** Prune + chunk + bin-pack: the planning pipeline shared by the
    * batch scan and the micro-batch stream. Files are pruned by
    * `host=` directory, split into record-boundary chunks at
    * `maxSplitBytes` (whole-file for non-splittable/gzip-without-
    * recordGzip), then PACKED greedily in order into bins of capacity
    * `maxSplitBytes`, each chunk weighing `size + openCostBytes`
    * (Spark's file-source law: the open cost keeps a bin from
    * accumulating thousands of tiny files whose per-file open/seek
    * dominates). A chunk always fits an empty bin; split chunks of
    * one large file each weigh ≥ capacity with the default open cost
    * and keep their own bins, so large-file parallelism is untouched
    * — packing only collapses the many-small-files tail.
    */
  def planChunks(files: Seq[(String, Long)], pushed: Array[Filter],
      splittable: Boolean, recordGzip: Boolean, maxSplitBytes: Long,
      openCostBytes: Long): Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val chunks = files.iterator.flatMap { case (p, len) =>
      val dh = dirHost(p)
      if (!dirMayMatch(pushed, dh)) Iterator.empty
      // WHOLE-FILE gzip has no random access: single chunk, the reader
      // decompresses through the blob parser. With recordGzip declared
      // (one member per record — the CommonCrawl layout), member
      // headers are validated sync points and .gz files split too.
      else if (!splittable || (p.endsWith(".gz") && !recordGzip))
        Iterator(WarcChunk(p, 0L, len, len, dh))
      else (0L until len by maxSplitBytes).iterator.map(s =>
        WarcChunk(p, s, math.min(s + maxSplitBytes, len), len, dh))
    }.toSeq
    pack(chunks, maxSplitBytes, openCostBytes)
  }

  /** Greedy in-order bin packing (see [[planChunks]]). */
  def pack(chunks: Seq[WarcChunk], capacity: Long,
      openCostBytes: Long): Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val bins = ArrayBuffer.empty[org.apache.spark.sql.connector.read.InputPartition]
    val bin = ArrayBuffer.empty[WarcChunk]
    var used = 0L
    def weight(c: WarcChunk): Long =
      math.max(c.end - c.start, 0L) + math.max(openCostBytes, 0L)
    chunks.foreach { c =>
      if (bin.nonEmpty && used + weight(c) > capacity) {
        bins += WarcInputPartition(bin.toSeq)
        bin.clear(); used = 0L
      }
      bin += c
      used += weight(c)
    }
    if (bin.nonEmpty) bins += WarcInputPartition(bin.toSeq)
    bins.toArray
  }
}

final class WarcTable(paths: Seq[String]) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(paths.nonEmpty && paths.forall(p => p != null && p.nonEmpty),
    "the warc source requires at least one load path")
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths, options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(paths.size == 1, "the warc sink writes to exactly one directory")
    new WarcWriteBuilder(paths.head, info)
  }
}

final class WarcScanBuilder(paths: Seq[String], options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = WarcDataSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = WarcDataSource.pushable(filters)
    // conservative contract: Spark re-evaluates every filter above the
    // scan; reader-side application is an optimization, never the only
    // correctness line
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new WarcScan(
    paths, required, pushed,
    maxSplitBytes = options.getLong("maxSplitBytes", 128L * 1024 * 1024),
    splittable = options.getBoolean("splittable", true),
    recordGzip = options.getBoolean("recordGzip", false),
    maxFilesPerTrigger = options.getInt("maxFilesPerTrigger", 0),
    openCostBytes = options.getLong("openCostBytes", 4L * 1024 * 1024),
    maxBytesPerTrigger = options.getLong("maxBytesPerTrigger", 0L))
}

final class WarcScan(paths: Seq[String], required: StructType,
    pushed: Array[Filter], maxSplitBytes: Long, splittable: Boolean,
    recordGzip: Boolean = false, maxFilesPerTrigger: Int = 0,
    openCostBytes: Long = 4L * 1024 * 1024, maxBytesPerTrigger: Long = 0L)
    extends Scan with Batch
    with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  require(maxSplitBytes > 0, s"maxSplitBytes must be positive: $maxSplitBytes")

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(paths, pushed, required, maxSplitBytes,
      splittable, recordGzip, maxFilesPerTrigger, openCostBytes,
      maxBytesPerTrigger)
  override def description(): String =
    s"WarcScan path=${paths.mkString(",")} " +
      s"PushedFilters=[${pushed.mkString(", ")}] " +
      s"ReadColumns=[${required.fieldNames.mkString(", ")}]"

  /** One listing per Scan instance (a Scan is per-query): statistics
    * estimation and partition planning — possibly re-run after a
    * runtime filter lands — reuse it instead of re-walking the tree.
    */
  private lazy val listedFiles: Seq[(String, Long)] = {
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val files = ArrayBuffer.empty[(String, Long)]
    paths.foreach { one =>
      val root = new Path(one)
      val fs = root.getFileSystem(hconf)
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val st = it.next()
        val p = st.getPath.toString
        val base = st.getPath.getName
        if (st.isFile && st.getLen > 0 &&
            !base.startsWith("_") && !base.startsWith("."))
          files += ((p, st.getLen))
      }
    }
    files.sortBy(_._1).toSeq
  }

  // ---- statistics: the listing Catalyst plans joins with ------------
  // Without this, a DataSourceV2 relation gets `defaultSizeInBytes`
  // (effectively infinite), so a FILTERED warc relation could never be
  // the broadcast side of a join no matter how small the surviving
  // host= directories are. The estimate is the byte sum of the files
  // that survive pushed-filter directory pruning — exact for a fully
  // host-partitioned store, conservative (an over-estimate) for flat
  // files that record-side filters would shrink further. No row-count
  // estimate: records are length-delimited, counting them costs a read.
  override def estimateStatistics(): Statistics = {
    val bytes = listedFiles.iterator
      .filter { case (p, _) =>
        WarcDataSource.dirMayMatch(pushed, WarcDataSource.dirHost(p)) }
      .map(_._2).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  // ---- runtime filtering: dynamic host= pruning ---------------------
  // `warc JOIN hosts_of_interest` prunes host directories at RUN time
  // the way a literal host predicate does at PLAN time: Spark's
  // dynamic-pruning machinery builds an `In(host, …)` filter from the
  // join's build side, hands it over via `filter(...)`, and re-plans
  // the partitions — planChunks then drops whole files through the
  // same dirMayMatch path. Record-side skipping applies the runtime
  // filters too (the join above re-checks, so this only ever skips
  // work). Filters are declared on `host` only — the one column with
  // planning-grain (directory) selectivity.
  private var runtime: Array[Filter] = Array.empty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("host"))

  override def filter(filters: Array[Filter]): Unit =
    runtime = WarcDataSource.pushable(filters)

  /** Plan-time pushed filters plus any runtime (dynamic-pruning) ones. */
  private def effectiveFilters: Array[Filter] = pushed ++ runtime

  override def planInputPartitions(): Array[InputPartition] =
    WarcDataSource.planChunks(listedFiles, effectiveFilters,
      splittable, recordGzip, maxSplitBytes, openCostBytes)

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, effectiveFilters, recordGzip,
      new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()))
}

/** One contiguous byte range of one file — the unit of record
  * ownership (sync-to-first-validated-record discipline applies per
  * chunk).
  */
final case class WarcChunk(path: String, start: Long, end: Long,
    fileLen: Long, dirHost: Option[String])

/** One TASK's work: a bin of chunks ([[WarcDataSource.pack]]) — many
  * small segment files ride one task instead of one task each (the
  * small-files problem; a `host=`-partitioned store of a million
  * sub-split-size segments would otherwise schedule a million tasks).
  */
final case class WarcInputPartition(chunks: Seq[WarcChunk])
    extends InputPartition

/** One parsed record's coordinates inside a split's file. */
private[sources] final case class WarcRec(warcType: String, uri: String,
    date: String, payloadStart: Long, payloadLen: Int, next: Long)

/** Created on the DRIVER (which captures the session Hadoop conf),
  * serialized to executors with the conf inside — executor-side file
  * opens resolve the same filesystem planning listed.
  */
final class WarcReaderFactory(required: StructType, pushed: Array[Filter],
    recordGzip: Boolean, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition], required, pushed,
      recordGzip, conf)
}

/** One task's reader: walks the partition's chunks sequentially, one
  * [[WarcChunkReader]] (and one open file handle) at a time.
  */
final class WarcPartitionReader(p: WarcInputPartition, required: StructType,
    pushed: Array[Filter], recordGzip: Boolean,
    conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private val it = p.chunks.iterator
  private var cur: WarcChunkReader = _

  override def next(): Boolean = {
    while (true) {
      if (cur == null) {
        if (!it.hasNext) return false
        cur = new WarcChunkReader(it.next(), required, pushed,
          recordGzip, conf)
      }
      if (cur.next()) return true
      cur.close()
      cur = null
    }
    false
  }
  override def get(): InternalRow = cur.get()
  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}

/** One chunk's reader: positioned reads over the Hadoop stream, sync
  * to the first validated record start ≥ `start`, then the SAME lax
  * sequential walk as [[graft.ingest.Warc.parse]] (any `:`-bearing
  * header line counts, malformed records skip one line and rescan)
  * for records starting before `end`.
  */
final class WarcChunkReader(p: WarcChunk, required: StructType,
    pushed: Array[Filter], recordGzip: Boolean,
    conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val in: FSDataInputStream = {
    val hp = new Path(p.path)
    hp.getFileSystem(conf.value).open(hp)
  }
  private val segmentU = UTF8String.fromString(p.path)

  // ---- windowed buffer over absolute file offsets -------------------
  private var bufOff = 0L
  private var buf = new Array[Byte](0)
  private var bufLen = 0

  private def load(from: Long, len: Int): Unit = {
    val want = math.min(len.toLong, p.fileLen - from).toInt
    if (want <= 0) { bufOff = from; bufLen = 0; return }
    if (buf.length < want) buf = new Array[Byte](math.max(want, 1 << 16))
    in.readFully(from, buf, 0, want)
    bufOff = from
    bufLen = want
  }

  /** Byte at absolute offset, reloading the window as needed. */
  private def byteAt(off: Long): Byte = {
    if (off < bufOff || off >= bufOff + bufLen)
      load(off, 1 << 16)
    buf((off - bufOff).toInt)
  }

  /** Absolute-range read SERVED THROUGH the sliding window: the
    * record-gzip path calls this once per member (header probe + body
    * chunks + trailer), and a positioned FS read per call amplified a
    * ~200-byte member into a fresh 64 KiB readFully each time. Ranges
    * beyond the window size bypass it (one direct read; large payloads
    * should not churn the window).
    */
  private[sources] def bytesAt(off: Long, len: Int): Array[Byte] = {
    if (len <= 0) return Array.emptyByteArray
    if (len > (1 << 16)) {
      val out = new Array[Byte](len)
      in.readFully(off, out, 0, len)
      return out
    }
    if (off < bufOff || off + len > bufOff + bufLen) load(off, 1 << 16)
    // load() clamps to fileLen: a range past EOF (truncated/corrupt
    // member) must fail loudly like the old positioned readFully did,
    // not return stale/zero window bytes
    if (off + len > bufOff + bufLen)
      throw new java.io.EOFException(
        s"range [$off, ${off + len}) past EOF ${p.fileLen} in ${p.path}")
    val s = (off - bufOff).toInt
    java.util.Arrays.copyOfRange(buf, s, s + len)
  }

  private val Marker = "WARC/1.0\r\n".getBytes("US-ASCII")

  private def startsWithMarker(off: Long): Boolean = {
    if (off + Marker.length > p.fileLen) return false
    var i = 0
    while (i < Marker.length) {
      if (byteAt(off + i) != Marker(i)) return false
      i += 1
    }
    true
  }

  /** Absolute offset of the `\r` ending the line starting at `from`,
    * or -1 if no CRLF before `limit` (mirrors the blob parser's
    * end-of-buffer behavior).
    */
  private def lineEnd(from: Long, limit: Long): Long = {
    var j = from
    while (j + 1 < limit) {
      if (byteAt(j) == '\r' && byteAt(j + 1) == '\n') return j
      j += 1
    }
    -1L
  }

  private def lineAt(from: Long, le: Long): String =
    new String(bytesAt(from, (le - from).toInt), "UTF-8")

  /** Parse one record whose version line starts at `pos`. `strict`
    * (sync validation) additionally requires token-syntax header names
    * and the record chain to continue (EOF or next marker) — the
    * discriminator that rejects a bare embedded `WARC/1.0` line.
    * Returns null when the bytes at `pos` are not (strictly) a record.
    */
  private def recordAt(pos: Long, strict: Boolean): WarcRec = {
    val le = lineEnd(pos, p.fileLen)
    if (le < 0 || le != pos + 8 || !startsWithMarker(pos)) return null
    var j = le + 2
    var blank = false
    var warcType: String = ""
    var uri: String = ""
    var date: String = ""
    var len = -1L
    while (!blank) {
      val he = lineEnd(j, p.fileLen)
      if (he < 0) return null
      if (he == j) { blank = true; j += 2 }
      else {
        val h = lineAt(j, he)
        val ci = h.indexOf(':')
        if (ci > 0) {
          val name = h.substring(0, ci).trim.toLowerCase(Locale.ROOT)
          if (strict && !name.forall(c =>
              c == '-' || c == '_' || (c >= 'a' && c <= 'z') ||
              (c >= '0' && c <= '9'))) return null
          val v = h.substring(ci + 1).trim
          name match {
            case "warc-type" => warcType = v
            case "warc-target-uri" => uri = v
            case "warc-date" => date = v
            case "content-length" =>
              len = scala.util.Try(v.toLong).getOrElse(-1L)
            case _ => ()
          }
        } else if (strict) return null
        j = he + 2
      }
    }
    if (len < 0 || len > Int.MaxValue || j + len > p.fileLen) return null
    var next = j + len
    var skips = 0
    while (skips < 2 && next + 1 < p.fileLen &&
           byteAt(next) == '\r' && byteAt(next + 1) == '\n') {
      next += 2; skips += 1
    }
    if (strict && next < p.fileLen && !startsWithMarker(next)) return null
    WarcRec(warcType, uri, date, j, len.toInt, next)
  }

  // ---- iteration state ----------------------------------------------
  private var pos: Long = -1L
  private var row: InternalRow = _
  private var done = false

  // gzip segments: whole-file decompress + the blob parser (planning
  // made them single-split, so this reader owns every record)
  private val isGz = p.path.endsWith(".gz")

  // ---- record-gzip members (splittable compressed segments) ---------
  private def nextMagic(from: Long): Long = {
    var q = from
    while (q + 2 < p.fileLen && q < p.end) {
      if (byteAt(q) == 0x1f.toByte && byteAt(q + 1) == 0x8b.toByte &&
          byteAt(q + 2) == 8.toByte) return q
      q += 1
    }
    p.end
  }

  private def isWarcPayload(data: Array[Byte]): Boolean = {
    if (data.length < Marker.length) return false
    var i = 0
    while (i < Marker.length) {
      if (data(i) != Marker(i)) return false
      i += 1
    }
    true
  }

  /** First VALIDATED member start at-or-after `from`: full
    * decompression + CRC/ISIZE trailer + the payload opening with the
    * WARC version line — a stray magic triple inside compressed data
    * fails one of the three.
    */
  private def syncMember(from: Long): Long = {
    var q = if (from == 0L) 0L else nextMagic(from)
    while (q < p.end) {
      val m = GzipMembers.readMember(bytesAt, q, p.fileLen)
      if (m != null && isWarcPayload(m._1)) return q
      q = nextMagic(q + 1)
    }
    p.end
  }

  /** Records from members whose COMPRESSED start lies in this split
    * (the member-grain attribution rule; the last member may extend
    * past the range end and is read fully).
    */
  private def memberRecords: Iterator[graft.ingest.Warc.WarcRecord] =
    new Iterator[graft.ingest.Warc.WarcRecord] {
      private var mOff: Long = syncMember(p.start)
      private var pending: Iterator[graft.ingest.Warc.WarcRecord] =
        Iterator.empty
      private def fill(): Unit = {
        while (!pending.hasNext && mOff < p.end) {
          val m = GzipMembers.readMember(bytesAt, mOff, p.fileLen)
          if (m != null && isWarcPayload(m._1)) {
            pending = graft.ingest.Warc.parse(m._1).iterator
            mOff += m._2
          } else {
            // corrupt member mid-store: resync forward, don't sink the split
            mOff = syncMember(mOff + 1)
          }
        }
      }
      override def hasNext: Boolean = { fill(); pending.hasNext }
      override def next(): graft.ingest.Warc.WarcRecord = {
        fill(); pending.next()
      }
    }

  private lazy val gzRecords: Iterator[graft.ingest.Warc.WarcRecord] =
    if (recordGzip) memberRecords else wholeFileGzRecords

  private def wholeFileGzRecords: Iterator[graft.ingest.Warc.WarcRecord] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPInputStream(in)
    val buf = new Array[Byte](1 << 16)
    var n = gz.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = gz.read(buf) }
    graft.ingest.Warc.parse(bos.toByteArray).iterator
  }

  private def nextGz(): Boolean = {
    while (gzRecords.hasNext) {
      val r = gzRecords.next()
      val host = p.dirHost.getOrElse(WarcDataSource.hostOf(r.targetUri))
      if (WarcDataSource.passes(pushed, "host", host) &&
          WarcDataSource.passes(pushed, "target_uri", r.targetUri) &&
          WarcDataSource.passes(pushed, "warc_type", r.warcType) &&
          WarcDataSource.passes(pushed, "warc_date", r.date) &&
          WarcDataSource.passes(pushed, "segment", p.path)) {
        row = materializeVals(r.warcType, r.targetUri, r.date,
          () => r.payload, host)
        return true
      }
    }
    done = true
    false
  }

  private def sync(): Long = {
    if (p.start == 0L) return 0L
    var q = p.start
    while (q < p.end) {
      if (startsWithMarker(q) && recordAt(q, strict = true) != null) return q
      q += 1
    }
    p.end // nothing starts in this split
  }

  override def next(): Boolean = {
    if (done) return false
    if (isGz) return nextGz()
    if (pos < 0) pos = sync()
    while (pos < p.end) {
      val r = recordAt(pos, strict = false)
      if (r == null) {
        // malformed (or junk between records): skip one line, rescan —
        // the blob parser's resilience rule, bounded by the split end
        val le = lineEnd(pos, p.fileLen)
        pos = if (le < 0) p.end else le + 2
      } else {
        pos = r.next
        val host = p.dirHost.getOrElse(WarcDataSource.hostOf(r.uri))
        if (WarcDataSource.passes(pushed, "host", host) &&
            WarcDataSource.passes(pushed, "target_uri", r.uri) &&
            WarcDataSource.passes(pushed, "warc_type", r.warcType) &&
            WarcDataSource.passes(pushed, "warc_date", r.date) &&
            WarcDataSource.passes(pushed, "segment", p.path)) {
          row = materialize(r, host)
          return true
        }
      }
    }
    done = true
    false
  }

  private def materialize(r: WarcRec, host: String): InternalRow =
    // payload bytes are only read when the column survives pruning
    materializeVals(r.warcType, r.uri, r.date,
      () => bytesAt(r.payloadStart, r.payloadLen), host)

  // column dispatch resolved ONCE at reader construction (name→slot),
  // not per row per field by string comparison
  private val fieldCodes: Array[Int] = required.fields.map(_.name match {
    case "segment" => 0
    case "host" => 1
    case "warc_type" => 2
    case "target_uri" => 3
    case "warc_date" => 4
    case "payload" => 5
    case other => throw new IllegalStateException(s"unknown column $other")
  })

  private def materializeVals(warcType: String, uri: String, date: String,
      payload: () => Array[Byte], host: String): InternalRow = {
    val vals = new Array[Any](fieldCodes.length)
    var i = 0
    while (i < fieldCodes.length) {
      vals(i) = fieldCodes(i) match {
        case 0 => segmentU
        case 1 => UTF8String.fromString(host)
        case 2 => UTF8String.fromString(warcType)
        case 3 => UTF8String.fromString(uri)
        case 4 => UTF8String.fromString(date)
        case 5 => payload()
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
