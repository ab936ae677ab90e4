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
  * micro-batch, holding that batch's NEW rows only, published by
  * temp-write + atomic rename ([[commit]]). Two properties follow:
  *
  *  - exactly-once ledger contents without a transaction log: a batch
  *    directory either exists complete or not at all (a crashed
  *    attempt leaves only a private temp), a replay publishes only
  *    when its earlier attempt never did, and two writers racing the
  *    SAME batch id resolve first-writer-wins with the loser aborting
  *    clean (the idempotent-foreachBatch sink discipline, made safe
  *    for concurrent drivers). Writers must derive the committed rows
  *    deterministically from (batch, ledger-excluding-this-batch) —
  *    the sessions here anti-join the batch against [[load]] with
  *    `excludeBatch` set to the current id, so a replay recomputes
  *    exactly what the winner published;
  *  - O(batch) commit cost: the ledger grows by one append per batch,
  *    never an O(corpus) rewrite — the property that makes a
  *    continuously-ingesting 100 TB corpus affordable. Readers union
  *    the batch directories; an out-of-band compaction job may fold
  *    old directories without changing semantics, and a Delta MERGE
  *    drops into the same seam unchanged.
  */
object DurableLedger {

  private def dir(path: String, batchId: Long) = s"$path/b$batchId"

  /** Compaction manifest: which segment holds the folded batches and
    * the highest batch id folded into it. Committed by atomic rename
    * (`manifest.tmp` → `manifest`), so a reader sees either the old
    * fold or the new one, never a half-written state.
    */
  private[streaming] final case class Manifest(
      compactedUpTo: Long, epoch: Long, segment: Option[String])

  private def manifestFile(path: String) = new java.io.File(path, "manifest")

  /** Tolerant read: a malformed/truncated manifest (possible only on
    * filesystems where the fsync'd atomic rename in [[writeManifest]]
    * still isn't durable across power loss) degrades to the empty
    * manifest instead of bricking the ledger with a parse exception —
    * readers then union whatever batch directories survive, which the
    * one-epoch-deferred GC keeps complete for the previous epoch.
    */
  private[streaming] def readManifest(path: String): Manifest = {
    val f = manifestFile(path)
    if (!f.isFile) Manifest(Long.MinValue, 0L, None)
    else scala.util.Try {
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      Manifest(lines.get(0).toLong, lines.get(1).toLong,
        if (lines.size > 2 && lines.get(2).nonEmpty) Some(lines.get(2)) else None)
    }.getOrElse(Manifest(Long.MinValue, 0L, None))
  }

  private def writeManifest(path: String, m: Manifest): Unit = {
    val tmp = new java.io.File(path, "manifest.tmp")
    // write + force BEFORE the atomic rename: without the fsync a power
    // loss can persist the rename but not the bytes, leaving a
    // truncated manifest
    val ch = java.nio.channels.FileChannel.open(tmp.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        s"${m.compactedUpTo}\n${m.epoch}\n${m.segment.getOrElse("")}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
    java.nio.file.Files.move(tmp.toPath, manifestFile(path).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** LIVE batch ids under `path` (sorted ascending) — directories not
    * yet folded into the compaction segment.
    */
  def batches(path: String): Seq[Long] = {
    val upTo = readManifest(path).compactedUpTo
    allBatchDirs(path).filter(_ > upTo)
  }

  private def allBatchDirs(path: String): Seq[Long] = {
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
    * with `schema` when nothing is committed yet. Reads the compaction
    * segment (when one exists) plus the live batch directories; batch
    * directories at or below `compactedUpTo` are ignored even if their
    * files still exist (the GC after a manifest swap is best-effort —
    * a crash between swap and GC must not double-read folded rows).
    */
  def load(spark: SparkSession, path: String, schema: StructType,
      excludeBatch: Option[Long] = None): DataFrame = {
    val m = readManifest(path)
    val ids = allBatchDirs(path)
      .filter(_ > m.compactedUpTo).filterNot(excludeBatch.contains)
    val dirs = m.segment.map(s => s"$path/$s").toSeq ++ ids.map(dir(path, _))
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** TIME TRAVEL: the ledger as of batch `upToBatch` INCLUSIVE — the
    * Delta `VERSION AS OF` shape on the batch-directory log. Works for
    * any point at or above the compaction horizon
    * (`manifest.compactedUpTo`): the fold keeps total contents but
    * destroys per-batch granularity BELOW it — exactly the
    * time-travel-depth vs file-count trade Delta's `VACUUM` makes —
    * so traveling past the horizon throws rather than silently
    * answering with folded rows. A deployment that needs deeper
    * travel compacts less often (or never).
    */
  def loadAt(spark: SparkSession, path: String, schema: StructType,
      upToBatch: Long): DataFrame = {
    val m = readManifest(path)
    require(upToBatch >= m.compactedUpTo,
      s"time travel below the compaction horizon: asked $upToBatch, " +
        s"folded through ${m.compactedUpTo} — folded batches have no " +
        "per-batch granularity left")
    val ids = allBatchDirs(path)
      .filter(id => id > m.compactedUpTo && id <= upToBatch)
    val dirs = m.segment.map(s => s"$path/$s").toSeq ++ ids.map(dir(path, _))
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  // ---- per-directory column stats (the Delta data-skipping half) ----

  /** One column's serialized min/max inside a directory's `_stats`
    * file. `typ` ∈ long | double | string; values are Base64 of their
    * canonical string form (Long.toString / Double.toString /
    * the raw string bytes) so strings with tabs or newlines are safe.
    */
  private[streaming] final case class ColStats(typ: String, min: String, max: String)

  private def statsFile(d: java.io.File) = new java.io.File(d, "_stats")

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s),
      java.nio.charset.StandardCharsets.UTF_8)

  private def statsTyp(dt: org.apache.spark.sql.types.DataType): Option[String] =
    dt match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType =>
        Some("long")
      case _: org.apache.spark.sql.types.FloatType | _: org.apache.spark.sql.types.DoubleType =>
        Some("double")
      case _: org.apache.spark.sql.types.StringType => Some("string")
      case _ => None // timestamps/decimals/complex: no stats, never pruned
    }

  /** Aggregate min/max of `cols` over `df` and write the directory's
    * `_stats` file (underscore prefix: parquet readers ignore it).
    * Unsupported-type and all-null columns are silently absent —
    * absence always means "cannot prune".
    */
  private[streaming] def writeStats(d: java.io.File, df: DataFrame,
      cols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, max => smax, min => smin}
    val fields = cols.flatMap(c =>
      df.schema.fields.find(_.name == c).flatMap(f =>
        statsTyp(f.dataType).map(t => (c, t))))
    if (fields.isEmpty) return
    val aggs = fields.flatMap { case (c, _) => Seq(smin(col(c)), smax(col(c))) }
    val row = df.agg(aggs.head, aggs.tail: _*).head
    // floats widen to double BEFORE serialization: Float.toString's
    // shortest-repr round trip re-parses to a DIFFERENT double than
    // the float's exact value, which could mis-prune boundary queries
    def ser(v: Any): String = v match {
      case f: Float => f.toDouble.toString
      case other => other.toString
    }
    val lines = fields.zipWithIndex.flatMap { case ((c, t), i) =>
      val (mn, mx) = (row.get(2 * i), row.get(2 * i + 1))
      if (mn == null || mx == null) None // empty/all-null batch
      else Some(s"${b64(c)}\t$t\t${b64(ser(mn))}\t${b64(ser(mx))}")
    }
    if (lines.nonEmpty)
      java.nio.file.Files.write(statsFile(d).toPath,
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Tolerant stats read: absent/corrupt file → empty map (no pruning
    * for that directory), mirroring [[readManifest]]'s degradation.
    */
  private[streaming] def readStats(d: java.io.File): Map[String, ColStats] =
    if (!statsFile(d).isFile) Map.empty
    else scala.util.Try {
      java.nio.file.Files.readAllLines(statsFile(d).toPath).toArray.toSeq
        .map(_.toString.split("\t", -1))
        .collect { case Array(c, t, mn, mx) =>
          unb64(c) -> ColStats(t, unb64(mn), unb64(mx))
        }.toMap
    }.getOrElse(Map.empty)

  /** Inclusive range predicate for directory pruning: `None` bounds
    * are unbounded. Bound values must match the stats type (Long-ish
    * for long, Number for double, String for string) — a mismatched
    * type fails loudly rather than silently scanning everything.
    */
  final case class Bound(column: String, lo: Option[Any] = None, hi: Option[Any] = None)

  /** Unsigned UTF-8 byte comparison — the order Spark's min/max on
    * strings uses (UTF8String binary order), so string pruning
    * decisions agree with how the stats were computed. Java
    * String.compareTo differs for supplementary characters.
    */
  private def cmpUtf8(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def cmp(typ: String, statVal: String, bound: Any): Int = typ match {
    case "long" => bound match {
      case n: Byte => java.lang.Long.compare(statVal.toLong, n.toLong)
      case n: Short => java.lang.Long.compare(statVal.toLong, n.toLong)
      case n: Int => java.lang.Long.compare(statVal.toLong, n.toLong)
      case n: Long => java.lang.Long.compare(statVal.toLong, n)
      case other => throw new IllegalArgumentException(
        s"long-typed stats need an integral bound, got $other")
    }
    case "double" => bound match {
      case n: Number => java.lang.Double.compare(statVal.toDouble, n.doubleValue())
      case other => throw new IllegalArgumentException(
        s"double-typed stats need a numeric bound, got $other")
    }
    case "string" => bound match {
      case s: String => cmpUtf8(statVal, s)
      case other => throw new IllegalArgumentException(
        s"string-typed stats need a String bound, got $other")
    }
    case other => throw new IllegalArgumentException(s"unknown stats type $other")
  }

  /** May the directory hold rows satisfying every bound? Missing
    * stats for a bound's column → yes (conservative).
    */
  private def mayMatch(stats: Map[String, ColStats], bounds: Seq[Bound]): Boolean =
    bounds.forall { b =>
      stats.get(b.column).forall { s =>
        b.lo.forall(lo => cmp(s.typ, s.max, lo) >= 0) &&
          b.hi.forall(hi => cmp(s.typ, s.min, hi) <= 0)
      }
    }

  /** [[load]] with DIRECTORY-LEVEL data skipping: batch directories
    * (and the compaction segment) whose `_stats` prove no row can
    * satisfy `bounds` are never handed to the parquet scan — the
    * file-skipping half of "store the ledger as Delta so stats prune
    * files". Returns a SUPERSET of the matching rows (every row of
    * every surviving directory): callers apply the real filter on the
    * result exactly as before — pruning is an optimization, never the
    * correctness line (spec-pinned: filtered results are identical
    * with and without stats present).
    */
  def loadWhere(spark: SparkSession, path: String, schema: StructType,
      bounds: Seq[Bound], excludeBatch: Option[Long] = None): DataFrame = {
    val m = readManifest(path)
    val ids = allBatchDirs(path)
      .filter(_ > m.compactedUpTo).filterNot(excludeBatch.contains)
    val dirs = m.segment.map(s => s"$path/$s").toSeq ++ ids.map(dir(path, _))
    val kept = dirs.filter(d => mayMatch(readStats(new java.io.File(d)), bounds))
    if (kept.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(kept: _*)
  }

  /** Fold source-directory stats for the compaction segment: a column
    * keeps stats only when EVERY source directory carries them with
    * one type (any gap poisons the column — folded rows from a
    * stats-less source could lie anywhere). Empty sources (no `_stats`
    * at all, e.g. pre-stats ledgers) therefore yield a stats-less
    * segment, which is never pruned.
    */
  private def mergeStats(srcs: Seq[java.io.File]): Map[String, ColStats] = {
    val all = srcs.map(readStats)
    if (all.isEmpty) return Map.empty
    all.head.keySet
      .filter(c => all.forall(_.contains(c)))
      .flatMap { c =>
        val ss = all.map(_(c))
        val t = ss.head.typ
        if (!ss.forall(_.typ == t)) None
        else {
          def lt(a: String, b: String): Boolean = t match {
            case "long" => a.toLong < b.toLong
            case "double" => a.toDouble < b.toDouble
            case _ => cmpUtf8(a, b) < 0
          }
          Some(c -> ColStats(t,
            ss.map(_.min).reduce((a, b) => if (lt(a, b)) a else b),
            ss.map(_.max).reduce((a, b) => if (lt(a, b)) b else a)))
        }
      }.toMap
  }

  private def writeMergedStats(segDir: java.io.File,
      merged: Map[String, ColStats]): Unit = {
    val lines = merged.toSeq.sortBy(_._1).map { case (c, s) =>
      s"${b64(c)}\t${s.typ}\t${b64(s.min)}\t${b64(s.max)}"
    }
    if (lines.nonEmpty)
      java.nio.file.Files.write(statsFile(segDir).toPath,
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Publish `rows` as batch `batchId`'s directory — exactly-once via
    * OPTIMISTIC CONCURRENCY: rows land in a writer-private temp
    * directory (`b<id>.tmp.<pid>-<nonce>`) and publication is ONE
    * atomic directory rename, so `b<id>` either exists COMPLETE or
    * not at all — no reader, replayer, or concurrent writer can ever
    * observe a half-written batch. When the target already exists the
    * rename fails and THIS writer aborts (first-writer-wins), its
    * temp discarded: two processes committing the SAME batch id can
    * no longer interleave files inside one directory (the pre-r10
    * overwrite-commit was last-writer-wins with a corruption window
    * while both writers' files coexisted). Under the ledger contract
    * (rows derived deterministically from (batch, ledger minus this
    * batch)) the loser's rows equal the winner's, so aborting loses
    * nothing.
    *
    * Returns true when this call published, false when a complete
    * directory already existed — a concurrent winner or an earlier
    * replay of the same batch; both mean the rows are durable.
    * Crashed losers leave only temp directories, never a partial
    * `b<id>`; [[compact]] sweeps temps whose batch is already folded.
    */
  def commit(rows: DataFrame, path: String, batchId: Long,
      statsCols: Seq[String] = Nil): Boolean = {
    val dst = new java.io.File(dir(path, batchId)).toPath
    // fast path: a replay of an already-published batch skips the write
    if (java.nio.file.Files.exists(dst)) return false
    val tmp = new java.io.File(path,
      s"b$batchId.tmp.${ProcessHandle.current().pid()}-${System.nanoTime()}")
    rows.write.mode("overwrite").parquet(tmp.getPath)
    // per-directory min/max stats land INSIDE the temp before the
    // rename, so stats publish atomically with their batch; computed
    // from the just-written parquet (batch-sized second scan — never
    // re-running the upstream derivation)
    if (statsCols.nonEmpty)
      writeStats(tmp, rows.sparkSession.read.parquet(tmp.getPath), statsCols)
    try {
      java.nio.file.Files.move(tmp.toPath, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      // rename onto an existing directory surfaces differently by
      // JDK/filesystem (FileAlreadyExistsException,
      // DirectoryNotEmptyException, or the raw ENOTEMPTY
      // FileSystemException) — when the destination EXISTS now,
      // someone else won the race; any other IO failure rethrows
      case e: java.nio.file.FileSystemException =>
        if (java.nio.file.Files.exists(dst)) { deleteRec(tmp); false }
        else throw e
    }
  }

  /** Fold committed batch directories (and the previous segment) into
    * one new segment, bounding the ledger's file count: after years of
    * O(batch) appends a reader would otherwise union thousands of tiny
    * directories. Contents are untouched — [[load]] before and after
    * compaction is row-identical (spec-pinned).
    *
    * Replay safety: the NEWEST committed batch is never folded (only
    * ids < max are eligible) — Structured Streaming replays at most
    * the last uncommitted batch, and [[load]]'s `excludeBatch` can
    * only mask a live directory, not rows inside a segment. Run it
    * out-of-band or from the maintenance turn of the owning session;
    * it must not race a concurrent `commit` of a NEW batch id (old
    * ids are never rewritten, so folding them cannot race).
    *
    * Crash safety, window by window: (1) segment written, manifest
    * not swapped → readers see the old manifest and the still-present
    * batch dirs; the orphan segment is overwritten by the next
    * attempt's fresh epoch name. (2) manifest swapped, GC incomplete →
    * readers see the new segment, and `load` ignores batch dirs ≤
    * `compactedUpTo` even though they still exist. GC is therefore
    * best-effort by construction.
    *
    * Concurrency: the whole fold — manifest read, segment build,
    * manifest swap, GC — runs under an EXCLUSIVE cross-process file
    * lock (`manifest.lock`, `FileChannel.tryLock`). Two simultaneous
    * compactors cannot interleave: the loser aborts cleanly with -1
    * having touched nothing, so the "both read epoch e, both write
    * segment s(e+1), second manifest swap silently drops the first
    * fold" race is structurally impossible. The OS releases the lock
    * when a holder dies, so a crashed compactor never bricks the
    * ledger (a leftover `manifest.lock` FILE carries no lock).
    * `commit` of a NEW batch id never takes the lock and never races
    * the fold: old ids are never rewritten and the newest id is never
    * folded.
    *
    * Returns the number of batch directories folded (0 = nothing to
    * do, no manifest churn; -1 = aborted, another compaction holds
    * the lock — retry at the next maintenance turn).
    */
  def compact(spark: SparkSession, path: String, schema: StructType): Int = {
    if (!new java.io.File(path).isDirectory) return 0
    withCompactionLock(path) {
      // manifest is (re-)read UNDER the lock: every manifest writer
      // goes through this lock, so the epoch read here cannot be
      // superseded before our swap lands (the optimistic-CAS check,
      // made pessimistic by the lock)
      val m = readManifest(path)
      val live = allBatchDirs(path).filter(_ > m.compactedUpTo)
      val foldIds = if (live.isEmpty) Nil else live.filter(_ < live.max)
      if (foldIds.isEmpty) 0 // nothing worth folding / segment current
      else {
        val upTo = foldIds.max
        val srcDirs = m.segment.map(s => s"$path/$s").toSeq ++ foldIds.map(dir(path, _))
        val segName = s"s${m.epoch + 1}"
        spark.read.schema(schema).parquet(srcDirs: _*)
          .write.mode("overwrite").parquet(s"$path/$segName")
        // fold stats with the rows (before the manifest swap, so the
        // segment is never visible without them): compaction preserves
        // pruning power whenever every folded source carried stats
        writeMergedStats(new java.io.File(s"$path/$segName"),
          mergeStats(srcDirs.map(new java.io.File(_))))
        writeManifest(path, Manifest(upTo, m.epoch + 1, Some(segName)))
        // ONE-EPOCH-DEFERRED GC: the dirs folded RIGHT NOW (and the
        // just-superseded segment) stay on disk — an in-flight job whose
        // plan listed files under the old manifest may still be scanning
        // them, and deleting here would fail it with FileNotFoundException.
        // load() already ignores them, so they are dead weight, reclaimed
        // on the NEXT compact: only material dead under the PREVIOUS
        // manifest (batch dirs ≤ old compactedUpTo, segments older than
        // the old epoch) is deleted, giving every reader one full
        // compaction interval of grace.
        val oldDeadDirs = allBatchDirs(path).filter(_ <= m.compactedUpTo)
          .map(i => new java.io.File(dir(path, i)))
        val oldDeadSegs = Option(new java.io.File(path).listFiles()).toSeq.flatten
          .filter { f =>
            f.isDirectory && f.getName.startsWith("s") &&
              scala.util.Try(f.getName.drop(1).toLong).toOption.exists(_ < m.epoch)
          }
        // crashed commit() losers leave `b<id>.tmp.<nonce>` directories;
        // once id is folded (≤ old compactedUpTo) no writer can still be
        // filling one (batch ids are monotonic), so they are pure garbage
        val deadTmps = Option(new java.io.File(path).listFiles()).toSeq.flatten
          .filter { f =>
            f.isDirectory && f.getName.startsWith("b") &&
              f.getName.contains(".tmp.") &&
              scala.util.Try(
                f.getName.drop(1).takeWhile(_ != '.').toLong
              ).toOption.exists(_ <= m.compactedUpTo)
          }
        (oldDeadDirs ++ oldDeadSegs ++ deadTmps).foreach(deleteRec)
        foldIds.size
      }
    }.getOrElse(-1)
  }

  /** Run `body` holding the exclusive compaction lock, or None when
    * another compactor (this JVM or another process) already holds it.
    * `tryLock` never blocks; same-JVM contention surfaces as
    * OverlappingFileLockException, which is the same "abort" answer.
    */
  private def withCompactionLock[A](path: String)(body: => A): Option[A] = {
    val ch = java.nio.channels.FileChannel.open(
      new java.io.File(path, "manifest.lock").toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock =
        try ch.tryLock()
        catch { case _: java.nio.channels.OverlappingFileLockException => null }
      if (lock == null) None
      else try Some(body) finally lock.release()
    } finally ch.close()
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(); ()
  }

  /** [[compact]] only when the live batch-directory count reaches
    * `every` — the self-maintaining schedule a foreachBatch session
    * calls at the end of each commit, so ledger file counts stay
    * bounded without an external job. Amortized cost: each row is
    * rewritten once per `every` commits on top of its original append
    * (a two-level fold; `every` trades write amplification against
    * per-read directory count). Returns folded directories (0 = below
    * threshold, -1 = another compactor holds the lock — the fold
    * happens at a later turn).
    */
  def maybeCompact(spark: SparkSession, path: String, schema: StructType,
      every: Int): Int = {
    require(every >= 2, s"compaction interval must be >= 2: $every")
    if (batches(path).size >= every) compact(spark, path, schema) else 0
  }
}
