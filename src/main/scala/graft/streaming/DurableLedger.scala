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
  def commit(rows: DataFrame, path: String, batchId: Long): Boolean = {
    val dst = new java.io.File(dir(path, batchId)).toPath
    // fast path: a replay of an already-published batch skips the write
    if (java.nio.file.Files.exists(dst)) return false
    val tmp = new java.io.File(path,
      s"b$batchId.tmp.${ProcessHandle.current().pid()}-${System.nanoTime()}")
    rows.write.mode("overwrite").parquet(tmp.getPath)
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
