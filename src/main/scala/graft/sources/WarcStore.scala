package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Store maintenance for `format("warc")` directories.
  *
  * The sink's commit protocol (temp-write + atomic rename) guarantees
  * readers never see a partial file — but a KILLED task (executor
  * loss, OOM) dies between create and rename/abort, leaving its
  * `.part-*.tmp` behind forever. Readers ignore dot-files, so the
  * orphans are invisible dead weight, not a correctness issue; at a
  * 100 TB store's lifetime they are real bytes. [[vacuum]] is the
  * out-of-band sweep (the [[graft.streaming.DurableLedger]] compaction
  * GC's analog): delete dot-temp files older than a grace age. The
  * age guard is the safety line — a LIVE attempt's temp is younger
  * than any sane grace period (its task is still running), so vacuum
  * can run concurrently with writers.
  */
object WarcStore {

  /** Delete orphaned `.part-*.tmp` files under `dir` older than
    * `olderThanMs` (by filesystem modification time). Returns the
    * number of files removed. `olderThanMs` must be positive — a zero
    * grace would race in-flight attempts.
    *
    * `conf` defaults to the ACTIVE session's Hadoop conf when a session
    * exists (a bare `new Configuration()` resolved the wrong filesystem
    * or lost credentials for an s3a/defaultFS-configured store — the
    * exact failure mode [[SerializableHadoopConf]] exists to prevent);
    * pass one explicitly only for session-less maintenance tooling.
    */
  def vacuum(dir: String, olderThanMs: Long,
      conf: Configuration = null): Int = {
    require(olderThanMs > 0, s"grace age must be positive: $olderThanMs")
    val resolved = Option(conf).getOrElse(
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration()))
    val root = new Path(dir)
    val fs = root.getFileSystem(resolved)
    if (!fs.exists(root)) return 0
    val cutoff = System.currentTimeMillis() - olderThanMs
    var n = 0
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.startsWith(".part-") && name.endsWith(".tmp") &&
          st.getModificationTime < cutoff) {
        if (fs.delete(st.getPath, false)) n += 1
      }
    }
    n
  }
}
