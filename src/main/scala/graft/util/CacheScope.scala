package graft.util

import org.apache.spark.sql.{DataFrame, Dataset}

/** Tracks persisted frames so their blocks can be released explicitly
  * once the consuming actions complete, instead of accumulating in a
  * long-lived session until the ContextCleaner happens to collect the
  * plans (multi-round orchestrations persist per concept field — the
  * leak grows with rounds × fields).
  *
  * Lifecycle is caller-managed: the owner of the scope calls
  * [[release]] after materializing every output derived from the
  * tracked frames; releasing earlier silently recomputes lineage —
  * which at an exchange boundary means re-invoking the transport.
  */
final class CacheScope extends Serializable {
  @transient private lazy val frames =
    scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist and remember a frame. */
  def persist[T](ds: Dataset[T]): Dataset[T] = synchronized {
    ds.persist()
    frames += ds
    ds
  }

  def persistDf(df: DataFrame): DataFrame = persist(df)

  /** Currently tracked frames (test/introspection surface). */
  def snapshot: Seq[Dataset[_]] = synchronized(frames.toSeq)

  /** Unpersist everything tracked (non-blocking). */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
  }
}
