package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Shuffle audit: runs every gate query and reports rows out plus
  * shuffle read/write bytes and spilled bytes, via a SparkListener.
  * The number that predicts 100 TB behavior is shuffle volume relative
  * to input — a query whose shuffle grows linearly with the fact table
  * needs a co-location or pre-aggregation fix before scale-up.
  *
  * Run: `sbt "runMain graft.tools.ShuffleAudit [sfDir]"`.
  */
object ShuffleAudit {

  private class Metrics extends SparkListener {
    val shuffleRead = new LongAdder
    val shuffleWrite = new LongAdder
    val spill = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        spill.add(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { shuffleRead.reset(); shuffleWrite.reset(); spill.reset() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)

    def mb(b: Long): String = f"${b / 1024.0 / 1024.0}%8.2f MB"
    println(f"${"query"}%-28s ${"rows"}%10s ${"shuffle_w"}%12s ${"shuffle_r"}%12s ${"spill"}%12s")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      metrics.reset()
      val rows = try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          // -1 in the rows column plus the WHY: a silent -1 cost a
          // debugging round (r12: q187's failure here was invisible)
          System.err.println(s"[audit] $name failed: " +
            s"${e.toString.linesIterator.next().take(300)}")
          -1L
      }
      // listener events are posted asynchronously; give the bus a moment
      // (listenerBus.waitUntilEmpty is private[spark])
      Thread.sleep(300)
      println(f"$name%-28s $rows%10d ${mb(metrics.shuffleWrite.sum)}%12s " +
        f"${mb(metrics.shuffleRead.sum)}%12s ${mb(metrics.spill.sum)}%12s")
    }
    spark.stop()
  }
}
