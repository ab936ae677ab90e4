package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job/stage-level profile of one gate query — where TimeOne says
  * "slow", this says WHICH of the query's jobs (eager checkpoints,
  * precondition probes, broadcast builds, the final action) carry the
  * time: per job, wall duration + stage count + task count; plus the
  * gap between jobs (driver-side planning/analysis time).
  *
  * Usage: runMain graft.tools.JobProfile <queryName> [sfDir] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val ends = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time,
          Option(js.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobs.getOrDefault(je.jobId, (je.time, ""))
        ends.add((je.jobId, t0, je.time, desc))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      ends.clear(); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300L) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val es = ends.asScala.toSeq.sortBy(_._2)
      println(f"=== rep $i: wall $wall%.3f s, $n rows, ${es.size} jobs, " +
        s"${stages.get} stages, ${tasks.get} tasks")
      var prevEnd = 0L
      es.foreach { case (id, s, e, d) =>
        val gap = if (prevEnd == 0) 0L else s - prevEnd
        prevEnd = math.max(prevEnd, e)
        println(f"  job $id%3d ${(e - s) / 1e3}%7.3f s  gap ${gap / 1e3}%6.3f s  $d")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
