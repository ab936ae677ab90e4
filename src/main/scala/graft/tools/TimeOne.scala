package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one named gate query and dump its formatted plan — the
  * inner-loop profiler for bench outliers.
  *
  * Usage: runMain graft.tools.TimeOne <queryName> [sfDir] [reps]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same logger hygiene as Bench: the per-rep unpersist below makes
    // RDD warn about truncated localCheckpoint lineage, by design
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    val fn = graft.SparkEntry.queries(name)
    println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      spark.catalog.clearCache()
      // the Bench.scala rep hygiene: clearCache leaves RDD-level
      // localCheckpoint blocks behind, and their accumulation across
      // reps manufactured 7.6→18.6 s "drift" on q84 profiling runs
      // (r8 judge measurement) — drop them; prior reps' RDDs see no
      // further actions, so the truncated lineage is never needed
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
