package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line. Queries run in sorted
  * name order after a warmup action so JVM/codegen startup lands on no
  * particular query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: run every query once at the TARGET SF before timing, so
    // the timed pass measures steady-state data work — the figure that
    // extrapolates to cluster scale — rather than Janino compilation
    // and first-run AQE re-planning (which dominate sub-second local
    // queries and vary run to run).
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
    }
    // Queries persist intra-query intermediates; drop them between runs
    // so earlier queries' caches don't pressure later ones.
    spark.catalog.clearCache()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
