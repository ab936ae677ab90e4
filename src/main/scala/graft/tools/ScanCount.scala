package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan-only audit: counts parquet scans in every gate query's
  * physical plan. A query whose plan scans the same fact table more
  * than once is usually missing a multi-consumer checkpoint (the
  * round-6 q89/q42/q56/q31 finding — each was silently re-running the
  * corpus explode per consumer because exchange reuse does not fire
  * across an aggregate/join split). Checkpoint-backed subtrees plan
  * as `Scan ExistingRDD`, so this counts only the scans that would
  * actually re-read the table per action.
  *
  * Run: `sbt "runMain graft.tools.ScanCount [sfDir]"`.
  */
object ScanCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      val flag = if (scans > 2) " MULTI" else ""
      println(f"$name%-36s scans=$scans$flag")
    }
    spark.stop()
  }
}
