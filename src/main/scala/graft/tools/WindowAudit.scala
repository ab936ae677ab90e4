package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Flags any gate query whose physical plan contains a Window (or
  * WindowGroupLimit) with an EMPTY partition spec — the single-task
  * global window that becomes the job's bottleneck at corpus scale
  * (the q66/zipfSlope class of defect; every shipped fix replaced it
  * with the two-phase partitioned form). Run after every wave:
  * `sbt "runMain graft.tools.WindowAudit [sfDir]"` — exits nonzero on
  * any hit. A final presentation `orderBy` (SortExec) is fine and not
  * flagged; only windowed computation over one partition is.
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan: SparkPlan = fn(spark, sfDir).queryExecution.sparkPlan
      val hits = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => "Window"
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => "WindowGroupLimit"
      }
      if (hits.isEmpty) println(s"PASS $name")
      else { bad += 1; println(s"FAIL $name: global ${hits.mkString(",")}") }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
