package graft.tools

import org.apache.spark.sql.SparkSession

/** Compact per-query physical-operator summary — the contract-authoring
  * companion to [[PlanCheck]]: prints each gate's distinct executed-plan
  * operator names on one line, so a plan contract can be written (or a
  * regression spotted) without paging through 143 formatted plans.
  *
  * Usage: runMain graft.tools.PlanDump [sfDir] [namePrefix...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val ops = plan.linesIterator
            .map(_.dropWhile(c => !c.isLetter && c != '*'))
            .map(_.stripPrefix("*(").dropWhile(_.isDigit).stripPrefix(") "))
            .map(_.takeWhile(c => c.isLetterOrDigit))
            .filter(_.nonEmpty).toSeq.distinct
          println(s"$name :: ${ops.mkString(",")}")
        } catch { case t: Throwable => println(s"$name :: ERROR ${t.getMessage}") }
      }
    spark.stop()
  }
}
