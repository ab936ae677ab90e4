package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.temporal.Temporal

/** The event-analytics family end to end on the events table: ordered
  * funnel staging, weekly retention cohorts, sessionization, and the
  * trade-graph PageRank — every stage a gate-oracled operator (q33,
  * q57, q60, q61), composed the way a product-analytics job would.
  *
  * Run: `sbt "runMain graft.examples.EventAnalyticsDemo [sfDir]"`
  */
object EventAnalyticsDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-event-analytics")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC") // date_trunc cohorts
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val events = Tables.load(spark, sfDir, "events")

    println("== funnel: deepest view -> click -> purchase stage per user ==")
    Temporal.funnelStages(events, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"))
      .groupBy($"funnel_stage").agg(count(lit(1)).as("users"))
      .orderBy($"funnel_stage").show(false)

    println("== weekly retention (cohort week x offset) ==")
    Temporal.retentionCohorts(events, "user_id", "ts")
      .orderBy($"cohort_week", $"week_offset").show(false)

    println("== sessions per user (30 min gap): top 5 ==")
    Temporal.sessionize(events, "user_id", "ts", "value", "30 minutes")
      .groupBy($"user_id").agg(count(lit(1)).as("sessions"))
      .orderBy($"sessions".desc, $"user_id").limit(5).show(false)

    println("== burst monitor: top-5 hours by z-score per event type ==")
    Temporal.eventBursts(events, "event_type", "ts")
      .orderBy($"z".desc, $"event_type", $"hour").limit(5)
      .select($"event_type", $"hour", $"c", $"z", $"burst").show(false)

    println("== trade-graph PageRank: top-5 nations by rank ==")
    val li = Tables.load(spark, sfDir, "lineitem").select($"l_orderkey", $"l_suppkey")
    val sup = Tables.load(spark, sfDir, "supplier").select($"s_suppkey", $"s_nationkey")
    val ord = Tables.load(spark, sfDir, "orders").select($"o_orderkey", $"o_custkey")
    val cust = Tables.load(spark, sfDir, "customer").select($"c_custkey", $"c_nationkey")
    val edges = li
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy($"s_nationkey", $"c_nationkey").agg(count(lit(1)).as("w"))
      .select($"s_nationkey".as("src"), $"c_nationkey".as("dst"), $"w")
    val nations = Tables.load(spark, sfDir, "nation")
    graft.graph.PageRank.ranks(
        nations.select($"n_nationkey".as("node")), "node",
        edges, "src", "dst", "w", iters = 3)
      .join(nations, $"node" === $"n_nationkey")
      .select($"n_name", $"rank")
      .orderBy($"rank".desc, $"n_name").limit(5).show(false)

    spark.stop()
  }
}
