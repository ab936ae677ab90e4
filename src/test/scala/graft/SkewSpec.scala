package graft

import org.apache.spark.sql.functions._

import graft.plans.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // one hot key with 10k rows, 50 cold keys with 10 each
    val hot = (1 to 10000).map(i => ("hot", i.toDouble))
    val cold = for (k <- 1 to 50; i <- 1 to 10) yield (s"k$k", i.toDouble)
    (hot ++ cold).toDF("key", "value")
  }

  test("saltedCountSum equals the plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedCountSum(skewed, Seq("key"), "value", buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals the plain join") {
    val right = (Seq("hot") ++ (1 to 50).map(k => s"k$k"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("key", "attr")
    val plain = skewed.join(right, "key")
      .groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, right, "key", buckets = 8)
      .groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    info(s"warehouse: $warehouse")
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Skew.writeBucketed(a, "k", 4, "graft_bucket_a")
    Skew.writeBucketed(b, "k", 4, "graft_bucket_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the planner actually uses bucket co-location
      // (at 100 TB neither side broadcasts; that is the case bucketing serves)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
      // counter-check: the same join over non-bucketed data DOES shuffle
      val unbucketedPlan = a.join(b, "k").queryExecution.executedPlan.toString
      assert(unbucketedPlan.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }
}
