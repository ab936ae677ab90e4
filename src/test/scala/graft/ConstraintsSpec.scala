package graft

import graft.plans.Constraints._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 5.0),
    (2L, Some("b"), 50.0),
    (2L, None, -1.0),       // duplicate id, null name, out-of-range value
    (3L, Some("zz"), 10.0))
    .toDF("id", "name", "v")

  private def metrics(checks: Seq[(Check, Double)]): Map[String, (Double, Boolean)] =
    report(df, checks).as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("metrics are exact fractions with documented null handling") {
    val out = metrics(Seq(
      Completeness("name") -> 1.0,
      Uniqueness(Seq("id")) -> 1.0,
      RangeConformance("v", 0.0, 50.0) -> 1.0,
      Membership("name", Seq("a", "b")) -> 0.5))
    assert(out("completeness(name)") == ((0.75, false)))
    assert(out("uniqueness(id)") == ((0.75, false)))
    // range/membership fractions are over NON-NULL values only
    assert(out("range(v,[0.0,50.0])") == ((0.75, false)))
    assert(out("membership(name)")._1 == 2.0 / 3.0)
    assert(out("membership(name)")._2 == true)
  }

  test("passing checks report passed = true at exact thresholds") {
    val out = metrics(Seq(
      Completeness("id") -> 1.0,
      Uniqueness(Seq("id", "name")) -> 1.0))
    assert(out("completeness(id)") == ((1.0, true)))
    assert(out("uniqueness(id,name)") == ((1.0, true)))
  }

  test("all-NULL columns pass range/membership vacuously instead of NULL limbo") {
    // 0 non-null values -> 0/0; the explicit policy is metric 1.0 and
    // passed=true (nullness is Completeness's job), never a NULL
    // `passed` that is neither pass nor fail
    val withNull = df.withColumn("empty", org.apache.spark.sql.functions.lit(null).cast("double"))
    val out = report(withNull, Seq(
        RangeConformance("empty", 0.0, 1.0) -> 1.0,
        Membership("empty", Seq("x")) -> 1.0,
        Completeness("empty") -> 1.0))
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("range(empty,[0.0,1.0])") == ((1.0, true)))
    assert(out("membership(empty)") == ((1.0, true)))
    assert(out("completeness(empty)") == ((0.0, false))) // the honest signal
  }

  test("a quote in a column name is data, not SQL syntax") {
    val quoted = df.withColumnRenamed("v", "v'al")
    val out = report(quoted, Seq(RangeConformance("v'al", 0.0, 50.0) -> 1.0))
      .as[(String, Double, Boolean)].collect()
    assert(out.length == 1)
    assert(out.head._1 == "range(v'al,[0.0,50.0])")
    assert(out.head._2 == 0.75)
  }

  test("the whole report is one aggregate pass: no joins, no reshuffles") {
    val plan = report(df, Seq(
        Completeness("name") -> 1.0,
        RangeConformance("v", 0.0, 50.0) -> 1.0,
        Membership("name", Seq("a")) -> 0.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }
}
