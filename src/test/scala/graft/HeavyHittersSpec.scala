package graft

import graft.textops.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misraGries: every item above n/(capacity+1) survives the summary") {
    // 60 a, 25 b, 10 c, 5 singletons → n = 100; capacity 3 ⇒ threshold
    // n/4 = 25: a (60) and b's boundary case — b = 25 is NOT > 25, so
    // only a is guaranteed; assert the guarantee, not the accidents.
    val stream = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      (1 to 5).map(i => s"s$i")
    // worst case for MG is adversarial interleaving; shuffle deterministically
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(stream)
    val (counters, total) = HeavyHitters.misraGries(shuffled.iterator, 3)
    assert(total === 100L)
    assert(counters.size <= 3)
    assert(counters.contains("a")) // 60 > 100/4
    // residuals undercount by at most n/(capacity+1)
    counters.get("a").foreach(c => assert(c >= 60L - 25L && c <= 60L))
  }

  test("heavyHitters ≡ exact groupBy + integer HAVING, and partitioning-invariant") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: item i drawn with weight ∝ 1/(i+1)
    val weights = (0 until 50).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val totalW = cum.last
    val items = Seq.fill(5000) {
      val x = rnd.nextDouble() * totalW
      s"w${cum.indexWhere(x <= _)}"
    }
    val df = items.toDF("item")
    val supportPpm = 20000L // 2%
    val exact = df.groupBy($"item").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * 1000000L >= lit(5000L) * supportPpm)
      .withColumn("n_total", lit(5000L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    for (parts <- Seq(1, 4, 13)) {
      val got = HeavyHitters.heavyHitters(df.repartition(parts), "item",
          supportPpm, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === exact, s"parts=$parts")
    }
  }

  test("forced-shuffle candidate join ≡ broadcast path; capacity bound enforced; empty input") {
    val df = (Seq.fill(40)("x") ++ Seq.fill(3)("y")).toDF("item")
    val b = HeavyHitters.heavyHitters(df, "item", supportPpm = 500000L, capacity = 8)
      .collect().map(_.getString(0)).toSet
    val s = HeavyHitters.heavyHitters(df, "item", supportPpm = 500000L, capacity = 8,
        broadcastCandidateLimit = 0L)
      .collect().map(_.getString(0)).toSet
    assert(b === Set("x"))
    assert(s === b)
    intercept[IllegalArgumentException] {
      // capacity 3 < 1e6/200000 = 5 ⇒ superset guarantee would not hold
      HeavyHitters.heavyHitters(df, "item", supportPpm = 200000L, capacity = 3)
    }
    assert(HeavyHitters.heavyHitters(Seq.empty[String].toDF("item"), "item",
      supportPpm = 1000L, capacity = 1000).count() === 0L)
  }

  test("heavyHittersByGroup ≡ exact per-group HAVING, partitioning-invariant") {
    val rnd = new scala.util.Random(23)
    // three groups with different sizes and skews — thresholds must be
    // computed within each group, never globally
    val rows =
      Seq.fill(3000)(("g1", s"a${rnd.nextInt(30)}")) ++   // shallow skew
      Seq.fill(500)(("g2", if (rnd.nextBoolean()) "hot" else s"b${rnd.nextInt(200)}")) ++
      Seq.fill(7)(("g3", "tiny"))                          // tiny group: 100% support
    val df = rows.toDF("grp", "item")
    val supportPpm = 40000L // 4% within each group
    val totals = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .collect { case ((g, it), c) if c * 1000000L >= totals(g) * supportPpm =>
        (g, it, c, totals(g))
      }.toSet
    assert(exact.exists(_._1 == "g2") && exact.exists(_._1 == "g3"))
    for (parts <- Seq(1, 4, 13)) {
      val got = HeavyHitters.heavyHittersByGroup(df.repartition(parts),
          "grp", "item", supportPpm, capacity = 64)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === exact, s"parts=$parts")
    }
    // forced-shuffle candidate join agrees with the broadcast path
    val shuffled = HeavyHitters.heavyHittersByGroup(df, "grp", "item",
        supportPpm, capacity = 64, broadcastCandidateLimit = 0L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(shuffled === exact)
  }
}
