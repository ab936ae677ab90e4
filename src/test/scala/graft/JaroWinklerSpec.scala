package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinklerSimilarity
import graft.textops.EditDistance

/** Pins the native Jaro-Winkler expression to the reference semantics
  * the q109 oracle relies on: every value below was checked
  * float-for-float against DuckDB's `jaro_winkler_similarity` (same
  * literal doubles, not approximations) — match-window/transposition
  * rules, the empty-string 0.0 convention, the prefix-4 cap, and the
  * boost-only-above-0.7 edge at the representable value closest to 0.7.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerSimilarity.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic linkage cases match DuckDB bit-for-bit") {
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)   // 1 transposition + prefix 3
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.8962962962962964) // no common prefix → no boost
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("TRATE", "TRACE") === 0.9066666666666667)
    assert(jw("abcdefgh", "abcdefgh123") === 0.9454545454545455) // prefix capped at 4
  }

  test("degenerate cases: empties are 0.0, equal is 1.0, disjoint is 0.0") {
    assert(jw("", "") === 0.0)      // DuckDB's convention (NOT 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
    assert(jw("ab", "ba") === 0.0)  // window 0 → no matches at len 2
  }

  test("boost threshold: no boost at jaro <= 0.7, boost just above") {
    // jaro = 2/3 with prefix 2 — DuckDB leaves it unboosted
    assert(jw("abcd", "abZZZZZZZZZZ") === 0.5555555555555555)
    assert(jw("abcdef", "abcXYZ") === 0.6666666666666666)
    // jaro = 2.1/3 = 0.7000000000000001 (the closest representable
    // above 0.7), prefix 1 — DuckDB boosts: 0.7300000000000001
    assert(jw("abcde", "acbzyxedwv") === 0.7300000000000001)
  }

  test("symmetry and bounds hold across random-ish strings") {
    val ss = Seq("small ring", "small rung", "ring", "sm", "smal ring",
      "large ring", "sring", "small ringg", "", "x")
    for (a <- ss; b <- ss) {
      val v = jw(a, b)
      assert(v === jw(b, a))
      assert(v >= 0.0 && v <= 1.0)
      if (a == b && a.nonEmpty) assert(v === 1.0)
    }
  }

  test("codegen and interpreted evaluation agree through a DataFrame") {
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("small ring", "small rung"), ("", "x")).toDF("a", "b")
    val native = df.select(
        JaroWinklerSimilarity.jwCol($"a", $"b").as("jw"))
      .as[Double].collect().toSeq
    val interpreted = df.collect().toSeq.map(r =>
      jw(r.getString(0), r.getString(1)))
    assert(native === interpreted)
  }

  test("jaroWinklerDictPairs: dictionary pairs with supports, blocked") {
    val df = Seq(
      "small ring", "small ring", "small ring",  // support 3
      "small rung",                              // support 1, JW-close
      "smell ring",                              // sm- block, close
      "large ring",                              // different block
      "", "zz").toDF("name")
    val out = EditDistance.jaroWinklerDictPairs(df, "name", threshold = 0.85)
      .orderBy($"name_a", $"name_b")
      .as[(String, String, Double, Long, Long)].collect()
    // all pairs share the "sm" block; "large ring" never pairs (block
    // "la"), empties are dropped before the dictionary
    assert(out.map(p => (p._1, p._2)).toSet === Set(
      ("small ring", "small rung"),
      ("small ring", "smell ring"),
      ("small rung", "smell ring")))
    val bySupport = out.map(p => ((p._1, p._2), (p._4, p._5))).toMap
    assert(bySupport(("small ring", "small rung")) === (3L, 1L))
    assert(out.forall(p => p._3 >= 0.85 && p._3 < 1.0))
  }
}
