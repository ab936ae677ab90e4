package graft

import org.apache.spark.sql.functions._

import graft.textops.EditDistance

/** Unit coverage for the symmetric-delete edit-distance join (q45):
  * the FastSS guarantee (every true pair shares a deletion variant),
  * the exact-verify pruning of the overshoot, and pair orientation.
  */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants1: the string plus each single-char deletion, deduped") {
    val out = Seq("abc").toDF("s")
      .select(EditDistance.deletionVariants1($"s").as("v"))
      .as[Seq[String]].head()
    assert(out.toSet === Set("abc", "bc", "ac", "ab"))
    // repeated chars collapse ("aa" -> delete either 'a' = "a", once)
    val dup = Seq("aa").toDF("s")
      .select(EditDistance.deletionVariants1($"s").as("v"))
      .as[Seq[String]].head()
    assert(dup.toSet === Set("aa", "a"))
  }

  test("similarPairs finds substitutions, insertions, and exact dups; skips far pairs") {
    val df = Seq(
      (1L, "cat"),   // ~2 by substitution, ~3 by insertion, ~4 exact
      (2L, "cut"),
      (3L, "cats"),
      (4L, "cat"),
      (5L, "dog")    // distance 3 from everything feline
    ).toDF("id", "name")
    val out = EditDistance.similarPairs(df, "id", "name", maxDist = 1)
      .orderBy($"id_a", $"id_b")
      .as[(Long, Long, Int)].collect()
    assert(out.toSet === Set(
      (1L, 2L, 1),  // substitution
      (1L, 3L, 1),  // insertion
      (1L, 4L, 0),  // identical
      (2L, 4L, 1),
      (3L, 4L, 1)))
  }

  test("shared variant beyond the radius is pruned by the exact verify") {
    // "abcdef" / "bcdefa": both contain deletion variant "bcdef", but
    // levenshtein = 2 — the candidate must be generated AND rejected.
    val df = Seq((1L, "abcdef"), (2L, "bcdefa")).toDF("id", "name")
    val vars = Seq("abcdef").toDF("s")
      .select(explode(EditDistance.deletionVariants1($"s")).as("v"))
      .as[String].collect()
    assert(vars.contains("bcdef"))
    assert(EditDistance.similarPairs(df, "id", "name", maxDist = 1).isEmpty)
  }

  test("native deletion variants equal the HOF reference form, incl. unicode") {
    val inputs = Seq("abc", "aa", "", "a", "naïve", "x😀y😀z", "Customer#000000042")
    val df = inputs.toDF("s")
    val native = df.select(EditDistance.deletionVariants1($"s").as("v"))
      .as[Seq[String]].collect()
    val hof = df.select(EditDistance.deletionVariants1Hof($"s").as("v"))
      .as[Seq[String]].collect()
    inputs.indices.foreach { i =>
      assert(native(i) === hof(i), s"input '${inputs(i)}'")
    }
    // and the null path
    val n = Seq[String](null).toDF("s")
      .select(EditDistance.deletionVariants1($"s").as("v")).collect().head
    assert(n.isNullAt(0))
  }

  test("null strings are dropped, not joined") {
    val df = Seq((1L, "cat"), (2L, null), (3L, "cat")).toDF("id", "name")
    val out = EditDistance.similarPairs(df, "id", "name", maxDist = 1)
      .as[(Long, Long, Int)].collect()
    assert(out.toSet === Set((1L, 3L, 0)))
  }
}
