package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.textops.TextTokens

/** The injected optimizer rule [[graft.plans.DedupKeyFuse]]: a session
  * carrying it rewrites the DOCUMENTED three-pass dedup-key
  * `regexp_replace` chain (authored in SQL or via
  * [[TextTokens.dedupKeyRegexCol]]) into the fused single-scan
  * expression — plan-proven (the optimized plan carries
  * `graft_dedup_key` and no `regexp_replace`) and result-proven
  * (byte-identical to the plain-Scala chain on the DedupKeySpec
  * corpus, with and without the `lower()` wrapper).
  *
  * Frames are repartitioned off their LocalRelation first:
  * `ConvertToLocalRelation` would otherwise evaluate the projection at
  * plan time and leave nothing to inspect (the fold is itself proof
  * the expression ran, but the spec pins the REWRITE).
  */
class DedupKeyFuseSpec extends AnyFunSuite {

  // Own session: optimizer rules injected via withExtensions, exactly
  // the spark.sql.extensions=graft.GraftExtensions production path
  // (the GraftExtensionsSpec construction).
  private lazy val spark: SparkSession = {
    val shared = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-fuse-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // the chain in plain Scala — the ground truth both engines mirror
  private def regexChain(s: String): String =
    s.replaceAll("[0-9]+", "0")
      .replaceAll("[^a-z0-9 \t\n\f\r]+", " ")
      .replaceAll("[ \t\n\f\r]+", " ")
      .trim

  private val corpus = Seq(
    "", " ", "\t\n\f\r", "abc", "ABC", "  hello   world  ",
    "v2.1 release", "v3.0 release", "2026-08-16", "a1b2c3",
    "123", "1#2", "##", "a##3", "--a--", "café crème",
    "ünïcödé 42 Text!", "tab\tsep\nlines\rret", "0units00x9",
    "trailing punct!!!", "!leading", "mixed 12ab34 runs",
    "日本語テキスト 123 abc", "emoji 😀 inside", "a b")

  private def corpusDf(s: SparkSession): DataFrame = {
    import s.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(2)
  }

  private def collectK(df: DataFrame): Seq[String] = {
    import df.sparkSession.implicits._
    df.orderBy(col("id")).select(col("k")).as[String].collect().toSeq
  }

  private val wantLowered =
    corpus.map(s => regexChain(s.toLowerCase(java.util.Locale.ROOT)))

  test("SQL-authored chain rewrites to graft_dedup_key, identical results") {
    corpusDf(spark).createOrReplaceTempView("fuse_corpus")
    // SQL string literals resolve \t/\n and DROP unknown escapes
    // (\x0B -> x0B), so the regex-escape spelling needs doubled
    // backslashes — the spelling that reaches the regex engine as the
    // documented chain (single-backslash SQL is a DIFFERENT regex and
    // is correctly left alone)
    val sql = spark.sql(
      """SELECT id, trim(regexp_replace(regexp_replace(regexp_replace(
        |  lower(text), '[0-9]+', '0'),
        |  '[^a-z0-9 \\t\\n\\x0B\\f\\r]+', ' '),
        |  '[ \\t\\n\\x0B\\f\\r]+', ' ')) AS k
        |FROM fuse_corpus""".stripMargin)
    val plan = optimized(sql)
    assert(plan.contains("graft_dedup_key"), s"rule did not fire:\n$plan")
    assert(!plan.contains("regexp_replace"), s"chain survived:\n$plan")
    assert(collectK(sql) == wantLowered)
  }

  test("DataFrame-authored dedupKeyRegexCol rewrites too") {
    val df = corpusDf(spark).select(col("id"),
      TextTokens.dedupKeyRegexCol(col("text")).as("k"))
    val plan = optimized(df)
    assert(plan.contains("graft_dedup_key") && !plan.contains("regexp_replace"))
    assert(collectK(df) == wantLowered)
  }

  test("chain WITHOUT lower() also fuses — uppercase is the other class") {
    val df = corpusDf(spark).select(col("id"),
      trim(regexp_replace(regexp_replace(regexp_replace(
        col("text"), "[0-9]+", "0"),
        "[^a-z0-9 \\t\\n\\x0B\\f\\r]+", " "),
        "[ \\t\\n\\x0B\\f\\r]+", " ")).as("k"))
    val plan = optimized(df)
    assert(plan.contains("graft_dedup_key") && !plan.contains("regexp_replace"))
    assert(collectK(df) == corpus.map(regexChain))
  }

  test("near-miss chains are left alone") {
    val base = corpusDf(spark)
    // different digit replacement
    val a = base.select(trim(regexp_replace(regexp_replace(regexp_replace(
      lower(col("text")), "[0-9]+", "9"),
      "[^a-z0-9 \\t\\n\\x0B\\f\\r]+", " "),
      "[ \\t\\n\\x0B\\f\\r]+", " ")).as("k"))
    assert(!optimized(a).contains("graft_dedup_key"))
    // partial chain (no whitespace collapse)
    val b = base.select(trim(regexp_replace(
      regexp_replace(lower(col("text")), "[0-9]+", "0"),
      "[^a-z0-9 \\t\\n\\x0B\\f\\r]+", " ")).as("k"))
    assert(!optimized(b).contains("graft_dedup_key"))
    // trim with an explicit trim set is NOT plain trim
    base.createOrReplaceTempView("fuse_corpus_nm")
    val c = spark.sql(
      """SELECT trim(BOTH 'x' FROM regexp_replace(regexp_replace(regexp_replace(
        |  lower(text), '[0-9]+', '0'),
        |  '[^a-z0-9 \\t\\n\\x0B\\f\\r]+', ' '),
        |  '[ \\t\\n\\x0B\\f\\r]+', ' ')) AS k
        |FROM fuse_corpus_nm""".stripMargin)
    assert(!optimized(c).contains("graft_dedup_key"))
    // the single-backslash SQL spelling resolves to a DIFFERENT regex
    // (\x0B -> literal x0B) — must not fuse
    val d = spark.sql(
      """SELECT trim(regexp_replace(regexp_replace(regexp_replace(
        |  lower(text), '[0-9]+', '0'),
        |  '[^a-z0-9 \t\n\x0B\f\r]+', ' '),
        |  '[ \t\n\x0B\f\r]+', ' ')) AS k
        |FROM fuse_corpus_nm""".stripMargin)
    assert(!optimized(d).contains("graft_dedup_key"))
  }

  test("imperative install rewrites on an extension-less session") {
    val plain = SparkSpec.session
    GraftExtensions.install(plain)
    GraftExtensions.install(plain) // idempotent
    assert(plain.experimental.extraOptimizations
      .count(_ eq graft.plans.DedupKeyFuse) == 1)
    val df = corpusDf(plain).select(col("id"),
      TextTokens.dedupKeyRegexCol(col("text")).as("k"))
    assert(optimized(df).contains("graft_dedup_key"))
    assert(collectK(df) == wantLowered)
  }
}
