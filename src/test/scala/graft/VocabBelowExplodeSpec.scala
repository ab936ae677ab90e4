package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.Chunker
import graft.functions.{ChunkSplit, VocabMatch, WhitespaceTokenizer}
import graft.vocab.LabelMatcher

/** The injected optimizer rule [[graft.plans.VocabBelowExplode]]:
  * vocab matching over exploded `graft_chunks` output rewrites to ONE
  * line-grain span scan per document below the Generate plus a
  * span-range slice per chunk above it — plan-proven (the optimized
  * plan carries `graft_vocab_spans` + `graft_vocab_slice` and no
  * `graft_vocab_match`) and result-proven against the plain-Scala
  * chunk-then-match ground truth on a corpus that stresses every part
  * of the soundness argument: the full line-terminator zoo, matches
  * hugging line starts/ends, Greek final sigma (the one
  * context-sensitive `toLowerCase` rule in Locale.ROOT), U+0130 (the
  * one length-changing lowercase mapping), empty lines, overlap 0 AND
  * 0.15, and `maxChunks` truncation. A label containing a terminator
  * must leave the plan untouched.
  */
class VocabBelowExplodeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val shared = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-vbe-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val labels = Seq(
    "spark", "join", "cnc machining", "θαλασσας", "İstanbul", "scan")
  private val concepts = Seq(
    "SparkC", "JoinC", "CncC", "SeaC", "CityC", "ScanC")

  private val corpus: Seq[String] = Seq(
    // plain multi-line: matches at line starts, ends, and interior
    "spark starts here\nends with join\nscan\n",
    // the full terminator zoo between lines; matches hug boundaries
    "join\rsparkscanjoinsparkjoinscanspark join scan",
    // multi-word label entirely within one line; split across lines
    // must NOT match (the reference matcher would not match it either)
    "precision cnc machining shop\ncnc\nmachining\n",
    // Greek final sigma: ΘΑΛΑΣΣΑΣ lowercases to θαλασσας only with the
    // end-of-context rule — line ends and chunk ends must agree
    "ΘΑΛΑΣΣΑΣ\nspark ΘΑΛΑΣΣΑΣ\n",
    // U+0130: lowercasing grows the string — spans carry LINE offsets,
    // so the length change cannot desynchronize chunk attribution
    "İstanbul spark\ntrailing İstanbul",
    // empty lines, whitespace lines, \r\n, no trailing terminator
    "\n\nspark\r\n\r\n  \njoin",
    // no matches at all
    "nothing here\nat all\n",
    // single line, no terminator
    "join spark scan",
    "")

  private def corpusDf(s: SparkSession): DataFrame = {
    import s.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(2)
  }

  private def expected(soft: Int, overlap: Double,
      max: Option[Int]): Seq[(Long, Int, Seq[String])] = {
    val m = new LabelMatcher(labels.zip(concepts))
    corpus.zipWithIndex.flatMap { case (t, i) =>
      Chunker.softLimit(t, soft, overlap, max, WhitespaceTokenizer).map { c =>
        (i.toLong, c.chunk_start, m.matchedConcepts(c.text))
      }
    }
  }

  private def collect3(df: DataFrame): Seq[(Long, Int, Seq[String])] = {
    import df.sparkSession.implicits._
    df.as[(Long, Int, Seq[String])].collect().toSeq.sortBy(r => (r._1, r._2))
  }

  private def sqlArr(xs: Seq[String]) =
    xs.map(x => s"'$x'").mkString("array(", ",", ")")

  private def authored(soft: Int, overlap: Double, max: Int): DataFrame = {
    corpusDf(spark).createOrReplaceTempView("vbe_corpus")
    spark.sql(
      s"""SELECT id, chunk.chunk_start AS cs,
         |  graft_vocab_match(chunk.text, ${sqlArr(labels)}, ${sqlArr(concepts)}) AS cons
         |FROM (SELECT id, explode(graft_chunks(text, $soft, cast($overlap AS double), $max)) AS chunk
         |      FROM vbe_corpus)""".stripMargin)
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("SQL-authored explode+match rewrites; results identical (overlap 0)") {
    val df = authored(3, 0.0, -1)
    val plan = optimized(df)
    assert(plan.contains("graft_vocab_spans") && plan.contains("graft_vocab_slice"),
      s"rule did not fire:\n$plan")
    assert(!plan.contains("graft_vocab_match"), s"per-chunk match survived:\n$plan")
    assert(collect3(df) == expected(3, 0.0, None))
  }

  test("overlap 0.15 and maxChunks also rewrite — whole-line spans at any overlap") {
    val df = authored(4, 0.15, 2)
    val plan = optimized(df)
    assert(plan.contains("graft_vocab_slice") && !plan.contains("graft_vocab_match"))
    assert(collect3(df) == expected(4, 0.15, Some(2)))
  }

  test("DataFrame-authored ChunkSplit + VocabMatch rewrites too") {
    val df = corpusDf(spark)
      .select(col("id"),
        explode(ChunkSplit.chunksCol(col("text"), 3, 0.0)).as("chunk"))
      .select(col("id"), col("chunk.chunk_start").as("cs"),
        VocabMatch.matchCol(col("chunk.text"),
          labels.zip(concepts).map { case (l, c) =>
            graft.vocab.Concept("demo", c, s"urn:$c", Seq(l), Nil) }).as("cons"))
    val plan = optimized(df)
    assert(plan.contains("graft_vocab_slice") && !plan.contains("graft_vocab_match"),
      s"rule did not fire:\n$plan")
    assert(collect3(df) == expected(3, 0.0, None))
  }

  test("a label containing a line terminator leaves the plan untouched") {
    corpusDf(spark).createOrReplaceTempView("vbe_corpus_t")
    val df = spark.sql(
      s"""SELECT id, chunk.chunk_start AS cs,
         |  graft_vocab_match(chunk.text, array('spark', 'a\nb'),
         |                    array('SparkC', 'CrossC')) AS cons
         |FROM (SELECT id, explode(graft_chunks(text, 3, 0.0D, -1)) AS chunk
         |      FROM vbe_corpus_t)""".stripMargin)
    val plan = optimized(df)
    assert(plan.contains("graft_vocab_match") && !plan.contains("graft_vocab_slice"),
      s"terminator-bearing vocabulary must not rewrite:\n$plan")
  }

  test("lineSpans law: matchedConcepts(chunk) == slice of line spans, any chunking") {
    val m = new LabelMatcher(labels.zip(concepts))
    for (t <- corpus; soft <- Seq(1, 2, 5); overlap <- Seq(0.0, 0.3)) {
      val spans = m.lineSpans(t)
      Chunker.softLimit(t, soft, overlap, None, WhitespaceTokenizer).foreach { c =>
        val sliced = spans.collect {
          case (con, s, e) if s >= c.chunk_start && e <= c.chunk_end => con
        }.distinct.sorted
        assert(m.matchedConcepts(c.text) == sliced,
          s"divergence for chunk [${c.chunk_start},${c.chunk_end}) soft=$soft " +
            s"overlap=$overlap of ${t.take(40).replace("\n", "\\n")}…")
      }
    }
  }

  test("graft_vocab_spans is a public SQL surface; install() covers plain sessions") {
    val plain = SparkSpec.session
    GraftExtensions.install(plain)
    assert(plain.experimental.extraOptimizations
      .count(_ eq graft.plans.VocabBelowExplode) == 1)
    import plain.implicits._
    val one = plain.sql(
      "SELECT graft_vocab_spans('spark\\njoin x', array('spark','join'), " +
        "array('S','J')) AS s")
      .selectExpr("transform(s, x -> concat(x.concept, ':', x.start, '-', x.end)) AS v")
      .as[Seq[String]].head
    assert(one == Seq("S:0-6", "J:6-12"))
    // the rewrite fires on the plain session too
    val df = corpusDf(plain)
      .select(col("id"),
        explode(ChunkSplit.chunksCol(col("text"), 3, 0.0)).as("chunk"))
      .select(col("id"), col("chunk.chunk_start").as("cs"),
        VocabMatch.matchCol(col("chunk.text"),
          labels.zip(concepts).map { case (l, c) =>
            graft.vocab.Concept("demo", c, s"urn:$c", Seq(l), Nil) }).as("cons"))
    assert(optimized(df).contains("graft_vocab_slice"))
    assert(collect3(df) == expected(3, 0.0, None))
  }
}
