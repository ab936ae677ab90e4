package graft

import org.apache.spark.sql.functions._

import graft.textops.Dsir

/** DSIR targeted selection: the smoothed log-ratio fit hand-checked,
  * the composed fit→score pass pulling target-like docs above raw
  * ones, empty-doc and empty-bucket behavior, determinism.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("logRatiosE6: hand-checked Laplace-smoothed log ratios") {
    // panel: bucket 0 target-heavy, bucket 1 raw-only, bucket 2 absent
    val panel = Seq((0L, 8L, 10L), (1L, 0L, 10L)).toDF("bucket", "t_count", "r_count")
    val w = Dsir.logRatiosE6(panel, buckets = 3)
    val tTot = 8.0 + 3 // +B smoothing
    val rTot = 20.0 + 3
    def expect(t: Long, r: Long): Long =
      math.floor((math.log((t + 1) / tTot) - math.log((r + 1) / rTot)) * 1e6 + 0.5).toLong
    assert(w.toSeq == Seq(expect(8, 10), expect(0, 10), expect(0, 0)))
    assert(w(0) > 0, "target-heavy bucket carries positive weight")
    assert(w(1) < 0, "raw-only bucket carries negative weight")
    // empty bucket: pure smoothing — log((1/tTot)/(1/rTot)) > 0 here
    // only because rTot > tTot; the point is it is DEFINED
    assert(w(2) == expect(0, 0))
  }

  test("composed select: target-vocabulary docs outscore raw ones") {
    // target docs speak one vocabulary, raw docs another, with a
    // shared stopword — the fit must separate them by score sign
    val docs = (
      (1 to 20).map(i => (i.toLong, s"alpha beta gamma the doc$i", 1)) ++
      (21 to 60).map(i => (i.toLong, s"delta epsilon zeta the doc$i", 0))
    ).toDF("id", "text", "is_t")
    val out = Dsir.select(docs, "id", "text", $"is_t" === 1, buckets = 64)
      .select($"id", $"dsir_score_e6", $"selected")
      .as[(Long, Long, Int)].collect()
    val (target, raw) = out.partition(_._1 <= 20)
    assert(target.map(_._2).min > raw.map(_._2).max,
      "every target doc must outscore every raw doc")
    assert(target.forall(_._3 == 1) && raw.forall(_._3 == 0),
      "the selected flag follows the score sign here")
  }

  test("score: zero-word docs score 0 and are not selected; deterministic") {
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val w = Array.tabulate(16)(b => (b * 37 % 2001) - 1000L)
    val out = Dsir.score(docs, "id", "text", w)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(out(1) == ((2L, 0L, 0L, 0)))
    assert(out(2) == ((3L, 0L, 0L, 0)))
    val again = Dsir.score(docs, "id", "text", w)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq)
  }

  test("bucketPanel: r_count ≥ t_count everywhere; totals match the corpus") {
    val docs = Seq((1L, "a b c", 1), (2L, "a b", 0)).toDF("id", "text", "is_t")
    val panel = Dsir.bucketPanel(docs, "text", $"is_t" === 1, buckets = 8)
      .as[(Long, Long, Long)].collect()
    assert(panel.forall { case (_, t, r) => r >= t })
    assert(panel.map(_._3).sum == 5L, "raw counts all word occurrences")
    assert(panel.map(_._2).sum == 3L, "target counts only target docs")
  }

  test("bigram fit→score composition: feature spaces must match end to end") {
    val docs = (
      (1 to 10).map(i => (i.toLong, s"alpha beta gamma doc$i", 1)) ++
      (11 to 30).map(i => (i.toLong, s"delta epsilon zeta doc$i", 0))
    ).toDF("id", "text", "is_t")
    val out = Dsir.select(docs, "id", "text", $"is_t" === 1, buckets = 64,
        bigrams = true)
      .select($"id", $"dsir_score_e6").as[(Long, Long)].collect()
    val (target, raw) = out.partition(_._1 <= 10)
    assert(target.map(_._2).min > raw.map(_._2).max,
      "bigram-featured fit must still separate the vocabularies")
    // n_words stays the unigram count even under bigram features
    val nw = Dsir.score(Seq((1L, "a b c")).toDF("id", "text"),
      "id", "text", Array.fill(8)(1L), bigrams = true)
      .select($"n_words", $"dsir_score_e6").as[(Long, Long)].head()
    assert(nw == ((3L, 5L)), "3 words; 3+2 features each weighted 1")
  }

  test("bucketPanel bigrams: unigrams + n-1 bigrams; short docs guarded") {
    // "a b c" → 3 unigrams + 2 bigrams; "a" → 1; "" → 0
    val docs = Seq((1L, "a b c", 1), (2L, "a", 0), (3L, "", 0))
      .toDF("id", "text", "is_t")
    val panel = Dsir.bucketPanel(docs, "text", $"is_t" === 1, buckets = 32,
        bigrams = true)
      .as[(Long, Long, Long)].collect()
    assert(panel.map(_._3).sum == 6L, "3+2 target features + 1 raw unigram")
    assert(panel.map(_._2).sum == 5L)
  }
}
