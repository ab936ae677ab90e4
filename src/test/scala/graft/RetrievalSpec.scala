package graft

import org.apache.spark.sql.Row

import graft.textops.Retrieval

/** Unit coverage for BM25 retrieval (q69): exact scores against a
  * direct reimplementation of the formula on a micro-corpus, plus the
  * structural contract (k limit, dense ranks, non-matching docs
  * excluded).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // dl: 3, 2, 3, 4 -> N = 4, total = 12, avgdl = 3
  private lazy val docs = Seq(
    (1L, "spark join spark"),
    (2L, "spark window"),
    (3L, "nothing relevant here"),
    (4L, "join join join join")
  ).toDF("doc_id", "text")

  private val query = Seq("spark", "join", "window")

  /** The BM25 contribution mirrored operation-for-operation from
    * `Retrieval.bm25TopK` (k1 = 1.2, b = 0.75 pre-folded as the
    * literals 2.2 / 1.2 / 0.25 / 0.75).
    */
  private def contrib(tf: Long, df: Long, dl: Long, n: Long, tot: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2 /
      (tf + 1.2 * (0.25 + 0.75 * dl / (tot.toDouble / n)))

  test("bm25TopK scores match the direct formula") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", query, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // term -> df over the corpus: spark in {1,2}, join in {1,4}, window in {2}
    val expected = Map(
      1L -> (contrib(2, 2, 3, 4, 12) + contrib(1, 2, 3, 4, 12)), // spark x2, join x1
      2L -> (contrib(1, 2, 2, 4, 12) + contrib(1, 1, 2, 4, 12)), // spark, window
      4L -> contrib(4, 2, 4, 4, 12))                             // join x4
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, exp) =>
      assert(math.abs(got(id) - exp) < 2e-6, s"doc $id")
    }
  }

  test("bm25TopK excludes docs without query terms and respects k") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", query, k = 2).collect()
    assert(out.length === 2)
    assert(!out.map(_.getLong(0)).contains(3L))
  }

  test("bm25TopK ranks are dense and ordered by score desc, doc_id asc") {
    val rows = Retrieval.bm25TopK(docs, "doc_id", "text", query, k = 10)
      .collect().sortBy(_.getAs[Int]("rk"))
    assert(rows.map(_.getAs[Int]("rk")).toSeq === (1 to rows.length))
    val key = rows.map(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(key === key.sorted)
  }

  test("qlTopK matches the direct Dirichlet formula, absent terms included") {
    // cf over the corpus: spark 3, join 5, window 1; T = 12
    def ql(tf: Long, cf: Long, dl: Long, mu: Double = 2000.0): Double =
      math.log((tf + mu * cf / 12.0) / (dl + mu))
    val got = Retrieval.qlTopK(docs, "doc_id", "text", query, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Map(
      1L -> (ql(2, 3, 3) + ql(1, 5, 3) + ql(0, 1, 3)),  // spark×2, join×1, window absent
      2L -> (ql(1, 3, 2) + ql(0, 5, 2) + ql(1, 1, 2)),
      4L -> (ql(0, 3, 4) + ql(4, 5, 4) + ql(0, 1, 4)))
    assert(got.keySet === expected.keySet)  // doc 3 has no query term → excluded
    expected.foreach { case (id, exp) =>
      assert(math.abs(got(id) - exp) < 2e-6, s"doc $id: ${got(id)} vs $exp")
    }
    // likelihoods are log-probability sums — all negative here
    assert(got.values.forall(_ < 0.0))
  }

  test("rare terms outscore common ones at equal tf and dl") {
    // window (df=1) must contribute more than spark (df=2) for doc 2
    assert(contrib(1, 1, 2, 4, 12) > contrib(1, 2, 2, 4, 12))
  }

  private def r(v: Double, scale: Int): BigDecimal =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)

  /** Hand-computed DCG fixture: gains rel/log2(rank+1) rounded at 9,
    * summed exactly, ndcg rounded at 6 — the ndcgAtK contract.
    */
  private def dcgOf(rels: Seq[Double], ranks: Seq[Long]): Double =
    rels.zip(ranks)
      .map { case (rel, rk) => r(rel / (math.log(rk + 1.0) / math.log(2.0)), 9) }
      .sum.toDouble

  test("ndcgAtK matches a hand-computed graded fixture") {
    // query A ranked (3,2,3,0) by rel at ranks 1..4: NOT ideal order —
    // ideal is (3,3,2,0) with the tied 3s keeping rank order (1 then 3)
    val ranked = Seq(
      ("A", 1L, 3.0), ("A", 2L, 2.0), ("A", 3L, 3.0), ("A", 4L, 0.0),
      // query B already ideal (strictly descending) -> ndcg = 1
      ("B", 1L, 2.0), ("B", 2L, 1.0)
    ).toDF("query_id", "rk", "rel")
    val out = Retrieval.ndcgAtK(ranked, "query_id", "rk", "rel", k = 10)
      .collect().map(row => row.getString(0) ->
        ((row.getDouble(1), row.getDouble(2), row.getDouble(3)))).toMap
    val dcgA = dcgOf(Seq(3.0, 2.0, 3.0, 0.0), Seq(1L, 2L, 3L, 4L))
    val idcgA = dcgOf(Seq(3.0, 3.0, 2.0, 0.0), Seq(1L, 2L, 3L, 4L))
    assert(out("A")._1 === dcgA)
    assert(out("A")._2 === idcgA)
    assert(out("A")._3 === r(dcgA / idcgA, 6).toDouble)
    assert(out("A")._3 < 1.0, "non-ideal order must score below 1")
    assert(out("B")._1 === out("B")._2)
    assert(out("B")._3 === 1.0)
  }

  test("ndcgAtK cuts at k and ideal-ranks ties by original rank") {
    // rank 3 (rel=9) sits beyond k=2 and must not contribute
    val ranked = Seq(
      ("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 9.0)
    ).toDF("query_id", "rk", "rel")
    val out = Retrieval.ndcgAtK(ranked, "query_id", "rk", "rel", k = 2)
      .collect().head
    assert(out.getDouble(1) === dcgOf(Seq(1.0, 2.0), Seq(1L, 2L)))
    assert(out.getDouble(2) === dcgOf(Seq(2.0, 1.0), Seq(1L, 2L)))
  }

  test("ndcgAtK returns ndcg = 0 for an all-zero-relevance query") {
    val ranked = Seq(("A", 1L, 0.0), ("A", 2L, 0.0)).toDF("query_id", "rk", "rel")
    val out = Retrieval.ndcgAtK(ranked, "query_id", "rk", "rel", k = 10)
      .collect().head
    assert(out.getDouble(1) === 0.0 && out.getDouble(2) === 0.0)
    assert(out.getDouble(3) === 0.0, "idcg=0 guard must yield 0, not NaN")
  }

  test("phraseHits: consecutive-only matches, overlaps counted, multi-word phrases") {
    val d = Seq(
      (1L, "big data big data big"),   // "big data" twice; "data big" twice
      (2L, "big little data"),          // words present, never adjacent
      (3L, "data big data"),            // "big data" once
      (4L, "big big data")              // once (second big starts the match)
    ).toDF("doc_id", "text")
    def hits(p: Seq[String]) =
      Retrieval.phraseHits(d, "doc_id", "text", p)
        .orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    assert(hits(Seq("big", "data")) === Seq((1L, 2L), (3L, 1L), (4L, 1L)))
    assert(hits(Seq("big", "data", "big")) === Seq((1L, 2L)))
    assert(hits(Seq("missing", "data")).isEmpty)
    // single-word phrase degrades to term counting
    assert(hits(Seq("big")) === Seq((1L, 3L), (2L, 1L), (3L, 1L), (4L, 2L)))
  }

  test("proximityHits: window-bounded pairs, bucket boundaries, symmetric") {
    val d = Seq(
      (1L, "a x x b"),       // |0-3| = 3 <= 3 -> 1 pair
      (2L, "a x x x b"),     // distance 4 > 3 -> none
      (3L, "a b a"),         // pairs (0,1), (2,1) -> 2
      (4L, "b x a x x b")    // a at 2; b at 0 (d=2), b at 5 (d=3) -> 2
    ).toDF("doc_id", "text")
    def p(w: Int) = Retrieval.proximityHits(d, "doc_id", "text", "a", "b", w)
      .orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    assert(p(3) === Seq((1L, 1L), (3L, 2L), (4L, 2L)))
    // exactly-at-window and bucket-straddling distances both count
    assert(p(4) === Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L)))
    // symmetric in the terms
    val sym = Retrieval.proximityHits(d, "doc_id", "text", "b", "a", 3)
      .orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    assert(sym === p(3))
  }

  test("digest path keeps the historical NULL-text stats semantics") {
    // r13 rewrote bm25TopK over a one-pass digest; a NULL text must
    // still count in n_docs while its NULL size() (ANSI) drops out of
    // the token total, exactly like the old two-pass form
    val withNull = docs.union(Seq((5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    // N = 5, total stays 12 (the null doc's size is NULL, sum skips it)
    val got = Retrieval.bm25TopK(withNull, "doc_id", "text", query, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Map(
      1L -> (contrib(2, 2, 3, 5, 12) + contrib(1, 2, 3, 5, 12)),
      2L -> (contrib(1, 2, 2, 5, 12) + contrib(1, 1, 2, 5, 12)),
      4L -> contrib(4, 2, 4, 5, 12))
    assert(got.keySet === expected.keySet) // the null doc never ranks
    expected.foreach { case (id, exp) =>
      assert(math.abs(got(id) - exp) < 2e-6, s"doc $id")
    }
  }
}
