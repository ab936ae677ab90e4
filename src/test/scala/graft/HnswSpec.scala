package graft

import graft.vectors.Vectors

/** HNSW-style layered ANN: recall pinned against bruteTopK (the
  * q22-oracle pattern), exact-equality in the degenerate single-layer
  * config (entry scores the whole corpus → brute force by
  * construction), determinism, well-formedness, and the documented
  * degree-is-the-recall-lever claim.
  */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val queries = emb.filter($"vec_id" < 8)

  private lazy val brutePairs =
    Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("hnswTopK defaults: well-formed, deterministic, recall-pinned vs brute") {
    def run() = Vectors.hnswTopK(emb, queries, "vec_id", "embedding", k = 3, dim = 64)
      .select("query_id", "rnk", "neighbor_id").as[(Long, Int, Long)].collect()
    val hnsw = run()
    val byQ = hnsw.groupBy(_._1)
    assert(byQ.size == 8)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      rs.foreach { case (_, _, n) => assert(n != q) }
    }
    val recall = hnsw.map(r => (r._1, r._3)).toSet.intersect(brutePairs).size.toDouble /
      brutePairs.size
    info(f"HNSW recall@3 = $recall%.2f (defaults: 3 layers, degree 16, beam 16, 2 hops)")
    assert(recall >= 0.8, s"recall=$recall")
    assert(run().toSet == hnsw.toSet)
  }

  test("single-layer config degenerates to exact brute force") {
    // layers=1: the entry beam scores EVERY corpus vector, so the
    // search IS bruteTopK — row-for-row, scores included (beam = k+1:
    // a corpus-member query keeps itself as a navigation seed, so one
    // beam slot carries the self row until the final re-rank)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val hnsw = Vectors.hnswTopK(emb, queries, "vec_id", "embedding",
      k = 3, dim = 64, beam = 4, layers = 1)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(hnsw == brute)
  }

  test("tiny corpus with empty upper layers falls back to a non-empty entry") {
    // 3 vectors: upper layers are (almost surely) empty — the entry
    // falls back to the deepest non-empty layer instead of silently
    // returning zero rows
    val tiny = Seq(
      (1L, Seq.tabulate(64)(i => if (i == 0) 1.0 else 0.0)),
      (2L, Seq.tabulate(64)(i => if (i == 1) 1.0 else 0.0)),
      (3L, Seq.tabulate(64)(i => if (i < 2) 0.7 else 0.0))).toDF("vec_id", "embedding")
    val got = Vectors.hnswTopK(tiny, tiny.filter($"vec_id" === 1), "vec_id", "embedding",
      k = 2, dim = 64, layers = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  test("degree is the recall lever (the scaladoc claim)") {
    def recallAt(degree: Int, beam: Int): Double = {
      val got = Vectors.hnswTopK(emb, queries, "vec_id", "embedding",
        k = 3, dim = 64, beam = beam, degree = degree)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(brutePairs).size.toDouble / brutePairs.size
    }
    val sparse = recallAt(degree = 4, beam = 16)
    val dense = recallAt(degree = 16, beam = 16)
    info(f"recall@3: degree4=$sparse%.2f degree16=$dense%.2f")
    assert(dense >= sparse + 0.3,
      s"degree16=$dense vs degree4=$sparse — the lever claim collapsed")
  }

  test("beam descent is invariant to edge multiplicity (r13 symmetrize change)") {
    // the r13 layerEdges drops its final distinct, so the adjacency may
    // carry duplicate (src, dst) rows — the descent's candidate distinct
    // must make that unobservable in the result
    import org.apache.spark.sql.functions._
    val c = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("n", graft.vectors.Vectors.normCol(col("v")))
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", graft.vectors.Vectors.normCol(col("qv")))
    val entry = c.select(col("id")).filter(col("id") % 7 === 0)
    val ids = c.select(col("id")).as[Long].collect().sorted
    val edges = spark.createDataFrame(
      ids.sliding(2).filter(_.length == 2).flatMap { w =>
        Seq((w(0), w(1)), (w(1), w(0)))
      }.toSeq).toDF("src", "dst")
    def run(e: org.apache.spark.sql.DataFrame) =
      graft.vectors.Vectors.hnswBeamDescent(c, q, entry, Seq(e),
          k = 3, beam = 8, hops = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(edges) === run(edges.union(edges).union(edges)))
  }
}
