package graft

import graft.graph.ConnectedComponents

/** Unit coverage for min-label-propagation connected components and the
  * dedup-clustering wrapper (q35).
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("a", "b")

  /** Every graph is asserted on BOTH paths: driver union-find (the
    * small-graph default) and distributed label propagation (forced
    * with localEdgeLimit = 0) — they must agree exactly.
    */
  private def bothPaths(e: org.apache.spark.sql.DataFrame): Seq[Map[Long, Long]] =
    Seq(
      ConnectedComponents.labels(e, "a", "b"),
      ConnectedComponents.labels(e, "a", "b", localEdgeLimit = 0))
      .map(_.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

  test("labels finds components across chains, direction-insensitively") {
    // component {1,2,3,4} as a chain, component {10,11}, self-loop {20}
    val e = edges(2L -> 1L, 2L -> 3L, 4L -> 3L, 10L -> 11L, 20L -> 20L)
    bothPaths(e).foreach { out =>
      assert(out === Map(
        1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L))
    }
  }

  test("labels handles a long path (diameter > 2 needs multiple rounds)") {
    val e = edges((1L to 9L).map(i => i -> (i + 1)): _*)
    bothPaths(e).foreach { out =>
      assert(out.size === 10)
      assert(out.values.toSet === Set(1L))
    }
  }

  test("labels merges components connected through a hub") {
    val e = edges(5L -> 100L, 6L -> 100L, 7L -> 100L, 8L -> 9L)
    bothPaths(e).foreach { out =>
      assert(out(100L) === 5L && out(6L) === 5L && out(7L) === 5L)
      assert(out(8L) === 8L && out(9L) === 8L)
    }
  }

  test("dedupClusters marks exactly one canonical keeper per cluster") {
    val pairs = Seq((3L, 7L), (7L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    val out = ConnectedComponents.dedupClusters(pairs, "id_a", "id_b")
      .orderBy($"doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq === Seq(
      (3L, 3L, 1), (7L, 3L, 0), (9L, 3L, 0), (20L, 20L, 1), (21L, 20L, 0)))
  }
}
