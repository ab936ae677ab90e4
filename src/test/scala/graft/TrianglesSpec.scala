package graft

import graft.graph.Triangles

/** Triangle counting via degree-ordered orientation (q51): exact counts
  * on known graphs, normalization of dup/reversed/self edges, and the
  * wedge orientation not double- or zero-counting asymmetric-degree
  * triangles.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNodeCounts(edges.toDF("s", "t"), "s", "t")
      .as[(Long, Long)].collect().toMap

  test("K4: four triangles, every node in three") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(count(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("star has no triangles; adding one rim edge closes exactly one") {
    val star = (2L to 6L).map(i => (1L, i))
    assert(count(star) === Map.empty)
    assert(count(star :+ (2L, 3L)) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("duplicate, reversed, and self edges are normalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(count(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub-apex triangle counted once despite asymmetric degrees") {
    // hub 1 connects to everything; triangle (1, 2, 3) must be found at
    // its LOW-degree apex (2 or 3), not at the hub
    val g = (2L to 8L).map(i => (1L, i)) :+ (2L, 3L)
    val c = count(g)
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
