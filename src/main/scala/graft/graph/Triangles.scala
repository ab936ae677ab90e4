package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered orientation
  * (compact-forward; Suri & Vassilvitskii, "Counting Triangles and the
  * Curse of the Last Reducer", WWW'11) — the cluster-density /
  * community signal over similarity graphs (near-dup pairs, fuzzy
  * entity matches), complementing [[ConnectedComponents]]'s reach
  * signal.
  *
  * Every undirected edge is directed from its lower-(degree, id)
  * endpoint to the higher one; each triangle is then found exactly once
  * as a wedge at its minimum-(degree, id) apex plus the closing edge.
  * The wedge join fans out by the ORIENTED out-degree, which the
  * orientation bounds at O(√|E|) even for hubs — the "last reducer"
  * fix: a million-degree hub generates almost no wedges because nearly
  * all its edges point INTO it. Three hash joins + one aggregate, all
  * on node ids.
  */
object Triangles {

  /** Per-node triangle participation counts: `(node, n_tri)`, one row
    * per node of the undirected `edges` graph that closes at least one
    * triangle (duplicate edges, self-loops, and direction are
    * normalized away first).
    */
  def perNodeCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e0.select(col("a").as("n")).union(e0.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = e0
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    // orient low-(degree, id) -> high; carry the head's order key so the
    // wedge can order its two heads the same way
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      // wedge legs + closing edge read this frame three times; eager
      // localCheckpoint (like ConnectedComponents) materializes it once
      // and lets the ContextCleaner reclaim the blocks — a persist()
      // here would pin cache entries for the application's lifetime
      // with no handle for the caller to unpersist
      .localCheckpoint()
    val w1 = oriented.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val w2 = oriented.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    // heads ordered by the SAME (degree, id) order the orientation uses,
    // so the closing edge — if present — is oriented v1 -> v2
    val wedges = w1.join(w2, "u")
      .filter(col("dv1") < col("dv2") ||
        (col("dv1") === col("dv2") && col("v1") < col("v2")))
    val closing = oriented.select(col("u").as("v1"), col("v").as("v2"))
    val tris = wedges.join(closing, Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))
    tris
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
