package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering step that turns near-duplicate PAIRS (MinHash/SimHash
  * output) into dedup GROUPS with one canonical representative each.
  *
  * Each round every node adopts the minimum label among itself and its
  * neighbors; convergence takes O(graph diameter) rounds. That is the
  * right algorithm for dedup graphs specifically: near-dup components
  * are copies of the same underlying content, so they are dense and
  * tiny-diameter (2-3 rounds in practice). For adversarial
  * long-chain graphs the published alternative is large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) with O(log² n) rounds — same per-round shuffle shape, so it
  * can be swapped in behind this signature if a workload ever needs it.
  *
  * Scale notes: each round is one join + one min-aggregate, both
  * shuffling on the node id — so rounds reuse the same hash
  * partitioning. The driver-side loop holds only a changed-row COUNT
  * (no collect of data); lineage is cut each round with
  * `localCheckpoint` so plans don't nest `maxIter` deep.
  */
object ConnectedComponents {

  /** Labels every node of the undirected edge list with the minimum
    * node id reachable from it: output `(node, label)`, one row per
    * distinct endpoint. Edge direction and duplicate edges are
    * irrelevant (symmetrized + deduped internally).
    */
  def labels(edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 30): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // materialize the (symmetrized) edge list ONCE: the input is
    // typically the output of the whole MinHash pipeline, which must
    // not be recomputed every propagation round
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // propagate each node's label to its neighbors, then take the min
      // of (own label, neighbor labels)
      val msgs = sym.join(labels, sym("src") === labels("node"))
        .select(sym("dst").as("node"), labels("label"))
      val next = labels.union(msgs)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") < col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }

  /** Dedup clustering over a near-dup pair list: every document that
    * appears in a pair, labeled with its cluster id (the minimum doc id
    * of its component) and whether it is the cluster's canonical
    * representative (`keep = 1`) — the row set a dedup pipeline
    * anti-joins against the corpus to drop redundant copies.
    */
  def dedupClusters(pairs: DataFrame, idACol: String, idBCol: String): DataFrame =
    labels(pairs, idACol, idBCol)
      .select(
        col("node").as("doc_id"),
        col("label").as("cluster_id"),
        (col("node") === col("label")).cast("int").as("keep"))
}
