package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.vectors.Vectors

/** Incremental maintenance of the [[Vectors.hnswTopK]] layered NSW
  * index for a vector stream — the graph sibling of
  * [[StreamVectorIndex]]'s IVF session.
  *
  * The batch index is a deterministic function of the corpus SET: the
  * md5 level draw fixes each id's layers, the (fixed-plane) hyperplane
  * buckets fix each node's candidate pools, and the per-node top-degree
  * rank fixes the edges — nothing depends on arrival order. So
  * incremental maintenance is exact, not approximate: when a batch
  * arrives,
  *
  *  1. new ids join their layers (stateless md5 draw) and buckets
  *     (stateless hyperplane signs);
  *  2. only nodes sharing a (table, bucket) with a new node can see
  *     their candidate pool change — their out-edges are re-ranked
  *     over their full pools, everyone else's stand;
  *  3. the maintained graph is therefore IDENTICAL to a from-scratch
  *     [[Vectors.hnswTopK]] build over the union (spec-pinned
  *     equality), and searches run the exact same beam descent over
  *     the maintained adjacency ([[Vectors.hnswBeamDescent]] — shared
  *     code, not a mirror).
  *
  * The bucket ladder is PINNED per layer at session construction
  * (`planesPerLayer`) — the [[StreamSemanticDedup]] fixed-codebook
  * contract: the batch operator's autoPlanes re-sizes buckets with N,
  * which would re-bucket the whole layer mid-stream. A production
  * deployment re-tunes the ladder out-of-band when the corpus outgrows
  * it (rebuild = one batch call), exactly like refreshing the IVF
  * codebook.
  *
  * Scale shape: ingest cost is proportional to the NEW nodes'
  * neighborhoods — the affected-bucket semi-joins prune everything
  * else (on a bucket-partitioned index table the reads prune too);
  * per-batch, edges change for O(|batch| · bucket-size) nodes, never
  * the whole layer. Search cost is the batch search's beam phase
  * alone: the expensive graph build is amortized across ingest.
  */
object StreamHnswIndex {

  final class HnswIndexSession(spark: SparkSession,
      idCol: String, vecCol: String, dim: Int, planesPerLayer: Seq[Int],
      degree: Int = 16, fanout: Long = 8, tables: Int = 2,
      hops: Int = 2, beam: Int = 16, seed: Int = 42) {
    require(planesPerLayer.nonEmpty, "need at least one layer")
    require(fanout >= 2 && (fanout & (fanout - 1)) == 0,
      s"fanout must be a power of two: $fanout")
    import spark.implicits._

    private val layers = planesPerLayer.length
    private val layerMods = (0 until layers)
      .map(j => (0 until j).foldLeft(1L)((a, _) => a * fanout))

    // state starts on the FIRST batch so ids keep their ORIGINAL type:
    // a string cast would silently change every (cosine, id) tiebreak
    // to lexicographic order and break the exact-equality contract
    // with the batch build
    @volatile private var corpus: DataFrame = null
    @volatile private var topEdges: Vector[DataFrame] = null
    // per-layer (id, tbl, bucket) — buckets are a stateless function of
    // the vector, so the table grows by exactly the batch's rows (no
    // per-batch recompute of the layer's ladder)
    @volatile private var layerBuckets: Vector[DataFrame] = null

    /** The maintained corpus: `(id, v, n, h60)` (null before data). */
    def index: DataFrame = corpus

    /** Layer j's maintained DIRECTED top-degree edges. */
    def edges(j: Int): DataFrame = topEdges(j)

    private def prep(batch: DataFrame): DataFrame =
      batch.select(
          col(idCol).as("id"),
          col(vecCol).cast("array<double>").as("v"))
        .withColumn("n", Vectors.normCol(col("v")))
        .withColumn("h60", conv(substring(
          md5(concat(lit(s"hnsw$seed:"), col("id").cast("string"))), 1, 15), 16, 10)
          .cast("long"))

    private def bucketsOf(mem: DataFrame, j: Int): DataFrame =
      (0 until tables).map { t =>
        mem.select($"id", lit(t).as("tbl"),
          Vectors.hyperplaneBucket($"v", planesPerLayer(j), dim,
            seed + j * tables + t).as("bucket"))
      }.reduce(_ union _)

    /** Assign + merge one batch (replay-idempotent: known ids are
      * dropped before anything recomputes).
      */
    def ingest(batch: DataFrame): Unit = {
      val prepped = prep(batch).dropDuplicates("id")
      if (corpus == null) {
        corpus = prepped.limit(0).localCheckpoint()
        topEdges = Vector.fill(layers)(
          prepped.select($"id".as("src"), $"id".as("dst")).limit(0)
            .localCheckpoint())
        layerBuckets = Vector.fill(layers)(
          prepped.select($"id", lit(0).as("tbl"), lit(0L).as("bucket")).limit(0)
            .localCheckpoint())
      }
      val newC = prepped
        .join(corpus.select($"id"), Seq("id"), "left_anti")
        .localCheckpoint()
      if (newC.isEmpty) return
      corpus = corpus.union(newC).localCheckpoint()
      val updates = (0 until layers).map { j =>
        val newMem = newC.filter($"h60" % layerMods(j) === 0)
        if (newMem.isEmpty) (topEdges(j), layerBuckets(j))
        else {
          val newBk = bucketsOf(newMem, j)
          val memBk = layerBuckets(j).union(newBk).localCheckpoint()
          val affBk = newBk.select($"tbl", $"bucket").distinct()
          // nodes whose candidate pool changed: anything sharing a
          // (table, bucket) with a new node — their out-edges re-rank
          // over their FULL pools (all their buckets, both tables)
          val affNodes = memBk
            .join(affBk, Seq("tbl", "bucket"), "left_semi")
            .select($"id").distinct().localCheckpoint()
          val srcBk = memBk.join(affNodes, Seq("id"), "left_semi")
          val cands = srcBk.as("x").join(memBk.as("y"),
              col("x.tbl") === col("y.tbl") &&
                col("x.bucket") === col("y.bucket") &&
                col("x.id") =!= col("y.id"))
            .select(col("x.id").as("src"), col("y.id").as("dst")).distinct()
          val mem = corpus.filter($"h60" % layerMods(j) === 0)
          val scored = cands
            .join(mem.select($"id".as("src"), $"v".as("sv"), $"n".as("sn")), "src")
            .join(mem.select($"id".as("dst"), $"v".as("dv"), $"n".as("dn")), "dst")
            .withColumn("cosine",
              round(Vectors.cosineWithNorms($"sv", $"sn", $"dv", $"dn"), 6))
          val w = Window.partitionBy($"src").orderBy($"cosine".desc, $"dst".asc)
          val recomputed = scored.withColumn("rnk", row_number().over(w))
            .filter($"rnk" <= degree).select($"src", $"dst")
          val edges = topEdges(j)
            .join(affNodes.select($"id".as("src")), Seq("src"), "left_anti")
            .union(recomputed)
            .localCheckpoint()
          (edges, memBk)
        }
      }
      topEdges = updates.map(_._1).toVector
      layerBuckets = updates.map(_._2).toVector
    }

    /** Attach to a vector stream: each micro-batch ingests on commit. */
    def start(docs: DataFrame): StreamingQuery =
      docs.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()

    /** [[Vectors.hnswTopK]]'s beam descent over the MAINTAINED graphs
      * (shared [[Vectors.hnswBeamDescent]]) — entry at the deepest
      * non-empty layer, same ranks, same tiebreaks.
      */
    def search(queries: DataFrame, k: Int): DataFrame = {
      require(corpus != null, "search before any ingest")
      val layerCount = (0 until layers).map { j =>
        corpus.filter($"h60" % layerMods(j) === 0).count()
      }
      val entryLayer = ((layers - 1) to 0 by -1)
        .find(j => layerCount(j) > 0).getOrElse(0)
      val q = queries
        .select(col(idCol).as("query_id"),
          col(vecCol).cast("array<double>").as("qv"))
        .withColumn("qn", Vectors.normCol($"qv"))
      def symmetrized(j: Int): DataFrame = {
        val t = topEdges(j)
        t.union(t.select($"dst".as("src"), $"src".as("dst"))).distinct()
      }
      Vectors.hnswBeamDescent(
        corpus.select($"id", $"v", $"n"), q,
        corpus.filter($"h60" % layerMods(entryLayer) === 0).select($"id"),
        ((entryLayer - 1) to 0 by -1).map(symmetrized),
        k, beam, hops)
    }
  }
}
