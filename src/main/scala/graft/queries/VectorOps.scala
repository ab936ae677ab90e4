package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.vectors.Vectors

/** Similarity-search coverage over the `embeddings` table. The
  * brute-force top-k is the DuckDB-oracled baseline (cosine computed
  * with the identical op order both sides, then rounded to 6 decimals
  * before ranking so a last-ulp wobble cannot flip ranks); the LSH
  * variant is the scale path, recall-tested against brute in specs.
  */
object VectorOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact ANN baseline: brute-force cosine top-3 for 8 queries.
    "q22_cosine_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.bruteTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 3)
        .withColumnRenamed("rank", "rnk")
        .orderBy($"query_id", $"rnk")
    },

    // ---- LSH-bucketed ANN (no oracle: bucket membership is
    // hash-defined; recall vs q22 asserted in VectorsSpec).
    "q23_lsh_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      Vectors.lshTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding",
        k = 3, planes = 4, dim = 64)
        .withColumnRenamed("rank", "rnk")
        .orderBy($"query_id", $"rnk")
    },

    // ---- embedding-cosine near-dup pairs (no oracle: LSH buckets).
    // The synthetic embeddings are near-orthogonal (max pairwise cosine
    // ≈ 0.51), so the demo threshold is 0.4; production near-dup
    // thresholds (0.9+) plug into the same operator.
    "q24_embedding_near_dup" -> { (s, dir) =>
      import s.implicits._
      graft.textops.NearDup.embeddingPairs(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        planes = 4, threshold = 0.4)
        .orderBy($"id_a", $"id_b")
    }
  )

  val oracle: Map[String, String] = Map(
    "q22_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 8),
        |c AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
        |  FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_dot_product(qv, nv) /
        |               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6) AS cosine
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 3""".stripMargin
  )
}
