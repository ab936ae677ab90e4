package graft.vectors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search (BASELINE.json north star; operates on
  * the `embeddings` table: `embedding: array<float>`).
  *
  *  - [[cosineCol]]: pure-`functions` cosine (zip_with + aggregate in
  *    double) — whole-stage-codegen friendly, no UDF;
  *  - [[bruteTopK]]: exact top-k — broadcast the (small) query side,
  *    TakeOrdered per query; the correctness baseline;
  *  - [[hyperplaneBucket]]: random-hyperplane LSH key — the scale path:
  *    candidates share a bucket, turning O(N·Q) into a bucket join.
  */
object Vectors {

  /** Sequential-order dot product in double precision: deterministic
    * across engines and partitionings (array order is fixed).
    */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** cosine = dot / (sqrt(dot_aa) * sqrt(dot_bb)) — mirrors the oracle
    * formulation exactly (same op order → bit-identical doubles).
    */
  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (sqrt(dotCol(a, a)) * sqrt(dotCol(b, b)))

  /** Exact top-k neighbors for each query row. `queries` must be small
    * (it is broadcast); ranking is (rounded cosine desc, id asc) so ties
    * are deterministic.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val scored = q.join(c, $"query_id" =!= $"neighbor_id")
      .withColumn("cosine", round(cosineCol($"qv", $"nv"), 6))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
  }

  /** Deterministic random hyperplanes (fixed seed) → sign-bit bucket.
    * `planes` bits; vectors in the same bucket are ANN candidates.
    * Collision probability for angle θ: (1 − θ/π)^planes.
    */
  def hyperplaneBucket(v: Column, planes: Int, dim: Int, seed: Int = 42): Column = {
    val rnd = new scala.util.Random(seed)
    val hyperplanes = Array.fill(planes, dim)(rnd.nextGaussian())
    val bits = (0 until planes).map { p =>
      val plane = hyperplanes(p)
      val dot = aggregate(
        zip_with(v, lit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Bucketed ANN top-k: exact ranking within the query's bucket. Trades
    * recall for a bucket join; [[bruteTopK]] is the recall oracle.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int, dim: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val withBucket = (df: DataFrame, id: String, v: String) =>
      df.select(col(id), col(v), hyperplaneBucket(col(v), planes, dim).as("bucket"))
    val q = broadcast(withBucket(queries, idCol, vecCol)
      .withColumnRenamed(idCol, "query_id").withColumnRenamed(vecCol, "qv"))
    val c = withBucket(corpus, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id").withColumnRenamed(vecCol, "nv")
    val scored = q.join(c, Seq("bucket")).filter($"query_id" =!= $"neighbor_id")
      .withColumn("cosine", round(cosineCol($"qv", $"nv"), 6))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
  }
}
