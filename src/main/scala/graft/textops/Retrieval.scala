package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-retrieval scoring over a document corpus — the query side of
  * the inverted-index surface (q62 builds the index layout; this ranks
  * against it). BM25 is the standard lexical relevance function for
  * corpus search and RAG-style retrieval at pretraining scale.
  */
object Retrieval {

  /** Okapi BM25 top-k: score every document against a bag of query
    * terms and return the k best.
    *
    * Scale shape: the corpus token stream is FILTERED to the query
    * terms before any shuffle (an `isin` over a literal set — pushed
    * into the scan projection), so the per-(doc, term) aggregate only
    * ever sees matching tokens. Document frequencies and the corpus
    * stats (N, avgdl) are tiny frames broadcast into the scoring join;
    * the final top-k is an `orderBy(...).limit(k)` the planner executes
    * as `TakeOrderedAndProject` (per-partition heaps, no global sort).
    *
    * Determinism: k1 = 1.2 and b = 0.75 are fixed literals written
    * IDENTICALLY in the DuckDB oracle (same parse, same doubles — a
    * `k1 + 1` computed at runtime need not equal a parsed `2.2`), every
    * input to the float math is an exact integer (tf, df, dl, N, total
    * tokens), and the per-doc score is rounded at 6 before ranking with
    * a doc-id tiebreak, so both engines rank the same values. The `ln`
    * term is the one libm call (the q66 precedent): per-term ulp
    * differences sit ~1e-10 below the rounding grain.
    */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val ws = TextTokens.wordsCol(col(textCol))
    // corpus-wide stats come from the UNFILTERED table: one scan, two
    // scalar aggregates, broadcast as a single row
    val stats = df.select(
      count(lit(1)).as("n_docs"),
      sum(size(ws)).cast("long").as("total_tokens"))
    val hits = df.select(col(idCol), size(ws).cast("long").as("dl"),
        explode(ws).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = hits.groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    // (doc, term) is unique in tf, so df is a plain count per term
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(broadcast(stats))
      // textually mirrored in the oracle, literal for literal
      .withColumn("__contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * col("tf") * lit(2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl")
              / (col("total_tokens").cast("double") / col("n_docs")))))
      .groupBy(col(idCol))
      .agg(round(sum(col("__contrib")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col(idCol))))
  }
}
