package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Tokenizer

/** Distributed byte-pair-encoding TRAINING (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL'16) — the
  * tokenizer-building stage of a pre-training data pipeline, learned
  * from the corpus the engine is already curating.
  *
  * The textbook MapReduce formulation:
  *
  *  1. reduce the corpus ONCE to its word-frequency table (Zipf: the
  *     distinct-word table is orders of magnitude smaller than the
  *     corpus, and the only thing the loop ever touches again);
  *  2. per merge round: explode adjacent symbol pairs weighted by word
  *     frequency, map-side-combined groupBy, take the global argmax
  *     (ONE row to the driver), and rewrite the symbol arrays with the
  *     winning merge.
  *
  * Scale shape: the corpus is read exactly once; each round shuffles
  * only distinct (pair → weight) partial counts and the argmax is a
  * `TakeOrderedAndProject`-style limit 1, never a sort of the pair
  * table. The driver accumulates nothing but the merge list itself.
  * Ties break lexicographically, so the learned merge sequence is a
  * total, deterministic function of the corpus. Lineage is cut every
  * few rounds (same rule as ConnectedComponents/knnGraph loops).
  *
  * Merges never cross word boundaries (standard word-level BPE;
  * no end-of-word marker — a `</w>` variant is a one-line change to
  * the initial split, documented rather than parameterized).
  */
object Bpe {

  /** Greedy left-to-right single-merge application: "aaa" under (a,a)
    * becomes [aa, a] — the standard overlap rule.
    */
  private[textops] def applyMerge(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Segment one word with a learned merge list (applied in learned
    * order — the order IS the vocabulary priority). Splits by CODE
    * POINT, matching the training side's `split(w, '')` (Java regex
    * zero-width splits advance by code point, never inside a surrogate
    * pair) — a per-char split would break emoji/rare-CJK into surrogate
    * halves that no learned merge could ever match.
    */
  def segment(word: String, merges: Seq[(String, String)]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = {
      val buf = scala.collection.immutable.IndexedSeq.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        buf += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      buf.result()
    }
    merges.foreach { case (a, b) => if (syms.length > 1) syms = applyMerge(syms, a, b) }
    syms
  }

  /** Learn `numMerges` merge rules from the corpus. Stops early when no
    * adjacent pair occurs at least `minFreq` times.
    */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be non-negative: $numMerges")
    val spark = corpus.sparkSession
    import spark.implicits._

    val mergeUdf = udf((syms: Seq[String], a: String, b: String) =>
      applyMerge(syms.toIndexedSeq, a, b))
    // word-frequency table: the ONLY relation the loop iterates on
    var words = corpus
      .select(explode(TextTokens.wordsCol(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(w, ''), s -> s <> '')").as("syms"), $"freq")
      .localCheckpoint()
    val pairsOf: Column = filter(
      zip_with(col("syms"), slice(col("syms"), lit(2), size(col("syms"))),
        (x, y) => struct(x.as("a"), y.as("b"))),
      p => p.getField("b").isNotNull)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var round = 0
    while (round < numMerges && !exhausted) {
      val top = words
        .select($"freq", explode(pairsOf).as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"freq").as("n"))
        .filter($"n" >= minFreq)
        .orderBy($"n".desc, $"a".asc, $"b".asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case Some((a, b, _)) =>
          merges += ((a, b))
          words = words.withColumn("syms", mergeUdf($"syms", lit(a), lit(b)))
          // cut lineage every few rounds: one UDF layer per round
          // otherwise nests numMerges plans deep
          if ((round + 1) % 8 == 0) words = words.localCheckpoint()
        case None => exhausted = true
      }
      round += 1
    }
    merges.toSeq
  }
}

/** [[graft.functions.Tokenizer]] backed by a learned merge list: the
  * corpus-trained counterpart of the regex [[graft.functions.BpeishTokenizer]],
  * pluggable everywhere the engine takes a tokenizer (chunkers, packers,
  * token-budget sampling).
  */
final case class BpeTokenizer(merges: Seq[(String, String)]) extends Tokenizer {
  override def count(s: String): Int =
    TextTokens.words(s).iterator.map(w => Bpe.segment(w, merges).length).sum
}
