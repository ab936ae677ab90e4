package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE corpus tokenization: lower-cased whitespace tokens with empty
  * strings dropped. Every text operator whose DuckDB oracle mirrors
  * tokenization (near-dup shingles, repetition stats, TF-IDF,
  * decontamination) must tokenize through here — the SQL twin is
  * `graft.queries.TextOps.WordsCte`, and a drift between the two is a
  * silent gate hash mismatch.
  */
object TextTokens {
  def wordsCol(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)

  /** Plain-Scala twin of [[wordsCol]] (lowercase, whitespace-split,
    * empties dropped) for executor-side code that tokenizes outside a
    * Column expression (BPE segmentation, tokenizer impls).
    */
  def words(s: String): IndexedSeq[String] =
    s.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toIndexedSeq
}
