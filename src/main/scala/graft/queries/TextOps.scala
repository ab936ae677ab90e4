package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.vocab.{BruteSearch, Concept}

/** Text-operator coverage over the `documents` table, each with a DuckDB
  * oracle where SQL-expressible (word-boundary regexes are limited to
  * `\b`-style patterns both engines agree on).
  */
object TextOps {

  /** Small built-in vocabulary whose labels occur in the synthetic
    * documents — exercises multi-label concepts end-to-end (SURVEY T8).
    */
  val DemoVocab: Seq[Concept] = Seq(
    Concept("demo", "SparkCompute", "urn:demo/spark", Seq("spark"), Nil),
    Concept("demo", "JoinOps", "urn:demo/join", Seq("join", "merge"), Nil),
    Concept("demo", "Filtering", "urn:demo/filter", Seq("filter", "scan"), Nil),
    Concept("demo", "Windowing", "urn:demo/window", Seq("window"), Nil))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- brute vocabulary search (SURVEY T8): single-pass multi-label
    // word-boundary matcher over every document.
    "q15_brute_vocab_search" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      BruteSearch.searchColumn(docs, "text", DemoVocab, "concepts")
        .select($"doc_id", explode($"concepts").as("concept"))
        .orderBy($"doc_id", $"concept")
    }
  )

  val oracle: Map[String, String] = Map(
    "q15_brute_vocab_search" ->
      """SELECT doc_id, c AS concept
        |FROM documents, (VALUES
        |  ('SparkCompute', '\b(sparkcompute|spark)\b'),
        |  ('JoinOps',      '\b(joinops|join|merge)\b'),
        |  ('Filtering',    '\b(filtering|filter|scan)\b'),
        |  ('Windowing',    '\b(windowing|window)\b')) v(c, pat)
        |WHERE regexp_matches(lower(text), pat)""".stripMargin
  )
}
