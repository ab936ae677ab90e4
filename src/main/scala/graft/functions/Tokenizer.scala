package graft.functions

import java.util.regex.Pattern

/** Injectable token counter.
  *
  * Chunk boundaries are identity in this engine (they become `custom_id`
  * join keys — see SURVEY.md §7.5 risk 1, reference
  * `data_etl_app/src/data_etl_app/utils/chunk_util.py:167`), so the
  * tokenizer must be deterministic and pluggable. The reference uses
  * tiktoken (`open_ai_key_app/src/open_ai_key_app/utils/token_util.py:6-8`);
  * offline we ship a BPE-ish regex approximation plus deterministic test
  * stubs, and every correctness fixture pins a stub tokenizer exactly the
  * way the reference tests monkeypatch theirs
  * (`data_etl_app/tests/test_utils/test_chunk_util.py:21-24`).
  */
trait Tokenizer extends Serializable {
  def count(s: String): Int
}

/** Counts whitespace-separated words. */
object WhitespaceTokenizer extends Tokenizer {
  private val ws = Pattern.compile("\\S+")
  override def count(s: String): Int = {
    val m = ws.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }
}

/** GPT-2-style pre-tokenizer regex: counts the word/number/punctuation
  * pieces a BPE tokenizer would start from. A deterministic stand-in for
  * tiktoken with similar magnitude on English text.
  */
object BpeishTokenizer extends Tokenizer {
  private val pat = Pattern.compile(
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")
  override def count(s: String): Int = {
    val m = pat.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }
}

/** Every string costs a fixed count — the reference tests' `lambda line: 1`. */
final case class FixedTokenizer(tokens: Int = 1) extends Tokenizer {
  override def count(s: String): Int = tokens
}

/** One token per character — the reference tests' `lambda line: len(line)`. */
object CharTokenizer extends Tokenizer {
  override def count(s: String): Int = s.length
}
