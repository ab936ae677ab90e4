package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.{Chunker, ChunkingStrat}
import graft.functions.{CharTokenizer, FixedTokenizer, WhitespaceTokenizer}

/** Offsets pinned to the reference suite
  * `data_etl_app/tests/test_utils/test_chunk_util.py` (stub tokenizer =
  * 1 token per line, exactly like the reference's monkeypatch).
  */
class ChunkerSpec extends AnyFunSuite {
  private val oneTokenPerLine = FixedTokenizer(1)

  /** Deterministic random text corpus for property-style checks. */
  private def randomTexts(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { _ =>
      val nLines = rnd.nextInt(30)
      (0 until nLines).map { _ =>
        val len = rnd.nextInt(12)
        (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }.mkString("\n")
    }
  }

  test("empty text returns no chunks") {
    assert(Chunker.softLimit("", 5000, 0.25, Some(10), oneTokenPerLine).isEmpty)
  }

  test("canonical fixture: 5 lines, limit 3, overlap 0.5, max 2") {
    val text = "L1\nL2\nL3\nL4\nL5"
    val chunks = Chunker.softLimit(text, 3, 0.5, Some(2), oneTokenPerLine)
    assert(chunks.map(c => s"${c.chunk_start}:${c.chunk_end}") == Vector("0:9", "6:14"))
    assert(chunks(0).text == text.substring(0, 9))   // "L1\nL2\nL3\n"
    assert(chunks(1).text == text.substring(6, 14))  // "L3\nL4\nL5"
  }

  test("zero overlap: adjacent chunks share no text") {
    val text = "L1\nL2\nL3\nL4\nL5"
    val chunks = Chunker.softLimit(text, 3, 0.0, Some(10), oneTokenPerLine)
    assert(chunks.map(c => s"${c.chunk_start}:${c.chunk_end}") == Vector("0:9", "9:14"))
  }

  test("under-limit text is a single chunk covering everything") {
    val text = "Hello world!"
    val chunks = Chunker.softLimit(text, 100, 0.5, Some(10), CharTokenizer)
    assert(chunks == Vector(graft.chunk.Chunk(0, 12, text, 12)))
  }

  test("longer fixture with overlap (verified against reference behavior)") {
    val text = "L1\nL2\nL3\nL4\nL5\nL6\nL7\nL8"
    val keys = Chunker.softLimit(text, 3, 0.5, None, oneTokenPerLine)
      .map(c => s"${c.chunk_start}:${c.chunk_end}")
    assert(keys == Vector("0:9", "6:15", "12:21", "18:23"))
  }

  test("max_chunks stops early after emitting the Nth chunk") {
    val text = (1 to 100).map(i => s"line$i").mkString("\n")
    val chunks = Chunker.softLimit(text, 5, 0.0, Some(3), oneTokenPerLine)
    assert(chunks.length == 3)
  }

  test("roughlyEven integer-division sizing") {
    // total=8 lines ⇒ 8 tokens; cap 3 ⇒ divisions: 8//1>3, 8//2>3, 8//3=2<=3
    // ⇒ soft limit 2 tokens per chunk.
    val text = (1 to 8).map(i => s"L$i").mkString("\n")
    val chunks = Chunker.roughlyEven(text, 3, 0.0, None, oneTokenPerLine)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.tokens <= 3))
  }

  test("property: zero-overlap chunks concatenate to the input") {
    for (text <- randomTexts(200) if text.nonEmpty) {
      val chunks = Chunker.softLimit(text, 4, 0.0, None, oneTokenPerLine)
      assert(chunks.map(_.text).mkString == text)
      chunks.foreach { c =>
        assert(text.substring(c.chunk_start, c.chunk_end) == c.text)
      }
    }
  }

  test("property: offsets always slice the original text (with overlap)") {
    for {
      text <- randomTexts(200) if text.nonEmpty
      ratio <- Seq(0.1, 0.25, 0.4)
    } {
      Chunker.softLimit(text, 3, ratio, None, oneTokenPerLine).foreach { c =>
        assert(text.substring(c.chunk_start, c.chunk_end) == c.text)
      }
    }
  }

  test("hard limit: no chunk exceeds the cap (multi-token lines)") {
    val text = (1 to 30).map(i => s"w$i a b c").mkString("\n") // 4 tokens/line
    val chunks = Chunker.hardLimit(text, 10, 0.2, 100, WhitespaceTokenizer)
    assert(chunks.forall(_.tokens <= 10))
    assert(chunks.map(c => text.substring(c.chunk_start, c.chunk_end)) == chunks.map(_.text))
  }

  test("hard limit: backtracked overlap replays prior lines") {
    val text = "A1\nA2\nA3\nA4\nA5\nA6"
    val chunks = Chunker.hardLimit(text, 3, 0.5, 100, oneTokenPerLine)
    assert(chunks.length >= 2)
    // With overlap required = 1 token (int(3*0.5)=1), chunk 2 starts at or
    // before the line after chunk 1's last line.
    assert(chunks(1).chunk_start <= chunks(0).chunk_end)
  }

  test("hard limit: respects maxChunks") {
    val text = (1 to 50).map(i => s"L$i").mkString("\n")
    assert(Chunker.hardLimit(text, 3, 0.0, 4, oneTokenPerLine).length == 4)
  }

  test("hard limit: huge overlap requirement still makes forward progress") {
    // regression: lines of 6 tokens, cap 10, overlap 0.8 (required=8):
    // the backtrack could walk to/behind the previous chunk's start and
    // re-emit the same chunk forever, dropping the document tail
    val text = "aaaaaa one\nbbbbbb two"
    val sixTokens = new graft.functions.Tokenizer {
      override def count(s: String): Int = 6
    }
    val chunks = Chunker.hardLimit(text, 10, 0.8, 100, sixTokens)
    assert(chunks.map(_.text) == Vector("aaaaaa one\n", "bbbbbb two"))
    // every character of the input is covered
    assert(chunks.map(c => text.substring(c.chunk_start, c.chunk_end)).mkString == text)
    // and no two chunks are identical
    assert(chunks.distinct.length == chunks.length)
  }

  test("chunking strategies match the reference constants") {
    assert(ChunkingStrat.Certificate.softLimitTokens == 7500)
    assert(ChunkingStrat.Certificate.overlapRatio == 0.0)
    assert(ChunkingStrat.Certificate.maxChunks == 25)
    assert(ChunkingStrat.ProcessCap.softLimitTokens == 2500)
    assert(ChunkingStrat.ProcessCap.maxChunks == 100)
    assert(ChunkingStrat.Industry.maxChunks == 15)
    assertThrows[IllegalArgumentException] {
      ChunkingStrat("too_big", 25000, 0.1, 10)
    }
  }
}

class ChunkerSparkSpec extends SparkSpec {
  test("chunkDocs produces chunk rows with reproducible offsets") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"token line number $i").mkString("\n")
    val docs = Seq(("a.example", "v1", text), ("b.example", "v1", "short")).toDS()
    val strat = ChunkingStrat("products", 20, 0.15, 50)
    val rows = Chunker.chunkDocs(docs, strat, WhitespaceTokenizer).collect()
    val a = rows.filter(_.etld1 == "a.example").sortBy(_.chunk_start)
    assert(a.length > 1)
    a.foreach { r =>
      assert(text.substring(r.chunk_start, r.chunk_end) == r.text)
      assert(r.field_type == "products")
    }
    assert(rows.count(_.etld1 == "b.example") == 1)
  }
}
