package graft.chunk

import org.apache.spark.sql.Dataset

import graft.functions.Tokenizer

/** One chunk of a document. `chunk_start`/`chunk_end` are CHARACTER
  * offsets into the original text — they are identity (they become
  * `custom_id` join keys, SURVEY.md §7.5 risk 1), so their computation
  * must be deterministic and exactly reproducible.
  */
final case class Chunk(chunk_start: Int, chunk_end: Int, text: String, tokens: Int)

/** Per-field chunking policy (reference
  * `data_etl_app/src/data_etl_app/services/chunking_strat.py:9-25`).
  */
final case class ChunkingStrat(
    fieldType: String,
    softLimitTokens: Int,
    overlapRatio: Double,
    maxChunks: Int) {
  require(softLimitTokens < 25000,
    s"max_tokens must be < 25000, got $softLimitTokens")
}

object ChunkingStrat {
  val Product: ChunkingStrat = ChunkingStrat("products", 5000, 0.15, 50)
  val Certificate: ChunkingStrat = ChunkingStrat("certificates", 7500, 0.0, 25)
  val MaterialCap: ChunkingStrat = ChunkingStrat("material_caps", 5000, 0.15, 50)
  val ProcessCap: ChunkingStrat = ChunkingStrat("process_caps", 2500, 0.15, 100)
  val Industry: ChunkingStrat = ChunkingStrat("industries", 5000, 0.15, 15)
  val All: Seq[ChunkingStrat] = Seq(Product, Certificate, MaterialCap, ProcessCap, Industry)
}

/** A chunk row in the engine's `chunks` table (SURVEY.md §7.1). */
final case class ChunkRow(
    etld1: String,
    version_id: String,
    field_type: String,
    chunk_start: Int,
    chunk_end: Int,
    text: String,
    tokens: Int)

/** Line-boundary chunkers (SURVEY.md T4/T5/T7; reference
  * `data_etl_app/src/data_etl_app/utils/chunk_util.py:136-233,318-377`,
  * offsets pinned by `data_etl_app/tests/test_utils/test_chunk_util.py`).
  *
  * Execution shape: a document is chunked sequentially inside one task
  * (`flatMap`), because chunk boundaries are a running fold over line
  * token counts — but documents parallelize across the cluster, and the
  * 125k-token validity cap (BASELINE.md) bounds per-task work. No
  * Catalyst `Generator` needed; a typed `flatMap` keeps the exact
  * accumulator semantics testable.
  */
object Chunker {

  private final case class LineInfo(text: String, tokens: Int, start: Int, end: Int)

  private def lineInfos(text: String, tok: Tokenizer): Vector[LineInfo] = {
    var off = 0
    graft.ingest.Blocks.splitKeepEnds(text).map { raw =>
      val li = LineInfo(raw, tok.count(raw), off, off + raw.length)
      off += raw.length
      li
    }
  }

  /** Soft-limit chunker: chunks aim for `softLimitTokens` but may exceed
    * to finish a line; `overlapRatio` of the closed chunk's tokens is
    * carried into the next chunk as whole lines from its tail; stops
    * early at `maxChunks` (reference `chunk_util.py:136-233`).
    */
  def softLimit(
      text: String,
      softLimitTokens: Int,
      overlapRatio: Double,
      maxChunks: Option[Int],
      tok: Tokenizer): Vector[Chunk] = {
    val lines = lineInfos(text, tok)
    val out = Vector.newBuilder[Chunk]
    var count = 0
    var cur = Vector.empty[LineInfo]
    var curTokens = 0
    var curStart = 0

    def emit(): Chunk = {
      val c = Chunk(curStart, cur.last.end, cur.map(_.text).mkString, curTokens)
      out += c
      count += 1
      c
    }

    for (line <- lines) {
      if (curTokens + line.tokens > softLimitTokens && cur.nonEmpty) {
        // Carry whole lines from the tail as overlap.
        val targetOverlap = (curTokens * overlapRatio).toInt
        var overlap = Vector.empty[LineInfo]
        var overlapTokens = 0
        if (targetOverlap > 0) {
          val it = cur.reverseIterator
          while (overlapTokens < targetOverlap && it.hasNext) {
            val l = it.next()
            overlap = l +: overlap
            overlapTokens += l.tokens
          }
        }
        emit()
        if (maxChunks.exists(count >= _)) return out.result()
        curStart = if (overlap.nonEmpty) overlap.head.start else line.start
        cur = overlap :+ line
        curTokens = overlapTokens + line.tokens
      } else {
        if (cur.isEmpty) curStart = line.start
        cur = cur :+ line
        curTokens += line.tokens
      }
    }
    if (cur.nonEmpty) emit()
    out.result()
  }

  /** Hard-limit chunker: a chunk never exceeds `hardLimitTokens`; the
    * next chunk backtracks whole lines until the required
    * `hardLimitTokens*overlapRatio` overlap is covered. Per the
    * reference's accounting, the pending (not-yet-emitted) line's
    * tokens count toward that requirement — a large pending line can
    * satisfy it alone, yielding zero replayed lines.
    *
    * NOTE — corrected vs the reference: the reference's
    * `get_chunks_respecting_line_boundaries_with_hard_limit`
    * (`chunk_util.py:318-377`) never resets its accumulator after
    * emitting a chunk and walks its line index negative — it raises
    * IndexError on any input needing >1 chunk, and has no call sites in
    * the reference tree. This implementation keeps its documented
    * contract (hard cap + backtracked overlap + `maxChunks`) with the
    * accumulator reset it evidently intended, and additionally clamps
    * the backtrack to start AFTER the previous chunk's first line so
    * every chunk makes forward progress (an unclamped backtrack can
    * re-emit the same chunk until `maxChunks` and silently drop the
    * tail of the document).
    */
  def hardLimit(
      text: String,
      hardLimitTokens: Int,
      overlapRatio: Double,
      maxChunks: Int,
      tok: Tokenizer): Vector[Chunk] = {
    require(overlapRatio < 0.9, s"overlap_ratio=$overlapRatio is greater than or equal to 0.9")
    val overlapRequired = (hardLimitTokens * overlapRatio).toInt
    val lines = lineInfos(text, tok)
    val out = Vector.newBuilder[Chunk]
    var emitted = 0
    var cur = Vector.empty[LineInfo]
    var curTokens = 0
    var i = 0
    var chunkStartIdx = 0 // index of the current chunk's first line
    while (i < lines.length) {
      val line = lines(i)
      if (curTokens + line.tokens <= hardLimitTokens || cur.isEmpty) {
        // An over-limit single line still becomes its own chunk — the
        // alternative is dropping text on the floor.
        cur = cur :+ line
        curTokens += line.tokens
        i += 1
      } else {
        out += Chunk(cur.head.start, cur.last.end, cur.map(_.text).mkString, curTokens)
        emitted += 1
        if (emitted >= maxChunks) return out.result()
        // Backtrack whole lines until the required overlap is covered,
        // never past the first line after the emitted chunk's start
        // (forward-progress clamp).
        var overlapTokens = line.tokens
        var j = i - 1
        while (overlapTokens < overlapRequired && j > chunkStartIdx) {
          overlapTokens += lines(j).tokens
          j -= 1
        }
        i = math.max(j + 1, chunkStartIdx + 1)
        chunkStartIdx = i
        cur = Vector.empty
        curTokens = 0
      }
    }
    if (cur.nonEmpty) out += Chunk(cur.head.start, cur.last.end, cur.map(_.text).mkString, curTokens)
    out.result()
  }

  /** Even-chunks planner (reference `chunk_util.py:106-133`): pick the
    * division count whose integer-divided chunk size fits the cap, then
    * soft-chunk at that size.
    */
  def roughlyEven(
      text: String,
      maxTokensAllowedPerChunk: Int = 120000,
      overlapRatio: Double = 0.25,
      maxChunks: Option[Int] = None,
      tok: Tokenizer): Vector[Chunk] = {
    val total = tok.count(text)
    var divisions = 1
    while (total / divisions > maxTokensAllowedPerChunk) divisions += 1
    softLimit(text, total / divisions, overlapRatio, maxChunks, tok)
  }

  /** T6 — split bytes at newline boundaries under a size cap (reference
    * `chunk_util.py:12-69`): used when shipping JSONL payloads whose
    * consumers cap request size; a line is never split (backward search
    * window for the last newline, default 10 KB).
    */
  def splitBytesOnLineBoundaries(
      data: Array[Byte],
      maxChunkSize: Int,
      newlineSearchWindow: Int = 10000): Vector[Array[Byte]] = {
    if (data.isEmpty) return Vector.empty
    if (data.length <= maxChunkSize) return Vector(data)
    val out = Vector.newBuilder[Array[Byte]]
    var offset = 0
    while (offset < data.length) {
      var chunkSize = math.min(maxChunkSize, data.length - offset)
      if (offset + chunkSize < data.length) {
        val chunkEnd = offset + chunkSize
        val searchStart = math.max(offset, chunkEnd - newlineSearchWindow)
        var lastNl = -1
        var i = chunkEnd - 1
        while (i >= searchStart && lastNl < 0) {
          if (data(i) == '\n') lastNl = i
          i -= 1
        }
        if (lastNl > offset) chunkSize = lastNl - offset + 1
      }
      out += java.util.Arrays.copyOfRange(data, offset, offset + chunkSize)
      offset += chunkSize
    }
    out.result()
  }

  /** Chunk whole documents into the `chunks` table for one field's
    * strategy. Input rows: (etld1, version_id, text).
    */
  def chunkDocs(
      docs: Dataset[(String, String, String)],
      strat: ChunkingStrat,
      tok: Tokenizer): Dataset[ChunkRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (field, limit, ratio, maxC) =
      (strat.fieldType, strat.softLimitTokens, strat.overlapRatio, strat.maxChunks)
    docs.flatMap { case (etld1, versionId, text) =>
      softLimit(text, limit, ratio, Some(maxC), tok).map { c =>
        ChunkRow(etld1, versionId, field, c.chunk_start, c.chunk_end, c.text, c.tokens)
      }
    }
  }
}
