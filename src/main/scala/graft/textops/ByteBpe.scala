package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TiktokenEncoding

/** Byte-level BPE TRAINER producing a `.tiktoken`-format mergeable-ranks
  * table — the missing data half of the [[graft.functions.TiktokenEncoding]]
  * deployment seam (the encoder algorithm landed in round 8; this makes
  * the vocabulary reproducible from a corpus when the published
  * o200k/cl100k rank files can't be fetched, and is the tool that
  * freezes the repo's bundled default table).
  *
  * Training is the published BPE procedure (Sennrich et al. 2016,
  * applied byte-level as in GPT-2/tiktoken): pre-tokenize the corpus
  * with the SAME regex the encoder will use, count distinct pieces,
  * then repeatedly merge the most frequent adjacent token pair inside
  * pieces, assigning each merged token the next rank. Because inference
  * ([[TiktokenEncoding.bytePairEncode]]) merges lowest-rank-first and
  * ranks here ARE merge-creation order, encoding replays training
  * segmentation exactly — the closure property `FrozenRanksSpec` pins.
  *
  * Scale shape: the distributed part is a piece-frequency aggregate
  * (flatMap regex pieces → map-side-combined count) — at 100 TB that is
  * one shuffle keyed by piece (vocabulary-bounded, like the q20 TF-IDF
  * df table). The merge loop is driver-side over the DISTINCT-piece
  * table (vocabulary-sized, not corpus-sized — the same bounded
  * control-plane read as the sketch/codebook builds), with incremental
  * pair-count maintenance so 50k merges over a 100k-type vocabulary
  * stay minutes, not hours.
  */
object ByteBpe {

  /** Distinct pre-tokenizer pieces with corpus frequencies. The piece
    * space is vocabulary-bounded (words/number-groups/punctuation runs),
    * so the collect is a control-plane read; `maxPieces` caps it
    * defensively by keeping the most frequent types (dropping the long
    * tail of hapax pieces only costs rare merges).
    */
  def pieceCounts(df: DataFrame, textCol: String, pattern: String,
      maxPieces: Int = 2000000): Seq[(Array[Byte], Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val pat = pattern
    val pieces: Dataset[String] = df.select(col(textCol).cast("string"))
      .as[String].flatMap { t =>
        if (t == null) Iterator.empty
        else {
          val m = java.util.regex.Pattern.compile(pat).matcher(t)
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find()) buf += m.group()
          buf.iterator
        }
      }
    pieces.groupBy(col("value")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("value"))
      .limit(maxPieces)
      .as[(String, Long)].collect().toSeq
      .map { case (s, n) =>
        (s.getBytes(java.nio.charset.StandardCharsets.UTF_8), n)
      }
  }

  /** Learn up to `numMerges` merges over the piece-frequency table.
    * Returns the full token table in RANK ORDER: ranks 0-255 are the
    * single bytes (every byte is in-vocabulary, so encoding never
    * fails), rank 256+ are merged tokens in creation order. Merging
    * stops early when no adjacent pair reaches `minFreq` — a corpus
    * saturates at its own diversity, and the caller documents the
    * achieved size. Deterministic: ties on count break by the pair's
    * concatenated bytes (lexicographic, unsigned), so the same corpus
    * always freezes the same table.
    */
  def trainRanks(pieces: Seq[(Array[Byte], Long)], numMerges: Int,
      minFreq: Long = 2L): Vector[Array[Byte]] = {
    // token table: index = rank
    val tokens = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    (0 until 256).foreach(b => tokens += Array(b.toByte))
    // each piece as a mutable token-id sequence + its corpus count
    val words = pieces.map { case (bytes, n) =>
      (scala.collection.mutable.ArrayBuffer(
        bytes.map(b => b & 0xff).toSeq: _*), n)
    }.toArray
    // pair -> total count, pair -> word indexes containing it
    val pairCount = scala.collection.mutable.Map.empty[(Int, Int), Long]
    val pairWords = scala.collection.mutable.Map.empty[(Int, Int),
      scala.collection.mutable.Set[Int]]
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val (w, n) = words(wi)
      var i = 0
      while (i < w.length - 1) {
        val p = (w(i), w(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * n
        if (c <= 0L) { pairCount.remove(p); pairWords.get(p).foreach(_.remove(wi)) }
        else {
          pairCount(p) = c
          if (sign > 0)
            pairWords.getOrElseUpdate(p,
              scala.collection.mutable.Set.empty[Int]) += wi
        }
        i += 1
      }
    }
    words.indices.foreach(addWordPairs(_, 1L))

    def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
      var i = 0
      while (i < a.length && i < b.length) {
        val x = a(i) & 0xff; val y = b(i) & 0xff
        if (x != y) return x < y
        i += 1
      }
      a.length < b.length
    }

    var merges = 0
    var exhausted = false
    while (merges < numMerges && !exhausted) {
      // best pair: highest count (>= minFreq), then
      // lexicographically-least concatenated bytes, then least
      // (left id, right id) — the final tiebreak matters when two
      // DISTINCT pairs concatenate to identical bytes (('a','bc') vs
      // ('ab','c') both → 'abc'): without it the winner would follow
      // mutable.Map iteration order and the whole downstream
      // vocabulary with it (the r9 ADVICE determinism hole)
      var best: (Int, Int) = null
      var bestCount = 0L
      var bestBytes: Array[Byte] = null
      def pairLess(a: (Int, Int), b: (Int, Int)): Boolean =
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      pairCount.foreach { case (p, c) =>
        if (c >= minFreq && c >= bestCount) {
          val bytes = tokens(p._1) ++ tokens(p._2)
          if (best == null || c > bestCount ||
              (c == bestCount && unsignedLess(bytes, bestBytes)) ||
              (c == bestCount && java.util.Arrays.equals(bytes, bestBytes) &&
                pairLess(p, best))) {
            best = p; bestCount = c; bestBytes = bytes
          }
        }
      }
      if (best == null) exhausted = true
      else {
        val newId = tokens.length
        tokens += bestBytes
        val affected = pairWords.getOrElse(best, Set.empty[Int]).toArray
        affected.foreach { wi =>
          addWordPairs(wi, -1L) // retract this word's contribution
          val (w, _) = words(wi)
          var i = 0
          while (i < w.length - 1) {
            if (w(i) == best._1 && w(i + 1) == best._2) {
              w(i) = newId; w.remove(i + 1)
            } else i += 1
          }
          addWordPairs(wi, 1L) // re-add with the merge applied
        }
        merges += 1
      }
    }
    tokens.toVector
  }

  /** Write the token table as a standard `.tiktoken` ranks file
    * (`<base64 bytes> <rank>` per line) — the format
    * [[TiktokenEncoding.parseRanks]] loads.
    */
  def writeRanksFile(tokens: Seq[Array[Byte]], path: String): Unit = {
    val enc = java.util.Base64.getEncoder
    val sb = new StringBuilder
    tokens.zipWithIndex.foreach { case (t, r) =>
      sb.append(enc.encodeToString(t)).append(' ').append(r).append('\n')
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  /** One-call freeze: train from a corpus column and write the file. */
  def freeze(df: DataFrame, textCol: String, pattern: String,
      numMerges: Int, path: String, minFreq: Long = 2L): Int = {
    val toks = trainRanks(pieceCounts(df, textCol, pattern), numMerges, minFreq)
    writeRanksFile(toks, path)
    toks.length - 256 // achieved merges
  }
}
