package graft.functions

import java.util.regex.Pattern

/** Tiktoken-compatible byte-level BPE encoder — the PRODUCTION
  * [[Tokenizer]] implementation behind the same trait every fixture
  * stubs (SURVEY §7.5 risk 1; the reference counts with tiktoken,
  * `open_ai_key_app/src/open_ai_key_app/utils/token_util.py:6-8`).
  *
  * The algorithm is the published tiktoken scheme (re-derived from the
  * public description/spec, not ported code):
  *
  *  1. split text into PIECES with the encoding's pre-tokenizer regex
  *     (published per encoding; [[TiktokenEncoding.Cl100kPattern]] /
  *     [[TiktokenEncoding.O200kPattern]]);
  *  2. UTF-8 encode each piece; if the whole piece is a vocabulary
  *     entry, emit its rank directly;
  *  3. otherwise run byte-pair merging: start from single bytes and
  *     repeatedly merge the adjacent pair whose CONCATENATED BYTES
  *     carry the LOWEST rank in the vocabulary (first occurrence on
  *     ties — ranks are unique, so ties only arise as "both undefined"),
  *     until no adjacent concatenation is in the vocabulary; emit the
  *     ranks of the surviving segments.
  *
  * The mergeable ranks ship as the standard `.tiktoken` data file
  * (one `<base64 token> <rank>` pair per line) loaded at deploy time
  * via [[TiktokenEncoding.fromFile]] — the vocabulary is DATA, not
  * code, and this sandbox has no network to fetch the real o200k/cl100k
  * files, so parity with production ids is verified at deployment
  * (load the file, run the published vectors) while THIS repo pins the
  * algorithm on synthetic rank tables whose merge sequence is
  * hand-computable ([[graft.TiktokenSpec]]). Counting fixtures keep
  * using injected stubs, unchanged.
  */
final class TiktokenEncoding(
    ranks: Map[Seq[Byte], Int], pattern: String) extends Tokenizer {

  private val pat = Pattern.compile(pattern)

  override def count(s: String): Int = encode(s).length

  /** Encode to ranks (no special-token handling — special tokens are a
    * routing concern above the byte encoder; counting plain text never
    * produces them).
    */
  def encode(s: String): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m = pat.matcher(s)
    while (m.find()) {
      val piece = m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ranks.get(piece.toSeq) match {
        case Some(r) => out += r
        case None => out ++= bytePairEncode(piece)
      }
    }
    out.toArray
  }

  /** Greedy lowest-rank-first merging over one piece. O(n²·lookup) on
    * piece length — pieces are regex-bounded (words, ≤3-digit number
    * groups, punctuation runs), so n stays small by construction.
    */
  private[functions] def bytePairEncode(piece: Array[Byte]): Array[Int] = {
    // boundaries: piece[bounds(i) until bounds(i+1)] is segment i
    var bounds = (0 to piece.length).toVector
    def rankOf(i: Int, j: Int): Option[Int] =
      ranks.get(piece.slice(bounds(i), bounds(j)).toSeq)
    var done = false
    while (!done && bounds.length > 2) {
      // lowest-rank adjacent concatenation; first index wins on the
      // (impossible for well-formed files) equal-rank tie
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < bounds.length - 2) {
        rankOf(i, i + 2).foreach { r =>
          if (r < bestRank) { bestRank = r; best = i }
        }
        i += 1
      }
      if (best < 0) done = true
      else bounds = bounds.patch(best + 1, Nil, 1)
    }
    val out = new Array[Int](bounds.length - 1)
    var i = 0
    while (i < out.length) {
      out(i) = rankOf(i, i + 1).getOrElse(
        // a well-formed encoding has every single byte in-vocabulary;
        // fail loudly rather than emit a wrong count
        throw new IllegalArgumentException(
          s"byte sequence not in vocabulary at segment $i"))
      i += 1
    }
    out
  }
}

object TiktokenEncoding {

  /** cl100k_base pre-tokenizer (published with the encoding). */
  val Cl100kPattern: String =
    """'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""

  /** o200k_base pre-tokenizer (published with the encoding). */
  val O200kPattern: String = Seq(
    """[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+(?i:'s|'t|'re|'ve|'m|'ll|'d)?""",
    """[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*(?i:'s|'t|'re|'ve|'m|'ll|'d)?""",
    """\p{N}{1,3}""",
    """ ?[^\s\p{L}\p{N}]+[\r\n/]*""",
    """\s*[\r\n]+""",
    """\s+(?!\S)""",
    """\s+""").mkString("|")

  /** Parse the standard `.tiktoken` ranks format: one
    * `<base64 token bytes> <decimal rank>` per line, blank lines
    * ignored.
    */
  def parseRanks(lines: Iterator[String]): Map[Seq[Byte], Int] = {
    val b64 = java.util.Base64.getDecoder
    lines.filter(_.nonEmpty).map { line =>
      val sp = line.indexOf(' ')
      require(sp > 0, s"malformed ranks line: $line")
      (b64.decode(line.substring(0, sp)).toSeq,
        line.substring(sp + 1).trim.toInt)
    }.toMap
  }

  /** Load a `.tiktoken` ranks file from disk — the deployment seam:
    * point it at the published o200k_base/cl100k_base data file and
    * pair it with the matching pattern constant.
    */
  def fromFile(path: String, pattern: String): TiktokenEncoding = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try new TiktokenEncoding(parseRanks(src.getLines()), pattern)
    finally src.close()
  }

  /** An encoding over an explicit rank table (specs, custom vocabs). */
  def apply(ranks: Map[Seq[Byte], Int], pattern: String): TiktokenEncoding =
    new TiktokenEncoding(ranks, pattern)

  /** The DEPLOYMENT-DEFAULT encoding: the repo's bundled frozen rank
    * table (`graft/frozen_corpus.tiktoken`, trained to saturation from
    * the test corpus by [[graft.tools.FreezeRanks]] /
    * [[graft.textops.ByteBpe]]) behind the cl100k pre-tokenizer. In a
    * networked deployment, point [[fromFile]] at the published
    * o200k_base/cl100k_base data file instead — same loader, same
    * trait; until then every token budget counts through ONE pinned
    * vocabulary instead of a per-call stub.
    */
  lazy val frozen: TiktokenEncoding = {
    val in = getClass.getResourceAsStream("/graft/frozen_corpus.tiktoken")
    require(in != null, "bundled ranks resource graft/frozen_corpus.tiktoken missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try new TiktokenEncoding(parseRanks(src.getLines()), Cl100kPattern)
    finally src.close()
  }
}
