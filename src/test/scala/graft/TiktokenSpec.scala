package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TiktokenEncoding, Tokenizer}

/** Tiktoken-compatible encoder: the byte-pair merge algorithm, the
  * published pre-tokenizer patterns' structural behavior, and the
  * `.tiktoken` ranks-file loader. The real o200k/cl100k rank files are
  * network data this sandbox cannot fetch, so production-id parity is
  * a deployment check (load the published file, run the published
  * vectors through the SAME code paths pinned here); the algorithm is
  * pinned on synthetic rank tables with hand-computable merges.
  */
class TiktokenSpec extends AnyFunSuite {

  private def bs(s: String): Seq[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq

  /** Singles a-z + space get ranks 0-26; then chosen merges. */
  private def baseRanks(merges: (String, Int)*): Map[Seq[Byte], Int] = {
    val singles = (('a' to 'z').map(_.toString) :+ " ").zipWithIndex
      .map { case (c, i) => bs(c) -> i }
    (singles ++ merges.map { case (m, r) => bs(m) -> r }).toMap
  }

  test("merges apply in RANK order, not left-to-right") {
    // "abc": with bc ranked below ab, bc merges FIRST even though ab
    // is further left; then abc completes if present
    val enc = TiktokenEncoding(
      baseRanks("bc" -> 100, "ab" -> 101, "abc" -> 102),
      TiktokenEncoding.Cl100kPattern)
    assert(enc.encode("abc").toSeq == Seq(102)) // a+bc -> abc
    val noFinal = TiktokenEncoding(
      baseRanks("bc" -> 100, "ab" -> 101),
      TiktokenEncoding.Cl100kPattern)
    // bc merges first (lower rank), leaving [a, bc] — ab never forms
    assert(noFinal.encode("abc").toSeq == Seq(0, 100))
  }

  test("equal-subsequence repeats: first minimal position merges first") {
    // "aaaa" with aa -> the standard overlap outcome [aa][aa]
    val enc = TiktokenEncoding(baseRanks("aa" -> 50),
      TiktokenEncoding.Cl100kPattern)
    assert(enc.encode("aaaa").toSeq == Seq(50, 50))
    assert(enc.encode("aaa").toSeq == Seq(50, 0)) // [aa][a]
  }

  test("whole-piece vocabulary hit bypasses merging") {
    val enc = TiktokenEncoding(baseRanks("dog" -> 70, "do" -> 71),
      TiktokenEncoding.Cl100kPattern)
    assert(enc.encode("dog").toSeq == Seq(70))
  }

  test("count = token count across regex pieces; space attaches to the next word") {
    // cl100k piece rule: " ?\\p{L}+"-style pieces put the leading
    // space INSIDE the following word's piece
    val enc = TiktokenEncoding(baseRanks(), TiktokenEncoding.Cl100kPattern)
    // "ab cd" pieces: ["ab", " cd"] -> bytes a,b then space,c,d
    assert(enc.encode("ab cd").toSeq == Seq(0, 1, 26, 2, 3))
    assert(enc.count("ab cd") == 5)
    val spaced = TiktokenEncoding(baseRanks(" c" -> 40, " cd" -> 41),
      TiktokenEncoding.Cl100kPattern)
    assert(spaced.encode("ab cd").toSeq == Seq(0, 1, 41))
  }

  test("cl100k pattern structure: contractions, 3-digit number groups") {
    val p = java.util.regex.Pattern.compile(TiktokenEncoding.Cl100kPattern)
    def pieces(s: String): Seq[String] = {
      val m = p.matcher(s); val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    assert(pieces("it's") == Seq("it", "'s"))
    assert(pieces("12345") == Seq("123", "45")) // numbers split in ≤3s
    assert(pieces("hello world") == Seq("hello", " world"))
    assert(pieces("x  \ny") == Seq("x", "  \n", "y"))
  }

  test("o200k pattern structure: case-split words, contractions, numbers") {
    val p = java.util.regex.Pattern.compile(TiktokenEncoding.O200kPattern)
    def pieces(s: String): Seq[String] = {
      val m = p.matcher(s); val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    // unlike cl100k, o200k's word alternative CONTAINS the contraction
    // suffix — "it's" is one piece
    assert(pieces("it's") == Seq("it's"))
    assert(pieces("12345") == Seq("123", "45"))
    assert(pieces("hello world") == Seq("hello", " world"))
    assert(pieces("HTTPResponse") == Seq("HTTPResponse"))
  }

  test("multi-byte UTF-8 survives byte-level merging (fail-loud otherwise)") {
    // é = 0xC3 0xA9; vocab has both single bytes and their merge
    val ranks: Map[Seq[Byte], Int] = Map(
      Seq(0xC3.toByte) -> 0, Seq(0xA9.toByte) -> 1,
      Seq(0xC3.toByte, 0xA9.toByte) -> 2)
    val enc = TiktokenEncoding(ranks, TiktokenEncoding.Cl100kPattern)
    assert(enc.encode("é").toSeq == Seq(2))
    // a vocabulary MISSING a needed single byte must throw, not
    // silently emit a wrong count
    val broken = TiktokenEncoding(
      Map(Seq(0xC3.toByte) -> 0), TiktokenEncoding.Cl100kPattern)
    intercept[IllegalArgumentException](broken.encode("é"))
  }

  test(".tiktoken ranks file round-trips through the loader") {
    val b64 = java.util.Base64.getEncoder
    val ranks = baseRanks("ab" -> 30, "abc" -> 31)
    val lines = ranks.toSeq.sortBy(_._2).map { case (bytes, r) =>
      s"${b64.encodeToString(bytes.toArray)} $r"
    }
    val f = java.nio.file.Files.createTempFile("ranks", ".tiktoken")
    java.nio.file.Files.write(f, String.join("\n", lines: _*).getBytes)
    val enc = TiktokenEncoding.fromFile(f.toString,
      TiktokenEncoding.Cl100kPattern)
    assert(enc.encode("abc").toSeq ==
      TiktokenEncoding(ranks, TiktokenEncoding.Cl100kPattern).encode("abc").toSeq)
    // pieces ["ab", " abc"]; " abc" merges ab(30) then abc(31),
    // leaving [" "][abc] — three tokens total: [30, 26, 31]
    assert(enc.encode("ab abc").toSeq == Seq(30, 26, 31))
    assert(enc.count("ab abc") == 3)
  }

  test("the encoder is a Tokenizer: injectable wherever fixtures stub one") {
    val t: Tokenizer = TiktokenEncoding(baseRanks(),
      TiktokenEncoding.Cl100kPattern)
    assert(t.count("abc") == 3)
  }
}
