package graft

import graft.textops.{Bpe, BpeTokenizer}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) = texts.toDF("text")

  test("train learns frequency-ordered merges with lexicographic tiebreak") {
    // words: "aa" x3, "ab" x1 -> pairs (a,a):3, (a,b):1
    val merges = Bpe.train(corpus("aa aa aa ab"), "text", numMerges = 5, minFreq = 1)
    assert(merges == Seq(("a", "a"), ("a", "b")))
  }

  test("classic Sennrich example: es -> est merge chain") {
    // {low:5, lower:2, newest:6, widest:3}: (e,s) 9 beats all, then
    // (es,t) 9, then (l,o) 7
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val merges = Bpe.train(corpus(texts.mkString(" ")), "text", numMerges = 3)
    assert(merges.take(3) == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("greedy overlap: aaa under (a,a) segments as [aa, a]") {
    assert(Bpe.segment("aaa", Seq(("a", "a"))) == IndexedSeq("aa", "a"))
    assert(Bpe.segment("aaaa", Seq(("a", "a"), ("aa", "aa"))) == IndexedSeq("aaaa"))
  }

  test("segmentation round-trips and never exceeds character count") {
    val texts = "the quick brown fox jumps over the lazy dog the the quick quick"
    val merges = Bpe.train(corpus(texts), "text", numMerges = 10, minFreq = 1)
    graft.textops.TextTokens.words(texts).foreach { w =>
      val segs = Bpe.segment(w, merges)
      assert(segs.mkString == w, s"round-trip broke for '$w'")
      assert(segs.length <= w.length)
    }
  }

  test("segment splits by code point: learned emoji merges apply at inference") {
    // the training side's split(w, '') never splits inside a surrogate
    // pair; segment must agree or merges touching non-BMP chars can
    // never match
    val emoji = new String(Character.toChars(0x1F600)) // outside the BMP
    val word = "a" + emoji
    assert(Bpe.segment(word, Nil) == IndexedSeq("a", emoji))
    val merges = Bpe.train(corpus(s"$word $word $word"), "text", numMerges = 1)
    assert(merges == Seq(("a", emoji)))
    assert(Bpe.segment(word, merges) == IndexedSeq(word))
    assert(BpeTokenizer(merges).count(word) == 1)
  }

  test("minFreq stops training before hapax pairs are merged") {
    // every pair occurs once -> nothing reaches minFreq=2
    val merges = Bpe.train(corpus("xy zw"), "text", numMerges = 5)
    assert(merges.isEmpty)
  }

  test("BpeTokenizer plugs into the Tokenizer trait and counts segments") {
    val merges = Bpe.train(corpus("aa aa aa ab"), "text", numMerges = 5, minFreq = 1)
    val tok = BpeTokenizer(merges)
    assert(tok.count("aa") == 1)     // merged to one symbol
    assert(tok.count("aa ab") == 2)  // [aa] + [ab]
    assert(tok.count("ba") == 2)     // no merge learned for (b,a)
    assert(tok.count("") == 0)
    // more merges can only shorten or preserve counts vs characters
    assert(tok.count("aaaa") <= 4)
  }

  test("training on the real documents table compresses token counts") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
    val merges = Bpe.train(docs, "text", numMerges = 30)
    assert(merges.length == 30) // a real corpus has ≥30 frequent pairs
    assert(merges.distinct.length == 30)
    val tok = BpeTokenizer(merges)
    val sample = docs.select($"text").as[String].head()
    val words = graft.textops.TextTokens.words(sample)
    val chars = words.map(_.length).sum
    val bpeToks = tok.count(sample)
    assert(bpeToks < chars, s"no compression: $bpeToks tokens vs $chars chars")
    assert(bpeToks >= words.length, "cannot go below one token per word")
  }
}
