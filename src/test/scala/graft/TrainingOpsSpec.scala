package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.{NearDup, TextAnalysis}

class ShinglesSpec extends SparkSpec {
  test("wordShingles: n-grams, short-text fallback, empty") {
    assert(NearDup.wordShingles("a b c d", 3) == Vector("a b c", "b c d"))
    assert(NearDup.wordShingles("a b", 3) == Vector("a b"))
    assert(NearDup.wordShingles("", 3).isEmpty)
    assert(NearDup.wordShingles("A  B\nC", 2) == Vector("a b", "b c"))
  }

  test("shinglesCol matches wordShingles") {
    import spark.implicits._
    val texts = Seq("a b c d e", "one two", "", "x y z")
    val got = texts.toDF("text")
      .select(NearDup.shinglesCol(org.apache.spark.sql.functions.col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    texts.zip(got).foreach { case (t, sh) =>
      assert(sh == NearDup.wordShingles(t, 3), s"text='$t'")
    }
  }
}

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  // Synthetic corpus: exact dup pair, near-dup pair, distinct docs.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog every single day"),
    (2L, "the quick brown fox jumps over the lazy dog every single day"),      // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog every single night"),    // near dup of 1
    (4L, "completely different content about spark query engines and shuffles"),
    (5L, "spark query engines shuffle data between executors during wide joins")
  ).toDF("doc_id", "text")

  test("jaccardPairs finds exact and near dups, not distinct docs") {
    val pairs = NearDup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashLsh output ⊆ exact output and catches all exact pairs here") {
    val exact = NearDup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = NearDup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh.diff(exact)}")
    assert(lsh == exact, s"LSH missed: ${exact.diff(lsh)}") // high-prob params
  }

  test("minhash signature estimates Jaccard within tolerance") {
    val a = (1 to 100).map(i => s"sh$i").map(s => scala.util.hashing.MurmurHash3.stringHash(s).toLong)
    val b = (51 to 150).map(i => s"sh$i").map(s => scala.util.hashing.MurmurHash3.stringHash(s).toLong)
    val est = NearDup.estimate(NearDup.signature(a, 128), NearDup.signature(b, 128))
    val truth = 50.0 / 150.0
    assert(math.abs(est - truth) < 0.15, s"est=$est truth=$truth")
  }

  test("simhash: identical texts distance 0, near texts small distance") {
    val s1 = NearDup.simhash(docs.collect()(0).getString(1), 3)
    val s2 = NearDup.simhash(docs.collect()(1).getString(1), 3)
    val s3 = NearDup.simhash(docs.collect()(3).getString(1), 3)
    assert(NearDup.hamming(s1, s2) == 0)
    assert(NearDup.hamming(s1, s3) > 10)
  }

  test("simhashPairs finds the exact-dup pair via block bucketing") {
    val pairs = NearDup.simhashPairs(docs, "doc_id", "text", 3, 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("containmentPairs: asymmetric denominators catch small-in-big " +
       "duplication that Jaccard misses") {
    // doc 11 (a 12-word notice) is copied verbatim into doc 12 (padded
    // with 24 distinct words): containment(11→12) = 1.0 while Jaccard
    // stays far below any sane threshold
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val pad = (1 to 24).map(i => s"pad$i").mkString(" ")
    val d = Seq((11L, small), (12L, s"$small $pad")).toDF("doc_id", "text")
    val jac = NearDup.jaccardPairs(d, "doc_id", "text", 3, 0.5)
      .collect()
    assert(jac.isEmpty, "Jaccard should NOT fire on small-in-big")
    val out = NearDup.containmentPairs(d, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // 11→12: all 10 of 11's shingles shared -> containment 1.0;
    // 12→11: 10 of 34 shingles -> ~0.29, below threshold
    assert(out.keySet == Set((11L, 12L)))
    assert(out((11L, 12L)) == ((10L, 10L, 1.0)))
  }

  test("containmentPairs hot-shingle cap drops boilerplate joins but " +
       "keeps sizes uncapped") {
    // 4 docs share one boilerplate shingle ("x y z"); with cap = 3 the
    // shingle's postings (df = 4) are dropped, so no pair forms — but
    // a genuine pair over distinct content still emits with its FULL
    // (uncapped) set size in the denominator
    val d = Seq(
      (1L, "x y z a b c"), (2L, "x y z d e f"),
      (3L, "x y z g h i"), (4L, "x y z j k l"),
      (5L, "p q r s t u"), (6L, "p q r s t u v")).toDF("doc_id", "text")
    val out = NearDup.containmentPairs(d, "doc_id", "text", 3, 0.5, maxPostings = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(!out.keySet.exists(p => Set(1L, 2L, 3L, 4L).contains(p._1)),
      s"boilerplate-only pairs must not form: ${out.keySet}")
    // doc5 has 4 shingles, all shared with doc6 (5 shingles):
    // 5→6 containment 1.0, 6→5 = 4/5 = 0.8
    assert(out((5L, 6L)) == ((4L, 4L, 1.0)))
    assert(out((6L, 5L)) == ((5L, 4L, 0.8)))
  }

  test("dedupKeyCol collides casing/digit/punctuation variants, keeps " +
       "distinct content apart") {
    import graft.textops.TextTokens
    val d = Seq(
      (1L, "Hello, World! v2.1 (2024)"),
      (2L, "HELLO WORLD v7.3 (1999)"),      // same after normalization
      (3L, "hello\tworld\n v8.4 [2001]"),   // ws/bracket variant, same key
      (4L, "goodbye world v2.1 (2024)"))    // different content
      .toDF("doc_id", "text")
    val keys = d.select($"doc_id", TextTokens.dedupKeyCol($"text").as("k"))
      .as[(Long, String)].collect().toMap
    assert(keys(1L) == "hello world v0 0 0")
    assert(keys(1L) == keys(2L) && keys(2L) == keys(3L))
    assert(keys(4L) != keys(1L))
  }

  test("containmentPairs matches a naive in-memory reference on random corpora") {
    val rnd = new scala.util.Random(99)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 0 until 3) {
      val docsSeq = (1L to 25L).map { i =>
        i -> Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val n = 2
      val cap = 6L
      val τ = 0.6
      // naive reference: shingle sets in plain Scala, same cap rule
      val sets = docsSeq.map { case (id, t) => id -> NearDup.wordShingles(t, n).toSet }.toMap
      val dfCount = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val capped = sets.view.mapValues(_.filter(sh => dfCount(sh) <= cap)).toMap
      val expected = (for {
        (ia, sa) <- capped.toSeq; (ib, sb) <- capped.toSeq if ia != ib
        inter = (sa intersect sb).size if sets(ia).nonEmpty
        // UNROUNDED int/int division, mirroring the operator (one IEEE
        // division of exact integers is bit-identical across engines)
        c = inter.toDouble / sets(ia).size
        if inter > 0 && c >= τ
      } yield (ia, ib) -> (sets(ia).size.toLong, inter.toLong, c)).toMap
      val got = NearDup.containmentPairs(
          docsSeq.toDF("doc_id", "text"), "doc_id", "text", n, τ, maxPostings = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("recall on real documents table: LSH ≥ 95% of exact pairs at sf0.001") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = NearDup.jaccardPairs(real, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = NearDup.minhashLshPairs(real, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.95, s"recall=$recall exact=${exact.size} lsh=${lsh.size}")
    }
  }

  test("crossCorpusPairs ≡ the full self-join's cross pairs, reoriented a→b") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = real.filter($"doc_id" % 3 =!= 0)
    val b = real.filter($"doc_id" % 3 === 0)
    val cross = NearDup.crossCorpusPairs(a, b, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every cross pair: a-side id from corpus a, b-side from corpus b
    assert(cross.forall { case (x, y) => x % 3 != 0 && y % 3 == 0 })
    // signatures are per-doc, so the union self-join's cross-corpus
    // pairs (reoriented to a→b) must agree exactly
    val whole = NearDup.minhashLshPairs(real, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = whole.collect {
      case (x, y) if x % 3 != 0 && y % 3 == 0 => (x, y)
      case (x, y) if x % 3 == 0 && y % 3 != 0 => (y, x)
    }
    assert(cross === expected)
    assert(cross.nonEmpty, "fixture must contain cross-corpus near-dups")
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("scriptMix: per-class fractions, mixed-script and degenerate cases") {
    val df = Seq(
      (1L, "abcde12345"),            // 5 latin + 5 digit, nothing else
      (2L, "привет"),                // all cyrillic (6 cp)
      (3L, "你好"),                   // all han (2 cp)
      (4L, ""),                      // empty → all fractions 0.0
      (5L, "ab 你好 привет 1")        // mixed with spaces
    ).toDF("doc_id", "t")
    val out = TextAnalysis.scriptMix(df, "t")
      .select($"doc_id", $"n_cp", $"latin_frac", $"digit_frac",
        $"cyrillic_frac", $"han_frac")
      .as[(Long, Int, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 10, 0.5, 0.5, 0.0, 0.0)))
    assert(out(2L) === ((2L, 6, 0.0, 0.0, 1.0, 0.0)))
    assert(out(3L) === ((3L, 2, 0.0, 0.0, 0.0, 1.0)))
    assert(out(4L) === ((4L, 0, 0.0, 0.0, 0.0, 0.0)))
    val m = out(5L) // 14 cp: 2 latin + 1 digit + 6 cyrillic + 2 han + 3 spaces
    assert(m._2 === 14)
    assert(m._3 === 2.0 / 14 && m._4 === 1.0 / 14)
    assert(m._5 === 6.0 / 14 && m._6 === 2.0 / 14)
  }

  test("compressionRatio: repetitive text compresses far below varied text") {
    val ratio = TextAnalysis.compressionRatioUdf
    val rows = Seq(
      ("rep", "spam ham " * 200),
      ("varied", (1 to 400).map(i => s"w${i * 7919 % 1000}").mkString(" ")),
      ("empty", "")
    ).toDF("kind", "t").select($"kind", ratio($"t").as("r"))
      .as[(String, Double)].collect().toMap
    assert(rows("empty") == 0.0)
    assert(rows("rep") > 0.0 && rows("rep") < 0.1, s"rep=${rows("rep")}")
    assert(rows("varied") > rows("rep") * 3, s"varied=${rows("varied")}")
    // deterministic across invocations
    val again = Seq(("rep", "spam ham " * 200)).toDF("kind", "t")
      .select(ratio($"t")).as[Double].head()
    assert(again == rows("rep"))
    // null text (nullable column) must not NPE the task
    val withNull = Seq(("null", Option.empty[String]), ("ok", Some("a b")))
      .toDF("kind", "t").select($"kind", ratio($"t").as("r"))
      .as[(String, Double)].collect().toMap
    assert(withNull("null") == 0.0)
    assert(withNull("ok") > 0.0)
  }

  test("quality features and score") {
    val df = Seq((1L, "the cat sat on the mat with the hat and a bat near it")).toDF("doc_id", "text")
    val row = TextAnalysis.qualityFeatures(df, "text")
      .select(col("n_words"), col("distinct_ratio"), col("stopword_hits")).collect().head
    assert(row.getInt(0) == 14)
    assert(row.getInt(2) == 3) // the, and, a
  }

  test("encodingAnomalies counts replacement/control/C1 chars exactly") {
    val df = Seq(
      (1L, "clean ascii text, with tabs\tand\r\nwindows line endings"),
      (2L, "decoder gave up \uFFFD here and \uFFFD there"),
      (3L, "binary \u0001pay\u0000load\u0007with\u007Fcontrols"), // 30 chars, 4 C0/DEL
      (4L, "cp1252 mojibake \u0091smart quotes\u0092 band"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.encodingAnomalies(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got(1L) == ((0L, 0L, 0L, 0.0, 1))) // tab/CR/LF are legitimate
    assert(got(2L)._1 == 2L && got(2L)._5 == 0)
    assert(got(3L) == ((0L, 4L, 0L, 4.0 / 30, 0)))
    assert(got(4L)._3 == 2L && got(4L)._5 == 0)
    assert(got(5L) == ((0L, 0L, 0L, 0.0, 1))) // empty: no anomaly, no NaN
  }

  test("langId picks the profile with most hits; unknown when none") {
    val got = Seq(
      "the cat and the dog of the house",
      "der hund und die katze ist ein tier",
      "xyzzy qwerty plugh")
      .toDF("text")
      .select(TextAnalysis.langIdCol(col("text")).as("l")).as[String].collect()
    assert(got(0) == "en" && got(1) == "de" && got(2) == "unknown")
  }

  test("rolling hashes + winnow: shared substrings share fingerprints") {
    val a = TextAnalysis.winnow(TextAnalysis.rollingHashes(
      "PREFIX common shared span of text SUFFIX-A", 8), 4).toSet
    val b = TextAnalysis.winnow(TextAnalysis.rollingHashes(
      "OTHER-- common shared span of text TAIL-BBB", 8), 4).toSet
    assert(a.intersect(b).nonEmpty)
    val c = TextAnalysis.winnow(TextAnalysis.rollingHashes(
      "entirely unrelated words right here", 8), 4).toSet
    assert(a.intersect(c).isEmpty)
  }

  test("winnow edge cases") {
    assert(TextAnalysis.winnow(Vector.empty, 4).isEmpty)
    assert(TextAnalysis.winnow(Vector(5L, 3L), 4) == Vector(3L))
    assert(TextAnalysis.rollingHashes("", 8).isEmpty)
    assert(TextAnalysis.rollingHashes("ab", 8).length == 1)
  }

  test("charEntropy: exact values on crafted distributions") {
    val got = Seq("aabb", "abcd", "aaaa", "a a", "")
      .toDF("text")
      .select(TextAnalysis.charEntropyCol(col("text")).as("h"),
        TextAnalysis.charAlphabetCol(col("text")).as("k"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(got(0) === ((1.0, 2)))          // {a:2, b:2} over 4 -> 1 bit
    assert(got(1) === ((2.0, 4)))          // uniform over 4 -> 2 bits
    assert(got(2) === ((0.0, 1)))          // degenerate -> 0 bits
    // spaces are characters: {a:2, ' ':1} over 3
    val h = math.log(3) / math.log(2) - (2.0 * 1.0) / 3
    assert(math.abs(got(3)._1 - h) < 1e-6 && got(3)._2 === 2)
    assert(got(4) === ((0.0, 0)))          // empty text
  }
}

class VectorsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.vectors.Vectors

  test("cosineCol: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 2f), Seq(1f, 2f), 1.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0)).toDF("a", "b", "want")
    val rows = df.select(Vectors.cosineCol(col("a"), col("b")).as("cos"), col("want"))
      .as[(Double, Double)].collect()
    rows.foreach { case (cos, want) => assert(math.abs(cos - want) < 1e-9) }
  }

  test("bruteTopK on real embeddings: self excluded, ranks contiguous") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val top = Vectors.bruteTopK(emb, emb.filter($"vec_id" < 4), "vec_id", "embedding", 3)
    val rows = top.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    assert(rows.length == 12)
    rows.foreach { case (q, _, n) => assert(q != n) }
    val byQ = rows.groupBy(_._1)
    byQ.values.foreach(rs => assert(rs.map(_._2).sorted.toSeq == Seq(1, 2, 3)))
  }

  test("hardNegatives: no same-label neighbor, cosines exact, ranks dense") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val out = Vectors.hardNegatives(emb, emb.filter($"vec_id" < 8),
        "vec_id", "embedding", "label", k = 3, planes = 4, dim = 64)
      .select("query_id", "rank", "neighbor_id", "neighbor_label", "cosine")
      .as[(Long, Int, Long, Int, Double)].collect()
    out.foreach { case (q, _, n, nl, _) =>
      assert(q != n)
      assert(labels(q) != nl, s"query $q got same-label neighbor $n")
      assert(labels(n) == nl)
    }
    out.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      // ordered by cosine desc, id asc within each query
      val key = rs.sortBy(_._2).map(r => (-r._5, r._3)).toSeq
      assert(key == key.sorted)
    }
  }

  test("mmrSelect prefers diversity over a redundant higher-relevance pick") {
    // anchor [1,0,0]: a and b are near-duplicates of each other
    // (cos(a,b) ≈ 0.9989, above both relevances); c is less relevant
    // but out of their plane. Round 2: b scores 0.5·0.9701 − 0.5·0.9989
    // ≈ −0.014 while c scores 0.5·0.7001 − 0.5·0.6866 ≈ +0.007, so MMR
    // must pick a, c, b — raw relevance order would be a, b, c.
    val pool = Seq(
      (1L, Seq(1.0f, 0.2f, 0.0f)),
      (2L, Seq(1.0f, 0.25f, 0.0f)),
      (3L, Seq(0.7f, 0.0f, 0.714f))).toDF("vec_id", "embedding")
    val out = Vectors.mmrSelect(pool, "vec_id", "embedding",
        Array(1.0, 0.0, 0.0), lambda = 0.5, k = 3)
      .select("rnk", "vec_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L))
  }

  test("mmrSelect returns fewer rows than k on a small pool, scores rounded") {
    val pool = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Vectors.mmrSelect(pool, "vec_id", "embedding",
        Array(1.0, 0.0), lambda = 0.5, k = 5).collect()
    assert(out.length == 2)
    out.foreach { r =>
      val s = r.getAs[Double]("mmr_score")
      assert(s == BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("lshTopK results ⊆ brute ranking candidates and recall is sane") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Vectors.lshTopK(emb, queries, "vec_id", "embedding", 3, planes = 4, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // LSH@3 recall vs brute@3 — random 64-dim embeddings are a hard case
    // for hyperplane LSH; just assert it returns something plausible and
    // every returned neighbor shares the query's bucket by construction.
    assert(lsh.nonEmpty)
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall > 0.0, s"recall=$recall")
  }

  test("knnGraph refinement rounds strictly improve recall over LSH seeding") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Vectors.bruteTopK(emb, emb, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(rounds: Int): Double = {
      val g = Vectors.knnGraph(emb, "vec_id", "embedding",
          k = 3, planes = 3, dim = 64, rounds = rounds, tables = 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      g.intersect(brute).size.toDouble / brute.size
    }
    val seeded = recallAt(0) // = multi-table LSH candidates only
    val refined = recallAt(2)
    // co-neighbor proposals must buy real recall even on the
    // near-orthogonal synthetic embeddings — the worst case for the
    // descent, since "neighbor of neighbor" carries little signal when
    // no cluster structure exists (observed 0.55 -> 0.60 at sf0.001;
    // bounds left slack so a generator reroll doesn't flap the suite)
    assert(refined > seeded, s"seeded=$seeded refined=$refined")
    assert(refined >= 0.5, s"refined recall too low: $refined")
  }

  test("semanticDedup: paper sweep keeps the most-diverse duplicate, " +
       "cells isolate, greedy is non-transitive") {
    // centroid c0=(1,0,0), c1=(0,1,0). Cell 0: three near-collinear
    // vectors a~b~c with cos(a,b)>=τ, cos(b,c)>=τ but cos(a,c)<τ; cell
    // 1: one lone vector. Sweep order is centroid_sim ASC, so the
    // FARTHEST-from-centroid member is kept first (the paper's
    // diversity choice) and the chain prunes greedily, not
    // transitively.
    val centroids = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f))).toDF("cid", "cv")
    val vecs = Seq(
      (10L, Seq(1.00f, 0.00f, 0.0f)),   // csim 1.0     (closest to c0)
      (11L, Seq(0.95f, 0.3122499f, 0.0f)), // csim ~0.95
      (12L, Seq(0.81f, 0.5864315f, 0.0f)), // csim ~0.81  (kept first)
      (20L, Seq(0.1f, 0.99f, 0.0f)))    // cell 1, alone
      .toDF("vec_id", "embedding")
    // pairwise: cos(10,11)=.95, cos(11,12)=~.953, cos(10,12)=.81
    val τ = 0.9
    val out = Vectors.semanticDedup(vecs, "vec_id", "embedding",
        centroids, "cid", "cv", threshold = τ)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(4))).toMap
    // cell 0 sweep order: 12 (rnk 1, keep), 11 (rnk 2, dup of 12),
    // 10 (rnk 3: cos(10,12)=0.81 < τ, cos(10,11)=0.95 >= τ → dup).
    assert(out(12L) == ((0L, 1, 1)))
    assert(out(11L) == ((0L, 2, 0)))
    assert(out(10L) == ((0L, 3, 0)))
    assert(out(20L)._1 == 1L && out(20L)._3 == 1)
  }

  test("semanticDedup sweep compares against ALL earlier items, " +
       "dropped ones included") {
    val centroids = Seq((0L, Seq(1.0f, 0.0f, 0.0f))).toDF("cid", "cv")
    // order by csim asc: A first. B dups on A; C is within τ of B only
    // (cos(a,c) < τ) — SemDeDup's greedy compares each item against
    // every EARLIER-in-order item regardless of that item's own dup
    // status, so C still dups on the already-dropped B. Assert the
    // documented behavior exactly.
    val a = Seq(0.80f, 0.60f, 0.0f)
    val b = Seq(0.95f, 0.3122499f, 0.0f)  // cos(a,b) ≈ 0.947
    val c = Seq(1.00f, 0.00f, 0.0f)       // cos(b,c) = 0.95, cos(a,c) = 0.8
    val out = Vectors.semanticDedup(
        Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", centroids, "cid", "cv", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out == Map(1L -> 1, 2L -> 0, 3L -> 0))
  }

  test("clusterBalancedSample: caps per cell, agrees with the assignment, " +
       "deterministic, salt-sensitive") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val codebook = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    def run(salt: String) = Vectors.clusterBalancedSample(
        emb, "vec_id", "embedding", codebook, "cid", "cv", k = 5, salt = salt)
      .as[(Long, Long, Double, Int)].collect()
    val out = run("s1")
    val byCell = out.groupBy(_._2)
    assert(byCell.nonEmpty)
    byCell.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }
    val cells = Vectors.assignCells(emb, "vec_id", "embedding",
        codebook, "cid", "cv")
      .select($"id", $"cell").as[(Long, Long)].collect().toMap
    out.foreach { case (id, cell, _, _) => assert(cells(id) == cell) }
    assert(run("s1").toSet == out.toSet)
    assert(run("s2").map(_._1).toSet != out.map(_._1).toSet,
      "different salt must select a different sample")
  }

  test("clusterBudgetMix: per-cell token budgets over semantic cells") {
    val centroids = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "cv")
    // cell 0: three 4-token docs; cell 1: one doc
    val docs = Seq(
      (1L, "a b c d", Seq(1.0, 0.1)),
      (2L, "e f g h", Seq(1.0, 0.2)),
      (3L, "i j k l", Seq(0.9, 0.0)),
      (4L, "m n o p", Seq(0.1, 1.0)))
      .toDF("doc_id", "text", "embedding")
    // budget covers two cell-0 docs; cell 1 unbudgeted -> excluded
    val out = Vectors.clusterBudgetMix(docs, "doc_id", "text", "embedding",
        centroids, "cid", "cv", budgets = Map("0" -> 8L), salt = "s")
      .as[(Long, String, Int, Long)].collect()
    assert(out.forall(_._2 == "0"))
    assert(out.length == 2 && out.map(_._4).max == 8L)
    // the admitted prefix follows the salted-md5 order, like q37
    val cells = Vectors.assignCells(docs, "doc_id", "embedding",
        centroids, "cid", "cv")
      .select($"id", $"cell").as[(Long, Long)].collect().toMap
    out.foreach { case (id, cell, _, _) => assert(cells(id).toString == cell) }
  }

  test("semanticDedup matches a naive in-memory reference on random corpora") {
    val rnd = new scala.util.Random(123)
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for (trial <- 0 until 2) {
      val dim = 6
      val vecs = (1L to 30L).map { i =>
        // clustered-ish: random base direction + noise, so cells and
        // in-cell duplicates both occur. Values go through Float FIRST
        // (the storage type) so the naive math sees exactly what Spark
        // sees after its array<double> cast.
        val base = rnd.nextInt(3)
        i -> Array.tabulate(dim)(j =>
          ((if (j == base * 2) 5.0 else 0.0) + rnd.nextDouble()).toFloat.toDouble)
      }
      val τ = 0.95
      val cents = vecs.take(3).map { case (id, v) => id -> v }
      // naive: argmax assignment with (csim desc, cid asc) tiebreak
      val assigned = vecs.map { case (id, v) =>
        val best = cents.map { case (cid, cv) => (round6(cos(v, cv)), cid) }
          .maxBy { case (s, cid) => (s, -cid) }
        (id, v, best._2, best._1)
      }
      val expected = assigned.groupBy(_._3).values.flatMap { cell =>
        val order = cell.sortBy { case (id, _, _, csim) => (csim, id) }
        order.zipWithIndex.map { case ((id, v, cellId, csim), idx) =>
          val dup = order.take(idx).exists { case (_, pv, _, _) =>
            round6(cos(v, pv)) >= τ
          }
          id -> ((cellId, idx + 1, csim, if (dup) 0 else 1))
        }
      }.toMap
      val df = vecs.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
        .toDF("vec_id", "embedding")
      val cdf = cents.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
        .toDF("cid", "cv")
      val got = Vectors.semanticDedup(df, "vec_id", "embedding", cdf, "cid", "cv", τ)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("semanticDedup plan: broadcast codebook cross-score, partial " +
       "argmax aggregate, cell-partitioned sweep window") {
    // PlanCheck can't see behind the localCheckpoint (the q58
    // situation), so the scale contracts are pinned here on the
    // uncheckpointed plan: the codebook side must broadcast (never a
    // shuffled cross product), the argmax must be an aggregate (so the
    // N×k scored rows partial-combine to N before the shuffle), and
    // the sweep window must be partitioned by cell (never global).
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Vectors.semanticDedup(emb, "vec_id", "embedding",
      emb.filter($"vec_id" < 8), "vec_id", "embedding",
      threshold = 0.4, checkpointRanked = false)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), "codebook must broadcast")
    assert(!plan.contains("CartesianProduct"), "no shuffled cross product")
    assert(plan.contains("max_by"), "argmax must be a (partial) aggregate")
    assert(plan.contains("windowspecdefinition(cell"),
      "sweep window must partition by cell")
  }

  test("semanticDedup maxCellSize splits an adversarial all-one-cell " +
       "corpus into bounded sub-cells with sweep semantics preserved") {
    // one centroid attracts EVERYTHING — the O(cell²) skew hazard. With
    // maxCellSize=4 and 20 rows, the cell must split into ⌈20/4⌉=5
    // hash-assigned sub-cells; the greedy sweep runs within each.
    val rnd = new scala.util.Random(7)
    val dim = 4
    val vecs = (1L to 20L).map { i =>
      i -> Array.tabulate(dim)(j =>
        ((if (j == 0) 5.0 else 0.0) + rnd.nextDouble()).toFloat)
    }
    val df = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val cdf = Seq((0L, Seq(1.0f, 0.05f, 0.05f, 0.05f))).toDF("cid", "cv")
    val τ = 0.95
    val maxCell = 4L
    val out = Vectors.semanticDedup(df, "vec_id", "embedding", cdf, "cid", "cv",
        threshold = τ, maxCellSize = maxCell)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(4)))).toMap

    // naive reference replicating the deterministic md5 sub assignment
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val nSub = (vecs.length + maxCell - 1) / maxCell
    def subOf(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"semsub:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % nSub
    }
    val cv = Array(1.0f, 0.05f, 0.05f, 0.05f)
    val expected = vecs.groupBy { case (id, _) => subOf(id) }.values.flatMap { grp =>
      val order = grp.sortBy { case (id, v) => (round6(cos(v, cv)), id) }
      order.zipWithIndex.map { case ((id, v), idx) =>
        val dup = order.take(idx).exists { case (_, pv) => round6(cos(v, pv)) >= τ }
        id -> ((0L, idx + 1, if (dup) 0 else 1))
      }
    }.toMap
    assert(out === expected)
    // the split actually happened: several sub-cells, none spanning the cell
    assert(vecs.map(v => subOf(v._1)).distinct.size > 1, "cell must split")
    assert(out.values.map(_._2).max < vecs.length,
      "no sweep may span the whole oversized cell")

    // plan contract: the sweep window and pair join key on (cell, sub),
    // so no single partition group ever processes the whole cell
    val audit = Vectors.semanticDedup(df, "vec_id", "embedding", cdf, "cid", "cv",
      threshold = τ, checkpointRanked = false, maxCellSize = maxCell)
    val plan = audit.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(cell#\\d+L?, sub#".r.findFirstIn(plan).isDefined,
      s"sweep window must partition by (cell, sub): $plan")

    // a generous cap leaves the operator bit-identical to the unsplit form
    val unsplit = Vectors.semanticDedup(df, "vec_id", "embedding", cdf, "cid", "cv",
        threshold = τ, maxCellSize = 1L << 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(4)))).toMap
    val order = vecs.sortBy { case (id, v) => (round6(cos(v, cv)), id) }
    val expUnsplit = order.zipWithIndex.map { case ((id, v), idx) =>
      val dup = order.take(idx).exists { case (_, pv) => round6(cos(v, pv)) >= τ }
      id -> ((0L, idx + 1, if (dup) 0 else 1))
    }.toMap
    assert(unsplit === expUnsplit)
  }

  test("semanticDedup accepts string centroid ids with natural-order " +
       "tiebreaks and unchanged numeric behavior") {
    // two IDENTICAL centroids: every vector scores an exact tie, so the
    // tiebreak decides the cell — must go to the lexicographically
    // smallest id ("alpha"), mirroring the numeric smallest-id rule
    val cdf = Seq(
      ("beta", Seq(1.0f, 0.0f, 0.0f)),
      ("alpha", Seq(1.0f, 0.0f, 0.0f))).toDF("cid", "cv")
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 0f)), (2L, Seq(0.91f, 0.1f, 0f)),
      (3L, Seq(0f, 0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Vectors.semanticDedup(df, "vec_id", "embedding", cdf, "cid", "cv",
        threshold = 0.99)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(4)))).toMap
    assert(out.values.forall(_._1 == "alpha"), s"ties must pick 'alpha': $out")
    assert(out(1L)._2 + out(2L)._2 == 1, "near-twins: exactly one survives")
    assert(out(3L)._2 == 1)

    // string codebook ≡ numeric codebook on the same geometry (cells
    // renamed, keep/rnk identical)
    val cNum = Seq((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f)))
      .toDF("cid", "cv")
    val cStr = Seq(("c0", Seq(1.0f, 0.0f, 0.0f)), ("c1", Seq(0.0f, 1.0f, 0.0f)))
      .toDF("cid", "cv")
    val data = Seq(
      (10L, Seq(1.0f, 0.05f, 0f)), (11L, Seq(0.99f, 0.1f, 0f)),
      (12L, Seq(0.05f, 1.0f, 0f))).toDF("vec_id", "embedding")
    val num = Vectors.semanticDedup(data, "vec_id", "embedding", cNum, "cid", "cv", 0.95)
      .collect().map(r => r.getLong(0) -> ((s"c${r.getLong(1)}", r.getInt(2), r.getInt(4)))).toMap
    val str = Vectors.semanticDedup(data, "vec_id", "embedding", cStr, "cid", "cv", 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(4)))).toMap
    assert(num === str)
  }

  test("kmeansParallelFit pads to k distinct centers when admissions " +
       "fall short, deterministically") {
    // 8 distinct, well-spread vectors; a vanishing oversample admits
    // (essentially) no candidates beyond the seed, so the fit must PAD
    // to the k the caller asked for — with distinct vectors
    val d = (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(4)(j => if (j == i % 4) (10.0f + i) else 0.1f * i))
    }.toDF("vec_id", "embedding")
    val centers = Vectors.kmeansParallelFit(d, "vec_id", "embedding",
      k = 4, rounds = 2, oversample = 1e-12)
    assert(centers.length == 4, s"padded codebook must have k=4 centers, got ${centers.length}")
    assert(centers.map(_.toSeq).distinct.length == 4, "padded centers must be distinct")
    val again = Vectors.kmeansParallelFit(d.repartition(5), "vec_id", "embedding",
      k = 4, rounds = 2, oversample = 1e-12)
    assert(centers.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "padding must be partitioning-invariant")
    // degenerate corpus: fewer distinct vectors than k — k centers
    // don't exist; the distinct set comes back, not fabricated rows
    val tiny = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val few = Vectors.kmeansParallelFit(tiny, "vec_id", "embedding", k = 5)
    assert(few.map(_.toSeq).distinct.length == few.length && few.length == 2)
  }

  test("kmeansParallelFit recovers separated clusters exactly and is " +
       "invariant to partitioning") {
    // 3 well-separated clusters in 4-d, deterministic jitter
    val pts = (0 until 300).map { i =>
      val c = i % 3
      val base = Array(0.0, 0.0, 0.0, 0.0); base(c) = 10.0
      val j = i / 3
      (i.toLong, Seq(base(0) + (j % 5) * 0.01f, base(1) + (j % 7) * 0.01f,
        base(2) + (j % 3) * 0.01f, base(3) + (j % 11) * 0.01f).map(_.toFloat))
    }
    val d = pts.toDF("vec_id", "embedding")
    val centers = Vectors.kmeansParallelFit(d, "vec_id", "embedding", k = 3)
    assert(centers.length == 3)
    // every fitted center lives inside exactly one true cluster (its
    // dominant axis carries ~10, others ~0) and the three centers
    // cover all three clusters
    val axes = centers.map(c => c.indexOf(c.max)).toSet
    assert(axes == Set(0, 1, 2), s"axes covered: $axes")
    centers.foreach(c => assert(c.max > 9.0 && c.sorted.dropRight(1).forall(_ < 1.0),
      s"center not inside a cluster: ${c.mkString(",")}"))
    // deterministic AND partitioning-independent: admission decisions
    // hash (seed, round, id), never an RNG stream
    val again = Vectors.kmeansParallelFit(d.repartition(7), "vec_id", "embedding", k = 3)
    assert(centers.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("kmeansParallelFit codebook drives semanticDedup end to end") {
    // two tight clusters; duplicates only within cluster 0
    val d = Seq(
      (1L, Seq(10.0f, 0.1f, 0f, 0f)), (2L, Seq(10.0f, 0.12f, 0f, 0f)),
      (3L, Seq(10.0f, 3.5f, 0f, 0f)),
      (4L, Seq(0f, 0f, 10.0f, 0.1f)), (5L, Seq(0f, 0f, 10.0f, 3.5f)))
      .toDF("vec_id", "embedding")
    val centers = Vectors.kmeansParallelFit(d, "vec_id", "embedding", k = 2)
    val out = Vectors.semanticDedup(d, "vec_id", "embedding",
        Vectors.centroidsDF(spark, centers), "cid", "cv", threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    // 1 and 2 are near-identical (cos > 0.999): exactly one survives;
    // everything else is kept
    assert(out(1L) + out(2L) == 1, s"one of the twins must drop: $out")
    assert(out(3L) == 1 && out(4L) == 1 && out(5L) == 1)
  }

  test("knnGraph emits exactly k ranked rows per node with no self-edges") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter($"vec_id" < 50)
    val g = Vectors.knnGraph(emb, "vec_id", "embedding",
        k = 3, planes = 2, dim = 64, rounds = 1)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect()
    g.foreach { case (q, _, n) => assert(q != n) }
    g.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq)
      assert(rs.length <= 3)
    }
  }

  test("sqStats + scalarQuantize: exact codes, span-0 dims collapse to 0") {
    val df = Seq(
      (1L, Seq(0f, 10f, 5f)),
      (2L, Seq(1f, 10f, 0f))).toDF("vec_id", "embedding")
    val (mins, maxs) = Vectors.sqStats(df, "embedding", 3)
    assert(mins.toSeq == Seq(0.0, 10.0, 0.0))
    assert(maxs.toSeq == Seq(1.0, 10.0, 5.0))
    val q = Vectors.scalarQuantize(df, "vec_id", "embedding", mins, maxs)
      .as[(Long, Seq[Long])].collect().toMap
    assert(q(1L) == Seq(0L, 0L, 255L)) // dim 1 has span 0 -> code 0
    assert(q(2L) == Seq(255L, 0L, 0L))
  }

  test("sqTopK: integer-exact scores, high recall vs float brute") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(emb, qs, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sq = Vectors.sqTopK(emb, qs, "vec_id", "embedding", k = 3, dim = 64)
      .select("query_id", "rnk", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    sq.foreach { case (q, _, n) => assert(q != n) }
    sq.groupBy(_._1).values.foreach(rs =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1, 2, 3)))
    val hits = sq.map(r => (r._1, r._3)).toSet
    val recall = hits.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"SQ8 recall@3 vs brute = $recall")
  }

  test("rotatedSqTopK: rotation preserves norms and recall vs float brute") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 8)
    // orthogonality: the rotation must preserve L2 norms (up to last-ulp
    // accumulation across 6 add/sub rounds and the exact /8 scale)
    import org.apache.spark.sql.functions.{aggregate, lit, sqrt}
    val norms = Vectors.signedHadamard(
        emb.select($"vec_id", $"embedding".cast("array<double>").as("v")),
        "v", "r", dim = 64)
      .select(
        sqrt(aggregate($"v", lit(0.0), (a, x) => a + x * x)).as("n0"),
        sqrt(aggregate($"r", lit(0.0), (a, x) => a + x * x)).as("n1"))
      .as[(Double, Double)].collect()
    norms.foreach { case (n0, n1) => assert(math.abs(n0 - n1) < 1e-9) }
    val brute = Vectors.bruteTopK(emb, qs, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rsq = Vectors.rotatedSqTopK(emb, qs, "vec_id", "embedding", k = 3, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = rsq.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"rotated SQ8 recall@3 vs brute = $recall")
  }

  test("cascadeTopK: exhaustive stage widths equal brute exactly; narrow cascade keeps recall") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 8)
    val n = emb.count().toInt
    val brute = Vectors.bruteTopK(emb, qs, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    // widths covering the corpus → every stage is a pass-through and
    // the exact stage decides everything
    val exhaustive = Vectors.cascadeTopK(emb, qs, "vec_id", "embedding",
        k = 3, dim = 64, mBinary = n, mSq = n)
      .select("query_id", "rnk", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(exhaustive == brute)
    val narrow = Vectors.cascadeTopK(emb, qs, "vec_id", "embedding",
        k = 3, dim = 64, mBinary = 24, mSq = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brutePairs = brute.map(r => (r._1, r._3))
    val recall = brutePairs.count(narrow.contains).toDouble / brutePairs.size
    assert(recall >= 0.5, s"cascade recall@3 (24→8→3) vs brute = $recall")
  }

  test("pcaRotationFit: orthonormal, variance-concentrating, partitioning-invariant") {
    val dim = 16
    val (df, _) = anisotropicFixture(dim, n = 240)
    val (rot, ev) = Vectors.pcaRotationFit(df, "embedding", dim)
    // orthonormal axes: R·Rᵀ = I
    for (a <- 0 until dim; b <- 0 until dim) {
      val dot = (0 until dim).map(i => rot(a)(i) * rot(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8, s"($a,$b)=$dot")
    }
    // rank-2 structure: two eigenvalues carry nearly all the variance
    assert(ev(0) > 0 && ev(1) > 0)
    assert((ev(0) + ev(1)) / ev.sum > 0.95, s"top-2 share ${(ev(0) + ev(1)) / ev.sum}")
    // fixed-point moment sums make the fit partitioning-invariant
    val (rot2, ev2) = Vectors.pcaRotationFit(df.repartition(7), "embedding", dim)
    assert(rot.flatten.toSeq == rot2.flatten.toSeq)
    assert(ev.toSeq == ev2.toSeq)
    // the explained-variance selector finds the rank-2 knee
    assert(Vectors.pcaRank(ev, 0.95) == 2)
    assert(Vectors.pcaRank(ev, 1.0) <= dim)
  }

  test("jacobiFirstSweep: the q143 gate IS sweep 1 of the full eigensolve") {
    val dim = 8
    val (df, _) = anisotropicFixture(dim, n = 240)
    // rebuild the covariance exactly as pcaRotationFit does and run one
    // sweep through the SHARED loop: the gate's raw cells must be its
    // 6-digit quantization — so the driver-green row certifies the
    // rotation sequence the full fit executes
    val (n, sums, prods) = Vectors.pcaMomentsExact(df, "embedding", dim)
    val sc = (1L << 20).toDouble
    val mean = sums.map(_.toDouble / n / sc)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      prods(i * dim + j).toDouble / n / (sc * sc) - mean(i) * mean(j)
    }
    val (a1, v1) = Vectors.jacobiSweeps(cov, dim, sweeps = 1)
    def q6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val gate = Vectors.jacobiFirstSweep(df, "embedding", dim)
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        (r.getAs[Double]("a"), r.getAs[Double]("v"))).toMap
    assert(gate.size == dim * dim)
    for (i <- 0 until dim; j <- 0 until dim) {
      assert(gate((i, j))._1 == q6(a1(i)(j)), s"a($i,$j)")
      assert(gate((i, j))._2 == q6(v1(i)(j)), s"v($i,$j)")
    }
    // one sweep already strictly shrinks the off-diagonal mass (the
    // convergence direction the remaining 15 sweeps finish)
    def off(m: Array[Array[Double]]) =
      (for { i <- 0 until dim; j <- 0 until dim if i != j } yield m(i)(j) * m(i)(j)).sum
    assert(off(a1) < off(cov) * 0.5, s"off-diag ${off(a1)} vs ${off(cov)}")
    // V after one sweep is orthonormal (a product of rotations)
    for (a <- 0 until dim; b <- 0 until dim) {
      val dot = (0 until dim).map(k => v1(k)(a) * v1(k)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-10, s"VᵀV($a,$b)=$dot")
    }
  }

  test("jacobiSweepTable: the q159 gate IS sweeps 1-2; convergence is real") {
    val dim = 8
    val (df, _) = anisotropicFixture(dim, n = 240)
    val (n, sums, prods) = Vectors.pcaMomentsExact(df, "embedding", dim)
    val sc = (1L << 20).toDouble
    val mean = sums.map(_.toDouble / n / sc)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      prods(i * dim + j).toDouble / n / (sc * sc) - mean(i) * mean(j)
    }
    val (a1, _) = Vectors.jacobiSweeps(cov, dim, sweeps = 1)
    val (a2, v2) = Vectors.jacobiSweeps(cov, dim, sweeps = 2)
    // the gate's e6 integers are exactly floor(x*1e6 + 0.5) of the
    // shared loop's two-sweep output (the portable quantization new
    // gates use instead of rounded doubles)
    def e6(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong
    val gate = Vectors.jacobiSweepTable(df, "embedding", dim, sweeps = 2)
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        (r.getAs[Long]("a_e6"), r.getAs[Long]("v_e6"))).toMap
    assert(gate.size == dim * dim)
    for (i <- 0 until dim; j <- 0 until dim) {
      assert(gate((i, j))._1 == e6(a2(i)(j)), s"a_e6($i,$j)")
      assert(gate((i, j))._2 == e6(v2(i)(j)), s"v_e6($i,$j)")
    }
    // convergence: each sweep strictly shrinks the off-diagonal mass,
    // and two sweeps reach near-diagonal (the convergent eigensolve,
    // not just its opening move)
    def off(m: Array[Array[Double]]) =
      (for { i <- 0 until dim; j <- 0 until dim if i != j } yield m(i)(j) * m(i)(j)).sum
    assert(off(a2) < off(a1) * 0.5, s"sweep 2 must keep converging: ${off(a2)} vs ${off(a1)}")
    assert(off(a2) < off(cov) * 1e-3, s"two sweeps near-diagonal: ${off(a2)} vs ${off(cov)}")
    // V after two sweeps stays orthonormal
    for (a <- 0 until dim; b <- 0 until dim) {
      val dot = (0 until dim).map(k => v2(k)(a) * v2(k)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-10, s"VᵀV($a,$b)=$dot")
    }
  }

  test("pcaVarianceRank: gate frame carries EXACTLY the fit's moment integers") {
    val dim = 16
    val (df, _) = anisotropicFixture(dim, n = 240)
    // the q106 gate's per-dimension (n, s, p) must equal the internal
    // BigInt accumulation pcaRotationFit's eigensolve consumes — the
    // link that makes the driver-green row cover the learned path
    val (n, sums, prods) = Vectors.pcaMomentsExact(df, "embedding", dim)
    val gate = Vectors.pcaVarianceRank(df, "embedding", dim)
      .collect().map(r => r.getAs[Int]("d") ->
        (r.getAs[Long]("n_vecs"), r.getAs[String]("s"), r.getAs[String]("p"),
         r.getAs[Double]("variance"), r.getAs[Int]("rnk"),
         r.getAs[Double]("cum_frac"), r.getAs[Int]("sel"))).toMap
    assert(gate.size == dim)
    for (d <- 0 until dim) {
      val (nv, s, p, _, _, _, _) = gate(d)
      assert(nv == n, s"d=$d n")
      assert(s == sums(d).toString, s"d=$d s")
      assert(p == prods(d * dim + d).toString, s"d=$d p (diagonal)")
    }
    // the selector agrees with pcaRank over the raw-axis variances
    val vars = (0 until dim).map(d => gate(d)._4).toArray
    val selCount = gate.values.count(_._7 == 1)
    assert(selCount == Vectors.pcaRank(vars.sorted.reverse, 0.95),
      s"sel count $selCount vs pcaRank")
    // cum_frac ends at exactly 1.0 and is nondecreasing in rank order
    val byRank = gate.values.toSeq.sortBy(_._5).map(_._6)
    assert(byRank.last == 1.0)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
  }

  test("pcaSqTopK: learned truncation keeps recall where raw truncation fails") {
    val dim = 16
    val (df, _) = anisotropicFixture(dim, n = 240)
    val qs = df.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(df, qs, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(pairs: Set[(Long, Long)]) =
      brute.count(pairs.contains).toDouble / brute.size
    // top-4 learned axes: ≥ the spectrum's knee, recall ≈ full codes
    val pca = Vectors.pcaSqTopK(df, qs, "vec_id", "embedding",
        k = 3, dim = dim, rDims = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // raw truncation to the same 4 dims throws away factor signal
    val rawTrunc = Vectors.sqTopK(
        df.select($"vec_id", org.apache.spark.sql.functions.slice($"embedding", 1, 4).as("embedding")),
        qs.select($"vec_id", org.apache.spark.sql.functions.slice($"embedding", 1, 4).as("embedding")),
        "vec_id", "embedding", k = 3, dim = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rPca = recallOf(pca)
    val rRaw = recallOf(rawTrunc)
    assert(rPca >= 0.85, s"PCA-truncated recall@3 = $rPca")
    assert(rPca > rRaw + 0.2, s"learned $rPca vs raw $rRaw truncation")
  }

  test("opqTopK: eigen-balanced rotation beats raw-coordinate PQ on structured data") {
    import org.apache.spark.sql.functions.col
    val dim = 16
    val (df0, _) = anisotropicFixture(dim, n = 240)
    val df = df0.select($"vec_id", col("embedding").cast("array<float>").as("embedding"))
    val qs = df.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(df, qs, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(d: org.apache.spark.sql.DataFrame) = {
      val s = d.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      brute.count(s.contains).toDouble / brute.size
    }
    val pq = recallOf(Vectors.pqTopK(df, qs, "vec_id", "embedding", 3, m = 4, ksub = 8))
    val opq = recallOf(Vectors.opqTopK(df, qs, "vec_id", "embedding", 3, dim, m = 4, ksub = 8))
    assert(opq >= 0.8, s"OPQ recall@3 = $opq")
    assert(opq > pq + 0.3, s"opq=$opq vs pq=$pq")
    // allocation sanity: a permutation with balanced subspace sizes
    val (_, ev) = Vectors.pcaRotationFit(df.select(col("embedding").as("v")), "v", dim)
    val order = Vectors.opqAllocation(ev, 4)
    assert(order.sorted.toSeq == (0 until dim))
    // the two MEANINGFUL axes (rank-2 data) land in different
    // subspaces — the balancing point: one subspace must not hog all
    // the signal variance
    val subspaceOfTop = (0 until 2).map(i => order.indexOf(i) / 4)
    assert(subspaceOfTop.distinct.size == 2, s"top-2 axes in $subspaceOfTop")
  }

  test("opqAssignByProduct ≡ opqAllocation's log-form greedy on positive spectra") {
    val rnd = new scala.util.Random(11)
    (1 to 50).foreach { _ =>
      val dim = Seq(4, 8, 12, 16)(rnd.nextInt(4))
      val m = Seq(2, 4)(rnd.nextInt(2)).min(dim)
      val ev = Array.fill(dim)(math.exp(rnd.nextGaussian() * 3))
      val logOrder = Vectors.opqAllocation(ev, m)
      val sub = dim / m
      // permutation → assignment: position k of the flat order sits in
      // subspace k/sub
      val logAssign = new Array[Int](dim)
      logOrder.zipWithIndex.foreach { case (i, k) => logAssign(i) = k / sub }
      val prodAssign = Vectors.opqAssignByProduct(ev, m)
      assert(prodAssign.toSeq == logAssign.toSeq,
        s"dim=$dim m=$m ev=${ev.toSeq}")
    }
  }

  test("opqAllocationRank: balanced assignment over the exact spectrum, rank-ordered") {
    import org.apache.spark.sql.functions.col
    val dim = 8
    val (df0, _) = anisotropicFixture(dim, n = 240)
    val df = df0.select(col("embedding"))
    val out = Vectors.opqAllocationRank(df, "embedding", dim, 2)
      .as[(Int, Int, String, Int)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (1 to dim))
    assert(out.map(_._2).sorted.toSeq == (0 until dim), "a permutation of dims")
    assert(out.groupBy(_._4).values.map(_.length).toSeq == Seq(4, 4), "balanced")
    // ivars descend in rank order (exact integers as BigInt)
    val ivars = out.map(r => BigInt(r._3))
    assert(ivars.zip(ivars.tail).forall { case (a, b) => a >= b })
    // rank 1 (the biggest weight) seeds subspace 0; rank 2 must go to
    // the other one
    assert(out(0)._4 == 0 && out(1)._4 == 1)
  }

  /** Deterministic rank-2 embeddings: factors along two fixed dense
    * unit directions plus tiny isotropic noise — variance concentrates
    * in a 2-dim subspace no RAW coordinate aligns with.
    */
  private def anisotropicFixture(dim: Int, n: Int) = {
    val rnd = new scala.util.Random(3)
    def unit(v: Array[Double]) = {
      val nrm = math.sqrt(v.map(x => x * x).sum); v.map(_ / nrm)
    }
    val u1 = unit(Array.fill(dim)(rnd.nextGaussian()))
    val raw2 = Array.fill(dim)(rnd.nextGaussian())
    val proj = raw2.zip(u1).map { case (x, u) => x - u * raw2.zip(u1).map(p => p._1 * p._2).sum }
    val u2 = unit(proj)
    val data = (0 until n).map { i =>
      val f1 = math.sin(i * 0.37) * 2.0
      val f2 = math.cos(i * 0.73) * 1.2
      val v = Array.tabulate(dim)(d =>
        f1 * u1(d) + f2 * u2(d) + 0.01 * math.sin(i * 1.3 + d))
      (i.toLong, v.toSeq)
    }
    (data.toDF("vec_id", "embedding"), (u1, u2))
  }

  test("cascadeTopKOn: prebuilt quantized artifacts equal the inline cascade") {
    import org.apache.spark.sql.functions.{col, lit, transform, when => cWhen}
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 8)
    // build the stored-index artifacts the way the build job would
    val cu = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("n", Vectors.normCol(col("v")))
      .select(col("id"), transform(col("v"), x =>
        cWhen(col("n") === 0.0, lit(0.0)).otherwise(x / col("n"))).as("uv"))
    val (mins, maxs) = Vectors.sqStats(cu, "uv", 64)
    val codes = Vectors.scalarQuantize(cu, "id", "uv", mins, maxs)
    val bcodes = Vectors.binaryQuantize(emb, "vec_id", "embedding", 64)
    val prebuilt = Vectors.cascadeTopKOn(bcodes, codes, emb, qs,
        "vec_id", "embedding", k = 3, dim = 64, mBinary = 24, mSq = 8,
        mins, maxs)
      .as[(Long, Int, Long, Double)].collect().toSet
    val inline = Vectors.cascadeTopK(emb, qs, "vec_id", "embedding",
        k = 3, dim = 64, mBinary = 24, mSq = 8)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(prebuilt == inline)
    assert(prebuilt.nonEmpty)
  }

  test("ivfSqTopK: full probe equals sqTopK exactly; pruned probe keeps recall") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 8)
    val sq = Vectors.sqTopK(emb, qs, "vec_id", "embedding", k = 3, dim = 64)
      .as[(Long, Int, Long, Long)].collect().toSet
    // nProbe = nCentroids → every (query, neighbor) pair scored once
    // with the identical global-stats codes → identical rows
    val full = Vectors.ivfSqTopK(emb, qs, "vec_id", "embedding", k = 3, dim = 64,
        nCentroids = 8, nProbe = 8)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(full == sq)
    assert(full.nonEmpty)
    val pruned = Vectors.ivfSqTopK(emb, qs, "vec_id", "embedding", k = 3, dim = 64,
        nCentroids = 8, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sqPairs = sq.map(r => (r._1, r._3))
    val recall = sqPairs.count(pruned.contains).toDouble / sqPairs.size
    assert(recall >= 0.4, s"IVF-SQ8 recall@3 at nProbe=3/8 vs full codes = $recall")
  }

  test("matryoshkaTopK: rerank is exact — full-corpus shortlist equals brute") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 8)
    val n = emb.count().toInt
    val mat = Vectors.matryoshkaTopK(emb, qs, "vec_id", "embedding",
        k = 3, dimPrefix = 16, shortlist = n)
      .select("query_id", "rnk", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    val brute = Vectors.bruteTopK(emb, qs, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(mat == brute)
    assert(mat.nonEmpty)
  }

  test("matryoshkaTopK: truncated shortlist keeps useful recall") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(emb, qs, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // synthetic embeddings carry no MRL prefix structure — this is the
    // adversarial floor for prefix truncation, so the pin is modest;
    // everything is deterministic, so the depth sweep cannot flake
    def recallAt(shortlist: Int): Double = {
      val mat = Vectors.matryoshkaTopK(emb, qs, "vec_id", "embedding",
          k = 3, dimPrefix = 16, shortlist = shortlist)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      brute.count(mat.contains).toDouble / brute.size
    }
    val r12 = recallAt(12)
    val r24 = recallAt(24)
    assert(r12 >= 0.2, s"matryoshka recall@3 (prefix 16/64, shortlist 12) = $r12")
    assert(r24 >= r12, s"deeper shortlist must not lose recall: $r24 < $r12")
  }

  test("binaryTopK: packed popcount equals per-dimension sign disagreement") {
    import org.apache.spark.sql.functions.{aggregate, lit, zip_with, when => cWhen}
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(40)
    val codes = Vectors.binaryQuantize(emb, "vec_id", "embedding", 64)
    // two 32-bit words per 64-dim vector, all in [0, 2^32)
    codes.as[(Long, Seq[Long])].collect().foreach { case (_, c) =>
      assert(c.length == 2)
      c.foreach(w => assert(w >= 0L && w < (1L << 32)))
    }
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val out = Vectors.binaryTopK(emb, emb.filter($"vec_id" < 4),
        "vec_id", "embedding", k = 5, dim = 64)
      .as[(Long, Int, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, _, n, hamming) =>
      val expected = vecs(q).zip(vecs(n)).count { case (a, b) => (a > 0) != (b > 0) }
      assert(hamming == expected, s"pair ($q,$n)")
    }
  }

  test("binaryTopK: useful shortlist recall vs float brute") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(emb, qs, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // the 1-bit code is the SHORTLIST stage: recall measured at a
    // shortlist 5× the final k, the way it is deployed
    val short = Vectors.binaryTopK(emb, qs, "vec_id", "embedding", k = 15, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(short.contains).toDouble / brute.size
    assert(recall >= 0.5, s"binary shortlist recall@15-over-3 = $recall")
  }

  test("semanticContamination: verbatim bench members flagged at sim 1.0, flags match threshold") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val bench = emb.filter($"vec_id" % 7 === 1)
    val out = Vectors.semanticContamination(emb, "vec_id", "embedding",
        bench, "vec_id", "embedding", threshold = 0.4)
      .select($"id", $"nearest_bench", $"max_sim", $"contaminated")
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length === emb.count())
    val benchIds = bench.select($"vec_id").as[Long].collect().toSet
    out.foreach { case (id, nb, sim, flag) =>
      assert(flag === (if (sim >= 0.4) 1 else 0))
      if (benchIds(id)) {
        assert(nb === id && sim === 1.0 && flag === 1)
      }
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import graft.multimodal.Multimodal
  import graft.multimodal.Multimodal.MediaRow

  private lazy val media = {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(20).collect()
    docs.zipWithIndex.map { case (r, i) =>
      MediaRow(r.getLong(0), if (i % 2 == 0) "image" else "video",
        r.getString(1).getBytes("UTF-8"), r.getString(3))
    }.toSeq
  }

  test("decodeFeatures: deterministic stub decode with real plumbing") {
    val ds = spark.createDataset(media)
    val feats = Multimodal.decodeFeatures(ds).collect()
    assert(feats.length == media.length)
    val f0 = feats.find(_.media_id == media.head.media_id).get
    assert(f0.n_bytes == media.head.bytes.length)
    assert(f0.sha256.length == 64)
    assert(f0.feature.length == 8)
    assert(f0.duration_ms == 0L) // image
    // determinism: same bytes → same features
    val again = Multimodal.decodeFeatures(ds).collect()
      .find(_.media_id == media.head.media_id).get
    assert(again.sha256 == f0.sha256 && again.width == f0.width)
  }

  private def encodeImage(format: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, x * 31 + y)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("image rows decode REAL header dimensions (png + jpeg), not stub values") {
    val png = MediaRow(1L, "image", encodeImage("png", 7, 5), "t")
    val jpg = MediaRow(2L, "image", encodeImage("jpg", 3, 2), "t")
    val onePx = MediaRow(3L, "image", encodeImage("png", 1, 1), "t")
    val garbage = MediaRow(4L, "image", Array[Byte](1, 2, 3, 4), "t")
    val video = MediaRow(5L, "video", encodeImage("png", 9, 9), "t")
    val feats = Multimodal.decodeFeatures(
        spark.createDataset(Seq(png, jpg, onePx, garbage, video)))
      .collect().map(f => f.media_id -> f).toMap
    assert((feats(1L).width, feats(1L).height) == ((7, 5)))
    assert((feats(2L).width, feats(2L).height) == ((3, 2)))
    assert((feats(3L).width, feats(3L).height) == ((1, 1)))
    // undecodable image payloads fall back to the deterministic stub
    val stubG = Multimodal.StubDecoder.decode(garbage)
    assert((feats(4L).width, feats(4L).height) == ((stubG.width, stubG.height)))
    // non-image kinds never take the image path, even with image bytes
    val stubV = Multimodal.StubDecoder.decode(video)
    assert((feats(5L).width, feats(5L).height) == ((stubV.width, stubV.height)))
    // payload-derived fields are unchanged by the real decode
    assert(feats(1L).n_bytes == png.bytes.length && feats(1L).sha256.length == 64)
  }

  /** Left half black, right half white — luma grid ground truth. */
  private def halfWhitePng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  /** Mono 16-bit PCM WAV: first half silence, second half a ±amp
    * square wave (RMS exactly amp).
    */
  private def pcmWav(rate: Int, ms: Int, amp: Double): Array[Byte] = {
    val n = rate * ms / 1000
    val data = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v: Short =
        if (i < n / 2) 0
        else if (i % 2 == 0) (amp * 32767).toShort else (-amp * 32767).toShort
      data(i * 2) = (v & 0xff).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + data.length); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(rate); bb.putInt(rate * 2)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(data.length); bb.put(data)
    bb.array()
  }

  test("REAL pixel decode: luma grid features from actual image content") {
    val row = MediaRow(1L, "image", halfWhitePng(64, 32), "t")
    val f = Multimodal.ImageHeaderDecoder.decode(row)
    assert((f.width, f.height) == ((64, 32)))
    // 4×2 grid: left two columns black (0), right two white (1)
    assert(f.feature.length == 8)
    val expect = Array(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f)
    f.feature.zip(expect).zipWithIndex.foreach { case ((got, e), i) =>
      assert(math.abs(got - e) < 0.02f, s"cell $i: $got vs $e")
    }
    // a corrupt payload keeps the stub feature (never throws)
    val bad = MediaRow(2L, "image", Array[Byte](0x50, 0x4b, 3, 4), "t")
    val fb = Multimodal.ImageHeaderDecoder.decode(bad)
    assert(fb.feature.toSeq == Multimodal.StubDecoder.decode(bad).feature.toSeq)
  }

  test("REAL resize: integer-area thumbnail, content-derived sha, grid preserved") {
    val row = MediaRow(1L, "image", halfWhitePng(64, 32), "t")
    val out = Multimodal.resizeImages(
      spark.createDataset(Seq(row)), 16, 16).collect().head
    assert((out.width, out.height) == ((16, 8)), "aspect-preserving fit")
    assert(out.n_bytes == 16L * 8 * 3, "actual RGB payload size")
    // the thumbnail's OWN luma grid matches the source's (area
    // averaging at the same relative boundaries)
    val expect = Array(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f)
    out.feature.zip(expect).foreach { case (got, e) =>
      assert(math.abs(got - e) < 0.02f)
    }
    // sha comes from resized CONTENT: two different-size sources with
    // the same content scale to the same thumbnail bytes
    val big = MediaRow(2L, "image", halfWhitePng(128, 64), "t")
    val out2 = Multimodal.resizeImages(
      spark.createDataset(Seq(big)), 16, 16).collect().head
    assert(out2.sha256 == out.sha256,
      "same content at 2x resolution must produce the identical thumbnail")
    // undecodable rows keep resizeStub's deterministic behavior
    val bad = MediaRow(3L, "image", Array[Byte](9, 9, 9), "t")
    val stubOut = Multimodal.resizeStub(
      spark.createDataset(Seq(bad)), 16, 16).collect().head
    val realOut = Multimodal.resizeImages(
      spark.createDataset(Seq(bad)), 16, 16).collect().head
    assert((realOut.width, realOut.height, realOut.n_bytes, realOut.sha256) ==
      ((stubOut.width, stubOut.height, stubOut.n_bytes, stubOut.sha256)))
    assert(realOut.feature.toSeq == stubOut.feature.toSeq)
  }

  test("REAL WAV PCM decode: RMS grid, duration, per-window loudness") {
    val row = MediaRow(1L, "audio", pcmWav(8000, 1000, 0.5), "t")
    val pcm = Multimodal.WavPcm.decode(row.bytes).get
    assert(pcm.sampleRate == 8000 && pcm.channels == 1 && pcm.bitsPerSample == 16)
    assert(pcm.durationMs == 1000L)
    val grid = Multimodal.WavPcm.rmsGrid(pcm, 8)
    (0 until 4).foreach(i => assert(grid(i) < 0.01f, s"bin $i silent"))
    (4 until 8).foreach(i =>
      assert(math.abs(grid(i) - 0.5f) < 0.01f, s"bin $i at the square-wave RMS"))
    // decode() carries the grid as the audio feature + the REAL duration
    val f = Multimodal.ImageHeaderDecoder.decode(row)
    assert(f.duration_ms == 1000L)
    assert(f.feature.toSeq == Multimodal.WavPcm.rmsGrid(pcm, 8).toSeq)
    // per-window loudness rows
    val loud = Multimodal.segmentLoudness(
      spark.createDataset(Seq(row)), 250L).collect().sortBy(_.seg_index)
    assert(loud.length == 4)
    assert(loud(0).rms < 0.01f && loud(1).rms < 0.01f)
    assert(math.abs(loud(2).rms - 0.5f) < 0.01f && math.abs(loud(3).rms - 0.5f) < 0.01f)
    // non-PCM audio emits nothing here (the honest boundary)
    val mp3ish = MediaRow(2L, "audio", Array[Byte](0x49, 0x44, 0x33, 0), "t")
    assert(Multimodal.segmentLoudness(
      spark.createDataset(Seq(mp3ish)), 250L).collect().isEmpty)
  }

  test("embedMedia: content embeddings cluster near-duplicate images") {
    def grayPng(w: Int, h: Int, level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, rgb)))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      out.toByteArray
    }
    // same content at two resolutions = near-dup; a different level is not
    val rows = Seq(
      MediaRow(1L, "image", grayPng(40, 40, 200), "t"),
      MediaRow(2L, "image", grayPng(80, 80, 200), "t"),
      MediaRow(3L, "image", grayPng(40, 40, 20), "t"),
      MediaRow(4L, "image", Array[Byte](1, 2), "t")) // stub fallback
    val emb = Multimodal.embedMedia(spark.createDataset(rows), 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / na / nb
    }
    assert(cos(emb(1L), emb(2L)) > 0.999,
      "same content at different resolutions must embed together")
    // magnitudes differ 10x even though cosine of flat images ties
    assert(math.abs(emb(1L).sum / emb(3L).sum - 10.0) < 0.5)
    // stub fallback matches embedStub exactly
    val stub = Multimodal.embedStub(
        spark.createDataset(Seq(rows(3))), 16)
      .collect().head.getSeq[Float](2).toArray
    assert(emb(4L).toSeq == stub.toSeq)
  }

  test("exactDupMedia flags duplicated payloads") {
    val withDup = media :+ media.head.copy(media_id = 9999L)
    val dups = Multimodal.exactDupMedia(
      spark.createDataset(withDup).toDF(), "media_id", "bytes").collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("keep_id") == media.head.media_id)
    assert(dups.head.getAs[Long]("dup_count") == 2)
  }

  test("repartitionBySize balances byte budgets") {
    val df = Multimodal.repartitionBySize(
      spark.createDataset(media).toDF(), "bytes", 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == media.length)
  }

  test("sampleFrames: stride-spaced, duration-bounded, video-only, deterministic") {
    val ds = spark.createDataset(media)
    val frames = Multimodal.sampleFrames(ds, everyMs = 500L).collect()
    val videos = media.filter(_.kind == "video")
    assert(frames.map(_.media_id).toSet == videos.map(_.media_id).toSet)
    val durations = Multimodal.decodeFeatures(ds).collect()
      .map(f => f.media_id -> f.duration_ms).toMap
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      val sorted = fs.sortBy(_.frame_index)
      // frames at 0, 500, 1000, ... up to duration — count matches stride
      assert(sorted.map(_.ts_ms).toSeq ==
        (0L to durations(id) by 500L).toSeq, s"media $id")
      assert(sorted.map(_.frame_index).toSeq == sorted.indices.toSeq)
      assert(fs.map(_.frame_sha256).distinct.length == fs.length) // per-frame ids differ
    }
    // determinism
    val again = Multimodal.sampleFrames(ds, everyMs = 500L).collect()
    assert(again.map(f => (f.media_id, f.frame_index, f.frame_sha256)).toSet ==
      frames.map(f => (f.media_id, f.frame_index, f.frame_sha256)).toSet)
  }

  test("resizeStub: aspect-preserving fit, never upscales, deterministic payload id") {
    val ds = spark.createDataset(media)
    val orig = Multimodal.decodeFeatures(ds).collect().map(f => f.media_id -> f).toMap
    val resized = Multimodal.resizeStub(ds, maxW = 128, maxH = 128).collect()
    assert(resized.length == media.length)
    resized.foreach { r =>
      val o = orig(r.media_id)
      assert(r.width <= 128 && r.height <= 128)
      assert(r.width <= o.width && r.height <= o.height) // never upscale
      // aspect preserved within integer truncation
      val scale = math.min(1.0, math.min(128.0 / o.width, 128.0 / o.height))
      assert(r.width == math.max(1, (o.width * scale).toInt))
      assert(r.height == math.max(1, (o.height * scale).toInt))
      assert(r.n_bytes == r.width.toLong * r.height * 3) // output byte budget
      assert(r.sha256 != o.sha256) // payload rewritten
    }
    val again = Multimodal.resizeStub(ds, maxW = 128, maxH = 128).collect()
    assert(again.map(r => (r.media_id, r.sha256)).toSet ==
      resized.map(r => (r.media_id, r.sha256)).toSet)
  }

  test("segmentAudio: window coverage with short tail, audio-only") {
    val withAudio = media.zipWithIndex.map { case (m, i) =>
      if (i % 3 == 0) m.copy(kind = "audio") else m
    }
    val ds = spark.createDataset(withAudio)
    val segs = Multimodal.segmentAudio(ds, windowMs = 700L).collect()
    val audio = withAudio.filter(_.kind == "audio")
    assert(segs.map(_.media_id).toSet == audio.map(_.media_id).toSet)
    val durations = Multimodal.decodeFeatures(ds).collect()
      .map(f => f.media_id -> f.duration_ms).toMap
    segs.groupBy(_.media_id).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_.seg_index)
      // contiguous coverage: starts at 0, each window abuts the next,
      // last window ends exactly at the duration
      assert(sorted.head.start_ms == 0L)
      sorted.sliding(2).foreach {
        case Array(p, n) => assert(n.start_ms == p.end_ms)
        case _ =>
      }
      assert(sorted.last.end_ms == durations(id))
      assert(sorted.forall(s => s.end_ms - s.start_ms <= 700L))
    }
  }

  test("stub features compose with the embedding near-dup suite") {
    // duplicate payloads produce identical features -> the hyperplane
    // bucket join finds exactly the duplicated pair (hash-stub features
    // carry no semantic locality, so ONLY exact dups should pair)
    val withDup = media :+ media.head.copy(media_id = 9999L)
    val feats = Multimodal.decodeFeatures(spark.createDataset(withDup))
      .select($"media_id", $"feature")
    val pairs = graft.textops.NearDup.embeddingPairs(
        feats.toDF(), "media_id", "feature", planes = 8, threshold = 0.999, dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((media.head.media_id, 9999L)))
  }

  test("embedStub widths feed the ANN suite; dups are rank-1 with cosine 1") {
    val withDup = media :+ media.head.copy(media_id = 9999L)
    val emb = Multimodal.embedStub(spark.createDataset(withDup), dim = 64)
    val row = emb.filter($"media_id" === media.head.media_id)
      .select($"embedding").as[Array[Float]].head()
    assert(row.length == 64 && row.forall(v => v >= -1f && v <= 1f))
    // counter-mode expansion: the first 32 floats (one digest) must not
    // simply repeat in the second digest's range
    assert(row.slice(0, 32).toSeq != row.slice(32, 64).toSeq)
    // media -> embedding -> NN-Descent graph: the duplicated payload
    // must surface as its twin's rank-1 neighbor at cosine 1.0
    val g = graft.vectors.Vectors.knnGraph(emb, "media_id", "embedding",
        k = 2, planes = 2, dim = 64, rounds = 1, tables = 2)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect()
    val top = g.filter(r => r._1 == 9999L && r._2 == 1).head
    assert(top._3 == media.head.media_id && top._4 == 1.0, s"got $top")
  }

  test("decodeBatched call count is exactly the sum of per-partition ceilings") {
    val ds = spark.createDataset(media).repartition(3)
    val perPart = ds.rdd.mapPartitionsWithIndex((i, it) => Iterator(i -> it.size))
      .collect().toMap
    val calls = spark.sparkContext.collectionAccumulator[(Int, Int)]("calls")
    Multimodal.decodeBatched(ds, batchSize = 4) { batch =>
      calls.add(org.apache.spark.TaskContext.getPartitionId() -> batch.length)
      batch.map(Multimodal.StubDecoder.decode)
    }.count()
    import scala.jdk.CollectionConverters._
    val byPart = calls.value.asScala.toSeq.groupBy(_._1)
    perPart.filter(_._2 > 0).foreach { case (p, n) =>
      val sizes = byPart(p).map(_._2)
      assert(sizes.length == (n + 3) / 4, s"partition $p: $sizes for $n rows")
      // every batch full except possibly the last
      assert(sizes.count(_ < 4) <= 1 && sizes.sum == n)
    }
  }

  test("decodeBatched: every row exactly once, batches never exceed the cap") {
    val ds = spark.createDataset(media).repartition(2)
    val seen = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val out = Multimodal.decodeBatched(ds, batchSize = 3) { batch =>
      seen.add(batch.length)
      batch.map(Multimodal.StubDecoder.decode)
    }.collect()
    assert(out.length == media.length)
    assert(out.map(_.media_id).toSet == media.map(_.media_id).toSet)
    import scala.jdk.CollectionConverters._
    val sizes = seen.value.asScala.toSeq
    assert(sizes.nonEmpty && sizes.forall(s => s > 0 && s <= 3))
    assert(sizes.sum == media.length)
  }
}
