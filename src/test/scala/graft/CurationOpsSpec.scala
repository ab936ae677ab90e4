package graft

import org.apache.spark.sql.functions._

import graft.textops.CurationOps

/** Unit coverage for the corpus-curation operators (q29-q32): exact
  * hand-computed values on crafted micro-corpora, plus determinism of
  * the stratified sample.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("repetitionStats computes exact top-word and dup-bigram fractions") {
    val out = CurationOps.repetitionStats(docs(1L -> "a a a b"), "doc_id", "text")
      .collect().head
    assert(out.getAs[Int]("n_words") === 4)
    assert(out.getAs[Double]("top_word_frac") === 0.75)
    // bigrams: "a a", "a a", "a b" -> 3 total, 2 distinct -> 1/3 dup
    assert(out.getAs[Double]("dup_bigram_frac") === 1.0 / 3)
    assert(out.getAs[Int]("repetitive") === 1) // 0.75 > 0.2
  }

  test("qualityGate: each Gopher rule independently rejects") {
    // a healthy base document: 60 distinct-ish words, normal lengths,
    // stopwords present, no bullets/ellipses/symbols
    val healthy = (1 to 50).map(i => s"word$i").mkString(" ") +
      " the and of to in is a one two three"
    // docs 4 and 5 are constructed so ONLY the bullet / ellipsis rule
    // rejects them: every other signal is inside its threshold, which
    // the per-signal asserts below pin down (so deleting either line
    // conjunct from the keep expression fails this test)
    val bulletDoc = (1 to 60)
      .map(i => s"- the and word${i}a word${i}b word${i}c").mkString("\n")
    val ellipsisDoc = (1 to 10)
      .map(i => s"the and word${i}a word${i}b word${i}c" + (if (i % 2 == 0) "…" else ""))
      .mkString("\n")
    val rows = Seq(
      1L -> healthy,                                           // keep
      2L -> "the and of short",                                // too few words
      3L -> (healthy + " #a #b #c #d" * 3),                    // symbol words 12/72 > 10%
      4L -> bulletDoc,                                         // bullet lines only
      5L -> ellipsisDoc,                                       // ellipsis lines only
      6L -> (1 to 60).map(_.toString).mkString(" "),           // no alpha, no stopwords
      7L -> ("the " * 60))                                     // top word 100%
    val out = CurationOps.qualityGate(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Int]("keep") === 1, out(0).toString)
    assert(out.drop(1).forall(_.getAs[Int]("keep") == 0),
      out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).mkString(","))
    // the bullet/ellipsis docs violate ONLY their own rule
    def passesAllBut(r: org.apache.spark.sql.Row, except: String): Unit = {
      val checks = Map[String, Boolean](
        "n_words" -> { val n = r.getAs[Int]("n_words"); n >= 50 && n <= 100000 },
        "avg_word_len" -> { val a = r.getAs[Double]("avg_word_len"); a >= 3.0 && a <= 10.0 },
        "symbol_word_frac" -> (r.getAs[Double]("symbol_word_frac") <= 0.1),
        "bullet_line_frac" -> (r.getAs[Double]("bullet_line_frac") < 0.9),
        "ellipsis_line_frac" -> (r.getAs[Double]("ellipsis_line_frac") < 0.3),
        "alpha_word_frac" -> (r.getAs[Double]("alpha_word_frac") >= 0.8),
        "stop_hits" -> (r.getAs[Int]("stop_hits") >= 2),
        "top_word_frac" -> (r.getAs[Double]("top_word_frac") <= 0.2),
        "dup_bigram_frac" -> (r.getAs[Double]("dup_bigram_frac") <= 0.6))
      checks.foreach { case (name, ok) =>
        if (name == except) assert(!ok, s"$name should be the violated rule: $r")
        else assert(ok, s"$name unexpectedly violated: $r")
      }
    }
    passesAllBut(out(3), "bullet_line_frac")
    passesAllBut(out(4), "ellipsis_line_frac")
    // signal spot checks
    assert(out(0).getAs[Int]("stop_hits") >= 2)
    assert(out(1).getAs[Int]("n_words") === 4)
    assert(out(6).getAs[Double]("top_word_frac") === 1.0)
    assert(out(5).getAs[Double]("alpha_word_frac") === 0.0)
  }

  test("qualityGate: mean word length and line fractions are exact ratios") {
    // "aa bbbb" -> (2+4)/2 = 3.0; lines: one bullet of two lines = 0.5
    val out = CurationOps.qualityGate(
      docs(1L -> "aa bbbb", 2L -> "- bullet line\nplain line",
           3L -> "ends with dots...\nalso this one…\nplain"),
      "doc_id", "text").orderBy($"doc_id").collect()
    assert(out(0).getAs[Double]("avg_word_len") === 3.0)
    assert(out(1).getAs[Double]("bullet_line_frac") === 0.5)
    assert(out(2).getAs[Double]("ellipsis_line_frac") === 2.0 / 3)
  }

  test("decontaminationFilter drops exactly the docs decontaminate flags") {
    val corpus = docs(
      1L -> "alpha bravo charlie delta echo",
      2L -> "totally unrelated words here now",
      3L -> "echo foxtrot golf hotel india")
    val bench = docs(100L -> "bravo charlie delta", 101L -> "golf hotel india")
    val flagged = CurationOps.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select($"doc_id").as[Long].collect().toSet
    val kept = CurationOps.decontaminationFilter(corpus, bench, "doc_id", "text", n = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(flagged == Set(1L, 3L))
    assert(kept == corpus.select($"doc_id").as[Long].collect().toSet -- flagged)
  }

  test("bloom pre-pass has no false negatives; verify-on-flagged ≡ exact on full") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bench = real.filter($"doc_id" % 10 === 0)
    val corpus = real.filter($"doc_id" % 10 =!= 0)
    val exact = CurationOps.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select($"doc_id", $"n_shared_shingles").as[(Long, Long)].collect().toMap
    val bloom = CurationOps.decontaminateBloomFlags(
        corpus, bench, "doc_id", "text", n = 3, fpp = 0.01)
      .select($"doc_id", $"n_suspect_shingles").as[(Long, Long)].collect().toMap
    // no false negatives: every exactly-contaminated doc is flagged,
    // with at least the exact shared-shingle count
    exact.foreach { case (id, nShared) =>
      assert(bloom.contains(id), s"doc $id missed by the bloom pre-pass")
      assert(bloom(id) >= nShared, s"doc $id: bloom ${bloom(id)} < exact $nShared")
    }
    // composition: exact verify restricted to bloom-flagged docs equals
    // exact on the full corpus (this is the two-phase production shape)
    val flaggedOnly = corpus.filter($"doc_id".isin(bloom.keys.toSeq: _*))
    val twoPhase = CurationOps.decontaminate(flaggedOnly, bench, "doc_id", "text", n = 3)
      .select($"doc_id", $"n_shared_shingles").as[(Long, Long)].collect().toMap
    assert(twoPhase == exact)
    // false positives exist only within the fpp budget (generous bound:
    // flagged-but-clean docs are a small fraction of the corpus)
    val falsePos = bloom.keySet -- exact.keySet
    val nCorpus = corpus.count().toDouble
    assert(falsePos.size / nCorpus <= 0.10,
      s"${falsePos.size} false-positive docs of ${nCorpus.toInt}")
  }

  test("qualityGate is stateless and applies unchanged to a streaming frame") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val healthy = (1 to 50).map(i => s"word$i").mkString(" ") +
      " the and of to in is a one two three"
    val stream = MemoryStream[(Long, String)]
    val gated = CurationOps.qualityGate(
        stream.toDS().toDF("doc_id", "text"), "doc_id", "text")
      .filter($"keep" === 1).select($"doc_id")
    val q = gated.writeStream.format("memory").queryName("qgate").start()
    stream.addData((1L, healthy), (2L, "too short"))
    q.processAllAvailable()
    val kept = spark.table("qgate").as[Long].collect().toSeq
    q.stop()
    assert(kept == Seq(1L))
  }

  test("decontaminationFilter is stateless over a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val bench = docs(100L -> "bravo charlie delta")
    val stream = MemoryStream[(Long, String)]
    val filtered = CurationOps.decontaminationFilter(
      stream.toDS().toDF("doc_id", "text"), bench, "doc_id", "text", n = 3)
    val q = filtered.writeStream.format("memory").queryName("decontam").start()
    stream.addData(
      (1L, "alpha bravo charlie delta echo"), // shares "bravo charlie delta"
      (2L, "totally unrelated words here now"))
    q.processAllAvailable()
    stream.addData((3L, "more clean content arrives later"))
    q.processAllAvailable()
    val kept = spark.table("decontam").select($"doc_id").as[Long].collect().toSet
    q.stop()
    assert(kept == Set(2L, 3L))
  }

  test("tokenBudgetMix keeps exactly the md5-order prefix within each budget") {
    import org.apache.spark.sql.functions.{concat, lit, md5}
    val df = ((1L to 20L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", ("w " * (i % 5 + 1).toInt).trim))
      // a zero-token doc in an UNBUDGETED stratum: must never appear
      // (0 <= budget-0 would otherwise admit it)
      :+ ((21L, "c", "")))
      .toDF("doc_id", "lang", "text")
    val out = CurationOps.tokenBudgetMix(df, "doc_id", "lang", "text",
        budgets = Map("a" -> 10L), salt = "s")
      .orderBy($"cum_tokens").collect()
    // only the budgeted stratum appears; running total stays in budget
    assert(out.nonEmpty && out.forall(_.getAs[String]("lang") == "a"))
    assert(out.last.getAs[Long]("cum_tokens") <= 10L)
    // the kept set is exactly the maximal md5-order prefix with cum <= 10
    val ordered = df.filter($"lang" === "a")
      .withColumn("k", md5(concat(lit("s"), $"doc_id".cast("string"))))
      .orderBy($"k", $"doc_id")
      .select($"doc_id", graft.textops.TextAnalysis.wordCountCol($"text").as("n"))
      .as[(Long, Int)].collect()
    val expected = ordered
      .scanLeft((0L, 0L)) { case ((_, cum), (id, n)) => (id, cum + n) }
      .drop(1).takeWhile(_._2 <= 10L).map(_._1).toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expected)
    // determinism: a second run returns the identical selection
    val again = CurationOps.tokenBudgetMix(df, "doc_id", "lang", "text",
        Map("a" -> 10L), "s").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == expected)
  }

  test("sequencePack: contiguous spans, boundary straddling, empty docs dropped") {
    import org.apache.spark.sql.functions.{concat, lit, md5}
    val df = Seq(
      (1L, "a", "w w w"),       // 3 tokens
      (2L, "a", "w w w w"),     // 4 tokens
      (3L, "a", ""),            // dropped
      (4L, "a", "w w"),         // 2 tokens
      (5L, "b", "w w w w w w")) // own stratum: 6 tokens -> seqs 0..1
      .toDF("doc_id", "lang", "text")
    val out = CurationOps.sequencePack(df, "doc_id", "lang", "text", seqLen = 5, salt = "s")
      .orderBy($"lang", $"start_offset").collect()
    assert(!out.map(_.getAs[Long]("doc_id")).contains(3L))
    // spans are contiguous within a stratum: start(k) == end(k-1)
    val aRows = out.filter(_.getAs[String]("lang") == "a")
    assert(aRows.head.getAs[Long]("start_offset") === 0L)
    aRows.sliding(2).foreach {
      case Array(p, n) =>
        assert(n.getAs[Long]("start_offset") === p.getAs[Long]("end_offset"))
      case _ =>
    }
    // total 9 tokens in "a" -> last end_offset 9; a doc spanning the
    // 5-token boundary straddles sequences (first_seq < last_seq)
    assert(aRows.last.getAs[Long]("end_offset") === 9L)
    val straddler = aRows.find(r =>
      r.getAs[Long]("start_offset") < 5 && r.getAs[Long]("end_offset") > 5)
    straddler.foreach { r =>
      assert(r.getAs[Long]("first_seq") === 0L && r.getAs[Long]("last_seq") === 1L)
    }
    // every row: first_seq = start/5, last_seq = (end-1)/5
    out.foreach { r =>
      assert(r.getAs[Long]("first_seq") === r.getAs[Long]("start_offset") / 5)
      assert(r.getAs[Long]("last_seq") === (r.getAs[Long]("end_offset") - 1) / 5)
    }
    // the b stratum packs independently from offset 0
    val b = out.filter(_.getAs[String]("lang") == "b").head
    assert(b.getAs[Long]("start_offset") === 0L && b.getAs[Long]("last_seq") === 1L)
  }

  test("packNextFit matches a driver-side replay of the salted-order fold") {
    // 12 docs, 1-7 tokens, two strata; differential against an
    // in-memory replay of the same (md5(salt||id), id) order and
    // next-fit rule — the exact semantics the DuckDB oracle mirrors.
    val docs = (1L to 12L).map { i =>
      (i, if (i % 3 == 0) "b" else "a", Seq.fill((i % 7 + 1).toInt)("w").mkString(" "))
    }
    val df = docs.toDF("doc_id", "lang", "text")
    val seqLen = 8
    val nShards = 2
    val out = CurationOps.packNextFit(df, "doc_id", "lang", "text", seqLen, nShards, "s")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("bin_idx"), r.getAs[Long]("bin_offset")))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs
      .map { case (id, lang, text) => (id, lang, id % nShards, text.split(" ").length.toLong) }
      .groupBy { case (id, lang, shard, _) => (lang, shard) }
      .flatMap { case (_, rows) =>
        var bin = 0L; var fill = 0L
        rows.sortBy { case (id, _, _, _) => (md5hex("s" + id), id) }.map {
          case (id, _, _, n) =>
            if (fill > 0 && fill + n > seqLen) { bin += 1; fill = 0L }
            val off = fill; fill += n
            id -> (bin, off)
        }
      }
    assert(out === expected)
  }

  test("packNextFit: oversized doc occupies a bin alone; zero-token docs dropped") {
    val df = Seq(
      (1L, "a", Seq.fill(10)("w").mkString(" ")), // > seqLen: alone in its bin
      (2L, "a", "w w"),
      (3L, "a", ""))                              // dropped
      .toDF("doc_id", "lang", "text")
    val out = CurationOps.packNextFit(df, "doc_id", "lang", "text",
        seqLen = 4, nShards = 1, salt = "s")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("bin_idx"), r.getAs[Long]("bin_offset")))).toMap
    assert(!out.contains(3L))
    val (bin1, off1) = out(1L)
    val (bin2, off2) = out(2L)
    assert(off1 === 0L)     // oversized always starts its own bin
    assert(bin1 !== bin2)   // nothing shares the oversized bin
    assert(off2 === 0L)
  }

  test("lengthPercentiles: exact interpolated quantiles per stratum") {
    // stratum "a": token counts 1..5 -> p50 = 3.0, p90 = 1 + 0.9*4 = 4.6
    val df = (1 to 5).map(i => (i.toLong, "a", ("w " * i).trim)) :+ ((9L, "b", "x y"))
    val out = CurationOps.lengthPercentiles(
        df.toDF("doc_id", "lang", "text"), "lang", "text")
      .orderBy($"lang").collect()
    val a = out(0)
    assert(a.getAs[Long]("n_docs") === 5)
    assert(a.getAs[Int]("min_tokens") === 1 && a.getAs[Int]("max_tokens") === 5)
    assert(a.getAs[Double]("p50_tokens") === 3.0)
    assert(a.getAs[Double]("p90_tokens") === 4.6)
    assert(a.getAs[Double]("mean_tokens") === 3.0)
    assert(out(1).getAs[Double]("p50_tokens") === 2.0) // single doc
  }

  test("repetitionStats degenerate docs: empty and single-word") {
    val out = CurationOps.repetitionStats(
      docs(1L -> "", 2L -> "word", 3L -> "   "), "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Int]("n_words") === 0)
    assert(out(0).getAs[Double]("top_word_frac") === 0.0)
    assert(out(0).getAs[Double]("dup_bigram_frac") === 0.0)
    assert(out(0).getAs[Int]("repetitive") === 0)
    assert(out(1).getAs[Int]("n_words") === 1)
    assert(out(1).getAs[Double]("top_word_frac") === 1.0) // 1/1 > 0.2
    assert(out(1).getAs[Int]("repetitive") === 1)
    assert(out(2).getAs[Int]("n_words") === 0) // whitespace-only
  }

  test("repetitionStats is case-insensitive like the rest of the text suite") {
    val out = CurationOps.repetitionStats(docs(1L -> "The THE the x"), "doc_id", "text")
      .collect().head
    assert(out.getAs[Double]("top_word_frac") === 0.75)
  }

  test("decontaminate flags only corpus docs sharing an n-gram with the benchmark") {
    val corpus = docs(
      10L -> "alpha beta gamma delta", // shares "alpha beta gamma" + "beta gamma delta"? bench has only first
      11L -> "totally different words here",
      12L -> "alpha beta gamma")
    val bench = docs(90L -> "alpha beta gamma zeta", 91L -> "alpha beta gamma")
    val out = CurationOps.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .orderBy($"doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 12L))
    val d10 = out(0)
    // doc 10 shingles: {a b g, b g d}; shared: "alpha beta gamma" only,
    // which occurs in BOTH bench docs
    assert(d10.getAs[Long]("n_shared_shingles") === 1L)
    assert(d10.getAs[Long]("n_bench_docs") === 2L)
  }

  test("decontaminate counts multiple shared shingles once per distinct shingle") {
    val corpus = docs(1L -> "x y z w v")        // shingles: xyz yzw zwv
    val bench = docs(2L -> "x y z w")           // shingles: xyz yzw
    val out = CurationOps.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .collect().head
    assert(out.getAs[Long]("n_shared_shingles") === 2L)
    assert(out.getAs[Long]("n_bench_docs") === 1L)
  }

  test("stratifiedSample caps per stratum, is deterministic, and rk is dense") {
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s1 = CurationOps.stratifiedSample(df, "doc_id", "lang", k = 7, salt = "s")
    val s2 = CurationOps.stratifiedSample(df, "doc_id", "lang", k = 7, salt = "s")
    val rows = s1.orderBy($"lang", $"rk").collect()
    assert(rows.length === 14)
    assert(rows.groupBy(_.getString(1)).forall(_._2.map(_.getAs[Int]("rk")).toSeq == (1 to 7)))
    assert(s1.orderBy($"lang", $"rk").collect().toSeq ===
      s2.orderBy($"lang", $"rk").collect().toSeq)
    // different salt -> (almost surely) different pick for a 7-of-50 draw
    val s3 = CurationOps.stratifiedSample(df, "doc_id", "lang", k = 7, salt = "other")
    assert(s3.select($"doc_id").collect().map(_.getLong(0)).toSet !=
      s1.select($"doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("stratifiedSample returns whole stratum when k exceeds its size") {
    val df = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("doc_id", "lang")
    val out = CurationOps.stratifiedSample(df, "doc_id", "lang", k = 10, salt = "s")
    assert(out.count() === 3)
  }

  test("tfidfTopK scores exactly tf * N * 1e6 / df and ranks desc, ties by term") {
    val df = docs(1L -> "x x y", 2L -> "y z")
    val out = CurationOps.tfidfTopK(df, "doc_id", "text", k = 3)
      .orderBy($"doc_id", $"rk").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getAs[String]("term"), r.getAs[Double]("score"))).toSeq ===
      Seq("x" -> 4000000.0, "y" -> 1000000.0)) // tf=2*N=2*1e6/df=1; tf=1*2*1e6/2
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(r => (r.getAs[String]("term"), r.getAs[Double]("score"))).toSeq ===
      Seq("z" -> 2000000.0, "y" -> 1000000.0))
  }

  test("tfidfTopK keeps at most k terms per doc") {
    val df = docs(1L -> "a b c d e f g")
    val out = CurationOps.tfidfTopK(df, "doc_id", "text", k = 3)
    assert(out.count() === 3)
  }

  test("redactPii masks emails, phones, and SSNs with typed tokens") {
    import graft.textops.TextAnalysis
    val df = Seq(
      "write to John.Doe+spam@Example.co.uk today",
      "call (555) 123-4567 or 555-123-4567 or +1 555 123 4567",
      "ssn 123-45-6789 ok",
      "not a phone: 12345-123-4567x, not an ssn: 1123-45-6789",
      "clean text stays untouched",
      "mail john.555-123-4567@gmail.com and 123-45-6789@corp.example.com").toDF("t")
    val out = df.select(TextAnalysis.redactPii($"t").as("r")).collect().map(_.getString(0))
    assert(out(0) === "write to <EMAIL> today")
    assert(out(1) === "call <PHONE> or <PHONE> or <PHONE>")
    assert(out(2) === "ssn <SSN> ok")
    assert(out(3) === "not a phone: 12345-123-4567x, not an ssn: 1123-45-6789")
    assert(out(4) === "clean text stays untouched")
    // emails mask FIRST: a phone/ssn-shaped local part must not leak
    // the surrounding address
    assert(out(5) === "mail <EMAIL> and <EMAIL>")
  }

  test("piiCounts reports per-kind hit counts") {
    import graft.textops.TextAnalysis
    val df = Seq("a@b.com and c@d.org, call 555-123-4567, ssn 123-45-6789").toDF("t")
    val row = df.select(TextAnalysis.piiCounts($"t").as("c")).select("c.*").collect().head
    assert(row.getAs[Int]("emails") === 2)
    assert(row.getAs[Int]("phones") === 1)
    assert(row.getAs[Int]("ssns") === 1)
  }

  test("segmentDedup keeps only the first (doc_id, seg_idx) holder of each segment") {
    val df = docs(
      1L -> "a b c d e f", // segs: "a b c", "d e f" — both first occurrences
      2L -> "a b c x y",   // "a b c" repeats doc 1 seg 0; "x y" is a short first
      3L -> "x y",         // exactly doc 2's short segment -> dropped entirely
      4L -> "")            // no words -> no segments -> absent from output
    val out = CurationOps.segmentDedup(df, "doc_id", "text", segWords = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_dropped"), r.getAs[String]("kept_text"))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((2L, 0L, "a b c d e f")))
    assert(out(2L) === ((2L, 1L, "x y")))
    assert(out(3L) === ((1L, 1L, "")))
  }

  test("segmentDedup drops within-document repeats after the first") {
    val df = docs(7L -> "p q r p q r p q")
    // segs: "p q r" (kept), "p q r" (dup), "p q" (short, first)
    val row = CurationOps.segmentDedup(df, "doc_id", "text", segWords = 3).collect().head
    assert(row.getAs[Long]("n_segs") === 3L)
    assert(row.getAs[Long]("n_dropped") === 1L)
    assert(row.getAs[String]("kept_text") === "p q r p q")
  }

  test("segmentDedup reconstruction preserves segment order") {
    val df = docs(
      1L -> "z z z",
      2L -> "h h h z z z t t t") // middle segment dropped, ends kept in order
    val out = CurationOps.segmentDedup(df, "doc_id", "text", segWords = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("kept_text")).toMap
    assert(out(2L) === "h h h t t t")
  }

  test("exactSpanDedup removes every duplicated span >= T, keeps the " +
       "first copy, leaves unique context untouched") {
    // an 8-word span shared by docs 1 and 2 in DIFFERENT contexts;
    // T=5 -> in doc 2 only the span's four fully-interior width-5
    // shingles are non-first, covering exactly the 8 span words
    val span = "s1 s2 s3 s4 s5 s6 s7 s8"
    val df = docs(
      1L -> s"c1 c2 c3 $span c4 c5 c6",
      2L -> s"d1 d2 d3 $span d4 d5 d6",
      3L -> "u1 u2 u3 u4 u5 u6",  // no duplication anywhere
      4L -> "")                   // empty -> absent from output
    val out = CurationOps.exactSpanDedup(df, "doc_id", "text", minSpanWords = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_dropped"), r.getAs[String]("kept_text"))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((14L, 0L, s"c1 c2 c3 $span c4 c5 c6")))
    assert(out(2L) === ((14L, 8L, "d1 d2 d3 d4 d5 d6")))
    assert(out(3L) === ((6L, 0L, "u1 u2 u3 u4 u5 u6")))
  }

  test("exactSpanDedup finds the span winnowing misses (the adversarial " +
       "q77 gap): short shared span, divergent chunk boundaries") {
    // The q77 winnowing parameters (k=3, radius=3) select chunk
    // boundaries from a ±3-shingle window; for an 8-word span no
    // interior boundary decision is independent of the surrounding
    // context (that needs ≥ radius+k in-span slack on both sides), so
    // the two copies cut into different chunks and winnowing drops
    // NOTHING — while the exact path must find the span. (Fixture
    // chosen so the md5 boundary minima genuinely diverge: doc 1 cuts
    // mid-span, doc 2 cuts at d3 — no chunk is shared.)
    val span = "s1x1 s1x2 s1x3 s1x4 s1x5 s1x6 s1x7 s1x8"
    val df = docs(
      1L -> s"c1 c2 c3 $span c4 c5 c6",
      2L -> s"d1 d2 d3 $span d4 d5 d6")
    val winnowed = CurationOps.winnowedSpanDedup(df, "doc_id", "text",
        shingleWords = 3, winnowRadius = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dropped")).toMap
    assert(winnowed.values.forall(_ == 0L),
      s"fixture must be a winnowing MISS to demonstrate the gap: $winnowed")
    val exact = CurationOps.exactSpanDedup(df, "doc_id", "text", minSpanWords = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dropped")).toMap
    assert(exact === Map(1L -> 0L, 2L -> 8L))
  }

  test("exactSpanDedup within-document repeats and the periodic " +
       "self-overlap divergence") {
    // repeat of a 6-word block inside one doc: second copy removed
    val block = "p q r s t u"
    val o1 = CurationOps.exactSpanDedup(
        docs(1L -> s"$block x y $block"), "doc_id", "text", minSpanWords = 5)
      .collect().head
    assert(o1.getAs[Long]("n_dropped") === 6L)
    assert(o1.getAs[String]("kept_text") === s"$block x y")
    // documented divergence: periodic text keeps only the first word
    // (per-shingle first-occurrence, not per-maximal-span)
    val o2 = CurationOps.exactSpanDedup(
        docs(2L -> "x x x x x"), "doc_id", "text", minSpanWords = 2)
      .collect().head
    assert(o2.getAs[Long]("n_dropped") === 4L)
    assert(o2.getAs[String]("kept_text") === "x")
  }

  test("exactSpanDedup spans below T survive") {
    // 4 shared words with T=5: no width-5 shingle duplicates
    val df = docs(1L -> "a b c d e f", 2L -> "z1 c d e f z2")
    val out = CurationOps.exactSpanDedup(df, "doc_id", "text", minSpanWords = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dropped")).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }

  test("unigramSurprisal: exact whole-bit scores from corpus counts") {
    // counts: a=6, b=1, c=1; total=8
    // bits(term) = length(bin(total div cnt)): a -> bin(1)="1" -> 1;
    // b, c -> bin(8)="1000" -> 4
    val df = docs(1L -> "a a a a", 2L -> "a a b c")
    val out = CurationOps.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_bits"), r.getAs[Double]("mean_bits"))))
      .toMap
    assert(out(1L) === ((4L, 4L, 1.0)))
    assert(out(2L) === ((4L, 10L, 2.5)))
  }

  test("unigramSurprisal ranks a rare-word doc above common-word prose") {
    val common = (1 to 20).map(_ => "the cat sat").mkString(" ")
    val rare = "qwyjibo zxqv flurble the cat sat"
    val out = CurationOps.unigramSurprisal(
        docs(1L -> common, 2L -> rare), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_bits")).toMap
    assert(out(2L) > out(1L))
  }

  test("bigramSurprisal: exact whole-bit conditional scores from corpus counts") {
    // bigrams: doc1 (a,b)x2 (b,a)x1; doc2 (a,b) (b,c)
    // c2: (a,b)=3 (b,a)=1 (b,c)=1; prefix c1: a=3, b=2
    // bits: (a,b) 3 div 3 = 1 -> "1" -> 1; (b,a) 2 div 1 = 2 -> "10" -> 2;
    //       (b,c) 2 div 1 = 2 -> 2
    val df = docs(1L -> "a b a b", 2L -> "a b c")
    val out = CurationOps.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_bits"), r.getAs[Double]("mean_bits"))))
      .toMap
    assert(out(1L) === ((3L, 4L, 4.0 / 3.0)))
    assert(out(2L) === ((2L, 3L, 1.5)))
  }

  test("bigramSurprisal drops docs below two tokens and scores predictability") {
    // "x y" repeated: after the corpus sees it, every continuation is
    // near-certain -> low bits; the same words shuffled break the
    // chain -> higher bits, even though unigram stats are identical
    val predictable = (1 to 10).map(_ => "x y").mkString(" ")
    val scrambled = "x x y y x y y x x y x y y x x y y x y x"
    val out = CurationOps.bigramSurprisal(
        docs(1L -> predictable, 2L -> scrambled, 3L -> "solo"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_bits")).toMap
    assert(!out.contains(3L), "single-token doc must contribute no bigrams")
    assert(out(2L) > out(1L))
  }

  test("approx_count_distinct corpus stats stay within the HLL error bound") {
    // SURVEY §7.2 item 9: distinct-term corpus stats via HLL sketches —
    // the ONLY mergeable shape at 100 TB (an exact countDistinct
    // shuffles every distinct term; the sketch is fixed-size per
    // partition and map-side combined). Not gate-oracled: sketch
    // estimates are engine-specific. Pinned here instead: within the
    // configured relative error of exact on the real documents table,
    // per language and overall.
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, explode}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val terms = docs.select($"lang",
      explode(graft.textops.TextTokens.wordsCol($"text")).as("term"))
    val overall = terms.agg(
        countDistinct($"term").as("exact"),
        approx_count_distinct($"term", 0.02).as("approx"))
      .as[(Long, Long)].head()
    assert(math.abs(overall._2 - overall._1).toDouble / overall._1 <= 0.05,
      s"overall exact=${overall._1} approx=${overall._2}")
    val perLang = terms.groupBy($"lang").agg(
        countDistinct($"term").as("exact"),
        approx_count_distinct($"term", 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    perLang.foreach { case (lang, exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"$lang exact=$exact approx=$approx")
    }
  }

  test("count-min sketch term frequencies overestimate-only within epsilon") {
    // The third mergeable sketch beside HLL (distinct counts) and Bloom
    // (membership): CMS answers "how often does term X occur" from a
    // fixed-size table that merges across partitions — the 100 TB shape
    // for hot-term stats without shuffling every token. Guarantee pinned:
    // estimates NEVER undercount, and overshoot ≤ eps·N with probability
    // 1−delta (we assert the common-case bound on every frequent term).
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val terms = docs.select(
      explode(graft.textops.TextTokens.wordsCol($"text")).as("term"))
    val eps = 0.001
    val cms = terms.stat.countMinSketch(
      "term", eps = eps, confidence = 0.99, seed = 42)
    val exact = terms.groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc).limit(50)
      .as[(String, Long)].collect()
    val n = terms.count()
    exact.foreach { case (term, cnt) =>
      val est = cms.estimateCount(term)
      assert(est >= cnt, s"CMS undercounted '$term': $est < $cnt")
      assert(est <= cnt + (eps * n).toLong,
        s"'$term' overshoot beyond eps*N: est=$est exact=$cnt N=$n")
    }
  }

  test("approx percentiles track exact within 1 rank point on doc lengths") {
    // approx_percentile is the mergeable companion to q38's EXACT
    // percentiles: at 100 TB the exact form shuffles every length once
    // (fine, it's one long per doc), but the sketch answers from
    // fixed-size state and merges into incremental/streaming rollups
    // where a global sort pass cannot run. Accuracy pinned against the
    // exact quantiles on the real table at accuracy=10000 (error
    // ≤ 1/accuracy of the rank ⇒ near-exact here).
    val lens = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(size(graft.textops.TextTokens.wordsCol($"text")).cast("long").as("len"))
    val qs = Array(0.1, 0.5, 0.9, 0.99)
    val approx = lens.stat.approxQuantile("len", qs, 1.0 / 10000)
    val sorted = lens.orderBy($"len").as[Long].collect()
    qs.zip(approx).foreach { case (q, a) =>
      // rank of the approximate answer must be within 1% of the target
      // rank (the approxQuantile contract, with slack for ties)
      val lo = sorted(math.max(0, (q - 0.01) * (sorted.length - 1)).toInt)
      val hi = sorted(math.min(sorted.length - 1, ((q + 0.01) * (sorted.length - 1)).toInt + 1))
      assert(a >= lo && a <= hi, s"q=$q approx=$a outside [$lo, $hi]")
    }
  }

  test("hashedLinearScore matches a direct per-token computation") {
    val buckets = 1024
    def bucketOf(w: String): Long =
      graft.textops.NearDup.shingleHash60(w) % buckets
    def weightOf(w: String): Long = bucketOf(w) % 201 - 100
    val d1 = "alpha beta gamma alpha"
    val d2 = "delta"
    val out = CurationOps.hashedLinearScore(
        docs(1L -> d1, 2L -> d2, 3L -> ""), "doc_id", "text", buckets)
      .orderBy($"doc_id").collect()
    // the empty doc contributes no tokens and drops out entirely
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    val raw1 = d1.split(" ").map(weightOf).sum
    assert(out(0).getAs[Long]("n_tokens") === 4L)
    assert(out(0).getAs[Long]("raw_score") === raw1)
    assert(out(0).getAs[Double]("score") ===
      BigDecimal(raw1 / 400.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(0).getAs[Boolean]("keep") === (out(0).getAs[Double]("score") >= 0))
    // repeated tokens count every occurrence (fastText sums, not sets)
    assert(raw1 === 2 * weightOf("alpha") + weightOf("beta") + weightOf("gamma"))
    assert(out(1).getAs[Long]("raw_score") === weightOf("delta"))
  }

  test("temperatureMix: targets proportional to sqrt mass, greedy fill exact") {
    val rows = Seq(
      (1L, "a", "w w w w"), (2L, "a", "w w w w"),
      (3L, "a", "w w w w"), (4L, "a", "w w w w"),   // stratum a: 16 tokens
      (5L, "b", "w w w w"),                          // stratum b: 4 tokens
      (6L, "b", ""))                                 // zero tokens: excluded
    val out = CurationOps.temperatureMix(
        rows.toDF("doc_id", "src", "text"), "doc_id", "src", "text",
        totalBudget = 6L, salt = "t")
      .orderBy($"src", $"cum_tokens").collect()
    // w_a = floor(sqrt(16)*1e6) = 4e6, w_b = floor(sqrt(4)*1e6) = 2e6,
    // tw = 6e6 -> target_a = 6*4e6 div 6e6 = 4, target_b = 2
    val bySrc = out.groupBy(_.getAs[String]("src"))
    assert(bySrc("a").head.getAs[Long]("target_tokens") === 4L)
    // one 4-token doc fills stratum a exactly; b's target 2 < 4 admits none
    assert(bySrc("a").map(_.getAs[Long]("cum_tokens")).toSeq === Seq(4L))
    assert(!bySrc.contains("b"))
    // deterministic: the same salt picks the same doc every run
    val again = CurationOps.temperatureMix(
        rows.toDF("doc_id", "src", "text"), "doc_id", "src", "text",
        totalBudget = 6L, salt = "t").collect()
    assert(again.map(_.getAs[Long]("doc_id")).toSeq ===
      out.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("zipfSlope reproduces the closed-form regression on known counts") {
    // counts: a=4, b=2, c=1 -> ranks 1, 2, 3
    val out = CurationOps.zipfSlope(
        docs(1L -> "a a a a b b c"), "text").collect().head
    assert(out.getAs[Long]("n_types") === 3L)
    assert(out.getAs[Long]("n_tokens") === 7L)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Double]("zipf_slope") === r6(slope))
    assert(out.getAs[Double]("zipf_intercept") === r6(icept))
    // a perfect 1/rank spectrum slopes exactly -1
    val perfect = CurationOps.zipfSlope(
        docs(1L -> ("x " * 6 + "y " * 3 + "z " * 2)), "text").collect().head
    assert(math.abs(perfect.getAs[Double]("zipf_slope") + 1.0) < 0.11,
      s"expected near -1, got ${perfect.getAs[Double]("zipf_slope")}")
  }

  test("canonicalDedup keeps the highest-quality doc per cluster") {
    // docs 1-2 clustered; 1 is all-distinct (quality 1.0), 2 is one word
    // repeated (distinct ratio 1/12); 3 is an untouched singleton
    val corpus = docs(
      1L -> "a b c d e f g h i j k l",
      2L -> ("z " * 12).trim,
      3L -> "m n o p q r s t u v w x")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = CurationOps.canonicalDedup(corpus, "doc_id", "text", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L) // shared min-label cluster
    assert(out(3L)._1 === 3L)                      // singleton keeps own id
    assert(out(1L)._3 === 1 && out(2L)._3 === 0)   // higher quality wins
    assert(out(3L)._3 === 1)
    assert(out(1L)._2 === 1.0)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L)._2 === r6(0.5 + 0.5 / 12))
  }

  test("canonicalDedup breaks quality ties on the lower doc_id") {
    val corpus = docs(
      7L -> "a b c d e f g h i j",
      4L -> "a b c d e f g h i j")
    val pairs = Seq((4L, 7L)).toDF("id_a", "id_b")
    val keeps = CurationOps.canonicalDedup(corpus, "doc_id", "text", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(keeps === Map(4L -> 1, 7L -> 0))
  }

  test("canonicalDedup withholds the broadcast hint above the label limit") {
    val corpus = docs(
      1L -> "a b c d e f g h i j",
      2L -> ("z " * 10).trim,
      3L -> "m n o p q r s t u v")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    // broadcastLabelLimit = 0 withholds the hint; with auto-broadcast
    // disabled the label join must then plan as a SHUFFLED join — the
    // path a corpus-scale cluster frame takes (a forced hint would
    // broadcast regardless of the threshold and OOM at scale)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = CurationOps.canonicalDedup(corpus, "doc_id", "text",
        pairs, "id_a", "id_b", broadcastLabelLimit = 0L)
      val rows = big.orderBy("doc_id").collect()
      val plan = big.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"label join must not broadcast above the limit:\n$plan")
      // and the shuffled plan returns the same answer as the hinted one
      val hinted = CurationOps.canonicalDedup(corpus, "doc_id", "text",
          pairs, "id_a", "id_b")
        .orderBy("doc_id").collect()
      assert(rows.toSeq === hinted.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("zipfSlope ranks through a partitioned window only") {
    // the two-phase rank must leave NO unpartitioned WindowExec (an
    // unpartitioned Window.orderBy holds the whole vocabulary in one
    // task); traverse the non-adaptive physical plan so WindowExec
    // nodes are visible to collect()
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = CurationOps.zipfSlope(
        docs(1L -> "a a a a b b c", 2L -> "b c d d e f g"), "text")
      import org.apache.spark.sql.execution.window.WindowExec
      val wins = df.queryExecution.executedPlan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, "expected the ranking WindowExec in the plan")
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned WindowExec in zipfSlope plan: $w"))
      // and the two-phase rank computes the same regression as before
      val out = df.collect().head
      assert(out.getAs[Long]("n_types") === 7L)
      assert(out.getAs[Long]("n_tokens") === 14L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("perplexityBuckets: thirds cut by cumulative token mass in " +
       "surprisal order, boundaries exact") {
    // six docs of 2 tokens each (12 total; thirds at 4 and 8), with
    // vocab frequencies arranged so the surprisal order is by doc_id:
    // doc 1-2 share the commonest words, 5-6 the rarest
    val d = docs(
      1L -> "a a", 2L -> "a b", 3L -> "b c",
      4L -> "c d", 5L -> "d e", 6L -> "e f")
    val out = CurationOps.perplexityBuckets(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cum_tokens"), r.getAs[String]("bucket")))).toMap
    // cum masses 2,4,6,8,10,12: head = cum*3 <= 12 (docs 1,2),
    // middle = cum*3 <= 24 (docs 3,4), tail = rest
    val expectCum = Map(1L -> 2L, 2L -> 4L, 3L -> 6L, 4L -> 8L, 5L -> 10L, 6L -> 12L)
    assert(out.view.mapValues(_._1).toMap === expectCum)
    assert(out.view.mapValues(_._2).toMap === Map(
      1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail"))
  }

  test("perplexityBuckets cumsum runs through partitioned windows only") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = CurationOps.perplexityBuckets(
        docs(1L -> "a a b", 2L -> "b c d", 3L -> "d e f"), "doc_id", "text")
      import org.apache.spark.sql.execution.window.WindowExec
      val wins = df.queryExecution.executedPlan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, "expected the cumsum WindowExec in the plan")
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned WindowExec in perplexityBuckets plan: $w"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("trainOrder: positions are a permutation, shards balanced " +
       "within one, deterministic per seed, reshuffled across seeds") {
    val d = docs((1L to 20L).map(i => i -> s"doc $i text"): _*)
    def run(seed: String) = CurationOps.trainOrder(d, "doc_id", seed, shards = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("position"), r.getAs[Int]("shard"),
          r.getAs[Long]("shard_pos")))).toMap
    val a = run("epoch1")
    assert(a.values.map(_._1).toSeq.sorted == (1L to 20L).toSeq)
    val bySh = a.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySh.values.max - bySh.values.min <= 1, s"unbalanced: $bySh")
    // shard_pos is dense 0..n-1 within each shard
    a.values.groupBy(_._2).values.foreach { rs =>
      assert(rs.map(_._3).toSeq.sorted == (0L until rs.size).toSeq)
    }
    assert(run("epoch1") === a, "same seed must reproduce the order")
    val b = run("epoch2")
    assert(b.values.map(_._1).toSeq.sorted == (1L to 20L).toSeq)
    assert((1L to 20L).exists(i => a(i)._1 != b(i)._1), "new seed must reshuffle")
  }

  test("trainOrder two-phase rank equals the naive global rank on " +
       "random corpora") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, concat_ws, lit, md5, row_number}
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 50 + rnd.nextInt(100)
      val d = docs((1L to n).map(i => i -> s"t$trial doc $i"): _*)
      val twoPhase = CurationOps.trainOrder(d, "doc_id", s"s$trial", 4)
        .select("doc_id", "position")
        .as[(Long, Long)].collect().toMap
      // naive: one unpartitioned window over the same salted key — the
      // reduction the two-phase form must reproduce bit for bit
      val naive = d.select(col("doc_id"),
          md5(concat_ws(":", lit(s"s$trial"), col("doc_id").cast("string"))).as("k"))
        .withColumn("position",
          row_number().over(Window.orderBy(col("k"), col("doc_id"))).cast("long"))
        .select("doc_id", "position")
        .as[(Long, Long)].collect().toMap
      assert(twoPhase === naive, s"trial $trial (n=$n)")
    }
  }

  test("perplexityBuckets two-phase cumsum equals the naive global " +
       "cumsum on random corpora") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, sum}
    val rnd = new scala.util.Random(11)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "rare1", "rare2")
    for (trial <- 0 until 2) {
      val n = 30 + rnd.nextInt(40)
      val d = docs((1L to n).map(i =>
        i -> Seq.fill(2 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" ")): _*)
      val twoPhase = CurationOps.perplexityBuckets(d, "doc_id", "text")
        .select("doc_id", "cum_tokens")
        .as[(Long, Long)].collect().toMap
      val naive = CurationOps.unigramSurprisal(d, "doc_id", "text")
        .withColumn("cum_tokens",
          sum(col("n_tokens")).over(Window.orderBy(col("mean_bits"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("doc_id", "cum_tokens")
        .as[(Long, Long)].collect().toMap
      assert(twoPhase === naive, s"trial $trial (n=$n)")
    }
  }

  test("trainOrder ranks through partitioned windows only") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = CurationOps.trainOrder(
        docs((1L to 9L).map(i => i -> s"d$i"): _*), "doc_id", "s", 2)
      import org.apache.spark.sql.execution.window.WindowExec
      val wins = df.queryExecution.executedPlan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty)
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned WindowExec in trainOrder plan: $w"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("fimSplit: applied docs reassemble exactly, unapplied pass " +
       "through, selection is deterministic and near-half") {
    val d = docs((1L to 40L).map(i =>
      i -> s"document $i body with some reasonable length of text"): _*)
    val rows = CurationOps.fimSplit(d, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("fim_applied"),
        r.getAs[String]("prefix"), r.getAs[String]("middle"), r.getAs[String]("suffix")))
    val texts = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, applied, p, m, sfx) =>
      if (applied == 1) assert(p + m + sfx == texts(id), s"doc $id must reassemble")
      else assert(p == texts(id) && m == "" && sfx == "", s"doc $id must pass through")
    }
    val nApplied = rows.count(_._2 == 1)
    assert(nApplied > 10 && nApplied < 30, s"hash-half selection off: $nApplied/40")
    // at least one applied doc has a non-trivial three-way split
    assert(rows.exists(r => r._2 == 1 && r._3.nonEmpty && r._4.nonEmpty && r._5.nonEmpty))
    val again = CurationOps.fimSplit(d, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("middle"))).toMap
    rows.foreach { case (id, _, _, m, _) => assert(again(id) == m, "must be deterministic") }
  }

  test("contaminationScore: exact overlap fractions, clean docs at 0.0") {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta", // shares a 4-shingle run
      2L -> "one two three four five six")          // no overlap
    val bench = docs(10L -> "alpha beta gamma delta unrelated tail here")
    val out = CurationOps.contaminationScore(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("contamination")))).toMap
    // doc 1: shingles {abg, bgd, gde, dez} (4); bench holds {abg, bgd}
    // -> 2/4 exactly
    assert(out(1L) == ((4L, 2L, 0.5)))
    assert(out(2L) == ((4L, 0L, 0.0)))
  }

  test("importanceWeights separates target-like from off-target docs") {
    val corpus = docs(
      1L -> "spark shuffle executor partition",
      2L -> "spark shuffle broadcast join",
      3L -> "cats dogs birds fish",
      4L -> "dogs cats fish hamsters")
    val target = corpus.filter($"doc_id" <= 2)
    val out = CurationOps.importanceWeights(corpus, target, "doc_id", "text", buckets = 4096)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(4)))).toMap
    // 4 unigrams + 3 bigrams per doc
    assert(out.values.forall(_._1 === 7L))
    assert(out(1L)._3 && out(2L)._3, "target-like docs must have keep=true")
    assert(!out(3L)._3 && !out(4L)._3, "off-target docs must have keep=false")
    assert(out(1L)._2 > out(3L)._2)
  }

  test("epochRepeat: integer epochs from budget div mass, both clamps exact") {
    // masses: s1 = 2 tokens -> 10 div 2 = 5, clamped to maxEpochs 3;
    // s2 = 5 -> 2 epochs; s3 = 30 -> 0, clamped up to 1
    val df = Seq(
      (1L, "s1", "a b"),
      (2L, "s2", "a b c"), (3L, "s2", "a b"),
      (4L, "s3", ("x " * 30).trim)).toDF("doc_id", "source", "text")
      .withColumn("n_tokens", size(split($"text", "\\s+")))
    val out = CurationOps.epochRepeat(df, "doc_id", "source", "n_tokens",
        budgetPerStratum = 10L, maxEpochs = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    val copies = out.groupBy(_._1)
    assert(copies(1L).map(_._2).sorted.toSeq == Seq(1, 2, 3)) // capped at 3
    assert(copies(2L).map(_._2).sorted.toSeq == Seq(1, 2))
    assert(copies(3L).map(_._2).sorted.toSeq == Seq(1, 2))
    assert(copies(4L).map(_._2).sorted.toSeq == Seq(1))       // floored to 1
    assert(out.forall { case (id, _, n) => copies(id).length == n })
  }

  test("softDedupWeights: unique=1e9, exact dup halves, near-dup graded between") {
    val out = CurationOps.softDedupWeights(docs(
        1L -> "alpha bravo charlie delta echo",
        2L -> "alpha bravo charlie delta echo", // exact dup of 1
        3L -> "alpha bravo charlie golf hotel", // shares the prefix shingle
        4L -> "india juliet kilo lima mike"), // fully unique
      "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // docs 1/2: 3 shingles, each df 2 except "alpha bravo charlie" df 3.
    // Ratios emit as scaled-integer e9 columns via pure long division
    // (r10: the only cross-engine-pinned arithmetic; round(x,9)
    // doubles proved DuckDB-version-dependent on the driver).
    def e9(num: Long, den: Long): Long = num * 1000000000L / den
    assert(out(1L) == ((3L, 7L, e9(7, 3), e9(3, 7))))
    assert(out(1L) == out(2L))
    // doc 3: one shared shingle (df 3), two unique -> graded between
    assert(out(3L) == ((3L, 5L, e9(5, 3), e9(3, 5))))
    assert(out(4L) == ((3L, 3L, 1000000000L, 1000000000L)))
    assert(out(4L)._4 > out(3L)._4 && out(3L)._4 > out(1L)._4)
  }

  test("softDedupWeights: short docs weigh via their whole-text shingle") {
    val out = CurationOps.softDedupWeights(docs(
        1L -> "alpha bravo", 2L -> "alpha bravo", 3L -> "charlie"),
      "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._5))).toMap
    assert(out(1L) == ((1L, 500000000L)) && out(2L) == ((1L, 500000000L)))
    assert(out(3L) == ((1L, 1000000000L)))
  }

  test("importanceWeights with an empty target degrades to the uniform prior") {
    val corpus = docs(1L -> "a b c", 2L -> "a b c")
    val target = corpus.filter($"doc_id" < 0)
    val out = CurationOps.importanceWeights(corpus, target, "doc_id", "text", buckets = 16)
      .collect()
    assert(out.length === 2)
    // p_t = 1/(0+B) uniform; cr >= 1 for every observed bucket makes the
    // ratio ln(rb / ((cr+1) * tb)) finite and identical for the twin docs
    val lrs = out.map(_.getDouble(2))
    assert(lrs.forall(v => !v.isNaN && !v.isInfinite))
    assert(lrs(0) === lrs(1))
  }

  test("groupedSplit: every group lands in exactly one split, all splits used") {
    val df = (1L to 400L).map(i => (i, s"g${i % 100}")).toDF("doc_id", "source")
    val out = CurationOps.groupedSplit(df, "doc_id", "source", seed = "s1")
    assert(out.count() === 400)
    // leakage guard: no group straddles a split boundary
    val leaky = out.groupBy("source")
      .agg(countDistinct($"split").as("n")).filter($"n" > 1).count()
    assert(leaky === 0)
    // 100 groups at 80/10/10: all three splits must be populated and
    // the proportions roughly honored (hash-uniform, so generous bands)
    val counts = out.select($"source", $"split").distinct()
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("groupedSplit is ingest-stable: growing the corpus never moves a group") {
    val df = (1L to 100L).map(i => (i, s"g${i % 10}")).toDF("doc_id", "source")
    val grown = df.unionByName(
      (101L to 160L).map(i => (i, s"h$i")).toDF("doc_id", "source"))
    def splits(d: org.apache.spark.sql.DataFrame) =
      CurationOps.groupedSplit(d, "doc_id", "source", seed = "s1")
        .select($"source", $"split").distinct()
        .as[(String, String)].collect().toMap
    val before = splits(df)
    val after = splits(grown)
    before.foreach { case (g, s) => assert(after(g) === s) }
  }

  test("groupedSplit honors custom percentages at the integer thresholds") {
    val df = (1L to 50L).map(i => (i, s"g$i")).toDF("doc_id", "source")
    // trainPct=100: everything trains (the val/test bands are empty)
    val all = CurationOps.groupedSplit(df, "doc_id", "source", "s", 100, 0)
      .select("split").distinct().as[String].collect().toSeq
    assert(all === Seq("train"))
  }

  test("domainCapRetention keeps the top-k per group by quality, id tiebreak") {
    val df = Seq(
      (1L, "a.com", 10L), (2L, "a.com", 30L), (3L, "a.com", 20L),
      (4L, "a.com", 30L),                       // quality tie with id 2
      (5L, "b.org", 5L)
    ).toDF("doc_id", "etld1", "quality")
    val out = CurationOps.domainCapRetention(df, "doc_id", "etld1", "quality", k = 2)
      .select($"doc_id", $"etld1", $"rk").as[(Long, String, Int)].collect().toSet
    // a.com: quality 30 twice -> ids 2 then 4 (id breaks the tie); b.org: all of it
    assert(out === Set((2L, "a.com", 1), (4L, "a.com", 2), (5L, "b.org", 1)))
  }

  test("domainCapRetention: cap larger than any group keeps everything") {
    val df = Seq((1L, "x", 1L), (2L, "x", 2L), (3L, "y", 3L))
      .toDF("doc_id", "etld1", "quality")
    assert(CurationOps.domainCapRetention(df, "doc_id", "etld1", "quality", 10)
      .count() === 3L)
    intercept[IllegalArgumentException] {
      CurationOps.domainCapRetention(df, "doc_id", "etld1", "quality", 0)
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val nw = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val m = CurationOps.snapshotDiff(old, nw, "doc_id", "text")
      .select($"doc_id", $"status").as[(Long, String)].collect().toMap
    assert(m === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff carries both content hashes for audit joins") {
    val old = Seq((1L, "x")).toDF("doc_id", "text")
    val nw = Seq((1L, "y")).toDF("doc_id", "text")
    val r = CurationOps.snapshotDiff(old, nw, "doc_id", "text").collect().head
    assert(r.getAs[String]("status") === "changed")
    assert(r.getAs[String]("old_hash") !== r.getAs[String]("new_hash"))
    assert(r.getAs[String]("old_hash").length === 32)
  }

  test("knBigramLm: hand-computed probabilities and bounded context mass") {
    // corpus "a b a b a c": bigrams ab=2, ba=2, ac=1;
    // ctx(a)=3 n1f(a)=2, ctx(b)=2 n1f(b)=1; n1b: a=1, b=1, c=1; B=3
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val lm = CurationOps.knBigramLm(docs, "text", minCount = 1)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p_kn"))).toMap
    assert(lm.size === 3)
    assert(lm(("a", "b"))._1 === 2L)
    // p(b|a) = (2-3/4)/3 + (3/4)(2/3)(1/3) = 7/12
    assert(math.abs(lm(("a", "b"))._2 - 7.0 / 12.0) < 1e-12)
    // p(a|b) = (2-3/4)/2 + (3/4)(1/2)(1/3) = 3/4
    assert(math.abs(lm(("b", "a"))._2 - 0.75) < 1e-12)
    // p(c|a) = (1-3/4)/3 + (3/4)(2/3)(1/3) = 1/4
    assert(math.abs(lm(("a", "c"))._2 - 0.25) < 1e-12)
    // observed-context mass never exceeds 1 (backoff mass goes to
    // unseen continuations) — checked on the real corpus too
    val real = CurationOps.knBigramLm(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "text", minCount = 1)
    val mass = real.groupBy($"w1").agg(sum($"p_kn").as("m"))
      .as[(String, Double)].collect()
    assert(mass.nonEmpty)
    mass.foreach { case (w1, m) => assert(m <= 1.0 + 1e-9, s"context $w1 mass $m") }
    real.select($"p_kn").as[Double].collect()
      .foreach(p => assert(p > 0.0 && p <= 1.0))
  }

  test("knTrigramLm: hand-computed recursion through all three orders") {
    // corpus "a b c a b c a b d": trigrams abc=2 bca=2 cab=2 abd=1;
    // ctx3(a,b)=3 f3=2; c23(b,c)=1 c23(b,d)=1; mid(b): nctx2=2 m2=2;
    // bigram types ab,bc,ca,bd → B=4; n1b(c)=1, n1b(d)=1
    val docs = Seq((1L, "a b c a b c a b d")).toDF("doc_id", "text")
    val lm = CurationOps.knTrigramLm(docs, "text", minCount = 1)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[String]("w3")) -> (r.getAs[Long]("n"), r.getAs[Double]("p_kn3"))).toMap
    assert(lm.size === 4)
    assert(lm(("a", "b", "c"))._1 === 2L)
    // inner(b,·) = 0.25/2 + (0.75·2/2)·(1/4) = 0.3125 for both c and d
    // p(c|ab) = 1.25/3 + (0.75·2/3)·0.3125 = 0.572916̄
    assert(math.abs(lm(("a", "b", "c"))._2 - (1.25 / 3 + 0.5 * 0.3125)) < 1e-12)
    // p(d|ab) = 0.25/3 + 0.5·0.3125 = 0.239583̄
    assert(math.abs(lm(("a", "b", "d"))._2 - (0.25 / 3 + 0.5 * 0.3125)) < 1e-12)
    // probabilities stay in (0, 1]; observed-context mass bounded on
    // the real corpus
    val real = CurationOps.knTrigramLm(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "text", minCount = 1)
    val mass = real.groupBy($"w1", $"w2").agg(sum($"p_kn3").as("m"))
      .select($"m").as[Double].collect()
    assert(mass.nonEmpty)
    mass.foreach(m => assert(m <= 1.0 + 1e-9))
    real.select($"p_kn3").as[Double].collect()
      .foreach(p => assert(p > 0.0 && p <= 1.0))
  }

  test("knDocFilter: unseen/rare counting against the trained LM") {
    val train = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val lm = CurationOps.knBigramLm(train, "text", minCount = 1)
    val score = Seq(
      (1L, "a b a b a c"), // every bigram seen, none rare at t=0.2
      (2L, "a b x y")      // ab seen; bx, xy unseen
    ).toDF("doc_id", "text")
    val out = CurationOps.knDocFilter(score, "doc_id", "text", lm,
        pThreshold = 0.2, maxRareFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_unseen"),
         r.getAs[Long]("n_rare"), r.getAs[Int]("keep"))).toMap
    assert(out(1L) === ((5L, 0L, 0L, 1)))
    assert(out(2L) === ((3L, 2L, 0L, 0))) // 2/3 rare+unseen > 0.5
  }

  test("knDocFilter3: trigram unseen/rare counting against the trained LM") {
    val train = Seq((1L, "a b c a b c a b d")).toDF("doc_id", "text")
    val lm = CurationOps.knTrigramLm(train, "text", minCount = 1)
    val score = Seq(
      (1L, "a b c a b c a b d"), // all 7 trigram tokens seen
      (2L, "a b c x y z"),       // abc seen; bcx, cxy, xyz unseen
      (3L, "p q")                // no trigrams at all — absent from output
    ).toDF("doc_id", "text")
    val out = CurationOps.knDocFilter3(score, "doc_id", "text", lm,
        pThreshold = 0.2, maxRareFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Long]("n_unseen"),
         r.getAs[Long]("n_rare"), r.getAs[Int]("keep"))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L)._1 === 7L)
    assert(out(1L)._2 === 0L)
    assert(out(1L)._4 === 1)
    assert(out(2L) === ((4L, 3L, 0L, 0))) // 3/4 unseen > 0.5
    // forced-shuffle probe (limit 0) ≡ broadcast probe
    val shuffled = CurationOps.knDocFilter3(score, "doc_id", "text", lm,
        pThreshold = 0.2, maxRareFrac = 0.5, broadcastLmLimit = 0L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Long]("n_unseen"),
         r.getAs[Long]("n_rare"), r.getAs[Int]("keep"))).toMap
    assert(shuffled === out)
  }

  test("KN builders survive empty/whitespace/one-word docs (slice guard)") {
    // an unguarded slice(ws, 1, size(ws)-1) crashes on size(ws)=0 with
    // 'length must be greater than or equal to 0' — these must all run
    val docs = Seq(
      (1L, "a b a b a c"), (2L, ""), (3L, "   \t\n  "), (4L, "solo"),
      (5L, "x y")).toDF("doc_id", "text")
    val big = CurationOps.bigramCounts(docs, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big(("x", "y")) === 1L) // 2-word doc still contributes
    assert(!big.keySet.exists(p => p._1 == "solo" || p._2 == "solo"))
    val lm2 = CurationOps.knBigramLm(docs, "text", minCount = 1)
    assert(lm2.count() === 4) // ab, ba, ac, xy
    val lm3 = CurationOps.knTrigramLm(docs, "text", minCount = 1)
    assert(lm3.count() > 0)
    assert(!lm3.columns.isEmpty)
    val filt = CurationOps.knDocFilter(docs, "doc_id", "text", lm2,
      pThreshold = 0.2, maxRareFrac = 0.5)
    // degenerate docs produce NO bigram tokens → absent from the per-doc
    // aggregate (group keys come from the explode), not a crash
    assert(filt.select($"doc_id").as[Long].collect().toSet === Set(1L, 4L, 5L)
      || filt.select($"doc_id").as[Long].collect().toSet === Set(1L, 5L))
  }

  test("knTrigramLm/knDocFilter: forced-shuffle path (limit 0) ≡ broadcast path") {
    val docs = Seq(
      (1L, "a b c a b c a b d"), (2L, "c a b d e f"), (3L, "b c a a b c"))
      .toDF("doc_id", "text")
    def key3(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[String]("w3")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p_kn3"))).toMap
    val hinted = key3(CurationOps.knTrigramLm(docs, "text", minCount = 1))
    val shuffled = key3(CurationOps.knTrigramLm(docs, "text", minCount = 1,
      broadcastTypeLimit = 0L))
    assert(hinted === shuffled)
    val lm = CurationOps.knBigramLm(docs, "text", minCount = 1)
    def keyF(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("n_unseen"), r.getAs[Long]("n_rare"))).toMap
    val fH = keyF(CurationOps.knDocFilter(docs, "doc_id", "text", lm, 0.2, 0.5))
    val fS = keyF(CurationOps.knDocFilter(docs, "doc_id", "text", lm, 0.2, 0.5,
      broadcastLmLimit = 0L))
    assert(fH === fS)
  }

  test("corpusOverlapKmv: empty corpora give defined zero statistics") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val empty = docs.filter($"doc_id" < 0L)
    val r = CurationOps.corpusOverlapKmv(empty, empty, "text", k = 16)
      .collect().head
    assert(r.getAs[Long]("sketch_size") === 0L)
    assert(r.getAs[Long]("kth_min") === 0L)
    assert(r.getAs[Double]("est_jaccard") === 0.0)
    assert(r.getAs[Double]("est_contain_a") === 0.0)
    assert(r.getAs[Double]("est_contain_b") === 0.0)
    assert(r.getAs[Double]("est_union") === 0.0)
    // one-sided: B empty → containment_b 0.0 (not NaN), jaccard 0.0
    val r2 = CurationOps.corpusOverlapKmv(docs, empty, "text", k = 16)
      .collect().head
    assert(r2.getAs[Double]("est_contain_b") === 0.0)
    assert(r2.getAs[Double]("est_jaccard") === 0.0)
    assert(r2.getAs[Long]("n_a") > 0L)
  }

  test("corpusOverlapKmv: estimates track the exact set statistics") {
    import graft.textops.NearDup
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 === 1)
    def hashSet(df: org.apache.spark.sql.DataFrame): Set[Long] = df
      .select(explode(NearDup.shinglesCol($"text", 3)).as("sh"))
      .select(NearDup.shingleHash60($"sh").as("h"))
      .distinct().as[Long].collect().toSet
    val (ha, hb) = (hashSet(a), hashSet(b))
    val trueJ = ha.intersect(hb).size.toDouble / ha.union(hb).size
    val trueU = ha.union(hb).size.toDouble
    val r = CurationOps.corpusOverlapKmv(a, b, "text", k = 128).collect().head
    assert(r.getAs[Long]("sketch_size") === 128L)
    // k = 128 → se(J) ≈ sqrt(J(1−J)/k) ≲ 0.045; 0.15 is >3σ
    assert(math.abs(r.getAs[Double]("est_jaccard") - trueJ) < 0.15,
      s"est_jaccard=${r.getAs[Double]("est_jaccard")} true=$trueJ")
    // union estimator se ≈ U/√k ≈ 9 %; 30 % is >3σ
    assert(math.abs(r.getAs[Double]("est_union") - trueU) / trueU < 0.30,
      s"est_union=${r.getAs[Double]("est_union")} true=$trueU")
  }

  test("corpusOverlapKmv: exact when the union fits inside the sketch") {
    val a = Seq((1L, "alpha bravo charlie delta"), (2L, "echo foxtrot golf"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "alpha bravo charlie delta"), (4L, "hotel india juliet"))
      .toDF("doc_id", "text")
    val r = CurationOps.corpusOverlapKmv(a, b, "text", k = 128).collect().head
    // a: {abc, bcd, efg}; b: {abc, bcd, hij} → J = 2/4, containments 2/3
    assert(r.getAs[Long]("sketch_size") === 4L)
    assert(r.getAs[Long]("n_both") === 2L)
    assert(r.getAs[Double]("est_jaccard") === 0.5)
    assert(r.getAs[Double]("est_contain_a") === 2.0 / 3.0)
    assert(r.getAs[Double]("est_contain_b") === 2.0 / 3.0)
    assert(r.getAs[Double]("est_union") === 4.0) // sketch IS the union
  }

  test("pmiCollocations: hand-computed ratios, tie order, min-count filter") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // bigrams: (a,b)×2, (a,c)×1; unigrams a=3 b=2 c=1, Nu=6, Nb=3
    // ratio(a,b) = 2·36/(3·2·3) = 4.0;  ratio(a,c) = 1·36/(3·1·3) = 4.0
    val all = CurationOps.pmiCollocations(docs, "text", minCount = 1, k = 10)
      .collect()
    assert(all.length === 2)
    assert(all(0).getAs[String]("w2") === "b") // tie → (a,b) before (a,c)
    assert(all(0).getAs[Double]("pmi_ratio") === 4.0)
    assert(all(1).getAs[Double]("pmi_ratio") === 4.0)
    assert(all(0).getAs[Long]("n12") === 2L && all(0).getAs[Long]("n1") === 3L
      && all(0).getAs[Long]("n2") === 2L)
    val filtered = CurationOps.pmiCollocations(docs, "text", minCount = 2, k = 10)
      .collect()
    assert(filtered.length === 1 && filtered(0).getAs[String]("w2") === "b")
  }

  test("corpusDrift: hand-computed chi-square, empty-half zero guard") {
    val a = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "x y y y")).toDF("doc_id", "text")
    // x: na=3 nb=1; y: na=1 nb=3; ta=tb=4 → e=2 each side →
    // chi2 = (3−2)²/2 + (1−2)²/2 = 1.0 for both words
    val out = CurationOps.corpusDrift(a, b, "text", minTotal = 1, k = 10)
      .collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[String]("w")).toSeq === Seq("x", "y")) // tie → word asc
    out.foreach(r => assert(r.getAs[Double]("chi2") === 1.0))
    // an empty half measures no drift (zero guard, not NaN)
    val empty = spark.emptyDataFrame.withColumn("doc_id", lit(0L))
      .withColumn("text", lit(""))
    val guarded = CurationOps.corpusDrift(a, empty, "text", minTotal = 1, k = 10)
      .collect()
    assert(guarded.forall(r => r.getAs[Double]("chi2") === 0.0))
  }

  test("c4LineFilter: rule attribution, first-failing-rule precedence, cleaned text") {
    val text = Seq(
      "This line has enough words and ends well.", // kept
      "short one",                                 // < 3 words
      "Please enable JavaScript to continue now.", // js (would otherwise pass)
      "Enough words here but no terminal mark",    // punct
      "javascript",                                // js wins over short AND punct
      "He said \"it works\"",                      // ends in quote → kept
      "").mkString("\n")                           // empty → short
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = graft.textops.TextAnalysis.c4LineFilter(df, "doc_id", "text")
      .collect().head
    assert(r.getAs[Long]("n_lines") === 7L)
    assert(r.getAs[Long]("n_kept") === 2L)
    assert(r.getAs[Long]("n_js") === 2L)    // both js lines, regardless of other rules
    assert(r.getAs[Long]("n_short") === 2L) // "short one", ""
    assert(r.getAs[Long]("n_punct") === 1L)
    // the cleaned text is exactly the two keepers rejoined
    val expected = "This line has enough words and ends well.\nHe said \"it works\""
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("kept_md5") === md)
  }

  test("c4LineFilter: single-line and all-dropped docs") {
    val df = Seq((1L, "A perfectly fine single line stands alone."),
      (2L, "nope\nalso no")).toDF("doc_id", "text")
    val out = graft.textops.TextAnalysis.c4LineFilter(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Long]("n_lines") === 1L && out(0).getAs[Long]("n_kept") === 1L)
    assert(out(1).getAs[Long]("n_kept") === 0L)
    // md5 of the empty join — stable, matches DuckDB's md5('')
    assert(out(1).getAs[String]("kept_md5") === "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("cdcSegments: chunks partition the doc, boundaries are content-defined (shift-robust)") {
    val rnd = new scala.util.Random(7)
    val words = (1 to 400).map(_ => s"w${rnd.nextInt(40)}")
    val doc = words.mkString(" ")
    val out = CurationOps.cdcSegments(
      Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text",
      window = 3, mask = 7).orderBy($"chunk_idx").collect()
    // chunks tile the document exactly
    assert(out.map(_.getAs[Long]("n_words")).sum === 400L)
    assert(out.map(_.getAs[Long]("chunk_idx")).toSeq === out.indices.map(_.toLong))
    assert(out.length > 10) // expected width ≈ 8 words ⇒ ~50 chunks
    // shift-robustness: prepend one word — beyond the first re-chunked
    // region, the SAME chunk md5s reappear (a fixed grid would shift all)
    val shifted = CurationOps.cdcSegments(
      Seq((1L, "extra " + doc)).toDF("doc_id", "text"), "doc_id", "text",
      window = 3, mask = 7).orderBy($"chunk_idx").collect()
    val a = out.map(_.getAs[String]("chunk_md5")).toSet
    val b = shifted.map(_.getAs[String]("chunk_md5")).toSet
    assert((a intersect b).size >= a.size - 2)
    // fixed-grid contrast: every 8-word segment md5 changes after the shift
    // (documented in scaladoc; no assertion needed — the intersect above
    // is the CDC property itself)
    // short docs: at or below `window` words ⇒ one whole-doc chunk
    val short = CurationOps.cdcSegments(
      Seq((1L, "a b c"), (2L, "a"), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text", window = 3, mask = 7).collect()
    assert(short.count(_.getAs[Long](0) == 1L) === 1)
    assert(short.count(_.getAs[Long](0) == 2L) === 1)
    assert(short.forall(_.getAs[Long]("chunk_idx") === 0L))
    assert(!short.exists(_.getAs[Long](0) == 3L)) // empty doc: no rows
  }

  test("cdcDedupStats: first occurrence keeps, duplicated blocks attributed to later docs") {
    val rnd = new scala.util.Random(19)
    val text = (1 to 200).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
    val df = Seq((1L, text), (2L, text), (3L, "one tiny doc")).toDF("doc_id", "text")
    val out = CurationOps.cdcDedupStats(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
    // doc 1 holds every first occurrence; doc 2 is 100% duplicate blocks
    assert(out(0).getAs[Long]("n_dup_chunks") === 0L)
    assert(out(1).getAs[Long]("n_dup_chunks") === out(1).getAs[Long]("n_chunks"))
    assert(out(1).getAs[Long]("dup_words") === 200L)
    assert(out(2).getAs[Long]("n_dup_chunks") === 0L)
  }

  test("cdcBlockDiff: prefix edit reuses downstream blocks; added docs are all fresh") {
    val rnd = new scala.util.Random(29)
    val text = (1 to 300).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
    val old = Seq((1L, text)).toDF("doc_id", "text")
    val nw = Seq((1L, "inserted words up front " + text), (2L, text.take(200)))
      .toDF("doc_id", "text")
    val out = CurationOps.cdcBlockDiff(old, nw, "doc_id", "text")
      .orderBy($"doc_id").collect()
    // doc 1: everything past the first post-edit boundary is reused
    val d1 = out(0)
    assert(d1.getAs[Long]("n_reused") >= d1.getAs[Long]("n_blocks") - 3)
    assert(d1.getAs[Long]("n_reused") < d1.getAs[Long]("n_blocks"))
    // doc 2 is new to the corpus: zero reuse
    assert(out(1).getAs[Long]("n_reused") === 0L)
  }

  test("htmlExtract: script bodies with '<' survive the strip, entities decode after tags") {
    val page = "<html><script>if(a<b){go()}</script><style>p{x:1}</style>" +
      "<body><p>A &amp; B say &lt;hi&gt;</p><!-- c --><a href=\"/x\">link</a>" +
      "<a\nhref=\"/y\">two</a></body></html>"
    val r = graft.textops.TextAnalysis.htmlExtract(
      Seq((1L, page)).toDF("doc_id", "page"), "doc_id", "page")
      .collect().head
    assert(r.getAs[String]("text_extracted") === "A & B say <hi> link two")
    assert(r.getAs[Long]("n_links") === 2L)
    assert(r.getAs[Long]("n_text_chars") === 23L)
    // empty input guard
    val e = graft.textops.TextAnalysis.htmlExtract(
      Seq((1L, "")).toDF("doc_id", "page"), "doc_id", "page").collect().head
    assert(e.getAs[Long]("n_raw_chars") === 0L &&
      e.getAs[Double]("text_ratio") === 0.0)
  }

  test("heapsLaw: growing vocab fits beta near 1, saturated vocab near 0, partition-invariant") {
    // every token unique → V(N) = N → beta = 1, K = 1 exactly
    val unique = (1L to 40L)
      .map(i => (i, (1 to 10).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val u = CurationOps.heapsLaw(unique, "doc_id", "text").collect().head
    assert(u.getAs[Double]("heaps_beta") === 1.0)
    assert(u.getAs[Double]("heaps_k") === 1.0)
    assert(u.getAs[Long]("n_types") === 400L && u.getAs[Long]("n_tokens") === 400L)
    // two-word vocab saturates: beta ~ 0
    val flat = (1L to 40L).map(i => (i, "aa bb aa bb aa")).toDF("doc_id", "text")
    val f = CurationOps.heapsLaw(flat, "doc_id", "text").collect().head
    assert(f.getAs[Double]("heaps_beta") < 0.1)
    assert(f.getAs[Long]("n_types") === 2L)
    // fixed-point moments: identical fit under different partitioning
    val rnd = new scala.util.Random(43)
    val mixed = (1L to 120L).map(i =>
      (i, (1 to 12).map(_ => s"w${rnd.nextInt(200)}").mkString(" ")))
    val one = CurationOps.heapsLaw(
      mixed.toDF("doc_id", "text").repartition(1), "doc_id", "text")
      .collect().head
    val many = CurationOps.heapsLaw(
      mixed.toDF("doc_id", "text").repartition(11), "doc_id", "text")
      .collect().head
    assert(one.getAs[Double]("heaps_beta") === many.getAs[Double]("heaps_beta"))
    assert(one.getAs[Double]("heaps_k") === many.getAs[Double]("heaps_k"))
    assert(one.getAs[Double]("heaps_beta") > 0.3 &&
      one.getAs[Double]("heaps_beta") < 1.0)
  }

  test("lineLangSwitch: foreign lines flagged, unknown lines never count, blanks dropped") {
    val df = Seq(
      (1L, "the and of to in is a cat\nder und das ist ein\n\nzz qq"),
      (2L, "the and of to in is a")
    ).toDF("doc_id", "text")
    val out = graft.textops.TextAnalysis.lineLangSwitch(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
    // doc 1: en doc label; German line switched, unknown line ("zz qq") not
    assert(out(0).getAs[String]("doc_lang") === "en")
    assert(out(0).getAs[Long]("n_lines") === 3L) // blank line dropped
    assert(out(0).getAs[Long]("n_switched") === 1L)
    assert(out(0).getAs[Double]("switch_frac") === 1.0 / 3)
    assert(out(1).getAs[Long]("n_switched") === 0L)
  }

  test("markdownExtract: markers strip, code drops, link/alt text survives") {
    val md = "# Title\n\n> quote line\n\n**bold** *it* `code()` [text](u) ![alt](i)\n\n" +
      "- item one\n\n```\nsecret block\n```\n\n_under_ __dunder__"
    val r = graft.textops.TextAnalysis.markdownExtract(
      Seq((1L, md)).toDF("doc_id", "md"), "doc_id", "md").collect().head
    assert(r.getAs[String]("text_extracted") ===
      "Title quote line bold it code() text alt item one under dunder")
    assert(!r.getAs[String]("text_extracted").contains("secret"))
  }

  test("readability: hand-computed Flesch/FK, vowel-group floor, empty guard") {
    val df = Seq(
      (1L, "The cat sat. It ran fast!"),
      (2L, "xxx 123."), // no vowel groups → 1-syllable floor each
      (3L, "")
    ).toDF("doc_id", "text")
    val out = graft.textops.TextAnalysis.readability(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Long]("n_words") === 6L)
    assert(out(0).getAs[Long]("n_sentences") === 2L)
    assert(out(0).getAs[Long]("n_syllables") === 6L)
    assert(out(0).getAs[Double]("flesch_ease") ===
      r6(206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)))
    assert(out(0).getAs[Double]("fk_grade") ===
      r6(0.39 * (6.0 / 2.0) + 11.8 * (6.0 / 6.0) - 15.59))
    assert(out(1).getAs[Long]("n_syllables") === 2L) // floored at 1 each
    assert(out(1).getAs[Long]("n_sentences") === 1L)
    assert(out(2).getAs[Long]("n_words") === 0L &&
      out(2).getAs[Double]("flesch_ease") === 0.0 &&
      out(2).getAs[Double]("fk_grade") === 0.0)
  }

  test("vocabCoverage: exact OOV mass, boundary tiebreak, empty docs kept") {
    val df = Seq(
      (1L, "aa aa aa bb bb cc"), // aa:3 bb:2 cc:1
      (2L, "aa bb dd dd"),       // dd:2
      (3L, "")                   // no tokens
    ).toDF("doc_id", "text")
    // corpus counts: aa=4, bb=3, dd=2, cc=1 → V=2 vocab {aa, bb}
    val out = CurationOps.vocabCoverage(df, "doc_id", "text", vocabSize = 2)
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Long]("n_tokens") === 6L)
    assert(out(0).getAs[Long]("n_oov") === 1L) // cc
    assert(out(0).getAs[Double]("oov_frac") === 1.0 / 6)
    assert(out(1).getAs[Long]("n_oov") === 2L) // dd dd
    assert(out(1).getAs[Double]("oov_frac") === 0.5)
    assert(out(2).getAs[Long]("n_tokens") === 0L &&
      out(2).getAs[Double]("oov_frac") === 0.0)
    // boundary tie: xx and yy both count 2 — word-asc admits xx only
    val tie = Seq((1L, "xx yy"), (2L, "xx yy")).toDF("doc_id", "text")
    val t = CurationOps.vocabCoverage(tie, "doc_id", "text", vocabSize = 1)
      .orderBy($"doc_id").collect()
    assert(t.forall(_.getAs[Long]("n_oov") === 1L)) // yy is OOV everywhere
  }

  test("jsDivergenceByGroup: identical → 0, disjoint → 1, absent group → 0, partition-invariant") {
    val same = Seq(("a", "w1 w2 w3 w4"), ("b", "w1 w2 w3 w4"))
      .toDF("lang", "text")
    val s = CurationOps.jsDivergenceByGroup(same, "lang", "text", Seq("a", "b"))
      .collect()
    assert(s.length === 1 && s.head.getAs[Double]("jsd") === 0.0)
    val disjoint = Seq(("a", "w1 w2 w3 w4"), ("b", "v1 v2 v3 v4"))
      .toDF("lang", "text")
    val d = CurationOps.jsDivergenceByGroup(disjoint, "lang", "text", Seq("a", "b"))
      .collect()
    assert(d.head.getAs[Double]("jsd") === 1.0) // log2 JSD saturates at 1
    // a declared group with no data: zero-guard, never NaN
    val partial = CurationOps.jsDivergenceByGroup(
      disjoint, "lang", "text", Seq("a", "b", "c")).collect()
    assert(partial.length === 3)
    partial.filter(r => r.getAs[String]("g_b") == "c")
      .foreach(r => assert(r.getAs[Double]("jsd") === 0.0))
    // fixed-point terms make the cross-row sum partition-order exact
    val big = (1 to 60).map(i => (if (i % 3 == 0) "a" else "b",
      s"w${i % 7} w${i % 5} w${i % 11} common"))
    val one = CurationOps.jsDivergenceByGroup(
      big.toDF("lang", "text").repartition(1), "lang", "text", Seq("a", "b"))
      .collect().head.getAs[Double]("jsd")
    val many = CurationOps.jsDivergenceByGroup(
      big.toDF("lang", "text").repartition(13), "lang", "text", Seq("a", "b"))
      .collect().head.getAs[Double]("jsd")
    assert(one === many && one > 0.0 && one < 1.0)
  }

  test("mixSchedule: endpoint anchoring, per-step exact sums, monotone anneal") {
    // w0-heavy 'nat' anneals down, w1-heavy 'code' anneals up
    val srcs = Seq(("nat", 90L, 10L), ("code", 10L, 90L), ("mid", 50L, 50L))
      .toDF("source", "w0", "w1")
    val out = CurationOps.mixSchedule(srcs, "source", "w0", "w1",
        steps = 9, budget = 100L)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // every step's quotas sum to the budget exactly
    (1 to 9).foreach { s =>
      val tot = Seq("nat", "code", "mid").map(n => out((s, n))._2).sum
      assert(tot == 100L, s"step $s sums to $tot")
    }
    // lerp law: w(s) = w0·(9−s) + w1·s
    assert(out((1, "nat"))._1 == 90L * 8 + 10L)
    assert(out((9, "code"))._1 == 90L * 9)
    // anneal direction: nat quota non-increasing, code non-decreasing
    val natQ = (1 to 9).map(s => out((s, "nat"))._2)
    val codeQ = (1 to 9).map(s => out((s, "code"))._2)
    assert(natQ.zip(natQ.tail).forall { case (a, b) => a >= b }, natQ)
    assert(codeQ.zip(codeQ.tail).forall { case (a, b) => a <= b }, codeQ)
  }

  test("mixSchedule: partitioning invariance and zero-weight endpoints") {
    val srcs = (1 to 30).map(i => (f"s$i%02d", i.toLong, (31 - i).toLong))
    for (parts <- Seq(1, 7)) {
      val out = CurationOps.mixSchedule(
          srcs.toDF("source", "w0", "w1").repartition(parts),
          "source", "w0", "w1", steps = 4, budget = 17L)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(3)))
      assert(out.groupBy(_._1).values.forall(_.map(_._3).sum == 17L))
      // deterministic across partitionings
      val again = CurationOps.mixSchedule(
          srcs.toDF("source", "w0", "w1").repartition(13),
          "source", "w0", "w1", steps = 4, budget = 17L)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(3)))
      assert(out.sortBy(t => (t._1, t._2)).toSeq ==
        again.sortBy(t => (t._1, t._2)).toSeq)
    }
  }

  test("spanCorruption: placement law, sentinel indexing, round-trip word conservation") {
    val text = (0 until 45).map(i => s"w$i").mkString(" ") // 3 blocks: 20/20/5
    val out = CurationOps.spanCorruption(
        Seq((7L, text)).toDF("id", "text"), "id", "text", salt = "sc")
      .collect().head
    assert(out.getAs[Long]("n_words") == 45L)
    val nMasked = out.getAs[Long]("n_masked")
    val nSpans = out.getAs[Long]("n_spans")
    val corrupted = out.getAs[String]("corrupted").split(" ").toSeq
    val targets = out.getAs[String]("targets").split(" ").toSeq
    // every word is either in corrupted or in targets, exactly once
    val sentinels = corrupted.filter(_.startsWith("<extra_id_"))
    assert(sentinels.distinct.size == sentinels.size)
    assert(sentinels.size.toLong == nSpans)
    val corruptedWords = corrupted.filterNot(_.startsWith("<extra_id_"))
    val targetWords = targets.filterNot(_.startsWith("<extra_id_"))
    assert(targetWords.size.toLong == nMasked)
    assert((corruptedWords ++ targetWords).sorted ==
      (0 until 45).map(i => s"w$i").sorted)
    // sentinel index = block index; targets carry the same sentinels
    assert(targets.filter(_.startsWith("<extra_id_")).toSet == sentinels.toSet)
    // spans stay inside their block: 1..3 masked words per span
    assert(nSpans >= 2L && nMasked >= nSpans && nMasked <= 3 * nSpans)
  }

  test("spanCorruption: deterministic, salt-sensitive, partition-invariant") {
    val docs = (1 to 50).map(i => (i.toLong,
      (0 until 30).map(j => s"t$i-$j").mkString(" ")))
    def run(salt: String, parts: Int) = CurationOps.spanCorruption(
        docs.toDF("id", "text").repartition(parts), "id", "text", salt)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(run("a", 1) == run("a", 13))
    assert(run("a", 4) != run("b", 4), "different salt must move spans")
  }

  test("clusterSafeSplit: cluster members share a split; singletons hash themselves; no pair straddles") {
    val docs = (1L to 100L).toDF("id")
    // clusters: {1,2,3} -> 1, {10,11} -> 10; everyone else singleton
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster")
    val out = CurationOps.clusterSafeSplit(docs, "id",
        clusters, "id", "cluster", salt = "s", trainPct = 80, validPct = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size == 100)
    assert(Seq(1L, 2L, 3L).map(out(_)).distinct.size == 1,
      "cluster members must land in ONE split")
    assert(out(10L) == out(11L))
    assert(out(4L)._1 == 4L, "non-members are their own cluster")
    val splits = out.values.map(_._2).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")))
    assert(out.values.count(_._2 == "train") > 50, "~80% should be train")
  }

  test("mixSchedule: negative weights and a zero w1 endpoint are rejected; pure-w1 schedules are legal") {
    val neg = Seq(("a", -1L, 5L)).toDF("source", "w0", "w1")
    val ex = intercept[IllegalArgumentException] {
      CurationOps.mixSchedule(neg, "source", "w0", "w1", 3, 10L).collect()
    }
    assert(ex.getMessage.contains("non-negative"))
    // sum(w1) = 0 zeroes step S's total -> rejected up front
    val zw1 = Seq(("a", 5L, 0L), ("b", 3L, 0L)).toDF("source", "w0", "w1")
    val ex2 = intercept[IllegalArgumentException] {
      CurationOps.mixSchedule(zw1, "source", "w0", "w1", 3, 10L).collect()
    }
    assert(ex2.getMessage.contains("w1 endpoint"))
    // sum(w0) = 0 is fine: every step's total is s*sum(w1) > 0
    val zw0 = Seq(("a", 0L, 5L), ("b", 0L, 3L)).toDF("source", "w0", "w1")
    val out = CurationOps.mixSchedule(zw0, "source", "w0", "w1", 3, 10L)
      .collect()
    assert(out.groupBy(_.getInt(0)).values.forall(_.map(_.getLong(3)).sum == 10L))
  }

  test("tokenizerFertility: exact panel under pinned tokenizers; zero guards") {
    val docs = Seq(("en", "one two three"), ("en", "four five"),
      ("de", "sechs"), ("zz", "")).toDF("lang", "text")
    val char = CurationOps.tokenizerFertility(docs, "lang", "text",
        graft.functions.CharTokenizer)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // en: 2 docs, 5 words, 22 bytes, 22 char-tokens
    assert(char("en") == ((2L, 5L, 22L, 22L, 4400L, 1000L)))
    assert(char("de") == ((1L, 1L, 5L, 5L, 5000L, 1000L)))
    assert(char("zz") == ((1L, 0L, 0L, 0L, 0L, 0L)), "empty group zero-guards")
    // whitespace tokenizer: tokens ≡ words -> fertility exactly 1000
    val ws = CurationOps.tokenizerFertility(docs.filter($"lang" =!= "zz"),
        "lang", "text", graft.functions.WhitespaceTokenizer)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(ws.values.forall(_ == 1000L))
  }

  test("dedupKeepBest: quality argmax wins, id tiebreak, singletons kept") {
    val docs = Seq(
      (1L, "Hello, World!", 10L),  // key 'hello world'
      (2L, "hello world", 99L),    // same key, higher quality -> wins
      (3L, "HELLO world!!!", 99L), // same key, same quality -> id 2 wins
      (4L, "something else", 1L))
      .toDF("id", "text", "q")
    val out = CurationOps.dedupKeepBest(docs, "id", "text", "q")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((3L, 0)))
    assert(out(2L) == ((3L, 1)))
    assert(out(3L) == ((3L, 0)))
    assert(out(4L) == ((1L, 1)))
  }

  test("dedupKeepBest/keepBestPanel: non-numeric id column fails loudly") {
    val docs = Seq(("a", "hello", 1L)).toDF("id", "text", "q")
    val e1 = intercept[IllegalArgumentException] {
      CurationOps.dedupKeepBest(docs, "id", "text", "q")
    }
    assert(e1.getMessage.contains("numeric"))
    val e2 = intercept[IllegalArgumentException] {
      CurationOps.keepBestPanel(docs, "id", "text", "q")
    }
    assert(e2.getMessage.contains("numeric"))
  }
}
