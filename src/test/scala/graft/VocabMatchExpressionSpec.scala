package graft

import org.apache.spark.sql.functions.{col, explode}

import graft.functions.VocabMatch
import graft.vocab.{BruteSearch, Concept}

class VocabMatchExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq(
    Concept("process", "CNC Machining", "urn:p/cnc", Seq("CNC"), Nil),
    Concept("process", "Welding", "urn:p/weld", Seq("MIG welding"), Nil),
    Concept("material", "Copper Pipe 1/2in", "urn:m/pipe", Nil, Nil))

  test("native expression ≡ UDF path on non-null rows; null propagates") {
    val texts = Seq(
      Some("We do CNC and MIG welding work"),
      Some("Copper Pipe 1/2in in stock"),
      Some("nothing relevant"),
      Some(""),
      None)
    val df = texts.toDF("text")
    val native = df.select(VocabMatch.matchCol(col("text"), vocab).as("m"))
      .as[Option[Seq[String]]].collect()
    val viaUdf = BruteSearch.searchColumn(df, "text", vocab, "m", native = false)
      .select("m").as[Option[Seq[String]]].collect()
    assert(native.toSeq.take(4) == viaUdf.toSeq.take(4))
    assert(native(0).get.toSet == Set("CNC Machining", "Welding"))
    // Intentional divergence on null input: the native expression is
    // null-intolerant (null → null, conventional relational semantics);
    // the UDF closure maps null text to an empty array.
    assert(native(4).isEmpty)
    assert(viaUdf(4).contains(Seq()))
  }

  test("works on the real documents table and agrees with the set function") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val rows = docs.select(col("doc_id"), col("text"),
        VocabMatch.matchCol(col("text"), graft.queries.TextOps.DemoVocab).as("m"))
      .as[(Long, String, Seq[String])].collect()
    rows.foreach { case (id, text, m) =>
      assert(m.toSet == BruteSearch.search(text, graft.queries.TextOps.DemoVocab), s"doc $id")
    }
  }

  test("informational micro-benchmark: expression vs UDF") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    def timeIt(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths
    docs.select(VocabMatch.matchCol(col("text"), vocab)).count()
    BruteSearch.searchColumn(docs, "text", vocab, native = false).count()
    val tNative = timeIt(docs.select(explode(VocabMatch.matchCol(col("text"), vocab))).count())
    val tUdf = timeIt(BruteSearch.searchColumn(docs, "text", vocab, native = false)
      .select(explode(col("brute_concepts"))).count())
    info(f"native=$tNative%.3fs udf=$tUdf%.3fs")
    assert(tNative > 0 && tUdf > 0)
  }
}

class FusedVectorExpressionSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.{DotProduct, HyperplaneBuckets, NormL2}

  test("fused norm ≡ sqrt(dot(v, v)) bit-for-bit; null propagates") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val composed = emb.select(sqrt(DotProduct.dot($"embedding", $"embedding")).as("n"))
      .as[Double].collect()
    val fused = emb.select(NormL2.norm($"embedding").as("n")).as[Double].collect()
    assert(fused.length > 0)
    assert(fused.map(java.lang.Double.doubleToLongBits).toSeq ==
      composed.map(java.lang.Double.doubleToLongBits).toSeq)
    // null array and null element both yield NULL, like the composed form
    val withNulls = Seq(
      (1L, null: Array[java.lang.Double]),
      (2L, Array[java.lang.Double](1.0, null, 3.0)),
      (3L, Array[java.lang.Double](3.0, 4.0))).toDF("id", "v")
    val out = withNulls.select($"id", NormL2.norm($"v").as("n")).orderBy($"id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1) && out(2).getDouble(1) == 5.0)
  }

  test("fused hyperplane bucket ≡ composed dot/sign form, incl. null→0 quirk") {
    val planesArr = graft.vectors.Vectors.hyperplanes(16, 64).toSeq.map(_.toSeq)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // re-create the pre-fusion composed form inline
    val composedBits = planesArr.zipWithIndex.map { case (p, i) =>
      val dot = DotProduct.dot($"embedding", lit(p.toArray))
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val composed = emb.select($"vec_id", composedBits.as("b")).orderBy($"vec_id")
      .as[(Long, Long)].collect()
    val fused = emb.select($"vec_id",
        HyperplaneBuckets.bucket($"embedding", planesArr).as("b"))
      .orderBy($"vec_id").as[(Long, Long)].collect()
    assert(fused.length > 0 && fused.toSeq == composed.toSeq)
    // null vector, null element, and dim-mismatch all land in bucket 0
    // (the composed form's when/otherwise quirk), never NULL
    val degenerate = Seq(
      (1L, null: Array[java.lang.Double]),
      (2L, Array[java.lang.Double](1.0, null)),
      (3L, Array[java.lang.Double](1.0, 2.0, 3.0))).toDF("id", "v")
    val planes2 = Seq(Seq(1.0, 1.0), Seq(-1.0, 1.0))
    val got = degenerate.select($"id", HyperplaneBuckets.bucket($"v", planes2).as("b"))
      .orderBy($"id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
    assert(!degenerate.select(HyperplaneBuckets.bucket($"v", planes2)).schema.head.nullable)
  }

  test("NaN dot products SET every bit, matching Spark comparison semantics") {
    // Spark's `dot >= 0` routes doubles through compareDoubles: NaN
    // orders above everything (as in DuckDB), so the composed form set
    // the bit on a NaN dot — the fused loop must agree
    val planes2 = Seq(Seq(1.0, 1.0), Seq(-1.0, 1.0))
    val df = Seq((1L, Array(Double.NaN, 2.0)), (2L, Array(1.0, 2.0))).toDF("id", "v")
    val composedBits = planes2.zipWithIndex.map { case (p, i) =>
      val dot = DotProduct.dot($"v", lit(p.toArray))
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val rows = df.select($"id",
        HyperplaneBuckets.bucket($"v", planes2).as("fused"),
        composedBits.as("composed"))
      .orderBy($"id").collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
    assert(rows(0).getLong(1) == 3L) // NaN dots → both bits set
  }

  test("empty or ragged plane matrices are rejected at construction") {
    val v = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      HyperplaneBuckets.bucket($"v", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      HyperplaneBuckets.bucket($"v", Seq(Seq(1.0, 2.0), Seq(3.0)))
    }
    assert(v.select(HyperplaneBuckets.bucket($"v", Seq(Seq(1.0, -1.0)))).count() == 1)
  }
}

class DotProductExpressionSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.DotProduct

  test("native dot product ≡ HOF formulation bit-for-bit; null propagates") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5, -1.0, 2.0)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3, 0.2, 0.1)))
      .toDF("fv", "dv")
    val hof = df.select(
      aggregate(zip_with($"fv", $"dv", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d")).as[Double].collect()
    val native = df.select(DotProduct.dot($"fv", $"dv").as("d")).as[Double].collect()
    // bit-identical, not just approximately equal — the float policy
    // the oracle hash compare rests on
    assert(native.map(java.lang.Double.doubleToLongBits).toSeq ==
      hof.map(java.lang.Double.doubleToLongBits).toSeq)
    // null array → null result
    val withNull = Seq((null: Array[Float], Array(1.0))).toDF("fv", "dv")
    assert(withNull.select(DotProduct.dot($"fv", $"dv")).collect().head.isNullAt(0))
    // double×double and float×float also type-check
    assert(Seq((Array(2.0), Array(3.0))).toDF("a", "b")
      .select(DotProduct.dot($"a", $"b")).as[Double].head() == 6.0)
    // non-numeric arrays are rejected at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array("x"), Array(1.0))).toDF("a", "b")
        .select(DotProduct.dot($"a", $"b")).collect()
    }
  }
}
