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
