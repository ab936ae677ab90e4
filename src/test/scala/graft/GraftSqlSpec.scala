package graft

class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions work end-to-end via spark.sql") {
    Graft.registerAll(spark)
    Seq(
      ("sub.Example.CO.UK", "reach a@b.com or A@B.COM", "```json\n[\"x\"]\n```"))
      .toDF("host", "body", "resp")
      .createOrReplaceTempView("graft_sql_spec")
    val row = spark.sql(
      """SELECT graft_etld1(host) AS e,
        |       graft_emails(body) AS m,
        |       graft_json_repair(resp) AS j,
        |       graft_token_count(body) AS n,
        |       graft_uri_strip('ISO 9001') AS u,
        |       graft_normalize_url('https://WWW.Example.COM/x') AS nu,
        |       graft_normalize_url('not a url') AS bad
        |FROM graft_sql_spec""".stripMargin).collect().head
    assert(row.getAs[String]("e") == "example.co.uk")
    // domain case normalized; local-part case preserved (reference
    // email_validator semantics), so both variants survive
    assert(row.getAs[scala.collection.Seq[String]]("m").toSeq == Seq("A@b.com", "a@b.com"))
    assert(row.getAs[String]("j") == """["x"]""")
    assert(row.getAs[Int]("n") > 0)
    assert(row.getAs[String]("u") == "ISO%209001")
    assert(row.getAs[String]("nu") == "https://www.example.com")
    assert(row.getAs[String]("bad") == null)
    // registerAll is the one-stop SQL surface: the native expressions
    // and the DedupKeyFuse optimizer rewrite install with it
    assert(spark.sql("SELECT graft_dedup_key('A, 12!') AS k")
      .collect().head.getString(0) == "a 0")
    assert(spark.experimental.extraOptimizations
      .contains(graft.plans.DedupKeyFuse))
  }

  test("simhash + shingles from SQL") {
    Graft.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_simhash('the quick brown fox jumps') AS h,
        |       graft_shingles('a b c d', 3) AS s""".stripMargin).collect().head
    assert(r.getAs[Long]("h") != 0L)
    assert(r.getAs[scala.collection.Seq[String]]("s").toSeq == Seq("a b c", "b c d"))
  }

  test("zvalue + deletion variants from SQL") {
    Graft.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_zvalue2(3, 1, 4) AS z,
        |       graft_deletion_variants('abc') AS v""".stripMargin).collect().head
    assert(r.getAs[Long]("z") == 7L) // matches ZOrder.zValue bit layout
    assert(r.getAs[scala.collection.Seq[String]]("v").toSet ==
      Set("abc", "bc", "ac", "ab"))
    // SQL twin agrees with the Column form used by q48
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val both = Seq((123L, 456L)).toDF("x", "y")
      .select(graft.plans.ZOrder.zValue(Seq(col("x"), col("y")), bits = 15).as("a"),
        expr("graft_zvalue2(x, y, 15)").as("b"))
      .as[(Long, Long)].head()
    assert(both._1 == both._2)
  }
}
