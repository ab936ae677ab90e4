package graft

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame

/** In-session hash-stability stress for the q89 gate (the driver's only
  * repeat-red row in r07/r08, unreproducible in 9 judge runs): run the
  * exact `SparkEntry.queries("q89_soft_dedup_weights")` gate 20 times
  * inside one shared session, interleaved with other gates the way the
  * driver's 142-query sweep interleaves them, and assert the
  * bit-identical result hash every time. Doubles are hashed via
  * `doubleToLongBits`, so even a last-ulp drift between runs fails.
  *
  * Also pins the round-10 emission contract: the gate is ALL-LONG —
  * both ratio columns are scaled-integer e9 values from pure 64-bit
  * integer division (round(x,9) doubles proved DuckDB-version-
  * dependent in the driver's oracle; integer `div` is the only
  * cross-engine-pinned arithmetic).
  */
class SoftDedupStressSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Driver-shaped digest: columns sorted by name, rows in the gate's
    * own ORDER BY, doubles by exact bit pattern.
    */
  private def digest(df: DataFrame): String = {
    val cols = df.columns.sorted
    val md = MessageDigest.getInstance("MD5")
    df.select(cols.head, cols.tail: _*).collect().foreach { row =>
      cols.indices.foreach { i =>
        val cell = row.get(i) match {
          case d: java.lang.Double => java.lang.Double.doubleToLongBits(d).toString
          case f: java.lang.Float  => java.lang.Float.floatToIntBits(f).toString
          case v                   => String.valueOf(v)
        }
        md.update(cell.getBytes("UTF-8"))
        md.update(0.toByte)
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("q89 result hash is stable across 20 interleaved in-session runs") {
    val interleave = Seq("q11_exact_dedup_docs", "q17_minhash_lsh_pairs", "q81_normalized_dedup")
    val first = digest(run("q89_soft_dedup_weights"))
    (1 until 20).foreach { i =>
      // the driver's sweep shape: other corpus-wide gates run between
      // q89 evaluations in the same session (checkpoint blocks, shuffle
      // files and broadcast state accumulate exactly as in the sweep)
      run(interleave(i % interleave.size)).collect()
      val h = digest(run("q89_soft_dedup_weights"))
      assert(h == first, s"q89 hash drifted on in-session rep $i: $h != $first")
    }
  }

  test("q89 emitted ratios are exactly the e9 integer division of the integer columns") {
    import spark.implicits._
    val rows = run("q89_soft_dedup_weights")
      .select($"n_shingles".cast("long"), $"sum_df".cast("long"),
        $"commonness_e9", $"weight_e9")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, s, c, w) =>
      assert(c == s * 1000000000L / n, s"commonness_e9 mismatch (n=$n sum=$s): $c")
      assert(w == n * 1000000000L / s, s"weight_e9 mismatch (n=$n sum=$s): $w")
      // gate schema is all-LONG by construction: no float column exists
    }
    val types = run("q89_soft_dedup_weights").schema.fields.map(_.dataType.typeName).toSet
    assert(types == Set("long"), s"q89 must be all-LONG, got $types")
  }
}
