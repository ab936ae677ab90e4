package graft

import org.apache.spark.sql.functions._

import graft.sketch.Sketches

/** The mergeable-summary contracts the q118-q122 gates rest on:
  * Count-Min never undercounts and merges by cell-wise sum, HLL
  * registers merge by max (so replay/duplication is free) and the
  * estimator lands inside the published envelope, Bloom has no false
  * negatives and merges by bit union. Collisions are FORCED here with
  * tiny shapes — the gates' 4×512 / p=8 / 3×16384 shapes barely
  * collide at sf0.01, so the error paths are pinned synthetically.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 2000 occurrences over 120 distinct items, Zipf-ish multiplicities
  private def corpus = (1 to 2000).map(i => s"item${i % 120}").toDF("item")

  test("CMS estimates never undercount, at ANY width (forced collisions)") {
    for (width <- Seq(8, 64, 2048)) {
      val sketch = Sketches.cmsTable(corpus, "item", depth = 4, width = width)
      val exact = corpus.groupBy($"item").agg(count(lit(1)).as("exact"))
      val est = Sketches.cmsEstimates(exact, "item", sketch, depth = 4, width = width)
      val bad = est.join(exact, "item").filter($"cms_est" < $"exact").count()
      assert(bad === 0L, s"width=$width undercounted")
      if (width == 2048) {
        // collision-free regime: the estimate IS the exact count
        val off = est.join(exact, "item").filter($"cms_est" =!= $"exact").count()
        assert(off === 0L)
      }
    }
  }

  test("CMS merges by cell-wise sum") {
    val a = corpus.filter(length($"item") % 2 === 0)
    val b = corpus.filter(length($"item") % 2 =!= 0)
    val merged = Sketches.cmsTable(a, "item", 4, 64)
      .unionByName(Sketches.cmsTable(b, "item", 4, 64))
      .groupBy($"sk_row", $"bucket").agg(sum($"cnt").as("cnt"))
    val whole = Sketches.cmsTable(corpus, "item", 4, 64)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("HLL registers merge by max and are duplication-insensitive") {
    val vals = (1 to 5000).map(i => s"v$i").toDF("item")
    val a = vals.filter(length($"item") <= 3)
    val b = vals.filter(length($"item") >= 3) // deliberate overlap
    val merged = Sketches.hllRegisters(a, "item")
      .unionByName(Sketches.hllRegisters(b, "item"))
      .groupBy($"idx").agg(max($"r").as("r"))
    val whole = Sketches.hllRegisters(vals, "item")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // replaying the whole corpus changes nothing (max is idempotent)
    val replayed = whole.unionByName(Sketches.hllRegisters(vals, "item"))
      .groupBy($"idx").agg(max($"r").as("r"))
    assert(replayed.exceptAll(whole).isEmpty)
  }

  test("HLL raw estimate lands inside the envelope; z_int is the full fold") {
    val vals = (1 to 5000).map(i => s"v$i").toDF("item")
    val reg = Sketches.hllRegisters(vals, "item")
    val row = Sketches.hllEstimate(reg).collect().head
    val est = row.getAs[Double]("est_raw")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"est=$est")
    // z_int equals the explicit fold over all 256 registers (absent → rank 0)
    val present = reg.as[(Long, Long)].collect().toMap
    val zManual = (0 until 256).map(i => 1L << (53 - present.getOrElse(i.toLong, 0L))).sum
    assert(row.getAs[Long]("z_int") === zManual)
    assert(row.getAs[Long]("zeros") === 256L - present.size)
  }

  test("HLL small-range: linear counting (the ln path the gate excludes) is sane") {
    val vals = (1 to 40).map(i => s"s$i").toDF("item")
    val row = Sketches.hllEstimate(Sketches.hllRegisters(vals, "item")).collect().head
    val zeros = row.getAs[Long]("zeros")
    assert(zeros > 0)
    val linear = 256.0 * math.log(256.0 / zeros)
    assert(math.abs(linear - 40.0) / 40.0 < 0.15, s"linear=$linear")
  }

  test("Bloom has no false negatives and merges by bit union") {
    val inserted = (1 to 300).map(i => s"doc$i").toDF("item")
    val bits = Sketches.bloomBits(inserted, "item", k = 3, mBits = 4096)
    val probe = inserted.withColumn("id", lit(1L))
    val r = Sketches.bloomProbe(probe, "id", "item", bits, k = 3, mBits = 4096)
      .collect().head
    assert(r.getAs[Long]("n_items") === 300L && r.getAs[Long]("n_hits") === 300L)
    // union merge: bits(A ∪ B) == distinct(bits(A) ∪ bits(B))
    val a = inserted.filter($"item".endsWith("1"))
    val b = inserted.filter(!$"item".endsWith("1"))
    val merged = Sketches.bloomBits(a, "item", 3, 4096)
      .unionByName(Sketches.bloomBits(b, "item", 3, 4096)).distinct()
    assert(merged.exceptAll(bits).isEmpty && bits.exceptAll(merged).isEmpty)
  }

  test("CMS inner product never undercounts; zero overlap estimates ≥ 0") {
    val a = (1 to 1000).map(i => s"a${i % 50}").toDF("item")
    val b = (1 to 800).map(i => s"${if (i % 2 == 0) "a" else "z"}${i % 50}").toDF("item")
    val sa = Sketches.cmsTable(a, "item", 4, 64)
    val sb = Sketches.cmsTable(b, "item", 4, 64)
    val est = Sketches.cmsInnerProduct(sa, sb).collect().head.getAs[Long]("cms_ip")
    val truth = a.groupBy($"item").agg(count(lit(1)).as("na"))
      .join(b.groupBy($"item").agg(count(lit(1)).as("nb")), "item")
      .agg(coalesce(sum($"na" * $"nb"), lit(0L)).as("t"))
      .collect().head.getAs[Long]("t")
    assert(truth > 0L && est >= truth, s"est=$est true=$truth")
    // disjoint corpora: the true inner product is 0; the estimate may
    // carry collision surplus but never goes negative
    val sc = Sketches.cmsTable((1 to 400).map(i => s"q$i").toDF("item"), "item", 4, 64)
    val sd = Sketches.cmsTable((1 to 400).map(i => s"r$i").toDF("item"), "item", 4, 64)
    assert(Sketches.cmsInnerProduct(sc, sd)
      .collect().head.getAs[Long]("cms_ip") >= 0L)
  }

  test("grouped HLL registers equal per-group hllRegisters run independently") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", s"v${i % (200 + (i % 3) * 100)}"))
      .toDF("grp", "item")
    val grouped = Sketches.hllRegistersByGroup(rows, "grp", "item")
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sketches.hllRegisters(rows.filter($"grp" === g).select($"item"), "item")
      val slice = grouped.filter($"grp" === g).select($"idx", $"r")
      assert(slice.exceptAll(solo).isEmpty && solo.exceptAll(slice).isEmpty, g)
    }
  }

  test("Bloom false-positive rate is bounded under the designed load") {
    val inserted = (1 to 300).map(i => s"doc$i").toDF("item")
    val bits = Sketches.bloomBits(inserted, "item", k = 3, mBits = 4096)
    val absent = (1 to 2000).map(i => s"other$i").toDF("item")
      .withColumn("id", lit(1L))
    val r = Sketches.bloomProbe(absent, "id", "item", bits, k = 3, mBits = 4096)
      .collect().head
    // load 300·3/4096 ≈ 0.22 set fraction → FP ≈ 0.22³ ≈ 1.1%; allow 3×
    assert(r.getAs[Long]("n_hits").toDouble / 2000.0 < 0.033,
      s"fp=${r.getAs[Long]("n_hits")}/2000")
  }
}
