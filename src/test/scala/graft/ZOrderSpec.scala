package graft

import org.apache.spark.sql.functions._

import graft.plans.{IncrementalAgg, ZOrder}

/** Z-order interleaving (q48) and incremental aggregate maintenance:
  * bit-exact interleave examples, the data-skipping locality the layout
  * exists for, and snapshot-fold == full-recompute.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: dim j at position i*d + j") {
    // x = 0b11, y = 0b01 -> z bits: pos0=x0=1, pos1=y0=1, pos2=x1=1,
    // pos3=y1=0 -> 0b0111 = 7
    val out = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq($"x", $"y"), bits = 4).as("z"))
      .as[Long].head()
    assert(out === 7L)
    // single dimension degenerates to the value itself
    val one = Seq(11L).toDF("x")
      .select(ZOrder.zValue(Seq($"x"), bits = 8).as("z")).as[Long].head()
    assert(one === 11L)
  }

  test("zValue quantizes modulo 2^bits") {
    val out = Seq((1L << 20) + 5L).toDF("x")
      .select(ZOrder.zValue(Seq($"x"), bits = 4).as("z")).as[Long].head()
    assert(out === 5L)
  }

  test("z-sorted buckets narrow min/max ranges in BOTH dimensions") {
    // 32x32 grid; 16 buckets of 64 rows each. Sorting by x alone leaves
    // each bucket spanning the full y range; z-order bounds both.
    val grid = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(Seq($"x", $"y"), bits = 5))
    def bucketSpans(ordCol: String): (Long, Long) = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(ordCol), $"x", $"y")
      val spans = df.withColumn("b", ((row_number().over(w) - 1) / 64).cast("int"))
        .groupBy($"b")
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .agg(sum($"sx").cast("long"), sum($"sy").cast("long"))
        .as[(Long, Long)].head()
      spans
    }
    val (zx, zy) = bucketSpans("z")
    val (xx, xy) = bucketSpans("x")
    assert(xx < zx)            // single-dim sort is perfect on its own dim...
    assert(xy === 31L * 16)    // ...but every bucket spans ALL of y
    assert(zy <= xy / 2)       // z-order bounds y too
    assert(zx <= 16L * 16)     // while staying bounded on x
  }

  test("incremental count/sum snapshot equals full recompute at any batch split") {
    val rows = (1 to 50).map(i => (s"k${i % 3}", i / 7.0))
    val full = rows.toDF("k", "v")
    val batches = rows.grouped(17).map(_.toDF("k", "v")).toSeq
    val folded = batches.tail.foldLeft(
        IncrementalAgg.countSumState(batches.head, Seq("k"), "v")) { (snap, b) =>
      IncrementalAgg.merge(snap, IncrementalAgg.countSumState(b, Seq("k"), "v"), Seq("k"))
    }
    val got = IncrementalAgg.finalize(folded, Seq("k"))
      .orderBy($"k").as[(String, Long, Double, Double)].collect().toSeq
    val want = IncrementalAgg.finalize(
        IncrementalAgg.countSumState(full, Seq("k"), "v"), Seq("k"))
      .orderBy($"k").as[(String, Long, Double, Double)].collect().toSeq
    assert(got === want)
  }
}
