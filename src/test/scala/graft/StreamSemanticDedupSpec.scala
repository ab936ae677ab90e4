package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamSemanticDedup
import graft.vectors.Vectors

/** Streaming SemDeDup: batch-equality when arrival order IS the batch
  * sweep order, the sweep invariants under arbitrary arrival, the
  * maxPerCell cap's documented recall trade, and horizon eviction.
  */
class StreamSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    def dot(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  private def runStream(
      rows: Seq[Seq[(java.sql.Timestamp, Long, Seq[Double])]],
      centroids: org.apache.spark.sql.DataFrame,
      threshold: Double, maxPerCell: Int = 4096, horizon: String = "1 hour") = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Seq[Double])]
    val name = s"semdd_${System.nanoTime()}"
    val q = StreamSemanticDedup.semanticDedupStream(
        stream.toDS().toDF("event_ts", "vec_id", "embedding"),
        "vec_id", "embedding", "event_ts",
        centroids, "cid", "cv", threshold, horizon, maxPerCell)
      .writeStream.format("memory").queryName(name).start()
    rows.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    val got = spark.table(name)
      .as[(String, String, Double, Int)].collect().toSeq
    q.stop()
    got
  }

  test("arrival in the batch sweep order reproduces batch semanticDedup") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val codebook = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val batch = Vectors.semanticDedup(emb, "vec_id", "embedding",
        codebook, "cid", "cv", threshold = 0.4)
      .as[(Long, Long, Int, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    // the sweep order: (centroid_sim asc, id asc), made the arrival
    // order via strictly increasing event timestamps in one batch
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    // timestamps start PAST the initial zero watermark (a 0-ms event
    // is dropped as late before the state op sees it)
    val arrival = batch.toSeq.sortBy { case (id, (_, csim, _)) => (csim, id) }
      .zipWithIndex.map { case ((id, _), i) => (ts((i + 1).toLong * 1000), id, vecs(id)) }
    val got = runStream(Seq(arrival), codebook, threshold = 0.4)
      .map(r => r._1.toLong -> ((r._2.toLong, r._3, r._4))).toMap
    assert(got == batch)
    assert(got.values.exists(_._3 == 0), "fixture must contain real duplicates")
  }

  test("sweep invariants hold under shuffled arrival") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val codebook = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val rnd = new scala.util.Random(99)
    val shuffled = rnd.shuffle(vecs.toSeq)
      .zipWithIndex.map { case ((id, v), i) => (ts((i + 1).toLong * 1000), id, v) }
    val batches = shuffled.grouped(17).toSeq
    val got = runStream(batches, codebook, threshold = 0.4)
    val arrivalPos = shuffled.map(r => r._2.toString -> r._1.getTime).toMap
    val byId = vecs.map { case (id, v) => id.toString -> v }.toMap
    got.groupBy(_._2).foreach { case (_, cellRows) =>
      val kept = cellRows.filter(_._4 == 1)
      // no two keeps within threshold (if they were, the later one
      // would have been marked a duplicate of the earlier)
      for (a <- kept; b <- kept if a._1 < b._1)
        assert(round6(cos(byId(a._1), byId(b._1))) < 0.4,
          s"kept pair ${a._1},${b._1} within threshold")
      // every drop has an earlier-arrived member (keep OR drop — the
      // batch predicate) within threshold
      cellRows.filter(_._4 == 0).foreach { d =>
        val earlier = cellRows.filter(k => arrivalPos(k._1) < arrivalPos(d._1))
        assert(earlier.exists(k => round6(cos(byId(d._1), byId(k._1))) >= 0.4),
          s"drop ${d._1} has no earlier neighbor within threshold")
      }
    }
  }

  test("maxPerCell caps enrollment: novel rows still keep, later dups are missed") {
    val codebook = Seq((0L, Seq(1.0, 0.0, 0.0))).toDF("cid", "cv")
    val a = Seq(1.0, 0.0, 0.0)
    val b = Seq(0.0, 1.0, 0.0) // cos(a,b)=0 — novel
    val c = Seq(0.01, 1.0, 0.0) // near-dup of b, far from a
    val rows = Seq(Seq((ts(1000), 1L, a), (ts(2000), 2L, b), (ts(3000), 3L, c)))
    val capped = runStream(rows, codebook, threshold = 0.9, maxPerCell = 1)
      .map(r => r._1.toLong -> r._4).toMap
    assert(capped == Map(1L -> 1, 2L -> 1, 3L -> 1)) // c's dup of b missed
    val uncapped = runStream(rows, codebook, threshold = 0.9)
      .map(r => r._1.toLong -> r._4).toMap
    assert(uncapped == Map(1L -> 1, 2L -> 1, 3L -> 0)) // and caught uncapped
  }

  test("cell state survives a query restart from the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val codebook = Seq((0L, Seq(1.0, 0.0))).toDF("cid", "cv")
    val v = Seq(1.0, 0.1)
    val dir = java.nio.file.Files.createTempDirectory("semdd_cp").toString
    val stream = MemoryStream[(java.sql.Timestamp, Long, Seq[Double])]
    val out = StreamSemanticDedup.semanticDedupStream(
      stream.toDS().toDF("event_ts", "vec_id", "embedding"),
      "vec_id", "embedding", "event_ts", codebook, "cid", "cv", threshold = 0.9)
    val got = scala.collection.concurrent.TrieMap.empty[Long, Int]
    def start() = out.writeStream
      .option("checkpointLocation", dir)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamSemanticDedup.SemVerdict], _: Long) =>
          b.collect().foreach(r => got(r.id.toLong) = r.keep)
      }
      .start()
    val q1 = start()
    stream.addData((ts(1000), 1L, v)); q1.processAllAvailable(); q1.stop()
    // restart from the checkpoint: the cell's kept-member state must
    // come back from the state store, so the duplicate is caught by a
    // DIFFERENT query instance than the one that admitted the original
    val q2 = start()
    stream.addData((ts(2000), 2L, v)); q2.processAllAvailable(); q2.stop()
    assert(got.toMap == Map(1L -> 1, 2L -> 0))
  }

  test("horizon eviction re-admits a duplicate after the cell idles past the watermark") {
    val codebook = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "cv")
    val v = Seq(1.0, 0.1)
    val other = Seq(0.1, 1.0) // lands in the other cell, only advances the watermark
    val h = 3600L * 1000
    // eviction fires only on a batch where the cell has NO data and
    // the watermark has passed its timeout — hence the two
    // watermark-advancing batches in the other cell before the re-test
    val got = runStream(Seq(
        Seq((ts(1000), 1L, v)),
        Seq((ts(2000), 2L, v)), // within horizon: duplicate
        Seq((ts(3 * h), 10L, other)), // after this batch: watermark -> 2h
        Seq((ts(4 * h), 11L, other)), // cell-0 idle + timed out (1h past 2s): evicted
        Seq((ts(4 * h + 1000), 3L, v))), // state gone: re-admitted
      codebook, threshold = 0.9)
      .map(r => r._1.toLong -> r._4).toMap
    assert(got(1L) == 1 && got(2L) == 0 && got(3L) == 1)
  }
}
