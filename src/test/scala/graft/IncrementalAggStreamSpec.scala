package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.plans.IncrementalAgg

/** The streaming-materialized-view pattern: `foreachBatch` folds each
  * micro-batch's partial-aggregate state into a parquet snapshot via
  * [[IncrementalAgg.merge]] — the continuous-refresh rollup a 100 TB
  * pipeline serves dashboards from, without a stateful streaming
  * aggregation (whose store can't be read as a table) and without
  * rescanning history. The snapshot after N batches must equal a batch
  * recompute over everything — the same algebraic-fold guarantee the
  * batch spec pins, here across the streaming boundary.
  */
class IncrementalAggStreamSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch-maintained snapshot equals full recompute") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-incagg").toString
    val snapPath = s"$dir/snapshot"
    val stream = MemoryStream[(String, Double)]
    val q = stream.toDS().toDF("k", "v")
      .writeStream
      .option("checkpointLocation", s"$dir/cp")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = IncrementalAgg.countSumState(batch, Seq("k"), "v")
        val merged =
          if (new java.io.File(snapPath).exists) {
            val snap = batch.sparkSession.read.parquet(snapPath)
            IncrementalAgg.merge(snap, delta, Seq("k")).localCheckpoint()
          } else delta
        merged.write.mode("overwrite").parquet(snapPath)
      }
      .start()
    val all = (1 to 40).map(i => (s"k${i % 3}", i / 7.0))
    all.grouped(13).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = IncrementalAgg.finalize(spark.read.parquet(snapPath), Seq("k"))
      .orderBy($"k").as[(String, Long, Double, Double)].collect().toSeq
    val want = IncrementalAgg.finalize(
        IncrementalAgg.countSumState(all.toDF("k", "v"), Seq("k"), "v"), Seq("k"))
      .orderBy($"k").as[(String, Long, Double, Double)].collect().toSeq
    assert(got === want)
  }
}
