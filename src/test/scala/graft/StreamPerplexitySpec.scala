package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamPerplexity
import graft.textops.CurationOps

/** Streaming CCNet buckets: exact scoring mirror vs the batch
  * operator, batch-equal labels except exact boundary score-tie
  * groups (the documented divergence), OOV max-surprisal convention,
  * and the mergeable unigram state.
  */
class StreamPerplexitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    .select($"doc_id", $"text")

  private lazy val stats = StreamPerplexity.fitReference(docs, "doc_id", "text")

  private lazy val batch =
    CurationOps.perplexityBuckets(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"mean_bits", $"bucket")
      .as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private def streamLabels(nBatches: Int): Map[Long, (Long, Double, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val rows = docs.as[(Long, String)].collect().toSeq
    val rnd = new scala.util.Random(7)
    val batches = rows.groupBy(_ => rnd.nextInt(nBatches)).values.toSeq
    val stream = MemoryStream[(Long, String)]
    val name = s"ppl_${System.nanoTime()}"
    val q = StreamPerplexity.bucketStream(
        stream.toDS().toDF("doc_id", "text"), stats, "doc_id", "text")
      .writeStream.format("memory").queryName(name).start()
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    val got = spark.table(name)
      .as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    q.stop()
    got
  }

  test("scoring mirror is exact and labels are batch-equal off boundaries") {
    val got = streamLabels(nBatches = 4)
    assert(got.keySet == batch.keySet)
    got.foreach { case (id, (n, bits, _)) =>
      assert((n, bits) == ((batch(id)._1, batch(id)._2)),
        s"doc $id scored ($n, $bits) vs batch ${(batch(id)._1, batch(id)._2)}")
    }
    val mismatched = got.filter { case (id, (_, _, b)) => b != batch(id)._3 }
    // the only permitted divergence: a score-tie group exactly ON a
    // cumulative-mass boundary, which the batch splits by doc id
    mismatched.foreach { case (id, (_, bits, b)) =>
      assert(bits == stats.headMax || bits == stats.middleMax,
        s"doc $id diverged ($b vs ${batch(id)._3}) off-boundary (bits=$bits)")
    }
    info(s"${mismatched.size} boundary-tie divergences of ${got.size} docs")
    assert(Set("head", "middle", "tail").subsetOf(got.values.map(_._3).toSet))
  }

  test("labels are independent of the micro-batch split") {
    assert(streamLabels(nBatches = 1) == streamLabels(nBatches = 5))
  }

  test("unseen terms take the reference's maximum integer surprisal") {
    val novel = Seq((1L, "zzzqx wwvvk")).toDF("doc_id", "text")
    val got = StreamPerplexity.bucketStream(novel, stats, "doc_id", "text")
      .select($"mean_bits").as[Double].collect().head
    val maxBits = 64 - java.lang.Long.numberOfLeadingZeros(stats.total)
    assert(got == maxBits.toDouble)
  }

  test("mergeFreqs over any split equals the full-corpus counts") {
    val rows = docs.as[(Long, String)].collect().toSeq
    val (a, b) = rows.splitAt(rows.size / 3)
    def freqsOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.as[(String, Long)].collect().toMap
    val empty = Seq.empty[(String, Long)].toDF("term", "cnt")
    val merged = StreamPerplexity.mergeFreqs(
      StreamPerplexity.mergeFreqs(empty, a.toDF("doc_id", "text"), "text"),
      b.toDF("doc_id", "text"), "text")
    val full = StreamPerplexity.mergeFreqs(empty, docs, "text")
    assert(freqsOf(merged) == freqsOf(full))
    assert(freqsOf(full) == stats.freqs)
  }
}
