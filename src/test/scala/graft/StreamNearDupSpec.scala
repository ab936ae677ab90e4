package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.graph.ConnectedComponents
import graft.streaming.StreamNearDup
import graft.textops.NearDup

/** Streaming MinHash near-dup admission: single-batch equality with
  * the batch composition (q17 ∘ q35), cross-batch first-arrival-wins,
  * chain semantics (dropped docs don't knock out later arrivals),
  * redelivery, and the no-verified-pair-among-kept invariant.
  */
class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  // the q35 gate's parameters
  private val N = 3
  private val B = 16
  private val R = 4
  private val Tau = 0.5

  private def runBatches(batches: Seq[Seq[(Long, String)]],
      threshold: Double = Tau)
      : (Seq[Map[Long, (String, Option[Long])]], StreamNearDup.NearDupSession) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val session = new StreamNearDup.NearDupSession(
      spark, "doc_id", "text", N, B, R, threshold)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Map[Long, (String, Option[Long])]]
    val q = session.start(stream.toDS().toDF("doc_id", "text")) { (out, _) =>
      val rows = out.as[(Long, String, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      if (rows.nonEmpty) emitted += rows
    }
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    (emitted.toSeq, session)
  }

  private def batchClusters(df: DataFrame): Map[Long, Long] =
    ConnectedComponents.dedupClusters(
        NearDup.minhashLshPairs(df, "doc_id", "text", N, B, R, Tau),
        "id_a", "id_b")
      .filter($"keep" === 0)
      .select($"doc_id".cast("long"), $"cluster_id".cast("long"))
      .as[(Long, Long)].collect().toMap

  test("a single batch against an empty ledger equals dedupClusters ∘ minhashLshPairs") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val (emitted, _) = runBatches(Seq(docs))
    assert(emitted.size == 1)
    val expectedDups = batchClusters(docs.toDF("doc_id", "text"))
    assert(expectedDups.nonEmpty, "fixture must contain near-dup clusters")
    val got = emitted.head
    assert(got.size == docs.size)
    // every batch duplicate maps to its component canonical; everything
    // else is kept with no partner
    for ((id, (status, partner)) <- got) {
      if (expectedDups.contains(id)) {
        assert(status == "dup_batch" && partner == Some(expectedDups(id)),
          s"doc $id: got ($status, $partner), want dup_batch of ${expectedDups(id)}")
      } else {
        assert(status == "kept" && partner.isEmpty, s"doc $id: got ($status, $partner)")
      }
    }
  }

  // w1..w13 word chains: X = w1..w10, Y = w2..w11, Z = w3..w12.
  // 3-shingle Jaccard: X~Y = 7/9 ≈ 0.78, Y~Z ≈ 0.78, X~Z = 6/10 = 0.6
  // — at threshold 0.7, adjacent pairs match, the X-Z hop does not.
  private def words(lo: Int, hi: Int) = (lo to hi).map(i => s"w$i").mkString(" ")

  test("first arrival wins; a dropped doc does not knock out later arrivals") {
    val x = words(1, 10); val y = words(2, 11); val z = words(3, 12)
    val other = "zulu yankee xray whiskey victor uniform tango sierra"
    val (emitted, _) = runBatches(
      Seq(Seq(1L -> x, 50L -> other), Seq(2L -> y), Seq(3L -> z)),
      threshold = 0.7)
    val Seq(o1, o2, o3) = emitted
    assert(o1(1L) == ("kept", None) && o1(50L) == ("kept", None))
    // Y duplicates admitted X
    assert(o2(2L) == ("dup_ledger", Some(1L)))
    // Z is similar only to Y — which was NOT admitted — and clears X
    assert(o3(3L) == ("kept", None))
  }

  test("redelivery drops everything and grows nothing") {
    val x = words(1, 10); val other = "alpha bravo charlie delta echo foxtrot"
    val b1 = Seq(1L -> x, 2L -> other)
    val (emitted, session) = runBatches(Seq(b1, b1), threshold = 0.7)
    val Seq(o1, o2) = emitted
    assert(o1.values.forall(_._1 == "kept"))
    assert(o2(1L) == ("already_admitted", None))
    assert(o2(2L) == ("already_admitted", None))
    // ledger holds exactly the two admitted docs' rows — replay grew nothing
    assert(session.ledger.bands.select("id").distinct().count() == 2L)
    val bandRows = session.ledger.bands.count()
    val shRows = session.ledger.shingles.count()
    val (_, session2) = runBatches(Seq(b1), threshold = 0.7)
    assert(session2.ledger.bands.count() == bandRows)
    assert(session2.ledger.shingles.count() == shRows)
  }

  test("under any batching the kept set carries no verified pair") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val (byThree, _) = runBatches(docs.grouped((docs.size + 2) / 3).toSeq)
    val kept = byThree.flatMap(_.collect { case (id, ("kept", _)) => id }).toSet
    assert(kept.nonEmpty)
    val keptDocs = docs.filter(d => kept(d._1)).toDF("doc_id", "text")
    assert(NearDup.minhashLshPairs(keptDocs, "doc_id", "text", N, B, R, Tau)
      .count() == 0L, "admitted set must contain no verified near-dup pair")
    // and every doc got exactly one verdict across the batches
    assert(byThree.map(_.size).sum == docs.size)
  }
}
