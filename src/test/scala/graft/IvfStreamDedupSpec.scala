package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamDedup
import graft.vectors.Vectors

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivfTopK: deterministic, well-formed, recall beats hyperplane LSH here") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Vectors.ivfTopK(emb, queries, "vec_id", "embedding", 3,
      nCentroids = 8, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect()
    // shape: ≤3 per query, contiguous ranks, no self-matches
    val byQ = ivf.groupBy(_._1)
    assert(byQ.size == 8)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      rs.foreach { case (_, _, n) => assert(n != q) }
    }
    val ivfPairs = ivf.map(r => (r._1, r._3)).toSet
    val recall = ivfPairs.intersect(brute).size.toDouble / brute.size
    info(f"IVF recall@3 = $recall%.2f (probing 4/8 cells)")
    assert(recall >= 0.5, s"recall=$recall") // probing half the cells
    // determinism
    val again = Vectors.ivfTopK(emb, queries, "vec_id", "embedding", 3,
      nCentroids = 8, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect()
    assert(again.toSet == ivf.toSet)
  }

  test("ivfTopK with the distributed kmeans|| fit: well-formed and at " +
       "least sample-fit recall") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(fit: String) = Vectors
      .ivfTopK(emb, queries, "vec_id", "embedding", 3,
        nCentroids = 8, nProbe = 4, fit = fit)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      .intersect(brute).size.toDouble / brute.size
    val par = recallOf("parallel")
    info(f"kmeans|| IVF recall@3 = $par%.2f (probing 4/8 cells)")
    // the every-row fit must not be materially worse than the 10k
    // sample fit on data the sample already covers fully
    assert(par >= recallOf("sample") - 0.15, s"parallel-fit recall $par")
    assert(par >= 0.5)
  }

  test("ivfTopK with nProbe = nCentroids equals brute force") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(200)
    val queries = emb.filter($"vec_id" < 4)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val ivf = Vectors.ivfTopK(emb, queries, "vec_id", "embedding", 3,
      nCentroids = 4, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == brute)
  }

  test("adversarial one-cell codebook: sub-cell split bounds key groups, output unchanged") {
    // every row lands in THE one cell (nCentroids = 1) — the hostile
    // shape that degenerated pre-fix SemDeDup; with maxCellSize the
    // cell splits into md5(id) sub-cells, queries probe all of them,
    // and the result must still be EXACTLY brute force
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(200)
    val queries = emb.filter($"vec_id" < 4)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    for (mcs <- Seq(1L, 16L, 1L << 16)) {
      val ivf = Vectors.ivfTopK(emb, queries, "vec_id", "embedding", 3,
        nCentroids = 1, nProbe = 1, maxCellSize = mcs)
        .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
      assert(ivf == brute, s"maxCellSize=$mcs diverged")
    }
    // same contract for the SQ8 variant against an explicit one-row
    // codebook (integer distances, so exact equality across splits)
    val cs = Array(Array.fill(64)(0.1))
    def sq(mcs: Long) = Vectors.ivfSqTopKWith(emb, queries, "vec_id",
        "embedding", k = 3, dim = 64, cs = cs, nProbe = 1, maxCellSize = mcs)
      .select("query_id", "rnk", "neighbor_id", "qdist")
      .as[(Long, Int, Long, Long)].collect().toSet
    val ref = sq(1L << 16)
    assert(ref.nonEmpty)
    assert(sq(8L) == ref)
    assert(sq(1L) == ref)
  }

  test("pqTopK: deterministic, exact re-ranked scores, decent recall at 32x compression") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    val pq = Vectors.pqTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect()
    // shape: ≤3 per query, contiguous ranks, no self-matches
    pq.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      rs.foreach { case (_, _, n, _) => assert(n != q) }
    }
    // re-ranked scores are the EXACT cosine: every (q, n) pq shares
    // with brute carries the identical rounded value
    val bruteScore = brute.map(r => (r._1, r._2) -> r._3).toMap
    pq.foreach { case (q, _, n, cos) =>
      bruteScore.get((q, n)).foreach(b => assert(b === cos)) }
    val recall = pq.map(r => (r._1, r._3)).toSet
      .intersect(brute.map(r => (r._1, r._2)).toSet).size.toDouble / brute.length
    info(f"PQ recall@3 = $recall%.2f (m=8, ksub=256, shortlist 8k)")
    assert(recall >= 0.6, s"recall=$recall")
    val again = Vectors.pqTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect()
    assert(again.toSet == pq.toSet)
  }

  test("pqAdcTopKWith: every-vector-its-own-centroid degenerates to sqTopK exactly") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter($"vec_id" < 64) // codebook cap is 256; keep the fixture snappy
    val queries = emb.filter($"vec_id" < 8)
    val centers = emb.orderBy($"vec_id")
      .select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    // with the full corpus as codebook each vector encodes to itself,
    // so ADC distance IS the exact SQ8 code distance — rankings and
    // integer scores must match sqTopK bit-for-bit
    val pq = Vectors.pqAdcTopKWith(emb, queries, "vec_id", "embedding",
        k = 3, dim = 64, m = 8, centers)
      .as[(Long, Int, Long, Long)].collect().toSet
    val sq = Vectors.sqTopK(emb, queries, "vec_id", "embedding", k = 3, dim = 64)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(pq == sq)
  }

  test("pqAdcTopKWith: fixture codebook is deterministic and keeps decent recall") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val centers = emb.filter($"vec_id" < 16).orderBy($"vec_id")
      .select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    val pq = Vectors.pqAdcTopKWith(emb, queries, "vec_id", "embedding",
        k = 3, dim = 64, m = 8, centers)
      .as[(Long, Int, Long, Long)].collect()
    val byQ = pq.groupBy(_._1)
    assert(byQ.size == 8)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      rs.foreach { case (_, _, n, _) => assert(n != q) }
    }
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = pq.map(r => (r._1, r._3)).toSet.intersect(brute).size.toDouble /
      brute.size
    info(f"PQ-ADC recall@3 = $recall%.2f (ksub=16, m=8)")
    val again = Vectors.pqAdcTopKWith(emb, queries, "vec_id", "embedding",
        k = 3, dim = 64, m = 8, centers)
      .as[(Long, Int, Long, Long)].collect()
    assert(again.toSet == pq.toSet)
  }

  test("ivfPqAdcTopKWith: full probe equals pqAdcTopKWith exactly") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val cells = emb.filter($"vec_id" < 8).orderBy($"vec_id")
      .select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    val pqCenters = emb.filter($"vec_id" < 4).orderBy($"vec_id")
      .select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    val full = Vectors.ivfPqAdcTopKWith(emb, queries, "vec_id", "embedding",
        k = 3, dim = 64, m = 8, cells, pqCenters, nProbe = cells.length)
      .as[(Long, Int, Long, Long)].collect().toSet
    val pq = Vectors.pqAdcTopKWith(emb, queries, "vec_id", "embedding",
        k = 3, dim = 64, m = 8, pqCenters)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(full == pq, "probing every cell must reduce to plain PQ-ADC")
    // partial probe: well-formed, deterministic
    val part = Vectors.ivfPqAdcTopKWith(emb, queries, "vec_id", "embedding",
        k = 3, dim = 64, m = 8, cells, pqCenters, nProbe = 3)
      .as[(Long, Int, Long, Long)].collect()
    assert(part.groupBy(_._1).size == 8)
    part.foreach { case (q, _, n, _) => assert(q != n) }
  }

  test("ivfPqTopK: full probe equals pqTopK; partial probe keeps decent recall") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val pq = Vectors.pqTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    // probing every cell scores the full corpus with the SAME codebooks
    // -> identical shortlist -> identical output
    val full = Vectors.ivfPqTopK(emb, queries, "vec_id", "embedding", 3,
        nCentroids = 8, nProbe = 8)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == pq)
    val brute = Vectors.bruteTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val half = Vectors.ivfPqTopK(emb, queries, "vec_id", "embedding", 3,
        nCentroids = 8, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect()
    val recall = half.map(r => (r._1, r._3)).toSet.intersect(brute).size.toDouble / brute.size
    info(f"IVF-PQ recall@3 = $recall%.2f (probing 4/8 cells, 8-byte codes)")
    assert(recall >= 0.5, s"recall=$recall")
  }
}

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  // offset well past epoch 0: a row whose event time equals the initial
  // watermark (epoch 0) is considered late and silently dropped
  private def ts(s: Long) = new java.sql.Timestamp((1700000000L + s) * 1000)

  test("streaming dedup keeps first occurrence within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = stream.toDS().toDF("ts", "doc_id", "text")
    val deduped = StreamDedup.dedupStream(df, "text", "ts", horizon = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1
    stream.addData((ts(0), 1L, "alpha content"), (ts(10), 2L, "beta content"))
    q.processAllAvailable()
    // batch 2: doc 3 duplicates doc 1's content across batches → dropped
    stream.addData((ts(20), 3L, "alpha content"), (ts(30), 4L, "gamma content"))
    q.processAllAvailable()
    val ids = spark.sql("SELECT doc_id FROM dedup_out").as[Long].collect().sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 4L))
  }

  test("streaming near-dup emits banded candidates within and across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = stream.toDS().toDF("ts", "doc_id", "text")
    val near = "the quick brown fox jumps over the lazy dog again and again today"
    val far = "completely unrelated text about industrial anodizing processes here"
    val cands = StreamDedup.nearDupStream(df, "doc_id", "text", "ts",
      horizon = "10 minutes")
    val q = cands.writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: docs 1+2 identical (every band collides), doc 3 unrelated
    stream.addData((ts(0), 1L, near), (ts(5), 2L, near), (ts(10), 3L, far))
    q.processAllAvailable()
    // batch 2: doc 4 near-dups batch-1 docs ACROSS the batch boundary
    // (bucket state retained); doc 5 unrelated
    stream.addData((ts(60), 4L, near + " extra"), (ts(65), 5L, "other thing entirely"))
    q.processAllAvailable()
    // batch 3: advance the watermark far past the horizon (evicts the
    // old buckets), then batch 4: doc 6 repeats the near text but must
    // NOT pair with the expired docs
    stream.addData((ts(3000), 7L, "watermark advancer text"))
    q.processAllAvailable()
    stream.addData((ts(3010), 6L, near))
    q.processAllAvailable()
    val out = spark.sql("SELECT id_a, id_b, max(est_jaccard) FROM neardup_out GROUP BY 1,2")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    q.stop()
    assert(out.contains((1L, 2L)) && out((1L, 2L)) == 1.0) // identical docs
    assert(out.contains((1L, 4L)) && out.contains((2L, 4L))) // cross-batch
    assert(out((1L, 4L)) > 0.5)
    // the unrelated docs never became candidates with anything
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L || a == 5L || b == 5L })
    // horizon eviction: doc 6's identical text pairs with NOBODY — the
    // matching buckets expired with the watermark
    assert(!out.keys.exists { case (a, b) => a == 6L || b == 6L })
  }
  test("near-dup bucket state survives a query restart from the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("neardup_cp").toString
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val near = "the quick brown fox jumps over the lazy dog again and again today"
    val cands = StreamDedup.nearDupStream(
      stream.toDS().toDF("ts", "doc_id", "text"), "doc_id", "text", "ts",
      horizon = "10 minutes")
    val got = scala.collection.concurrent.TrieMap.empty[(Long, Long), Double]
    def start() = cands.writeStream
      .option("checkpointLocation", dir)
      .outputMode(OutputMode.Append())
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamDedup.NearDupCandidate], _: Long) =>
          b.collect().foreach(c => got((c.id_a, c.id_b)) = c.est_jaccard)
      }
      .start()
    val q1 = start()
    stream.addData((ts(0), 1L, near)); q1.processAllAvailable(); q1.stop()
    // the near-dup arrives at a FRESH query instance: the candidate
    // pair only forms if doc 1's banded signatures came back from the
    // state store
    val q2 = start()
    stream.addData((ts(30), 2L, near + " extra")); q2.processAllAvailable(); q2.stop()
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) > 0.5)
  }
}
