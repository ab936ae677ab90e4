package graft

import java.nio.file.Files

import graft.streaming.StreamHnswIndex
import graft.vectors.Vectors

/** Durable HNSW maintenance: the parquet-ledger session must search
  * EXACTLY like the batch index across a simulated process restart, a
  * replayed micro-batch, and ledger compaction.
  */
class DurableHnswIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val queries = emb.filter($"vec_id" < 8)
  private val P = 3

  private def newSession(path: String) = new StreamHnswIndex.DurableHnswIndexSession(
    spark, path, "vec_id", "embedding", dim = 64, planesPerLayer = Seq(P, P, P))

  private def searchSet(s: StreamHnswIndex.DurableHnswIndexSession) =
    s.search(queries, k = 3).as[(Long, Int, Long, Double)].collect().toSet

  test("restart + replay + compaction all preserve exact batch-search equality") {
    val path = Files.createTempDirectory("hnsw").toFile.getAbsolutePath
    val b0 = emb.filter($"vec_id" % 3 === 0)
    val b1 = emb.filter($"vec_id" % 3 === 1)
    val b2 = emb.filter($"vec_id" % 3 === 2)

    val a = newSession(path)
    a.ingest(b0, 0L)
    a.ingest(b1, 1L)
    // "restart": a fresh session object over the same path sees the
    // committed ledgers — no driver state survives
    val b = newSession(path)
    b.ingest(b2, 2L)

    val batch = Vectors.hnswTopK(emb, queries, "vec_id", "embedding",
        k = 3, dim = 64, planes = P)
      .as[(Long, Int, Long, Double)].collect().toSet
    val afterRestart = searchSet(b)
    assert(afterRestart == batch)
    assert(afterRestart.nonEmpty)

    // replay of the newest batch: identical directories, nothing grows
    val n0 = b.index.count()
    val e0 = b.edges(0).count()
    b.ingest(b2, 2L)
    assert(b.index.count() == n0)
    assert(b.edges(0).count() == e0)
    assert(searchSet(b) == batch)

    // compaction folds the ledgers; the newest-wins edge fold keys on
    // the in-row batch tag, so results cannot move
    b.compact()
    assert(searchSet(b) == batch)

    // and a session attached after compaction still ingests correctly
    val c = newSession(path)
    val qv = queries.orderBy($"vec_id").select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect().head
    c.ingest(Seq((999L, qv.updated(0, qv.head + 0.001))).toDF("vec_id", "embedding"), 3L)
    val hit = c.search(queries.limit(1), k = 3)
      .as[(Long, Int, Long, Double)].collect().find(_._2 == 1)
    assert(hit.map(_._3).contains(999L))
  }

  test("full redelivery of a known batch commits empty deltas") {
    val path = Files.createTempDirectory("hnsw").toFile.getAbsolutePath
    val s = newSession(path)
    val b0 = emb.filter($"vec_id" < 30)
    s.ingest(b0, 0L)
    val n0 = s.index.count()
    val e0 = s.edges(0).count()
    s.ingest(b0, 1L) // same content under a NEW batch id
    assert(s.index.count() == n0)
    assert(s.edges(0).count() == e0)
    assert(e0 > 0)
  }
}
