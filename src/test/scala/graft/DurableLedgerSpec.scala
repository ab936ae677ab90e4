package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.streaming.DurableLedger

/** DurableLedger compaction: fold batch directories into a segment
  * without changing load() semantics — row identity, replay safety
  * for the newest batch, and tolerance of the swap-but-no-GC crash
  * window.
  */
class DurableLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("tag", StringType)))

  private def tmp(): String =
    Files.createTempDirectory("ledger").toFile.getAbsolutePath

  private def rows(path: String, exclude: Option[Long] = None): Set[(Long, String)] =
    DurableLedger.load(spark, path, schema, exclude)
      .as[(Long, String)].collect().toSet

  private def commitBatch(path: String, id: Long, n: Int): Set[(Long, String)] = {
    val data = (0 until n).map(i => (id * 100 + i, s"b$id-$i"))
    DurableLedger.commit(data.toDF("id", "tag"), path, id)
    data.toSet
  }

  test("compact folds all but the newest batch; load() is row-identical") {
    val path = tmp()
    val all = (0L to 3L).flatMap(i => commitBatch(path, i, 3)).toSet
    assert(rows(path) == all)
    val folded = DurableLedger.compact(spark, path, schema)
    assert(folded == 3, "b0..b2 fold, b3 (newest) must survive")
    assert(rows(path) == all)
    assert(DurableLedger.batches(path) == Seq(3L), "only the newest id is live")
  }

  test("second compaction folds the previous segment plus new batches") {
    val path = tmp()
    val first = (0L to 2L).flatMap(i => commitBatch(path, i, 2)).toSet
    DurableLedger.compact(spark, path, schema)
    val second = (3L to 5L).flatMap(i => commitBatch(path, i, 2)).toSet
    assert(DurableLedger.compact(spark, path, schema) == 3)
    assert(rows(path) == first ++ second)
    assert(DurableLedger.batches(path) == Seq(5L))
    // nothing new to fold → no-op, no manifest churn
    assert(DurableLedger.compact(spark, path, schema) == 0)
    assert(rows(path) == first ++ second)
  }

  test("replay of the newest batch after compaction stays exactly-once") {
    val path = tmp()
    val old = (0L to 2L).flatMap(i => commitBatch(path, i, 2)).toSet
    val last = commitBatch(path, 3L, 2)
    DurableLedger.compact(spark, path, schema)
    // a replay of batch 3 reads the ledger EXCLUDING its own directory:
    // it must see exactly the folded rows, then its recommit overwrites
    // only its own directory
    assert(rows(path, exclude = Some(3L)) == old)
    val replayed = commitBatch(path, 3L, 2) // deterministic rewrite
    assert(replayed == last)
    assert(rows(path) == old ++ last)
  }

  test("crash window: a folded batch directory left behind by GC is ignored") {
    val path = tmp()
    val all = (0L to 2L).flatMap(i => commitBatch(path, i, 2)).toSet
    DurableLedger.compact(spark, path, schema) // folds b0, b1
    // simulate an incomplete GC: b1's directory reappears with its old
    // rows — load must NOT double-count it (manifest says ≤1 is folded)
    Seq((100L, "b1-0"), (101L, "b1-1")).toDF("id", "tag")
      .write.mode("overwrite").parquet(s"$path/b1")
    assert(rows(path) == all)
    assert(DurableLedger.batches(path) == Seq(2L))
  }

  test("maybeCompact folds only at the interval and keeps contents") {
    val path = tmp()
    var all = Set.empty[(Long, String)]
    (0L to 6L).foreach { i =>
      all ++= commitBatch(path, i, 2)
      DurableLedger.maybeCompact(spark, path, schema, every = 3)
      assert(rows(path) == all, s"after batch $i")
      // live directories stay bounded by the interval
      assert(DurableLedger.batches(path).size <= 3, s"after batch $i")
    }
  }

  test("GC is one-epoch deferred: just-folded material survives one interval") {
    val path = tmp()
    var all = (0L to 2L).flatMap(i => commitBatch(path, i, 2)).toSet
    DurableLedger.compact(spark, path, schema) // epoch 1: folds b0, b1
    // just-folded dirs stay on disk — an in-flight job whose plan listed
    // files under the pre-compact manifest may still be scanning them
    assert(new java.io.File(s"$path/b0").isDirectory)
    assert(new java.io.File(s"$path/b1").isDirectory)
    all ++= (3L to 4L).flatMap(i => commitBatch(path, i, 2)).toSet
    DurableLedger.compact(spark, path, schema) // epoch 2: reclaims b0, b1
    assert(!new java.io.File(s"$path/b0").exists())
    assert(!new java.io.File(s"$path/b1").exists())
    // the superseded segment gets the same one-epoch grace
    assert(new java.io.File(s"$path/s1").isDirectory)
    all ++= (5L to 6L).flatMap(i => commitBatch(path, i, 2)).toSet
    DurableLedger.compact(spark, path, schema) // epoch 3: reclaims s1, b2, b3
    assert(!new java.io.File(s"$path/s1").exists())
    assert(!new java.io.File(s"$path/b2").exists())
    assert(rows(path) == all, "contents identical through every epoch")
  }

  test("a malformed manifest degrades to the empty manifest, not a crash") {
    val path = tmp()
    val all = (0L to 1L).flatMap(i => commitBatch(path, i, 2)).toSet
    Files.writeString(new java.io.File(path, "manifest").toPath, "garbage")
    assert(rows(path) == all, "falls back to unioning the live batch dirs")
    assert(DurableLedger.batches(path) == Seq(0L, 1L))
  }

  test("two interleaved compactors: one folds, the other aborts cleanly, no rows lost") {
    val path = tmp()
    val all = (0L to 5L).flatMap(i => commitBatch(path, i, 2)).toSet
    // force true interleaving: both threads release a shared gate, then
    // race into compact(); the lock serializes them — outcomes are
    // either (winner folds, loser -1) or (winner folds, loser no-op 0)
    val gate = new java.util.concurrent.CountDownLatch(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        gate.countDown(); gate.await()
        try results.add(DurableLedger.compact(spark, path, schema))
        catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"a compactor threw: ${errors.peek()}")
    val rs = results.toArray(Array.empty[Integer]).map(_.toInt).sorted
    assert(rs.count(_ == 5) == 1, s"exactly one fold of b0..b4 must land: ${rs.toSeq}")
    assert(rs.forall(r => r == 5 || r == 0 || r == -1), s"unclean outcome: ${rs.toSeq}")
    assert(rows(path) == all, "no batch silently dropped by the race")
    assert(DurableLedger.batches(path) == Seq(5L))
  }

  test("a held compaction lock makes compact abort with -1 and touch nothing") {
    val path = tmp()
    val all = (0L to 3L).flatMap(i => commitBatch(path, i, 2)).toSet
    val ch = java.nio.channels.FileChannel.open(
      new java.io.File(path, "manifest.lock").toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.lock()
    try {
      assert(DurableLedger.compact(spark, path, schema) == -1)
      assert(rows(path) == all)
      assert(DurableLedger.batches(path) == Seq(0L, 1L, 2L, 3L), "nothing folded")
    } finally { lock.release(); ch.close() }
    // lock released (as the OS does when a holder dies) → fold proceeds
    assert(DurableLedger.compact(spark, path, schema) == 3)
    assert(rows(path) == all)
  }

  test("a leftover manifest.lock FILE from a dead compactor does not brick the ledger") {
    val path = tmp()
    val all = (0L to 2L).flatMap(i => commitBatch(path, i, 2)).toSet
    // a crashed holder leaves the file but the OS dropped its lock
    Files.writeString(new java.io.File(path, "manifest.lock").toPath, "stale")
    assert(DurableLedger.compact(spark, path, schema) == 2)
    assert(rows(path) == all)
  }

  test("kill mid-compact before the manifest swap: orphan segment is ignored then reused") {
    val path = tmp()
    val all = (0L to 2L).flatMap(i => commitBatch(path, i, 2)).toSet
    // simulate a compactor that died AFTER writing the epoch-1 segment
    // but BEFORE the manifest swap: segment dir exists, manifest absent
    Seq((999L, "orphan")).toDF("id", "tag")
      .write.mode("overwrite").parquet(s"$path/s1")
    assert(rows(path) == all, "readers never scan a segment the manifest doesn't name")
    assert(DurableLedger.batches(path) == Seq(0L, 1L, 2L))
    // the next attempt reuses the epoch-1 name (overwrite) and lands
    assert(DurableLedger.compact(spark, path, schema) == 2)
    assert(rows(path) == all, "orphan rows must not leak into the fold")
    assert(DurableLedger.batches(path) == Seq(2L))
  }

  test("empty and single-batch ledgers are no-ops") {
    val path = tmp()
    assert(DurableLedger.compact(spark, path, schema) == 0)
    val only = commitBatch(path, 0L, 2)
    assert(DurableLedger.compact(spark, path, schema) == 0)
    assert(rows(path) == only)
  }

  test("time travel: loadAt answers any point at or above the fold horizon") {
    val path = tmp()
    val perBatch = (0L to 4L).map(i => i -> commitBatch(path, i, 2)).toMap
    // every historical point answers exactly its prefix
    (0L to 4L).foreach { t =>
      val expect = (0L to t).flatMap(perBatch).toSet
      val got = DurableLedger.loadAt(spark, path, schema, t)
        .as[(Long, String)].collect().toSet
      assert(got == expect, s"as of $t")
    }
    // compaction folds b0..b3: travel to the horizon and above works,
    // below throws (per-batch granularity is gone — the VACUUM trade)
    assert(DurableLedger.compact(spark, path, schema) == 4)
    val atHorizon = DurableLedger.loadAt(spark, path, schema, 3L)
      .as[(Long, String)].collect().toSet
    assert(atHorizon == (0L to 3L).flatMap(perBatch).toSet)
    assert(DurableLedger.loadAt(spark, path, schema, 4L)
      .as[(Long, String)].collect().toSet == (0L to 4L).flatMap(perBatch).toSet)
    intercept[IllegalArgumentException] {
      DurableLedger.loadAt(spark, path, schema, 2L)
    }
  }

  test("schema evolution: widened reads fill old batches with null") {
    val path = tmp()
    // epoch 1 of the pipeline writes (id, tag); epoch 2 adds a column
    DurableLedger.commit(Seq((1L, "a")).toDF("id", "tag"), path, 0L)
    DurableLedger.commit(
      Seq((2L, "b", 9L)).toDF("id", "tag", "score"), path, 1L)
    val widened = org.apache.spark.sql.types.StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType))
    val got = DurableLedger.load(spark, path, widened)
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got == Set((1L, "a", None), (2L, "b", Some(9L))),
      "old batches read the new column as null; new batches carry it")
    // the fold preserves the widened contents
    DurableLedger.commit(Seq((3L, "c", 7L)).toDF("id", "tag", "score"), path, 2L)
    assert(DurableLedger.compact(spark, path, widened) == 2)
    val afterFold = DurableLedger.load(spark, path, widened)
      .as[(Long, String, Option[Long])].collect().toSet
    assert(afterFold == Set((1L, "a", None), (2L, "b", Some(9L)), (3L, "c", Some(7L))))
  }

  test("OCC commit: two writers racing the SAME batch id — one publishes, no mix") {
    val path = tmp()
    // deliberately DIFFERENT rows per writer (violating the
    // deterministic-derivation contract) so the winner is observable:
    // the ledger must hold exactly one writer's rows, never a blend
    val a = (0 until 4).map(i => (100L + i, s"writer-a-$i"))
    val b = (0 until 4).map(i => (200L + i, s"writer-b-$i"))
    // a start gate so both writers pass the exists-check before either
    // publishes — the tightest interleaving the rename must resolve
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val futs = Seq(a, b).map { data =>
      Future { gate.await(); DurableLedger.commit(data.toDF("id", "tag"), path, 0L) }
    }
    gate.countDown()
    val outcomes = futs.map(Await.result(_, 180.seconds))
    assert(outcomes.count(identity) == 1,
      s"exactly one writer must publish, got $outcomes")
    val got = rows(path)
    assert(got == a.toSet || got == b.toSet,
      s"ledger must hold one writer's rows intact, got $got")
    // losers' and winners' temps are both gone on the clean path
    val leftovers = new java.io.File(path).listFiles()
      .filter(_.getName.contains(".tmp.")).toSeq
    assert(leftovers.isEmpty, s"no temp dirs may linger: $leftovers")
  }

  test("OCC commit: replay of a published batch aborts clean and keeps contents") {
    val path = tmp()
    val first = (0 until 3).map(i => (i.toLong, s"v1-$i"))
    assert(DurableLedger.commit(first.toDF("id", "tag"), path, 0L))
    // a replay (same id) publishes nothing and cannot clobber
    val again = (0 until 3).map(i => (i.toLong, s"v2-$i"))
    assert(!DurableLedger.commit(again.toDF("id", "tag"), path, 0L))
    assert(rows(path) == first.toSet, "first writer's rows are immutable")
  }

  test("OCC commit: a crashed loser's temp directory is invisible and swept") {
    val path = tmp()
    val all = (0L to 2L).flatMap(i => commitBatch(path, i, 2)).toSet
    // simulate a writer that died mid-write of batch 1: temp on disk
    Seq((999L, "ghost")).toDF("id", "tag")
      .write.parquet(s"$path/b1.tmp.12345-67890")
    assert(rows(path) == all, "temps never load")
    assert(DurableLedger.batches(path) == Seq(0L, 1L, 2L), "temps are not batches")
    // fold b0..b1; the dead temp's batch is now ≤ compactedUpTo ...
    assert(DurableLedger.compact(spark, path, schema) == 2)
    assert(rows(path) == all)
    // ... so the NEXT compact (one-epoch-deferred GC) sweeps it
    commitBatch(path, 3L, 2)
    DurableLedger.compact(spark, path, schema)
    val ghost = new java.io.File(path).listFiles()
      .filter(_.getName.contains(".tmp.")).toSeq
    assert(ghost.isEmpty, s"dead temp must be swept by compaction GC: $ghost")
  }

  // ---- per-directory stats + loadWhere data skipping ----------------

  private def commitWithStats(path: String, id: Long): Set[(Long, String)] = {
    // batch i holds ids [i*100, i*100+2] and tags "bi-*": disjoint
    // ranges per batch, so range predicates can prove non-overlap
    val data = (0 until 3).map(i => (id * 100 + i, s"b$id-$i"))
    DurableLedger.commit(data.toDF("id", "tag"), path, id,
      statsCols = Seq("id", "tag"))
    data.toSet
  }

  private def dirsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).toSet

  test("loadWhere prunes non-overlapping batch directories, results identical") {
    val path = tmp()
    val all = (0L to 3L).flatMap(commitWithStats(path, _)).toSet
    // range fully inside batch 2 → exactly one directory survives
    val pruned = DurableLedger.loadWhere(spark, path, schema,
      Seq(DurableLedger.Bound("id", lo = Some(200L), hi = Some(250L))))
    assert(dirsOf(pruned).size == 1, s"expected 1 dir: ${dirsOf(pruned)}")
    assert(pruned.as[(Long, String)].collect().toSet ==
      all.filter(r => r._1 >= 200 && r._1 <= 250))
    // filtered result ≡ unpruned load + filter (pruning is a superset)
    val full = DurableLedger.load(spark, path, schema)
      .where($"id" >= 200 && $"id" <= 250).as[(Long, String)].collect().toSet
    assert(pruned.where($"id" >= 200 && $"id" <= 250)
      .as[(Long, String)].collect().toSet == full)
    // no overlap anywhere → empty frame, zero directories
    val none = DurableLedger.loadWhere(spark, path, schema,
      Seq(DurableLedger.Bound("id", lo = Some(9999L))))
    assert(none.count() == 0L && none.inputFiles.isEmpty)
    // string bounds prune too (UTF-8 order)
    val s = DurableLedger.loadWhere(spark, path, schema,
      Seq(DurableLedger.Bound("tag", lo = Some("b3"), hi = Some("b3￿"))))
    assert(dirsOf(s).size == 1)
  }

  test("loadWhere without stats keeps every directory (conservative)") {
    val path = tmp()
    val all = (0L to 2L).flatMap(i => commitBatch(path, i, 3)).toSet // no stats
    val df = DurableLedger.loadWhere(spark, path, schema,
      Seq(DurableLedger.Bound("id", lo = Some(10000L))))
    assert(df.as[(Long, String)].collect().toSet == all,
      "stats-less directories must never be pruned")
    // unknown column bound: same conservative answer
    val df2 = DurableLedger.loadWhere(spark, path, schema,
      Seq(DurableLedger.Bound("nope", lo = Some(1L))))
    assert(df2.count() == all.size.toLong)
  }

  test("compaction folds stats: the segment still prunes, results identical") {
    val path = tmp()
    val all = (0L to 3L).flatMap(commitWithStats(path, _)).toSet
    assert(DurableLedger.compact(spark, path, schema) == 3)
    // segment covers ids [0, 202]; batch 3 is live with [300, 302]
    val onlyLive = DurableLedger.loadWhere(spark, path, schema,
      Seq(DurableLedger.Bound("id", lo = Some(300L))))
    assert(dirsOf(onlyLive).size == 1, "segment must be pruned for id>=300")
    assert(onlyLive.as[(Long, String)].collect().toSet ==
      all.filter(_._1 >= 300))
    val onlySeg = DurableLedger.loadWhere(spark, path, schema,
      Seq(DurableLedger.Bound("id", hi = Some(150L))))
    assert(dirsOf(onlySeg).size == 1, "live batch must be pruned for id<=150")
    assert(onlySeg.as[(Long, String)].collect().toSet ==
      all.filter(_._1 <= 202), "segment rows are a superset of the range")
  }

  test("a stats-less source poisons the folded segment's stats, not its rows") {
    val path = tmp()
    commitWithStats(path, 0L)
    commitBatch(path, 1L, 3) // no stats
    commitWithStats(path, 2L)
    assert(DurableLedger.compact(spark, path, schema) == 2)
    // segment has no stats → never pruned; contents complete
    val df = DurableLedger.loadWhere(spark, path, schema,
      Seq(DurableLedger.Bound("id", lo = Some(5000L))))
    assert(df.count() == 6L, "stats-poisoned segment must always load")
    assert(rows(path).size == 9)
  }

  test("mismatched bound type fails loudly instead of scanning everything") {
    val path = tmp()
    commitWithStats(path, 0L)
    val ex = intercept[IllegalArgumentException] {
      DurableLedger.loadWhere(spark, path, schema,
        Seq(DurableLedger.Bound("id", lo = Some("not-a-number")))).count()
    }
    assert(ex.getMessage.contains("integral"))
  }
}
