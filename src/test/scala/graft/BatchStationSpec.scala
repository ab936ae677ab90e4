package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.exchange.{BatchExchange, BatchStation}
import graft.exchange.BatchStation.{State, Status}

/** S7 — key cooldown accounting + batch status machine around
  * ship/collect (reference `api_key_bundle.py:54-80`,
  * `gpt_batch.py:7-23`, `batch_file_station.py:146-445`).
  */
class BatchStationSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = new Timestamp(1700000000000L)
  private def at(secs: Long) = new Timestamp(t0.getTime + secs * 1000L)

  private def keys(rows: (String, Int, Long, Timestamp)*): DataFrame =
    rows.toDF("label", "batch_queue_limit", "tokens_in_use", "available_at")

  private def emptyBatches: DataFrame =
    Seq.empty[(String, String, String, Long, Option[Timestamp])]
      .toDF("batch_id", "api_key_label", "status", "total_tokens",
        "processing_completed_at")

  private def ledger(ids: String*): DataFrame =
    ids.map(id => (id, s"""{"custom_id":"$id"}""", 10L, null: String, null: String))
      .toDF("custom_id", "body_json", "input_tokens", "batch_id", "response_json")

  /** Answers every custom_id except `lose`. */
  private class LocalApi(dir: String, lose: Set[String] = Set.empty)
      extends BatchExchange.BatchApi {
    private var submitted = Map.empty[String, Seq[String]]
    override def submit(requestFiles: Seq[String]): String = {
      val id = s"batch-${submitted.size}"
      submitted += id -> requestFiles
      id
    }
    override def results(batchId: String): Option[Seq[String]] = {
      val reqFiles = submitted(batchId)
      val outDir = Files.createDirectories(
        java.nio.file.Paths.get(s"$dir/results/$batchId")).toString
      val out = new java.io.PrintWriter(s"$outDir/out.jsonl")
      reqFiles.foreach { f =>
        val local = new java.io.File(new java.net.URI(f))
        scala.io.Source.fromFile(local).getLines().foreach { line =>
          val id = line.split("\"custom_id\":\"")(1).split("\"")(0)
          if (!lose.contains(id))
            out.println(s"""{"custom_id":"$id","response":{"status_code":200,"body":{"choices":[{"message":{"content":"ok"}}]}}}""")
        }
      }
      out.close()
      Some(Seq(s"$outDir/out.jsonl"))
    }
  }

  test("cooldown-blocked and busy keys cannot ship; available key ships") {
    val dir = Files.createTempDirectory("graft-station").toString
    val api = new LocalApi(dir)
    // k1 cooling down until t0+600, k2 has tokens in flight, k3 free
    val st = State(ledger("a>F>mapping", "b>F>mapping"), emptyBatches,
      keys(("k1", 100, 0L, at(600)), ("k2", 100, 50L, at(-1)), ("k3", 100, 0L, at(-1))))

    // before anything is available except k3 → ships on k3
    val (st2, Some(bid)) = BatchStation.shipIfAvailable(st, api, dir, t0): @unchecked
    val batchRow = st2.batches.collect().head
    assert(batchRow.getAs[String]("api_key_label") == "k3")
    assert(batchRow.getAs[String]("status") == Status.Validating)
    assert(batchRow.getAs[Long]("total_tokens") == 20L)
    // shipped tokens now in flight on k3
    assert(st2.keys.filter($"label" === "k3").select("tokens_in_use")
      .as[Long].head() == 20L)
    // every key now blocked (k1 cooldown, k2+k3 busy) → no second ship
    val (st3, none) = BatchStation.shipIfAvailable(st2, api, dir, t0)
    assert(none.isEmpty)
    // ledger rows carry the batch id
    assert(st3.ledger.filter($"batch_id" === bid).count() == 2)
  }

  test("batch_queue_limit caps one batch's token total") {
    val dir = Files.createTempDirectory("graft-station").toString
    val api = new LocalApi(dir)
    // rows are 10 tokens each; a 25-token quota ships exactly 2 of 3,
    // and the shipped set matches what was stamped (deterministic cut)
    val st = State(ledger("a", "b", "c"), emptyBatches,
      keys(("k1", 25, 0L, at(-1))))
    val (st2, Some(bid)) = BatchStation.shipIfAvailable(st, api, dir, t0): @unchecked
    assert(st2.ledger.filter($"batch_id" === bid).count() == 2)
    assert(st2.ledger.filter($"batch_id".isNull).count() == 1)
    assert(st2.keys.filter($"label" === "k1").select("tokens_in_use")
      .as[Long].head() == 20L)
  }

  test("completed batch: results ingested, lost ids reset, 10-min cooldown") {
    val dir = Files.createTempDirectory("graft-station").toString
    val api = new LocalApi(dir, lose = Set("b>F>mapping"))
    val st = State(ledger("a>F>mapping", "b>F>mapping"), emptyBatches,
      keys(("k1", 100, 0L, at(-1))))
    val (shipped, Some(bid)) = BatchStation.shipIfAvailable(st, api, dir, t0): @unchecked

    val synced = shipped.copy(
      batches = BatchStation.updateStatus(shipped.batches, bid, Status.Completed))
    val done = BatchStation.step(synced, api, at(100))

    val rows = done.ledger.select("custom_id", "batch_id", "response_json")
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows("a>F>mapping")._2.isDefined)                 // answered
    assert(rows("b>F>mapping") == (None, None))              // lost → reset for re-ship
    // our processing is recorded and the key got the 10-min cooldown
    assert(done.batches.filter($"processing_completed_at".isNotNull).count() == 1)
    val key = done.keys.collect().head
    assert(key.getAs[Long]("tokens_in_use") == 0L)
    assert(key.getAs[Timestamp]("available_at") ==
      at(100 + BatchStation.CooldownCompletedSecs))
    // a second step is a no-op (batch already processed)
    assert(BatchStation.step(done, api, at(200)).keys.collect().head
      .getAs[Timestamp]("available_at") == at(100 + BatchStation.CooldownCompletedSecs))
  }

  test("failed batch: requests unpaired, 30-min cooldown, tokens freed") {
    val dir = Files.createTempDirectory("graft-station").toString
    val api = new LocalApi(dir)
    val st = State(ledger("a", "b"), emptyBatches, keys(("k1", 100, 0L, at(-1))))
    val (shipped, Some(bid)) = BatchStation.shipIfAvailable(st, api, dir, t0): @unchecked

    for (failStatus <- Seq(Status.Failed, Status.Cancelling, Status.Cancelled)) {
      val synced = shipped.copy(
        batches = BatchStation.updateStatus(shipped.batches, bid, failStatus))
      val done = BatchStation.step(synced, api, at(100))
      // all requests released for re-ship, nothing answered
      assert(done.ledger.filter($"batch_id".isNull && $"response_json".isNull).count() == 2)
      val key = done.keys.collect().head
      assert(key.getAs[Long]("tokens_in_use") == 0L)
      assert(key.getAs[Timestamp]("available_at") ==
        at(100 + BatchStation.CooldownFailedSecs))
    }
  }

  test("in-flight statuses hold the key busy and change nothing") {
    val dir = Files.createTempDirectory("graft-station").toString
    val api = new LocalApi(dir)
    val st = State(ledger("a"), emptyBatches, keys(("k1", 100, 0L, at(-1))))
    val (shipped, Some(bid)) = BatchStation.shipIfAvailable(st, api, dir, t0): @unchecked
    for (flight <- Seq(Status.Validating, Status.InProgress, Status.Finalizing)) {
      val synced = shipped.copy(
        batches = BatchStation.updateStatus(shipped.batches, bid, flight))
      val done = BatchStation.step(synced, api, at(100))
      assert(done.ledger.filter($"response_json".isNotNull).count() == 0)
      assert(done.keys.collect().head.getAs[Long]("tokens_in_use") == 10L)
      assert(BatchStation.availableKeys(done.keys, at(101)).count() == 0)
    }
  }

  test("lifecycle drill: fail → re-ship → complete; collect is idempotent") {
    val dir = Files.createTempDirectory("graft-station").toString
    val api = new LocalApi(dir)
    val st0 = State(ledger("a>F>mapping", "b>F>mapping"), emptyBatches,
      keys(("k1", 1000, 0L, at(-1))))
    // ship #1, then the API fails the batch → requests unpaired,
    // key cooling 30 min
    val (st1, Some(b1)) = BatchStation.shipIfAvailable(st0, api, dir, t0): @unchecked
    val failed = BatchStation.step(
      st1.copy(batches = BatchStation.updateStatus(st1.batches, b1, Status.Failed)),
      api, at(60))
    assert(failed.ledger.filter($"batch_id".isNull).count() == 2)
    // during cooldown nothing ships; after it lapses the SAME rows ship
    // again under a new batch id
    val (same, none) = BatchStation.shipIfAvailable(failed, api, dir, at(120))
    assert(none.isEmpty)
    val afterCooldown = at(60 + BatchStation.CooldownFailedSecs + 1)
    val (st2, Some(b2)) = BatchStation.shipIfAvailable(same, api, dir,
      afterCooldown): @unchecked
    assert(b2 != b1)
    assert(st2.ledger.filter($"batch_id" === b2).count() == 2)
    // complete: both answered this time
    val done = BatchStation.step(
      st2.copy(batches = BatchStation.updateStatus(st2.batches, b2, Status.Completed)),
      api, at(7200))
    assert(done.ledger.filter($"response_json".isNotNull).count() == 2)
    assert(done.batches.filter($"processing_completed_at".isNull).count() == 0)
    // collect idempotency: re-ingesting the same batch's results changes
    // nothing (the restartability contract — a crashed run can re-collect)
    val again = BatchExchange.collect(done.ledger, api, b2)
    val l1 = done.ledger.orderBy("custom_id").collect().toSeq
    val l2 = again.orderBy("custom_id").collect().toSeq
    assert(l1 == l2)
  }

  test("cooldown guard: not applied when remaining cooldown exceeds 30 min") {
    val k = keys(("k1", 100, 0L, at(31 * 60))) // 31 min of cooldown pending
    val after = BatchStation.applyCooldown(k, "k1", t0, 600)
    assert(after.collect().head.getAs[Timestamp]("available_at") == at(31 * 60))
    // inside the guard window the cooldown does apply
    val k2 = keys(("k1", 100, 0L, at(29 * 60)))
    val after2 = BatchStation.applyCooldown(k2, "k1", t0, 600)
    assert(after2.collect().head.getAs[Timestamp]("available_at") == at(600))
  }
}
