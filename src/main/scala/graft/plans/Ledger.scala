package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The request/response ledger — the engine's durable frontier across
  * the async LLM exchange (SURVEY.md §1.1 "Request/response ledger",
  * §7.1 `llm_requests`; reference `GPTBatchRequest`,
  * `core/src/core/models/db/gpt_batch_request.py:10-47`).
  *
  * Columns: `custom_id` (unique key), `etld1`, `field_type`, `kind`,
  * `body_json`, `input_tokens`, `batch_id` (null = not yet shipped),
  * `response_json` (null = not yet answered).
  *
  * Everything here is an idempotent keyed MERGE shape (SURVEY.md §7.5
  * risk 2): the 24-hour gap between planning and reconcile means every
  * operation must be restartable from the tables alone. At 100 TB the
  * ledger is a Delta table and these become `MERGE INTO`; the DataFrame
  * formulations below are the exact join shapes that MERGE plans to.
  */
object Ledger {

  /** T23 frontier — requests that should exist but don't:
    * `expected LEFT ANTI JOIN ledger ON custom_id`. This anti-join IS
    * the incremental planner: re-running it after a partial failure
    * creates only the missing work (reference
    * `extraction_node.py:103-127`, `deferred_manufacturer_service.py:88-180`).
    */
  def missingRequests(expected: DataFrame, ledger: DataFrame): DataFrame =
    expected.join(ledger.select("custom_id"), Seq("custom_id"), "left_anti")

  /** T23 pending gate — expected requests not yet answered. An empty
    * result means the field can reconcile (reference
    * "are_all_requests_complete").
    */
  def incompleteRequests(expected: DataFrame, ledger: DataFrame): DataFrame =
    expected.join(
      ledger.filter(col("response_json").isNotNull).select("custom_id"),
      Seq("custom_id"), "left_anti")

  /** T31 upsert-only-request-bodies — insert new request rows, never
    * clobbering existing rows (their `response_json` may already be
    * populated): `WHEN NOT MATCHED INSERT` (reference
    * `gpt_batch_request_service.py:183-205`).
    */
  def upsertRequests(ledger: DataFrame, newRows: DataFrame): DataFrame =
    ledger.unionByName(
      newRows.join(ledger.select("custom_id"), Seq("custom_id"), "left_anti"),
      allowMissingColumns = true)

  /** Unshipped rows eligible for packing (reference
    * `batch_file_generator.py:135-146`: `batch_id == null`).
    */
  def pendingForShipment(ledger: DataFrame): DataFrame =
    ledger.filter(col("batch_id").isNull && col("response_json").isNull)

  /** S8 result ingest — attach response blobs by `custom_id`
    * (`MERGE ... WHEN MATCHED UPDATE`, reference
    * `batch_file_station.py:218-261`). Response rows: (custom_id,
    * response_json).
    */
  def ingestResponses(ledger: DataFrame, responses: DataFrame): DataFrame = {
    // one response per key: a duplicated result line (API retry,
    // re-collected batch) must not multiply ledger rows through the join
    val resp = responses
      .groupBy(col("custom_id"))
      .agg(org.apache.spark.sql.functions.min(col("response_json")).as("__new_response"))
    ledger.join(resp, Seq("custom_id"), "left")
      .withColumn("response_json",
        coalesce(col("__new_response"), col("response_json")))
      .drop("__new_response")
  }

  /** S8 missing-result reset — rows shipped in `batchId` that came back
    * unanswered get `batch_id := null` so the next planning pass
    * re-ships them (reference `batch_file_station.py:240-252`).
    */
  def resetMissing(ledger: DataFrame, batchId: String, returnedIds: DataFrame): DataFrame = {
    val returned = returnedIds.select(col("custom_id")).distinct()
      .withColumn("__returned", lit(true))
    ledger.join(returned, Seq("custom_id"), "left")
      .withColumn("batch_id",
        when(col("batch_id") === batchId &&
             col("__returned").isNull && col("response_json").isNull, lit(null))
          .otherwise(col("batch_id")))
      .drop("__returned")
  }

  /** Extract the message content from an OpenAI-batch-shaped response
    * blob (FIXTURES.md §5 result line).
    */
  def responseContent(responseJson: Column): Column =
    get_json_object(responseJson, "$.response.body.choices[0].message.content")

  // ---- T27 skip-if-present intake parity ---------------------------------
  // Reference `manufacturer_extraction_orchestrator.py:59-78`: a mfg that
  // already has data for a field sets deferred.<field> = None and
  // bulk-deletes that (mfg, field)'s batch requests; after all fields the
  // deferred row is deleted when every tracked field is None
  // (`deferred_manufacturer_service.py:49-85`). `present` rows:
  // (etld1, field_type) pairs the mfg already has.

  /** Null the deferred columns named in `fields` for (etld1, field) pairs
    * in `present` — `MERGE ... WHEN MATCHED UPDATE SET field = null`.
    */
  def nullPresentFields(deferred: DataFrame, present: DataFrame,
      fields: Seq[String]): DataFrame = {
    val flags = present.groupBy(col("etld1"))
      .agg(collect_set(col("field_type")).as("__present"))
    val outCols = deferred.columns.map { c =>
      if (fields.contains(c))
        when(array_contains(col("__present"), c), lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }
    deferred.join(flags, Seq("etld1"), "left")
      .select(outCols.toIndexedSeq: _*)
  }

  /** Bulk-delete ledger requests for (etld1, field_type) pairs the mfg
    * already has — `DELETE WHERE (etld1, field_type) IN present`, i.e. a
    * left anti join (reference
    * `gpt_batch_request_service.py` bulk_delete_..._by_mfg_etld1_and_field).
    */
  def deletePresentRequests(ledger: DataFrame, present: DataFrame): DataFrame =
    ledger.join(present.select(col("etld1"), col("field_type")),
      Seq("etld1", "field_type"), "left_anti")

  /** Drop deferred rows whose tracked fields are ALL null (reference
    * `is_deferred_manufacturer_empty` + delete,
    * `deferred_manufacturer_service.py:49-85`).
    */
  def deleteEmptyDeferred(deferred: DataFrame, fields: Seq[String]): DataFrame =
    deferred.filter(fields.map(col(_).isNotNull)
      .reduceOption(_ || _).getOrElse(lit(false)))
}
