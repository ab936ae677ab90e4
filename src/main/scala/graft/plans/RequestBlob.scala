package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Request blob construction (FIXTURES.md §5; reference
  * `open_ai_key_app/src/open_ai_key_app/utils/batch_gpt_util.py:44-80`).
  *
  * One JSONL line per request:
  * {{{
  * {"custom_id":"<id>","body":{"model":"<m>",
  *   "messages":[{"role":"system","content":"<prompt>"},
  *               {"role":"user","content":"<chunk>"}],
  *   "max_tokens":<n>}}
  * }}}
  *
  * `input_tokens` is tracked as a ledger column but excluded from the
  * serialized line (reference `batch_jsonl_file_writer.py:96-101`).
  */
object RequestBlob {

  def bodyJson(
      customId: Column,
      model: String,
      systemPrompt: Column,
      userContent: Column,
      maxTokens: Int): Column =
    to_json(struct(
      customId.as("custom_id"),
      struct(
        lit(model).as("model"),
        array(
          struct(lit("system").as("role"), systemPrompt.as("content")),
          struct(lit("user").as("role"), userContent.as("content"))
        ).as("messages"),
        lit(maxTokens).as("max_tokens")
      ).as("body")))
}
