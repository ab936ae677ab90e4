package graft.plans

/** The `custom_id` grammar — the join key of the whole async exchange
  * (SURVEY.md §7.2 step 5; FIXTURES.md §5):
  *
  *  - `{etld1}>{field}>llm_search>chunk>{start}:{end}`
  *    (reference `extract_concept_deferred_service.py:582`)
  *  - `{etld1}>{field}>mapping`
  *    (reference `extract_concept_deferred_service.py:213-215`)
  *  - `{etld1}>{label}>chunk>{start}:{end}` for binary/address/desc
  *    (reference `deferred_binary_classifier.py:149`)
  *
  * The company key is recoverable as `custom_id.split(">")[0]`
  * (reference `batch_file_station.py:212`).
  */
sealed trait CustomId {
  def etld1: String
  def render: String
}

final case class SearchChunkId(etld1: String, fieldType: String, start: Int, end: Int)
    extends CustomId {
  def render = s"$etld1>$fieldType>llm_search>chunk>$start:$end"
}

final case class MappingId(etld1: String, fieldType: String) extends CustomId {
  def render = s"$etld1>$fieldType>mapping"
}

final case class SingleChunkId(etld1: String, label: String, start: Int, end: Int)
    extends CustomId {
  def render = s"$etld1>$label>chunk>$start:$end"
}

object CustomId {
  def etld1Of(customId: String): String = customId.split(">")(0)

  private val Search = """([^>]+)>([^>]+)>llm_search>chunk>(\d+):(\d+)""".r
  private val Mapped = """([^>]+)>([^>]+)>mapping""".r
  private val Single = """([^>]+)>([^>]+)>chunk>(\d+):(\d+)""".r

  def parse(s: String): Option[CustomId] = s match {
    case Search(e, f, a, b) => Some(SearchChunkId(e, f, a.toInt, b.toInt))
    case Mapped(e, f)       => Some(MappingId(e, f))
    case Single(e, l, a, b) => Some(SingleChunkId(e, l, a.toInt, b.toInt))
    case _                  => None
  }
}
