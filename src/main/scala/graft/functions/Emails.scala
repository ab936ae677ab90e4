package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T16 — email extraction + validation (reference
  * `data_etl_app/src/data_etl_app/utils/find_email_addresses.py:10-31`).
  *
  * Extraction: the reference's candidate regex
  * `\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,63}\b`, run as
  * `regexp_extract_all` (codegen'd) — never a UDF on the scan path.
  *
  * Validation: the reference calls a DNS-resolving validator — an
  * external service from the engine's perspective, so it sits behind
  * [[EmailValidator]]: the default [[SyntacticValidator]] applies the
  * deterministic normalization subset (deliverability DNS checks go in
  * a `mapPartitions` stage with a real resolver in deployment).
  */
object Emails {

  val CandidatePattern = """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,63}"""

  trait EmailValidator extends Serializable {
    /** Normalized form, or None when invalid. */
    def validate(email: String): Option[String]
  }

  /** Deterministic syntax + normalization: exactly one `@`; local part
    * nonempty, no leading/trailing/double dots; domain labels valid;
    * domain lowercased (the normalization email_validator applies).
    */
  object SyntacticValidator extends EmailValidator {
    private val DomainLabel = "^[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?$".r
    override def validate(email: String): Option[String] = {
      val at = email.indexOf('@')
      if (at <= 0 || at != email.lastIndexOf('@') || at == email.length - 1) return None
      val (local, domain) = (email.substring(0, at), email.substring(at + 1).toLowerCase(java.util.Locale.ROOT))
      if (local.startsWith(".") || local.endsWith(".") || local.contains("..")) return None
      val labels = domain.split('.')
      if (labels.length < 2) return None
      if (!labels.forall(l => l.nonEmpty && DomainLabel.matches(l))) return None
      if (!labels.last.forall(_.isLetter) || labels.last.length < 2) return None
      Some(s"$local@$domain")
    }
  }

  /** Unique validated emails from one text (parity surface with the
    * reference function; returns sorted for deterministic arrays).
    */
  def validatedEmails(text: String,
      validator: EmailValidator = SyntacticValidator): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val m = java.util.regex.Pattern
      .compile("\\b" + CandidatePattern + "\\b").matcher(text)
    val out = scala.collection.mutable.SortedSet.empty[String]
    while (m.find()) validator.validate(m.group()).foreach(out += _)
    out.toSeq
  }

  /** Column form: `emails(text)` as a sorted distinct array. Candidate
    * extraction stays in codegen; only the validator (tiny input set)
    * is a UDF.
    */
  def emailsCol(text: Column,
      validator: EmailValidator = SyntacticValidator): Column = {
    val v = validator
    val validateUdf = udf((cands: Seq[String]) =>
      Option(cands).getOrElse(Nil).flatMap(v.validate).distinct.sorted)
    validateUdf(regexp_extract_all(text, lit("\\b" + CandidatePattern + "\\b"), lit(0)))
  }

  /** Per-row extraction over a corpus: adds `email_addresses`. */
  def extract(df: DataFrame, textCol: String,
      validator: EmailValidator = SyntacticValidator): DataFrame =
    df.withColumn("email_addresses", emailsCol(col(textCol), validator))
}
