package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{BpeishTokenizer, Emails, JsonRepair, UrlUtil}
import graft.textops.NearDup

/** SQL-facing registration: makes the engine's scalar functions
  * callable from `spark.sql` (and thus from any BI/SQL client attached
  * to the session). DataFrame users call the Column forms directly;
  * this is the parity surface for SQL-first users.
  *
  * {{{
  * graft.Graft.registerAll(spark)
  * spark.sql("SELECT graft_etld1(host), graft_emails(body) FROM corpus")
  * }}}
  *
  * Also delegates to [[GraftExtensions.install]] so one call gives the
  * FULL SQL surface: the native Catalyst expressions
  * (`graft_vocab_match`, `graft_dedup_key`) and the
  * [[graft.plans.DedupKeyFuse]] optimizer rewrite — a SQL-first user
  * who authors the documented dedup-key regex chain gets the fused
  * single-scan plan without knowing the native expression exists.
  * (Sessions built with `spark.sql.extensions=graft.GraftExtensions`
  * already have those; the install is idempotent.)
  */
object Graft {
  def registerAll(spark: SparkSession): Unit = {
    GraftExtensions.install(spark)
    spark.udf.register("graft_etld1",
      (h: String) => Option(h).map(UrlUtil.etld1FromHost).orNull)
    spark.udf.register("graft_normalize_url",
      (u: String) => Option(u).flatMap(s =>
        try Some(UrlUtil.normalizeUrl(s)._2)
        catch { case _: IllegalArgumentException => None }).orNull)
    spark.udf.register("graft_json_repair",
      (s: String) => JsonRepair.repair(s))
    spark.udf.register("graft_emails",
      (t: String) => Emails.validatedEmails(t))
    spark.udf.register("graft_token_count",
      (t: String) => Option(t).map(BpeishTokenizer.count).getOrElse(0))
    spark.udf.register("graft_simhash",
      (t: String) => Option(t).map(NearDup.simhash(_, 3)).getOrElse(0L))
    spark.udf.register("graft_shingles",
      (t: String, n: Int) => Option(t).map(NearDup.wordShingles(_, n)).getOrElse(Vector.empty))
    spark.udf.register("graft_uri_strip",
      (v: String) => Option(v).map(graft.emit.Triples.uriStrip).orNull)
    // Morton/Z-order key of two non-negative dims (see plans.ZOrder):
    // the clustering value `OPTIMIZE ZORDER BY`-style layouts sort by
    spark.udf.register("graft_zvalue2",
      (x: Long, y: Long, bits: Int) => {
        // same bound the Column form enforces — past it the 2*i shift
        // would wrap mod 64 and silently corrupt low bits
        require(bits > 0 && bits * 2 <= 63, s"bits*2 must fit a signed long: $bits")
        var z = 0L
        var i = 0
        while (i < bits) {
          z |= ((x >> i) & 1L) << (2 * i)
          z |= ((y >> i) & 1L) << (2 * i + 1)
          i += 1
        }
        z
      })
    spark.udf.register("graft_deletion_variants",
      (s: String) => Option(s)
        .map(graft.functions.DeletionVariants.neighborhood)
        .getOrElse(IndexedSeq.empty))
  }
}
