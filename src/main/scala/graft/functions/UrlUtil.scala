package graft.functions

import com.google.common.net.InternetDomainName

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** T22 — URL normalization + eTLD+1 (reference
  * `core/src/core/utils/url_util.py:9-97`, behavior pinned by the
  * 1.2k-line case table in `core/tests/test_url_util.py`).
  *
  * The PSL lookup uses Guava's `InternetDomainName` (bundled public
  * suffix list) in place of Python's tldextract — same semantics:
  * registrable domain = domain + public suffix; hosts without a
  * recognized suffix (intranet names, IPs) pass through unchanged.
  *
  * Reachability probes (`get_complete_url_with_compatible_protocol`,
  * `get_final_landing_url`) are network side effects, out of engine
  * scope — the https→http fallback DECISION is modeled by
  * [[Reachability]] so tests can stub it.
  */
object UrlUtil {

  /** Strip scheme and path/port from a host-ish input (tldextract
    * tolerates full URLs and `host:port`).
    */
  private def cleanHost(raw: String): String = {
    var h = raw
    val schemeIdx = h.indexOf("://")
    if (schemeIdx >= 0) h = h.substring(schemeIdx + 3)
    val slash = h.indexOf('/')
    if (slash >= 0) h = h.substring(0, slash)
    // IPv6 literals keep their colons; a single :port suffix is dropped.
    if (h.count(_ == ':') == 1) {
      val i = h.indexOf(':')
      if (h.substring(i + 1).forall(_.isDigit)) h = h.substring(0, i)
    }
    h
  }

  /** eTLD+1 of a host: lowercased registrable domain, or the host
    * itself when no PSL suffix matches (localhost, IPs, intranet).
    */
  def etld1FromHost(host: String): String = {
    if (host == null || host.isEmpty) return host
    val cleaned = cleanHost(host)
    if (cleaned.isEmpty || cleaned.contains("::") || cleaned.count(_ == ':') > 1)
      return cleaned // IPv6 literal
    try {
      val idn = InternetDomainName.from(cleaned.toLowerCase(java.util.Locale.ROOT))
      if (idn.isPublicSuffix) idn.toString
      else if (idn.isUnderPublicSuffix) idn.topPrivateDomain().toString
      else cleaned // no recognized suffix: intranet name
    } catch {
      case _: IllegalArgumentException => cleaned // IPs, invalid names
      case _: IllegalStateException => cleaned
    }
  }

  /** Remove the scheme, keeping authority + path + query (reference
    * `strip_scheme`).
    */
  def stripScheme(url: String): String = {
    val schemeIdx = url.indexOf("://")
    if (schemeIdx < 0) return url
    url.substring(schemeIdx + 3)
  }

  /** Validate + normalize to `scheme://[sub.]domain.suffix` (lowercase,
    * no port/path/query/trailing dot). Returns (scheme, normalized).
    * Throws IllegalArgumentException exactly where the reference raises
    * ValueError.
    */
  def normalizeUrl(completeUrl: String): (String, String) = {
    require(completeUrl != null && completeUrl.trim.nonEmpty,
      "URL must be a non-empty string")
    val uri =
      try new java.net.URI(completeUrl)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"Invalid URL: $completeUrl", e)
      }
    val scheme = Option(uri.getScheme).map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse(
      throw new IllegalArgumentException("URL must start with http:// or https://"))
    require(scheme == "http" || scheme == "https",
      "URL must start with http:// or https://")
    val rawHost = Option(uri.getHost).getOrElse(
      throw new IllegalArgumentException("Invalid URL: no valid hostname found."))
    val hostname = rawHost.replaceAll("\\.+$", "").toLowerCase(java.util.Locale.ROOT)
    val idn =
      try InternetDomainName.from(hostname)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"Invalid URL: '$completeUrl' has no valid domain.", e)
      }
    if (idn.isPublicSuffix)
      throw new IllegalArgumentException(s"Invalid URL: '$completeUrl' has no valid domain.")
    if (!idn.isUnderPublicSuffix)
      throw new IllegalArgumentException(s"Invalid URL: '$completeUrl' has no valid suffix.")
    val registrable = idn.topPrivateDomain().toString
    val sub = hostname.stripSuffix(registrable).stripSuffix(".")
    val rebuilt =
      if (sub.nonEmpty) s"$scheme://$sub.$registrable"
      else s"$scheme://$registrable"
    (scheme, rebuilt)
  }

  /** External reachability decision (https preferred, http fallback) —
    * stubbed in tests, `mapPartitions` + bounded parallelism in a live
    * deployment.
    */
  trait Reachability extends Serializable {
    def isAccessible(url: String): Boolean
  }

  /** The https→http fallback policy over any Reachability impl
    * (reference `get_complete_url_with_compatible_protocol`).
    */
  def withCompatibleProtocol(url: String, probe: Reachability): String = {
    require(url != null && url.nonEmpty, "URL must be a non-empty string")
    val bare = stripScheme(url)
    val https = s"https://$bare"
    if (probe.isAccessible(https)) https
    else {
      val http = s"http://$bare"
      if (probe.isAccessible(http)) http
      else throw new IllegalArgumentException("Neither HTTPS nor HTTP accessible.")
    }
  }

  /** Column forms (null-safe: nulls pass through). */
  val etld1Udf = udf((h: String) => Option(h).map(etld1FromHost))
  def etld1Col(c: Column): Column = etld1Udf(c)

  val normalizeUdf = udf((u: String) =>
    Option(u).flatMap(s =>
      try Some(normalizeUrl(s)._2) catch { case _: IllegalArgumentException => None }))
  def normalizeCol(c: Column): Column = normalizeUdf(c)
}
