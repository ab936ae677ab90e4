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

  /** RFC 3986 §6 syntax-based canonicalization for absolute http(s)
    * URLs — the frontier-dedup key ([[normalizeUrl]] is the
    * reference's HOST-level normalize; this one makes two spellings
    * of the same resource collide):
    *
    *  - scheme and host lowercase, trailing host dot stripped;
    *  - default ports dropped (`:80` http, `:443` https; empty `:`
    *    too), others kept;
    *  - fragment dropped (never sent to the server);
    *  - percent-encodings normalized per §2.3/§6.2.2.2: octets that
    *    decode to UNRESERVED chars (`A–Z a–z 0–9 - . _ ~`) decode,
    *    everything else keeps `%` + UPPERCASE hex (reserved octets
    *    like `%2F` must NOT decode — that changes meaning);
    *  - dot-segments removed by the §5.2.4 stack walk (`.` skipped,
    *    `..` pops, never above root; a trailing `.`/`..` keeps the
    *    trailing slash);
    *  - empty path becomes `/`.
    *
    * Inputs that are not absolute http(s) URLs return unchanged
    * (trimmed) — a canonicalizer must never throw mid-frontier.
    * Hand-rolled (no `java.net.URI`, whose normalization rejects the
    * hostile inputs a crawl sees and resolves `..` differently at
    * root) and deterministic.
    */
  def canonicalUrl(raw: String): String = {
    if (raw == null) return null
    val u = raw.trim
    val si = u.indexOf("://")
    if (si <= 0) return u
    val scheme = u.substring(0, si).toLowerCase(java.util.Locale.ROOT)
    if (scheme != "http" && scheme != "https") return u
    val rest = u.substring(si + 3)
    val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case i => i
    }
    val auth = rest.substring(0, authEnd)
    val afterAuth = rest.substring(authEnd)
    // authority normalization applies only to WELL-FORMED authorities
    // (a colon-free host or one bracketed IPv6 block, plus an optional
    // NUMERIC port); anything else is kept verbatim, case-folded only.
    // Trying to "fix" garbage authorities is a fuzzer-proven
    // idempotence trap: each pass re-splits at a different colon.
    val AuthRe = "^(\\[[^\\]]*\\]|[^:\\[\\]]*)(?::([0-9]*))?$".r
    val defaultPort = if (scheme == "http") "80" else "443"
    val hostPort = auth match {
      case AuthRe(h, p) =>
        val host = h.toLowerCase(java.util.Locale.ROOT).replaceAll("\\.+$", "")
        val port =
          if (p == null || p.isEmpty || p == defaultPort) "" else ":" + p
        host + port
      case _ => auth.toLowerCase(java.util.Locale.ROOT)
    }
    // split off fragment, then query
    val hashAt = afterAuth.indexOf('#')
    val noFrag = if (hashAt < 0) afterAuth else afterAuth.substring(0, hashAt)
    val qAt = noFrag.indexOf('?')
    val (path0, query) =
      if (qAt < 0) (noFrag, "") else (noFrag.substring(0, qAt), noFrag.substring(qAt))
    def pctNormalize(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
          val v = Character.digit(s.charAt(i + 1), 16) * 16 +
            Character.digit(s.charAt(i + 2), 16)
          val ch = v.toChar
          if (ch.isLetterOrDigit && ch < 128 || "-._~".indexOf(ch) >= 0)
            sb.append(ch)
          else {
            sb.append('%')
            sb.append(Character.toUpperCase(s.charAt(i + 1)))
            sb.append(Character.toUpperCase(s.charAt(i + 2)))
          }
          i += 3
        } else if (c <= ' ' || c == 0x7f || c > 0x7f) {
          // whitespace/control/non-ASCII chars are illegal in a URI —
          // a canonicalizer percent-encodes them (UTF-8 octets), which
          // is also what keeps the function idempotent: a raw space
          // surviving into the output would be trimmed by the next
          // pass's input trim (fuzzer-found)
          String.valueOf(c).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .foreach(b => sb.append(f"%%${b & 0xff}%02X")) // '%' + 2 hex
          i += 1
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    val path1 = pctNormalize(if (path0.isEmpty) "/" else path0)
    // RFC 3986 §5.2.4 remove_dot_segments, the faithful string walk
    // (a naive nonempty-segment stack would also collapse `//`, which
    // syntax-based normalization must NOT do — empty segments are
    // real segments)
    def removeDotSegments(p: String): String = {
      var in = p
      val out = new StringBuilder
      def popOut(): Unit = {
        val idx = out.lastIndexOf("/")
        out.setLength(if (idx < 0) 0 else idx)
      }
      while (in.nonEmpty) {
        if (in.startsWith("../")) in = in.substring(3)
        else if (in.startsWith("./")) in = in.substring(2)
        else if (in.startsWith("/./")) in = "/" + in.substring(3)
        else if (in == "/.") in = "/"
        else if (in.startsWith("/../")) { popOut(); in = "/" + in.substring(4) }
        else if (in == "/..") { popOut(); in = "/" }
        else if (in == "." || in == "..") in = ""
        else {
          val start = if (in.startsWith("/")) 1 else 0
          val next = in.indexOf('/', start)
          if (next < 0) { out.append(in); in = "" }
          else { out.append(in.substring(0, next)); in = in.substring(next) }
        }
      }
      out.toString
    }
    val path = removeDotSegments(path1) match {
      case "" => "/"
      case p => p
    }
    s"$scheme://$hostPort$path${pctNormalize(query)}"
  }

  val canonicalUrlUdf = udf((u: String) => Option(u).map(canonicalUrl))
  def canonicalUrlCol(c: Column): Column = canonicalUrlUdf(c)

  /** Column forms (null-safe: nulls pass through). */
  val etld1Udf = udf((h: String) => Option(h).map(etld1FromHost))
  def etld1Col(c: Column): Column = etld1Udf(c)

  val normalizeUdf = udf((u: String) =>
    Option(u).flatMap(s =>
      try Some(normalizeUrl(s)._2) catch { case _: IllegalArgumentException => None }))
  def normalizeCol(c: Column): Column = normalizeUdf(c)
}
