package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Emails, UrlUtil}

/** T22 cases mirror `core/tests/test_url_util.py`'s tables. */
class UrlUtilSpec extends AnyFunSuite {

  test("etld1: standard domains") {
    assert(UrlUtil.etld1FromHost("http://example.com") == "example.com")
    assert(UrlUtil.etld1FromHost("example.com") == "example.com")
    assert(UrlUtil.etld1FromHost("subdomain.example.com") == "example.com")
    assert(UrlUtil.etld1FromHost("www.example.com") == "example.com")
    assert(UrlUtil.etld1FromHost("api.subdomain.example.com") == "example.com")
  }

  test("etld1: multi-part public suffixes") {
    assert(UrlUtil.etld1FromHost("example.co.uk") == "example.co.uk")
    assert(UrlUtil.etld1FromHost("subdomain.example.co.uk") == "example.co.uk")
    assert(UrlUtil.etld1FromHost("test.example.com.au") == "example.com.au")
    assert(UrlUtil.etld1FromHost("subdomain.example.gov.uk") == "example.gov.uk")
    assert(UrlUtil.etld1FromHost("www.example.co.jp") == "example.co.jp")
    assert(UrlUtil.etld1FromHost("api.example.com.br") == "example.com.br")
  }

  test("etld1: case folding") {
    assert(UrlUtil.etld1FromHost("EXAMPLE.COM") == "example.com")
    assert(UrlUtil.etld1FromHost("Subdomain.Example.Co.UK") == "example.co.uk")
    assert(UrlUtil.etld1FromHost("WWW.GOOGLE.CO.UK") == "google.co.uk")
  }

  test("etld1: hosts without a recognized suffix pass through") {
    assert(UrlUtil.etld1FromHost("localhost") == "localhost")
    assert(UrlUtil.etld1FromHost("internal.server") == "internal.server")
    assert(UrlUtil.etld1FromHost("intranet") == "intranet")
  }

  test("etld1: IPs pass through") {
    assert(UrlUtil.etld1FromHost("192.168.1.1") == "192.168.1.1")
    assert(UrlUtil.etld1FromHost("10.0.0.1") == "10.0.0.1")
    assert(UrlUtil.etld1FromHost("2001:db8::1") == "2001:db8::1")
    assert(UrlUtil.etld1FromHost("::1") == "::1")
  }

  test("etld1: ports are stripped") {
    assert(UrlUtil.etld1FromHost("example.com:8080") == "example.com")
    assert(UrlUtil.etld1FromHost("api.example.co.uk:443") == "example.co.uk")
  }

  test("etld1: hyphens/underscores, numerics, empty") {
    assert(UrlUtil.etld1FromHost("test.my-site.example-domain.com") == "example-domain.com")
    assert(UrlUtil.etld1FromHost("sub.123.com") == "123.com")
    assert(UrlUtil.etld1FromHost("") == "")
    assert(UrlUtil.etld1FromHost("punycode.xn--p1ai") == "punycode.xn--p1ai")
  }

  test("stripScheme") {
    assert(UrlUtil.stripScheme("https://example.com") == "example.com")
    assert(UrlUtil.stripScheme("https://example.com/path/to/resource") == "example.com/path/to/resource")
    assert(UrlUtil.stripScheme("example.com/search?q=test") == "example.com/search?q=test")
  }

  test("normalizeUrl: lowercases, strips path/port/trailing dot, keeps subdomains") {
    assert(UrlUtil.normalizeUrl("https://WWW.Example.COM/path?q=1") ==
      ("https", "https://www.example.com"))
    assert(UrlUtil.normalizeUrl("http://api.sub.example.co.uk:8080/x") ==
      ("http", "http://api.sub.example.co.uk"))
    assert(UrlUtil.normalizeUrl("https://example.com.") ==
      ("https", "https://example.com"))
  }

  test("normalizeUrl: rejects missing/bad scheme, no hostname, no suffix") {
    assertThrows[IllegalArgumentException](UrlUtil.normalizeUrl("example.com"))
    assertThrows[IllegalArgumentException](UrlUtil.normalizeUrl("ftp://example.com"))
    assertThrows[IllegalArgumentException](UrlUtil.normalizeUrl("https://"))
    assertThrows[IllegalArgumentException](UrlUtil.normalizeUrl("https://localhost"))
    assertThrows[IllegalArgumentException](UrlUtil.normalizeUrl(""))
    assertThrows[IllegalArgumentException](UrlUtil.normalizeUrl(null))
  }

  test("withCompatibleProtocol: https preferred, http fallback, else raises") {
    val httpsOk: UrlUtil.Reachability = url => url.startsWith("https://")
    val httpOnly: UrlUtil.Reachability = url => url.startsWith("http://") && !url.startsWith("https://")
    val dead: UrlUtil.Reachability = _ => false
    assert(UrlUtil.withCompatibleProtocol("http://example.com/x", httpsOk) ==
      "https://example.com/x")
    assert(UrlUtil.withCompatibleProtocol("example.com", httpOnly) == "http://example.com")
    assertThrows[IllegalArgumentException](
      UrlUtil.withCompatibleProtocol("example.com", dead))
  }

  test("canonicalUrl: RFC 3986 syntax-based normalization") {
    import UrlUtil.canonicalUrl
    // case, trailing host dot, default port, dot segments, fragment
    assert(canonicalUrl("HTTP://WWW.Example.COM.:80/a/b/../c/./d.html?x=1#frag") ==
      "http://www.example.com/a/c/d.html?x=1")
    assert(canonicalUrl("https://h.test:443/") == "https://h.test/")
    assert(canonicalUrl("https://h.test:8443/p") == "https://h.test:8443/p",
      "non-default port kept")
    assert(canonicalUrl("http://h.test") == "http://h.test/", "empty path -> /")
    // percent-encoding: unreserved decodes, reserved stays uppercase hex
    assert(canonicalUrl("http://h.test/%7euser/%2fx/%4a") ==
      "http://h.test/~user/%2Fx/J")
    // traversal never climbs above root
    assert(canonicalUrl("http://h.test/a/../../../b") == "http://h.test/b")
    // empty segments are REAL segments — // is not collapsed
    assert(canonicalUrl("http://h.test/a//b/") == "http://h.test/a//b/")
    // trailing dot segments keep the trailing slash
    assert(canonicalUrl("http://h.test/a/b/..") == "http://h.test/a/")
    assert(canonicalUrl("http://h.test/a/.") == "http://h.test/a/")
    // IPv6 authority: bracket colons are not a port
    assert(canonicalUrl("http://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x")
    assert(canonicalUrl("http://[2001:DB8::1]:8080/x") == "http://[2001:db8::1]:8080/x")
    // query percent-normalization
    assert(canonicalUrl("http://h.test/p?q=%41%2f") == "http://h.test/p?q=A%2F")
    // pass-throughs: non-http schemes, relative refs, garbage, null
    assert(canonicalUrl("ftp://h.test/x") == "ftp://h.test/x")
    assert(canonicalUrl("/relative/path") == "/relative/path")
    assert(canonicalUrl("  spaced  ") == "spaced")
    assert(canonicalUrl(null) == null)
    // idempotence: canonical of canonical is itself
    val u = "HTTP://H.Test:80/a/./b/%7e?x=%2f#f"
    assert(canonicalUrl(canonicalUrl(u)) == canonicalUrl(u))
  }

  test("canonicalUrl: never throws and is idempotent on hostile random inputs") {
    import UrlUtil.canonicalUrl
    val rnd = new scala.util.Random(42)
    val alphabet = "abAB01:/%.?#~-_[]{}&=+ \t!$'()*,;@\\é"
    (1 to 2000).foreach { i =>
      val len = rnd.nextInt(40)
      val body = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val s = rnd.nextInt(4) match {
        case 0 => body
        case 1 => "http://" + body
        case 2 => "https://h.test" + body
        case 3 => "HTTP://" + body + ":80/" + body
      }
      val once = canonicalUrl(s) // must not throw
      val twice = canonicalUrl(once)
      assert(twice == once, s"not idempotent on case $i: '$s' -> '$once' -> '$twice'")
    }
  }
}

class EmailsSpec extends SparkSpec {

  test("extracts, dedupes, normalizes domain case") {
    val text = "Contact info@Example.COM or sales@acme.co.uk; again info@example.com!"
    assert(Emails.validatedEmails(text) ==
      Seq("info@example.com", "sales@acme.co.uk"))
  }

  test("rejects malformed candidates the regex lets through") {
    // double dot in local part
    assert(Emails.SyntacticValidator.validate("a..b@example.com").isEmpty)
    // leading dot in local part
    assert(Emails.SyntacticValidator.validate(".a@example.com").isEmpty)
    // domain label starting with hyphen
    assert(Emails.SyntacticValidator.validate("a@-bad.com").isEmpty)
    assert(Emails.SyntacticValidator.validate("ok.name+tag@sub.example.org") ==
      Some("ok.name+tag@sub.example.org"))
  }

  test("no emails in plain text") {
    assert(Emails.validatedEmails("no emails here at all").isEmpty)
    assert(Emails.validatedEmails("").isEmpty)
    assert(Emails.validatedEmails(null).isEmpty)
  }

  test("column form matches the function") {
    import spark.implicits._
    val texts = Seq(
      "reach us: a@b.com and A@B.COM and broken@@x.com",
      "nothing here")
    val got = texts.toDF("text")
      .select(Emails.emailsCol(org.apache.spark.sql.functions.col("text")).as("e"))
      .as[Seq[String]].collect()
    texts.zip(got).foreach { case (t, e) =>
      assert(e == Emails.validatedEmails(t), s"text='$t'")
    }
  }
}
