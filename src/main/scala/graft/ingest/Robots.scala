package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt group/rule model and URL admission (RFC 9309 subset —
  * the politeness gate between a frontier and a fetcher; every crawl
  * corpus the engine ingests was shaped by one of these files).
  *
  * Supported subset, pinned by spec and oracle:
  *   - `User-agent` / `Allow` / `Disallow` directives, case-insensitive
  *     keys, `#` comments stripped to end-of-line, blank/garbage lines
  *     ignored.
  *   - Consecutive `User-agent` lines open a group shared by all the
  *     named agents; the group's rules run until the next agent block.
  *   - Agent selection per host: groups naming the caller's token
  *     exactly (case-insensitive) win; hosts with no exact group fall
  *     back to `*` groups. ALL groups at the winning precedence
  *     combine (the RFC 9309 merge rule). Precedence is computed over
  *     EVERY matching group — rule-bearing or not — so a group that
  *     names the caller but carries no Allow/Disallow (say, only a
  *     `Crawl-delay`) still wins, and its empty rule set means
  *     allow-all (RFC 9309 §2.2.1: `*` applies only when NO group
  *     names the caller, never as a fallback past one that does).
  *   - Path decision: RFC 9309 §2.2.3 pattern matches — `*` matches
  *     any character run, a TRAILING `$` anchors at end-of-path (a
  *     mid-pattern `$` is a literal), everything else is a literal
  *     prefix match; the LONGEST matching pattern (its rule text
  *     length, wildcards counted) wins, `Allow` wins length ties, no
  *     match ⇒ allowed, and an empty `Disallow:` value means
  *     allow-all (it contributes no rule). Wildcard-free rules keep
  *     the codegen'd `startsWith` fast path; only rules that carry a
  *     wildcard pay the regex.
  *
  * Scale shape: parsing is a per-host posexplode over the file's own
  * lines (robots files are KB-bounded by convention) with per-HOST
  * windows for group numbering — partitioned, never global. The URL
  * decision is a host-keyed equi-join against the rule table (rules ≪
  * URLs; broadcast when small) with the prefix test as a join filter,
  * then one min-struct aggregate per URL — no window over URLs, no
  * driver loop.
  */
object Robots {

  /** The shared parse: comment strip, key/value extraction, group
    * numbering (consecutive `User-agent` lines open a group; ANY other
    * directive — including `Crawl-delay` — closes the header run, the
    * RFC line model). One row per recognized directive with its group
    * id; pre-group rows keep `grp = 0`.
    */
  private def directives(robots: DataFrame, hostCol: String,
      txtCol: String): DataFrame = {
    // CRLF-tolerant: real robots.txt files ship \r\n; a \n-only split
    // would leave \r inside every value (and a rule path of "/x\r"
    // never prefix-matches anything)
    val lines = robots.select(col(hostCol).as("__host"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("__ln", "__raw")))
      .withColumn("__clean", regexp_replace(col("__raw"), "#.*$", ""))
      .withColumn("__key",
        lower(regexp_extract(col("__clean"), "^\\s*([A-Za-z-]+)\\s*:", 1)))
      .withColumn("__val",
        trim(regexp_extract(col("__clean"), "^\\s*[A-Za-z-]+\\s*:(.*)$", 1)))
      .filter(col("__key").isin("user-agent", "allow", "disallow", "crawl-delay"))
    val w = Window.partitionBy("__host").orderBy("__ln")
    lines
      .withColumn("__isUa", (col("__key") === "user-agent").cast("int"))
      .withColumn("__prevUa", coalesce(lag(col("__isUa"), 1).over(w), lit(0)))
      .withColumn("grp",
        sum(when(col("__isUa") === 1 && col("__prevUa") === 0, 1L)
          .otherwise(0L)).over(w))
  }

  /** Per-(host, grp) agent sets from the shared parse. */
  private def agentsOf(d: DataFrame): DataFrame =
    d.filter(col("__isUa") === 1)
      .select(col("__host"), col("grp"), lower(col("__val")).as("agent"))

  /** Parse robots bodies into the exploded (host, grp, agent, path,
    * allow) rule relation: one row per (agent in group) × (rule in
    * group). Directive lines that parse but sit before any
    * `User-agent` line are dropped (they belong to no group — the RFC
    * treats them as unreachable).
    */
  def ruleTable(robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val grouped = directives(robots, hostCol, txtCol).filter(col("grp") > 0)
    val rules = grouped
      .filter(col("__key").isin("allow", "disallow") && length(col("__val")) > 0)
      .select(col("__host"), col("grp"), col("__val").as("path"),
        (col("__key") === "allow").cast("int").as("allow"))
    agentsOf(grouped).join(rules, Seq("__host", "grp"))
      .select(col("__host").as(hostCol), col("grp"), col("agent"),
        col("path"), col("allow"))
  }

  /** Per-host `Sitemap:` URLs — GLOBAL directives per RFC 9309 §2.3:
    * valid anywhere in the file (before any group included), not
    * scoped to an agent, and NOT part of the group-header model (a
    * `Sitemap:` line between two `User-agent` lines must not split
    * their group — which is why this parses the lines independently
    * of [[directives]]' grouping stream). Every non-empty value is an
    * entry; duplicates collapse.
    */
  def sitemapUrls(robots: DataFrame, hostCol: String,
      txtCol: String): DataFrame = {
    robots.select(col(hostCol).as("__host"),
        explode(split(col(txtCol), "\r?\n")).as("__raw"))
      .withColumn("__clean", regexp_replace(col("__raw"), "#.*$", ""))
      .filter(lower(regexp_extract(col("__clean"), "^\\s*([A-Za-z-]+)\\s*:", 1))
        === "sitemap")
      .select(col("__host").as(hostCol),
        trim(regexp_extract(col("__clean"), "^\\s*[A-Za-z-]+\\s*:(.*)$", 1))
          .as("sitemap_url"))
      .filter(length(col("sitemap_url")) > 0)
      .distinct()
  }

  /** Per-host `Crawl-delay` for the named agent, in milliseconds:
    * longest-matching-agent groups win (the [[effectiveRules]]
    * precedence, computed over ALL matching groups — so a winning
    * group WITHOUT a delay means no delay, never a fallback to `*`'s),
    * the largest delay at the winning precedence wins (conservative
    * when several winning groups conflict), non-numeric values drop.
    * Seconds may be fractional (`0.5`); ms = round(value × 1000) —
    * the rounding is EXPLICIT and mirrored in the oracle because a
    * bare long cast truncates toward zero and an IEEE product like
    * 2.9 × 1000 = 2899.999… would otherwise emit 2899 here and 2900
    * there. Hosts whose winning groups carry no delay are ABSENT —
    * the caller's default applies (the [[Frontier.schedule]] seam).
    */
  def crawlDelays(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    val grouped = directives(robots, hostCol, txtCol).filter(col("grp") > 0)
    val delays = grouped
      .filter(col("__key") === "crawl-delay" &&
        col("__val").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .select(col("__host"), col("grp"),
        round(col("__val").cast("double") * 1000.0).cast("long").as("delay_ms"))
    winningGroups(grouped, agent)
      .join(delays, Seq("__host", "grp"))
      .groupBy(col("__host"))
      .agg(max(col("delay_ms")).as("delay_ms"))
      .withColumnRenamed("__host", hostCol)
  }

  /** Matched-token length of a group agent against the caller's
    * token: exact match, or a token-boundary prefix (caller
    * `googlebot-news` obeys a `googlebot` group — the most-specific-
    * match rule of RFC 9309 §2.2.1 / Google's matcher; the boundary
    * `-` keeps `goo` from matching `googlebot`). `*` matches
    * everything at length 0; non-matches are −1.
    */
  private def matchLen(callerLower: String) =
    when(col("agent") === callerLower ||
        lit(callerLower).startsWith(concat(col("agent"), lit("-"))),
      length(col("agent")).cast("long"))
      .when(col("agent") === "*", 0L)
      .otherwise(-1L)

  /** Per-host winning (host, grp) set for the named agent: precedence
    * computed from the agent headers of EVERY group — rule-bearing or
    * not — so a caller-named group holding only a `Crawl-delay` still
    * shadows `*` (the r9 ADVICE finding: deriving precedence from the
    * rule table silently handed such callers the `*` rules).
    */
  private def winningGroups(grouped: DataFrame, agent: String): DataFrame = {
    val am = agentsOf(grouped)
      .withColumn("__mlen", matchLen(agent.toLowerCase))
      .filter(col("__mlen") >= 0)
    val hostPrec = am.groupBy(col("__host"))
      .agg(max(col("__mlen")).as("__best"))
    am.join(hostPrec, Seq("__host"))
      .filter(col("__mlen") === col("__best"))
      .select(col("__host"), col("grp"))
      .distinct()
  }

  /** The rule set the named agent actually obeys per host: the groups
    * with the LONGEST matching agent token win (exact beats prefix
    * beats `*` — `*` only when nothing names the caller, even when
    * the caller's group carries no path rules: that winning-but-empty
    * group means allow-all, not a fallback); all groups at the
    * winning length combine (the RFC merge rule), duplicates
    * collapse.
    */
  def effectiveRules(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    val grouped = directives(robots, hostCol, txtCol).filter(col("grp") > 0)
    val rules = grouped
      .filter(col("__key").isin("allow", "disallow") && length(col("__val")) > 0)
      .select(col("__host"), col("grp"), col("__val").as("path"),
        (col("__key") === "allow").cast("int").as("allow"))
    winningGroups(grouped, agent)
      .join(rules, Seq("__host", "grp"))
      .select(col("__host").as(hostCol), col("path"), col("allow"))
      .distinct()
  }

  /** RFC 9309 §2.2.3 pattern columns for a rule-path column: `__wild`
    * (does the rule need the regex path at all), and `__rx` — the
    * anchored regex equivalent: a trailing `$` becomes the end
    * anchor, every regex metacharacter in the body is escaped, `*`
    * becomes `.*`, and the whole pattern is start-anchored (robots
    * matches always bind at the path's first byte). Built once per
    * RULE row — never per URL — and the identical construction is
    * mirrored verbatim in the DuckDB oracle, so both engines match
    * through the same generated regex.
    */
  private def patternCols(df: DataFrame, pathCol: String): DataFrame = {
    val p = col(pathCol)
    val anchored = p.endsWith("$")
    val body = when(anchored, p.substr(lit(1), length(p) - 1)).otherwise(p)
    val esc = regexp_replace(body, "([.^$+?()\\[\\]{}|\\\\])", "\\\\$1")
    df.withColumn("__wild", p.contains("*") || anchored)
      .withColumn("__rx",
        concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
          when(anchored, lit("$")).otherwise(lit(""))))
  }

  /** Per-URL admission under [[effectiveRules]]: emits every URL row
    * with `allowed` and the winning `rule` path (null when no rule
    * matched — allowed by default). Wildcard-free rules match via the
    * codegen'd `startsWith`; rules carrying `*`/`$` go through the
    * generated regex ([[patternCols]]). Longest rule TEXT wins
    * (wildcards counted — the Googlebot/RFC specificity convention),
    * `Allow` wins ties. `urls` needs a unique id column (the
    * max-struct tiebreak also orders on the rule path, so the output
    * is deterministic even under duplicate ids).
    */
  def allowed(urls: DataFrame, idCol: String, urlHostCol: String,
      pathCol: String, robots: DataFrame, robotsHostCol: String,
      txtCol: String, agent: String): DataFrame = {
    val rules = patternCols(
      effectiveRules(robots, robotsHostCol, txtCol, agent)
        .withColumnRenamed(robotsHostCol, "__rhost")
        .withColumnRenamed("path", "__rpath"),
      "__rpath")
    val hits = urls
      .join(rules, urls(urlHostCol) === col("__rhost") && (
        (!col("__wild") && urls(pathCol).startsWith(col("__rpath"))) ||
        (col("__wild") && regexp_like(urls(pathCol), col("__rx")))))
      .groupBy(col(idCol))
      .agg(max(struct(length(col("__rpath")).as("l"), col("allow").as("a"),
        col("__rpath").as("p"))).as("__win"))
      .select(col(idCol), col("__win.a").as("__allow"),
        col("__win.p").as("rule"))
    urls.join(hits, Seq(idCol), "left")
      .withColumn("allowed",
        coalesce(col("__allow") === 1, lit(true)).cast("int"))
      .drop("__allow")
  }
}
