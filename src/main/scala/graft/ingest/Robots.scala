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
  *     combine (the RFC 9309 merge rule).
  *   - Path decision: matching rules are PREFIX matches (no `*`/`$`
  *     wildcards in this subset — a deployment widens the match
  *     expression behind the same shape); the LONGEST matching path
  *     wins, `Allow` wins length ties, no match ⇒ allowed, and an
  *     empty `Disallow:` value means allow-all (it contributes no
  *     rule).
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
    * precedence), the largest delay at the winning length wins
    * (conservative when several groups conflict), non-numeric values
    * drop. Seconds may be fractional (`0.5`); ms = value × 1000 in one
    * IEEE multiply. Hosts with no parsed delay are ABSENT — the
    * caller's default applies (the [[Frontier.schedule]] seam).
    */
  def crawlDelays(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    val grouped = directives(robots, hostCol, txtCol).filter(col("grp") > 0)
    val delays = grouped
      .filter(col("__key") === "crawl-delay" &&
        col("__val").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .select(col("__host"), col("grp"),
        (col("__val").cast("double") * 1000.0).cast("long").as("delay_ms"))
    val t = agentsOf(grouped)
      .withColumn("__mlen", matchLen(agent.toLowerCase))
      .filter(col("__mlen") >= 0)
      .join(delays, Seq("__host", "grp"))
    val hostPrec = t.groupBy(col("__host"))
      .agg(max(col("__mlen")).as("__best"))
    t.join(hostPrec, Seq("__host"))
      .filter(col("__mlen") === col("__best"))
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

  /** The rule set the named agent actually obeys per host: the groups
    * with the LONGEST matching agent token win (exact beats prefix
    * beats `*` — `*` only when nothing names the caller); all groups
    * at the winning length combine (the RFC merge rule), duplicates
    * collapse.
    */
  def effectiveRules(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    val t = ruleTable(robots, hostCol, txtCol)
      .withColumn("__mlen", matchLen(agent.toLowerCase))
      .filter(col("__mlen") >= 0)
    val hostPrec = t.groupBy(col(hostCol))
      .agg(max(col("__mlen")).as("__best"))
    t.join(hostPrec, Seq(hostCol))
      .filter(col("__mlen") === col("__best"))
      .select(col(hostCol), col("path"), col("allow"))
      .distinct()
  }

  /** Per-URL admission under [[effectiveRules]]: emits every URL row
    * with `allowed` and the winning `rule` path (null when no rule
    * matched — allowed by default). `urls` needs a unique id column
    * (the min-struct tiebreak also orders on the rule path, so the
    * output is deterministic even under duplicate ids).
    */
  def allowed(urls: DataFrame, idCol: String, urlHostCol: String,
      pathCol: String, robots: DataFrame, robotsHostCol: String,
      txtCol: String, agent: String): DataFrame = {
    val rules = effectiveRules(robots, robotsHostCol, txtCol, agent)
      .withColumnRenamed(robotsHostCol, "__rhost")
      .withColumnRenamed("path", "__rpath")
    val hits = urls
      .join(rules, urls(urlHostCol) === col("__rhost") &&
        urls(pathCol).startsWith(col("__rpath")))
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
