package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt rules — the crawl-side permission layer every
  * Common-Crawl-style pipeline applies before (or while re-auditing) a
  * corpus: parse per-host robots.txt bodies into (allow|disallow, path)
  * rules for an agent, then filter a URL table by RFC 9309
  * longest-match semantics. The reference is PDF-only
  * (pdf_extractor.h:6); this is north_rule surface (Common-Crawl-style
  * pages come from crawls that honor REP, and a curation pass re-checks
  * it when policies change after the fetch).
  *
  * Pattern scope: full RFC 9309 §2.2.3 special characters — `*` matches
  * any character sequence (including `/`), a trailing `$` anchors the
  * end of the path+query; both compile to SQL-LIKE patterns
  * ([[likePatOf]]) so the match is engine-recomputable (`LIKE ...
  * ESCAPE '\'` means the same thing in Spark and any SQL oracle), and
  * rule specificity stays the RFC's most-octets rank on the ORIGINAL
  * pattern. Crawl-delay and Sitemap parse via [[robotsDirectives]]
  * (delay group-scoped like a rule, sitemap file-global); Host and
  * unknown keys are ignored.
  */
object RobotsOps {

  /** rules of `body` applying to `agent`, RFC 9309 group semantics:
    * a group = consecutive User-agent lines followed by rules (a
    * User-agent line after rules starts a NEW group); the applicable
    * groups are those naming the agent EXACTLY (case-insensitive) if
    * any exist, else the `*` groups (the RFC's most-specific-match,
    * restricted to the exact-vs-wildcard distinction — product tokens
    * here are full names, not prefixes). Same-agent groups merge (RFC
    * 9309 §2.2.1). Comments (#) strip; blank lines do NOT end a group
    * (the RFC dropped that pre-standard rule); empty-path rules drop
    * ("Disallow:" alone means no restriction); rules with interior
    * whitespace drop (truncating them would enter a DIFFERENT rule into
    * longest-match ranking); `*`/`$` pattern rules are KEPT verbatim
    * (RFC 9309 §2.2.3 — [[robotsFilter]] compiles them to LIKE
    * patterns at match time). Group precedence is decided by whether any
    * group NAMES the agent — an exact group whose rules all drop (the
    * classic whitelist `User-agent: goodbot` + bare `Disallow:`) still
    * preempts `*`: falling back would hand the whitelisted agent the
    * wildcard group's restrictions, the exact inversion of the file.
    * Returned paths are matched byte-literally (no case folding). */
  private[graft] def parseRules(body: String, agent: String): Seq[(String, String)] =
    parseAll(body, agent)._1

  /** full parse: (rules, crawl-delays, sitemaps) of `body` for `agent`.
    * Rules and Crawl-delay are GROUP-scoped with the exact-preempts-`*`
    * precedence documented above (Crawl-delay is pre-RFC de facto, but
    * every consumer scopes it like a rule); Sitemap is file-GLOBAL (the
    * sitemaps.org extension explicitly divorces it from groups). Delay
    * values keep their decimal form ("0.5" is common) and unparseable /
    * negative ones drop; sitemap values must look absolute (contain
    * "://") or drop — a relative sitemap line has no host to resolve
    * against here. */
  private[graft] def parseAll(body: String, agent: String)
      : (Seq[(String, String)], Seq[BigDecimal], Seq[String]) = {
    val want = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val wild = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val exactDelay = scala.collection.mutable.ArrayBuffer.empty[BigDecimal]
    val wildDelay = scala.collection.mutable.ArrayBuffer.empty[BigDecimal]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var groupAgents = Set.empty[String]
    var sawExactGroup = false
    var inRules = false
    val lines = (if (body == null) "" else body).split("\r?\n", -1)
    var i = 0
    while (i < lines.length) {
      val noComment = {
        val h = lines(i).indexOf('#')
        if (h < 0) lines(i) else lines(i).substring(0, h)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { groupAgents = Set.empty; inRules = false }
            groupAgents += value.toLowerCase(java.util.Locale.ROOT)
            if (groupAgents.contains(want)) sawExactGroup = true
          case "allow" | "disallow" =>
            inRules = true
            if (value.nonEmpty &&
                !value.exists(c => c == ' ' || c == '\t')) {
              if (groupAgents.contains(want)) exact += ((key, value))
              else if (groupAgents.contains("*")) wild += ((key, value))
            }
          case "crawl-delay" =>
            // a directive line also "enters rules" for group-boundary
            // purposes: a User-agent line after it starts a NEW group
            inRules = true
            try {
              val d = BigDecimal(value)
              if (d >= 0) {
                if (groupAgents.contains(want)) exactDelay += d
                else if (groupAgents.contains("*")) wildDelay += d
              }
            } catch { case _: NumberFormatException => }
          case "sitemap" =>
            if (value.contains("://")) sitemaps += value
          case _ => // Host, unknown keys: ignored (RFC 9309 §2.2.4)
        }
      }
      i += 1
    }
    ((if (sawExactGroup) exact else wild).distinct.toSeq,
      (if (sawExactGroup) exactDelay else wildDelay).toSeq,
      sitemaps.distinct.toSeq)
  }

  /** parse a (host, body) robots.txt table into the rule table
    * [[robotsFilter]] consumes: (host, rule in {allow,disallow}, path).
    * Per-row typed flatMap fused with the scan — zero shuffle, output
    * proportional to rule count (real robots.txt files are O(100)
    * lines; the table is host-cardinality-sized, never corpus-sized). */
  def parseRobots(robots: DataFrame, agent: String = "*"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("host").cast("string"), col("body").cast("string"))
      .as[(String, String)]
      .flatMap { case (host, body) =>
        if (host == null) Iterator.empty
        else {
          // lowercase the key so it joins against hostOf's lowercased URL
          // hosts — a mixed-case robots key would otherwise never match
          // and its disallows would silently pass everything
          val h = host.toLowerCase(java.util.Locale.ROOT)
          parseRules(body, agent).iterator.map { case (r, p) => (h, r, p) }
        }
      }
      .toDF("host", "rule", "path")
  }

  /** crawl-delay + sitemap discovery per host — the two robots.txt
    * signals a crawl SCHEDULER consumes (rate limits) and the sitemap
    * pipeline starts from ([[SitemapOps]] parses what this finds; real
    * sitemap URLs are discovered via robots.txt far more often than by
    * convention-probing /sitemap.xml). Output one row per (host,
    * sitemap): crawl_delay_ms repeats per row (NULL when no applicable
    * group declares one); a host with no sitemap lines keeps one
    * NULL-sitemap row so its delay still surfaces. The delay is the
    * MOST CONSERVATIVE (max) among the applicable group's valid values
    * — merged groups can carry several, and a polite crawler honors the
    * slowest — in exact milliseconds (BigDecimal, half-up; "0.5" is
    * common and must not truncate to zero).
    *
    * Scale shape: same as [[parseRobots]] — scan-fused typed flatMap,
    * zero shuffle, host-cardinality output. */
  def robotsDirectives(robots: DataFrame, agent: String = "*"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("host").cast("string"), col("body").cast("string"))
      .as[(String, String)]
      .flatMap { case (host, body) =>
        if (host == null) Iterator.empty
        else {
          val h = host.toLowerCase(java.util.Locale.ROOT)
          val (_, delays, maps) = parseAll(body, agent)
          val ms: Option[Long] =
            if (delays.isEmpty) None
            else Some((delays.max * 1000)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
          if (maps.isEmpty) Iterator.single((h, ms, Option.empty[String]))
          else maps.iterator.map(m => (h, ms, Some(m)))
        }
      }
      .toDF("host", "crawl_delay_ms", "sitemap")
  }

  /** (lowercased host, path+query) of an absolute URL in ONE parse —
    * the REP match target is the path plus optional query (RFC 9309),
    * never scheme/host; an empty path folds to "/". ("", "") for
    * unparseable/hostless URLs (no host -> no rules -> allowed, like a
    * host with no robots.txt). */
  private[graft] def hostPathOf(url: String): (String, String) =
    try {
      val u = new java.net.URI(if (url == null) "" else url.trim)
      val h = u.getHost
      if (h == null) ("", "")
      else {
        val p = u.getRawPath
        val q = u.getRawQuery
        (h.toLowerCase(java.util.Locale.ROOT),
          (if (p == null || p.isEmpty) "/" else p) +
            (if (q == null) "" else "?" + q))
      }
    } catch { case scala.util.control.NonFatal(_) => ("", "") }

  private[graft] def pathQueryOf(url: String): String = hostPathOf(url)._2

  /** compile an RFC 9309 rule pattern to a SQL-LIKE pattern (escape
    * char `\`): `*` → `%`; a TRAILING `$` anchors (no `%` appended),
    * otherwise the pattern is a prefix (`%` appended); LIKE metachars
    * in the rule (`%`, `_`, `\`) are escaped so they match literally —
    * robots.txt has no escape syntax of its own, and a literal `%` is
    * common in rules over percent-encoded paths. A non-trailing `$` is
    * an ordinary character (it is one in LIKE too). This is the whole
    * reason to target LIKE instead of a bespoke matcher: `x LIKE p
    * ESCAPE '\'` means the same thing in Spark, DuckDB, and every
    * other SQL engine, so rule matching stays oracle-recomputable. */
  private[graft] def likePatOf(pattern: String): String = {
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    val sb = new StringBuilder(body.length + 8)
    body.foreach {
      case '\\' => sb.append("\\\\")
      case '%' => sb.append("\\%")
      case '_' => sb.append("\\_")
      case '*' => sb.append('%')
      case c => sb.append(c)
    }
    if (!anchored) sb.append('%')
    sb.toString
  }

  /** filter a URL table by robots rules, RFC 9309 most-specific-match:
    * among a host's rules whose pattern matches the URL's path+query
    * (`*` spans anything, trailing `$` anchors the end — §2.2.3), the
    * rule with the MOST OCTETS in its original pattern wins (octets,
    * not characters — a non-ASCII pattern is longer in UTF-8 bytes
    * than in codepoints and the RFC ranks by bytes); on an
    * allow/disallow tie at the same octet count, allow wins (§2.2.2);
    * no
    * matching rule (or no rules for the host, or an unparseable URL)
    * means allowed. Note the RFC matches against path+query, so a
    * `$`-anchored rule does NOT hit the same path carrying a query
    * string — that asymmetry is part of the spec.
    *
    * Input: urls (doc_id, url) + rules (host, rule, path) from
    * [[parseRobots]] (path may carry `*`/`$`). Output one row per input
    * url: (doc_id, url, host, allowed boolean, matched_rule,
    * matched_path = the original pattern — NULL when no rule matched).
    *
    * Scale shape: rules are host-cardinality-sized, urls corpus-sized —
    * URLs are parsed ONCE (one typed map, one URI construction per
    * row), then ONE LEFT equi-join on host (the pattern test rides the
    * join condition as a post-join LIKE filter on the host-matched
    * candidates, so it never degenerates to a cartesian; per-URL
    * candidates are bounded by that host's rule count, and non-matching
    * URLs survive as the null-rule row) + a per-doc_id top-1 window
    * where null rules sort last — no second scan, no join-back.
    * Document text never enters; whether the rule side broadcasts is
    * AQE's call. */
  def robotsFilter(urls: DataFrame, rules: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = urls.sparkSession
    import spark.implicits._
    val u = urls.select(col("doc_id").cast("long"), col("url").cast("string"))
      .as[(Long, String)]
      .map { case (id, url) =>
        val (h, pq) = hostPathOf(url)
        (id, url, h, pq)
      }
      .toDF("doc_id", "url", "host", "pathq")
    val r = rules.select(lower(col("host")).cast("string").as("r_host"),
        lower(col("rule")).as("r_rule"), col("path").cast("string").as("r_path"))
      .filter(col("r_host").isNotNull && col("r_path").isNotNull &&
        col("r_path") =!= "" &&
        (col("r_rule") === "allow" || col("r_rule") === "disallow"))
      .distinct()
      // rule-cardinality typed map: compile each pattern once, here,
      // instead of per (url × candidate) row on the corpus side
      .as[(String, String, String)]
      .map { case (h, rule, p) => (h, rule, p, likePatOf(p)) }
      .toDF("r_host", "r_rule", "r_path", "r_like")
    // desc = nulls-last in Spark, so the null-rule row of an unmatched
    // URL ranks below every real candidate and wins only when nothing
    // matched — exactly the "no rule -> allowed" row we want to keep
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(octet_length(col("r_path")).desc, col("r_rule").asc,
        col("r_path").asc)
    u.join(r, col("host") === col("r_host") &&
        like(col("pathq"), col("r_like"), lit("\\")), "left_outer")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("url"), col("host"),
        coalesce(col("r_rule") =!= "disallow", lit(true)).as("allowed"),
        col("r_rule").as("matched_rule"), col("r_path").as("matched_path"))
  }
}
