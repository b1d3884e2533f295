package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.html.HtmlExtract

/** sitemap.xml parsing + crawl-coverage audit — the discovery-side
  * companion of [[RobotsOps]] (robots says what a crawler may NOT
  * fetch; sitemaps say what the site WANTS fetched): parse per-host
  * sitemap bodies into (host, kind, loc, lastmod) rows, then reconcile
  * the declared URL set against what the corpus actually contains. The
  * coverage split (both / sitemap-only / crawled-only) is the standard
  * crawl-completeness audit — sitemap-only URLs are recrawl candidates,
  * crawled-only URLs on a sitemap-bearing host are discovery strays.
  * No reference analog (pdf_extractor.h:6); north_rule surface.
  *
  * Scope (documented subset): the sitemaps.org XML protocol's `<loc>`
  * and `<lastmod>` fields inside `<url>` (urlset) / `<sitemap>`
  * (sitemapindex) entries; plain-text sitemaps, gzip payloads, CDATA
  * sections and RSS/Atom feeds are out of scope. Entities in `<loc>`
  * decode via the shared HTML decoder (sitemaps MUST escape `&`).
  */
object SitemapOps {

  /** (kind, loc, lastmod) entries of one sitemap body: kind is "url"
    * for `<url>` entries, "sitemap" for `<sitemap>` index entries;
    * lastmod is "" when absent. Tolerant scan: case-insensitive tags,
    * whitespace inside tags ignored, unclosed entries dropped — trailing
    * OR mid-file (an unclosed entry never borrows the next entry's close
    * tag) — and entries without a `<loc>` dropped (a loc-less entry has
    * no URL — sitemaps.org makes `<loc>` the one required field). */
  private[graft] def parseEntries(body: String): Seq[(String, String, String)] = {
    val s = if (body == null) "" else body
    val low = s.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    // inner text of the first <tag>..</tag> inside [from, to), trimmed +
    // entity-decoded; "" when absent or malformed
    def inner(tag: String, from: Int, to: Int): String = {
      val open = low.indexOf("<" + tag, from)
      if (open < 0 || open >= to) return ""
      val gt = low.indexOf('>', open)
      if (gt < 0 || gt >= to) return ""
      val close = low.indexOf("</" + tag, gt + 1)
      if (close < 0 || close > to) return ""
      HtmlExtract.decodeEntities(s.substring(gt + 1, close)).trim
    }
    for (kind <- Seq("url", "sitemap")) {
      // "<url" must not match "<urlset": require the next char to close
      // the tag name
      def isTrueOpen(pos: Int): Boolean = {
        val after = pos + 1 + kind.length
        after < low.length &&
          (low.charAt(after) == '>' || Character.isWhitespace(low.charAt(after)))
      }
      def nextOpen(from: Int): Int = {
        var p = low.indexOf("<" + kind, from)
        while (p >= 0 && !isTrueOpen(p)) p = low.indexOf("<" + kind, p + 1)
        p
      }
      var open = nextOpen(0)
      while (open >= 0) {
        val close = low.indexOf("</" + kind + ">", open)
        val next = nextOpen(open + 1)
        // an UNCLOSED entry (another open before any close) must not
        // borrow the NEXT entry's close tag — that would emit a chimera
        // (this loc + the next entry's lastmod) and swallow the next
        // entry whole; drop the unclosed one and resume at the next
        if (close > open && (next < 0 || close < next)) {
          val loc = inner("loc", open, close)
          if (loc.nonEmpty) out += ((kind, loc, inner("lastmod", open, close)))
          open = nextOpen(close + 1)
        } else open = next
      }
    }
    out.toSeq
  }

  /** parse a (host, body) sitemap table into (host, kind, loc, lastmod)
    * rows. Per-row typed flatMap fused with the scan — zero shuffle,
    * output proportional to entry count (the protocol caps one sitemap
    * at 50k URLs; the input table is host-cardinality-sized). Hosts
    * lowercase so they join the URL side's lowercased hosts. */
  def parseSitemaps(sitemaps: DataFrame): DataFrame = {
    val spark = sitemaps.sparkSession
    import spark.implicits._
    sitemaps.select(col("host").cast("string"), col("body").cast("string"))
      .as[(String, String)]
      .flatMap { case (host, body) =>
        if (host == null) Iterator.empty
        else {
          val h = host.toLowerCase(java.util.Locale.ROOT)
          parseEntries(body).iterator.map { case (k, l, m) => (h, k, l, m) }
        }
      }
      .toDF("host", "kind", "loc", "lastmod")
  }

  /** reconcile declared vs crawled URLs per host: entries are the "url"
    * rows of [[parseSitemaps]] (index rows point at other SITEMAPS, not
    * pages — they don't belong in page coverage), urls a corpus (url)
    * table. Output one row per host appearing on EITHER side:
    * (host, n_sitemap, n_crawled, n_both, n_sitemap_only,
    * n_crawled_only) over DISTINCT URLs (a sitemap listing a URL twice
    * declares one page; a corpus holding two snapshots of one URL
    * crawled one page). Hostless/unparseable crawled URLs drop (no host
    * to reconcile against); URLs are compared byte-exactly — run both
    * sides through q39 canonicalization first when the site mixes
    * tracking params into its own sitemap.
    *
    * Scale shape: both sides project to (host, url) and dedup via one
    * partial-combined aggregate; ONE full-outer equi-join on (host,
    * url) — corpus-sized but carrying two short strings per row — then
    * one per-host aggregate. Document text never enters. */
  def sitemapCoverage(entries: DataFrame, urls: DataFrame): DataFrame = {
    val declared = entries
      .filter(col("kind") === "url")
      .select(lower(col("host")).as("host"), col("loc").cast("string").as("u"))
      .filter(col("u").isNotNull && col("u") =!= "")
      .distinct()
      .withColumn("in_sitemap", lit(1))
    val uu = coalesce(col("url").cast("string"), lit(""))
    val crawled = urls
      .select(CorpusOps.urlHostCol(uu).as("host"), uu.as("u"))
      .filter(col("host") =!= "")
      .distinct()
      .withColumn("in_crawl", lit(1))
    declared.join(crawled, Seq("host", "u"), "full_outer")
      .groupBy(col("host"))
      .agg(
        sum(when(col("in_sitemap").isNotNull, 1L).otherwise(0L)).as("n_sitemap"),
        sum(when(col("in_crawl").isNotNull, 1L).otherwise(0L)).as("n_crawled"),
        sum(when(col("in_sitemap").isNotNull && col("in_crawl").isNotNull, 1L)
          .otherwise(0L)).as("n_both"),
        sum(when(col("in_sitemap").isNotNull && col("in_crawl").isNull, 1L)
          .otherwise(0L)).as("n_sitemap_only"),
        sum(when(col("in_sitemap").isNull && col("in_crawl").isNotNull, 1L)
          .otherwise(0L)).as("n_crawled_only"))
  }
}
