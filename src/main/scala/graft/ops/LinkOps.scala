package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.html.HtmlExtract

/** Link-graph extraction — the operator pair between the HTML kernel and
  * [[CorpusOps.hostRank]]: pull every outlink (href + anchor text) out of
  * each page with the real DOM scanner, resolve it to a target HOST, and
  * aggregate the host->host edge list a centrality pass consumes. The
  * reference is PDF-only (pdf_extractor.h:6); this is north_rule surface
  * (Common-Crawl-style pages carry their link graph, and seed-list
  * curation ranks hosts by it).
  */
object LinkOps {

  /** lowercased host of an absolute URL; "" when unparseable/hostless */
  private[graft] def hostOf(url: String): String =
    try {
      val h = new java.net.URI(url.trim).getHost
      if (h == null) "" else h.toLowerCase(java.util.Locale.ROOT)
    } catch { case scala.util.control.NonFatal(_) => "" }

  private val schemePrefix = java.util.regex.Pattern.compile("^[a-zA-Z][a-zA-Z0-9+.-]*:")

  /** target host of an href seen on a page of `baseHost`:
    *  - absolute http(s) -> its own host;
    *  - protocol-relative (`//host/...`) -> that host;
    *  - any other scheme (mailto/javascript/data/tel/ftp/...) -> "" (not
    *    a document link);
    *  - empty / fragment-only -> "" (self-reference, not an edge);
    *  - relative path -> the base host. */
  private[graft] def resolveHost(baseHost: String, href: String): String = {
    val h = href.trim
    if (h.isEmpty || h.startsWith("#")) ""
    else {
      val lower = h.toLowerCase(java.util.Locale.ROOT)
      if (lower.startsWith("http://") || lower.startsWith("https://")) hostOf(h)
      else if (h.startsWith("//")) hostOf("http:" + h)
      else if (schemePrefix.matcher(h).find()) ""
      else baseHost
    }
  }

  /** every resolvable outlink of every page, in document order.
    *
    * Input: (doc_id long, url string — the page's own URL, html string).
    * Output: (doc_id, link_pos int — 0-based ordinal among the page's
    * RESOLVABLE links, src_host, dst_host, href, anchor, nofollow).
    * Links that resolve to no host (mailto:, javascript:, fragment-only,
    * href-less anchors) are dropped; a page whose own URL has no parseable
    * host still emits its ABSOLUTE outlinks (src_host = "") but its
    * relative ones have no resolution target and drop.
    *
    * Scale shape: one typed flatMap fused with the scan — per-row kernel
    * work, zero shuffle, output proportional to link count (the
    * ExtractKernel discipline: pure-JVM scanner inside the partition
    * iterator). Skew rides the same size-banding as extraction when the
    * caller routes pages through ExtractJob.saltedRepartition first. */
  def outlinks(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("doc_id").cast("long"), col("url").cast("string"),
        col("html").cast("string"))
      .as[(Long, String, String)]
      .flatMap { case (id, url, html) =>
        val base = hostOf(if (url == null) "" else url)
        var pos = -1
        HtmlExtract.extractLinks(if (html == null) "" else html)
          .flatMap { l =>
            val dst = resolveHost(base, l.href)
            if (dst.isEmpty) None
            else {
              pos += 1
              Some((id, pos, base, dst, l.href, l.anchor, l.nofollow))
            }
          }
      }
      .toDF("doc_id", "link_pos", "src_host", "dst_host", "href", "anchor", "nofollow")
  }

  /** aggregate an outlinks frame into the host->host edge list hostRank
    * consumes: nofollow links carry no endorsement (the rel=nofollow
    * contract search-engine graphs honor), intra-host links are navigation
    * not endorsement, and a hostless src ("" — unparseable page URL) has
    * no graph identity. One partial-combined groupBy on the (src,dst)
    * pair — edge-cardinality-sized, never document-sized. */
  def hostEdges(links: DataFrame): DataFrame =
    links.filter(!col("nofollow") &&
        col("src_host") =!= "" && col("src_host") =!= col("dst_host"))
      .groupBy(col("src_host").as("src"), col("dst_host").as("dst"))
      .agg(count(lit(1)).as("weight"))
}
