package graft.tools

import graft.core.html.HtmlExtract

/** HTML boilerplate-scorer calibration harness (no reference implementation
  * exists — the north_rule specifies the path; goldens are by-construction,
  * so this harness is the independent quality measurement).
  *
  * Generates a LABELED evaluation corpus structurally different from the
  * golden corpus generator: every page is assembled from fragments tagged
  * content/boilerplate, each carrying a unique marker token, across three
  * layout archetypes (semantic article/main, div-soup, tag-soup). Metrics:
  *  - recall: fraction of content fragments whose marker survives extraction
  *  - precision: content markers in output / all markers in output
  * reported overall and per fragment category (short paragraphs, lists,
  * tables, cookie banners, ...), which is what makes the numbers actionable.
  */
object HtmlCalib {

  final case class Frag(label: String, category: String, html: String, marker: String)

  private val words = Vector(
    "analysis", "measure", "scatter", "signal", "window", "lattice", "medium",
    "thread", "vector", "stream", "butter", "sample", "corpus", "kernel",
    "harbor", "meadow", "copper", "garden", "lantern", "marble", "violet",
    "thunder", "willow", "ember", "quartz", "saffron", "timber", "velvet")

  private def sentence(rnd: scala.util.Random, n: Int, marker: String): String =
    (marker +: Seq.fill(n)(words(rnd.nextInt(words.length)))).mkString(" ")

  /** fragments for one page; marker tokens are globally unique */
  def fragments(rnd: scala.util.Random, pageId: Int): Vector[Frag] = {
    var fragId = 0
    def mk(): String = { fragId += 1; s"mk${pageId}x$fragId" }

    val out = Vector.newBuilder[Frag]
    // ---- content ----
    val t = mk()
    out += Frag("content", "headline", s"<h1>${sentence(rnd, 5, t)}</h1>", t)
    (0 until 2 + rnd.nextInt(3)).foreach { _ =>
      val m = mk()
      out += Frag("content", "long-para", s"<p>${sentence(rnd, 15 + rnd.nextInt(25), m)}.</p>", m)
    }
    (0 until 1 + rnd.nextInt(2)).foreach { _ =>
      val m = mk()
      out += Frag("content", "short-para", s"<p>${sentence(rnd, 3 + rnd.nextInt(4), m)}.</p>", m)
    }
    val h2 = mk()
    out += Frag("content", "subheading", s"<h2>${sentence(rnd, 3, h2)}</h2>", h2)
    val bq = mk()
    out += Frag("content", "blockquote", s"<blockquote>${sentence(rnd, 10, bq)}</blockquote>", bq)
    val items = (0 until 3 + rnd.nextInt(3)).map { _ =>
      val m = mk(); out += Frag("content", "list-item", "", m)
      s"<li>${sentence(rnd, 2 + rnd.nextInt(4), m)}</li>"
    }
    out += Frag("content", "list-shell", s"<ul>${items.mkString}</ul>", "")
    val rows = (0 until 3).map { r =>
      val m = mk(); out += Frag("content", "table-cell", "", m)
      val c1 = sentence(rnd, 1, m)
      val c2 = (10 + rnd.nextInt(90)).toString
      val c3 = words(rnd.nextInt(words.length))
      // STRUCTURE gate: the whole rendered row — " | " between cells —
      // must appear in the output, i.e. the short numeric/word cells
      // survive AND stay on one line with their row (the round-3 scorer
      // dropped sub-threshold cells and split rows across lines)
      out += Frag("content", "table-row", "", s"$c1 | $c2 | $c3")
      s"<tr><td>$c1</td><td>$c2</td><td>$c3</td></tr>"
    }
    out += Frag("content", "table-header", "", "name | count | kind")
    out += Frag("content", "table-shell",
      s"<table><tr><th>name</th><th>count</th><th>kind</th></tr>${rows.mkString}</table>", "")
    val pre = mk()
    out += Frag("content", "pre-code", s"<pre>val $pre = ${rnd.nextInt(100)}\nprintln($pre)</pre>", pre)
    // figures: the caption is content (production extractors keep it); the
    // img itself contributes nothing — its alt text must NOT leak through
    val figM = mk()
    val altLeak = mk() // boiler-labeled: present in output = alt text leaked
    out += Frag("boiler", "img-alt", "", altLeak)
    out += Frag("content", "figcaption",
      s"""<figure><img src="/i.png" alt="$altLeak"><figcaption>${sentence(rnd, 5 + rnd.nextInt(5), figM)}</figcaption></figure>""", figM)
    val figShort = mk()
    out += Frag("content", "figcaption-short",
      s"""<figure><img src="/j.png"><figcaption>Fig. ${sentence(rnd, 1, figShort)}</figcaption></figure>""", figShort)

    // ---- boilerplate ----
    val navLinks = (0 until 5 + rnd.nextInt(4)).map { _ =>
      val m = mk(); out += Frag("boiler", "nav-link", "", m)
      s"""<a href="/${words(rnd.nextInt(words.length))}">${sentence(rnd, 1, m)}</a>"""
    }
    out += Frag("boiler", "nav-shell", s"<nav><ul>${navLinks.map(a => s"<li>$a</li>").mkString}</ul></nav>", "")
    val hdr = mk()
    out += Frag("boiler", "header", s"<header><div>${sentence(rnd, 2, hdr)}</div></header>", hdr)
    val crumbs = (0 until 3).map { _ =>
      val m = mk(); out += Frag("boiler", "breadcrumb", "", m)
      s"""<a href="/c">${sentence(rnd, 1, m)}</a>"""
    }
    out += Frag("boiler", "breadcrumb-shell", s"""<div class="crumbs">${crumbs.mkString(" &gt; ")}</div>""", "")
    val cook = mk()
    out += Frag("boiler", "cookie-banner",
      s"""<div class="cookie">${sentence(rnd, 8, cook)} <a href="#">Accept</a> <a href="#">Decline</a></div>""", cook)
    val ad = mk()
    out += Frag("boiler", "ad", s"""<div class="ad">${sentence(rnd, 3, ad)} <a href="/buy">click</a></div>""", ad)
    val share = (0 until 3).map { _ =>
      val m = mk(); out += Frag("boiler", "share-link", "", m)
      s"""<a href="/s">${sentence(rnd, 1, m)}</a>"""
    }
    out += Frag("boiler", "share-shell", s"""<div class="share">${share.mkString(" ")}</div>""", "")
    val rel = (0 until 4).map { _ =>
      val m = mk(); out += Frag("boiler", "related-link", "", m)
      s"""<li><a href="/r">${sentence(rnd, 2 + rnd.nextInt(3), m)}</a></li>"""
    }
    out += Frag("boiler", "aside-shell", s"<aside><h3>Related</h3><ul>${rel.mkString}</ul></aside>", "")
    // link-farm TABLE (old-school nav-in-a-table): data-shaped (many short
    // cells) but pure links — link density must kill it, not the data path
    val navTabRows = (0 until 4).map { _ =>
      val m = mk(); out += Frag("boiler", "table-nav-link", "", m)
      s"""<tr><td><a href="/x">${sentence(rnd, 1, m)}</a></td>""" +
        s"""<td><a href="/y">${words(rnd.nextInt(words.length))}</a></td></tr>"""
    }
    out += Frag("boiler", "table-nav-shell", s"<table>${navTabRows.mkString}</table>", "")
    // same farm with every link wrapped in a per-cell <div> (the shape
    // that defeats cell-direct link accounting)
    val navTabWrapped = (0 until 4).map { _ =>
      val m = mk(); out += Frag("boiler", "table-nav-wrapped", "", m)
      s"""<tr><td><div><a href="/x">${sentence(rnd, 1, m)}</a></div></td>""" +
        s"""<td><div><a href="/y">${words(rnd.nextInt(words.length))}</a></div></td></tr>"""
    }
    out += Frag("boiler", "table-nav-wrapped-shell", s"<table>${navTabWrapped.mkString}</table>", "")
    val foot = mk()
    val footLinks = (0 until 4).map { _ =>
      val m = mk(); out += Frag("boiler", "footer-link", "", m)
      s"""<a href="/f">${sentence(rnd, 1, m)}</a>"""
    }
    out += Frag("boiler", "footer",
      s"<footer><div>© 2024 ${sentence(rnd, 2, foot)}</div><div>${footLinks.mkString(" | ")}</div></footer>", foot)
    val form = mk()
    out += Frag("boiler", "comment-form",
      s"""<form><label>${sentence(rnd, 2, form)}</label><input name="c"><div>Post comment</div></form>""", form)
    // ---- adversarial: signals the scorer can/cannot use ----
    // boilerplate WITHOUT any class/id keyword: only density/link signals
    // remain; text-dense consent prose is indistinguishable from content
    // by structure alone (known residual, measured here honestly)
    val cp = mk()
    out += Frag("boiler", "cookie-noclass",
      s"""<div class="x7">${sentence(rnd, 8, cp)} <a href="#">OK</a> <a href="#">No</a></div>""", cp)
    // content inside a class that CONTAINS an unlikely token but also a
    // likely one ("post-comment-box"): the whitelist must override
    val cc = mk()
    out += Frag("content", "mixed-class-para",
      s"""<div class="post-comment-box"><p>${sentence(rnd, 12, cc)}.</p></div>""", cc)
    // short navigation-looking links but inside the article (e.g. a content
    // table-of-contents): link density penalizes; measured as content
    val toc = (0 until 3).map { _ =>
      val m = mk(); out += Frag("content", "toc-link", "", m)
      s"""<li><a href="#s">${sentence(rnd, 2, m)}</a></li>"""
    }
    out += Frag("content", "toc-shell", s"<ul>${toc.mkString}</ul>", "")
    // definition lists: glossary/spec prose structured as dt/dd pairs —
    // short dt terms next to sentence-length dd bodies (the dt is the
    // at-risk half: term-length text inside a structural wrapper)
    val defs = (0 until 3).map { _ =>
      val term = mk(); val body = mk()
      out += Frag("content", "dl-term", "", term)
      out += Frag("content", "dl-body", "", body)
      s"<dt>${sentence(rnd, 2, term)}</dt><dd>${sentence(rnd, 9 + rnd.nextInt(6), body)}.</dd>"
    }
    out += Frag("content", "dl-shell", s"<dl>${defs.mkString}</dl>", "")
    // nested lists: an item whose sublist carries the real content —
    // depth must not depress the text-density score of short leaf items
    val nested = (0 until 2).map { _ =>
      val outer = mk(); val inner = mk()
      out += Frag("content", "nested-list-outer", "", outer)
      out += Frag("content", "nested-list-inner", "", inner)
      s"<li>${sentence(rnd, 4, outer)}<ul><li>${sentence(rnd, 6, inner)}</li></ul></li>"
    }
    out += Frag("content", "nested-list-shell", s"<ul>${nested.mkString}</ul>", "")

    out.result()
  }

  /** assemble a page in one of three layout archetypes */
  def page(frags: Vector[Frag], layout: Int): String = {
    def cat(c: String): String = frags.filter(f => f.category == c && f.html.nonEmpty).map(_.html).mkString("\n")
    val contentInner = Seq("headline", "long-para", "short-para", "subheading",
      "blockquote", "list-shell", "table-shell", "pre-code", "figcaption",
      "figcaption-short", "mixed-class-para", "toc-shell", "dl-shell",
      "nested-list-shell").map(cat).mkString("\n")
    val head = "<head><title>t</title><script>var x=1;</script><style>.a{}</style></head>"
    layout match {
      case 0 => // semantic: article + aside + nav/header/footer
        s"""<!DOCTYPE html><html>$head<body>
           |${cat("nav-shell")}
           |${cat("header")}
           |${cat("breadcrumb-shell")}
           |${cat("cookie-banner")}
           |${cat("cookie-noclass")}
           |<article>
           |$contentInner
           |</article>
           |${cat("share-shell")}
           |${cat("ad")}
           |${cat("aside-shell")}
           |${cat("table-nav-shell")}${cat("table-nav-wrapped-shell")}
           |${cat("footer")}
           |${cat("comment-form")}
           |</body></html>""".stripMargin
      case 1 => // <main> wrapper, content inside plain nested divs
        s"""<!DOCTYPE html><html>$head<body>
           |<div id="top">${cat("nav-shell")}${cat("header")}</div>
           |${cat("cookie-banner")}${cat("cookie-noclass")}
           |<main><div class="wrap"><div class="inner">
           |$contentInner
           |</div></div></main>
           |<div class="bottom">${cat("ad")}${cat("share-shell")}${cat("aside-shell")}${cat("table-nav-shell")}${cat("table-nav-wrapped-shell")}${cat("footer")}${cat("comment-form")}</div>
           |</body></html>""".stripMargin
      case _ => // div-soup + tag-soup: no semantic wrappers, unclosed <p>s
        val soup = contentInner.replace("</p>", "")
        s"""<html>$head<body>
           |<div class="menu">${cat("nav-shell")}${cat("breadcrumb-shell")}</div>
           |<div><div class="c1"><div class="c2">
           |$soup
           |</div>${cat("ad")}</div>
           |<div class="sb">${cat("aside-shell")}${cat("share-shell")}${cat("table-nav-shell")}${cat("table-nav-wrapped-shell")}</div></div>
           |${cat("cookie-banner")}${cat("cookie-noclass")}
           |<div class="ft">${cat("footer")}${cat("comment-form")}</div>
           |</body></html>""".stripMargin
    }
  }

  final case class Tally(var hit: Int = 0, var total: Int = 0)

  def run(nPages: Int, seed: Long, verbose: Boolean): (Double, Double) = {
    val recallByCat = scala.collection.mutable.LinkedHashMap.empty[String, Tally]
    val leakByCat = scala.collection.mutable.LinkedHashMap.empty[String, Tally]
    var contentKept = 0
    var boilerKept = 0
    (0 until nPages).foreach { p =>
      val rnd = new scala.util.Random(seed * 1000 + p)
      val frags = fragments(rnd, p)
      val html = page(frags, p % 3)
      val out = HtmlExtract.extract(html).text
      frags.filter(_.marker.nonEmpty).foreach { f =>
        val present = out.contains(f.marker)
        if (f.label == "content") {
          val t = recallByCat.getOrElseUpdate(f.category, Tally())
          t.total += 1; if (present) { t.hit += 1; contentKept += 1 }
        } else {
          val t = leakByCat.getOrElseUpdate(f.category, Tally())
          t.total += 1; if (present) { t.hit += 1; boilerKept += 1 }
        }
      }
    }
    val recall = contentKept.toDouble / recallByCat.values.map(_.total).sum
    val precision = contentKept.toDouble / math.max(contentKept + boilerKept, 1)
    if (verbose) {
      println(f"overall: recall=$recall%.4f precision=$precision%.4f " +
        s"(content kept $contentKept, boiler leaked $boilerKept)")
      println("content recall by category:")
      recallByCat.foreach { case (c, t) =>
        println(f"  $c%-14s ${t.hit}/${t.total} (${t.hit.toDouble / t.total}%.3f)")
      }
      println("boilerplate LEAK by category (lower is better):")
      leakByCat.foreach { case (c, t) =>
        println(f"  $c%-16s ${t.hit}/${t.total} (${t.hit.toDouble / t.total}%.3f)")
      }
    }
    (recall, precision)
  }

  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toInt).getOrElse(200)
    val seed = args.drop(1).headOption.map(_.toLong).getOrElse(77L)
    run(nPages, seed, verbose = true)
  }
}
