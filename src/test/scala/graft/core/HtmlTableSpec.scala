package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.HtmlExtract
import graft.core.html.HtmlExtract.{ExtractedTable, TableRowCells}

/** Structured table extraction (q136): data-vs-layout gate parity with the
  * prose path, header detection, nesting, index stability, link-farm and
  * penalized-container rejection, and the tag-soup survival property. */
class HtmlTableSpec extends AnyFunSuite {

  private def t(html: String): Vector[ExtractedTable] = HtmlExtract.extractTables(html)

  test("data table with th header row and caption extracts structurally") {
    val ts = t("""<body><table><caption>City stats</caption>
      |<tr><th>city</th><th>pop</th></tr>
      |<tr><td>Ulm</td><td>126</td></tr>
      |<tr><td>Bonn</td><td>330</td></tr>
      |</table></body>""".stripMargin)
    assert(ts.length == 1)
    val tb = ts.head
    assert(tb.tableIdx == 0)
    assert(tb.caption == "City stats")
    assert(tb.rows == Vector(
      TableRowCells(0, isHeader = true, Vector("city", "pop")),
      TableRowCells(1, isHeader = false, Vector("Ulm", "126")),
      TableRowCells(2, isHeader = false, Vector("Bonn", "330"))))
  }

  test("layout table (long prose cells) emits nothing") {
    val prose = "this cell is a long paragraph of layout prose " * 4 // > 80 avg chars
    val ts = t(s"<table><tr><td>$prose</td><td>$prose</td></tr>" +
      s"<tr><td>$prose</td><td>$prose</td></tr></table>")
    assert(ts.isEmpty)
  }

  test("single-row and under-4-cell tables emit nothing (prose-path gate parity)") {
    assert(t("<table><tr><td>a</td><td>b</td><td>c</td><td>d</td></tr></table>").isEmpty)
    assert(t("<table><tr><td>a</td></tr><tr><td>b</td></tr></table>").isEmpty)
  }

  test("majority-link table (nav grid) emits nothing; minority-link survives") {
    val farm = "<table>" + (1 to 3).map(r =>
      s"""<tr><td><a href="/$r">pg$r</a></td><td><a href="/x$r">nx$r</a></td></tr>""")
      .mkString + "</table>"
    assert(t(farm).isEmpty)
    // same shape, links a minority of content chars
    val ok = "<table>" + (1 to 3).map(r =>
      s"""<tr><td><a href="/$r">p$r</a></td><td>value number $r common</td></tr>""")
      .mkString + "</table>"
    assert(t(ok).length == 1)
  }

  test("table inside nav/footer/aside is rejected; same table outside is kept") {
    val core = "<table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr>" +
      "<tr><td>b</td><td>2</td></tr></table>"
    assert(t(s"<nav>$core</nav>").isEmpty)
    assert(t(s"<footer>$core</footer>").isEmpty)
    assert(t(s"<main>$core</main>").length == 1)
    // penalty container closed before the table: no residual penalty
    assert(t(s"<nav>menu</nav>$core").length == 1)
  }

  test("cell text is the whole subtree; empty cells keep their positions") {
    val ts = t("""<table>
      |<tr><td><div><b>42</b></div></td><td></td><td>x</td></tr>
      |<tr><td>7</td><td>y</td><td></td></tr>
      |</table>""".stripMargin)
    assert(ts.length == 1)
    assert(ts.head.rows == Vector(
      TableRowCells(0, isHeader = false, Vector("42", "", "x")),
      TableRowCells(1, isHeader = false, Vector("7", "y", ""))))
  }

  test("nested data table extracts on its own; outer layout table does not") {
    val inner = "<table><tr><td>i1</td><td>i2</td></tr><tr><td>i3</td><td>i4</td></tr></table>"
    val prose = "wrapping layout prose around the data island " * 5
    val ts = t(s"<table><tr><td>$prose $inner $prose</td></tr></table>")
    assert(ts.length == 1)
    assert(ts.head.tableIdx == 1) // outer table opened first and owns index 0
    assert(ts.head.rows.map(_.cells) == Vector(Vector("i1", "i2"), Vector("i3", "i4")))
  }

  test("tableIdx is document-order of OPEN over all tables, kept or not") {
    val layout = "<table><tr><td>only one cell</td></tr></table>"
    val data = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
    val ts = t(layout + data + layout + data)
    assert(ts.map(_.tableIdx) == Vector(1, 3))
  }

  test("unclosed table/cells at EOF still extract; entities decode in cells") {
    val ts = t("<table><tr><td>a &amp; b</td><td>c</td><tr><td>d</td><td>e")
    assert(ts.length == 1)
    assert(ts.head.rows.map(_.cells) == Vector(Vector("a & b", "c"), Vector("d", "e")))
  }

  test("mixed th/td row is NOT a header row; all-th row is") {
    val ts = t("<table><tr><th>h1</th><td>v1</td></tr>" +
      "<tr><th>h2</th><td>v2</td></tr><tr><td>a</td><td>b</td></tr></table>")
    assert(ts.length == 1)
    assert(ts.head.rows.map(_.isHeader) == Vector(false, false, false))
    val ts2 = t("<table><tr><th>h1</th><th>h2</th></tr>" +
      "<tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>")
    assert(ts2.head.rows.map(_.isHeader) == Vector(true, false, false))
  }

  test("script/style content inside cells is dropped; stray tr text is not a cell") {
    val ts = t("<table><tr>stray<td>a<script>var x=1;</script></td><td>b</td></tr>" +
      "<tr><td>c</td><td>d</td></tr></table>")
    assert(ts.length == 1)
    assert(ts.head.rows.map(_.cells) == Vector(Vector("a", "b"), Vector("c", "d")))
  }

  test("omitted </caption> (HTML5) closes implicitly; caption state is per-table") {
    // review finding: a page-global captionDepth leaked an unclosed
    // caption into every later cell and table on the page
    val ts = t("""<table><caption>Stats<tr><th>a</th><th>b</th></tr>
      |<tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></table>""".stripMargin)
    assert(ts.length == 1)
    assert(ts.head.caption == "Stats")
    assert(ts.head.rows.map(_.cells) ==
      Vector(Vector("a", "b"), Vector("1", "2"), Vector("3", "4")))
    // a later table on the same page is unaffected by the first's soup
    val ts2 = t("<table><caption>Oops<tr><td>x</td></tr></table>" +
      "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>")
    assert(ts2.map(_.tableIdx) == Vector(1))
    assert(ts2.head.rows.map(_.cells) == Vector(Vector("a", "b"), Vector("c", "d")))
  }

  test("dangling <a> closes at row/table boundaries; later tables not link-tainted") {
    // review finding: a global linkDepth never reset meant one unclosed
    // anchor marked every later cell on the page as link text, and the
    // > 0.5 link-density gate then hard-rejected genuine data tables
    val soup = "<table><tr><td><a href=\"/x\">see</td><td>1</td></tr>" +
      "<tr><td>2</td><td>3</td></tr></table>"
    val clean = "<table><tr><td>10</td><td>20</td></tr><tr><td>30</td><td>40</td></tr></table>"
    val ts = t(soup + clean)
    assert(ts.map(_.tableIdx) == Vector(0, 1), s"got ${ts.map(_.tableIdx)}")
    // and an unclosed <a> in PROSE before a table doesn't taint it either
    val ts2 = t("<p><a href=\"/y\">dangling</p>" + clean)
    assert(ts2.length == 1)
  }

  test("nested table directly under <tr> flows neither text nor link mass") {
    // review finding: link mass flowed to the outer table even when the
    // text did not (no open cell), inflating outer link density
    val farm = "<table><tr><td><a href=\"/1\">l1</a></td><td><a href=\"/2\">l2</a></td></tr>" +
      "<tr><td><a href=\"/3\">l3</a></td><td><a href=\"/4\">l4</a></td></tr></table>"
    val ts = t("<table><tr>" + farm + "<td>alpha</td><td>beta</td></tr>" +
      "<tr><td>gamma</td><td>delta</td></tr></table>")
    // outer is a clean 2x2 data table; the link-farm island under <tr>
    // must not push it over the link-density gate
    val outer = ts.find(_.tableIdx == 0)
    assert(outer.isDefined, s"outer table rejected: ${ts.map(_.tableIdx)}")
    assert(outer.get.rows.map(_.cells) ==
      Vector(Vector("alpha", "beta"), Vector("gamma", "delta")))
    assert(!ts.exists(_.tableIdx == 1)) // the farm itself stays rejected
  }

  test("property: generated simple tables extract to their by-construction structure (200 docs)") {
    // generator: well-formed, non-nested tables with known structure —
    // the extractor's output must equal the generation plan exactly,
    // including the data-vs-layout gate verdict recomputed independently
    val rnd = new scala.util.Random(20260820L)
    (0 until 200).foreach { docIdx =>
      val nTables = 1 + rnd.nextInt(3)
      val plans = (0 until nTables).map { _ =>
        val nRows = 1 + rnd.nextInt(4)
        val nCols = 1 + rnd.nextInt(4)
        val headerRow = rnd.nextBoolean()
        val caption = if (rnd.nextBoolean()) s"cap${rnd.nextInt(100)}" else ""
        val longCells = rnd.nextInt(4) == 0 // sometimes layout-prose cells
        val cells = Vector.tabulate(nRows, nCols) { (r, c) =>
          if (longCells) ("w" + rnd.nextInt(10) + " ") * 30 + "end"
          else if (rnd.nextInt(8) == 0) "" // occasional empty cell
          else s"v${r}_${c}_${rnd.nextInt(1000)}"
        }
        (nRows, nCols, headerRow, caption, cells.map(_.map(_.trim)))
      }
      val html = plans.map { case (nRows, nCols, headerRow, caption, cells) =>
        val cap = if (caption.nonEmpty) s"<caption>$caption</caption>" else ""
        val rows = (0 until nRows).map { r =>
          val tag = if (headerRow && r == 0) "th" else "td"
          "<tr>" + (0 until nCols).map(c => s"<$tag>${cells(r)(c)}</$tag>").mkString + "</tr>"
        }.mkString
        s"<table>$cap$rows</table>"
      }.mkString("<p>between tables prose</p>")
      val got = HtmlExtract.extractTables(s"<html><body>$html</body></html>")
      // independent expectation: same gate arithmetic from the PLAN
      val want = plans.zipWithIndex.flatMap { case ((nRows, nCols, headerRow, caption, cells), ti) =>
        val keptRows = cells.filter(_.exists(_.nonEmpty))
        val nonEmpty = keptRows.flatten.filter(_.nonEmpty)
        val avgOk = nonEmpty.nonEmpty &&
          nonEmpty.map(_.length).sum.toFloat / nonEmpty.length <= HtmlExtract.MAX_AVG_CELL_CHARS
        val isData = nonEmpty.length >= HtmlExtract.MIN_DATA_CELLS &&
          keptRows.length >= 2 && avgOk
        if (!isData) None
        else Some(HtmlExtract.ExtractedTable(ti, caption,
          keptRows.zipWithIndex.map { case (r, ri) =>
            HtmlExtract.TableRowCells(ri,
              isHeader = headerRow && r == cells.head && cells.head.nonEmpty,
              r)
          }.toVector))
      }
      assert(got == want, s"doc $docIdx:\ngot  $got\nwant $want\nhtml $html")
    }
  }

  test("random tag soup never crashes and is deterministic (300 docs)") {
    val rnd = new scala.util.Random(20260820L)
    val atoms = Seq("<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>", "<th>",
      "</th>", "<caption>", "</caption>", "<div>", "</div>", "<a href='x'>", "</a>",
      "<nav>", "</nav>", "&amp;", "<br/>", "<!-- c -->", "<script>", "</script>", "<", ">")
    (0 until 300).foreach { _ =>
      val soup = (0 to 5 + rnd.nextInt(40)).map { _ =>
        if (rnd.nextBoolean()) atoms(rnd.nextInt(atoms.length))
        else (0 to rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(4))).mkString(" ")
      }.mkString(" ")
      val r1 = HtmlExtract.extractTables(soup) // must not throw
      val r2 = HtmlExtract.extractTables(soup)
      assert(r1 == r2)
    }
  }
}
