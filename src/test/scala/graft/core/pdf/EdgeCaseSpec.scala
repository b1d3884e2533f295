package graft.core.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.PdfBuilder._
import graft.fixtures.PdfBuilderAdvanced._

/** Remaining fixture-matrix rows: Type3 fonts, MacRoman/Standard encodings,
  * CJK charsets, malformed-PDF robustness (quarantine, never hang). */
class EdgeCaseSpec extends AnyFunSuite {

  private def extract(pdf: Array[Byte]): String =
    new String(PdfExtract.pdf2txt(pdf), java.nio.charset.StandardCharsets.UTF_8)

  private def simpleContent(text: String): Array[Byte] =
    bytes(s"BT\n/F1 12 Tf\n72 720 Td\n($text) Tj\nET\n")

  test("overlapping /W ranges: std::sort pair tie order (round-5 fuzz regression)") {
    // fuzz doc cid_059: /W [98 137 427 103 141 900 4 10 985 108 146 501
    // 40 65 358] — duplicate codes across overlapping ranges. The reference
    // std::sorts (code, width) pairs (ties by WIDTH), so a different width
    // wins than under a stable sort-by-code; widths shift bboxes and flip
    // the layout order of two blocks. Golden captured from the reference
    // binary; a sort-order regression reorders the output lines.
    val pdf = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/w_overlap_cid.pdf").toURI))
    val golden = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/w_overlap_cid.golden").toURI))
    assert(java.util.Arrays.equals(PdfExtract.pdf2txt(pdf), golden))
  }

  test("encrypted + xref-stream + ObjStm composition extracts (round-8 fuzz family)") {
    // the three file-structure features combined: AESV2/RC4 encryption,
    // xref stream, catalog/pages/page/font packed in an encrypted /ObjStm
    // (object_storage.cc:58 decrypts with the ObjStm's own per-object key;
    // the xref stream itself stays plaintext). 2x500 fuzz docs agreed
    // byte-identically with the reference; this pins one deterministic case.
    Seq(
      EncSpec(revision = 4, keyBits = 128, aes = true,
        docId = Array.tabulate(16)(j => (j * 17 + 3).toByte)),
      EncSpec(revision = 3, keyBits = 128, aes = false,
        docId = Array.tabulate(16)(j => (j * 29 + 1).toByte))).foreach { enc =>
      val pdf = graft.tools.FuzzR8.encXrefObjStm(
        bytes("BT\n/F1 12 Tf\n72 720 Td\n(hello objstm) Tj\nET\n"), enc)
      assert(extract(pdf).contains("hello objstm"))
    }
  }

  test("TrueType cmap format 2 decodes via subheader mapping (round-8 fuzz family)") {
    // format-2 subtable paired with format 4 (which sets the 2-byte lookup
    // size; format 2 alone never touches cmap.sizes — the no-sizes quirk):
    // high byte 1, firstCode 0x41, gid 0x141 -> code 0x0141 shown as <0141>
    val f2 = graft.tools.FuzzR8.cmapFormat2(Seq((1, 0x41, 0, 0x141)))
    val f4 = graft.fixtures.PdfBuilderR2.cmapFormat4(Seq(('A', 0x80)))
    val tt = graft.fixtures.PdfBuilderR2.trueTypeWithCmaps(Seq(f2, f4))
    val fontObjs = Seq(
      ObjSpec(5, "<< /Type /Font /Subtype /TrueType /BaseFont /Fuzz2 " +
        "/FirstChar 0 /LastChar 255 /FontDescriptor 7 0 R >>"),
      ObjSpec(7, "<< /Type /FontDescriptor /FontName /Fuzz2 /Flags 4 /FontFile2 8 0 R >>"),
      streamObj(8, tt))
    val content = "BT\n/F1 10 Tf\n60 700 Td\n<0141> Tj\nET\n"
    // code 0x0141 = (high byte 1 << 8) + firstCode 0x41; decoded output is
    // the raw big-endian bytes of the codepoint (reference get_utf8 quirk)
    val out = PdfExtract.pdf2txt(onePage(bytes(content), Map("/F1" -> 5), fontObjs))
    assert(new String(out, java.nio.charset.StandardCharsets.ISO_8859_1).contains("A"))
  }

  test("missing /MediaBox with no inheritable parent value throws (quarantine path)") {
    // real boost::optional::value() throws here; a shim that defaulted the
    // mediabox masked this class until the round-5 corruption fuzz
    val objs = Seq(
      ObjSpec(1, "<< /Type /Catalog /Pages 2 0 R >>"),
      ObjSpec(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      ObjSpec(3, "<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      ObjSpec(4, s"<< /Length ${bytes("BT\n/F1 12 Tf\n72 720 Td\n(x) Tj\nET\n").length} >>",
        Some(bytes("BT\n/F1 12 Tf\n72 720 Td\n(x) Tj\nET\n"))),
      courier(5))
    val pdf = classicXref(objs, 1)
    assertThrows[Exception](PdfExtract.pdf2txt(pdf))
  }

  test("Type3 font: FontMatrix scales widths, Differences decode") {
    val widths = (32 to 126).map(_ => "500").mkString(" ")
    val font = ObjSpec(5,
      "<< /Type /Font /Subtype /Type3 /FontMatrix [0.001 0 0 0.001 0 0] " +
        "/FontBBox [0 -200 1000 800] /CharProcs << >> " +
        s"/FirstChar 32 /LastChar 126 /Widths [$widths] " +
        "/Encoding << /Type /Encoding /Differences [65 /Z] >> >>")
    val pdf = onePage(simpleContent("AB type3"), Map("/F1" -> 5), Seq(font))
    // code 65 remapped to /Z over the Standard base table
    assert(extract(pdf) == "ZB type3\n")
  }

  test("MacRomanEncoding: high codes decode per Mac table") {
    val font = ObjSpec(5,
      "<< /Type /Font /Subtype /Type1 /BaseFont /Courier /Encoding /MacRomanEncoding >>")
    // hex bytes: c a f <0x8E>; 0x8E = 'é' in MacRoman
    val content = bytes("BT\n/F1 12 Tf\n72 720 Td\n<6361668E> Tj\nET\n")
    val pdf = onePage(content, Map("/F1" -> 5), Seq(font))
    assert(extract(pdf) == "café\n")
  }

  test("StandardEncoding quirks: quotes map to curly glyphs") {
    val font = ObjSpec(5,
      "<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>") // no /Encoding => Standard
    val content = bytes("BT\n/F1 12 Tf\n72 720 Td\n(it's `q') Tj\nET\n")
    val pdf = onePage(content, Map("/F1" -> 5), Seq(font))
    // 39 -> U+2019, 96 -> U+2018 in StandardEncoding
    assert(extract(pdf) == "it’s ‘q’\n")
  }

  test("CJK predefined CMap: GBK-EUC-H via JDK charset") {
    val fonts = Seq(
      ObjSpec(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Fixture-GBK " +
        "/Encoding /GBK-EUC-H /DescendantFonts [7 0 R] >>"),
      ObjSpec(7, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fixture-GBK " +
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) /Supplement 2 >> /DW 1000 >>"))
    // "中文" in GBK: D6 D0 CE C4
    val content = bytes("BT\n/F1 12 Tf\n72 720 Td\n<D6D0CEC4> Tj\nET\n")
    val pdf = onePage(content, Map("/F1" -> 5), fonts)
    assert(extract(pdf) == "中文\n")
  }

  test("vertical CMap list quirks: /GBK-EUC_V vertical, /GB-EUC-V horizontal") {
    // the reference's is_vertical uses an EXPLICIT list (charset_converter
    // .cc:65-93): it contains "/GBK-EUC_V" (underscore typo) but NOT
    // "/GB-EUC-V" — verified byte-identical by the full 152-CMap sweep
    def cjkPdf(enc: String, hexStr: String): Array[Byte] = {
      val fonts = Seq(
        ObjSpec(5, s"<< /Type /Font /Subtype /Type0 /BaseFont /Fx " +
          s"/Encoding $enc /DescendantFonts [7 0 R] >>"),
        ObjSpec(7, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fx /DW 1000 >>"))
      onePage(bytes(s"BT\n/F1 12 Tf\n72 720 Td\n<$hexStr> Tj\nET\n"), Map("/F1" -> 5), fonts)
    }
    assert(extract(cjkPdf("/GBK-EUC_V", "D6D0")) == "") // vertical: show dropped
    assert(extract(cjkPdf("/GB-EUC-V", "D6D0")) == "中\n") // NOT in the list
    assert(extract(cjkPdf("/GBK-EUC-H", "D6D0")) == "中\n")
  }

  test("Big5 decodes ETen extension rows to PUA like iconv (x-windows-950)") {
    // iconv BIG-5 maps 0xC6AF -> U+F6BF (PUA), not hiragana; sweep-verified
    val fonts = Seq(
      ObjSpec(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Fx " +
        "/Encoding /ETen-B5-H /DescendantFonts [7 0 R] >>"),
      ObjSpec(7, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fx /DW 1000 >>"))
    val pdf = onePage(bytes("BT\n/F1 12 Tf\n72 720 Td\n<C6AF A4A4> Tj\nET\n"),
      Map("/F1" -> 5), fonts)
    assert(extract(pdf) == "\uf6bf中\n") // JDK "Big5" would give kana here
  }

  test("bad pdf: cyclic page tree does not hang") {
    val objs = Seq(
      ObjSpec(1, "<< /Type /Catalog /Pages 2 0 R >>"),
      ObjSpec(2, "<< /Type /Pages /Kids [3 0 R 2 0 R] /Count 1 >>"), // self-referencing
      ObjSpec(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      ObjSpec(4, "<< /Length 5 >>", Some(bytes("BT ET"))),
      courier(5))
    val pdf = classicXref(objs, 1)
    assert(extract(pdf) == "")
  }

  test("bad pdf: cyclic /Contents array does not hang") {
    val objs = Seq(
      ObjSpec(1, "<< /Type /Catalog /Pages 2 0 R >>"),
      ObjSpec(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      ObjSpec(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 6 0 R >> >> /Contents [4 0 R 4 0 R] >>"),
      ObjSpec(4, s"<< /Length 30 >>", Some(bytes("BT /F1 9 Tf 5 5 Td (x) Tj ET"))),
      courier(6))
    val pdf = classicXref(objs, 1)
    assert(extract(pdf) == "x\n") // second visit skipped by visited-set
  }

  test("bad pdf: truncated stream quarantines via kernel, job survives") {
    val good = onePage(simpleContent("fine"), Map("/F1" -> 5), Seq(courier(5)))
    val truncated = good.take(good.length / 2) // cut mid-file: startxref gone
    val out = graft.pipeline.ExtractKernel.extractOne(
      graft.pipeline.PageRow("u", new java.sql.Timestamp(0), truncated, "", "en"))
    assert(out.status.startsWith("err:"))
  }

  test("bad pdf: xref offset beyond buffer throws cleanly") {
    intercept[PdfError] {
      PdfExtract.pdf2txt(bytes("%PDF-1.4\nstartxref\n99999\n%%EOF\n"))
    }
  }

  test("empty page (no /Contents) yields empty text") {
    val objs = Seq(
      ObjSpec(1, "<< /Type /Catalog /Pages 2 0 R >>"),
      ObjSpec(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      ObjSpec(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>"))
    val pdf = classicXref(objs, 1)
    assert(extract(pdf) == "")
  }

  test("Tw word spacing expands gaps at bbox time") {
    // Tw applies per space byte; with huge Tw the two words land far apart
    // but remain one merged line with the inserted space
    val content = bytes("BT\n/F1 12 Tf\n50 Tw\n72 720 Td\n(a b) Tj\nET\n")
    val pdf = onePage(content, Map("/F1" -> 5), Seq(courier(5)))
    assert(extract(pdf) == "a b\n")
  }

  test("Tz horizontal scaling changes advance without changing text") {
    val content = bytes("BT\n/F1 12 Tf\n200 Tz\n72 720 Td\n(wide) Tj\nET\n")
    val pdf = onePage(content, Map("/F1" -> 5), Seq(courier(5)))
    assert(extract(pdf) == "wide\n")
  }
}

/** vertical-encoding + HTML structure coverage appendix */
class EdgeCaseSpec2 extends org.scalatest.funsuite.AnyFunSuite {
  import graft.fixtures.PdfBuilder._

  private def extract(pdf: Array[Byte]): String =
    new String(PdfExtract.pdf2txt(pdf), java.nio.charset.StandardCharsets.UTF_8)

  test("Identity-V vertical encoding: entire show ops skipped") {
    val fonts = Seq(
      ObjSpec(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Fixture-CID " +
        "/Encoding /Identity-V /DescendantFonts [7 0 R] >>"),
      ObjSpec(7, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fixture-CID " +
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> /DW 1000 >>"))
    val content = bytes("BT\n/F1 12 Tf\n72 720 Td\n<00480069> Tj\nET\n")
    val pdf = onePage(content, Map("/F1" -> 5), fonts)
    assert(extract(pdf) == "") // pages_extractor.cc:813 vertical -> skip
  }

  test("html: list items and table cells become blocks") {
    import graft.core.html.HtmlExtract
    val li = "a reasonably long list item with enough words to pass the threshold easily"
    val html = s"<body><ul><li>$li one.</li><li>$li two.</li></ul>" +
      s"<table><tr><td>$li cell.</td></tr></table></body>"
    val r = HtmlExtract.extract(html)
    assert(r.text == s"$li one.\n$li two.\n$li cell.")
    assert(r.blocks.map(_.tagPath) == Vector("li", "li", "td"))
  }

  test("html: data tables render row-wise with cell separators, short cells kept") {
    import graft.core.html.HtmlExtract
    val html = "<body><table>" +
      "<tr><th>name</th><th>count</th><th>kind</th></tr>" +
      "<tr><td>alpha</td><td>42</td><td>blue</td></tr>" +
      "<tr><td>beta</td><td>7</td><td>red</td></tr>" +
      "</table></body>"
    val r = HtmlExtract.extract(html)
    assert(r.text == "name | count | kind\nalpha | 42 | blue\nbeta | 7 | red", r.text)
    assert(r.blocks.map(_.tagPath) == Vector("table"), r.blocks)
  }

  test("html: data tables tolerate unclosed cells and rows (implied end tags)") {
    import graft.core.html.HtmlExtract
    val html = "<body><table>" +
      "<tr><td>alpha<td>42<td>blue" + // no </td>, cells closed by next <td>
      "<tr><td>beta<td>7<td>red" + // rows closed by next <tr>
      "</table></body>"
    val r = HtmlExtract.extract(html)
    assert(r.text == "alpha | 42 | blue\nbeta | 7 | red", r.text)
  }

  test("html: data tables keep cells wrapped in block elements (td > div)") {
    import graft.core.html.HtmlExtract
    // the round-4 review scenario: every cell's content lives in a <div>;
    // direct-text-only buffering saw empty cells and silently fell back to
    // the layout path, dropping the short cells entirely
    val html = "<body><table>" +
      "<tr><td><div>alpha</div></td><td><div>42</div></td><td><div>blue</div></td></tr>" +
      "<tr><td><div>beta</div></td><td><div>7</div></td><td><div>red</div></td></tr>" +
      "</table></body>"
    val r = HtmlExtract.extract(html)
    assert(r.text == "alpha | 42 | blue\nbeta | 7 | red", r.text)
    assert(r.blocks.map(_.tagPath) == Vector("table"), r.blocks)
    // mixed: <p> wrappers inside cells of a data table
    val html2 = "<body><table>" +
      "<tr><td><p>gamma</p></td><td>11</td></tr>" +
      "<tr><td><p>delta</p></td><td>12</td></tr>" +
      "<tr><td><p>epsilon</p></td><td>13</td></tr>" +
      "</table></body>"
    val r2 = HtmlExtract.extract(html2)
    assert(r2.text == "gamma | 11\ndelta | 12\nepsilon | 13", r2.text)
  }

  test("html: figure captions kept (content prior), img alt text never leaks") {
    import graft.core.html.HtmlExtract
    val html = "<body><p>" + ("body text word " * 8) + "</p>" +
      "<figure><img src=\"/x.png\" alt=\"logo leak marker\">" +
      "<figcaption>Fig. 3 caption marker</figcaption></figure></body>"
    val r = HtmlExtract.extract(html)
    assert(r.text.contains("Fig. 3 caption marker"), r.text)
    assert(!r.text.contains("logo leak marker"), r.text)
    // a short standalone caption survives ONLY via the figcaption content
    // prior (9 chars: 9 < threshold 10 unboosted, 18 boosted)
    val r2 = HtmlExtract.extract("<body><figure><figcaption>Fig. tiny</figcaption></figure></body>")
    assert(r2.text == "Fig. tiny", r2.text)
  }

  test("html: link-farm tables are dropped by link density, not kept as data") {
    import graft.core.html.HtmlExtract
    val html = "<body><table>" +
      (1 to 4).map(i =>
        s"""<tr><td><a href="/a$i">item number $i</a></td><td><a href="/b$i">more</a></td></tr>""").mkString +
      "</table><p>" + ("real content word " * 10) + "</p></body>"
    val r = HtmlExtract.extract(html)
    assert(!r.text.contains("item number"), r.text)
    assert(r.text.contains("real content word"))
  }

  test("html: link-farm tables with block-wrapped links are still dropped") {
    import graft.core.html.HtmlExtract
    // links inside per-cell <div> wrappers: cell-direct linkChars is zero,
    // so only subtree link accounting (fullLinkChars) can catch this farm
    val html = "<body><table>" +
      (1 to 4).map(i =>
        s"""<tr><td><div><a href="/a$i">item number $i</a></div></td>""" +
          s"""<td><div><a href="/b$i">more here</a></div></td></tr>""").mkString +
      "</table><p>" + ("real content word " * 10) + "</p></body>"
    val r = HtmlExtract.extract(html)
    assert(!r.text.contains("item number"), r.text)
    assert(r.text.contains("real content word"))
  }

  test("html: short-cell link grids (calendar/pagination) die on content link density") {
    import graft.core.html.HtmlExtract
    // 5x7 grid of 1-2 char links: with density over the RENDERED string the
    // " | " separators dilute the links below the majority rule; the rule
    // must be evaluated over cell content chars
    val html = "<body><table>" +
      (0 until 5).map(r => "<tr>" + (1 to 7).map(c =>
        s"""<td><a href="/d${r * 7 + c}">${r * 7 + c}</a></td>""").mkString + "</tr>").mkString +
      "</table><p>" + ("real content word " * 10) + "</p></body>"
    val r = HtmlExtract.extract(html)
    assert(!r.text.contains(" | "), r.text)
    assert(r.text.contains("real content word"))
  }

  test("html: layout tables (few big cells) still score cells as prose") {
    import graft.core.html.HtmlExtract
    val para = "a long paragraph of body text living inside an old school layout table " +
      "with enough words that it is clearly the main content of this page"
    val html = s"<body><table><tr><td>$para</td></tr></table></body>"
    val r = HtmlExtract.extract(html)
    assert(r.text == para)
    assert(r.blocks.map(_.tagPath) == Vector("td"))
  }

  test("html: blocks report scores and offsets in spans") {
    import graft.core.html.HtmlExtract
    val html = "<body><p>" + ("word " * 40) + "</p></body>"
    val r = HtmlExtract.extract(html)
    assert(r.blocks.size == 1)
    assert(r.blocks(0).score > HtmlExtract.SCORE_THRESHOLD)
  }

  test("warc: oversized record skipped without breaking the stream") {
    import graft.sources.Warc
    val small = Warc.WarcRecord("u1", "2020-01-01T00:00:00Z", "response", "ok".getBytes)
    val out = new java.io.ByteArrayOutputStream()
    // handcraft: small + huge-declared (but we cap parse at MAX) + small
    def rec(r: Warc.WarcRecord): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: ${r.recordType}\r\nWARC-Target-URI: ${r.url}\r\n" +
        s"WARC-Date: ${r.warcDate}\r\nContent-Length: ${r.payload.length}\r\n\r\n").getBytes ++
        r.payload ++ "\r\n\r\n".getBytes
    out.write(rec(small))
    out.write(rec(Warc.WarcRecord("u2", "2020-01-01T00:00:00Z", "response",
      new Array[Byte](1024)))) // normal-sized stand-in; cap logic covered by unit bound
    out.write(rec(small.copy(url = "u3")))
    val records = Warc.parseStream(new java.io.ByteArrayInputStream(out.toByteArray), gzipped = false).toVector
    assert(records.map(_.url) == Vector("u1", "u2", "u3"))
  }
}
