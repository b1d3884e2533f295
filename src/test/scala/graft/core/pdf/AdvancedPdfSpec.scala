package graft.core.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.PdfBuilder._
import graft.fixtures.PdfBuilderAdvanced._
import graft.fixtures.PdfBuilderAdvanced

/** Fixture-matrix coverage (FIXTURES.md §3): encodings, ToUnicode, CID
  * fonts, embedded font programs, encryption, XObjects, prev-chain. */
class AdvancedPdfSpec extends AnyFunSuite {

  private def extract(pdf: Array[Byte]): String =
    new String(PdfExtract.pdf2txt(pdf), java.nio.charset.StandardCharsets.UTF_8)

  private def simpleContent(text: String): Array[Byte] =
    bytes(s"BT\n/F1 12 Tf\n72 720 Td\n($text) Tj\nET\n")

  test("encrypted RC4 /R 2 (40-bit)") {
    val enc = EncSpec(revision = 2, keyBits = 40, aes = false, docId = Array.tabulate(16)(_.toByte))
    val pdf = encryptedOnePage(simpleContent("rc4 forty"), enc)
    assert(extract(pdf) == "rc4 forty\n")
  }

  test("encrypted RC4 /R 3 (128-bit)") {
    val enc = EncSpec(revision = 3, keyBits = 128, aes = false, docId = Array.tabulate(16)(i => (i * 7).toByte))
    val pdf = encryptedOnePage(simpleContent("rc4 full"), enc)
    assert(extract(pdf) == "rc4 full\n")
  }

  test("encrypted AESV2 /R 4") {
    val enc = EncSpec(revision = 4, keyBits = 128, aes = true, docId = Array.tabulate(16)(i => (i * 13).toByte))
    val pdf = encryptedOnePage(simpleContent("aes secret"), enc)
    assert(extract(pdf) == "aes secret\n")
  }

  test("/Differences remap: codes render as mapped glyph names") {
    // map code 65 ('A') -> /Z and 66 ('B') -> /exclam
    val font = fontWithDifferences(5, "65 /Z /exclam")
    val pdf = onePage(simpleContent("AB C"), Map("/F1" -> 5), Seq(font))
    assert(extract(pdf) == "Z! C\n")
  }

  test("ToUnicode bfchar overrides byte meaning") {
    val cmap = toUnicodeCMap(Seq(0x41 -> "Ω", 0x42 -> "β"))
    val tu = streamObj(7, bytes(cmap))
    val font = fontWithToUnicode(5, 7)
    val pdf = onePage(simpleContent("AB ok"), Map("/F1" -> 5), Seq(font, tu))
    assert(extract(pdf) == "Ωβ ok\n")
  }

  test("ToUnicode bfrange with string increment") {
    val cmap = toUnicodeCMap(Nil, Seq((0x61, 0x63, "x"))) // a..c -> x,y,z
    val tu = streamObj(7, bytes(cmap))
    val font = fontWithToUnicode(5, 7)
    val pdf = onePage(simpleContent("abc"), Map("/F1" -> 5), Seq(font, tu))
    assert(extract(pdf) == "xyz\n")
  }

  test("Identity-H CID font: 2-byte codes to UTF-16BE") {
    val fonts = type0IdentityH(5, 7)
    // <00480069> = "Hi" in UTF-16BE 2-byte codes
    val content = bytes("BT\n/F1 12 Tf\n72 720 Td\n<00480069> Tj\nET\n")
    val pdf = onePage(content, Map("/F1" -> 5), fonts)
    assert(extract(pdf) == "Hi\n")
  }

  test("TrueType FontFile2 format-4 cmap decodes gid byte-pairs") {
    val ttf = minimalTrueType(Seq('H' -> 'H'.toInt, 'i' -> 'i'.toInt)) // gid == unicode
    val widths = (0 until 256).map(_ => "600").mkString(" ")
    val fontObjs = Seq(
      ObjSpec(5, "<< /Type /Font /Subtype /TrueType /BaseFont /FixtureTT " +
        s"/FirstChar 0 /LastChar 255 /Widths [$widths] /FontDescriptor 7 0 R >>"),
      ObjSpec(7, "<< /Type /FontDescriptor /FontName /FixtureTT /Flags 4 " +
        "/FontBBox [0 -200 1000 900] /Ascent 700 /Descent -200 /FontFile2 8 0 R >>"),
      streamObj(8, ttf))
    // shown string holds num2string(gid) byte pairs: <00480069>
    val content = bytes("BT\n/F1 12 Tf\n72 720 Td\n<00480069> Tj\nET\n")
    val pdf = onePage(content, Map("/F1" -> 5), fontObjs)
    assert(extract(pdf) == "Hi\n")
  }

  test("Type1 FontFile cmap is built but never consulted (reference quirk)") {
    // font_file.cc builds the dup/put map, but cmap.sizes stays all-zero, so
    // custom_decode_symbol never matches; bytes fall back to the Standard
    // table per-byte (converter_engine.cc:44-56).
    val t1 = type1FontProgram(Seq('A'.toInt -> "Z", 'B'.toInt -> "exclam"))
    val fontObjs = fontWithFontFile(5, 7, 8) :+ streamObj(8, t1)
    val pdf = onePage(simpleContent("AB ok"), Map("/F1" -> 5), fontObjs)
    assert(extract(pdf) == "AB ok\n") // NOT "Z! ok": the quirk preserved
  }

  test("Form XObject via Do: rendered as separate group, /Matrix ignored (\"Matrix\" quirk)") {
    val xContent = bytes("BT\n/F1 12 Tf\n72 600 Td\n(from xobject) Tj\nET\n")
    val pageContent = bytes("BT\n/F1 12 Tf\n72 720 Td\n(from page) Tj\nET\n/X1 Do\n")
    val objs = Seq(
      ObjSpec(1, "<< /Type /Catalog /Pages 2 0 R >>"),
      ObjSpec(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      ObjSpec(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 6 0 R >> /XObject << /X1 7 0 R >> >> /Contents 4 0 R >>"),
      ObjSpec(4, s"<< /Length ${pageContent.length} >>", Some(pageContent)),
      courier(6),
      formXObject(7, xContent))
    val pdf = classicXref(objs, 1)
    assert(extract(pdf) == "from page\nfrom xobject\n")
  }

  test("incremental update /Prev chain: newest xref wins") {
    val c1 = simpleContent("original text")
    val base = onePage(c1, Map("/F1" -> 5), Seq(courier(5)))
    val c2 = simpleContent("updated text")
    val updated = PdfBuilderAdvanced.withIncrementalUpdate(base, c2, 4)
    assert(extract(updated) == "updated text\n")
    assert(extract(base) == "original text\n")
  }

  test("MAX_BOXES bail-out: >300 boxes concatenated in document order") {
    // 301 isolated chunks (far apart, no line/box merging)
    val sb = new StringBuilder("BT\n/F1 4 Tf\n")
    val texts = (0 until 301).map(i => s"t$i")
    var prevX = 0f
    var prevY = 0f
    texts.zipWithIndex.foreach { case (t, i) =>
      val x = (i % 17) * 36f
      val y = 770f - (i / 17) * 43f
      sb.append(s"${x - prevX} ${y - prevY} Td\n($t) Tj\n")
      prevX = x
      prevY = y
    }
    sb.append("ET\n")
    val pdf = onePage(bytes(sb.toString), Map("/F1" -> 5), Seq(courier(5)))
    val out = extract(pdf)
    // document order concat, each line still ends with '\n' from merge_lines
    assert(out == texts.map(_ + "\n").mkString)
  }

  test("zero-width chunks group into neighbors (group_zero_lines)") {
    // Tz 0 makes zero-advance text => zero-width chunk
    val content = bytes(
      "BT\n/F1 12 Tf\n72 720 Td\n(visible) Tj\nET\n" +
        "BT\n/F1 12 Tf\n0 Tz\n200 720 Td\n(zero1) Tj\n(zero2) Tj\nET\n")
    val pdf = onePage(content, Map("/F1" -> 5), Seq(courier(5)))
    val out = extract(pdf)
    assert(out.contains("visible"))
    assert(out.contains("zero1"))
  }
}
