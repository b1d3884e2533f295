package graft.pipeline

import java.sql.Timestamp
import graft.fixtures.PdfBuilder
import graft.fixtures.PdfBuilder._

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).
  *
  * Row `i` is a pure function of `(seed, i)` — generation happens on
  * executors via `spark.range(n).map(Corpus.row)`, so corpus creation scales
  * with the cluster and two bench runs see identical bytes. Each row also has
  * a by-construction golden text (`golden(i)`) for the diff suite.
  *
  * Mix: ~55% HTML pages, ~45% PDFs cycling through format variants
  * (classic xref / xref-stream+ObjStm / Flate / LZW / A85 / AHx / multi-
  * column / multi-page). Every 997th row is an oversized (~100x) payload to
  * exercise skew salting (FIXTURES.md §1).
  */
object Corpus {
  final val EPOCH_MS = 1577836800000L // 2020-01-01T00:00:00Z, fixed
  final val SKEW_EVERY = 997

  private val words = Array(
    "data", "spark", "engine", "extract", "page", "text", "layout", "stream",
    "filter", "object", "lexer", "font", "width", "glyph", "matrix", "column",
    "corpus", "golden", "byte", "ident", "scale", "shuffle", "salt", "skew",
    "lineage", "metric", "resume", "batch", "kernel", "vector", "token",
    "quality", "dedup", "hash", "bucket", "anchor", "content", "density")

  /** splitmix64 — deterministic, allocation-free */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def wordAt(seed: Long, i: Long, k: Int): String =
    words((((mix(seed ^ mix(i * 1315423911L + k)) & 0x7fffffffL) % words.length)).toInt)

  private def sentence(seed: Long, i: Long, k: Int, n: Int): String =
    (0 until n).map(j => wordAt(seed, i, k * 131 + j)).mkString(" ")

  def kindOf(i: Long): String = {
    val m = (i % 20).toInt
    if (m < 11) "html" else "pdf"
  }

  // ---- PDF side -------------------------------------------------------------
  /** deterministic line plan for PDF row i: (x, y, text) triples; layout-safe
    * positions (single column at x=72 or two columns), 12pt Courier. */
  private def pdfLines(seed: Long, i: Long, big: Boolean): Seq[(Float, Float, String)] = {
    val variant = (i % PDF_VARIANTS).toInt
    val nLines = if (big) 1500 else 4 + (mix(seed ^ i) & 7).toInt // per column
    val twoCol = variant == 5 && !big
    val mkText = (k: Int) => sentence(seed, i, k, 3)
    if (twoCol) {
      val left = (0 until nLines).map(k => (72f, 720f - 14f * k, mkText(k)))
      val right = (0 until nLines).map(k => (330f, 720f - 14f * k, mkText(1000 + k)))
      left ++ right
    } else (0 until nLines).map(k => (72f, 720f - 14f * k, mkText(k)))
  }

  private def contentFor(lines: Seq[(Float, Float, String)]): Array[Byte] = {
    val sb = new StringBuilder("BT\n/F1 12 Tf\n")
    var px = 0f
    var py = 0f
    lines.foreach { case (x, y, t) =>
      sb.append(s"${x - px} ${y - py} Td\n($t) Tj\n")
      px = x; py = y
    }
    sb.append("ET\n")
    bytes(sb.toString)
  }

  final val PDF_VARIANTS = 9

  def pdfPayload(seed: Long, i: Long): Array[Byte] = {
    import graft.fixtures.PdfBuilderAdvanced
    import graft.fixtures.PdfBuilderAdvanced.EncSpec
    val big = i % SKEW_EVERY == 0 && i > 0
    val lines = pdfLines(seed, i, big)
    val content = contentFor(lines)
    // skew rows are always uncompressed classic-xref so their byte size is
    // genuinely ~100x median (filters would deflate the repetitive text)
    val variant = if (big) 0 else (i % PDF_VARIANTS).toInt
    variant match {
      case 0 | 5 => onePage(content, Map("/F1" -> 5), Seq(courier(5)))
      case 1 => onePage(content, Map("/F1" -> 5), Seq(courier(5)),
        contentFilter = Some(("/FlateDecode", deflate _)))
      case 2 => onePage(content, Map("/F1" -> 5), Seq(courier(5)),
        contentFilter = Some(("/LZWDecode", lzwEncode _)))
      case 3 => onePage(content, Map("/F1" -> 5), Seq(courier(5)),
        useXrefStream = true, packIntoObjStm = Set(1, 2, 5),
        contentFilter = Some(("/FlateDecode", deflate _)))
      case 4 => onePage(content, Map("/F1" -> 5), Seq(courier(5)),
        contentFilter = Some(("/ASCII85Decode", ascii85Encode _)))
      case 6 => onePage(content, Map("/F1" -> 5), Seq(courier(5)),
        contentFilter = Some(("/ASCIIHexDecode", asciiHexEncode _)))
      case 7 => // RC4-encrypted (golden text identical to plain)
        PdfBuilderAdvanced.encryptedOnePage(content,
          EncSpec(revision = 3, keyBits = 128, aes = false,
            docId = Array.tabulate(16)(j => (mix(seed ^ i) >> (j * 4)).toByte)))
      case _ => // Identity-H CID font; codes are UTF-16BE of the same text
        val hexContent = identityHContent(lines)
        val fonts = PdfBuilderAdvanced.type0IdentityH(5, 7)
        onePage(hexContent, Map("/F1" -> 5), fonts)
    }
  }

  /** same line plan, but shown as <UTF-16BE hex> strings for Identity-H */
  private def identityHContent(lines: Seq[(Float, Float, String)]): Array[Byte] = {
    val sb = new StringBuilder("BT\n/F1 12 Tf\n")
    var px = 0f
    var py = 0f
    lines.foreach { case (x, y, t) =>
      val hex = t.flatMap(c => f"${c.toInt}%04X")
      sb.append(s"${x - px} ${y - py} Td\n<$hex> Tj\n")
      px = x; py = y
    }
    sb.append("ET\n")
    bytes(sb.toString)
  }

  /** by-construction expected text for PDF row i: single column => lines in
    * order; two columns => left column then right, each line + '\n'. Lines
    * are 14pt apart at 12pt Courier => one text box per column (§2D). */
  def pdfGolden(seed: Long, i: Long): String = {
    val big = i % SKEW_EVERY == 0 && i > 0
    val variant = (i % PDF_VARIANTS).toInt
    val nLines = if (big) 1500 else 4 + (mix(seed ^ i) & 7).toInt
    val mk = (k: Int) => sentence(seed, i, k, 3)
    if (variant == 5 && !big) {
      val left = (0 until nLines).map(k => mk(k) + "\n").mkString
      val right = (0 until nLines).map(k => mk(1000 + k) + "\n").mkString
      left + right
    } else (0 until nLines).map(k => mk(k) + "\n").mkString
  }

  // ---- HTML side ------------------------------------------------------------
  def htmlPayload(seed: Long, i: Long): Array[Byte] = {
    val big = i % SKEW_EVERY == 0 && i > 0
    val nParas = if (big) 400 else 2 + (mix(seed ^ (i + 7)) & 3).toInt
    val title = "Title " + sentence(seed, i, 9001, 4)
    val paras = (0 until nParas)
      .map(k => s"<p>${sentence(seed, i, 100 + k, 18)}.</p>")
      .mkString("\n")
    val nav = (0 until 5).map(k => s"""<a href="/x$k">${wordAt(seed, i, 5000 + k)}</a>""").mkString(" | ")
    val html =
      s"""<!DOCTYPE html>
         |<html><head><title>$title</title>
         |<script>var x = "never extracted";</script>
         |<style>.a { color: red }</style></head>
         |<body>
         |<nav>$nav</nav>
         |<header><div>site ${wordAt(seed, i, 6000)}</div></header>
         |<article>
         |<h1>$title</h1>
         |$paras
         |</article>
         |<aside>${sentence(seed, i, 7000, 4)}</aside>
         |<footer>© 2020 ${wordAt(seed, i, 8000)}</footer>
         |</body></html>""".stripMargin
    html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** golden for HTML row i: the h1 + paragraphs (the only blocks whose
    * text-density score clears the threshold), '\n'-joined. */
  def htmlGolden(seed: Long, i: Long): String = {
    val big = i % SKEW_EVERY == 0 && i > 0
    val nParas = if (big) 400 else 2 + (mix(seed ^ (i + 7)) & 3).toInt
    val title = "Title " + sentence(seed, i, 9001, 4)
    val paras = (0 until nParas).map(k => sentence(seed, i, 100 + k, 18) + ".")
    (title +: paras).mkString("\n")
  }

  // ---- rows ------------------------------------------------------------------
  def url(i: Long): String = s"https://fixture.test/${kindOf(i)}/$i"

  def row(seed: Long)(i: Long): PageRow = {
    val kind = kindOf(i)
    val payload = if (kind == "pdf") pdfPayload(seed, i) else htmlPayload(seed, i)
    val langs = Array("en", "de", "ru", "zh", "ja")
    val lang = langs((i % 5).toInt)
    PageRow(url(i), new Timestamp(EPOCH_MS + i * 61000L), payload, s"raw $i", lang)
  }

  def golden(seed: Long)(i: Long): (String, String) =
    (url(i), if (kindOf(i) == "pdf") pdfGolden(seed, i) else htmlGolden(seed, i))
}
