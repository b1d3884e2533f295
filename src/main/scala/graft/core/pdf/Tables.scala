package graft.core.pdf

import java.nio.charset.Charset

/** Static public-spec data tables, loaded once per JVM (executor) from
  * classpath resources:
  *
  *  - `encodings.tsv`    — PDF simple-font encodings (PDF 32000-1 Annex D):
  *                         StandardEncoding, MacRomanEncoding,
  *                         MacExpertEncoding, WinAnsiEncoding, with the
  *                         PDF-viewer conventions (WinAnsi 160->space,
  *                         173->hyphen) used by the reference
  *                         (converter_data.cc:9-772).
  *  - `glyphlist.tsv`    — Adobe Glyph List names -> unicode
  *                         (symbol_table.h, 4243 entries).
  *  - `std_widths.tsv`   — Standard-14 AFM widths (standard_widths.h).
  *  - `cmap_charsets.tsv`— predefined CJK CMap name -> charset
  *                         (converter_data.cc:774-926); iconv names mapped
  *                         to JDK charsets here.
  *
  * Values are stored as *byte-strings* (UTF-8 bytes, one char per byte) per
  * the kernel-wide convention.
  */
object Tables {
  final val DEFAULT = 0
  final val MAC_EXPERT = 1
  final val MAC_ROMAN = 2
  final val WIN = 3

  private def resource(name: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    if (in == null) Lex.err(s"missing resource $name")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  }

  private def unquote(q: String): String = {
    // minimal JSON string unescape (values were emitted with json.dumps)
    val s = q.substring(1, q.length - 1)
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        i += 1
        s.charAt(i) match {
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
          case other => sb.append(other)
        }
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** real unicode string -> UTF-8 byte-string */
  private def toByteString(s: String): String =
    Bytes.str(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** encoding id -> (code -> utf8 byte-string) */
  lazy val standardEncodings: Map[Int, Map[Int, String]] = {
    val m = scala.collection.mutable.Map[Int, scala.collection.mutable.Map[Int, String]]()
    resource("encodings.tsv").foreach { line =>
      val Array(enc, code, value) = line.split("\t", 3)
      val id = enc match {
        case "DEFAULT" => DEFAULT
        case "MAC_EXPERT" => MAC_EXPERT
        case "MAC_ROMAN" => MAC_ROMAN
        case "WIN" => WIN
      }
      m.getOrElseUpdate(id, scala.collection.mutable.Map.empty)(code.toInt) = toByteString(unquote(value))
    }
    m.map { case (k, v) => k -> v.toMap }.toMap
  }

  /** glyph name (with leading '/') -> utf8 byte-string (Adobe Glyph List) */
  lazy val symbolTable: Map[String, String] =
    resource("glyphlist.tsv").map { line =>
      val i = line.indexOf('\t')
      line.substring(0, i) -> toByteString(unquote(line.substring(i + 1)))
    }.toMap

  /** Standard-14 base font -> sorted (code, width) array (standard_widths.h) */
  lazy val standardWidths: Map[String, Array[(Int, Float)]] = {
    val m = scala.collection.mutable.Map[String, scala.collection.mutable.ArrayBuffer[(Int, Float)]]()
    resource("std_widths.tsv").foreach { line =>
      val Array(font, code, w) = line.split("\t", 3)
      m.getOrElseUpdate(font, scala.collection.mutable.ArrayBuffer.empty) += ((code.toInt, w.toFloat))
    }
    m.map { case (k, v) => k -> v.sortBy(_._1).toArray }.toMap
  }

  /** Standard-14 ascent/descent/height (fonts.cc:347-361) */
  val stdMetrics: Map[String, (Float, Float, Float)] = Map(
    "/Courier" -> ((627f, -194f, 1052f)),
    "/Courier-Bold" -> ((627f, -194f, 1060f)),
    "/Courier-BoldOblique" -> ((627f, -194f, 1060f)),
    "/Courier-Oblique" -> ((627f, -194f, 1052f)),
    "/Helvetica" -> ((718f, -207f, 1156f)),
    "/Helvetica-Bold" -> ((718f, -207f, 1190f)),
    "/Helvetica-BoldOblique" -> ((718f, -207f, 1190f)),
    "/Helvetica-Oblique" -> ((718f, -207f, 1156f)),
    "/Symbol" -> ((0f, 0f, 1303f)),
    "/Times-Bold" -> ((683f, -217f, 1153f)),
    "/Times-BoldItalic" -> ((683f, -217f, 1139f)),
    "/Times-Italic" -> ((683f, -217f, 1100f)),
    "/Times-Roman" -> ((683f, -217f, 1116f)),
    "/ZapfDingbats" -> ((0f, 0f, 963f)))

  private val iconv2jdk: Map[String, String] = Map(
    "UTF-16be" -> "UTF-16BE",
    "UTF-32be" -> "UTF-32BE",
    "Shift-JIS" -> "Shift_JIS",
    "Big-5" -> "Big5",
    "Big5" -> "Big5",
    "ISO-2022-JP" -> "ISO-2022-JP",
    "ISO-2022-JP-1" -> "ISO-2022-JP-2", // JDK lacks -1; -2 is a decode superset
    "ISO-2022-CN" -> "ISO-2022-CN",
    "ISO-2022-KR" -> "ISO-2022-KR",
    "EUC-CN" -> "GB2312",
    "EUC-JP" -> "EUC-JP",
    "EUC-KR" -> "EUC-KR",
    "EUC-TW" -> "x-EUC-TW",
    "UHC" -> "x-windows-949",
    "GBK" -> "GBK",
    "GB18030" -> "GB18030")

  /** predefined CMap name -> Some(charset) or None (=already UTF-8)
    * (converter_data.cc:774-926). Unknown name -> key miss -> caller throws,
    * matching the reference's `.at`. */
  lazy val cmapCharsets: Map[String, Option[Charset]] =
    resource("cmap_charsets.tsv").map { line =>
      val i = line.indexOf('\t')
      val name = line.substring(0, i)
      val cs = line.substring(i + 1)
      name -> (if (cs.isEmpty) None else Some(Charset.forName(iconv2jdk.getOrElse(cs, cs))))
    }.toMap

  /** vertical-writing predefined CMaps (charset_converter.cc:67-89) */
  lazy val verticalFonts: Set[String] =
    cmapCharsets.keySet.filter(_.endsWith("-V")) ++ Set("/Identity-V", "/V")
}
