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

  /** flat 256-slot lookup per encoding (null = absent) — the per-char hot
    * path in CharsetConverter.getString; values identical to
    * `standardEncodings` */
  lazy val standardEncodingsArr: Map[Int, Array[String]] =
    standardEncodings.map { case (id, tbl) =>
      val arr = new Array[String](256)
      tbl.foreach { case (c, v) => if (c >= 0 && c < 256) arr(c) = v }
      id -> arr
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
    // glibc iconv's BIG-5 maps the ETen extension rows (0xC6A1-0xC8FE:
    // kana/Cyrillic) to PUA U+F6A1.. — JDK "Big5" decodes them as kana.
    // JDK x-windows-950 reproduces iconv byte-for-byte (verified by the
    // full CMap sweep vs the reference binary).
    "Big-5" -> "x-windows-950",
    "Big5" -> "x-windows-950",
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

  /** vertical-writing predefined CMaps — the reference's EXPLICIT list
    * (charset_converter.cc:65-93), quirks preserved: "/GBK-EUC_V" (with the
    * underscore typo) IS in the list; "/GB-V", "/GB-EUC-V", "/GBK-EUC-V",
    * "/HKdla-B5-V"-style names NOT in the list are rendered horizontally.
    * A plain "-V"-suffix rule diverges (caught by the full CMap sweep). */
  val verticalFonts: Set[String] = Set(
    "/Identity-V", "/UniCNS-UCS2-V", "/GBK-EUC_V", "/GBpc-EUC-V",
    "/GBT-V", "/GBT-EUC-V", "/GBTpc-EUC-V", "/GBKp-EUC-V", "/GBK2K-V",
    "/UniGB-UCS2-V", "/UniGB-UTF8-V", "/UniGB-UTF16-V", "/UniGB-UTF32-V",
    "/B5-V", "/B5pc-V", "/ETen-B5-V", "/ETenms-B5-V", "/CNS1-V",
    "/CNS2-V", "/CNS-EUC-V", "/UniCNS-UTF8-V", "/UniCNS-UTF16-V",
    "/UniCNS-UTF32-V", "/ETHK-B5-V", "/HKdla-B5-V", "/HKdlb-B5-V",
    "/HKgccs-B5-V", "/HKm314-B5-V", "/HKm471-B5-V",
    "/HKscs-B5-V", "/V", "/RKSJ-V", "/EUC-V", "/83pv-RKSJ-V", "/Add-V",
    "/Add-RKSJ-V", "/Ext-V", "/Ext-RKSJ-V", "/NWP-V",
    "/90pv-RKSJ-V", "/90ms-RKSJ-V", "/90msp-RKSJ-V",
    "/78-V", "/78-RKSJ-V", "/78ms-RKSJ-V", "/78-EUC-V", "/UniJIS-UCS2-V",
    "/UniJIS-UCS2-HW-V", "/UniJIS-UTF8-V", "/UniJIS-UTF16-V",
    "/UniJIS-UTF32-V", "/UniJIS2004-UTF8-V",
    "/UniJIS2004-UTF16-V", "/UniJIS2004-UTF32-V",
    "/UniJISX0213-UTF32-V", "/UniJISX02132004-UTF32-V",
    "/UniAKR-UTF8-V", "/UniAKR-UTF16-V", "/UniAKR-UTF32-V",
    "/KSC-V", "/KSC-EUC-V",
    "/KSCpv-EUC-V", "/KSCms-EUC-V", "/KSCms-EUC-HW-V",
    "/KSC-Johab-V", "/UniKS-UCS2-V",
    "/UniKS-UTF8-V", "/UniKS-UTF16-V",
    "/UniKS-UTF32-V", "/Hojo-V", "/Hojo-EUC-V",
    "/UniHojo-UCS2-V", "/UniHojo-UTF8-V", "/UniHojo-UTF16-V",
    "/UniHojo-UTF32-V")
}
