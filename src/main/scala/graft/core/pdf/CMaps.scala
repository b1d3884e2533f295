package graft.core.pdf

import Lex._

/** Code->unicode map with multi-byte code lengths (reference cmap_t,
  * cmap.h:13-24). Keys are raw code byte-strings; values are UTF-16BE
  * byte-strings lazily converted to UTF-8 on first hit
  * (to_unicode_converter.cc:46-50), or already-final byte-strings.
  */
final class CMapT {
  val utfMap = scala.collection.mutable.Map.empty[String, CMapT.Entry]
  /** during build: flags indexed by code length 1..4; finalized to the
    * dedup'd insertion-order length list by `finalizeSizes` (cmap.cc:29-41) */
  var sizes: Array[Int] = new Array[Int](CMapT.MAX_CODE_LENGTH + 1)
  var sizeList: Array[Int] = Array.emptyIntArray
  var isVertical: Boolean = false

  def markSize(len: Int): Unit = if (len <= CMapT.MAX_CODE_LENGTH) sizes(len) = 1

  /** reference get_sizes: compacts the flag array preserving the quirky
    * in-place order (effectively ascending lengths) */
  def finalizeSizes(): Unit = {
    val out = Array.newBuilder[Int]
    var j = 1
    while (j <= CMapT.MAX_CODE_LENGTH) {
      if (sizes(j) != 0) out += j
      j += 1
    }
    sizeList = out.result()
  }
}

object CMapT {
  final val MAX_CODE_LENGTH = 4 // PDF 32000-1 §9.7.6.2

  final class Entry(var converted: Boolean, var value: String)

  def entryConverted(v: String) = new Entry(true, v)
  def entryUtf16(v: String) = new Entry(false, v)
}

/** /ToUnicode CMap stream parser (cmap.cc:216-262): beginbfchar /
  * beginbfrange (incl. array form and string-increment) / WMode. */
object ToUnicodeCMap {

  private val HEX_DIGITS = "01234567890abcdefABCDEF" // reference's set, cmap.cc:17

  private sealed trait Tok
  private final case class Dec(v: String) extends Tok
  private final case class Hex(v: String) extends Tok
  private final case class Arr(v: String) extends Tok

  /** cmap.cc:70-108 */
  private def getToken(line: String, p: Pos): Tok = {
    var start = findFirstOf(line, "<[", p.i)
    if (start < 0) {
      start = efindNumber(line, p.i)
      var end = findFirstOf(line, " \t\n", start)
      if (end < 0) end = line.length
      p.i = end
      Dec(line.substring(start, end))
    } else if (line.charAt(start) == '<') {
      start += 1
      val end = efind(line, '>', start)
      p.i = end
      Hex(line.substring(start, end))
    } else {
      start += 1
      val end = efind(line, ']', start)
      p.i = end
      Arr(line.substring(start, end))
    }
  }

  /** hex text -> packed byte-string, whitespace-separated runs (cmap.cc:110-140) */
  private def getHexVal(hexStr: String): String = {
    val n = hexStr.length / 2 + (hexStr.length % 2)
    val sb = new StringBuilder(n)
    var j = 0
    var i = 0
    while (j < n) {
      val end = math.min(i + 2, hexStr.length)
      sb.append(strictStoul(hexStr.substring(i, end), 16).toChar)
      j += 1
      i += 2
    }
    sb.toString
  }

  private def convert2string(tok: Tok): String = tok match {
    case Hex(v) =>
      val sb = new StringBuilder
      var i = findFirstOf(v, HEX_DIGITS, 0)
      if (i < 0) err("convert2string: no hex digits")
      while (i >= 0) {
        var end = findFirstOf(v, " \t", i)
        if (end < 0) end = v.length
        sb.append(getHexVal(v.substring(i, end)))
        i = if (end >= v.length) -1 else findFirstOf(v, HEX_DIGITS, end)
      }
      sb.toString
    case Dec(v) => num2string(strictStoul(v, 10))
    case Arr(v) => err(s"convert2string: wrong token type. val =$v")
  }

  /** byte-string increment with carry (cmap.cc:142-153) */
  private[pdf] def inc(n: String): String = {
    if (n.isEmpty) err("inc: string is empty")
    val chars = n.toCharArray
    var i = chars.length - 1
    var byteV: Int = 0
    var done = false
    while (i >= 0 && !done) {
      chars(i) = ((chars(i) + 1) & 0xff).toChar
      byteV = chars(i)
      if (byteV != 0) done = true
      i -= 1
    }
    if (byteV == 0) "\u0001" + new String(chars) else new String(chars)
  }

  /** numeric <= over byte-strings ignoring leading zero bytes (cmap.cc:52-68) */
  private[pdf] def isLessEqual(s1: String, s2: String): Boolean = {
    def trim(s: String): Int = {
      var i = 0
      while (i < s.length && s.charAt(i) == 0) i += 1
      i
    }
    val i1 = trim(s1)
    val i2 = trim(s2)
    val l1 = s1.length - i1
    val l2 = s2.length - i2
    if (l1 < l2) return true
    if (l1 > l2) return false
    var a = i1
    var b = i2
    while (a < s1.length && b < s2.length) {
      val c1 = s1.charAt(a) & 0xff
      val c2 = s2.charAt(b) & 0xff
      if (c1 < c2) return true
      if (c1 > c2) return false
      a += 1
      b += 1
    }
    true
  }

  private def getBfrange(stream: String, offset: Int, cmap: CMapT): Int = {
    val p = new Pos(offset)
    val first = convert2string(getToken(stream, p))
    val second = convert2string(getToken(stream, p))
    getToken(stream, p) match {
      case t @ (Hex(_) | Dec(_)) =>
        var third = convert2string(t)
        var n = first
        while (isLessEqual(n, second)) {
          if (!cmap.utfMap.contains(n)) cmap.utfMap(n) = CMapT.entryUtf16(third)
          cmap.markSize(n.length)
          n = inc(n)
          third = inc(third)
        }
      case Arr(v) =>
        val tp = new Pos(0)
        var n = first
        while (isLessEqual(n, second)) {
          val dst = convert2string(getToken(v, tp))
          if (!cmap.utfMap.contains(n)) cmap.utfMap(n) = CMapT.entryUtf16(dst)
          cmap.markSize(n.length)
          n = inc(n)
        }
    }
    p.i + 1
  }

  private def getBfchar(stream: String, offset: Int, cmap: CMapT): Int = {
    val p = new Pos(offset)
    val src = convert2string(getToken(stream, p))
    val dst = convert2string(getToken(stream, p))
    if (!cmap.utfMap.contains(src)) cmap.utfMap(src) = CMapT.entryUtf16(dst)
    cmap.markSize(src.length)
    p.i + 1
  }

  /** cmap.cc:216-262 */
  def parse(stream: String): CMapT = {
    val NONE = 0; val BFCHAR = 1; val BFRANGE = 2; val WMODE = 3
    var state = NONE
    val result = new CMapT
    result.isVertical = false
    var start = findFirstNotOf(stream, " \t\n\r", 0)
    var end = if (start < 0) -1 else findFirstOf(stream, " \t\n\r", start)
    var break_ = false
    while (start >= 0 && !break_) {
      if (end < 0) end = stream.length
      if (stream.charAt(start) == '%') {
        end = stream.indexOf('\n', start)
        if (end < 0) break_ = true
      }
      if (!break_) {
        val token = stream.substring(start, end)
        val newState = token match {
          case "beginbfchar" => Some(BFCHAR)
          case "beginbfrange" => Some(BFRANGE)
          case "endbfchar" | "endbfrange" => Some(NONE)
          case "/WMode" => Some(WMODE)
          case _ => None
        }
        newState match {
          case Some(ns) => state = ns
          case None =>
            state match {
              case NONE => // fall through to advance
              case BFCHAR => end = getBfchar(stream, start, result)
              case BFRANGE => end = getBfrange(stream, start, result)
              case WMODE =>
                val p = new Pos(start)
                result.isVertical = strictStoul(getValue(stream, p)) == 1
                end = p.i
                state = NONE
              case _ =>
            }
            if (state != NONE || newState.isEmpty) {
              if (end < 0 || end > stream.length - 2) break_ = true
            }
        }
        if (!break_) {
          // for-loop increment (cmap.cc:225-227)
          start = findFirstNotOf(stream, " \t\n\r", end)
          end = if (start < 0) -1 else findFirstOf(stream, " \t\n\r", start)
        }
      }
    }
    result.finalizeSizes()
    result
  }
}

/** Embedded Type1 /FontFile scanner (font_file.cc:26-57): collect
  * `dup <code> /<glyphname> put` entries before `currentfile eexec`. */
object FontFileType1 {
  def parse(stream: String): CMapT = {
    val cmap = new CMapT
    cmap.isVertical = false
    val st = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = skipComments(stream, 0, validate = false)
    while (i >= 0 && i < stream.length) {
      val p = new Pos(i)
      val token = getToken(stream, p)
      i = p.i
      if (st.isEmpty) st += token
      else if (token == "eexec" && st.last == "currentfile") {
        cmap.sizeList = cmap.sizes.clone(); return cmap
      } else if (token == "put") {
        if (st.isEmpty) err("pop: stack is empty")
        val name = st.remove(st.length - 1)
        if (st.isEmpty) err("pop: stack is empty")
        val source0 = st.remove(st.length - 1)
        // get_binary: subtract '0' from every char (font_file.cc:21-24)
        val source = source0.map(c => ((c - '0') & 0xffff).toChar).mkString
        val target = Tables.symbolTable.getOrElse(name, "")
        if (!cmap.utfMap.contains(source)) cmap.utfMap(source) = CMapT.entryConverted(target)
      } else st += token
      i = skipComments(stream, i, validate = false)
    }
    // reference never compacts this cmap's sizes (font_file.cc:32-56): the
    // raw zero flags mean custom_decode_symbol never consults it -- kept.
    cmap.sizeList = cmap.sizes.clone()
    cmap
  }
}

/** Embedded TrueType /FontFile2 cmap-table parser (font_file2.cc:21-210):
  * formats 0/2/4/6/12. */
object FontFileTrueType {
  def parse(stream: String): CMapT = {
    val TAG_SIZE = 4
    val tablesNum = getUInt16BE(stream, 4)
    var i = 0
    var found = -1
    while (i < tablesNum && found < 0) {
      val off = i * (TAG_SIZE + 4 * 3) + (4 + 2 * 4)
      if (off + TAG_SIZE <= stream.length && stream.substring(off, off + TAG_SIZE) == "cmap") found = i
      else i += 1
    }
    if (found < 0) { val c = new CMapT; c.sizeList = c.sizes.clone(); return c }
    val tableOffset = getUInt32BE(stream, found * 16 + 20).toInt
    var offset = tableOffset + 2
    val subtablesNum = getUInt16BE(stream, offset)
    offset += 2 * 3
    val mappingOffsets = new Array[Int](subtablesNum)
    var k = 0
    while (k < subtablesNum) {
      mappingOffsets(k) = tableOffset + getUInt32BE(stream, offset).toInt
      offset += 2 * 2 + 4
      k += 1
    }
    val result = new CMapT
    result.isVertical = false
    mappingOffsets.foreach { off =>
      getUInt16BE(stream, off) match {
        case 0 => format0(result, stream, off)
        case 2 => format2(result, stream, off)
        case 4 => format4(result, stream, off)
        case 6 => format6(result, stream, off)
        case 12 => format12(result, stream, off)
        case _ =>
      }
    }
    // raw flag array, not compacted (get_FontFile2 never calls get_sizes)
    result.sizeList = result.sizes.clone()
    result
  }

  /** codepoint -> minimal big-endian byte-string (font_file2.cc:68-84);
    * NOTE: this is the reference's output byte layout, kept verbatim —
    * codepoints >0x7F yield raw (non-UTF-8) bytes exactly as upstream. */
  private def rawBytes(c: Long): String = {
    if (c == 0) return ""
    var n = c
    val sb = new StringBuilder
    while (n != 0) { sb.insert(0, (n & 0xff).toChar); n >>>= 8 }
    sb.toString
  }

  private def put(cmap: CMapT, key: String, e: CMapT.Entry): Unit =
    if (!cmap.utfMap.contains(key)) cmap.utfMap(key) = e

  private def format0(cmap: CMapT, stream: String, off0: Int): Unit = {
    cmap.sizes(0) = 2
    val off = off0 + 2 * 3
    var i = 0
    while (i < 256) {
      val g = stream.charAt(off + i) // get_integer<char>: single byte
      put(cmap, String.valueOf(g), CMapT.entryUtf16(Lex.num2string(i & 0xff)))
      i += 1
    }
  }

  private def format2(cmap: CMapT, stream: String, off0: Int): Unit = {
    var off = off0 + 2 * 3
    val subheaderKeys = new Array[Int](256)
    var i = 0
    while (i < 256) { subheaderKeys(i) = getUInt16BE(stream, off); off += 2; i += 1 }
    val firstBytes = new Array[Int](65535 / 8)
    i = 0
    while (i < 256) { firstBytes(subheaderKeys(i) / 8) = i; i += 1 }
    val ndhrs = subheaderKeys.max / 8 + 1
    final case class Sub(firstCode: Int, entryCount: Int, idDelta: Int, idRangeOffset: Int)
    val hdrs = scala.collection.mutable.ArrayBuffer.empty[Sub]
    var h = 0
    while (h < ndhrs) {
      val firstCode = getUInt16BE(stream, off); off += 2
      val entryCount = getUInt16BE(stream, off); off += 2
      val idDelta = getInt16BE(stream, off); off += 2
      val idRangeOffset = getUInt16BE(stream, off); off += 2
      hdrs += Sub(firstCode, entryCount, idDelta, off - 2 + idRangeOffset)
      var s = 0
      while (s < hdrs.length) {
        val sub = hdrs(s)
        if (sub.entryCount != 0) {
          val first = sub.firstCode + (firstBytes(s) << 8)
          var j = 0
          while (j < sub.entryCount) {
            var gid = getUInt16BE(stream, sub.idRangeOffset)
            if (gid != 0) gid += sub.idDelta
            put(cmap, Lex.num2string((gid & 0xffff).toLong), CMapT.entryConverted(rawBytes(first + j)))
            j += 1
          }
        }
        s += 1
      }
      h += 1
    }
  }

  private def format4(cmap: CMapT, stream: String, off0: Int): Unit = {
    cmap.sizes(0) = 2
    var off = off0 + 2 * 3
    val segCount = getUInt16BE(stream, off) / 2
    off += 2 * 4
    val ecs = new Array[Int](segCount)
    var i = 0
    while (i < segCount) { ecs(i) = getUInt16BE(stream, off); off += 2; i += 1 }
    off += 2
    val scs = new Array[Int](segCount)
    i = 0
    while (i < segCount) { scs(i) = getUInt16BE(stream, off); off += 2; i += 1 }
    val idds = new Array[Int](segCount)
    i = 0
    while (i < segCount) { idds(i) = getInt16BE(stream, off); off += 2; i += 1 }
    val pos = off
    val idrs = new Array[Int](segCount)
    i = 0
    while (i < segCount) { idrs(i) = getUInt16BE(stream, off); off += 2; i += 1 }
    i = 0
    while (i < segCount) {
      if (ecs(i) != 0xffff) {
        if (idrs(i) != 0) {
          var off2 = pos + idrs(i)
          var c = scs(i)
          while (c <= ecs(i)) {
            put(cmap, Lex.num2string((getUInt16BE(stream, off2) + idds(i)) & 0xffffffffL),
              CMapT.entryConverted(rawBytes(c)))
            c += 1
            off2 += 2
          }
        } else {
          var c = scs(i)
          while (c <= ecs(i)) {
            put(cmap, Lex.num2string((c + idds(i)) & 0xffffffffL), CMapT.entryConverted(rawBytes(c)))
            c += 1
          }
        }
      }
      i += 1
    }
  }

  private def format6(cmap: CMapT, stream: String, off0: Int): Unit = {
    cmap.sizes(0) = 2
    var off = off0 + 2 * 3
    val firstCode = getUInt16BE(stream, off); off += 2
    val entryCount = getUInt16BE(stream, off); off += 2
    var i = 0
    while (i < entryCount) {
      put(cmap, Lex.num2string(getUInt16BE(stream, off).toLong),
        CMapT.entryUtf16(Lex.num2string((i + firstCode).toLong)))
      off += 2
      i += 1
    }
  }

  private def format12(cmap: CMapT, stream: String, off0: Int): Unit = {
    var off = off0 + 2 * 2 + 4 * 2
    val nGroups = getUInt32BE(stream, off)
    off += 4
    var i = 0L
    while (i < nGroups) {
      val startCharCode = getUInt32BE(stream, off); off += 4
      val endCharCode = getUInt32BE(stream, off); off += 4
      val startGlyphCode = getUInt32BE(stream, off); off += 4
      var c = startCharCode
      while (c <= endCharCode) {
        put(cmap, Lex.num2string(c + startGlyphCode), CMapT.entryConverted(rawBytes(c)))
        c += 1
      }
      i += 1
    }
  }
}
