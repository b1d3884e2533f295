package graft.core.pdf

import Lex._

/** Stream filter decoders (reference group B, SURVEY.md §2B).
  *
  * All take/return byte-strings. Filter chain semantics: common.cc:679-691
  * (left-to-right, per-filter /DecodeParms); supported set common.cc:185-189
  * (FlateDecode, LZWDecode, ASCII85Decode, ASCIIHexDecode; unknown -> throw).
  */
object Filters {

  /** zlib inflate (flate_decode.cc:43-55). Tolerates trailing garbage the
    * same way: inflate stops at stream end. */
  def flateDecode(data: String, opts: Dict): String = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(Bytes.arr(data))
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](4096)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => err("flate_decode: inflate error") }
        if (n == 0 && !inf.finished()) {
          if (inf.needsDictionary()) err("flate_decode: inflate error")
          // needsInput with no more input: truncated stream -> stop like ref (Z_BUF_ERROR throws there)
          if (inf.needsInput()) err("flate_decode: inflate error")
        }
        out.write(buf, 0, n)
      }
    } finally inf.end()
    val result = Bytes.str(out.toByteArray)
    if (opts.isEmpty) result else predictorDecode(result, opts)
  }

  /** PNG/TIFF predictor post-pass (common.cc:497-585). Byte-faithful port of
    * the row-state machine, including signed-char arithmetic wraparound. */
  def predictorDecode(data: String, opts: Dict): String = {
    val predictor = getDictVal(opts, "/Predictor", 1L).toInt
    val colors = getDictVal(opts, "/Colors", 1L).toInt
    val bpcs = getDictVal(opts, "/BitsPerComponent", 8L).toInt
    val columns = getDictVal(opts, "/Columns", 1L).toInt
    if (predictor == 1) return data
    var nextByteIsPredictor = predictor >= 10
    var curPredictor = if (predictor >= 10) -1 else predictor
    var curRowIndex = 0
    val bpp = (bpcs * colors) >> 3
    val rows = (columns * colors * bpcs) >> 3
    val prev = new Array[Byte](rows)
    val result = new StringBuilder(data.length)
    var pi = 0
    var len = data.length
    while (len > 0) {
      len -= 1
      val b = data.charAt(pi).toByte // signed, like const char*
      if (nextByteIsPredictor) {
        curPredictor = b + 10
        nextByteIsPredictor = false
      } else {
        curPredictor match {
          case 2 =>
            if (bpcs == 8) {
              val prevLocal = if (curRowIndex - bpp < 0) 0 else prev(curRowIndex - bpp)
              prev(curRowIndex) = (b + prevLocal).toByte
            } else err("predictor_decode: tiff predictor other than 8 BPC is not implemented")
          case 10 => prev(curRowIndex) = b
          case 11 =>
            val prevLocal = if (curRowIndex - bpp < 0) 0 else prev(curRowIndex - bpp)
            prev(curRowIndex) = (b + prevLocal).toByte
          case 12 => prev(curRowIndex) = (prev(curRowIndex) + b).toByte
          case 13 =>
            val prevLocal: Int = if (curRowIndex - bpp < 0) 0 else prev(curRowIndex - bpp)
            prev(curRowIndex) = (((prevLocal + prev(curRowIndex)) >> 1) + b).toByte
          case 14 | 15 => err(s"predictor_decode: predictor $curPredictor is invalid")
          case _ => // silently ignored, as in reference (common.cc:566-570)
        }
        curRowIndex += 1
      }
      pi += 1
      if (curRowIndex >= rows) {
        curRowIndex = 0
        nextByteIsPredictor = curPredictor >= 10
        var k = 0
        while (k < rows) { result.append((prev(k) & 0xff).toChar); k += 1 }
      }
    }
    result.toString
  }

  /** PDF LZW (lzw_decode.cc:39-130): 9->12-bit codes, table grows at sizes
    * 511/1023/2047, clear=256, EOD=257; optional predictor pass. */
  def lzwDecode(buf: String, opts: Dict): String = {
    val masks = Array(0x01ff, 0x03ff, 0x07ff, 0x0fff)
    val CLEAR = 0x0100
    val EOD = 0x0101
    def initTable(): scala.collection.mutable.ArrayBuffer[Array[Byte]] = {
      val t = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
      var i = 0
      while (i <= 255) { t += Array(i.toByte); i += 1 }
      t += Array.emptyByteArray // dummy 256 entry
      t
    }
    var mask = 0
    var codeLen = 9
    var table = initTable()
    var bufferBits = 0L
    var bufferSize = 0
    var old = 0
    var character: Byte = if (buf.nonEmpty) buf.charAt(0).toByte else 0
    val result = new java.io.ByteArrayOutputStream(buf.length * 3)
    var pi = 0
    var len = buf.length
    var done = false
    while (len > 0 && !done) {
      while (bufferSize <= 16 && len > 0) {
        bufferBits = (bufferBits << 8) | (buf.charAt(pi) & 0xff)
        bufferSize += 8
        pi += 1
        len -= 1
      }
      var continue = true
      while (bufferSize >= codeLen && continue) {
        val code = ((bufferBits >> (bufferSize - codeLen)) & masks(mask)).toInt
        bufferSize -= codeLen
        if (code == CLEAR) {
          mask = 0
          codeLen = 9
          table = initTable()
        } else if (code == EOD) {
          len = 0
          done = true
          continue = false
        } else {
          var data: Array[Byte] = null
          if (code >= table.size) {
            if (old >= table.size) err("lzw_decode: value out of range")
            data = table(old) :+ character
          } else data = table(code)
          result.write(data, 0, data.length)
          character = data(0)
          if (old < table.size) data = table(old) // "fix the first loop" quirk kept
          table += (data :+ character)
          old = code
          table.size match {
            case 511 | 1023 | 2047 => codeLen += 1; mask += 1
            case _ =>
          }
        }
      }
    }
    val s = Bytes.str(result.toByteArray)
    if (opts.isEmpty) s else predictorDecode(s, opts)
  }

  /** base85 (ascii85_decode.cc:41-81) */
  def ascii85Decode(buf: String, opts: Dict): String = {
    val powers = Array(85L * 85 * 85 * 85, 85L * 85 * 85, 85L * 85, 85L, 1L)
    var count = 0
    var tuple = 0L
    var foundEnd = false
    val result = new StringBuilder(buf.length * 4 / 5 + 4)
    def widePut(t: Long, bytes: Int): Unit = {
      if (bytes >= 1) result.append(((t >> 24) & 0xff).toChar)
      if (bytes >= 2) result.append(((t >> 16) & 0xff).toChar)
      if (bytes >= 3) result.append(((t >> 8) & 0xff).toChar)
      if (bytes >= 4) result.append((t & 0xff).toChar)
    }
    var i = 0
    var len = buf.length
    while (len > 0 && !foundEnd) {
      val c = buf.charAt(i)
      c match {
        case 'z' =>
          if (count != 0) err("ascii85_decode: count is not zero")
          widePut(tuple, 4)
        case '~' =>
          i += 1
          len -= 1
          if (len > 0 && buf.charAt(i) != '>') err("ascii85_decode: buffer is not >")
          foundEnd = true
        case '\n' | '\r' | '\t' | ' ' | '\u0000' | '\f' | '\b' | '\u007f' =>
        case _ =>
          if (c < '!' || c > 'u') err("ascii85_decode: *buffer is out of range")
          tuple += (c - '!') * powers(count)
          count += 1
          if (count == 5) {
            widePut(tuple, 4)
            count = 0
            tuple = 0
          }
      }
      len -= 1
      i += 1
    }
    // NOTE: reference emits nothing for a partial trailing group (no ~> flush)
    result.toString
  }

  /** hex pairs (ascii_hex_decode.cc:45-85) */
  def asciiHexDecode(buf: String, opts: Dict): String = {
    var low = true
    var decoded = 0
    val result = new StringBuilder(buf.length / 2 + 1)
    var i = 0
    var len = buf.length
    while (len > 0) {
      len -= 1
      val c = buf.charAt(i)
      if (c == '>') {
        if (!low) result.append(((decoded << 4) & 0xff).toChar)
        return result.toString
      }
      if (c == 0 || c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == ' ') {
        i += 1
      } else {
        val v = hexVal(c)
        if (low) { decoded = v; low = false }
        else {
          result.append((((decoded << 4) | v) & 0xff).toChar)
          low = true
          decoded = 0
        }
        i += 1
      }
    }
    if (!low) result.append(((decoded << 4) & 0xff).toChar)
    result.toString
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else err(s"ascii_hex_decode: bad hex char $c") // map::at -> throw

  /** /Filter dispatch (common.cc:185-189) */
  def apply(name: String, data: String, opts: Dict): String = name match {
    case "/FlateDecode" => flateDecode(data, opts)
    case "/LZWDecode" => lzwDecode(data, opts)
    case "/ASCII85Decode" => ascii85Decode(data, opts)
    case "/ASCIIHexDecode" => asciiHexDecode(data, opts)
    case other => err(s"unknown filter $other")
  }

  private def getFilters(props: Dict): Vector[String] = {
    val filters = props("/Filter")
    if (filters.tpe == Obj.NAME_OBJECT) Vector(filters.raw)
    else if (filters.tpe != Obj.ARRAY) err(s"get_filters: wrong filter type: ${filters.tpe}")
    else getArrayData(filters.raw, 0).map(_.raw)
  }

  private def getDecodeParams(src: Dict, nFilters: Int): Vector[Dict] =
    src.get("/DecodeParms") match {
      case None => Vector.fill(nFilters)(Map.empty[String, PVal])
      case Some(PVal(paramsData, Obj.DICTIONARY)) => Vector(getDictionaryData(paramsData, 0))
      case Some(PVal(paramsData, Obj.ARRAY)) =>
        // common.cc:142-158: scan "<<" occurrences inside the raw array text
        val out = Vector.newBuilder[Dict]
        var offset = 0
        var n = 0
        var go = true
        while (go) {
          offset = paramsData.indexOf("<<", offset)
          if (offset < 0) {
            if (n == 0) err("/DecodeParms must be dictionary or an array of dictionaries")
            go = false
          } else {
            val p = new Pos(offset)
            out += getDictionaryData(getDictionary(paramsData, p), 0)
            offset = p.i
            n += 1
          }
        }
        out.result()
      case Some(_) => err("wrong type for /DecodeParms")
    }

  /** apply /Filter chain (common.cc:679-691) */
  def decode(content: String, props: Dict): String = {
    if (!props.contains("/Filter")) return content
    val filters = getFilters(props)
    val params = getDecodeParams(props, filters.size)
    if (filters.size != params.size) err("different sizes for filters and decode_params")
    var result = content
    var i = 0
    while (i < filters.size) {
      result = apply(filters(i), result, params(i))
      i += 1
    }
    result
  }
}
