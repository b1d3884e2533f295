package graft.core.pdf

import Lex._
import scala.collection.immutable.VectorBuilder

/** PDF file-structure scan: startxref/trailer chain, classic + stream xref,
  * object offsets, /Encrypt dict. Reference: parser.cc:14-318,344-400.
  */
object Xref {
  private val CROSS_REFERENCE_LINE_SIZE = 20
  private val BYTE_OFFSET_LEN = 10
  private val GENERATION_NUMBER_LEN = 5

  def isPrefix(buffer: String, offset: Int, pre: String): Boolean =
    buffer.regionMatches(offset, pre, 0, pre.length)

  /** parser.cc:29-44 */
  def getCrossRefOffset(buffer: String): Int = {
    var off = buffer.lastIndexOf("startxref")
    if (off < 0) err("get_cross_ref_offset: can`t find startxref")
    off += "startxref".length
    off = skipComments(buffer, off)
    val end = findFirstNotOf(buffer, "0123456789", off)
    if (end < 0) err("can`t find end of trailer offset number")
    val r = strictStoul(buffer.substring(off, end))
    if (r >= buffer.length) err(s"$r is larger than buffer size ${buffer.length}")
    r.toInt
  }

  /** parser.cc:79-140: walk the /Prev chain, loop-guarded. */
  def getTrailerOffsets(buffer: String, crossRefOffset: Int): Vector[(Int, Int)] = {
    val old = isPrefix(buffer, crossRefOffset, "xref")
    val out = new VectorBuilder[(Int, Int)]
    val seen = scala.collection.mutable.Set[Int](crossRefOffset)
    var cur = crossRefOffset
    var go = true
    while (go) {
      var end = buffer.indexOf("\r\nstartxref\r\n", cur)
      if (end < 0) end = buffer.indexOf("\nstartxref\n", cur)
      if (end < 0) end = buffer.indexOf("\rstartxref\r", cur)
      if (end < 0) err(s"Can`t find startxref in pos: $cur")
      out += ((cur, end))
      val dictOffset =
        if (old) efind(buffer, "trailer", cur) + "trailer".length
        else efind(buffer, "<<", cur)
      val data = getDictionaryData(buffer, dictOffset)
      data.get("/Prev") match {
        case None => go = false
        case Some(v) =>
          if (v.tpe != Obj.VALUE) err("/Prev value is not PDF VALUE type")
          cur = strictStoul(v.raw).toInt
          if (seen.contains(cur)) go = false else seen += cur
      }
    }
    out.result()
  }

  /** classic xref record status (parser.cc:46-66) */
  private def appendObject(buf: String, offset: Int, objects: VectorBuilder[Int]): Unit = {
    if (offset + BYTE_OFFSET_LEN >= buf.length) err("object info record is too small")
    if (buf.charAt(offset + BYTE_OFFSET_LEN) != ' ') err("no space for object info")
    objects += strictStoul(buf.substring(offset, offset + BYTE_OFFSET_LEN)).toInt
  }

  private def getObjectStatus(buffer: String, offset: Int): Char = {
    val start = offset + BYTE_OFFSET_LEN + GENERATION_NUMBER_LEN + 1
    if (start + 2 >= buffer.length) err("object info record is too small")
    if (buffer.charAt(start) != ' ') err("no space for object info record")
    val c2 = buffer.charAt(start + 2)
    if (c2 != '\r' && c2 != '\n' && c2 != ' ') err("no newline for object info record")
    val ret = buffer.charAt(start + 1)
    if (ret != 'n' && ret != 'f') err("info object record status entry must be 'n' or 'f'")
    ret
  }

  /** parser.cc:68-77 */
  private def getXrefNumber(buffer: String, p: Pos): Long = {
    p.i = efindFirstOf(buffer, "\r\t\n ", p.i)
    p.i = skipSpaces(buffer, p.i)
    val end = efindFirstOf(buffer, "\r\t\n ", p.i)
    val result = strictStoul(buffer.substring(p.i, end))
    p.i = skipSpaces(buffer, end)
    result
  }

  /** parser.cc:265-280 */
  private def getObjectOffsetsOld(buffer: String, offset0: Int, result: VectorBuilder[Int]): Unit = {
    val p = new Pos(efind(buffer, "xref", offset0) + "xref".length)
    while (true) {
      p.i = skipComments(buffer, p.i)
      if (isPrefix(buffer, p.i, "trailer")) return
      val n = getXrefNumber(buffer, p)
      var i = 0L
      while (i < n) {
        p.i = skipComments(buffer, p.i)
        if (getObjectStatus(buffer, p.i) == 'n') appendObject(buffer, p.i, result)
        p.i += CROSS_REFERENCE_LINE_SIZE
        i += 1
      }
    }
  }

  /** /W widths (parser.cc:149-170) */
  private def getW(dict: Dict): Array[Int] = {
    val w = dict.getOrElse("/W", err("can`t find /W"))
    if (w.tpe != Obj.ARRAY) err("/W value must have ARRAY type")
    val str = w.raw
    val result = new Array[Int](3)
    var i = 0
    var offset = findNumber(str, 0)
    while (offset < str.length) {
      val end = efindFirstOf(str, " \r\n]", offset)
      if (i >= 3) err("/W array must contain 3 elements")
      result(i) = strictStoul(str.substring(offset, end)).toInt
      if (result(i) > 8) err(s"${result(i)} is greater than max(uint64_t)")
      i += 1
      offset = findNumber(str, end)
    }
    if (i != 3) err("/W array must contain 3 elements")
    result
  }

  /** parser.cc:184-210 */
  private def getCrossReferenceEntry(stream: String, p: Pos, w: Array[Int]): Array[Long] = {
    val result = new Array[Long](3)
    var i = 0
    while (i < 3) {
      if (w(i) == 0) {
        result(i) = if (i == 0) 1L else 0L // table 17 defaults
      } else {
        if (p.i + w(i) > stream.length) err("not enough data in stream for entry")
        result(i) = getIntegerBE(stream, p.i, w(i))
        p.i += w(i)
      }
      i += 1
    }
    result
  }

  /** parser.cc:212-235 */
  private def getCrossRefEntries(dict: Dict): Long =
    dict.get("/Index") match {
      case None =>
        val size = dict.getOrElse("/Size", err("no /Size"))
        if (size.tpe != Obj.VALUE) err("/Size must have VALUE type")
        strictStoul(size.raw)
      case Some(idx) =>
        if (idx.tpe != Obj.ARRAY) err("/Index must be ARRAY")
        val arr = getArrayData(idx.raw, 0)
        if (arr.isEmpty) err("/Index array is empty")
        var entries = 0L
        var i = 0
        while (i < arr.size - 1) {
          if (arr(i + 1).tpe != Obj.VALUE) err("wrong type for /Index")
          entries += strictStoul(arr(i + 1).raw)
          i += 2
        }
        entries
    }

  /** parser.cc:237-263: xref stream */
  private def getObjectOffsetsNew(buffer: String, offset0: Int, result: VectorBuilder[Int]): Unit = {
    var offset = efind(buffer, "<<", offset0)
    val p = new Pos(offset)
    val dictRaw = getDictionary(buffer, p)
    val dict = getDictionaryData(dictRaw, 0)
    val lenVal = dict.getOrElse("/Length", err("can`t find /Length"))
    if (lenVal.tpe != Obj.VALUE) err("/Length value must have VALUE type")
    val length = strictStoul(lenVal.raw).toInt
    val content0 = DocUtil.getContent(buffer, length, offset)
    val content = Filters.decode(content0, dict)
    val w = getW(dict)
    val cp = new Pos(0)
    val n = getCrossRefEntries(dict)
    var i = 0L
    while (i < n) {
      val entry = getCrossReferenceEntry(content, cp, w)
      if (entry(0) == 1) result += entry(1).toInt
      i += 1
    }
  }

  /** parser.cc:142-147,282-318 */
  def getId2Offsets(buffer: String, trailerOffsets: Vector[(Int, Int)]): Map[Long, Long] = {
    val offsets = new VectorBuilder[Int]
    trailerOffsets.foreach { case (start, _) =>
      val off = skipComments(buffer, start)
      if (isPrefix(buffer, off, "xref")) getObjectOffsetsOld(buffer, off, offsets)
      else getObjectOffsetsNew(buffer, off, offsets)
    }
    val all = offsets.result()
    all.foreach { o => if (o >= buffer.length) err("offset is greater than pdf buffer") }
    var id2offsets = Map.empty[Long, Long]
    all.foreach { offset =>
      val start = efindNumber(buffer, skipComments(buffer, offset))
      val end = efindFirstOf(buffer, " \r\n\t", start)
      val id = strictStoul(buffer.substring(start, end))
      if (!id2offsets.contains(id)) id2offsets += id -> offset.toLong
    }
    id2offsets
  }

  /** /Encrypt + /ID from first trailer span (parser.cc:344-387) */
  def getEncryptData(buffer: String, start: Int, end: Int, id2offsets: Map[Long, Long]): Dict = {
    var off = buffer.indexOf("/Encrypt", start)
    if (off < 0 || off >= end) return Map.empty
    off += "/Encrypt".length
    val p = new Pos(off)
    val tpe = getObjectType(buffer, p)
    var result: Dict = tpe match {
      case Obj.DICTIONARY => getDictionaryData(buffer, p.i)
      case Obj.INDIRECT_OBJECT =>
        val endOff = efindFirstOf(buffer, "\r\t\n ", p.i)
        val pair = getObject(buffer, strictStoul(buffer.substring(p.i, endOff)), id2offsets)
        if (pair.tpe != Obj.DICTIONARY) err("Encrypt indirect object must be DICTIONARY")
        getDictionaryData(pair.raw, 0)
      case t => err(s"wrong /Encrypt value: $t")
    }
    // get_id (parser.cc:344-352)
    var ido = efind(buffer, "/ID", start)
    if (ido >= end) err("Can`t find /ID key")
    ido = efind(buffer, '[', ido)
    if (ido >= end) err("Can`t find /ID value")
    val ip = new Pos(ido)
    val idArr = getArray(buffer, ip)
    if (!result.contains("/ID")) result += "/ID" -> PVal(idArr, Obj.ARRAY)
    result
  }
}

/** Stream extraction + indirect-object plumbing shared across modules
  * (common.cc:102-120,642-691,717-726,763-787).
  */
object DocUtil {

  /** slice `len` bytes after `stream\r?\n` (common.cc:670-677) */
  def getContent(buffer: String, len: Int, offset0: Int): String = {
    var offset = efind(buffer, "stream", offset0) + "stream".length
    if (offset < buffer.length && buffer.charAt(offset) == '\r') offset += 1
    if (offset < buffer.length && buffer.charAt(offset) == '\n') offset += 1
    buffer.substring(offset, math.min(offset + len, buffer.length))
  }

  /** /Length direct or via indirect object (common.h:102-120) */
  def getLength(buffer: String, resolve: Long => PVal, props: Dict): Int = {
    val r = props.getOrElse("/Length", err("no /Length"))
    if (r.tpe == Obj.VALUE) strictStoul(r.raw).toInt
    else if (r.tpe == Obj.INDIRECT_OBJECT) {
      val id = strictStoul(r.raw.substring(0, efindFirstOf(r.raw, " \r\n\t", 0)))
      val pair = resolve(id)
      if (pair.tpe != Obj.VALUE) err("length indirect obj must be VALUE")
      strictStoul(pair.raw).toInt
    } else err("wrong type for /Length")
  }

  /** resolve indirect ref -> object, with optional type check (common.cc:717-726) */
  def getIndirectObjectData(indirect: String, storage: ObjectStorage, tpe: Int = -1): PVal = {
    val id = strictStoul(indirect.substring(0, efindFirstOf(indirect, " \r\n\t", 0)))
    val r = storage.getObject(id)
    if (tpe != -1 && r.tpe != tpe) err(s"wrong type=$tpe val=${r.raw}")
    r
  }

  def getDictOrIndirectDict(data: PVal, storage: ObjectStorage): Dict = data.tpe match {
    case Obj.DICTIONARY => getDictionaryData(data.raw, 0)
    case Obj.INDIRECT_OBJECT =>
      getDictionaryData(getIndirectObjectData(data.raw, storage, Obj.DICTIONARY).raw, 0)
    case t => err(s"get_dict_or_indirect_dict: wrong object type $t")
  }

  def getArrayOrIndirectArray(data: PVal, storage: ObjectStorage): Arr = data.tpe match {
    case Obj.ARRAY => getArrayData(data.raw, 0)
    case Obj.INDIRECT_OBJECT =>
      getArrayData(getIndirectObjectData(data.raw, storage, Obj.ARRAY).raw, 0)
    case t => err(s"get_array_or_indirect_array: wrong object type $t")
  }

  /** fetch + decrypt + decode one stream object (common.cc:653-668) */
  def getStream(doc: String, idGen: (Long, Long), storage: ObjectStorage, decryptData: Dict): String = {
    val streamPair = storage.getObject(idGen._1)
    if (streamPair.tpe != Obj.DICTIONARY) err("stream must be a dictionary")
    val props = getDictionaryData(streamPair.raw, 0)
    val offset0 = efind(doc, "<<", storage.id2offsets(idGen._1).toInt)
    val p = new Pos(offset0)
    getDictionary(doc, p)
    var content = getContent(doc, getLength(doc, storage.getObject, props), offset0)
    content = Crypto.decrypt(idGen._1, idGen._2, content, decryptData)
    Filters.decode(content, props)
  }
}

/** Object store: direct objects by offset + eager /ObjStm expansion
  * (object_storage.cc:17-89).
  */
final class ObjectStorage(doc: String, val id2offsets: Map[Long, Long], decryptData: Dict) {
  private val id2objStm = scala.collection.mutable.Map.empty[Long, PVal]

  id2offsets.keys.toVector.sorted.foreach(insertObjStream)

  def getObject(id: Long): PVal =
    id2offsets.get(id) match {
      case Some(_) => Lex.getObject(doc, id, id2offsets)
      case None => id2objStm.getOrElse(id, err(s"no object $id"))
    }

  private def getGenId(offset0: Int): Long = {
    var offset = efindFirstOf(doc, " \r\t\n", offset0)
    offset = efindNumber(doc, offset)
    val end = efindFirstOf(doc, " \r\t\n", offset)
    strictStoul(doc.substring(offset, end))
  }

  private def insertObjStream(id: Long): Unit = {
    var offset = skipComments(doc, id2offsets(id).toInt)
    val genId = getGenId(offset)
    offset = skipComments(doc, offset)
    offset = efind(doc, "obj", offset) + "obj".length
    val p = new Pos(offset)
    if (getObjectType(doc, p) != Obj.DICTIONARY) return
    val dictP = new Pos(efind(doc, "<<", offset))
    val dictRaw = getDictionary(doc, dictP)
    val dict = getDictionaryData(dictRaw, 0)
    if (!dict.get("/Type").exists(_.raw == "/ObjStm")) return
    val len = DocUtil.getLength(doc, lexDirect, dict)
    var content = DocUtil.getContent(doc, len, offset)
    content = Crypto.decrypt(id, genId, content, decryptData)
    content = Filters.decode(content, dict)
    // (id, offset) pairs after header (object_storage.cc:71-89)
    val n = strictStoul(dict("/N").raw)
    var pairs = Vector.empty[(Long, Long)]
    var o = 0
    var i = 0L
    while (i < n) {
      o = efindNumber(content, o)
      var end = efindFirstNotOf(content, "0123456789", o)
      val oid = strictStoul(content.substring(o, end))
      o = efindNumber(content, end)
      end = efindFirstNotOf(content, "0123456789", o)
      val objOff = strictStoul(content.substring(o, end))
      pairs :+= ((oid, objOff))
      o = end
      i += 1
    }
    val first = strictStoul(dict("/First").raw)
    pairs.foreach { case (oid, objOff) =>
      val op = new Pos((first + objOff).toInt)
      val tpe = getObjectType(content, op)
      if (!id2objStm.contains(oid)) id2objStm(oid) = PVal(lexByType(tpe, content, op), tpe)
    }
  }

  private def lexDirect(id: Long): PVal = Lex.getObject(doc, id, id2offsets)
}
