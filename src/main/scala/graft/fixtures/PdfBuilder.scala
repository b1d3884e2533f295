package graft.fixtures

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Deterministic programmatic PDF assembly for fixtures and the synthetic
  * corpus. No external data; every byte is constructed here.
  *
  * Supports: classic xref tables, xref streams + /ObjStm packing, content
  * streams with arbitrary operators, Flate/LZW/A85/AHx filters (with real
  * encoders), simple and CID fonts, Form XObjects, incremental updates.
  */
object PdfBuilder {

  final case class ObjSpec(id: Int, body: String, stream: Option[Array[Byte]] = None)

  def bytes(s: String): Array[Byte] = s.getBytes(ISO_8859_1)
  def str(b: Array[Byte]): String = new String(b, ISO_8859_1)

  /** zlib-compress (for /FlateDecode fixtures) */
  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** PDF LZW encoder (early-change code growth, matching PDF readers) */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeLen = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << codeLen) | code
      bitCnt += codeLen
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.Map.empty[String, Int]
    def reset(): Unit = {
      dict.clear()
      var i = 0
      while (i < 256) { dict(i.toChar.toString) = i; i += 1 }
      codeLen = 9
    }
    reset()
    var next = 258
    emit(256) // clear
    var w = ""
    data.foreach { b =>
      val c = (b & 0xff).toChar
      if (dict.contains(w + c)) w += c
      else {
        emit(dict(w))
        dict(w + c) = next
        next += 1
        // early change: code length grows when next-1 hits the threshold
        if (next == 512) codeLen = 10
        else if (next == 1024) codeLen = 11
        else if (next == 2048) codeLen = 12
        else if (next == 4096) { emit(256); reset(); next = 258 }
        w = c.toString
      }
    }
    if (w.nonEmpty) emit(dict(w))
    emit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= data.length) {
      var t = 0L
      var k = 0
      while (k < 4) { t = (t << 8) | (data(i + k) & 0xff); k += 1 }
      if (t == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var j = 4
        while (j >= 0) { cs(j) = ((t % 85) + '!').toChar; t /= 85; j -= 1 }
        sb.appendAll(cs)
      }
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var t = 0L
      var k = 0
      while (k < 4) { t = (t << 8) | (if (i + k < data.length) data(i + k) & 0xff else 0); k += 1 }
      val cs = new Array[Char](5)
      var j = 4
      while (j >= 0) { cs(j) = ((t % 85) + '!').toChar; t /= 85; j -= 1 }
      sb.appendAll(cs.take(rem + 1))
    }
    sb.append("~>")
    bytes(sb.toString)
  }

  def asciiHexEncode(data: Array[Byte]): Array[Byte] =
    bytes(data.map(b => f"${b & 0xff}%02x").mkString + ">")

  /** PNG Up (12) predictor encode for xref streams */
  def pngUpEncode(data: Array[Byte], columns: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val prev = new Array[Byte](columns)
    var i = 0
    while (i < data.length) {
      out.write(2) // Up
      var j = 0
      while (j < columns) {
        val cur: Byte = if (i + j < data.length) data(i + j) else 0
        out.write((cur - prev(j)) & 0xff)
        prev(j) = cur
        j += 1
      }
      i += columns
    }
    out.toByteArray
  }

  /** Assemble a PDF with a classic xref table. Object ids must be 1..n dense
    * in `objs` order-independent; trailer gets /Size and /Root. */
  def classicXref(objs: Seq[ObjSpec], rootId: Int, extraTrailer: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(bytes(s))
    w("%PDF-1.4\n%âãÏÓ\n")
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    objs.sortBy(_.id).foreach { o =>
      offsets(o.id) = out.size()
      w(s"${o.id} 0 obj\n${o.body}")
      o.stream.foreach { s =>
        w("\nstream\n")
        out.write(s)
        w("\nendstream")
      }
      w("\nendobj\n")
    }
    val xrefOff = out.size()
    val n = objs.map(_.id).max + 1
    w(s"xref\n0 $n\n")
    w(f"${0}%010d ${65535}%05d f \n")
    (1 until n).foreach { id =>
      w(f"${offsets.getOrElse(id, 0)}%010d ${0}%05d n \n")
    }
    w(s"trailer\n<< /Size $n /Root $rootId 0 R $extraTrailer >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Assemble a PDF using an xref *stream* (PDF 1.5), optionally packing the
    * given object ids into an /ObjStm. The xref stream itself is
    * Flate+predictor(Up) encoded — exercising /W, /Index, /DecodeParms. */
  def xrefStream(
      objs: Seq[ObjSpec],
      rootId: Int,
      packIntoObjStm: Set[Int] = Set.empty,
      extraTrailer: String = "",
      objStmTransform: Array[Byte] => Array[Byte] = identity,
      packIntoObjStm2: Set[Int] = Set.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(bytes(s))
    w("%PDF-1.5\n%âãÏÓ\n")
    val maxId = objs.map(_.id).max
    val objStmId = maxId + 1
    // a SECOND sibling container (cross-container reference chasing);
    // when unused the layout is unchanged (xref id stays maxId+2)
    val objStm2Id = maxId + 2
    val xrefId = if (packIntoObjStm2.nonEmpty) maxId + 3 else maxId + 2
    require((packIntoObjStm intersect packIntoObjStm2).isEmpty, "object packed twice")
    val packed = objs.filter(o => packIntoObjStm.contains(o.id)).sortBy(_.id)
    val packed2 = objs.filter(o => packIntoObjStm2.contains(o.id)).sortBy(_.id)
    val direct = objs.filterNot(o =>
      packIntoObjStm.contains(o.id) || packIntoObjStm2.contains(o.id))
    require((packed ++ packed2).forall(_.stream.isEmpty), "cannot pack stream objects into ObjStm")

    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    direct.sortBy(_.id).foreach { o =>
      offsets(o.id) = out.size()
      w(s"${o.id} 0 obj\n${o.body}")
      o.stream.foreach { s =>
        w("\nstream\n")
        out.write(s)
        w("\nendstream")
      }
      w("\nendobj\n")
    }
    // /ObjStm: header of "id off" pairs, then bodies
    def writeObjStm(id: Int, members: Seq[ObjSpec], transform: Array[Byte] => Array[Byte]): Unit = {
      val objStmIndex = new StringBuilder
      val objStmBody = new StringBuilder
      members.foreach { o =>
        objStmIndex.append(s"${o.id} ${objStmBody.length} ")
        objStmBody.append(o.body).append('\n')
      }
      val first = objStmIndex.length
      // readers decrypt THEN decode, so an encrypting transform applies after
      // compression (transform = enc.encrypt(id, 0, _) builds the
      // encrypted + xref-stream + ObjStm combination)
      val content = transform(deflate(bytes(objStmIndex.toString + objStmBody.toString)))
      offsets(id) = out.size()
      w(s"$id 0 obj\n<< /Type /ObjStm /N ${members.size} /First $first /Length ${content.length} /Filter /FlateDecode >>")
      w("\nstream\n")
      out.write(content)
      w("\nendstream\nendobj\n")
    }
    if (packed.nonEmpty) writeObjStm(objStmId, packed, objStmTransform)
    if (packed2.nonEmpty) writeObjStm(objStm2Id, packed2, identity)
    // xref stream: W [1 4 2]; entries for ids 0..xrefId
    val xrefOff = out.size()
    val size = xrefId + 1
    val entryW = 1 + 4 + 2
    val raw = new java.io.ByteArrayOutputStream()
    def entry(t: Int, f2: Int, f3: Int): Unit = {
      raw.write(t)
      raw.write((f2 >> 24) & 0xff); raw.write((f2 >> 16) & 0xff)
      raw.write((f2 >> 8) & 0xff); raw.write(f2 & 0xff)
      raw.write((f3 >> 8) & 0xff); raw.write(f3 & 0xff)
    }
    val packedIdx = packed.map(_.id).zipWithIndex.toMap
    val packedIdx2 = packed2.map(_.id).zipWithIndex.toMap
    (0 until size).foreach { id =>
      if (id == 0) entry(0, 0, 65535)
      else if (packedIdx.contains(id)) entry(2, objStmId, packedIdx(id)) // in-objstm
      else if (packedIdx2.contains(id)) entry(2, objStm2Id, packedIdx2(id)) // in sibling
      else if (offsets.contains(id)) entry(1, offsets(id), 0)
      else if (id == xrefId) entry(1, xrefOff, 0)
      else entry(0, 0, 0)
    }
    val enc = deflate(pngUpEncode(raw.toByteArray, entryW))
    val extra = if (extraTrailer.isEmpty) "" else s"$extraTrailer "
    w(s"$xrefId 0 obj\n<< /Type /XRef /Size $size /W [1 4 2] /Root $rootId 0 R $extra" +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $entryW >> /Length ${enc.length} >>")
    w("\nstream\n")
    out.write(enc)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // ---- common building blocks ---------------------------------------------

  /** one-page doc skeleton: catalog(1) -> pages(2) -> page(3), font dict ids
    * from `fontObjs`, content stream id 4 (+ extra objects appended). */
  def onePage(
      content: Array[Byte],
      fonts: Map[String, Int],
      extraObjs: Seq[ObjSpec] = Nil,
      mediaBox: String = "[0 0 612 792]",
      rotate: Option[Int] = None,
      contentFilter: Option[(String, Array[Byte] => Array[Byte])] = None,
      useXrefStream: Boolean = false,
      packIntoObjStm: Set[Int] = Set.empty): Array[Byte] = {
    val fontRefs = fonts.map { case (name, id) => s"$name $id 0 R" }.mkString(" ")
    val rot = rotate.map(r => s" /Rotate $r").getOrElse("")
    val (filterEntry, encoded) = contentFilter match {
      case Some((name, enc)) => (s" /Filter $name", enc(content))
      case None => ("", content)
    }
    val objs = Seq(
      ObjSpec(1, "<< /Type /Catalog /Pages 2 0 R >>"),
      ObjSpec(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      ObjSpec(3, s"<< /Type /Page /Parent 2 0 R /MediaBox $mediaBox$rot " +
        s"/Resources << /Font << $fontRefs >> >> /Contents 4 0 R >>"),
      ObjSpec(4, s"<< /Length ${encoded.length}$filterEntry >>", Some(encoded))) ++ extraObjs
    if (useXrefStream) xrefStream(objs, 1, packIntoObjStm)
    else classicXref(objs, 1)
  }

  /** Courier Standard-14 font object (widths come from builtin tables) */
  def courier(id: Int): ObjSpec =
    ObjSpec(id, "<< /Type /Font /Subtype /Type1 /BaseFont /Courier /Encoding /WinAnsiEncoding >>")

  def helvetica(id: Int): ObjSpec =
    ObjSpec(id, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
}
