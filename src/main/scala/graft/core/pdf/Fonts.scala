package graft.core.pdf

import Lex._

/** Per-resource font registry: widths (/Widths, /W + /DW, Standard-14),
  * ascent/descent/height, Type3 font matrix, rise. Reference fonts.cc.
  *
  * The reference copies `Fonts` values into each page's registry
  * (pages_extractor.cc:592), so the mutable state (current font, rise) is
  * per page/XObject; `freshCopy` reproduces that while sharing the
  * immutable lookup tables.
  */
final class Fonts private (
    dictionaryPerFont: Map[String, Lex.Dict],
    heights: Map[String, Float],
    descents: Map[String, Float],
    ascents: Map[String, Float],
    isType3: Map[String, Boolean],
    widths: Map[String, Array[(Int, Float)]],
    defaultWidth: Map[String, Float],
    fontMatrixType3: Map[String, Array[Float]]) {

  private var currentFont: String = ""
  private var riseV: Float = 0f

  def freshCopy: Fonts = new Fonts(dictionaryPerFont, heights, descents, ascents,
    isType3, widths, defaultWidth, fontMatrixType3)

  // ---- queries (fonts.cc:55-69,197-345) ------------------------------------

  // 256-slot scaled-width cache per current font: the per-glyph hot path
  // (profiled ~20% of dense-document time) was a Map lookup + binary search
  // + tuple allocation per character. Values are computed by the exact
  // original expression, so results are bit-identical.
  private var cachedFont: String = null
  private var cachedW256: Array[Float] = null
  private val w256PerFont = new java.util.HashMap[String, Array[Float]]()

  private def widthCache(): Array[Float] = {
    if (cachedFont != currentFont) {
      var arr = w256PerFont.get(currentFont)
      if (arr == null) {
        val fontWidth = widths(currentFont)
        val dw = defaultWidth(currentFont)
        val sx = getScales._1
        arr = new Array[Float](256)
        var c = 0
        while (c < 256) {
          val i = if (fontWidth.isEmpty) -1 else binarySearch(fontWidth, c)
          arr(c) = (if (i == -1) dw else fontWidth(i)._2) * sx
          c += 1
        }
        w256PerFont.put(currentFont, arr)
      }
      cachedW256 = arr
      cachedFont = currentFont
    }
    cachedW256
  }

  def getWidth(code: Long): Float = {
    if (code >= 0 && code < 256) return widthCache()(code.toInt)
    val fontWidth = widths(currentFont)
    if (fontWidth.isEmpty) return defaultWidth(currentFont) * getScales._1
    val i = binarySearch(fontWidth, code.toInt)
    if (i == -1) defaultWidth(currentFont) * getScales._1
    else fontWidth(i)._2 * getScales._1
  }

  def getWidth(s: String): Float = {
    var result = 0f
    var i = 0
    while (i < s.length) { result += getWidth(s.charAt(i) & 0xff); i += 1 }
    result
  }

  def setRise(r: Float): Unit = riseV = r
  def getRise: Float = riseV

  def getHeight: Float = {
    validateCurrentFont()
    val h = heights(currentFont)
    if (h == Fonts.NO_HEIGHT) getAscent - getDescent else h * getScales._2
  }

  def getDescent: Float = {
    validateCurrentFont()
    descents(currentFont) * getScales._2
  }

  def getAscent: Float = {
    validateCurrentFont()
    ascents(currentFont) * getScales._2
  }

  def getCurrentFontDictionary: Lex.Dict = {
    validateCurrentFont()
    dictionaryPerFont(currentFont)
  }

  def setCurrentFont(font: String): Unit = currentFont = font

  private def validateCurrentFont(): Unit =
    if (currentFont.isEmpty) err("current font is not set")

  private def getScales: (Float, Float) =
    if (!isType3(currentFont)) (0.001f, 0.001f)
    else {
      val m = fontMatrixType3(currentFont)
      (m(0) + m(2), m(1) + m(3)) // apply_matrix_norm(m, 1, 1)
    }

  private def binarySearch(arr: Array[(Int, Float)], x: Int): Int = {
    var l = 0
    var r = arr.length - 1
    while (l <= r) {
      val m = l + (r - l) / 2
      if (arr(m)._1 == x) return m
      if (arr(m)._1 < x) l = m + 1 else r = m - 1
    }
    -1
  }
}

object Fonts {
  final val NO_HEIGHT = 0f
  final val NO_DESCENT = 0f
  final val NO_ASCENT = 0f

  def empty(storage: ObjectStorage): Fonts = apply(storage, Map.empty)

  def apply(storage: ObjectStorage, fontsDict: Lex.Dict): Fonts = {
    val dictionaryPerFont = scala.collection.mutable.Map.empty[String, Lex.Dict]
    val heights = scala.collection.mutable.Map.empty[String, Float]
    val descents = scala.collection.mutable.Map.empty[String, Float]
    val ascents = scala.collection.mutable.Map.empty[String, Float]
    val types = scala.collection.mutable.Map.empty[String, Boolean]
    val widths = scala.collection.mutable.Map.empty[String, Array[(Int, Float)]]
    val defaultWidth = scala.collection.mutable.Map.empty[String, Float]
    val fontMatrixType3 = scala.collection.mutable.Map.empty[String, Array[Float]]

    /** /Type0 merges its single DescendantFont dict; parent keys win
      * (C++ map::insert, fonts.cc:41-53) */
    def withDescendant(font: Lex.Dict): Lex.Dict = {
      if (font("/Subtype").raw != "/Type0") return font
      val arr = DocUtil.getArrayOrIndirectArray(font("/DescendantFonts"), storage)
      if (arr.size != 1) err(s"DescendantFonts array must have 1 element. Size=${arr.size}")
      val descendant = DocUtil.getDictOrIndirectDict(arr(0), storage)
      descendant.foldLeft(font) { case (acc, (k, v)) =>
        if (acc.contains(k)) acc else acc.updated(k, v)
      }
    }

    def insertMatrixType3(name: String, font: Lex.Dict): Unit = {
      val p = font.getOrElse("/FontMatrix", err("no /FontMatrix"))
      if (p.tpe != Obj.ARRAY) err("/FontMatrix must be ARRAY")
      val data = getArrayData(p.raw, 0)
      if (data.size != 6) err("/FontMatrix must have 6 elements")
      fontMatrixType3(name) = data.map { d =>
        if (d.tpe != Obj.VALUE) err("/FontMatrix element must be VALUE")
        stof(d.raw)
      }.toArray
    }

    /** CID /W + /DW (fonts.cc:71-123) */
    def insertWidthsFromW(name: String, baseFont: String): Unit = {
      val font = dictionaryPerFont(name)
      defaultWidth(name) = getDictVal(font, "/DW", 1000L).toFloat
      font.get("/W") match {
        case None =>
          widths(name) = Tables.standardWidths.getOrElse(baseFont, Array.empty)
        case Some(wv) =>
          val result = DocUtil.getArrayOrIndirectArray(wv, storage).map { p =>
            if (p.tpe == Obj.INDIRECT_OBJECT) DocUtil.getIndirectObjectData(p.raw, storage) else p
          }
          val fw = scala.collection.mutable.ArrayBuffer.empty[(Int, Float)]
          var i = 0
          while (i < result.size) {
            result(i + 1).tpe match {
              case Obj.VALUE =>
                val firstChar = strictStoul(result(i).raw).toInt
                val lastChar = strictStoul(result(i + 1).raw).toInt
                val width = stof(result(i + 2).raw)
                var j = firstChar
                while (j <= lastChar) { fw += ((j, width)); j += 1 }
                i += 3
              case Obj.ARRAY =>
                var startChar = strictStoul(result(i).raw).toInt
                getArrayData(result(i + 1).raw, 0).foreach { p =>
                  fw += ((startChar, stof(p.raw)))
                  startChar += 1
                }
                i += 2
              case t => err(s"wrong type for val ${result(i + 1).raw} type=$t")
            }
          }
          widths(name) = fw.sortBy(pair => (pair._1, pair._2)) /* std::sort over pair<uint,float>: ties by width (fonts.cc:123) */.toArray
      }
    }

    /** simple-font /Widths + /FirstChar + /MissingWidth (fonts.cc:125-151) */
    def insertWidthsFromWidths(name: String, fontDesc: Lex.Dict, baseFont: String): Unit = {
      val font = dictionaryPerFont(name)
      val firstChar = getDictVal(font, "/FirstChar", 0L).toInt
      defaultWidth(name) = getDictVal(fontDesc, "/MissingWidth", 0L).toFloat
      font.get("/Widths") match {
        case None =>
          widths(name) = Tables.standardWidths.getOrElse(baseFont, Array.empty)
        case Some(wv) =>
          val result = DocUtil.getArrayOrIndirectArray(wv, storage)
          val fw = new Array[(Int, Float)](result.size)
          var i = 0
          while (i < result.size) {
            val p = result(i)
            val v = if (p.tpe == Obj.INDIRECT_OBJECT) DocUtil.getIndirectObjectData(p.raw, storage).raw else p.raw
            fw(i) = ((i + firstChar, stof(v)))
            i += 1
          }
          widths(name) = fw.sortBy(pair => (pair._1, pair._2)) /* std::sort over pair<uint,float>: ties by width (fonts.cc:123) */
      }
    }

    fontsDict.foreach { case (name, pval) =>
      var fontDict = DocUtil.getDictOrIndirectDict(pval, storage)
      val t3 = fontDict("/Subtype").raw == "/Type3"
      types(name) = t3
      if (t3) insertMatrixType3(name, fontDict)
      fontDict = withDescendant(fontDict)
      dictionaryPerFont(name) = fontDict
      val descDict = fontDict.get("/FontDescriptor")
        .map(DocUtil.getDictOrIndirectDict(_, storage))
        .getOrElse(Map.empty[String, PVal])
      val baseFont = fontDict.get("/BaseFont").map(_.raw).getOrElse("")
      val subtype = fontDict("/Subtype").raw
      if (subtype == "/CIDFontType0" || subtype == "/CIDFontType2" || subtype == "/Type0")
        insertWidthsFromW(name, baseFont)
      else insertWidthsFromWidths(name, descDict, baseFont)
      // height (fonts.cc:207-226)
      descDict.get("/FontBBox") match {
        case None => heights(name) = Tables.stdMetrics.get(baseFont).map(_._3).getOrElse(NO_HEIGHT)
        case Some(v) =>
          val arr = DocUtil.getArrayOrIndirectArray(v, storage)
          heights(name) = stof(arr(3).raw) - stof(arr(1).raw)
      }
      // descent (fonts.cc:228-260)
      descDict.get("/Descent") match {
        case Some(v) => descents(name) = stof(v.raw)
        case None =>
          if (t3 && fontDict.contains("/FontBBox")) {
            val arr = DocUtil.getArrayOrIndirectArray(fontDict("/FontBBox"), storage)
            descents(name) = stof(arr(1).raw)
          } else descents(name) = Tables.stdMetrics.get(baseFont).map(_._2).getOrElse(NO_DESCENT)
      }
      // ascent (fonts.cc:262-294)
      descDict.get("/Ascent") match {
        case Some(v) => ascents(name) = stof(v.raw)
        case None =>
          if (t3 && fontDict.contains("/FontBBox")) {
            val arr = DocUtil.getArrayOrIndirectArray(fontDict("/FontBBox"), storage)
            ascents(name) = stof(arr(3).raw)
          } else ascents(name) = Tables.stdMetrics.get(baseFont).map(_._1).getOrElse(NO_ASCENT)
      }
    }

    new Fonts(dictionaryPerFont.toMap, heights.toMap, descents.toMap, ascents.toMap,
      types.toMap, widths.toMap, defaultWidth.toMap, fontMatrixType3.toMap)
  }
}
