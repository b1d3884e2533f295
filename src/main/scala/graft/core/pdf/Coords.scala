package graft.core.pdf

import Lex._

/** 6-element affine matrix ops (common.h:36, common.cc:753-761,821;
  * coordinates.cc:13-27). Float throughout for byte-identical geometry. */
object Matrix {
  type M = Array[Float]
  val IDENTITY: M = Array(1f, 0f, 0f, 1f, 0f, 0f)

  /** row-vector convention: m1 * m2 (common.cc:753-761) */
  def mul(m1: M, m2: M): M = Array(
    m2(0) * m1(0) + m2(2) * m1(1),
    m2(1) * m1(0) + m2(3) * m1(1),
    m2(0) * m1(2) + m2(2) * m1(3),
    m2(1) * m1(2) + m2(3) * m1(3),
    m2(0) * m1(4) + m2(2) * m1(5) + m2(4),
    m2(1) * m1(4) + m2(3) * m1(5) + m2(5))

  /** coordinates.cc:13-16 */
  def translate(m: M, x: Float, y: Float): M =
    Array(m(0), m(1), m(2), m(3), x * m(0) + y * m(2) + m(4), x * m(1) + y * m(3) + m(5))

  /** coordinates.cc:62-65 */
  def applyPt(m: M, x: Float, y: Float): (Float, Float) =
    (m(0) * x + m(2) * y + m(4), m(1) * x + m(3) * y + m(5))
}

/** bbox (coordinates.h:11-32) */
final case class Coord(var x0: Float, var y0: Float, var x1: Float, var y1: Float) {
  def copyOf: Coord = Coord(x0, y0, x1, y1)
}

/** positioned glyph run (coordinates.h:34-58) */
final case class TextT(var coordinates: Coord, var text: String)

/** line/box chunk (coordinates.h:60-112); `stringLen` is UTF-8 codepoint count */
final class TextChunk {
  var coordinates: Coord = Coord(0, 0, 0, 0)
  var texts: scala.collection.mutable.ArrayBuffer[TextT] = scala.collection.mutable.ArrayBuffer.empty
  var stringLen: Long = 0
  var isEmpty: Boolean = true

  /** identity comparison in the reference is on coordinates only */
  def sameCoords(o: TextChunk): Boolean =
    coordinates.x0 == o.coordinates.x0 && coordinates.y0 == o.coordinates.y0 &&
      coordinates.x1 == o.coordinates.x1 && coordinates.y1 == o.coordinates.y1

  def shallowCopy: TextChunk = {
    val c = new TextChunk
    c.coordinates = coordinates.copyOf
    c.texts = texts.clone()
    c.stringLen = stringLen
    c.isEmpty = isEmpty
    c
  }
}

object TextChunk {
  def apply(text: String, coordinates: Coord): TextChunk = {
    val c = new TextChunk
    c.coordinates = coordinates
    c.texts = scala.collection.mutable.ArrayBuffer(TextT(coordinates.copyOf, text))
    c.stringLen = Bytes.utf8Length(text).toLong
    c.isEmpty = false
    c
  }

  def empty: TextChunk = new TextChunk
}

/** Text-positioning state machine (coordinates.cc): CTM, Tm, Tfs, Th, Tc,
  * Tw, TL, run-local x/y, and the q/Q CTM stack. */
final class Coordinates(ctmArg: Matrix.M) {
  import Matrix._

  var ctm: M = ctmArg
  var tm: M = IDENTITY
  var tfs: Float = 1f
  var th: Float = 1f
  var tc: Float = 0f
  var tw: Float = 0f
  var tl: Float = 0f
  var x: Float = 0f
  var y: Float = 0f
  private var ctms: List[M] = Nil

  def setDefault(): Unit = { tm = IDENTITY; x = 0; y = 0 }

  private def td(xa: Float, ya: Float): Unit = {
    tm = Array(tm(0), tm(1), tm(2), tm(3),
      xa * tm(0) + ya * tm(2) + tm(4), xa * tm(1) + ya * tm(3) + tm(5))
    x = 0
    y = 0
  }

  /** build a chunk for a shown string (coordinates.cc:67-96).
    * `s` is the decoded UTF-8 byte-string, `len` the reference's length
    * argument (raw byte count for simple paths, codepoints for ToUnicode). */
  def adjustCoordinates(s: String, len: Int, width: Float, tj: Float, fonts: Fonts): TextChunk = {
    if (tj != 0) {
      // C++ `x -= Tj*Tfs*Th*0.001`: the 0.001 literal is double, so the
      // subtraction happens in double then narrows — replicated exactly.
      x = (x.toDouble - (tj * tfs * th).toDouble * 0.001).toFloat
      x += tc * th
    }
    val ty = fonts.getDescent * tfs + fonts.getRise * tfs
    val adv = width * tfs * th
    val m = mul(tm, ctm)
    val prevF = m(5)
    val tStart = translate(m, x, y)
    val f = tStart(5)
    if (len > 1) x += tc * th * (len - 1)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') x += tw * th
      i += 1
    }
    val tEnd = translate(m, x, y)
    x += adv
    if (prevF != f) return TextChunk.empty // vertical baseline: drop (coordinates.cc:87)
    val (sx, sy) = applyPt(tStart, 0, ty)
    val (ex, ey) = applyPt(tEnd, adv, ty + fonts.getHeight * tfs)
    TextChunk(s, Coord(math.min(sx, ex), math.min(sy, ey), math.max(sx, ex), math.max(sy, ey)))
  }

  // operand-stack handlers; st is the interpreter's operand stack
  type Stack = scala.collection.mutable.ArrayBuffer[(Obj.Type, String)]

  private def popF(st: Stack): Float = {
    if (st.isEmpty) err("pop: stack is empty")
    val v = st.remove(st.length - 1)
    stof(v._2)
  }

  private def getMatrix(st: Stack): M = {
    val f = popF(st); val e = popF(st); val d = popF(st)
    val c = popF(st); val b = popF(st); val a = popF(st)
    Array(a, b, c, d, e, f)
  }

  def doCm(st: Stack): Unit = ctm = mul(getMatrix(st), ctm)
  def doQPush(): Unit = ctms = ctm :: ctms
  def doQPop(): Unit = ctms match {
    case h :: t => ctm = h; ctms = t
    case Nil => // Q on empty stack is a no-op (coordinates.cc:108-111)
  }
  def setTz(st: Stack): Unit = th = popF(st) / 100
  def setTL(st: Stack): Unit = tl = popF(st)
  def setTc(st: Stack): Unit = tc = popF(st)
  def setTw(st: Stack): Unit = tw = popF(st)
  def setTd(st: Stack): Unit = { val yv = popF(st); val xv = popF(st); td(xv, yv) }
  def setTD(st: Stack): Unit = { val yv = popF(st); val xv = popF(st); td(xv, yv); tl = -yv }
  def setTm(st: Stack): Unit = { tm = getMatrix(st); x = 0; y = 0 }
  def setTStar(): Unit = td(0, -tl)
  def setTf(st: Stack): Unit = tfs = popF(st)
  def setQuote(): Unit = setTStar()
  def setDoubleQuote(st: Stack): Unit = { tc = popF(st); tw = popF(st); setQuote() }
}

object PageGeom {
  /** initial CTM from /Rotate + MediaBox (pages_extractor.cc:141-147) */
  def initCTM(rotate: Long, mb: Array[Float]): Matrix.M = rotate match {
    case 90 => Array(0f, -1f, 1f, 0f, -mb(1), mb(2))
    case 180 => Array(-1f, 0f, 0f, -1f, mb(2), mb(3))
    case 270 => Array(0f, 1f, -1f, 0f, mb(3), -mb(0))
    case _ => Array(1f, 0f, 0f, 1f, -mb(0), -mb(1))
  }
}
