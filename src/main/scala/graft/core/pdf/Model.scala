package graft.core.pdf

/** Core object model for the PDF extraction kernel.
  *
  * Everything in this package operates on *byte-strings*: JVM `String`s in
  * which every `Char` holds exactly one byte value (0..255), i.e. the
  * ISO-8859-1 image of the raw bytes. This mirrors the reference engine's
  * `std::string` buffers (kasha13/pdf_extract, common.h:34-35) and makes the
  * final extracted text byte-identical by construction: the kernel's output
  * byte-string is UTF-8 *bytes*, decoded to a JVM String only at the Spark
  * boundary.
  *
  * Reference data model: `pdf_object_t` common.h:16, `dict_t`/`array_t`
  * common.h:34-35, `pdf_error` common.h:22-32.
  */
object Obj {
  type Type = Int
  final val DICTIONARY = 1
  final val ARRAY = 2
  final val STRING = 3
  final val VALUE = 4
  final val INDIRECT_OBJECT = 5
  final val NAME_OBJECT = 6
}

/** Per-document extraction failure (reference: `pdf_error`, common.h:22-32).
  * Fail-fast per document; the Spark kernel quarantines, never crashes. */
final class PdfError(msg: String) extends RuntimeException(msg)

object Bytes {
  import java.nio.charset.StandardCharsets.ISO_8859_1

  /** raw bytes -> byte-string (1 char per byte) */
  def str(b: Array[Byte]): String = new String(b, ISO_8859_1)

  /** byte-string -> raw bytes */
  def arr(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  /** UTF-16BE byte-string -> UTF-8 byte-string (reference uses
    * boost::locale::to_utf; to_unicode_converter.cc:48). Malformed input is
    * dropped, matching boost's default `skip` method. */
  def utf16beToUtf8(s: String): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_16BE.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.IGNORE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.IGNORE)
    val out = dec.decode(java.nio.ByteBuffer.wrap(arr(s))).toString
    str(out.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** decode with a named charset -> UTF-8 byte-string (reference iconv path,
    * charset_converter.cc:119) */
  def charsetToUtf8(s: String, charset: java.nio.charset.Charset): String = {
    val dec = charset.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.IGNORE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.IGNORE)
    val out = dec.decode(java.nio.ByteBuffer.wrap(arr(s))).toString
    str(out.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** UTF-8 codepoint count over a byte-string (reference utf8_length,
    * common.cc:745-751: count non-continuation bytes) */
  def utf8Length(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) { if ((s.charAt(i) & 0xc0) != 0x80) n += 1; i += 1 }
    n
  }
}
