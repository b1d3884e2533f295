package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC/1.0 ingestion — the native Common Crawl container format.
  *
  * Reads `response`-type records into the engine's pages shape
  * (url, warc_ts, html, text, lang). Handles both plain `.warc` files and
  * the CC convention of per-record gzip members (`.warc.gz`): JDK
  * GZIPInputStream transparently concatenates members.
  *
  * Distribution model: one WARC file per task via `binaryFiles` — the
  * standard approach for non-splittable record containers; at crawl scale
  * file counts (millions of ~1 GB WARCs) dwarf executor counts, so per-file
  * granularity saturates the cluster. `maxBytesPerRecord` caps memory per
  * record (oversized payloads are skipped and counted, not fatal).
  */
object Warc {

  final case class WarcRecord(
      url: String,
      warcDate: String,
      recordType: String,
      payload: Array[Byte])

  final val MAX_BYTES_PER_RECORD: Int = 64 << 20

  /** parse one WARC stream (possibly multi-member gzip) into records */
  def parseStream(in0: InputStream, gzipped: Boolean): Iterator[WarcRecord] = {
    val in = new DataInputStream(
      if (gzipped) new java.util.zip.GZIPInputStream(in0, 1 << 16) else in0)

    def readLine(): String = {
      // WARC headers are CRLF-terminated ASCII
      val buf = new ByteArrayOutputStream(128)
      var c = in.read()
      while (c != -1 && c != '\n') {
        buf.write(c)
        c = in.read()
      }
      if (c == -1 && buf.size == 0) throw new EOFException
      val s = new String(buf.toByteArray, ISO_8859_1)
      if (s.endsWith("\r")) s.dropRight(1) else s
    }

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false

      private def advance(): Unit = {
        while (nextRec == null && !done) {
          try {
            // seek the version line
            var line = readLine()
            while (!line.startsWith("WARC/")) line = readLine()
            // headers to blank line
            val headers = scala.collection.mutable.Map.empty[String, String]
            line = readLine()
            while (line.nonEmpty) {
              val idx = line.indexOf(':')
              if (idx > 0) headers(line.substring(0, idx).trim.toLowerCase(java.util.Locale.ROOT)) =
                line.substring(idx + 1).trim
              line = readLine()
            }
            val len = headers.getOrElse("content-length", "0").toLong
            val tpe = headers.getOrElse("warc-type", "")
            val url = headers.getOrElse("warc-target-uri", "")
            val date = headers.getOrElse("warc-date", "")
            if (len > MAX_BYTES_PER_RECORD) {
              var toSkip = len
              while (toSkip > 0) {
                val n = in.skip(toSkip)
                if (n <= 0) { in.read(); toSkip -= 1 } else toSkip -= n
              }
            } else {
              val payload = new Array[Byte](len.toInt)
              in.readFully(payload)
              nextRec = WarcRecord(url, date, tpe, payload)
            }
          } catch {
            case _: EOFException =>
              done = true
              // end of container: close eagerly — at crawl scale a task
              // parses thousands of files, and waiting for finalization
              // leaks fds and GZIP Inflater native memory
              try in.close() catch { case _: Exception => }
          }
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null) advance()
        nextRec != null
      }

      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec
        nextRec = null
        r
      }
    }
  }

  /** strip the HTTP response envelope from a response record payload */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    // body starts after the first CRLFCRLF
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload
  }

  private def parseWarcDate(s: String): Timestamp =
    try Timestamp.from(java.time.Instant.parse(s))
    catch { case _: Exception => new Timestamp(0L) }

  /** read a directory/glob of .warc(.gz) files into the pages shape */
  def readPages(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (name, pds) =>
        val gz = name.endsWith(".gz")
        parseStream(pds.open(), gz)
          .filter(_.recordType == "response")
          .map { r =>
            graft.pipeline.PageRow(r.url, parseWarcDate(r.warcDate), httpBody(r.payload), "", "")
          }
      }
      .toDF()
  }

  /** read WET files (Common Crawl's extracted-text sibling of WARC: the
    * same container, `conversion`-type records whose payload is plain
    * UTF-8 text) straight into the engine's `documents` shape — the
    * ingest path for pipelines that consume CC's own extraction instead
    * of running the HTML kernel. doc_id = xxhash64(url) (the engine's
    * standard deterministic id); source = registrable host. Same
    * one-file-per-task distribution model as readPages. */
  def readWetDocuments(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (name, pds) =>
        val gz = name.endsWith(".gz")
        parseStream(pds.open(), gz)
          .filter(_.recordType == "conversion")
          .map(r => (r.url, new String(r.payload, UTF_8)))
      }
      .toDF("url", "text")
      .select(
        xxhash64(col("url")).as("doc_id"),
        col("text"),
        lit("").as("lang"), // WET carries no language; compose with TextOps.detectLang
        // lowercase + userinfo-stripped host (RFC 3986 — same normalization
        // as CorpusOps.urlCanonical), so per-source quotas/blocklists never
        // fragment across casing variants of one crawl host
        lower(regexp_extract(col("url"),
          "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:@]*)", 1)).as("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  // ---- fixture writer (tests/bench; deterministic) -------------------------
  def writeFixture(path: String, records: Seq[WarcRecord], gzip: Boolean): Unit = {
    val raw = new ByteArrayOutputStream()
    records.foreach { r =>
      val head =
        s"WARC/1.0\r\n" +
          s"WARC-Type: ${r.recordType}\r\n" +
          s"WARC-Target-URI: ${r.url}\r\n" +
          s"WARC-Date: ${r.warcDate}\r\n" +
          s"Content-Length: ${r.payload.length}\r\n\r\n"
      if (gzip) {
        // per-record gzip member (Common Crawl convention)
        val member = new ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(member)
        gz.write(head.getBytes(ISO_8859_1))
        gz.write(r.payload)
        gz.write("\r\n\r\n".getBytes(ISO_8859_1))
        gz.close()
        raw.write(member.toByteArray)
      } else {
        raw.write(head.getBytes(ISO_8859_1))
        raw.write(r.payload)
        raw.write("\r\n\r\n".getBytes(ISO_8859_1))
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), raw.toByteArray)
  }

  /** magic-byte payload router — the first decision every extraction
    * pipeline makes per fetched document (a Content-Type header lies
    * often enough that production routers sniff bytes; this is the
    * file(1)/WARC-identified-payload-type rule set for the formats this
    * engine handles). Pure codegen column math over a hex prefix — no
    * kernel, no UDF, no shuffle: magic tests compare `hex(substring())`
    * literals; the HTML test lowercases the first 256 decoded bytes and
    * looks for a doctype/html/head/body tag opener.
    *
    * Kinds: pdf, gzip, png, jpeg, gif, wav (RIFF+WAVE), zip, html, json
    * (object/array opener), unknown. NULL/empty payloads -> unknown. */
  def sniffKind(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val hx = hex(substring(payload, 1, 8)) // uppercase hex, 16 chars max
    // slice the BINARY first, then decode: casting the whole payload to
    // string would UTF-8-decode multi-megabyte bodies just to sniff a
    // 256-CHAR prefix. 1024 bytes covers 256 chars at the 4-byte UTF-8
    // worst case (a multibyte-heavy preamble must not hide an HTML
    // opener the old decode-then-slice saw); the outer substring keeps
    // the original 256-character window, and a truncated trailing
    // multi-byte char only yields a replacement char at the end —
    // irrelevant to the tag/opener tests
    val head = lower(substring(substring(payload, 1, 1024).cast("string"), 1, 256))
    // regex trim: Spark's ltrim strips only ' ', but HTML preambles open
    // with newlines/tabs as often as spaces
    val trimmed = regexp_replace(head, "^\\s+", "")
    when(payload.isNull || length(payload) === 0, "unknown")
      .when(hx.startsWith("255044462D"), "pdf") // %PDF-
      .when(hx.startsWith("1F8B"), "gzip")
      .when(hx.startsWith("89504E470D0A1A0A"), "png")
      .when(hx.startsWith("FFD8FF"), "jpeg")
      .when(hx.startsWith("47494638"), "gif") // GIF8
      .when(hx.startsWith("52494646") && // RIFF....WAVE
        hex(substring(payload, 9, 4)) === "57415645", "wav")
      .when(hx.startsWith("504B0304"), "zip")
      .when(trimmed.startsWith("<!doctype") || trimmed.startsWith("<html") ||
        trimmed.startsWith("<head") || trimmed.startsWith("<body"), "html")
      .when(trimmed.startsWith("{") || trimmed.startsWith("["), "json")
      .otherwise("unknown")
  }

  def httpWrap(body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: ${body.length}\r\n\r\n"
    head.getBytes(ISO_8859_1) ++ body
  }
}
