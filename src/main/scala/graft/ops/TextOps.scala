package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Everything here is built from codegen'd `functions._` columns (no UDFs)
  * except language-ID and fingerprinting, which are typed Dataset maps over
  * executor-local pure functions — still fully distributed, no shuffles.
  */
object TextOps {

  val stopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "on", "for", "with", "as", "at", "by", "this")

  /** whitespace token count (codegen'd; empty/blank -> 0) */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** crude BPE-ish subword estimate: word-pieces + digits + punct as tokens */
  def bpeishTokenCount(textCol: String): Column =
    expr(s"size(regexp_extract_all($textCol, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\\\s]', 0))")

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  def stopwordCount(text: Column): Column =
    size(filter(split(lower(text), "\\s+"), w => w.isin(stopwordsEn.map(lit(_)): _*)))

  def meanWordLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text))

  /** composite quality score in [0,1]: length band + punctuation sanity +
    * stopword presence (heuristics typical of web-text filtering) */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val lenScore = least(n / 500.0, lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(n, lit(1.0))
    val punctScore = when(punctRatio > 0.2, 0.0).otherwise(lit(1.0) - punctRatio * 2)
    val stopRatio = stopwordCount(text).cast("double") / greatest(tokenCount(text).cast("double"), lit(1.0))
    val stopScore = least(stopRatio * 4.0, lit(1.0))
    round((lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3), 6)
  }

  // ---- language ID (n-gram/charclass heuristic; executor-local) -----------
  private val langMarkers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Set("le", "la", "les", "et", "est", "pas", "une", "des"),
    "es" -> Set("el", "la", "los", "las", "es", "y", "que", "por", "con", "una"))

  /** pure function: dominant-marker vote + CJK char-class check */
  def detectLang(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var total = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!c.isWhitespace) {
        total += 1
        if ((c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3040 && c <= 0x30ff)) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk * 3 > total) {
      // kana present => ja, else zh
      var hasKana = false
      i = 0
      while (i < text.length && !hasKana) {
        val c = text.charAt(i)
        if (c >= 0x3040 && c <= 0x30ff) hasKana = true
        i += 1
      }
      return if (hasKana) "ja" else "zh"
    }
    val tokens = text.toLowerCase.split("\\s+")
    var best = "und"
    var bestScore = 0
    langMarkers.foreach { case (lang, markers) =>
      var s = 0
      tokens.foreach(t => if (markers.contains(t)) s += 1)
      if (s > bestScore) { bestScore = s; best = lang }
    }
    best
  }

  /** 64-bit rolling polynomial fingerprint over whitespace-normalized text
    * (Rabin-Karp style; stable across JVMs) */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    var h = 1125899906842597L
    var i = 0
    var prevSpace = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (c.isWhitespace) prevSpace = true
      else {
        if (prevSpace) { h = h * 31 + ' '; prevSpace = false }
        h = h * 31 + c
      }
      i += 1
    }
    h
  }

  /** documents -> per-doc text stats (one narrow pass, no shuffle) */
  def stats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).cast("long").as("text_len"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      punctCount(col("text")).cast("long").as("n_punct"),
      stopwordCount(col("text")).cast("long").as("n_stopwords"),
      round(meanWordLen(col("text")), 6).as("mean_word_len"))

  def withLangAndFingerprint(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        (id, detectLang(text), lang, fingerprint(text))
      }
      .toDF("doc_id", "pred_lang", "lang", "fingerprint")
  }
}
