package graft.ops

/** Small deterministic byte-pair-encoding tokenizer for token ACCOUNTING
  * (training-cost estimates, token budgets, packing) — the round-3
  * "whitespace-vs-subword-ish" approximation upgraded to a real trained
  * subword vocabulary.
  *
  * Everything is deterministic and engine-portable:
  *  - PRETOKENIZATION (shared by training and inference): lowercase, then
  *    letter runs / single digits / single punctuation chars — the same
  *    three classes as `TextOps.bpeishTokenCount`, so the two estimates
  *    differ only by subword merging, which is exactly what the
  *    `bpe_ratio` column is meant to show.
  *  - TRAINING (graft.tools.BpeTrain, run once, output committed as a
  *    resource): classic BPE over word frequencies — repeatedly merge the
  *    most frequent adjacent symbol pair; ties break lexicographically so
  *    retraining on the same corpus is byte-identical. Word-final symbols
  *    carry a `</w>` marker (word-boundary merges are distinct from
  *    word-internal ones, as in the original BPE formulation).
  *  - INFERENCE: standard lowest-rank-first merging per word; results are
  *    memoized per JVM (web text repeats words heavily; the cache is
  *    bounded and cleared when full, so executors cannot leak).
  *
  * The merges table ships as `graft/bpe_merges.tsv` (one `left<TAB>right`
  * per line, rank = line number), trained on the synthetic sf0.01
  * documents corpus — see BpeTrain's header for the exact invocation.
  */
object Bpe {
  final val EOW = "</w>"

  /** merge ranks: (left, right) -> rank (lower merges first) */
  lazy val ranks: Map[(String, String), Int] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.tsv")
    require(in != null, "missing resource graft/bpe_merges.tsv (run graft.tools.BpeTrain)")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().zipWithIndex.collect {
      case (line, i) if line.nonEmpty =>
        val t = line.split('\t')
        ((t(0), t(1)), i)
    }.toMap
    finally src.close()
  }

  /** lowercase pretokens: letter runs, single digits, single punct chars */
  private[ops] val PRETOKEN = java.util.regex.Pattern.compile("[a-z\\p{L}]+|[0-9]|[^a-z\\p{L}0-9\\s]")
  def pretokens(text: String): Iterator[String] = {
    if (text == null) return Iterator.empty
    val m = PRETOKEN.matcher(text.toLowerCase(java.util.Locale.ROOT))
    new Iterator[String] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): String = { val g = m.group(); has = m.find(); g }
    }
  }

  /** BPE-segment one pretoken into subword symbols (word-final symbol
    * carries EOW). Single-char pretokens (digits, punct) are one token. */
  def segment(word: String): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val s = String.valueOf(word.charAt(i))
        b += (if (i == word.length - 1) s + EOW else s)
        i += 1
      }
      b.result()
    }
    var done = syms.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++ syms.drop(bestIdx + 2)
        if (syms.length <= 1) done = true
      }
    }
    syms
  }

  // bounded per-JVM memoization of word -> token count (clear-on-full:
  // simple, lock-free reads, no LRU bookkeeping in the hot path)
  private val CACHE_MAX = 100000
  private val countCache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** subword token count of one pretoken (memoized) */
  def wordTokens(word: String): Int = {
    val cached = countCache.get(word)
    if (cached != null) return cached.intValue()
    val n = segment(word).length
    if (countCache.size() >= CACHE_MAX) countCache.clear()
    countCache.put(word, Integer.valueOf(n))
    n
  }

  /** total BPE token count of a text (0 for null/blank) */
  def tokenCount(text: String): Int = {
    var n = 0
    val it = pretokens(text)
    while (it.hasNext) n += wordTokens(it.next())
    n
  }

  /** frozen golden rows behind q48: (text, expected whitespace tokens,
    * expected BPE tokens). Computed once with the committed merges table
    * and FROZEN here; an OpsSpec test asserts the live tokenizer still
    * reproduces every row (vocab/tokenizer drift fails loudly), and the
    * q48 DuckDB oracle enumerates these numbers per doc_id % n class, so
    * a value-exact match gates the whole Spark path end-to-end.
    * Covers: fully-merged corpus vocabulary, part names, partially-merged
    * natural text (en/de), unseen long words (worst-case subword blowup),
    * digits+punctuation, empty/blank, mixed alphanumerics. */
  val golden: Seq[(String, Long, Long)] = Seq(
    ("key agg row scan slow fast table value part hash", 10L, 10L),
    ("red widget blue bolt small ring", 6L, 6L),
    ("the report was prepared with care and this is the result", 11L, 21L),
    ("supercalifragilisticexpialidocious antidisestablishmentarianism", 2L, 46L),
    ("version 2 of the spark engine, with 3 tables!", 9L, 23L),
    ("der bericht wurde nicht mit der zeit fertig", 8L, 19L),
    ("", 0L, 0L),
    ("   ", 0L, 0L),
    ("und007 x9y8z7", 2L, 11L),
    ("merge batch window stream sort query join filter group", 9L, 9L))
}
