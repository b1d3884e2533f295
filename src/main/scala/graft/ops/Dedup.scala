package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-text corpora.
  *
  * Scale notes (the 100 TB story):
  *  - exact dedup is one hash-shuffle on a 64-bit text hash (never on the
  *    full text: shuffle keys stay 8 bytes);
  *  - MinHash-LSH shuffles (band_id, band_hash) pairs — b small ints per
  *    doc — then joins only within buckets, never all-pairs;
  *  - SimHash banding likewise turns hamming-<=k search into 4 exact-match
  *    bucket joins (pigeonhole over 16-bit segments);
  *  - exact n-gram Jaccard runs only on LSH candidate pairs.
  */
object Dedup {

  // ---- exact ---------------------------------------------------------------
  /** groups of byte-identical texts; one shuffle on xxhash64(text) */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  // ---- MinHash + LSH ---------------------------------------------------------
  final val N_HASHES = 64
  final val N_BANDS = 16 // 4 rows per band
  final val ROWS_PER_BAND = N_HASHES / N_BANDS
  private final val PRIME = 2305843009213693951L // 2^61 - 1

  /** deterministic affine hash params (seeded) */
  private def hashParams(seed: Long): Array[(Long, Long)] =
    (0 until N_HASHES).map { i =>
      var z = seed + i * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      val a = (z ^ (z >>> 27)) | 1L
      var z2 = z + 0x94d049bb133111ebL
      z2 = (z2 ^ (z2 >>> 31)) * 0xbf58476d1ce4e5b9L
      (a & 0x3fffffffffffffffL, z2 & 0x3fffffffffffffffL)
    }.toArray

  /** word 3-shingles -> 64 minhashes (pure, executor-local) */
  def minhashSignature(text: String, params: Array[(Long, Long)]): Array[Long] = {
    val sig = Array.fill(N_HASHES)(Long.MaxValue)
    if (text == null) return sig
    val tokens = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val nShingles = math.max(tokens.length - 2, if (tokens.isEmpty) 0 else 1)
    var i = 0
    while (i < nShingles) {
      val shingle = tokens.slice(i, math.min(i + 3, tokens.length)).mkString(" ")
      val x = shingle.hashCode.toLong & 0xffffffffL
      var h = 0
      while (h < N_HASHES) {
        val (a, b) = params(h)
        val v = (a * x + b) % PRIME
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  /** candidate near-duplicate pairs via banded MinHash-LSH; each pair carries
    * the estimated jaccard = matching-minhash fraction */
  def minhashLsh(documents: DataFrame, seed: Long = 42L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val params = hashParams(seed)
    val sigs = documents.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, minhashSignature(text, params)) }
      .toDF("doc_id", "sig")
    // explode into (band, band_hash) and bucket-join
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        s"transform(sequence(0, ${N_BANDS - 1}), b -> " +
          s"hash(slice(sig, b * $ROWS_PER_BAND + 1, $ROWS_PER_BAND)))")))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val a = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))").cast("double")
          / N_HASHES).as("est_jaccard"))
      .distinct()
  }

  // ---- SimHash ----------------------------------------------------------------
  /** 64-bit SimHash over word hashes (pure, executor-local) */
  def simhash(text: String): Long = {
    if (text == null) return 0L
    val acc = new Array[Int](64)
    text.toLowerCase.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        var h = w.hashCode.toLong * 0x9e3779b97f4a7c15L
        h ^= (h >>> 29)
        var bit = 0
        while (bit < 64) {
          if (((h >> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
          bit += 1
        }
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (acc(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  def simhashes(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, simhash(t)) }
      .toDF("doc_id", "simhash")
  }

  /** near-dup pairs with hamming(simhash) <= 3 via 4x16-bit segment banding
    * (pigeonhole: <=3 differing bits => >=1 identical segment) */
  def simhashNearDups(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhashes(documents)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), s -> (simhash >> (s * 16)) & 65535)")))
      .withColumnRenamed("pos", "segment")
      .withColumnRenamed("col", "seg_val")
    val a = banded.select(col("segment"), col("seg_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("segment"), col("seg_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("segment", "seg_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---- exact n-gram Jaccard (verification pass over LSH candidates) ------------
  /** exact word-3-gram Jaccard, computed ONLY for LSH candidate pairs */
  def ngramJaccardDups(documents: DataFrame, threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    val spark = documents.sparkSession
    val candidates = minhashLsh(documents, seed).filter(col("est_jaccard") >= threshold * 0.7)
    val grams = documents.select(col("doc_id").cast("long"), col("text"))
      .withColumn("grams", shingles3("text"))
    val a = grams.select(col("doc_id").as("doc_a"), col("grams").as("grams_a"))
    val b = grams.select(col("doc_id").as("doc_b"), col("grams").as("grams_b"))
    candidates.join(a, "doc_a").join(b, "doc_b")
      .withColumn("jaccard",
        when(size(array_union(col("grams_a"), col("grams_b"))) === 0, lit(0.0))
          .otherwise(size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
            size(array_union(col("grams_a"), col("grams_b")))))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  private def shingles3(textCol: String): org.apache.spark.sql.Column =
    expr(s"transform(sequence(0, greatest(size(split(lower($textCol), '\\\\s+')) - 3, 0)), " +
      s"i -> concat_ws(' ', slice(split(lower($textCol), '\\\\s+'), i + 1, 3)))")

  // ---- embedding near-dup -------------------------------------------------------
  /** cosine >= threshold pairs; brute force within blocks. Exposed as the
    * correctness baseline — the scale path is SimSearch.lshBuckets. */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double = 0.95): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("self_dot", SimSearch.dotCol(col("embedding"), col("embedding")))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("self_dot").as("dot_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("self_dot").as("dot_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        SimSearch.cosineWithNorms(col("emb_a"), col("emb_b"), col("dot_a"), col("dot_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
