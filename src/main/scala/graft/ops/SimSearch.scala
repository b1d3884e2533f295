package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - `bruteForceTopK` is the exactness baseline: broadcast the (small) query
  *    set, score every row with a codegen'd `aggregate(zip_with(...))` dot
  *    product, window-rank per query. One narrow scan + one tiny shuffle on
  *    query_id.
  *  - `lshTopK` is the scale path: random-hyperplane signatures bucket both
  *    sides (computed executor-locally, one pass); only same-bucket pairs
  *    are scored. At 100 TB the per-query work drops from a full scan to
  *    |bucket|-sized probes, and the bucket join shuffles 16-byte rows.
  */
object SimSearch {

  /** index-ordered double dot product (deterministic; matches the DuckDB
    * oracle's list_inner_product on ::DOUBLE[] exactly). Custom codegen'd
    * Catalyst expression — see graft.functions.DotProduct. */
  def dotCol(x: Column, y: Column): Column = graft.functions.DotProduct(x, y)

  /** cosine similarity of two float-array columns */
  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / sqrt(dotCol(a, a) * dotCol(b, b))

  /** cosine with precomputed self-dots (3x fewer array passes per pair;
    * bit-identical to cosineCol since dot(v,v) is deterministic) */
  def cosineWithNorms(a: Column, b: Column, dotAA: Column, dotBB: Column): Column =
    dotCol(a, b) / sqrt(dotAA * dotBB)

  /** exact top-k neighbors for the `nQueries` lowest vec_ids (excluding self).
    * Output: (query_id, neighbor_id, rank, cosine) */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("self_dot", dotCol(col("embedding"), col("embedding")))
    val queries = e.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb"),
        col("self_dot").as("q_dot"))
    val scored = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineWithNorms(col("query_emb"), col("embedding"), col("q_dot"), col("self_dot")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** deterministic pseudo-gaussian hyperplanes: planes(j)(i) in [-1,1] */
  private[ops] def planes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (j, i) =>
      var z = seed + (j.toLong << 32) + i * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= (z >>> 31)
      z.toDouble / Long.MaxValue.toDouble
    }

  /** sign-pattern signature of one vector under one plane table */
  private[ops] def signature(emb: Seq[Float], table: Array[Array[Double]]): Long = {
    var sig = 0L
    var j = 0
    while (j < table.length) {
      val plane = table(j)
      var dot = 0.0
      var i = 0
      val n = math.min(plane.length, emb.length)
      while (i < n) { dot += emb(i) * plane(i); i += 1 }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** (vec_id, table, bucket) rows — one narrow pass, nTables rows per vector */
  def lshBuckets(
      embeddings: DataFrame,
      nBits: Int = 12,
      nTables: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val tables = Array.tabulate(nTables)(t => planes(nBits, dim, seed + t))
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        tables.iterator.zipWithIndex.map { case (tab, t) => (id, t, signature(emb, tab)) }
      }
      .toDF("vec_id", "table", "bucket")
  }

  // ---- IVF (inverted-file) index ---------------------------------------------

  /** deterministic Lloyd k-means over the embedding column. Init = the k
    * lowest-vec_id vectors (no RNG, partition-invariant); each iteration is
    * one executor-local assignment pass against BROADCAST centroids + one
    * elementwise-mean shuffle of (centroid, dim) cells — k*dim rows to the
    * driver per iteration, never the vectors themselves. Empty clusters
    * keep their previous centroid. */
  private[graft] def kmeansCentroids(
      embeddings: DataFrame,
      k: Int,
      iters: Int,
      dim: Int): Array[Array[Float]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
    var centroids: Array[Array[Float]] =
      e.orderBy("vec_id").limit(k).collect().map(_._2.toArray)
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      // per-partition accumulators: each task reduces its rows into k
      // (sum[dim], count) cells, so the data movement per iteration is
      // k*partitions tiny rows — NOT n*dim exploded rows (a posexplode +
      // groupBy here would shuffle the whole corpus every iteration)
      val partials = e.mapPartitions { rows =>
        val cents = bc.value
        val sums = Array.ofDim[Double](cents.length, dim)
        val counts = new Array[Long](cents.length)
        rows.foreach { case (_, emb) =>
          val c = nearestCentroid(emb, cents)
          counts(c) += 1
          var i = 0
          val n = math.min(dim, emb.length)
          while (i < n) { sums(c)(i) += emb(i); i += 1 }
        }
        (0 until cents.length).iterator
          .filter(c => counts(c) > 0)
          .map(c => (c, counts(c), sums(c).toSeq))
      }.collect()
      val next = centroids.map(_.clone())
      val totSums = Array.ofDim[Double](centroids.length, dim)
      val totCounts = new Array[Long](centroids.length)
      partials.foreach { case (c, n, s) =>
        totCounts(c) += n
        var i = 0
        while (i < dim) { totSums(c)(i) += s(i); i += 1 }
      }
      var c = 0
      while (c < centroids.length) {
        if (totCounts(c) > 0) {
          var i = 0
          while (i < dim) { next(c)(i) = (totSums(c)(i) / totCounts(c)).toFloat; i += 1 }
        }
        c += 1
      }
      centroids = next
      bc.destroy()
      it += 1
    }
    centroids
  }

  private[graft] def nearestCentroid(emb: Seq[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var i = 0
      val n = math.min(cent.length, emb.length)
      while (i < n) { val x = emb(i) - cent(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private[graft] def nearestCentroids(emb: Seq[Float], cents: Array[Array[Float]], n: Int): Array[Int] = {
    val ds = cents.indices.map { c =>
      val cent = cents(c)
      var d = 0.0
      var i = 0
      val m = math.min(cent.length, emb.length)
      while (i < m) { val x = emb(i) - cent(i); d += x * x; i += 1 }
      (d, c)
    }
    ds.sorted.take(n).map(_._2).toArray
  }

  /** ANN via an IVF index: k-means coarse quantizer, vectors assigned to
    * their nearest centroid's posting list, queries probe the `nProbe`
    * nearest lists and score exactly within them. The 100 TB shape: the
    * quantizer is tiny and broadcast; the only full-corpus pass is the
    * assignment (executor-local); per-query work is nProbe/k of a scan.
    * Complements lshTopK — IVF partitions by geometry (good for clustered
    * embeddings), LSH by random projection (good for uniform). */
  def ivfTopK(
      embeddings: DataFrame,
      nQueries: Int = 5,
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      iters: Int = 3,
      dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(embeddings, nCentroids, iters, dim)
    val bc = spark.sparkContext.broadcast(cents)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val assigned = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) => (id, nearestCentroid(emb, bc.value)) }
      .toDF("vec_id", "cid")
    val queries = e.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))
    val qProbes = queries.select(col("query_id"), col("query_emb"))
      .as[(Long, Seq[Float])]
      .flatMap { case (qid, emb) => nearestCentroids(emb, bc.value, nProbe).iterator.map(c => (qid, c)) }
      .toDF("query_id", "cid")
    val candidates = assigned.join(broadcast(qProbes), Seq("cid"))
      .select(col("query_id"), col("vec_id"))
    val scored = candidates
      .join(e, "vec_id")
      .join(broadcast(queries), "query_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineWithNorms(col("query_emb"), col("embedding"),
          dotCol(col("query_emb"), col("query_emb")),
          dotCol(col("embedding"), col("embedding"))))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** ANN via LSH buckets: score only same-(table,bucket) candidates. */
  def lshTopK(
      embeddings: DataFrame,
      nQueries: Int = 5,
      k: Int = 10,
      nBits: Int = 12,
      nTables: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val buckets = lshBuckets(embeddings, nBits, nTables, dim, seed)
    val queries = e.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))
    val qBuckets = buckets.join(
      queries.select(col("query_id")), col("vec_id") === col("query_id"))
      .select(col("query_id"), col("table"), col("bucket"))
    val candidates = buckets.join(broadcast(qBuckets), Seq("table", "bucket"))
      .select(col("query_id"), col("vec_id")).distinct()
    val scored = candidates
      .join(e, "vec_id")
      .join(broadcast(queries), "query_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineWithNorms(col("query_emb"), col("embedding"),
          dotCol(col("query_emb"), col("query_emb")),
          dotCol(col("embedding"), col("embedding"))))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("cosine"), 6).as("cosine"))
  }
}
