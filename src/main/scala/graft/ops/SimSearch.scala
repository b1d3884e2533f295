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

  /** biased variant over a PRIMITIVE array: bit j set iff emb·plane_j >=
    * bias(j) — equivalent to sign((emb - center)·plane_j) with bias =
    * center·plane_j. Array[Float] on purpose: the multi-table bucket pass
    * evaluates nTables x nBits x dim accesses per row, and Seq[Float]
    * boxes every element access (measured 5.1 s -> 0.6 s for the sf0.1
    * 32-table bucket job). */
  private[ops] def signature(
      emb: Array[Float], table: Array[Array[Double]], bias: Array[Double]): Long = {
    var sig = 0L
    var j = 0
    while (j < table.length) {
      val plane = table(j)
      var dot = 0.0
      var i = 0
      val n = math.min(plane.length, emb.length)
      while (i < n) { dot += emb(i) * plane(i); i += 1 }
      if (dot >= bias(j)) sig |= (1L << j)
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
      seed: Long = 42L): DataFrame =
    lshBuckets(embeddings, nBits, nTables, dim, seed, None)

  /** `center` variant: hyperplanes pass through the given point instead of
    * the origin — sign(x·p - center·p). Raw count/hash embeddings are
    * heavily correlated (every vector shares the vocabulary's sign mass),
    * so origin hyperplanes concentrate the corpus into a few sign
    * patterns and bucket occupancy goes quadratic; centering on the data
    * mean splits every bit ~50/50 (measured at sf0.1: max bucket 1830 ->
    * 283, candidate pairs 15.6M -> 0.52M at 12 bits x 16 tables).
    * Candidate GENERATION only — verification always scores the original
    * vectors, so reported cosines are unaffected. */
  def lshBuckets(
      embeddings: DataFrame,
      nBits: Int,
      nTables: Int,
      dim: Int,
      seed: Long,
      center: Option[Array[Double]]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val tables = Array.tabulate(nTables)(t => planes(nBits, dim, seed + t))
    // bias(t)(j) = center·plane_j: sign(x·p - bias) == sign((x-c)·p), so
    // the per-row kernel stays one dot product per bit
    val biases: Array[Array[Double]] = center match {
      case None => Array.fill(nTables)(new Array[Double](nBits))
      case Some(c) => tables.map(_.map { plane =>
        var s = 0.0
        var i = 0
        val n = math.min(plane.length, c.length)
        while (i < n) { s += c(i) * plane(i); i += 1 }
        s
      })
    }
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        val a = emb.toArray // unbox ONCE per row, not per plane access
        tables.iterator.zipWithIndex.map { case (tab, t) =>
          (id, t, signature(a, tab, biases(t)))
        }
      }
      .toDF("vec_id", "table", "bucket")
  }

  /** per-dimension mean of the embedding column (dim-bounded result; one
    * partial-aggregated pass — the vectors never move) */
  def embeddingMean(embeddings: DataFrame, dim: Int): Array[Double] = {
    val rows = embeddings
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(avg(col("x")).as("m"))
      .collect()
    val out = new Array[Double](dim)
    rows.foreach(r => { val i = r.getInt(0); if (i < dim) out(i) = r.getDouble(1) })
    out
  }

  // ---- IVF (inverted-file) index ---------------------------------------------

  /** deterministic Lloyd k-means over the embedding column. Init = the k
    * lowest-vec_id vectors (no RNG, partition-invariant); empty clusters
    * keep their previous centroid. Training frames here are bounded
    * hash-samples, so the normal path collects the sample ONCE and runs
    * Lloyd driver-locally (one job instead of iters+1 cluster round-trips
    * — see `collectTraining`); frames above the local cap keep the
    * distributed loop: one executor-local assignment pass against
    * BROADCAST centroids per iteration + k*dim tiny partial rows to the
    * driver, never the vectors themselves. */
  private[graft] def kmeansCentroids(
      embeddings: DataFrame,
      k: Int,
      iters: Int,
      dim: Int): Array[Array[Float]] =
    collectTraining(embeddings) match {
      case Some(xs) => localLloydMulti(xs, k, iters, 1, dim).head
      case None => kmeansCentroidsDistributed(embeddings, k, iters, dim)
    }

  // private[graft] so the OpsSpec parity gate can compare the two
  // trainers directly on one frame
  private[graft] def kmeansCentroidsDistributed(
      embeddings: DataFrame,
      k: Int,
      iters: Int,
      dim: Int): Array[Array[Float]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // the training loop scans the corpus once per iteration, and each
    // assignment pass ends in a collect (an action) — persist the projected
    // (id, embedding) frame so iterations 2..n read cached blocks instead
    // of re-scanning the source `iters` times; released before returning
    val e = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // init = the k lowest-vec_id vectors truncated/zero-padded to exactly
    // `dim` — the SAME init as the local path (localLloydMulti), so the two
    // trainers agree when the embedding length differs from `dim`:
    // full-length init vectors would let tail dims beyond `dim` steer
    // iteration-1 assignments, and embeddings shorter than `dim` would
    // overflow the update loop below
    var centroids: Array[Array[Float]] =
      e.orderBy("vec_id").limit(k).collect().map { case (_, emb) =>
        Array.tabulate(dim)(i => if (i < emb.length) emb(i) else 0f)
      }
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
    e.unpersist()
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

  /** a built IVF index — the tiny, broadcastable quantizer snapshot. A real
    * deployment builds this ONCE per corpus (an index build job), persists
    * the centroids, and serves every query batch from the snapshot instead
    * of re-training k-means per query (the shape `ivfTopK` convenience
    * wrapper still does in one call). */
  final case class IvfIndex(centroids: Array[Array[Float]])

  /** train the coarse quantizer. `nCentroids = 0` auto-tunes nlist to
    * ~sqrt(n) (the standard IVF sizing: balances list count vs list length).
    * Training runs on a deterministic hash-sample of at most `trainSample`
    * vectors — k-means needs a representative sample, not the corpus; at
    * 10^12 rows training on everything would be iters full scans. */
  def buildIvfIndex(
      embeddings: DataFrame,
      nCentroids: Int = 0,
      iters: Int = 3,
      dim: Int = 64,
      trainSample: Long = 200000L): IvfIndex = {
    val n = embeddings.count()
    IvfIndex(kmeansCentroids(hashSample(embeddings, n, trainSample),
      autoNlist(n, nCentroids), iters, dim))
  }

  /** nlist sizing shared by `buildIvfIndex` and `buildIvfPqIndex` (ONE
    * definition so the two builders cannot silently diverge): explicit
    * `nCentroids > 0` wins; 0 auto-tunes to ~sqrt(n) clamped to [4, 4096]
    * — the standard IVF balance of list count vs list length. */
  private def autoNlist(n: Long, nCentroids: Int): Int =
    if (nCentroids > 0) nCentroids
    else math.max(4, math.min(4096, math.round(math.sqrt(n.toDouble)).toInt))

  /** probe sizing paired with autoNlist: explicit `nProbe > 0` wins; 0
    * auto-scales to ~nlist/4 (the coverage the old fixed 4-of-16 defaults
    * gave) — a FIXED probe count against an auto-sized nlist silently
    * collapses recall as the corpus grows (probing 4 of sqrt(n) lists). */
  private def autoNProbe(nProbe: Int, nlist: Int): Int =
    if (nProbe > 0) math.min(nProbe, nlist)
    else math.max(4, math.min(nlist, (nlist + 3) / 4))

  /** deterministic modulus sample of at most ~trainSample rows (no RNG:
    * stable across retries); ceil division so the expected sample is
    * <= trainSample (floor would keep 100% of the corpus for n in
    * (trainSample, 2*trainSample)). Falls back to the full frame if a
    * pathological hash draw leaves the sample empty (k-means cannot init
    * from zero vectors). */
  private def hashSample(embeddings: DataFrame, n: Long, trainSample: Long): DataFrame =
    if (n <= trainSample) embeddings
    else {
      val keepOneIn = (n + trainSample - 1L) / trainSample
      val sampled = embeddings.filter(pmod(xxhash64(col("vec_id")), lit(keepOneIn)) === 0)
      if (sampled.isEmpty) embeddings else sampled
    }

  // ---- driver-local training over the bounded sample ----------------------------

  /** hard cap on rows `collectTraining` will pull to the driver (~300 MB
    * of 64-dim vectors): every index builder trains on a hashSample
    * bounded by `trainSample` (default 200k), so the cap only trips when
    * a caller explicitly asks for a multi-million-row training set — the
    * builders then keep the distributed Lloyd loop. */
  private val MaxLocalTrainRows = 1000000

  /** collect a bounded training frame to the driver in canonical vec_id
    * order, or None above the cap. Index training is sample-bounded BY
    * DESIGN, so ONE collect replaces the (iters+1) cluster round-trips
    * per Lloyd loop — the faiss lifecycle (train on one node, serve
    * distributed); at 1000 executors the training latency is driver
    * arithmetic instead of iters sequential job launches. Canonical
    * ordering also makes the trained centroids partition-invariant by
    * construction rather than by benign float reassociation. */
  private def collectTraining(embeddings: DataFrame): Option[Array[Array[Float]]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // cap gate = a count over a transient cache, NOT a limit(cap+1)
    // collect: an over-cap frame costs one extra executor-side
    // materialization (the distributed trainer re-persists its own
    // projection) instead of a cap-sized driver pull discarded on the
    // spot, and a count cannot silently truncate when a caller passes a
    // cap beyond the Int.MaxValue collect limit
    val e = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (e.count() <= MaxLocalTrainRows) Some(e.collect().sortBy(_._1).map(_._2.toArray))
      else None
    } finally e.unpersist()
  }

  /** evaluate `body` over [0, n) split into a FIXED number of chunks run
    * concurrently on the driver, returning per-chunk results in chunk
    * order. The chunk count deliberately does NOT follow the core count:
    * trained centroids feed partition-invariance gates and the scaling
    * campaigns run at different local[N], so training output may not
    * depend on the parallelism level — fixed chunking + in-order merge
    * keeps the float math deterministic under any thread scheduling. */
  private val LocalTrainChunks = 32
  private def parChunks[A](n: Int)(body: (Int, Int) => A): IndexedSeq[A] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val nChunks = math.max(1, math.min(LocalTrainChunks, n))
    val bounds = Array.tabulate(nChunks + 1)(i => ((n.toLong * i) / nChunks).toInt)
    val futs = IndexedSeq.tabulate(nChunks)(c => Future(body(bounds(c), bounds(c + 1))))
    futs.map(Await.result(_, Duration.Inf))
  }

  /** driver-local Lloyd over the collected sample — the same math as the
    * distributed loop (lowest-vec_id init, per-cell mean update, empty
    * clusters keep their previous centroid), chunk partials merged in
    * chunk order. m subquantizers over subDim-wide slices; m=1 with
    * subDim=dim is plain k-means. */
  private[graft] def localLloydMulti(
      xs: Array[Array[Float]],
      k: Int, iters: Int, m: Int, subDim: Int): Array[Array[Array[Float]]] = {
    var cents: Array[Array[Array[Float]]] = Array.tabulate(m) { j =>
      xs.take(k).map { emb =>
        Array.tabulate(subDim)(i => if (j * subDim + i < emb.length) emb(j * subDim + i) else 0f)
      }
    }
    val kk = if (xs.isEmpty) 0 else cents(0).length
    var it = 0
    while (it < iters && kk > 0) {
      val cs = cents
      val partials = parChunks(xs.length) { (lo, hi) =>
        val sums = Array.ofDim[Double](m, kk, subDim)
        val counts = Array.ofDim[Long](m, kk)
        var idx = lo
        while (idx < hi) {
          val arr = xs(idx)
          val emb = scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
          var j = 0
          while (j < m) {
            val c = nearestSub(emb, j * subDim, cs(j))
            counts(j)(c) += 1
            val off = j * subDim
            var i = 0
            while (i < subDim && off + i < arr.length) { sums(j)(c)(i) += arr(off + i); i += 1 }
            j += 1
          }
          idx += 1
        }
        (sums, counts)
      }
      val totSums = Array.ofDim[Double](m, kk, subDim)
      val totCounts = Array.ofDim[Long](m, kk)
      partials.foreach { case (s, cn) =>
        var j = 0
        while (j < m) {
          var c = 0
          while (c < kk) {
            totCounts(j)(c) += cn(j)(c)
            var i = 0
            while (i < subDim) { totSums(j)(c)(i) += s(j)(c)(i); i += 1 }
            c += 1
          }
          j += 1
        }
      }
      val next = cents.map(_.map(_.clone()))
      var j = 0
      while (j < m) {
        var c = 0
        while (c < kk) {
          if (totCounts(j)(c) > 0) {
            var i = 0
            while (i < subDim) { next(j)(c)(i) = (totSums(j)(c)(i) / totCounts(j)(c)).toFloat; i += 1 }
          }
          c += 1
        }
        j += 1
      }
      cents = next
      it += 1
    }
    cents
  }

  /** driver-local counterpart of `rotateEmbeddings` for the collected
    * sample (same fail-fast dimension check) */
  private def rotateLocal(xs: Array[Array[Float]], rot: Array[Array[Float]]): Array[Array[Float]] = {
    val dim = rot.length
    val out = new Array[Array[Float]](xs.length)
    parChunks(xs.length) { (lo, hi) =>
      var idx = lo
      while (idx < hi) {
        val emb = xs(idx)
        require(emb.length == dim,
          s"rotation built for dim $dim applied to ${emb.length}-dim vector")
        val o = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          val row = rot(i)
          var acc = 0.0
          var k = 0
          while (k < dim) { acc += row(k) * emb(k); k += 1 }
          o(i) = acc.toFloat
          i += 1
        }
        out(idx) = o
        idx += 1
      }
      ()
    }
    out
  }

  /** ANN search against a pre-built IVF index: vectors are assigned to their
    * nearest centroid's posting list (one executor-local pass against the
    * broadcast quantizer); queries probe the `nProbe` nearest lists and
    * score exactly within them. Per-query work is ~nProbe/nlist of a scan.
    * Complements lshTopK — IVF partitions by geometry (good for clustered
    * embeddings), LSH by random projection (good for uniform). */
  def ivfTopKWithIndex(
      embeddings: DataFrame,
      index: IvfIndex,
      nQueries: Int = 5,
      k: Int = 10,
      nProbe: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = index.centroids
    val probeN = autoNProbe(nProbe, cents.length)
    val bc = spark.sparkContext.broadcast(cents)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val assigned = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) => (id, nearestCentroid(emb, bc.value)) }
      .toDF("vec_id", "cid")
    // queries are tiny: collect once, derive probe lists driver-side (the
    // quantizer is local anyway), broadcast both — no distributed pass over
    // a 5-row frame, and the corpus is scanned once (assignment) + probed
    val qLocal = e.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val queries = qLocal.toSeq.toDF("query_id", "query_emb")
    val qProbes = qLocal.toSeq
      .flatMap { case (qid, emb) => nearestCentroids(emb, cents, probeN).toSeq.map(c => (qid, c)) }
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

  /** one-call convenience: build (nCentroids, iters) + search. Production
    * reuses `buildIvfIndex` output across query batches instead. */
  def ivfTopK(
      embeddings: DataFrame,
      nQueries: Int = 5,
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      iters: Int = 3,
      dim: Int = 64): DataFrame =
    ivfTopKWithIndex(embeddings,
      buildIvfIndex(embeddings, nCentroids, iters, dim), nQueries, k, nProbe)

  /** ANN via LSH buckets: score only same-(table,bucket) candidates.
    *
    * Queries are tiny: collected once, their bucket signatures computed
    * driver-side with the same plane tables, and broadcast — so the
    * corpus-sized bucket frame is consumed exactly ONCE by the candidate
    * join. (The previous shape joined `buckets` against itself for the
    * query side: the typed signature flatMap computed twice — Spark does
    * not reuse exchanges under typed subtrees.) */
  def lshTopK(
      embeddings: DataFrame,
      nQueries: Int = 5,
      k: Int = 10,
      nBits: Int = 12,
      nTables: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val buckets = lshBuckets(embeddings, nBits, nTables, dim, seed)
    val qLocal = e.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val queries = qLocal.toSeq.toDF("query_id", "query_emb")
    val tables = Array.tabulate(nTables)(t => planes(nBits, dim, seed + t))
    val qBuckets = qLocal.toSeq
      .flatMap { case (qid, emb) =>
        tables.iterator.zipWithIndex.map { case (tab, t) => (qid, t, signature(emb, tab)) }
      }
      .toDF("query_id", "table", "bucket")
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

  // ---- embedding storage: int8 scalar quantization -----------------------------

  /** per-vector int8 scalar quantization — the standard storage/serving
    * compression for embedding corpora (4x over float32; at 100 TB of
    * vectors the scan-bytes win IS the latency win). Per vector:
    * offset = min(x), scale = (max - min)/255, code = least(floor((x -
    * offset)/scale), 255); constant vectors (scale 0) code to all-zeros.
    * Also emits the max elementwise reconstruction error (bounded by
    * `scale`, i.e. the bin width) so downstream recall analysis is
    * data-driven, not assumed.
    *
    * Pure codegen'd column math (transform/array_max on doubles) — no UDF,
    * no shuffle: runs inside the scan stage. Codes are emitted as a CSV
    * string column (`q_csv`) for engine-portable byte comparison; a
    * production sink would write the packed binary column instead. */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val withParams = e
      .withColumn("offset", array_min(col("emb")))
      .withColumn("scale", (array_max(col("emb")) - col("offset")) / 255.0)
    val code: Column => Column = x =>
      least(floor((x - col("offset")) / col("scale")), lit(255.0)).cast("int")
    withParams
      .withColumn("q_csv",
        when(col("scale") === 0.0,
          concat_ws(",", transform(col("emb"), _ => lit(0))))
          .otherwise(concat_ws(",", transform(col("emb"), code))))
      .withColumn("max_err",
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(array_max(transform(col("emb"),
            x => abs(x - (col("offset") + code(x) * col("scale")))))))
      .select(col("vec_id"), col("q_csv"),
        round(col("offset"), 6).as("offset"), round(col("scale"), 6).as("scale"),
        round(col("max_err"), 6).as("max_err"))
  }

  // ---- product quantization (PQ) -----------------------------------------------

  /** a trained PQ codebook: `m` subvectors, each with its own `k`-centroid
    * quantizer over `subDim` dims — centroids(j)(c) is centroid c of
    * subvector j. Tiny (m*k*subDim floats) and broadcastable; like
    * IvfIndex, a real deployment trains ONCE per corpus and serves every
    * encode/search from the snapshot. */
  final case class PqCodebook(subDim: Int, centroids: Array[Array[Array[Float]]]) {
    def m: Int = centroids.length
    def k: Int = if (centroids.isEmpty) 0 else centroids(0).length
  }

  /** train a PQ codebook: the embedding is split into `m` contiguous
    * subvectors and each gets an independent deterministic k-means
    * quantizer (trained on the same bounded hash-sample as IVF). Memory
    * per encoded vector is m*ceil(log2 k)/8 bytes — m=8,k=16 compresses a
    * 64-dim float32 vector 64x (256 -> 4 bytes packed; codes are emitted
    * unpacked as array<int> here, the sink packs). */
  def buildPqCodebook(
      embeddings: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 3,
      dim: Int = 64,
      trainSample: Long = 200000L): PqCodebook = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subvectors")
    val subDim = dim / m
    val training = hashSample(embeddings, embeddings.count(), trainSample)
    PqCodebook(subDim, kmeansCentroidsMulti(training, k, iters, m, subDim))
  }

  /** train ALL m subvector quantizers simultaneously: identical math to m
    * independent `kmeansCentroids` runs over the slices (same lowest-k
    * init, same mean updates — verified by the PQ OpsSpec gates). Bounded
    * samples (the normal case) train driver-locally after one collect;
    * above the cap the distributed loop scans the sample once per
    * iteration for all m quantizers at once. */
  private def kmeansCentroidsMulti(
      embeddings: DataFrame,
      k: Int,
      iters: Int,
      m: Int,
      subDim: Int): Array[Array[Array[Float]]] =
    collectTraining(embeddings) match {
      case Some(xs) => localLloydMulti(xs, k, iters, m, subDim)
      case None => kmeansCentroidsMultiDistributed(embeddings, k, iters, m, subDim)
    }

  private[graft] def kmeansCentroidsMultiDistributed(
      embeddings: DataFrame,
      k: Int,
      iters: Int,
      m: Int,
      subDim: Int): Array[Array[Array[Float]]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // init: the k lowest-vec_id vectors, sliced per subvector (identical
    // to each slice-run's own lowest-k init)
    val initRows = e.orderBy("vec_id").limit(k).collect().map(_._2)
    var cents: Array[Array[Array[Float]]] = Array.tabulate(m) { j =>
      initRows.map { emb =>
        Array.tabulate(subDim)(i =>
          if (j * subDim + i < emb.length) emb(j * subDim + i) else 0f)
      }
    }
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = e.mapPartitions { rows =>
        val cs = bc.value
        val sums = Array.ofDim[Double](m, k, subDim)
        val counts = Array.ofDim[Long](m, k)
        rows.foreach { case (_, emb) =>
          var j = 0
          while (j < m) {
            val c = nearestSub(emb, j * subDim, cs(j))
            counts(j)(c) += 1
            var i = 0
            val off = j * subDim
            while (i < subDim && off + i < emb.length) { sums(j)(c)(i) += emb(off + i); i += 1 }
            j += 1
          }
        }
        (for { j <- 0 until m; c <- 0 until k if counts(j)(c) > 0 }
          yield (j, c, counts(j)(c), sums(j)(c).toSeq)).iterator
      }.collect()
      bc.destroy() // same per-iteration cleanup as kmeansCentroids
      val next = cents.map(_.map(_.clone()))
      val totSums = Array.ofDim[Double](m, k, subDim)
      val totCounts = Array.ofDim[Long](m, k)
      partials.foreach { case (j, c, n, s) =>
        totCounts(j)(c) += n
        var i = 0
        while (i < subDim) { totSums(j)(c)(i) += s(i); i += 1 }
      }
      var j = 0
      while (j < m) {
        var c = 0
        while (c < k) {
          if (totCounts(j)(c) > 0) {
            var i = 0
            while (i < subDim) {
              next(j)(c)(i) = (totSums(j)(c)(i) / totCounts(j)(c)).toFloat; i += 1
            }
          }
          c += 1
        }
        j += 1
      }
      cents = next
      it += 1
    }
    e.unpersist()
    cents
  }

  /** squared L2 of one subvector slice against a centroid */
  private def subDist2(emb: Seq[Float], off: Int, cent: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(cent.length, math.max(emb.length - off, 0))
    while (i < n) { val x = emb(off + i) - cent(i); d += x * x; i += 1 }
    d
  }

  private def nearestSub(emb: Seq[Float], off: Int, cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = subDist2(emb, off, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** encode every vector to its m PQ codes — one executor-local pass
    * against the broadcast codebook, no shuffle */
  def pqEncode(embeddings: DataFrame, cb: PqCodebook): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val c = bc.value
        it.map { case (id, emb) =>
          val codes = new Array[Int](c.m)
          var j = 0
          while (j < c.m) { codes(j) = nearestSub(emb, j * c.subDim, c.centroids(j)); j += 1 }
          (id, codes.toSeq)
        }
      }
      .toDF("vec_id", "codes")
  }

  /** pack k<=16 PQ codes into a binary column, one nibble per code (m=8,
    * k=16 -> 4 bytes/vector, the storage the 64x-compression claim is
    * about). Pure codegen'd column math: code -> hex digit -> unhex.
    * Requires even m (whole bytes). Codes outside 0..15 or null elements
    * would silently shift every later nibble (conv emits 2+ hex digits,
    * concat_ws drops nulls) — such rows pack to NULL instead, so contract
    * violations are loud, never silently-wrong ANN results. A NULL codes
    * ARRAY also packs to NULL: exists(NULL, …) is NULL, which would fall
    * through the `when` and emit a 0-byte binary that unpacks to an empty
    * code list — the silent corruption this contract exists to prevent. */
  def packCodes4bit(codes: Column): Column =
    when(codes.isNull.or(exists(codes, c => c.isNull || c < 0 || c > 15)), lit(null))
      .otherwise(unhex(concat_ws("", transform(codes, c => lower(conv(c.cast("long"), 10, 16))))))

  /** inverse of packCodes4bit: binary -> array<int> of nibbles */
  def unpackCodes4bit(packed: Column): Column =
    transform(split(regexp_replace(hex(packed), "(.)", "$1,"), ",").dropRight,
      c => conv(c, 16, 10).cast("int"))

  private implicit class ColOps(c: Column) {
    /** split(...) on a trailing-delimiter string leaves one empty tail
      * element; drop it */
    def dropRight: Column = slice(c, lit(1), size(c) - 1)
  }

  /** PQ ANN: asymmetric-distance (ADC) scan over the CODES (m table
    * lookups per vector instead of dim multiplies over float32 — the scan
    * reads ~m bytes/vector, the 100 TB win), shortlist the top
    * `rerank * k` per query, then EXACT cosine re-rank of the shortlist
    * only (the standard PQ serving shape). Queries stay float; per-query
    * dot tables (m x k) and the query-independent centroid norms are
    * driver-computed and broadcast with the codebook. Output schema
    * matches bruteForceTopK (exact cosines on the returned rows). */
  def pqTopK(
      embeddings: DataFrame,
      cb: PqCodebook,
      nQueries: Int = 5,
      k: Int = 10,
      rerank: Int = 4): DataFrame =
    pqTopKFromCodes(pqEncode(embeddings, cb), embeddings, cb, nQueries, k, rerank)

  /** serve from a PRE-ENCODED codes frame (vec_id, codes) — the deployment
    * shape: encode once per corpus (a build job, persisted next to the
    * codebook snapshot), serve every query batch from the codes table;
    * the convenience pqTopK wrapper re-encodes per call. */
  def pqTopKFromCodes(
      codesDf: DataFrame,
      embeddings: DataFrame,
      cb: PqCodebook,
      nQueries: Int = 5,
      k: Int = 10,
      rerank: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val qLocal = e.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    // per-query [m][k] dot tables + query norms; centroid norm^2 per (j,c)
    val centNorm2 = cb.centroids.map(_.map(c => c.map(x => x.toDouble * x).sum))
    val tables = qLocal.map { case (qid, qemb) =>
      val t = Array.tabulate(cb.m, cb.k) { (j, c) =>
        val cent = cb.centroids(j)(c)
        var d = 0.0
        var i = 0
        val off = j * cb.subDim
        while (i < cent.length && off + i < qemb.length) { d += qemb(off + i) * cent(i); i += 1 }
        d
      }
      val qn = math.sqrt(qemb.map(x => x.toDouble * x).sum)
      (qid, t, qn)
    }
    val bcTables = spark.sparkContext.broadcast(tables)
    val bcNorm2 = spark.sparkContext.broadcast(centNorm2)
    val scored = codesDf.select(col("vec_id").cast("long"), col("codes")).as[(Long, Seq[Int])]
      .mapPartitions { it =>
        val ts = bcTables.value
        val n2 = bcNorm2.value
        it.flatMap { case (vid, codes) =>
          // approx |x| from the reconstruction: sqrt(sum_j |c_j|^2)
          var xn2 = 0.0
          var j = 0
          while (j < codes.length) { xn2 += n2(j)(codes(j)); j += 1 }
          val xn = math.max(math.sqrt(xn2), 1e-12)
          ts.iterator.flatMap { case (qid, t, qn) =>
            if (qid == vid) None
            else {
              var dot = 0.0
              var jj = 0
              while (jj < codes.length) { dot += t(jj)(codes(jj)); jj += 1 }
              Some((qid, vid, dot / (math.max(qn, 1e-12) * xn)))
            }
          }
        }
      }
      .toDF("query_id", "vec_id", "approx_cos")
    rerankShortlist(scored, e, qLocal, k, rerank)
  }

  /** shared ADC-serving tail for pqTopK/ivfPqTopK: window the approx
    * scores to a `rerank * k` shortlist per query, then EXACT cosine
    * re-rank of the shortlist only. One place so the two paths can never
    * diverge in schema or tie-breaking (output matches bruteForceTopK). */
  private def rerankShortlist(
      scored: DataFrame,
      e: DataFrame,
      qLocal: Array[(Long, Seq[Float])],
      k: Int,
      rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = scored.sparkSession
    import spark.implicits._
    val wA = Window.partitionBy("query_id").orderBy(col("approx_cos").desc, col("vec_id").asc)
    val shortlist = scored.withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= k * rerank)
      .select(col("query_id"), col("vec_id"))
    val queries = qLocal.toSeq.toDF("query_id", "query_emb")
    val exact = shortlist
      .join(e, "vec_id")
      .join(broadcast(queries), "query_id")
      .withColumn("cosine", cosineCol(col("query_emb"), col("embedding")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("cosine"), 6).as("cosine"))
  }

  // ---- IVF-PQ: the composed big-index serving shape ----------------------------

  /** coarse IVF quantizer + PQ codebook trained on RESIDUALS (vector minus
    * its assigned coarse centroid — residuals are what PQ sees at query
    * time, so training on them is the accuracy-preserving choice; raw-
    * vector PQ wastes codebook capacity re-describing the coarse
    * structure). Both snapshots are tiny and broadcastable. */
  final case class IvfPqIndex(ivf: IvfIndex, pq: PqCodebook)

  /** vector minus its coarse centroid (zero-padded) — ONE definition used
    * by both codebook training and serving-time encode: the PQ codebook
    * only matches what ivfPqEncode produces if these are byte-identical */
  private def residual(emb: Seq[Float], cent: Array[Float]): Seq[Float] =
    emb.toArray.zipWithIndex.map { case (x, i) =>
      x - (if (i < cent.length) cent(i) else 0f) }.toSeq

  def buildIvfPqIndex(
      embeddings: DataFrame,
      nCentroids: Int = 0,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 3,
      dim: Int = 64,
      trainSample: Long = 200000L): IvfPqIndex = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subvectors")
    val spark = embeddings.sparkSession
    import spark.implicits._
    // count ONCE, sample ONCE: the coarse training, the residual pass and
    // the PQ training all read the same sample (re-sampling the sample
    // would also be wrong — modulus samples of the same hash do not
    // compose: a second keepOneIn either keeps ~100% or a correlated
    // biased half). nlist auto-sizing sees the TRUE corpus size.
    val n = embeddings.count()
    val nlist = autoNlist(n, nCentroids)
    val sampleDf = hashSample(embeddings, n, trainSample)
    collectTraining(sampleDf) match {
      case Some(xs) =>
        // bounded sample: coarse train, residual pass and PQ train are all
        // driver arithmetic after the one collect (the faiss build shape)
        val ivfCents = localLloydMulti(xs, nlist, iters, 1, dim).head
        val residuals = new Array[Array[Float]](xs.length)
        parChunks(xs.length) { (lo, hi) =>
          var idx = lo
          while (idx < hi) {
            val x = xs(idx)
            val emb = scala.collection.immutable.ArraySeq.unsafeWrapArray(x)
            val cent = ivfCents(nearestCentroid(emb, ivfCents))
            // same zero-padded subtraction as `residual` — the codebook
            // only matches what ivfPqEncode produces if these agree
            residuals(idx) = Array.tabulate(x.length)(i =>
              x(i) - (if (i < cent.length) cent(i) else 0f))
            idx += 1
          }
          ()
        }
        IvfPqIndex(IvfIndex(ivfCents),
          PqCodebook(dim / m, localLloydMulti(residuals, k, iters, m, dim / m)))
      case None =>
        val sample = sampleDf
          .select(col("vec_id").cast("long"), col("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // straight to the distributed trainers: the sample is known to be
        // over the local cap, re-probing collectTraining would waste a pass
        val ivf = IvfIndex(kmeansCentroidsDistributed(sample, nlist, iters, dim))
        val bc = spark.sparkContext.broadcast(ivf.centroids)
        val residuals = sample
          .as[(Long, Seq[Float])]
          .mapPartitions { it =>
            val cents = bc.value
            it.map { case (id, emb) => (id, residual(emb, cents(nearestCentroid(emb, cents)))) }
          }
          .toDF("vec_id", "embedding")
        // residuals are already sample-sized: train directly, no re-sampling
        val pq = PqCodebook(dim / m, kmeansCentroidsMultiDistributed(residuals, k, iters, m, dim / m))
        sample.unpersist()
        bc.destroy()
        IvfPqIndex(ivf, pq)
    }
  }

  /** deterministic random ROTATION for PQ (the random-rotation baseline of
    * OPQ: correlated/unbalanced dimensions concentrate error in a few
    * subvectors; a random orthogonal basis spreads variance uniformly,
    * capturing most of trained-OPQ's gain with no training). Built by
    * Gram-Schmidt over seeded pseudo-gaussian vectors; cosine is invariant
    * under rotation, so exact search on rotated vectors returns IDENTICAL
    * results (test-gated) while PQ on rotated vectors quantizes better. */
  def randomRotation(dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val raw = planes(dim, dim, seed) // reuse the deterministic generator
    val q = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var k = 0
      while (k < dim) { q(i)(k) = raw(i)(k); k += 1 }
      // subtract projections on previous rows
      var j = 0
      while (j < i) {
        var dot = 0.0
        k = 0
        while (k < dim) { dot += q(i)(k) * q(j)(k); k += 1 }
        k = 0
        while (k < dim) { q(i)(k) -= dot * q(j)(k); k += 1 }
        j += 1
      }
      var n2 = 0.0
      k = 0
      while (k < dim) { n2 += q(i)(k) * q(i)(k); k += 1 }
      val inv = 1.0 / math.sqrt(n2)
      k = 0
      while (k < dim) { q(i)(k) *= inv; k += 1 }
      i += 1
    }
    q.map(_.map(_.toFloat))
  }

  /** apply a rotation to the embedding column — one executor-local pass
    * against the broadcast matrix, no shuffle. Rotate once at ingest,
    * store rotated vectors, and every PQ build/encode/search downstream
    * operates in the rotated basis transparently. */
  def rotateEmbeddings(embeddings: DataFrame, rot: Array[Array[Float]]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(rot)
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val r = bc.value
        it.map { case (id, emb) =>
          // fail fast: a truncated matmul is NOT a rotation — cosine
          // invariance breaks and every downstream search is silently wrong
          require(emb.length == r.length,
            s"rotation built for dim ${r.length} applied to ${emb.length}-dim vector $id")
          val out = new Array[Float](r.length)
          var i = 0
          while (i < r.length) {
            val row = r(i)
            var acc = 0.0
            var k = 0
            while (k < row.length) { acc += row(k) * emb(k); k += 1 }
            out(i) = acc.toFloat
            i += 1
          }
          (id, out.toSeq)
        }
      }
      .toDF("vec_id", "embedding")
  }

  /** trained OPQ: rotation + codebook jointly optimized (the
    * non-parametric OPQ of Ge et al., CVPR 2013 — the algorithm behind
    * faiss's OPQMatrix). Alternates (a) PQ codebook training in the
    * current rotated basis with (b) an orthogonal-Procrustes update of
    * the rotation toward the quantized reconstructions:
    * R = argmin_R sum ||R x - y^|| = V U^T where U S V^T = svd(sum x y^T)
    * (solved with the LAPACK SVD that ships in Spark's breeze jars —
    * a dim x dim matrix, driver-side, microseconds at embedding dims).
    *
    * Scale shape: every heavy pass is executor-local over the SAME
    * bounded persisted hash-sample the other index builders train on;
    * the only driver state is the dim^2 correlation matrix (32 KB at
    * dim=64) and the codebook — both broadcastable. Deployment trains
    * ONCE per corpus and stores (rotation, codebook) as a snapshot;
    * rotate at ingest like the random-rotation baseline.
    *
    * `mseHistory` records per-iteration reconstruction MSE; its head is
    * the RANDOM-ROTATION baseline (iteration 0 = seeded random R with a
    * codebook trained in that basis), so `last < head` is exactly
    * "training beat the baseline" — test-gated on anisotropic data. */
  final case class OpqResult(
      rotation: Array[Array[Float]],
      codebook: PqCodebook,
      mseHistory: Seq[Double])

  def trainOpq(
      embeddings: DataFrame,
      m: Int = 8,
      k: Int = 16,
      dim: Int = 64,
      opqIters: Int = 4,
      kmeansIters: Int = 3,
      trainSample: Long = 200000L,
      seed: Long = 42L): OpqResult = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subvectors")
    val subDim = dim / m
    val sampleDf = hashSample(embeddings, embeddings.count(), trainSample)
    collectTraining(sampleDf) match {
      case Some(xs) =>
        // the whole alternation is driver arithmetic over the collected
        // sample: zero cluster round-trips after the one collect (vs
        // ~opqIters*(kmeansIters+2) jobs through the distributed loop)
        var rot = randomRotation(dim, seed)
        def retrain(r: Array[Array[Float]]): PqCodebook =
          PqCodebook(subDim, localLloydMulti(rotateLocal(xs, r), k, kmeansIters, m, subDim))
        var cb = retrain(rot)
        val mses = scala.collection.mutable.ArrayBuffer.empty[Double]
        var it = 0
        while (it < opqIters) {
          val (mMat, se, n) = opqPassLocal(xs, rot, cb, dim, needM = true)
          mses += se / math.max(n, 1L)
          rot = procrustesRotation(mMat, dim)
          cb = retrain(rot)
          it += 1
        }
        val (_, seF, nF) = opqPassLocal(xs, rot, cb, dim, needM = false)
        mses += seF / math.max(nF, 1L)
        OpqResult(rot, cb, mses.toSeq)
      case None =>
        val sample = sampleDf
          .select(col("vec_id").cast("long"), col("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          var rot = randomRotation(dim, seed)
          var cb = PqCodebook(subDim, kmeansCentroidsMultiDistributed(
            rotateEmbeddings(sample, rot), k, kmeansIters, m, subDim))
          val mses = scala.collection.mutable.ArrayBuffer.empty[Double]
          var it = 0
          while (it < opqIters) {
            val (mMat, se, n) = opqPass(sample, rot, cb, dim, needM = true)
            mses += se / math.max(n, 1L)
            rot = procrustesRotation(mMat, dim)
            cb = PqCodebook(subDim, kmeansCentroidsMultiDistributed(
              rotateEmbeddings(sample, rot), k, kmeansIters, m, subDim))
            it += 1
          }
          val (_, seF, nF) = opqPass(sample, rot, cb, dim, needM = false)
          mses += seF / math.max(nF, 1L)
          OpqResult(rot, cb, mses.toSeq)
        } finally sample.unpersist()
    }
  }

  /** driver-local counterpart of `opqPass` over the collected sample —
    * identical accumulation math, chunk partials merged in chunk order */
  private[graft] def opqPassLocal(
      xs: Array[Array[Float]],
      rot: Array[Array[Float]],
      cb: PqCodebook,
      dim: Int,
      needM: Boolean): (Array[Double], Double, Long) = {
    val partials = parChunks(xs.length) { (lo, hi) =>
      val mAcc = new Array[Double](if (needM) dim * dim else 0)
      var se = 0.0
      var cnt = 0L
      val rx = new Array[Float](dim)
      val rxSeq = scala.collection.immutable.ArraySeq.unsafeWrapArray(rx)
      var idx = lo
      while (idx < hi) {
        val emb = xs(idx)
        require(emb.length == dim,
          s"OPQ trained for dim $dim applied to ${emb.length}-dim vector")
        var i = 0
        while (i < dim) {
          val row = rot(i)
          var acc = 0.0
          var kk = 0
          while (kk < dim) { acc += row(kk) * emb(kk); kk += 1 }
          rx(i) = acc.toFloat
          i += 1
        }
        var j = 0
        while (j < cb.m) {
          val cent = cb.centroids(j)(nearestSub(rxSeq, j * cb.subDim, cb.centroids(j)))
          val off = j * cb.subDim
          var s = 0
          while (s < cb.subDim) {
            val y = cent(s)
            val d = rx(off + s) - y
            se += d * d
            if (needM) {
              var a = 0
              while (a < dim) { mAcc(a * dim + (off + s)) += emb(a) * y; a += 1 }
            }
            s += 1
          }
          j += 1
        }
        cnt += 1L
        idx += 1
      }
      (mAcc, se, cnt)
    }
    val mTot = new Array[Double](if (needM) dim * dim else 0)
    var se = 0.0
    var n = 0L
    partials.foreach { case (p, s, c) =>
      var i = 0
      while (i < mTot.length) { mTot(i) += p(i); i += 1 }
      se += s
      n += c
    }
    (mTot, se, n)
  }

  /** mean squared reconstruction error of (rotation, codebook) over a
    * frame — the quantization-quality metric OPQ minimizes; public so
    * callers (and the gates) can compare bases on held-out data. */
  def pqReconstructionMse(
      embeddings: DataFrame,
      rot: Array[Array[Float]],
      cb: PqCodebook): Double = {
    val e = embeddings.select(col("vec_id").cast("long"), col("embedding"))
    val (_, se, n) = opqPass(e, rot, cb, rot.length, needM = false)
    se / math.max(n, 1L)
  }

  /** one distributed pass: per vector x, rotate (rx = R x), PQ-encode rx,
    * reconstruct y^; accumulate squared error ||rx - y^||^2 and (when
    * `needM` — the Procrustes update needs it, the MSE metric does not:
    * the M accumulation is O(dim^2) per vector, as costly as the rotation
    * itself) the correlation M += x y^T. Partials are one dim^2 array per
    * partition, summed on the driver in partition order (deterministic
    * for a fixed layout, same contract as the k-means partial sums). */
  private[graft] def opqPass(
      sample: DataFrame,
      rot: Array[Array[Float]],
      cb: PqCodebook,
      dim: Int,
      needM: Boolean): (Array[Double], Double, Long) = {
    val spark = sample.sparkSession
    import spark.implicits._
    val bcR = spark.sparkContext.broadcast(rot)
    val bcC = spark.sparkContext.broadcast(cb)
    val partials = sample.as[(Long, Seq[Float])].mapPartitions { rows =>
      val r = bcR.value
      val c = bcC.value
      val mAcc = new Array[Double](if (needM) dim * dim else 0)
      var se = 0.0
      var cnt = 0L
      val rx = new Array[Float](dim)
      rows.foreach { case (id, emb) =>
        require(emb.length == dim,
          s"OPQ trained for dim $dim applied to ${emb.length}-dim vector $id")
        var i = 0
        while (i < dim) {
          val row = r(i)
          var acc = 0.0
          var kk = 0
          while (kk < dim) { acc += row(kk) * emb(kk); kk += 1 }
          rx(i) = acc.toFloat
          i += 1
        }
        val rxSeq = scala.collection.immutable.ArraySeq.unsafeWrapArray(rx)
        var j = 0
        while (j < c.m) {
          val cent = c.centroids(j)(nearestSub(rxSeq, j * c.subDim, c.centroids(j)))
          val off = j * c.subDim
          var s = 0
          while (s < c.subDim) {
            val y = cent(s)
            val d = rx(off + s) - y
            se += d * d
            if (needM) {
              // M(a,b) = sum x(a) * y^(b), flattened row-major
              var a = 0
              while (a < dim) { mAcc(a * dim + (off + s)) += emb(a) * y; a += 1 }
            }
            s += 1
          }
          j += 1
        }
        cnt += 1L
      }
      Iterator.single((mAcc.toSeq, se, cnt))
    }.collect()
    bcR.destroy()
    bcC.destroy()
    val mTot = new Array[Double](if (needM) dim * dim else 0)
    var se = 0.0
    var n = 0L
    partials.foreach { case (p, s, c) =>
      var i = 0
      while (i < mTot.length) { mTot(i) += p(i); i += 1 }
      se += s
      n += c
    }
    (mTot, se, n)
  }

  /** orthogonal-Procrustes solve: R maximizing tr(R M) over orthogonal
    * matrices is V U^T for M = U S V^T (M arrives flattened row-major) */
  private def procrustesRotation(mFlat: Array[Double], dim: Int): Array[Array[Float]] = {
    // breeze DenseMatrix is column-major: (i,j) = data(j*rows + i)
    val mMat = new breeze.linalg.DenseMatrix[Double](dim, dim)
    var a = 0
    while (a < dim) {
      var b = 0
      while (b < dim) { mMat(a, b) = mFlat(a * dim + b); b += 1 }
      a += 1
    }
    val svdR = breeze.linalg.svd(mMat)
    val r = svdR.Vt.t * svdR.U.t
    Array.tabulate(dim, dim)((i, j) => r(i, j).toFloat)
  }

  /** persist an IVF-PQ index snapshot as a parquet table — the index
    * LIFECYCLE is data, not process state: a build job trains once, saves,
    * and every serving job loads the snapshot (alongside a persisted
    * `ivfPqEncode` codes table) instead of re-training. Layout: one row
    * per centroid, (component, a, b, vec) where component is "ivf"
    * (a = list id) or "pq" (a = subvector, b = code). */
  def saveIvfPqIndex(index: IvfPqIndex, path: String, spark: org.apache.spark.sql.SparkSession): Unit =
    saveComponentSnapshot(Seq("ivf" -> index.ivf.centroids), index.pq, path, spark)

  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfPqIndex = {
    val (mats, pq) = loadComponentSnapshot(spark, path, Seq("ivf"))
    IvfPqIndex(IvfIndex(mats("ivf")), pq)
  }

  /** shared snapshot codec for the (matrix components + PQ codebook)
    * index families — one encode/decode so a fix to any family cannot
    * silently miss the others. Rows: (component, a, b, vec) with
    * component = a matrix label (a = row/list index) or "pq"
    * (a = subvector, b = code). */
  private def saveComponentSnapshot(
      mats: Seq[(String, Array[Array[Float]])],
      pq: PqCodebook,
      path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val matRows = mats.flatMap { case (label, m) =>
      m.zipWithIndex.map { case (c, i) => (label, i, 0, c.toSeq) }
    }
    val pqRows = for {
      (sub, j) <- pq.centroids.zipWithIndex.toSeq
      (c, code) <- sub.zipWithIndex
    } yield ("pq", j, code, c.toSeq)
    (matRows ++ pqRows).toDF("component", "a", "b", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def loadComponentSnapshot(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      labels: Seq[String]): (Map[String, Array[Array[Float]]], PqCodebook) = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("component"), col("a"), col("b"), col("vec"))
      .as[(String, Int, Int, Seq[Float])].collect()
    val mats = labels.map { label =>
      label -> rows.filter(_._1 == label).sortBy(_._2).map(_._4.toArray)
    }.toMap
    val pqRows = rows.filter(_._1 == "pq")
    require(labels.forall(l => mats(l).nonEmpty) && pqRows.nonEmpty,
      s"corrupt index snapshot at $path: missing ${labels.mkString("/")} or 'pq' component rows")
    // WRONG-FAMILY loads must fail fast, not silently drop components: a
    // three-component OPQ-IVF-PQ snapshot read through loadIvfPqIndex
    // would discard the rotation and serve silently-wrong neighbors
    val extra = rows.iterator.map(_._1).toSet -- labels.toSet - "pq"
    require(extra.isEmpty,
      s"index snapshot at $path carries component(s) ${extra.mkString(",")} this loader " +
        s"would ignore — use the loader for its index family (expected: ${labels.mkString("/")}+pq)")
    val m = pqRows.map(_._2).max + 1
    val k = pqRows.map(_._3).max + 1
    val pq = Array.ofDim[Array[Float]](m, k)
    pqRows.foreach { case (_, j, c, v) => pq(j)(c) = v.toArray }
    (mats, PqCodebook(pqRows.head._4.length, pq))
  }

  /** persist a trained-OPQ snapshot (rotation + codebook) — same
    * parquet component layout as the IVF-PQ snapshot: component "rot"
    * (a = row index) or "pq" (a = subvector, b = code). A build job
    * trains once; serving jobs load and rotate-at-ingest. */
  def saveOpq(opq: OpqResult, path: String, spark: org.apache.spark.sql.SparkSession): Unit =
    saveComponentSnapshot(Seq("rot" -> opq.rotation), opq.codebook, path, spark)

  /** load a trained-OPQ snapshot (mseHistory is training-time evidence,
    * not part of the snapshot: loaded results carry it empty) */
  def loadOpq(spark: org.apache.spark.sql.SparkSession, path: String): OpqResult = {
    val (mats, pq) = loadComponentSnapshot(spark, path, Seq("rot"))
    OpqResult(mats("rot"), pq, Seq.empty)
  }

  // ---- OPQ-composed IVF-PQ: the faiss "OPQ,IVF,PQ" index shape -----------------

  /** trained rotation in front of the residual-PQ coarse index: OPQ
    * learns the basis (variance balanced across subvectors), IVF-PQ
    * trains coarse centroids + residual codebooks IN that basis — the
    * standard pretransform composition (faiss index_factory
    * "OPQm,IVFn,PQm"). trainOpq's own flat codebook is training
    * scaffolding only; the served codebooks are the residual ones. */
  final case class OpqIvfPqIndex(rotation: Array[Array[Float]], index: IvfPqIndex)

  def buildOpqIvfPqIndex(
      embeddings: DataFrame,
      nCentroids: Int = 16,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 3,
      dim: Int = 64,
      opqIters: Int = 3,
      trainSample: Long = 200000L): OpqIvfPqIndex = {
    // count + sample ONCE against the raw corpus, and rotate only the
    // bounded sample: rotating the full frame first would re-run the
    // O(n*dim^2) matmul inside buildIvfPqIndex's own count() and
    // hashSample passes for rows that never train anything. nlist
    // auto-sizing still sees the TRUE corpus size, not the sample's.
    val n = embeddings.count()
    val nlist = autoNlist(n, nCentroids)
    val sample = hashSample(embeddings, n, trainSample)
    val opq = trainOpq(sample, m, k, dim, opqIters, iters, trainSample)
    // hashSample(sample) inside the builder is the identity (sample size
    // <= trainSample), so modulus samples never compose
    val idx = buildIvfPqIndex(rotateEmbeddings(sample, opq.rotation),
      nlist, m, k, iters, dim, trainSample)
    OpqIvfPqIndex(opq.rotation, idx)
  }

  /** serve: rotate at ingest (cosine-invariant), then the standard
    * probe-limited residual-PQ ADC + exact rerank */
  def opqIvfPqTopK(
      embeddings: DataFrame,
      idx: OpqIvfPqIndex,
      nQueries: Int = 5,
      k: Int = 10,
      nProbe: Int = 0,
      rerank: Int = 4): DataFrame =
    ivfPqTopK(rotateEmbeddings(embeddings, idx.rotation), idx.index, nQueries, k, nProbe, rerank)

  def saveOpqIvfPqIndex(idx: OpqIvfPqIndex, path: String, spark: org.apache.spark.sql.SparkSession): Unit =
    saveComponentSnapshot(
      Seq("rot" -> idx.rotation, "ivf" -> idx.index.ivf.centroids),
      idx.index.pq, path, spark)

  def loadOpqIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String): OpqIvfPqIndex = {
    val (mats, pq) = loadComponentSnapshot(spark, path, Seq("rot", "ivf"))
    OpqIvfPqIndex(mats("rot"), IvfPqIndex(IvfIndex(mats("ivf")), pq))
  }

  /** encode: assign each vector to its coarse list, PQ-encode its RESIDUAL
    * — one executor-local pass, no shuffle. Output (vec_id, list, codes). */
  def ivfPqEncode(embeddings: DataFrame, index: IvfPqIndex): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val idx = bc.value
        it.map { case (id, emb) =>
          val li = nearestCentroid(emb, idx.ivf.centroids)
          val res = residual(emb, idx.ivf.centroids(li))
          val codes = new Array[Int](idx.pq.m)
          var j = 0
          while (j < idx.pq.m) {
            codes(j) = nearestSub(res, j * idx.pq.subDim, idx.pq.centroids(j)); j += 1
          }
          (id, li, codes.toSeq)
        }
      }
      .toDF("vec_id", "list", "codes")
  }

  /** IVF-PQ ANN (the FAISS-IVFPQ serving shape): probe the `nProbe`
    * nearest coarse lists per query, ADC-score the CODES inside probed
    * lists only (per-(query,list) residual dot tables — the query residual
    * differs per probed centroid), shortlist, exact-rerank. Per-query work
    * is ~nProbe/nlist of a PQ scan, which itself reads ~m bytes/vector:
    * the two compressions multiply, which is how 10^11-vector indexes
    * serve. */
  def ivfPqTopK(
      embeddings: DataFrame,
      index: IvfPqIndex,
      nQueries: Int = 5,
      k: Int = 10,
      nProbe: Int = 0,
      rerank: Int = 4): DataFrame =
    ivfPqTopKFromCodes(ivfPqEncode(embeddings, index), embeddings, index,
      nQueries, k, nProbe, rerank)

  /** serve from a PRE-ENCODED (vec_id, list, codes) frame — encode once
    * per corpus, serve every query batch from the codes table */
  def ivfPqTopKFromCodes(
      codesDf: DataFrame,
      embeddings: DataFrame,
      index: IvfPqIndex,
      nQueries: Int = 5,
      k: Int = 10,
      nProbe: Int = 0,
      rerank: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val qLocal = e.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val cents = index.ivf.centroids
    // FULL-SPACE ADC over the reconstruction x^ = c_li + r^ (subvectors
    // are disjoint, so every term is exactly table-decomposable):
    //   dot(q, x^)  = dot(q, c_li) + sum_j qtab[j][code_j]
    //   |x^|^2      = |c_li|^2 + 2*sum_j cdot[li][j][code_j]
    //                          +   sum_j pqNorm2[j][code_j]
    //   approx_cos  = dot(q, x^) / (|q| * |x^|)
    // A residual-space cosine would rank fine WITHIN one list but is not
    // comparable ACROSS probed lists (measured: recall@10 0.6 vs 0.9+).
    val pqNorm2 = index.pq.centroids.map(_.map(c => c.map(x => x.toDouble * x).sum))
    val centNorm2 = cents.map(c => c.map(x => x.toDouble * x).sum)
    // cdot[li][j][c] = dot(c_li restricted to subvector j, pq centroid c)
    val cdot = Array.tabulate(cents.length, index.pq.m, index.pq.k) { (li, j, c) =>
      val cent = cents(li)
      val sub = index.pq.centroids(j)(c)
      var d = 0.0
      var i = 0
      val off = j * index.pq.subDim
      while (i < sub.length && off + i < cent.length) { d += cent(off + i) * sub(i); i += 1 }
      d
    }
    val probes = qLocal.map { case (qid, qemb) =>
      val lists = nearestCentroids(qemb, cents, autoNProbe(nProbe, cents.length))
      val qtab = Array.tabulate(index.pq.m, index.pq.k) { (j, c) =>
        val sub = index.pq.centroids(j)(c)
        var d = 0.0
        var i = 0
        val off = j * index.pq.subDim
        while (i < sub.length && off + i < qemb.length) { d += qemb(off + i) * sub(i); i += 1 }
        d
      }
      val qDotCent = lists.map { li =>
        val cent = cents(li)
        var d = 0.0
        var i = 0
        while (i < cent.length && i < qemb.length) { d += qemb(i) * cent(i); i += 1 }
        li -> d
      }.toMap
      val qn = math.sqrt(qemb.map(x => x.toDouble * x).sum)
      (qid, lists.toSet, qtab, qDotCent, qn)
    }
    // union of every query's probed lists: vectors outside it (most of
    // the corpus at realistic nlist/nProbe ratios) are skipped before any
    // per-vector work — including the reconstruction-norm loop
    val unionProbed: Set[Int] = probes.iterator.flatMap(_._2).toSet
    val bcProbes = spark.sparkContext.broadcast(probes)
    val bcUnion = spark.sparkContext.broadcast(unionProbed)
    val bcPqNorm2 = spark.sparkContext.broadcast(pqNorm2)
    val bcCentNorm2 = spark.sparkContext.broadcast(centNorm2)
    val bcCdot = spark.sparkContext.broadcast(cdot)
    val scored = codesDf
      .select(col("vec_id").cast("long"), col("list").cast("int"), col("codes"))
      .as[(Long, Int, Seq[Int])]
      .mapPartitions { it =>
        val ps = bcProbes.value
        val union = bcUnion.value
        val n2 = bcPqNorm2.value
        val cn2 = bcCentNorm2.value
        val cd = bcCdot.value
        it.flatMap { case (vid, li, codes) =>
          if (!union.contains(li)) Iterator.empty
          else {
            // |x^|^2 from the list + codes (query-independent)
            var xn2 = cn2(li)
            var j = 0
            while (j < codes.length) {
              xn2 += 2.0 * cd(li)(j)(codes(j)) + n2(j)(codes(j)); j += 1
            }
            val xn = math.max(math.sqrt(math.max(xn2, 0.0)), 1e-12)
            ps.iterator.flatMap { case (qid, probedSet, qtab, qDotCent, qn) =>
              if (qid == vid || !probedSet.contains(li)) None
              else {
                var dot = qDotCent(li)
                var jj = 0
                while (jj < codes.length) { dot += qtab(jj)(codes(jj)); jj += 1 }
                Some((qid, vid, dot / (math.max(qn, 1e-12) * xn)))
              }
            }
          }
        }
      }
      .toDF("query_id", "vec_id", "approx_cos")
    rerankShortlist(scored, e, qLocal, k, rerank)
  }
}
