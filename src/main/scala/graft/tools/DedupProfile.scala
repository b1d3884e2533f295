package graft.tools

/** Per-STAGE attribution for the minhashLsh scaling deficit (round-3
  * measured 0.74 ratio-of-medians at 2->8 cores vs extraction's 0.86;
  * VERDICT asked which stage loses it). Mirrors Dedup.minhashLsh's
  * internals exactly (same constants, same plan shapes) but materializes
  * after each stage so the wall clock splits into:
  *
  *   S1 sigs    — shingle + 64 minhashes, typed map, persist + count
  *                (map-only: should scale like extraction)
  *   S2 pairs   — band keys, bucket groupByKey + bounded pairing,
  *                candidate-dedup groupBy (ALL the shuffles)
  *   S3 verify  — pairs join sigs twice + signature agreement
  *                (small-side joins against the persisted sigs)
  *
  * Protocol identical to DedupScaling: deterministic /dev/shm corpus,
  * ONE JVM per parallelism level (`runMain graft.tools.DedupProfile
  * <cores>`), full warmup pass, median of 3, one JSON line. Stage times
  * are additive-ish but each stage is timed after its own action, so
  * S2 excludes the persisted S1 work it reads.
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DEDUP_DOCS", "150000").toLong
    val corpusDir = s"/dev/shm/graft-dedup-corpus-$nDocs-f128"
    val spark = graft.ScalingHarness.session(cores)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      spark.range(nDocs).repartition(128).as[Long]
        .map(i => (i, DedupScaling.docText(i)))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(corpusDir)
    }
    val (as, bs) = Dedup.hashParams(42L)

    def once(): (Double, Double, Double) = {
      val docs = spark.read.parquet(corpusDir)
      // --- S1: signatures (mirrors Dedup.scala minhashLsh sigs) ---
      var t0 = System.nanoTime()
      val sigs = docs.select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) => (id, Dedup.minhashSignature(text, as, bs)) }
        .toDF("doc_id", "sig")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sigs.count()
      val s1 = (System.nanoTime() - t0) / 1e9
      // --- S2: band keys + bucket pairing + candidate dedup ---
      t0 = System.nanoTime()
      // the ONE production band-hash (Dedup.bandKey): an inline copy here
      // would profile a different bucketing than production if the hash
      // ever changed
      val banded = sigs.as[(Long, Array[Long])]
        .flatMap { case (id, sig) =>
          (0 until Dedup.N_BANDS).iterator.map(b => (Dedup.bandKey(sig, b), id))
        }
      val pairs = banded.groupByKey(_._1)
        .flatMapGroups { (_, it) =>
          val buf = new scala.collection.mutable.ArrayBuffer[Long]()
          var over = false
          while (it.hasNext) {
            val r = it.next()
            if (!over) {
              buf += r._2
              if (buf.length > Dedup.MAX_BUCKET_SIZE_DEFAULT) { over = true; buf.clear() }
            }
          }
          if (over) Iterator.empty
          else {
            val arr = buf.sorted.toArray
            (0 until arr.length).iterator.flatMap { i =>
              (i + 1 until arr.length).iterator.map(j => (arr(i), arr(j)))
            }
          }
        }
        .toDF("doc_a", "doc_b")
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("_n")).drop("_n")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairs.count()
      val s2 = (System.nanoTime() - t0) / 1e9
      // --- S3: signature-verify join (candidate-pruned, as the operator) ---
      t0 = System.nanoTime()
      val candIds = pairs
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val candSigs = sigs.join(candIds, Seq("doc_id"), "left_semi")
      pairs
        .join(candSigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(candSigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .withColumn("est_jaccard", expr(
          s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), m -> m)) / ${Dedup.N_HASHES}.0D"))
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
        .count()
      val s3 = (System.nanoTime() - t0) / 1e9
      pairs.unpersist()
      sigs.unpersist()
      (s1, s2, s3)
    }

    once() // warmup
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPS", "3").toInt
    val all = (1 to reps).map(_ => once())
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    val (m1, m2, m3) = (med(all.map(_._1)), med(all.map(_._2)), med(all.map(_._3)))
    println(f"""{"job":"minhash_lsh_stages","cores":$cores,"n_docs":$nDocs,""" +
      f""""sigs_sec":$m1%.2f,"pairs_sec":$m2%.2f,"verify_sec":$m3%.2f,""" +
      f""""reps":${all.map { case (a, b, c) => f"[$a%.2f,$b%.2f,$c%.2f]" }.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
