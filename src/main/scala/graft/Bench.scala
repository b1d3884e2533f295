package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round -> BENCH_r{N}.json).
  *
  * Headline: extraction throughput (docs/sec) over the deterministic
  * synthesized corpus — the engine's actual workload — plus wall times for
  * every `SparkEntry.queries` entry on `SPARK_GRAFT_SF_DIR`.
  *
  * Scaling evidence (BASELINE.md protocol) is produced by `graft.Scaling`,
  * which runs the same extraction job at local[8] and local[32].
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 100k default (round 5): at 20k docs the extraction job is ~50ms of
    // compute inside ~0.5s of per-job fixed cost, so the docs/sec
    // headline measured scheduler constants, not the engine (isolated
    // fresh-JVM 20k runs: 24-35k docs/s; the SAME jar at 2.4M docs:
    // 449k docs/s at local[32] — BASELINE.md round 5). 100k keeps the
    // bench fast while the measurement is mostly engine.
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      // the extraction small band is NARROW (no shuffle), so its
      // parallelism is the scan partitioning: size scan tasks to the tiny
      // bench corpus (the "fit maxPartitionBytes to the fleet" knob; at
      // production scale the defaults are correct and this is a no-op)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // headline: extraction docs/sec, same protocol as graft.Scaling —
    // corpus materialized to parquet once (generator excluded; the job
    // shape is read-table -> salt -> extract), full-load warmup, median of
    // 3 reps (host shows heavy CPU-steal variance; see BASELINE.md).
    val corpusDir = s"${sys.env.getOrElse("SPARK_GRAFT_CORPUS_DIR", "/dev/shm/graft-bench-corpus")}-$benchDocs"
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      spark.range(benchDocs).repartition(32).as[Long]
        .map(graft.pipeline.Corpus.row(42L)).toDF()
        .write.mode("overwrite").parquet(corpusDir)
    }
    def extractRun(): Double = {
      // the headline number must measure the ENGINE, not the 160-query
      // suite's accumulated GC debt: round-4's driver record slid 21%
      // while the same jar's isolated runs held (BASELINE.md round 5) —
      // collect the suite's garbage before timing the headline
      System.gc()
      val t0 = System.nanoTime()
      graft.pipeline.ExtractJob.extract(
        graft.pipeline.ExtractJob.saltedRepartition(spark, spark.read.parquet(corpusDir), cpus.toInt * 2))
        .filter(_.status == "ok").count()
      (System.nanoTime() - t0) / 1e9
    }

    // Steal-robust protocol (round-3): this host shows multi-minute
    // CPU-steal epochs, so per-query back-to-back reps put all 3 samples of
    // a query inside one epoch (round-2's official record showed 8-10s for
    // queries that steady-state at <2s). Instead: one warmup PASS over
    // every query (JIT/codegen compile — a one-off JVM cost), then 3 full
    // INTERLEAVED passes — an epoch inflates one pass, and the per-query
    // median across passes survives it. Per-rep times are emitted in the
    // JSON so the record self-documents its noise.
    // a failing query must FAIL the bench run, not contribute a plausible-
    // looking elapsed time to the official record: failures are recorded
    // per query, surfaced in the JSON, and flip the exit code (the elapsed
    // sample of a throwing rep measures time-to-throw, not the query)
    val failedQueries = scala.collection.mutable.LinkedHashSet[String]()
    // x00 runs FIRST in every pass: the headline extraction measurement
    // lands on the least-heated JVM state each pass instead of after 160
    // query plans (order + the pre-measure GC are the round-5 harness
    // fixes for the suite-size drift of the number of record)
    val tasks: Seq[(String, () => Double)] =
      ("x00_extract_bench" -> (() => extractRun())) +:
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> (() => time {
          try { fn(spark, sfDir).count(); () }
          catch {
            case t: Throwable =>
              failedQueries += name
              System.err.println(
                s"[graft.Bench] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
          }
        }._2)
      }
    tasks.foreach { case (_, run) => run() } // warmup pass
    val nReps = 3
    val reps: Map[String, Seq[Double]] = {
      val acc = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
      (1 to nReps).foreach { _ =>
        tasks.foreach { case (name, run) => acc(name) = acc(name) :+ run() }
      }
      acc.toMap
    }
    val medians = tasks.map { case (name, _) =>
      val s = reps(name).sorted
      name -> s(s.size / 2)
    }
    val extractSec = medians.find(_._1 == "x00_extract_bench").get._2
    val docsPerSec = benchDocs / extractSec
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val repsJson = tasks.map { case (name, _) =>
      "\"" + name + "\":[" + reps(name).map(v => f"$v%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val failuresJson = failedQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    // one shared record builder so the two emitted forms cannot drift
    def record(withReps: Boolean): String =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        (if (withReps) s""""reps":$repsJson,""" else "") +
        s""""protocol":"warmup-pass+interleaved-median$nReps",""" +
        s""""docs_per_sec":${docsPerSec.round},"failures":$failuresJson,""" +
        s""""bench_docs":$benchDocs,"sf":"$sfDir"}"""
    // the full record (with per-rep samples) also lands in a file: output
    // tails that truncate long stdout lines keep a durable copy, and the
    // FINAL stdout line is the compact record (no reps) so a tail capture
    // of the last few KB always contains one complete JSON object
    println(record(withReps = true))
    try {
      val w = new java.io.PrintWriter("BENCH_LOCAL.json")
      try w.println(record(withReps = true)) finally w.close()
    } catch { case _: Throwable => () }
    println(record(withReps = false))
    spark.stop()
    if (failedQueries.nonEmpty) sys.exit(1)
  }
}

/** Two-parallelism scaling evidence (BASELINE.md): same seeded corpus at
  * local[8] and local[32]; reports docs/sec at both + efficiency
  * = (docs/s @32) / (4 x docs/s @8).
  *
  * `runMain graft.Scaling 8` / `... 32` measures ONE level per JVM (honest:
  * no JIT warmth leaking between levels); with no args both levels run in
  * one JVM (quick look, efficiency inflated by shared warmup). */
object Scaling {
  def main(args: Array[String]): Unit = {
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "150000").toLong
    val corpusDir = sys.env.getOrElse("SPARK_GRAFT_CORPUS_DIR", "/dev/shm/graft-bench-corpus")
    def runAt(cores: Int): Double = {
      val spark = ScalingHarness.session(cores)
      import spark.implicits._
      // materialize the corpus ONCE (generator cost excluded from the
      // measurement; the engine's job shape is read-table -> extract)
      val dir = s"$corpusDir-$benchDocs-f128"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        spark.range(benchDocs).repartition(128).as[Long]
          .map(graft.pipeline.Corpus.row(42L)).toDF()
          .write.mode("overwrite").parquet(dir) // fixed file layout across levels
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        val pages = spark.read.parquet(dir)
        graft.pipeline.ExtractJob.extract(
          graft.pipeline.ExtractJob.saltedRepartition(spark, pages, cores * 2,
            shuffleSmall = sys.env.get("SPARK_GRAFT_SHUFFLE_SMALL").contains("true")))
          .filter(_.status == "ok").count()
        benchDocs / ((System.nanoTime() - t0) / 1e9)
      }
      once() // warmup at full load (JIT + codegen settle)
      // median of N: this sandbox VM shows multi-x CPU-steal variance
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPS", "3").toInt
      val rates = (1 to reps).map(_ => once()).sorted
      val rate = rates(rates.size / 2)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      rate
    }
    args.headOption match {
      case Some(cores) =>
        val r = runAt(cores.toInt)
        println(f"""{"cores":$cores,"docs_per_sec":${r}%.1f,"bench_docs":$benchDocs}""")
      case None =>
        val r8 = runAt(8)
        val r32 = runAt(32)
        val eff = r32 / (4.0 * r8)
        println(f"""{"docs_per_sec_local8":${r8}%.1f,"docs_per_sec_local32":${r32}%.1f,"scaling_efficiency":$eff%.3f,"bench_docs":$benchDocs}""")
    }
  }
}

/** ONE SparkSession recipe for every two-parallelism scaling measurement
  * (extraction in `Scaling`, dedup in `graft.tools.DedupScaling`): the
  * comparative claims between job shapes are only valid if the harness
  * config is provably identical, so it lives here once.
  *
  *  - AQE advisory 4MB: the default 64MB would coalesce a bench-scale
  *    corpus into a few post-shuffle partitions and serialize the stage
  *    (a no-op at real scale where partitions >> advisory);
  *  - maxPartitionBytes 8MB / openCost 1MB: sizes scan tasks to a
  *    ~600MB multi-file corpus (the default 128MB bin-packing folds it
  *    into ~6 scan tasks) — the "size maxPartitionBytes to the fleet"
  *    knob, not a semantics change;
  *  - /dev/shm local dir: the VM's disk latency is noisy. */
private[graft] object ScalingHarness {
  def session(cores: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cores.toString).toInt)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
