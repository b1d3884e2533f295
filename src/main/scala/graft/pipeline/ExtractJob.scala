package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, SaveMode}
import org.apache.spark.sql.functions._

/** The scale pipeline (SURVEY.md §3.4, north_rule):
  *
  *   pages table -> [resume filter] -> salted repartition (size-banded) ->
  *   mapPartitions(ExtractKernel) -> results sink (partitioned by
  *   warc_bucket) + per-bucket lineage/metrics sink.
  *
  * Scale design notes (10^12 rows, 1000 executors):
  *  - the ONLY wide operations are the explicit repartition (unavoidable: it
  *    IS the skew mitigation) and the tiny lineage rollup (bucket-count
  *    sized, broadcast-joinable);
  *  - column pruning: the kernel needs url/warc_ts/html only; `prepare`
  *    selects exactly those so parquet scans never read `text`/`lang`;
  *  - skew: payloads > SKEW_THRESHOLD bytes are split off and spread
  *    round-robin so no task owns two whales (north_rule "salted
  *    repartitioning for skewed large-PDF partitions");
  *  - resume: lineage rows are committed per warc_bucket after results are
  *    durable; a restart anti-joins finished buckets and reprocesses only
  *    the remainder (idempotent: results are overwritten per bucket
  *    partition directory, not appended).
  */
object ExtractJob {

  final val N_BUCKETS_DEFAULT = 64
  final val SKEW_THRESHOLD_BYTES = 1 << 20 // 1 MiB: "large-PDF" band

  /** bucket(warc_ts) partition transform (Iceberg-style; Parquet stand-in) */
  def withBucket(pages: DataFrame, nBuckets: Int): DataFrame =
    pages.withColumn("warc_bucket", pmod(xxhash64(col("warc_ts")), lit(nBuckets)))

  /** salted, size-banded repartition; input must have url/warc_ts/html.
    * `text`/`lang` are NOT read from the source — the kernel never uses
    * them, and at corpus scale `text` is a full duplicate of the payload,
    * so column pruning here halves scan bytes (verified by PlanSpec). */
  def saltedRepartition(spark: SparkSession, pages: DataFrame, partitions: Int): Dataset[PageRow] = {
    import spark.implicits._
    val typed = pages.select(col("url"), col("warc_ts"), col("html"),
      lit("").as("text"), lit("").as("lang"))
    val small = typed.filter(length(col("html")) <= SKEW_THRESHOLD_BYTES)
      .repartition(partitions, col("url")) // uniform hash spread
    val big = typed.filter(length(col("html")) > SKEW_THRESHOLD_BYTES)
      .repartition(partitions) // round-robin: each whale lands alone-ish
    small.union(big).as[PageRow]
  }

  /** run extraction over a prepared Dataset (no IO) */
  def extract(pages: Dataset[PageRow]): Dataset[ExtractedRow] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions(ExtractKernel.runPartition _)
  }

  /** full job with sinks + resume. Returns (resultsPath, lineagePath). */
  def run(
      spark: SparkSession,
      pages: DataFrame,
      outDir: String,
      nBuckets: Int = N_BUCKETS_DEFAULT,
      partitions: Int = 0): (String, String) = {
    import spark.implicits._
    val resultsPath = s"$outDir/extracted"
    val lineagePath = s"$outDir/lineage"
    val nPart = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism * 2

    val bucketed = withBucket(pages, nBuckets).cache()
    // resume: anti-join against committed lineage buckets (north_rule)
    val doneBuckets: Set[Long] =
      try spark.read.parquet(lineagePath).select("warc_bucket").as[Long].collect().toSet
      catch { case _: Exception => Set.empty }
    val todo = bucketed.filter(!col("warc_bucket").isin(doneBuckets.toSeq: _*))

    val buckets = todo.select("warc_bucket").distinct().as[Long].collect().sorted
    buckets.foreach { bucket =>
      val slice = todo.filter(col("warc_bucket") === bucket)
      val extracted = extract(saltedRepartition(spark, slice, nPart))
      val t0 = System.currentTimeMillis()
      extracted.withColumn("warc_bucket", lit(bucket))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$resultsPath/warc_bucket=$bucket")
      // lineage commit AFTER results are durable => idempotent resume
      val m = spark.read.parquet(s"$resultsPath/warc_bucket=$bucket")
        .agg(
          sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("status") =!= "ok", 1L).otherwise(0L)).as("n_err"),
          sum("bytes_in").as("bytes_in"),
          sum("chars_out").as("chars_out"))
        .withColumn("warc_bucket", lit(bucket))
        .withColumn("wall_ms", lit(System.currentTimeMillis() - t0))
      m.write.mode(SaveMode.Append).parquet(lineagePath)
    }
    bucketed.unpersist()
    (resultsPath, lineagePath)
  }

  /** golden full-outer diff on url (SURVEY.md §2E): byte-equality of
    * extracted_text vs expected. Returns per-url match rows. */
  def goldenDiff(extracted: DataFrame, golden: DataFrame): DataFrame = {
    val e = extracted.select(col("url"), col("extracted_text"))
    val g = golden.select(col("url"), col("expected_text"))
    e.join(g, Seq("url"), "full_outer")
      .withColumn("matches",
        col("extracted_text").isNotNull && col("expected_text").isNotNull &&
          col("extracted_text") === col("expected_text"))
  }
}
