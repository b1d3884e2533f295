package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.sum

/** Moderate-scale stress drive of the FULL bucketed `ExtractJob.run`
  * pipeline (staging, grouped bucket jobs, observe-based lineage, resume)
  * — the PipelineSpec covers semantics on tiny inputs; this exercises the
  * same path at 100k docs where the 64-bucket grouping, dynamic partition
  * overwrite and staging reuse actually do work.
  *
  * `runMain graft.tools.StressRun [nDocs] [outDir]` — prints throughput,
  * lineage totals, and verifies the second run is a staging-reusing no-op.
  */
object StressRun {

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val dir = args.drop(1).headOption.getOrElse("/tmp/graft-stress")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    deleteRec(new java.io.File(dir))
    val pages = spark.range(nDocs).as[Long].map(graft.pipeline.Corpus.row(42L)).toDF()
    val t0 = System.nanoTime()
    val (r, l) = graft.pipeline.ExtractJob.run(spark, pages, dir, nBuckets = 64, partitions = 64)
    val dt = (System.nanoTime() - t0) / 1e9
    val n = spark.read.parquet(r).count()
    val lin = spark.read.parquet(l)
    val okSum = lin.agg(sum("n_ok")).head.getLong(0)
    val linRows1 = lin.count() // buckets PRESENT in the data (<= 64 for small runs)
    require(n == nDocs, s"results $n != $nDocs")
    require(okSum == nDocs, s"lineage ok=$okSum != $nDocs")
    println(f"STRESS done: $n rows in $dt%.1f s (${nDocs / dt}%.0f docs/s incl. staging+lineage)")
    val t1 = System.nanoTime()
    graft.pipeline.ExtractJob.run(spark, pages, dir, nBuckets = 64, partitions = 64)
    val linRows = spark.read.parquet(l).count()
    require(linRows == linRows1, s"resume appended lineage: $linRows vs $linRows1 rows")
    println(f"STRESS resume no-op in ${(System.nanoTime() - t1) / 1e9}%.1f s, lineage rows=$linRows")
    spark.stop()
  }
}
