package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q126 crossover campaign: exact all-pairs jaccard — plain inverted-index
  * join vs the PPJoin prefix-filtered plan — timed INTERLEAVED (A/B pairs,
  * median of reps) across corpus scale x threshold. Corpus growth
  * replicates the sf corpus with per-copy unique suffixes so gram df
  * grows with corpus size (the production regime) without exploding the
  * near-dup pair count. Results -> BASELINE.md round-5 table. */
object JacCross {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes","4m")
      .config("spark.local.dir","/dev/shm/graft-spark-local")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    def corpus(k: Int) = {
      if (k == 1) base
      else base.crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("doc_id") * k + col("rep")).as("doc_id"),
          concat(col("text"), lit(" copytag"), col("rep")).as("text"))
    }
    def once(f: => Long): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    for ((k, t) <- Seq((1, 0.5), (1, 0.8), (4, 0.5), (4, 0.8), (8, 0.8))) {
      val c = c0(corpus(k))
      // warmup both once, then interleaved reps
      graft.ops.Dedup.ngramJaccardAllPairs(c, t, 100).count()
      graft.ops.Dedup.ngramJaccardPrefix(c, t, 100).count()
      val (as, ps) = (collection.mutable.ArrayBuffer[Double](), collection.mutable.ArrayBuffer[Double]())
      (1 to reps).foreach { _ =>
        as += once(graft.ops.Dedup.ngramJaccardAllPairs(c, t, 100).count())
        ps += once(graft.ops.Dedup.ngramJaccardPrefix(c, t, 100).count())
      }
      val (am, pm) = (as.sorted.apply(reps/2), ps.sorted.apply(reps/2))
      val n = c.count()
      println(f"CROSS k=$k docs=$n t=$t allpairs=$am%.2f prefix=$pm%.2f ratio=${pm/am}%.2f " +
        s"allreps=${as.map(x=>f"$x%.2f").mkString(",")} prefreps=${ps.map(x=>f"$x%.2f").mkString(",")}")
      c.unpersist()
    }
    spark.stop()
  }
  private def c0(df: org.apache.spark.sql.DataFrame) =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
}
