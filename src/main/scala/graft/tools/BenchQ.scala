package graft.tools

import org.apache.spark.sql.SparkSession

// scratch: run one SparkEntry query repeatedly to separate JIT/steal from plan cost
object BenchQ {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sf).count()
      println(f"$q rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$n")
    }
    spark.stop()
  }
}
