package graft.tools

import org.apache.spark.sql.SparkSession

// scratch: dump physical plans for shuffle-reuse inspection (not shipped)
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q06_minhash_lsh", "q08_ngram_jaccard", "q09_embedding_neardups")) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      println(s"==== $q ====")
      df.count() // let AQE finalize
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Reused") || l.contains("Scan") ||
          l.contains("SerializeFromObject") || l.contains("MapElements") || l.contains("Join") || l.contains("Window"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
