package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch: piecewise timing of the ngramJaccardPrefix (PPJoin) internals at
// sf0.1 under the Bench session config — which stage owns the 40s of CPU?
object PrefixProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threshold = 0.8
    val maxDf = 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prefixprof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"=== pass $rep ===")
      val documents = spark.read.parquet(s"$sfDir/documents.parquet")
      val postings0 = graft.ops.Dedup.gramPostingsForProf(documents)
      t("postings build+count")(postings0.count())
      val sizes = postings0.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val postings = postings0.join(
          postings0.groupBy(col("g")).agg(count(lit(1)).as("df"))
            .filter(col("df") > maxDf).select(col("g")),
          Seq("g"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("capped postings count")(postings.count())
      val dfCounts = postings.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val byRarity = Window.partitionBy(col("doc_id"))
        .orderBy(col("df").asc, col("g").asc)
      val perDoc = Window.partitionBy(col("doc_id"))
      val prefix = postings.join(dfCounts, Seq("g"))
        .withColumn("rk", row_number().over(byRarity))
        .withColumn("szc", count(lit(1)).over(perDoc))
        .filter(col("rk") <=
          col("szc") - ceil(col("szc") * lit(threshold)) + lit(1L))
        .select(col("doc_id"), col("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val np = t("prefix windows count")(prefix.count())
      println(s"[prefixprof] prefix rows: $np")
      val cand = prefix.select(col("doc_id").as("doc_a"), col("g"))
        .join(prefix.select(col("doc_id").as("doc_b"), col("g")), Seq("g"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nc = t("candidate join count")(cand.count())
      println(s"[prefixprof] candidates: $nc")
      val common = cand
        .join(postings.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
        .join(postings.select(col("doc_id").as("doc_b"), col("g")),
          Seq("doc_b", "g"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
      val out = common
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard_raw",
          col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
        .filter(col("jaccard_raw") >= threshold)
      t("verify join count")(out.count())
      Seq(postings0, postings, prefix, cand).foreach(_.unpersist())
    }
    spark.stop()
  }
}
