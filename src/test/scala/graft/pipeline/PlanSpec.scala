package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates (the 100 TB criteria): column pruning reaches
  * the scan, dimension joins broadcast, filters push down, the extraction
  * pipeline has no accidental extra shuffles. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"
  private def haveTestdata = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("extraction scan prunes to url/warc_ts/html (never reads text/lang)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan-pages").toString
    spark.range(50).as[Long].map(Corpus.row(42L)).toDF()
      .write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir)
    val plan = physicalPlan(
      ExtractJob.extract(ExtractJob.saltedRepartition(spark, pages, 4)).toDF())
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("url") && readSchema.contains("html"))
    assert(!readSchema.contains("lang"), s"lang not pruned: $readSchema")
    // 'text' must not appear in the parquet ReadSchema
    assert(!readSchema.replace("extracted_text", "").contains("text:"),
      s"text not pruned: $readSchema")
  }

  test("extraction pipeline has exactly the two explicit exchanges (salt split)") {
    import spark.implicits._
    val pages = spark.range(50).as[Long].map(Corpus.row(42L)).toDF()
    val plan = physicalPlan(
      ExtractJob.extract(ExtractJob.saltedRepartition(spark, pages, 4)).toDF())
    // ONE intentional exchange: the round-robin spread of the whale band.
    // The small band stays in its scan partitions (shuffling it would move
    // ~100% of corpus bytes for no balance benefit — maxPartitionBytes is
    // the granularity knob there).
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"unexpected extra shuffles ($exchanges):\n$plan")
  }

  test("dimension joins broadcast in q02") {
    assume(haveTestdata)
    val plan = physicalPlan(graft.SparkEntry.queries("q02_revenue_by_nation")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("filters push to the parquet scan") {
    assume(haveTestdata)
    val df = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("n_chars") > 100)
    val plan = physicalPlan(df)
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]")
      || plan.contains("GreaterThan(n_chars,100)"), s"filter not pushed:\n$plan")
  }

  test("bucketed tables co-locate the join: no Exchange in a bucket-bucket join") {
    import spark.implicits._
    // the 100 TB pattern for repeated fact-fact joins: pre-bucket both sides
    // on the join key so the shuffle happens once at write time, never per
    // query. With matching bucket counts the join plan must be exchange-free.
    val a = (0L until 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (0L until 1000L).map(i => (i % 500, s"b$i")).toDF("k", "vb")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    // the catalog is fresh per JVM but the warehouse dir persists: clear it
    Seq("graft_bkt_a", "graft_bkt_b").foreach { t =>
      val d = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = physicalPlan(j)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(j.count() == 1000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q01 aggregation is partial (map-side combine before shuffle)") {
    assume(haveTestdata)
    val plan = physicalPlan(graft.SparkEntry.queries("q01_lineitem_agg")(spark, sfDir))
    // partial_sum / partial HashAggregate before the exchange
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"no partial aggregation:\n$plan")
  }
}
