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
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"unexpected extra shuffles ($exchanges):\n$plan")
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

  test("q01 aggregation is partial (map-side combine before shuffle)") {
    assume(haveTestdata)
    val plan = physicalPlan(graft.SparkEntry.queries("q01_lineitem_agg")(spark, sfDir))
    // partial_sum / partial HashAggregate before the exchange
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"no partial aggregation:\n$plan")
  }
}
