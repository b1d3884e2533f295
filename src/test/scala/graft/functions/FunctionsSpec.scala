package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkFixture

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (2L, Seq(0f, 0f, 0f), Seq(1f, 1f, 1f))).toDF("id", "a", "b")

  test("DotProduct column API: exact double sums in index order") {
    val out = df.select(col("id"), DotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
    assert(out(2L) == 0.0)
  }

  test("DotProduct matches the higher-order-function formulation bit-exactly") {
    val hof = aggregate(zip_with(col("a"), col("b"),
      (p, q) => p.cast("double") * q.cast("double")), lit(0.0), (acc, v) => acc + v)
    val rows = df.select(DotProduct(col("a"), col("b")).as("fast"), hof.as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_dot registered as SQL function") {
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("vectors")
    val out = spark.sql("SELECT id, graft_dot(a, b) AS d FROM vectors ORDER BY id").collect()
    assert(out(0).getDouble(1) == 32.0)
  }

  test("text-kernel UDFs registered as SQL functions, parity with the Scala API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "the quick brown fox is that with for"), (2L, "buy now buy now buy now"))
      .toDF("doc_id", "text").createOrReplaceTempView("graft_docs")
    val out = spark.sql(
      """SELECT doc_id, graft_langid(text) AS lang, graft_fingerprint(text) AS fp,
        |  graft_simhash(text) AS sh, graft_top2gram_frac(text) AS frac
        |FROM graft_docs ORDER BY doc_id""".stripMargin).collect()
    assert(out(0).getAs[String]("lang") == "en")
    assert(out(0).getAs[Long]("fp") ==
      graft.ops.TextOps.fingerprint("the quick brown fox is that with for"))
    assert(out(0).getAs[Long]("sh") ==
      graft.ops.Dedup.simhash("the quick brown fox is that with for"))
    assert(out(1).getAs[Double]("frac") == 0.6) // "buy now" 3x of 5 bigrams
  }

  test("type mismatch rejected at analysis") {
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("id", "a")
    intercept[Exception] {
      bad.select(DotProduct(col("a"), col("a"))).collect()
    }
  }

  test("NfcNormalize: composes decomposed accents, fast-path identity, NULL, SQL registration") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, "café plus é twice"), // decomposed -> composed
      (2L, "plain ascii already nfc"),
      (3L, "café already composed"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df.select(col("id"), NfcNormalize(col("t")).as("n")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("café plus é twice"),
      s"decomposed must compose: ${out(1L)}")
    assert(out(2L).contains("plain ascii already nfc"))
    assert(out(3L).contains("café already composed"))
    assert(out(4L).isEmpty, "NULL propagates")
    // parity with the JDK normalizer on every row (interpreted reference)
    df.filter(col("t").isNotNull).collect().foreach { r =>
      val s = r.getString(1)
      assert(out(r.getLong(0)).contains(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)))
    }
    // SQL registration
    df.createOrReplaceTempView("nfc_docs")
    val viaSql = spark.sql("SELECT graft_nfc(t) AS n FROM nfc_docs WHERE id = 1").collect()
    assert(viaSql(0).getString(0) == "café plus é twice")
    // codegen span survives — with fallback DISABLED, a broken generated
    // call target (e.g. the static forwarder disappearing) THROWS instead
    // of silently degrading to interpreted eval
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = spark.range(50).select(concat(lit("x"), col("id").cast("string")).as("t"))
      assert(n.filter(NfcNormalize(col("t")) === col("t")).count() == 50)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("codegen path produces working generated code (no fallback errors)") {
    // force a wide plan through codegen with the expression in a filter
    val n = spark.range(100).select(col("id"),
      org.apache.spark.sql.functions.array((0 until 8).map(i => (col("id") + i).cast("float")): _*).as("v"))
    val out = n.select(DotProduct(col("v"), col("v")).as("d")).filter(col("d") > 0).count()
    assert(out == 100)
  }
}
