package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom Catalyst expressions as SQL
  * functions. Use with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`, or call
  * `GraftExtensions.register(spark)` on an existing session.
  *
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(GraftExtensions.dotFunction)
    extensions.injectFunction(GraftExtensions.nfcFunction)
  }
}

object GraftExtensions {
  private[functions] val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(children(0), children(1))
    })

  private[functions] val nfcFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_nfc takes exactly 1 argument")
      NfcNormalize(children(0))
    })

  /** register on a live session (tests, notebooks) */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs(0)), "built-in")
    registerUdfs(spark)
  }

  /** SQL-facing registrations of the pure text-analysis kernels, so the
    * whole training-data toolkit is usable from spark.sql(...). These are
    * Scala UDFs (per-row, no codegen) — the Column-API variants in
    * graft.ops stay the hot path; the SQL names exist for ad-hoc/BI use:
    *
    *   SELECT graft_langid(text), graft_simhash(text) FROM docs
    */
  def registerUdfs(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("graft_langid", (t: String) => graft.ops.TextOps.detectLang(t))
    spark.udf.register("graft_fingerprint", (t: String) => graft.ops.TextOps.fingerprint(t))
    spark.udf.register("graft_simhash", (t: String) => graft.ops.Dedup.simhash(t))
    spark.udf.register("graft_top2gram_frac", (t: String) => graft.ops.TextOps.top2GramFrac(t))
  }
}
