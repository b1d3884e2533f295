package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) of a string
  * column.
  *
  * Why an expression: canonically-equivalent byte sequences ('é' as U+00E9
  * vs 'e'+U+0301) hash DIFFERENTLY, silently splitting every hash-keyed
  * dedup group, URL-canonical identity, and decontamination gram — so a
  * normalization pass belongs in front of the hash-keyed family for any
  * corpus with mixed producers. Spark has no built-in; a Scala UDF would
  * box every row and break the whole-stage-codegen span. This expression
  * stays inside codegen (delegating to the static helper below) and takes
  * a two-tier FAST PATH — pure-ASCII bytes short-circuit with no decode at
  * all, and already-NFC non-ASCII text returns after one isNormalized
  * scan — so the common row allocates nothing.
  * Matches DuckDB's `nfc_normalize()` (both implement UAX #15).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects a string input, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.GraftColumnBridge

  /** static kernel shared by the interpreted and generated paths: returns
    * the INPUT object untouched when already NFC. Pure-ASCII bytes are NFC
    * by definition — that pre-scan keeps the dominant web-text row truly
    * allocation-free (no UTF8String->String decode); non-ASCII rows pay
    * one decode for the JDK isNormalized check, and only genuinely
    * denormalized text reallocates. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
