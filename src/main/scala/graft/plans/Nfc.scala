package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — Spark has no
  * built-in normalizer, and the t06 cleaning pass needs one that stays
  * inside whole-stage codegen (a UDF would box every row and break the
  * codegen span the rest of the cleaning pipeline runs in).
  *
  * Canonical composition is Unicode-stability-guaranteed (no new
  * compositions are ever added), so `java.text.Normalizer` (JDK) and
  * utf8proc (the DuckDB oracle's `nfc_normalize`) produce identical
  * output for any input both understand — the oracle parity this
  * expression is tested under.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation for
  * already-NFC text (the overwhelming majority of a real corpus), so
  * the common case costs one scan and returns the input buffer
  * untouched.
  */
case class Nfc(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  protected override def nullSafeEval(input: Any): Any =
    Nfc.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Nfc.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Nfc =
    copy(child = newChild)
}

object Nfc {
  /** Static entry point referenced by generated code. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
