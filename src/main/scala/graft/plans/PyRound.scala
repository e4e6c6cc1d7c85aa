package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Python-semantics decimal rounding of a double: round-half-even on
  * the EXACT binary value (python's round / correctly-rounded dtoa).
  * Spark's `round`/`bround` go through the double's shortest decimal
  * string first, which can differ at the last digit (e.g. the double
  * nearest 1415.195 is …94999…, so python gives 1415.19 while
  * string-based HALF_UP gives 1415.2). Needed wherever outputs must
  * replay a python reference bit-for-bit. */
case class PyRound(child: Expression, scale: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // Analysis-time rejection of non-double children: a SQL DECIMAL
  // literal otherwise reaches nullSafeEval's Double cast and throws a
  // ClassCastException at runtime (callers must CAST(… AS DOUBLE)).
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pyround"

  protected override def nullSafeEval(input: Any): Any =
    PyRound.round(input.asInstanceOf[Double], scale)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PyRound.round($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): PyRound =
    copy(child = newChild)
}

object PyRound {
  /** Static entry point referenced by generated code. */
  def round(x: Double, scale: Int): Double = {
    if (x.isNaN || x.isInfinite) x
    else new java.math.BigDecimal(x) // binary-exact value
      .setScale(scale, java.math.RoundingMode.HALF_EVEN)
      .doubleValue()
  }
}
