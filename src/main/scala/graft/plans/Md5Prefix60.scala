package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The top 60 bits of md5(text) as a long — numerically identical to
  * `conv(substring(md5(text), 1, 15), 16, 10)` (15 hex chars = the
  * first 7.5 digest bytes, big-endian) but computed straight from the
  * digest bytes: no 32-char hex string materialization and no base-16
  * string parse per row. This is the portable hash base of the
  * MinHash signatures and the d04b SimHash votes (DuckDB replays the
  * same value via its own hex path).
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5prefix60"

  protected override def nullSafeEval(input: Any): Any =
    Md5Prefix60.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  /** Static entry point referenced by generated code. */
  def compute(text: UTF8String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(text.getBytes)
    // first 7 bytes (56 bits) then the high nibble of byte 7 → 60 bits
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}
