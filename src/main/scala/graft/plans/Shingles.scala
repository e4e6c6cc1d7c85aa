package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of lowercased text as a native
  * expression: one fused per-row loop (tokenize → sliding join →
  * first-occurrence dedup) emitted into whole-stage codegen.
  *
  * Replaces the `transform(sequence(...), i => concat_ws(...))` +
  * `array_distinct` formulation: higher-order-function lambdas are
  * interpreted per ELEMENT (and excluded from codegen subexpression
  * elimination), which measured 3.2 s of d03's 5.5 s at sf0.1 just to
  * materialize 260k shingles. Bit-identical output: tokenization
  * mirrors Spark's `split(trim(lower(text)), "\s+")` exactly
  * (UTF8String lower/trim, Pattern.split with limit -1), and
  * LinkedHashSet preserves array_distinct's first-occurrence order.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  protected override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Shingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Spaces = java.util.regex.Pattern.compile("\\s+")

  /** Static entry point referenced by generated code. Tokenization is
    * exactly Spark's `split(trim(lower(text)), "\s+")`: the Lower
    * expression's UTF8_BINARY path with ICU case mappings
    * (spark.sql.icu.caseMappings.enabled defaults to true in Spark 4 —
    * full context-sensitive lowercasing; UTF8String.toLowerCase or
    * execBinary would do simple per-codepoint mapping and diverge on
    * e.g. Greek final sigma), space-only trim, Pattern.split keeping
    * trailing empties (limit -1). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val lowered =
      org.apache.spark.sql.catalyst.util.CollationSupport.Lower.execBinaryICU(text)
    val toks = Spaces.split(lowered.trim.toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }
}
