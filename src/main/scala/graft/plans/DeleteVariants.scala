package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The ≤ maxEdits deletion neighborhood of a string as a native
  * expression: one fused per-row loop emitted into whole-stage
  * codegen — the candidate-key generator of Linkage's composite
  * blocking (FastSS / Mor-Fraenkel; see Linkage's blocking comment
  * for the intersection theorem).
  *
  * Replaces the `concat(array(name), transform(filter(sequence(...`
  * higher-order-function formulation, whose per-ELEMENT interpreted
  * lambdas measured 10.9 s for 150k rows at sf1 (73 µs/row) — the
  * dominant cost of the whole ER pair stage. The loop below emits the
  * identical variant list (spec-pinned) at ~array-building cost.
  *
  * Variants are CANONICAL: deleting any character of an equal-char
  * run yields the same string, so only run-start positions are
  * deleted (plus the j = i+1 pair for two deletions inside one run).
  * Canonicalization is loss-free — neighborhood intersection is
  * defined on the variant STRINGS, and every deletion set's string
  * equals some canonical set's string. Positions are CODEPOINTS
  * (UTF8String.substring semantics), matching levenshtein's edit
  * granularity so the budget accounting of the intersection theorem
  * holds beyond ASCII.
  */
case class DeleteVariants(child: Expression, maxEdits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_delete_variants"

  protected override def nullSafeEval(input: Any): Any =
    DeleteVariants.compute(input.asInstanceOf[UTF8String], maxEdits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.DeleteVariants.compute($c, $maxEdits)")

  override protected def withNewChildInternal(
      newChild: Expression): DeleteVariants = copy(child = newChild)
}

object DeleteVariants {

  /** Static entry point referenced by generated code. Emits the
    * original string, every canonical delete-1 variant, and (budget
    * permitting) every canonical delete-2 variant — in that order,
    * the HOF formulation's order. */
  def compute(name: UTF8String, maxEdits: Int): ArrayData = {
    require(maxEdits >= 1 && maxEdits <= 2,
      s"deletion neighborhood implemented for budgets 1 and 2, got $maxEdits")
    val n = name.numChars()
    if (n == 0) return new GenericArrayData(Array[Any](name))
    // run starts on codepoints: position i starts a run iff i == 0 or
    // codepoint(i-1) != codepoint(i). One byte-walk, no allocation:
    // two adjacent codepoints are equal iff their byte slices are.
    val starts = new Array[Boolean](n)
    val byteAt = new Array[Int](n + 1) // byte offset of each codepoint
    val bytes = name.getBytes // may copy when offset != 0; once per row
    var i = 0
    var b = 0
    while (i < n) {
      byteAt(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    byteAt(n) = b
    i = 0
    while (i < n) {
      starts(i) = i == 0 || {
        val lp = byteAt(i) - byteAt(i - 1)
        val lc = byteAt(i + 1) - byteAt(i)
        lp != lc || {
          var k = 0
          var eq = true
          while (eq && k < lc) {
            eq = bytes(byteAt(i - 1) + k) == bytes(byteAt(i) + k)
            k += 1
          }
          !eq
        }
      }
      i += 1
    }
    val out = new java.util.ArrayList[Any](
      if (maxEdits >= 2) 2 + n + n * (n - 1) / 2 else 2 + n)
    out.add(name)
    def cut1(i: Int): UTF8String =
      UTF8String.concat(name.substring(0, i), name.substring(i + 1, n))
    def cut2(i: Int, j: Int): UTF8String =
      UTF8String.concat(name.substring(0, i),
        name.substring(i + 1, j), name.substring(j + 1, n))
    i = 0
    while (i < n) {
      if (starts(i)) out.add(cut1(i))
      i += 1
    }
    if (maxEdits >= 2) {
      i = 0
      while (i < n - 1) {
        if (starts(i)) {
          var j = i + 1
          while (j < n) {
            if (j == i + 1 || starts(j)) out.add(cut2(i, j))
            j += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
