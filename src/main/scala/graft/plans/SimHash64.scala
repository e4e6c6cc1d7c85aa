package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized lowercase text as a native
  * expression: one fused per-row loop (tokenize → xxhash64 per token →
  * per-bit majority vote), emitted into whole-stage codegen via a
  * static call.
  *
  * Replaces the explode + 64-conditional-sum aggregation formulation:
  * the signature needs NO shuffle at all (narrow map), which is the
  * shape that survives 100 TB — the only shuffle left in near-dup
  * pairing is the band-key equi-join.
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  protected override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val Seed = 42L // Spark's xxhash64 default seed
  private val Spaces = java.util.regex.Pattern.compile("\\s+")

  /** Static entry point referenced by generated code. Lowercasing goes
    * through Spark's ICU path (like the Shingles expression) — Java's
    * String.toLowerCase is LOCALE-SENSITIVE, so a Turkish-locale
    * executor would lowercase 'I' to dotless ı and compute a different
    * signature for the same document than its peers. */
  def compute(text: UTF8String): Long = {
    val lowered = org.apache.spark.sql.catalyst.util.CollationSupport
      .Lower.execBinaryICU(text)
    val toks = Spaces.split(lowered.trim.toString, -1)
    val counts = new Array[Int](64)
    var n = 0
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val h = XxHash64Function.hash(UTF8String.fromString(toks(t)), StringType, Seed)
        var k = 0
        while (k < 64) {
          counts(k) += ((h >>> k) & 1L).toInt
          k += 1
        }
        n += 1
      }
      t += 1
    }
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) * 2 > n) bits |= 1L << k
      k += 1
    }
    bits
  }
}
