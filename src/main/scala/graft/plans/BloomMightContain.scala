package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built bloom filter over long keys —
  * the scan-side semi-join pushdown for "does this key exist on the
  * (small) other side": may return true for a key not in the set
  * (bounded by the construction fpp), never false for one that is.
  * That one-sided error is what makes it composable with an exact
  * equi-join downstream (d12): the join removes the false positives,
  * the bloom removes ~everything else BEFORE the shuffle.
  *
  * The filter ships as its serialized bytes (a literal in the plan,
  * broadcast to executors inside the serialized expression tree) and
  * is deserialized once per JVM-side instance; the probe itself is a
  * codegen'd virtual call — no per-row allocation, stays inside
  * whole-stage codegen.
  *
  * This is Spark's own InjectRuntimeFilter/BloomFilterMightContain
  * pattern surfaced as an explicit, artifact-shippable operator: the
  * bytes can be persisted next to a corpus snapshot and reused across
  * runs without re-aggregating the build side.
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Public probe referenced by generated code (via addReferenceObj on
    * this expression instance). */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  protected override def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
