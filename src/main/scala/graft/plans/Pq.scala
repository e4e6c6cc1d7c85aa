package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization primitives as native codegen'd expressions.
  *
  * The Column-tree formulation of PQ encode / ADC-LUT (an `array()` of
  * 16 sub-dots per subspace, each an 8-term `element_at` chain, with
  * `array_position(dots, array_max(dots))` referencing the dots array
  * twice) is too large for whole-stage codegen and falls back to
  * interpreted per-row evaluation — ~1 s for a 2 000-row corpus, i.e.
  * ~0.5 ms/row, which at 100 TB is the difference between a pass and a
  * non-starter. These expressions emit one fused primitive loop over
  * the (subspace, code, component) triple instead (same pattern as
  * [[CosineSimilarity]] / [[SimHash64]]).
  *
  * The ±1 codebook is the deterministic MurmurHash3 sign family the
  * oracle SQL inlines as VALUES ([[Pq.codeSign]] is the single source
  * of truth for both), and all sums accumulate in ascending component
  * order, so results stay bit-identical to the Column form and to the
  * DuckDB replay.
  */
object Pq {
  /** Embedding dimensionality (matches the testdata embeddings). */
  val Dim = 64
  val SubSpaces = 8
  val SubDim: Int = Dim / SubSpaces
  val CodesPerSub = 16
  /** Seed tuple head — disjoint from the s02 hyperplanes (7) and the
    * s03b coarse centroids (13). */
  private val Seed = 11

  /** Shared input-length check: PQ reads exactly Dim float slots. An
    * UnsafeArrayData shorter than Dim would read out-of-bounds memory
    * with NO exception, and a LONGER embedding would be silently
    * truncated to its first Dim components — both produce
    * wrong-but-plausible codes/LUTs. A wrong-dimensionality embedding
    * is a data error; fail loudly rather than clamp (a truncated PQ
    * code is semantically wrong, unlike cosine over a shared prefix).
    * Public: the generated code calls it through the object's static
    * forwarder. */
  def requireDim(n: Int): Unit =
    if (n != Dim) throw new IllegalArgumentException(
      s"graft PQ expressions need array<float> of exactly $Dim elements, got $n")

  /** codebook: subspace m, code j, component d → ±1. */
  def codeSign(m: Int, j: Int, d: Int): Int =
    if ((scala.util.hashing.MurmurHash3.productHash((Seed, m, j, d)) & 1) == 1) 1 else -1

  /** Flat codebook, indexed [(m*CodesPerSub + j)*SubDim + d]. */
  lazy val flatCodebook: Array[Double] = {
    val cb = new Array[Double](SubSpaces * CodesPerSub * SubDim)
    for (m <- 0 until SubSpaces; j <- 0 until CodesPerSub; d <- 0 until SubDim)
      cb((m * CodesPerSub + j) * SubDim + d) = codeSign(m, j, d).toDouble
    cb
  }
}

/** All SubSpaces×CodesPerSub sub-dots of `child` against the PQ
  * codebook, ordered (m*CodesPerSub + j) — exactly the query-side ADC
  * lookup table. `cb` defaults to the pinned Murmur sign family; an
  * artifact-loaded codebook (VectorIndex) rides the expression as a
  * per-instance reference object, so scoring from a persisted index
  * runs the IDENTICAL fused loop (bit-identical sums) as in-query
  * fit. */
case class PqSubDots(child: Expression,
    cb: Array[Double] = Pq.flatCodebook)
    extends UnaryExpression with ExpectsInputTypes {
  import Pq._

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_subdots"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    requireDim(v.numElements())
    val out = new Array[Double](SubSpaces * CodesPerSub)
    var m = 0
    while (m < SubSpaces) {
      var j = 0
      while (j < CodesPerSub) {
        var dot = 0.0; var d = 0
        while (d < SubDim) {
          dot += v.getFloat(m * SubDim + d).toDouble *
            cb((m * CodesPerSub + j) * SubDim + d)
          d += 1
        }
        out(m * CodesPerSub + j) = dot
        j += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
      s"""
         |graft.plans.Pq.requireDim($v.numElements());
         |double[] out = new double[${SubSpaces * CodesPerSub}];
         |for (int m = 0; m < $SubSpaces; m++) {
         |  for (int j = 0; j < $CodesPerSub; j++) {
         |    double dot = 0.0;
         |    for (int d = 0; d < $SubDim; d++) {
         |      dot += (double) $v.getFloat(m * $SubDim + d)
         |        * $cbRef[(m * $CodesPerSub + j) * $SubDim + d];
         |    }
         |    out[m * $CodesPerSub + j] = dot;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqSubDots =
    copy(child = newChild)

  // Array fields compare by reference under case-class equality; make
  // plan equality/canonicalization see the VALUES so two instances
  // with the same loaded codebook are the same expression.
  override def equals(o: Any): Boolean = o match {
    case PqSubDots(c, ocb) => c == child && java.util.Arrays.equals(cb, ocb)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cb)
}

/** PQ encode: per subspace, the argmax-dot code index (earliest code
  * wins ties — the `array_position(dots, array_max(dots))` semantics
  * of the Column form).
  *
  * NaN contract: embeddings containing NaN are OUT OF CONTRACT for PQ
  * encode. The `dot > best` argmax skips NaN sub-dots (NaN comparisons
  * are false → that subspace falls back to the earliest finite code),
  * whereas the replaced Column form inherited Spark's ordering where
  * NaN sorts greatest. No testdata or supported pipeline produces NaN
  * embeddings (ingest should gate them — a NaN component poisons
  * cosine/dot everywhere, not just PQ), so the native form documents
  * rather than reproduces that degenerate-input divergence. */
case class PqCodes(child: Expression,
    cb: Array[Double] = Pq.flatCodebook)
    extends UnaryExpression with ExpectsInputTypes {
  import Pq._

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_codes"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    requireDim(v.numElements())
    val out = new Array[Int](SubSpaces)
    var m = 0
    while (m < SubSpaces) {
      var best = Double.NegativeInfinity; var bestJ = 0; var j = 0
      while (j < CodesPerSub) {
        var dot = 0.0; var d = 0
        while (d < SubDim) {
          dot += v.getFloat(m * SubDim + d).toDouble *
            cb((m * CodesPerSub + j) * SubDim + d)
          d += 1
        }
        if (dot > best) { best = dot; bestJ = j }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
      s"""
         |graft.plans.Pq.requireDim($v.numElements());
         |int[] out = new int[$SubSpaces];
         |for (int m = 0; m < $SubSpaces; m++) {
         |  double best = Double.NEGATIVE_INFINITY; int bestJ = 0;
         |  for (int j = 0; j < $CodesPerSub; j++) {
         |    double dot = 0.0;
         |    for (int d = 0; d < $SubDim; d++) {
         |      dot += (double) $v.getFloat(m * $SubDim + d)
         |        * $cbRef[(m * $CodesPerSub + j) * $SubDim + d];
         |    }
         |    if (dot > best) { best = dot; bestJ = j; }
         |  }
         |  out[m] = bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case PqCodes(c, ocb) => c == child && java.util.Arrays.equals(cb, ocb)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cb)
}
