package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector arithmetic over `array<float>` columns as pure
  * higher-order-function expressions (zip_with/aggregate) — codegen'd,
  * no UDF, no driver involvement.
  *
  * All accumulation is a left fold in index order on doubles, which is
  * the same row-local in-order summation DuckDB's list lambdas use —
  * so cross-engine results are bit-identical (IEEE doubles are
  * deterministic given identical operation order).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))
}
