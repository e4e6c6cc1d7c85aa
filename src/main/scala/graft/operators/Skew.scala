package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5). AQE's skew-join split
  * handles most runtime skew; explicit salting is the deterministic
  * fallback for pathologically hot keys (one key = one executor's
  * whole shuffle partition at 100 TB).
  *
  * `saltedJoin` replicates the (small) build side `salt` times and
  * scatters the probe side uniformly across the replicas, so a hot
  * key's rows land on `salt` different reducers instead of one.
  * Exact same join semantics for inner/left joins on equi-keys.
  */
object Skew {

  /** Equi-join `big` with `small` on `keys`, spreading each big-side
    * key across `salt` shuffle partitions. `small` is replicated
    * `salt`× (explode of a literal range — cheap when small is the
    * dimension side). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1)
    // right/full outer would emit each unmatched small-side row once
    // PER SALT replica — fail fast instead of corrupting results
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType " +
        "(the small side is replicated per salt)")
    // Scatter on keys + monotonically_increasing_id. The id depends on
    // partition layout, so routing is NOT stable under post-shuffle
    // task retries — but for an equi-join that does not affect
    // correctness: the small side is replicated to every salt, so a
    // re-routed row still meets its match; only shuffle-file reuse is
    // weaker. The id IS what makes the scatter unconditional: a
    // content hash would collapse to one salt for duplicate rows (or
    // key-only projections) — exactly the hot-key case salting exists
    // for.
    val bigSalted = big.withColumn("_salt",
      pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*), lit(salt)))
    val smallSalted = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    bigSalted.join(smallSalted, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Top-N hottest keys of `df` by count — the diagnostic used to
    * decide salting (runs as one partial-agg'd shuffle). */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
