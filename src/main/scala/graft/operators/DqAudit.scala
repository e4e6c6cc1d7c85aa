package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q27: declarative data-quality constraint audit — the deequ-style
  * contract check a pipeline runs BEFORE training ever sees a batch:
  * one report row per constraint (completeness, key uniqueness,
  * referential integrity, numeric range, accepted value domain) with
  * exact checked/violation counts and a pass verdict. The reference
  * deployment trusts Elasticsearch mappings to reject malformed
  * docs; at 100 TB the contract must be a QUERY, not a mapping.
  *
  * The synthetic tables are clean by construction, so the face
  * audits a deterministically CORRUPTED view (the c13/d08 planting
  * rule: an all-zero violations column proves nothing): modulus-
  * selected keys get a NULL price, a duplicated order row, a
  * dangling lineitem FK, a negated quantity, and an out-of-domain
  * status — each constraint catches a disjoint, exactly countable
  * planting.
  *
  * Scale: single-pass aggregates per table (null/domain/uniqueness
  * ride ONE grouped scan of orders; range rides one scan of
  * lineitem) plus exactly one shuffle join for the FK check — no
  * per-constraint rescans. The report is constraint-cardinality
  * rows; verdicts are integer comparisons.
  */
object DqAudit {

  /** Planting moduli — disjoint-ish, pinned, shared with the SQL. */
  val NullMod = 97L
  val DupMod = 101L
  val DanglingMod = 79L
  val NegMod = 83L
  val DomainMod = 103L
  /** offset guaranteeing a dangling key: beyond any real orderkey. */
  val DanglingOffset = 1000000000L

  /** Corrupted orders view: NULL price, bad status, duplicated slice. */
  def auditedOrders(orders: DataFrame): DataFrame = {
    val base = orders.select(col("o_orderkey"),
      when(col("o_orderkey") % NullMod === 0, lit(null).cast("double"))
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      when(col("o_orderkey") % DomainMod === 0, lit("X"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"))
    base.unionAll(base.filter(col("o_orderkey") % DupMod === 0))
  }

  /** Corrupted lineitem view: negated quantities, dangling FKs. */
  def auditedLineitem(lineitem: DataFrame): DataFrame =
    lineitem.select(
      when(col("l_orderkey") % DanglingMod === 0,
        col("l_orderkey") + DanglingOffset)
        .otherwise(col("l_orderkey")).as("l_orderkey"),
      when(col("l_partkey") % NegMod === 0, -col("l_quantity"))
        .otherwise(col("l_quantity")).as("l_quantity"))

  /** The audit over any (orders-shaped, lineitem-shaped) pair. */
  def audit(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val o = orders.transform(graft.CacheRegistry.register)
    val l = lineitem
    val oAgg = o.agg(
      count(lit(1)).as("checked"),
      sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("nn_viol"),
      countDistinct(col("o_orderkey")).as("dk"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L))
        .as("dom_viol"))
    val lAgg = l.agg(
      count(lit(1)).as("checked"),
      sum(when(col("l_quantity") >= 1 && col("l_quantity") <= 50, 0L)
        .otherwise(1L)).as("rng_viol"))
    val fkViol = l.join(o.select(col("o_orderkey")).distinct(),
        l("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("fk_viol"))
    val lChecked = l.agg(count(lit(1)).as("checked"))
    def row(name: String, src: DataFrame, checked: String, viol: org.apache.spark.sql.Column) =
      src.select(lit(name).as("constraint_name"),
        col(checked).cast("bigint").as("checked"),
        viol.cast("bigint").as("violations"))
    row("not_null_o_totalprice", oAgg, "checked", col("nn_viol"))
      .unionAll(row("unique_o_orderkey", oAgg, "checked",
        col("checked") - col("dk")))
      .unionAll(row("domain_o_orderstatus", oAgg, "checked", col("dom_viol")))
      .unionAll(row("range_l_quantity_1_50", lAgg, "checked", col("rng_viol")))
      .unionAll(fkViol.crossJoin(lChecked)
        .select(lit("fk_lineitem_orders").as("constraint_name"),
          col("checked").cast("bigint").as("checked"),
          col("fk_viol").cast("bigint").as("violations")))
      .withColumn("pass", col("violations") === 0L)
  }

  def q27(s: SparkSession, dir: String): DataFrame =
    audit(auditedOrders(Tables.orders(s, dir)),
      auditedLineitem(Tables.lineitem(s, dir)))

  val q27Sql: String =
    raw"""WITH ob AS (SELECT o_orderkey,
               CASE WHEN o_orderkey % $NullMod = 0 THEN NULL
                    ELSE o_totalprice END AS o_totalprice,
               CASE WHEN o_orderkey % $DomainMod = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus
             FROM orders),
       oa AS (SELECT * FROM ob
              UNION ALL SELECT * FROM ob WHERE o_orderkey % $DupMod = 0),
       la AS (SELECT CASE WHEN l_orderkey % $DanglingMod = 0
                          THEN l_orderkey + $DanglingOffset
                          ELSE l_orderkey END AS l_orderkey,
                CASE WHEN l_partkey % $NegMod = 0 THEN -l_quantity
                     ELSE l_quantity END AS l_quantity
              FROM lineitem),
       og AS (SELECT count(*) AS checked,
                CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_viol,
                count(DISTINCT o_orderkey) AS dk,
                CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT) AS dom_viol
              FROM oa),
       lg AS (SELECT count(*) AS checked,
                CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT) AS rng_viol
              FROM la),
       fk AS (SELECT count(*) AS fk_viol FROM la
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM oa))
       SELECT constraint_name, checked, violations, violations = 0 AS pass FROM (
         SELECT 'not_null_o_totalprice' AS constraint_name, checked, nn_viol AS violations FROM og
         UNION ALL SELECT 'unique_o_orderkey', checked, checked - dk FROM og
         UNION ALL SELECT 'domain_o_orderstatus', checked, dom_viol FROM og
         UNION ALL SELECT 'range_l_quantity_1_50', checked, rng_viol FROM lg
         UNION ALL SELECT 'fk_lineitem_orders', lg.checked, fk_viol
           FROM fk CROSS JOIN lg
       )"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_dq_audit" -> (q27 _))

  val oracles: Map[String, String] = Map(
    "q27_dq_audit" -> q27Sql)
}
