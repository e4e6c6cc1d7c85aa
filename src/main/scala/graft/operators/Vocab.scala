package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c17: vocabulary fitting — the census that PRODUCES the pinned
  * vocab c03c's subword counter consumes: top-K corpus terms by
  * frequency with cumulative coverage (what fraction of all token
  * occurrences the first k vocab entries explain — the curve a
  * tokenizer budget decision is read off, and 1 − cum_share(K) is
  * the OOV rate the packer will see).
  *
  * Scale: term counting is one combiner-friendly shuffle (repeated
  * terms — the thing being counted — collapse map-side); the top-K
  * cut is a distributed TakeOrdered (freq desc, term asc — total
  * order, so the K boundary is deterministic), and the rank/coverage
  * window runs on K rows only — the full vocabulary (Heaps-bounded
  * but potentially huge at 100 TB) is never globally sorted.
  * Coverage shares are DECIMAL-summed (order-independent).
  */
object Vocab {

  val VocabK = 64

  /** (rank, term, freq, share, cum_share) of the top-`k` terms over
    * any (doc_id, text) frame, whitespace-lowercase tokenization
    * (the t07 convention). */
  def fitVocab(docs: DataFrame, k: Int = VocabK): DataFrame = {
    val freq = docs.filter(trim(col("text")) =!= "")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val total = freq.agg(sum(col("freq")).as("total"))
    val top = freq.orderBy(col("freq").desc, col("term").asc).limit(k)
    val w = Window.orderBy(col("freq").desc, col("term").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_freq",
        sum(col("freq")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("rank"), col("term"), col("freq"),
        round(col("freq").cast("double") / col("total"), 6).as("share"),
        round(col("cum_freq").cast("double") / col("total"), 6)
          .as("cum_share"))
  }

  def c17(s: SparkSession, dir: String): DataFrame =
    fitVocab(Tables.documents(s, dir))

  val c17Sql: String =
    raw"""WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
                  FROM documents WHERE trim(text) <> ''),
       f AS (SELECT term, count(*) AS freq FROM toks GROUP BY 1),
       t AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM f),
       top AS (SELECT term, freq FROM f ORDER BY freq DESC, term LIMIT $VocabK),
       r AS (SELECT term, freq,
               row_number() OVER (ORDER BY freq DESC, term) AS rank,
               CAST(sum(freq) OVER (ORDER BY freq DESC, term
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_freq
             FROM top)
       SELECT rank, term, freq, round(CAST(freq AS DOUBLE)/total, 6) AS share,
         round(CAST(cum_freq AS DOUBLE)/total, 6) AS cum_share
       FROM r CROSS JOIN t"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c17_vocab_fit" -> (c17 _))

  val oracles: Map[String, String] = Map(
    "c17_vocab_fit" -> c17Sql)
}
