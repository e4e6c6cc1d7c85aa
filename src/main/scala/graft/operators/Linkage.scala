package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** f33: duplicate-account detection by record linkage — the entity-
  * resolution primitive a fraud stack runs beside the behavioral
  * rules (f03-f26 score what an account DOES; f33 asks whether two
  * accounts are the same ACTOR): for every customer, its best
  * same-nation near-duplicate name under an edit budget, the
  * Fellegi-Sunter blocking-and-comparison shape with a deterministic
  * decision rule. A fraudster registering sibling accounts varies a
  * character or two; the ban-evasion follow-up account is a
  * levenshtein neighbor of the banned one.
  *
  * Scale: nation is the BLOCKING key — the pair join is an equi-join
  * on it, never a cross join, and the edit distance runs only inside
  * blocks (the house bucket-join rule applied to ER). At 100 TB the
  * block key would compose finer attributes (region + name prefix
  * class + signup cohort — the d02p lesson: the blocker is a measured
  * knob); the comparison stays a codegen'd binary expression either
  * way. The verdict aggregate (best match per record) is one window
  * over the filtered candidate frame — candidate-sized, not
  * block-squared, after the edit filter.
  *
  * Oracle parity: levenshtein is the classic integer DP in both
  * engines (the s07 precedent); ranking is total-ordered (dist asc,
  * partner key asc); counts are integers end-to-end.
  */
object Linkage {

  /** Edit budget: one or two character substitutions/indels — the
    * sibling-account typo band (s07's AUTO budget for long tokens). */
  val MaxEdits = 2

  /** The budget-surviving unordered link pairs of a (key, name,
    * block) frame: (key, name, match_key, match_name, dist) with
    * key < match_key — the shared comparison stage of [[bestMatches]]
    * and [[goldenRecords]]. The comparison is budget-aware and runs
    * ONCE per unordered pair: a length gap > the budget can't be
    * within it (free row pruning before any DP), the THRESHOLDED
    * levenshtein runs the banded early-exit DP instead of the full
    * len² table, and the key < match_key half-join computes each
    * pair's distance once. Together 28.8 → 12.9 s at sf0.1 (9M block
    * pairs, budget 2). The reported dist equals the unthresholded
    * distance on every kept row, so the 2-arg DuckDB replay stays
    * bit-exact. Candidate-sized output (the post-budget survivors),
    * cached so the block-pair DP scan runs once per consumer plan. */
  def linkPairs(records: DataFrame, maxEdits: Int = MaxEdits): DataFrame = {
    val a = records.select(col("key"), col("name"), col("block"))
    val b = records.select(col("key").as("match_key"),
      col("name").as("match_name"), col("block"))
    a.join(b, Seq("block"))
      .filter(col("key") < col("match_key") &&
        abs(length(col("name")) - length(col("match_name"))) <= maxEdits)
      .withColumn("dist",
        levenshtein(col("name"), col("match_name"), maxEdits).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxEdits)
      .select(col("key"), col("name"), col("match_key"), col("match_name"),
        col("dist"))
      .transform(graft.CacheRegistry.register)
  }

  /** Best-match linkage verdicts over any
    * (key, name, block) frame: (key, match_key, match_name, dist,
    * n_candidates) — one row per record that HAS a candidate within
    * the budget; clean records are absent (no verdict, not a null).
    * The symmetric candidate set is the cached half-pair frame
    * unioned with its mirror (distance is symmetric). */
  def bestMatches(records: DataFrame, maxEdits: Int = MaxEdits): DataFrame = {
    val half = linkPairs(records, maxEdits)
    val cand = half.unionByName(
      half.select(col("match_key").as("key"), col("match_name").as("name"),
        col("key").as("match_key"), col("name").as("match_name"),
        col("dist")))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("dist").asc, col("match_key").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .withColumn("n_candidates",
        count(lit(1)).over(Window.partitionBy(col("key"))))
      .filter(col("rank") === 1)
      .select(col("key"), col("match_key"), col("match_name"),
        col("dist"), col("n_candidates"))
  }

  def f33(s: SparkSession, dir: String): DataFrame =
    bestMatches(Tables.customer(s, dir)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_nationkey").as("block")))
      .withColumnRenamed("key", "c_custkey")

  val f33Sql: String =
    s"""WITH cand AS (
         SELECT a.c_custkey AS c_custkey, b.c_custkey AS match_key,
                b.c_name AS match_name,
                CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         FROM customer a JOIN customer b
           ON a.c_nationkey = b.c_nationkey AND a.c_custkey <> b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= $MaxEdits),
       rk AS (
         SELECT *, row_number() OVER (PARTITION BY c_custkey
                     ORDER BY dist, match_key) AS rank,
                count(*) OVER (PARTITION BY c_custkey) AS n_candidates
         FROM cand)
       SELECT c_custkey, match_key, match_name, dist,
         CAST(n_candidates AS BIGINT) AS n_candidates
       FROM rk WHERE rank = 1"""

  // ---------------------------------------------------------------
  // f35: golden-record survivorship — the merge step completing the
  // ER family (f33 LINKS records that are the same actor; f35
  // PRODUCES the one consolidated record per actor): transitive
  // closure of the budget-surviving link pairs → same-actor
  // clusters, then deterministic survivorship rules over each
  // cluster's members. Rules are the classic MDM trio, each exactly
  // replayable: identity = the cluster's min key (its canonical
  // master), golden name = the master's name (earliest-registration
  // precedence), exposure = the DECIMAL-summed balance of ALL
  // members (a ban-evasion ring's consolidated liability), segment =
  // the members' mode with lexicographic tie-break. Only multi-
  // member clusters appear — a singleton needs no merge.
  //
  // Scale: the pair stage is f33's blocked equi-join (shared
  // linkPairs cache); the closure is Dedup.connectedComponents
  // (pointer-doubled, log-diameter rounds); everything after is
  // cluster-member-sized — three combiner-friendly aggregates and
  // one row_number window over (cluster, segment) counts. Blocking
  // confines every cluster to one nation, so `nation` is a min only
  // in form.
  // ---------------------------------------------------------------

  /** One golden record per multi-member linked cluster: (cluster_key,
    * n_members, golden_name, nation, total_acctbal, segment). */
  def goldenRecords(records: DataFrame,
      maxEdits: Int = MaxEdits): DataFrame = {
    val pairs = linkPairs(records, maxEdits)
      .select(col("key").as("a"), col("match_key").as("b"))
    val linked = pairs.select(col("a").as("id"))
      .union(pairs.select(col("b").as("id"))).distinct()
    val members = Dedup.connectedComponents(pairs, linked)
      .join(records, col("id") === col("key"))
      // cluster-member-sized (linked records only), consumed 3×
      .transform(graft.CacheRegistry.register)
    val agg = members.groupBy(col("component").as("cluster_key"))
      .agg(count(lit(1)).as("n_members"),
        min(col("block")).as("nation"),
        Relational.dsum(col("bal")).as("total_acctbal"))
    val golden = members.filter(col("id") === col("component"))
      .select(col("component").as("cluster_key"),
        col("name").as("golden_name"))
    val wseg = Window.partitionBy(col("cluster_key"))
      .orderBy(col("c").desc, col("segment").asc)
    val topseg = members
      .groupBy(col("component").as("cluster_key"), col("segment"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(wseg))
      .filter(col("rk") === 1)
      .select(col("cluster_key"), col("segment"))
    agg.join(golden, "cluster_key").join(topseg, "cluster_key")
      .select(col("cluster_key"), col("n_members"), col("golden_name"),
        col("nation"), col("total_acctbal"), col("segment"))
  }

  def f35(s: SparkSession, dir: String): DataFrame =
    goldenRecords(Tables.customer(s, dir)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_nationkey").as("block"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("segment")))

  val f35Sql: String =
    s"""WITH RECURSIVE cand AS (
         SELECT a.c_custkey AS a, b.c_custkey AS b
         FROM customer a JOIN customer b
           ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= $MaxEdits),
       sym AS (SELECT a AS src, b AS dst FROM cand
               UNION ALL SELECT b, a FROM cand),
       linked AS (SELECT DISTINCT src AS id FROM sym),
       reach(v, l) AS (
         SELECT id, id FROM linked
         UNION
         SELECT s.dst, r.l FROM reach r JOIN sym s ON s.src = r.v),
       comp AS (SELECT v AS id, min(l) AS component FROM reach GROUP BY v),
       m AS (SELECT component, c_custkey, c_name, c_nationkey, c_acctbal,
               c_mktsegment
             FROM comp JOIN customer ON id = c_custkey),
       agg AS (SELECT component AS cluster_key, count(*) AS n_members,
                 min(c_nationkey) AS nation,
                 CAST(sum(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE)
                   AS total_acctbal
               FROM m GROUP BY 1),
       golden AS (SELECT component AS cluster_key, c_name AS golden_name
                  FROM m WHERE c_custkey = component),
       segs AS (SELECT component AS cluster_key, c_mktsegment AS segment,
                  count(*) AS c
                FROM m GROUP BY 1, 2),
       topseg AS (SELECT cluster_key, segment FROM (
           SELECT cluster_key, segment,
             row_number() OVER (PARTITION BY cluster_key
               ORDER BY c DESC, segment) AS rk
           FROM segs) WHERE rk = 1)
       SELECT cluster_key, n_members, golden_name, nation, total_acctbal,
         segment
       FROM agg JOIN golden USING (cluster_key)
       JOIN topseg USING (cluster_key)"""

  // ---------------------------------------------------------------
  // 41s: streaming duplicate-account gate — f33's linkage enforced AT
  // REGISTRATION (the 41f ingest-gate posture applied to ER): every
  // micro-batch of new accounts is linked against its own members AND
  // the accumulated account state, so the ban-evasion follow-up is
  // flagged the trigger it registers, not at the next batch sweep.
  //
  // State is the indexBatch posture (41r): each batch writes its own
  // `state/batch=<id>` level partitioned by block — a replayed id
  // OVERWRITES its own directory, and the gate reads batches < id
  // only, so crash-replay sees the same corpus as the first run and
  // emits the same alerts (idempotence spec-pinned). The cross probe
  // is the same blocked equi-join + length-gap prune + banded
  // thresholded levenshtein as linkPairs — per trigger it touches the
  // batch's blocks of the state only (block partition pruning).
  //
  // Keys must be GLOBALLY UNIQUE for the stream's lifetime (the
  // gateBatch contract): state is keyed by `key` alone.
  // ---------------------------------------------------------------

  /** The gate's state/alert layouts, pinned so reads never run
    * schema inference (which throws over empty levels). `batch` and
    * `block` are partition-directory columns. */
  private val StateSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "key LONG, name STRING, batch LONG, block LONG")
  private val AlertSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "key LONG, match_key LONG, match_name STRING, dist LONG, " +
        "n_candidates LONG, batch LONG")

  /** Fold one (key, name, block) registration micro-batch into the
    * maintained account state and write its best-match alerts to
    * `path/alerts/batch=<id>` — idempotent under replay of the same
    * `id`. Alert rows: (key, match_key, match_name, dist,
    * n_candidates), the f33 verdict shape, one per batch member with
    * a within-budget neighbor in the batch or the earlier state. */
  def linkageBatch(batch: DataFrame, id: Long, path: String,
      maxEdits: Int = MaxEdits): Unit = {
    require(!batch.columns.contains("batch"),
      "linkage gate input must not carry a 'batch' column (reserved for the state layout)")
    val s = batch.sparkSession
    graft.CacheRegistry.scoped {
      val recs = batch.select(col("key"), col("name"), col("block"))
        .transform(graft.CacheRegistry.register)
      // within-batch: the shared half-pair stage, mirrored so BOTH
      // members of a sibling pair alert (the bestMatches rule)
      val half = linkPairs(recs, maxEdits)
      val within = half
        .select(col("key"), col("match_key"), col("match_name"), col("dist"))
        .unionByName(half.select(col("match_key").as("key"),
          col("key").as("match_key"), col("name").as("match_name"),
          col("dist")))
      // cross-batch: probe the sealed state levels below this id.
      // The read is SCHEMA'D (the gate's key/name/block contract):
      // schema inference over a state tree whose only levels so far
      // are EMPTY batches (zero data files under batch=<id>/block=*)
      // would throw and kill the stream — an empty trigger is a
      // normal event, not an error.
      val stateRoot = new org.apache.hadoop.fs.Path(s"$path/state")
      val fs = stateRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
      val cross =
        if (!fs.exists(stateRoot)) within.limit(0)
        else s.read.schema(StateSchema).parquet(s"$path/state")
          .filter(col("batch") < id)
          .select(col("key").as("match_key"),
            col("name").as("match_name"), col("block"))
          .join(recs, Seq("block"))
          .filter(abs(length(col("name")) - length(col("match_name"))) <= maxEdits)
          .withColumn("dist",
            levenshtein(col("name"), col("match_name"), maxEdits).cast("long"))
          .filter(col("dist") >= 0 && col("dist") <= maxEdits)
          .select(col("key"), col("match_key"), col("match_name"), col("dist"))
      val w = Window.partitionBy(col("key"))
        .orderBy(col("dist").asc, col("match_key").asc)
      val alerts = within.unionByName(cross)
        .withColumn("rank", row_number().over(w))
        .withColumn("n_candidates",
          count(lit(1)).over(Window.partitionBy(col("key"))))
        .filter(col("rank") === 1)
        .select(col("key"), col("match_key"), col("match_name"),
          col("dist"), col("n_candidates"))
      alerts.write.mode("overwrite").parquet(s"$path/alerts/batch=$id")
      recs.write.mode("overwrite").partitionBy("block")
        .parquet(s"$path/state/batch=$id")
    }
  }

  /** Maintain the registration gate over a (key, name, block)
    * stream. */
  def maintainLinkage(stream: DataFrame, path: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        linkageBatch(batch, id, path)
      }
      .start()

  /** All alerts the maintained gate has emitted (batch is the
    * partition column of the alert layout; schema'd read — an
    * all-clean stream leaves only empty alert levels). */
  def readLinkageAlerts(s: SparkSession, path: String): DataFrame =
    s.read.schema(AlertSchema).parquet(s"$path/alerts")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f33_dup_accounts" -> (f33 _),
    "f35_golden_record" -> (f35 _))

  val oracles: Map[String, String] = Map(
    "f33_dup_accounts" -> f33Sql,
    "f35_golden_record" -> f35Sql)
}
