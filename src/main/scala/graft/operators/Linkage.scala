package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Scale: blocking is COMPOSITE (r17) — the caller's exact block key
  * (nation) refined by the loss-free deletion-neighborhood keys
  * (FastSS), so the pair join is an equi-join on (block, variant),
  * never a cross join and never block-quadratic: candidates are only
  * records whose ≤ budget deletion neighborhoods genuinely intersect,
  * which at 100 TB bounds the comparison stage by the true near-match
  * mass instead of the SQUARE of the coarsest attribute's block size
  * (the r16 verdict's one remaining scale-killer, now a measured gear
  * — the f33_block_* bench pair + guard ratio floor); the comparison
  * stays a codegen'd binary expression either way. The verdict
  * aggregate (best match per record) is one window over the filtered
  * candidate frame — candidate-sized, after the edit filter.
  *
  * Oracle parity: levenshtein is the classic integer DP in both
  * engines (the s07 precedent); ranking is total-ordered (dist asc,
  * partner key asc); counts are integers end-to-end.
  */
object Linkage {

  /** Edit budget: one or two character substitutions/indels — the
    * sibling-account typo band (s07's AUTO budget for long tokens). */
  val MaxEdits = 2

  // ---------------------------------------------------------------
  // Composite blocking (r16 verdict item 1). The coarse gear blocks
  // on the caller's `block` column alone (nation) and pays |B|²/2
  // comparisons per block — at 100 TB a 25-value blocker is
  // 10¹² pairs/block, the one scale-killer the r16 verdict named.
  // The production gear COMPOSES a second, content-derived blocking
  // key with ZERO recall loss: the DELETION NEIGHBORHOOD (the
  // FastSS / Mor-Fraenkel index — Bocek et al. 2007, public
  // algorithmics, re-expressed as a Spark explode + equi-join).
  // Every record emits each string reachable by deleting ≤ maxEdits
  // characters from its name (≤ 1 + l + l(l−1)/2 variants — 172 at
  // l = 18); ed(s,t) ≤ e guarantees the neighborhoods INTERSECT:
  // walk an optimal edit script and delete, on each side, the
  // characters the script substitutes or inserts/deletes — each op
  // costs at most one deletion per side, and what remains is the
  // same aligned common subsequence. So a symmetric self-join on
  // (block, variant) is a COMPLETE candidate generator;
  // overgeneration is harmless (candidates are verified by the same
  // exact thresholded DP — the d02p "verify against the full sets"
  // contract) and undergeneration is impossible, so the f33/f35
  // oracles stay the exhaustive within-nation SQL, driver-checked
  // (the d02p pattern: "the composite blocker loses nothing" is a
  // fact the gate replays, not a prose claim).
  //
  // Why deletion variants and not positional segmenting (PassJoin):
  // a variant key carries the name's FULL surviving content, so a
  // constant prefix shared by every record ("Customer#…") cannot
  // create a hot bucket — the bucket key still contains the
  // discriminative tail. A segment scheme keys on (position, slice)
  // and the boilerplate slices collapse into df ≈ block-size hot
  // keys (measured: worse than the coarse quadratic on this very
  // corpus — the d02 boilerplate lesson replayed in ER). The cost is
  // a bigger but LINEAR explode (~172 short keys/record vs the
  // blocker-squared pair stream, which is unbounded); exact-dup name
  // clusters should be collapsed by d01-style exact dedup first
  // (identical names share all 172 variants — the one multiplicity
  // the verify-side distinct pays for).
  // ---------------------------------------------------------------

  /** The ≤ maxEdits deletion neighborhood of `name` (maxEdits ≤ 2):
    * the name itself, every canonical delete-1 and (budget
    * permitting) delete-2 variant — the native codegen'd
    * [[graft.plans.DeleteVariants]] loop (the HOF lambda formulation
    * measured 73 µs/row — the dominant cost of the whole pair stage
    * at sf1; the fused loop is ~array-building cost, spec-pinned
    * set-equal to the full enumeration). */
  def deletionVariants(s: SparkSession, name: Column,
      maxEdits: Int = MaxEdits): Column =
    graft.plans.GraftFunctions.deleteVariants(s, name, maxEdits)

  /** The slim composite-blocking candidate frame of a (key, name,
    * block) records frame: (key, block, len, skey) with one row per
    * deletion variant, balanced BEFORE the generator and hashed to a
    * fixed-width join key. ONE definition shared by linkPairs'
    * segmented branch and the streaming gate's cross probe, so the
    * two can never drift on the blocking recipe (a drift would
    * silently break the gate's "same candidates as batch f33"
    * contract). */
  private def slimFrame(records: DataFrame, maxEdits: Int): DataFrame = {
    val s = records.sparkSession
    records
      .repartition(col("key"))
      .select(col("key"), col("block"), length(col("name")).as("len"),
        explode(deletionVariants(s, col("name"), maxEdits)).as("v"))
      .select(col("key"), col("block"), col("len"),
        xxhash64(col("v")).as("skey"))
  }

  /** The budget-surviving unordered link pairs of a (key, name,
    * block) frame: (key, name, match_key, match_name, dist) with
    * key < match_key — the shared comparison stage of [[bestMatches]]
    * and [[goldenRecords]]. The comparison is budget-aware and runs
    * ONCE per unordered pair: a length gap > the budget can't be
    * within it (free row pruning before any DP), the THRESHOLDED
    * levenshtein runs the banded early-exit DP instead of the full
    * len² table, and the key < match_key half-join computes each
    * pair's distance once. The reported dist equals the unthresholded
    * distance on every kept row, so the 2-arg DuckDB replay stays
    * bit-exact. Candidate-sized output (the post-budget survivors),
    * cached so the block-pair DP scan runs once per consumer plan.
    *
    * `segmentBlocked = true` (the production default) composes the
    * caller's block with the deletion-neighborhood keys (see the
    * blocking comment above): the join runs on (block, variant),
    * shared variants are deduped per pair BEFORE any DP, and the
    * output is provably identical to the coarse gear's — only the
    * candidate generation changes (the block-quadratic pair stream →
    * the neighborhood-collision survivors). `false` pins the coarse
    * block-only equi-join (28.8 → 12.9 s at sf0.1 via the length +
    * threshold pruning alone) — the conservative twin the
    * `f33_block_*` bench pair measures against. */
  /** Opt-in posting cap for [[linkPairs]]' composite gear — the
    * audited SCALE KNOB, deliberately NOT the production default.
    * Measured on the 10x sf1 replica (caps 8/16/32/64 against the
    * exhaustive gear, r20): dropping (block, variant) postings larger
    * than the cap loses 72%/61%/38%/1.5% of TRUE pairs respectively
    * AND reads SLOWER than uncapped (24.5/22.3/25.0 s vs 18.3 s) —
    * the posting-size pre-pass costs more than the candidate mass it
    * saves, because on dense name corpora the crowded postings are
    * exactly where the matches live (the OPPOSITE of d02's df-cap,
    * where high-df shingles are redundant signal). So unlike the d02
    * router this gear is never auto-selected; it exists as the
    * driver-audited escape hatch for a corpus whose posting tail is
    * genuinely pathological (cap chosen above every measured small-SF
    * posting: max 26 at sf0.01, 44 at sf0.1, 91 at sf1 — at 64 the
    * audit face is bit-exact against the exhaustive oracle at the
    * gate's SFs, and the sf1 loss is the measured 1.5%). */
  val AuditPostingCap = 64

  def linkPairs(records: DataFrame, maxEdits: Int = MaxEdits,
      segmentBlocked: Boolean = true,
      postingCap: Option[Int] = None): DataFrame = {
    // fail at CONSTRUCTION, not inside executor tasks: the deletion
    // neighborhood covers budgets 1-2 (the engine's sibling-typo
    // band); other budgets keep the coarse gear explicitly
    require(!segmentBlocked || (maxEdits >= 1 && maxEdits <= 2),
      s"the composite deletion-neighborhood gear covers edit budgets " +
        s"1 and 2 (got $maxEdits) — pass segmentBlocked = false for " +
        "other budgets")
    require(postingCap.isEmpty || segmentBlocked,
      "postingCap is a property of the deletion-neighborhood postings " +
        "— meaningless for the coarse block-only gear")
    val pairs = if (segmentBlocked) {
      // balance BEFORE the generator: the source scan of a small
      // blocked corpus is often one file = one task, and the explode
      // amplifies ×~120 — spread the rows first so variant
      // generation parallelizes. The frame is SLIM — (key, block,
      // len, hashed variant), never the name or the raw variant
      // string: the variant hashes to 8 bytes while block rides as
      // its own join column, so a hash COLLISION can only merge
      // variants WITHIN a block — pure overgeneration the DP then
      // rejects, never a cross-block pair (blocking semantics stay
      // provably exact, not probabilistically so). The exploded
      // shuffle and the collision stream carry four fixed-width
      // columns; a true pair collides once per shared variant
      // (multiplicity ~5-8 on dense names — measured sf1: 33M
      // collision rows), and names re-attach AFTER the pair distinct,
      // candidate-sized. Deliberately NOT cached: materializing the
      // ~120×-exploded frame through the columnar cache costs more
      // than generating it twice (measured sf1: 26 s cache build vs
      // ~3 s per native-loop generation pass).
      val slim0 = slimFrame(records, maxEdits)
        .repartition(col("block"), col("skey"))
      // opt-in cap gear (see [[AuditPostingCap]]): posting sizes by
      // one count aggregate over the already-(block, skey)-partitioned
      // frame (no extra exchange), then a left-semi prune of the
      // oversized postings. Measured an anti-gear on this corpus —
      // wired only when a caller explicitly opts in.
      val slim = postingCap match {
        case Some(cap) =>
          val ok = slim0.groupBy(col("block"), col("skey"))
            .agg(count(lit(1)).as("pf")).filter(col("pf") <= cap)
            .select(col("block"), col("skey"))
          slim0.join(ok, Seq("block", "skey"), "left_semi")
        case None => slim0
      }
      // SHUFFLE_HASH hint: both sides are the same exchange (reused),
      // but sort-merge pays TWO per-partition sorts of the ~120x-
      // exploded frame on top of it; hash-building one side skips
      // both sorts (measured r20: pair stage 14.6 -> 12.6 s at sf1,
      // 3.1 -> 2.5 s at sf0.1; partitions are posting-bounded —
      // ~575k rows/partition at sf1 — far inside executor memory
      // even at a 1000-executor 100 TB layout, where the partition
      // count scales with the cluster, not the corpus).
      val cand = slim.join(
          slim.select(col("key").as("match_key"), col("block"),
            col("len").as("mlen"), col("skey")).hint("shuffle_hash"),
          Seq("block", "skey"))
        .filter(col("key") < col("match_key") &&
          abs(col("len") - col("mlen")) <= maxEdits)
        .select(col("key"), col("match_key"))
        .distinct()
      val names = records.select(col("key"), col("name"))
      cand
        .join(names, "key")
        .join(names.select(col("key").as("match_key"),
          col("name").as("match_name")), "match_key")
        .select(col("key"), col("name"), col("match_key"), col("match_name"))
    } else {
      val a = records.select(col("key"), col("name"), col("block"))
      val b = records.select(col("key").as("match_key"),
        col("name").as("match_name"), col("block"))
      a.join(b, Seq("block"))
        .filter(col("key") < col("match_key") &&
          abs(length(col("name")) - length(col("match_name"))) <= maxEdits)
        .select(col("key"), col("name"), col("match_key"), col("match_name"))
    }
    pairs
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
  def bestMatches(records: DataFrame, maxEdits: Int = MaxEdits,
      postingCap: Option[Int] = None): DataFrame = {
    val half = linkPairs(records, maxEdits, postingCap = postingCap)
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

  /** f33b: the capped gear under the SAME exhaustive oracle as f33 —
    * the r19 verdict's "audit face proving zero recall loss at
    * current SFs" made a driver-gated fact: [[AuditPostingCap]] sits
    * above every measured sf0.01/sf0.1 posting, so a bit-exact match
    * here proves the cap machinery drops nothing when it doesn't
    * bind; the sf1 curve in the [[AuditPostingCap]] scaladoc is the
    * measured cost when it does. */
  def f33b(s: SparkSession, dir: String): DataFrame =
    bestMatches(Tables.customer(s, dir)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_nationkey").as("block")),
      postingCap = Some(AuditPostingCap))
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
  // `state/batch=<id>` level (flat files, block as a data
  // column — the probe joins every block, so subdirs bought no
  // pruning) PLUS its slim
  // deletion-variant frame under `varstate/batch=<id>` (r17: the
  // maintained FastSS index — a record's neighborhood is generated
  // once, at registration) — a replayed id OVERWRITES its own
  // directories, and the gate reads batches < id only, so
  // crash-replay sees the same corpus as the first run and emits the
  // same alerts (idempotence spec-pinned). The cross probe is the
  // same composite (block, variant) equi-join + length-gap prune +
  // banded thresholded levenshtein as linkPairs, fed from the variant
  // index — per trigger one columnar scan of the accumulated index
  // (LINEAR in state size, never block-quadratic in it, and no
  // per-trigger re-explosion of state names), with a trickle batch
  // broadcasting its frame so the state side takes no exchange at
  // all (the adaptive probe below).
  //
  // Keys must be GLOBALLY UNIQUE for the stream's lifetime (the
  // gateBatch contract): state is keyed by `key` alone.
  // ---------------------------------------------------------------

  /** The gate's state/alert layouts, pinned so reads never run
    * schema inference (which throws over empty levels). `batch` is
    * the partition-directory column; `block` rides as a data column
    * in the flat r18 level files (pre-r18 levels partitioned by it —
    * the legacy heal below rewrites those flat on resume). */
  private val StateSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "key LONG, name STRING, batch LONG, block LONG")
  private val AlertSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "key LONG, match_key LONG, match_name STRING, dist LONG, " +
        "n_candidates LONG, batch LONG")
  /** The maintained variant-index layout (r17): each batch's slim
    * deletion-variant frame, persisted at registration so every later
    * trigger READS four fixed-width columns instead of re-exploding
    * the full state's names — the 41r "maintain the serving artifact"
    * posture applied to the ER gate's FastSS index. A record's
    * variants are generated ONCE in its lifetime. */
  private val VarStateSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "key LONG, block LONG, len INT, skey LONG, batch LONG")

  /** Fold one (key, name, block) registration micro-batch into the
    * maintained account state and write its best-match alerts to
    * `path/alerts/batch=<id>` — idempotent under replay of the same
    * `id`. Alert rows: (key, match_key, match_name, dist,
    * n_candidates), the f33 verdict shape, one per batch member with
    * a within-budget neighbor in the batch or the earlier state. */
  /** Probe gate: a trigger of at most this many records broadcasts
    * its variant frame into the state probe instead of shuffling both
    * sides. ≤ 2000 records × ~120 variants × 4 fixed-width columns
    * ≈ 7 MB — comfortably under Spark's broadcast comfort zone. */
  val BroadcastProbeRows = 2000L

  def linkageBatch(batch: DataFrame, id: Long, path: String,
      maxEdits: Int = MaxEdits,
      probeBroadcastRows: Long = BroadcastProbeRows): Unit = {
    require(!batch.columns.contains("batch"),
      "linkage gate input must not carry a 'batch' column (reserved for the state layout)")
    val s = batch.sparkSession
    graft.CacheRegistry.scoped {
      val recs = batch.select(col("key"), col("name"), col("block"))
        .transform(graft.CacheRegistry.register)
      // ONE action sizes the trigger (cached frame, batch-bounded):
      // everything gear-shaped below — the within-batch pair gear,
      // the probe join shape, the state write layout — keys off it.
      // The pinned-shuffle twin (probeBroadcastRows = 0) never
      // consults a count, so it skips the job outright: no count
      // value could change any of its choices.
      val nRecs = if (probeBroadcastRows > 0) recs.count() else Long.MaxValue
      val trickle = nRecs <= probeBroadcastRows
      // This batch's slim variant frame lands in the maintained
      // variant INDEX before anything else — varstate/batch=<id>,
      // four fixed-width columns, the same slimFrame recipe linkPairs
      // uses. A record's deletion neighborhood is generated only at
      // its own registration trigger (the index write here, plus the
      // within-batch linkPairs stage's internal passes — all
      // batch-sized); every LATER trigger's probe READS the index
      // instead of re-exploding state names — the 41r
      // "maintain the serving artifact" posture applied to the ER
      // gate (measured sf0.1: ~1.8M slim rows regenerated per trigger
      // before; a ~15 MB columnar read after). Write order makes the
      // records write below the commit point: a crash after varstate
      // but before state is healed by the replay's overwrite of BOTH
      // levels, and no reader consults varstate levels without a
      // committed state sibling (the probe filters batch < id, and
      // batch ids are issued sequentially). Cached: the SAME frame
      // is the probe's batch side below — the write is for future
      // triggers' reads, this trigger probes from memory; it runs
      // CONCURRENTLY with the probe/alerts job (both sit above the
      // state commit point — any subset present without state is
      // overwritten by the replay) and is awaited before the commit
      // write, so the crash contract is unchanged while a trickle
      // trigger pays one write latency instead of two.
      val slimB = slimFrame(recs, maxEdits)
        .transform(graft.CacheRegistry.register)
      val varWrite = scala.concurrent.Future {
        slimB.write.mode("overwrite").parquet(s"$path/varstate/batch=$id")
      }(scala.concurrent.ExecutionContext.global)
      // cross-batch: probe the sealed state levels below this id.
      // Reads are SCHEMA'D (the gate's layout contract): schema
      // inference over a state tree whose only levels so far are
      // EMPTY batches (zero data files under batch=<id>)
      // would throw and kill the stream — an empty trigger is a
      // normal event, not an error.
      //
      // The probe is the composite-blocking join (r17): both sides'
      // ≤ maxEdits deletion neighborhoods come from the variant
      // index and the join runs on (block, variant) — per trigger
      // LINEAR in the pruned index (one columnar scan), never
      // block-quadratic; completeness per the deletion-neighborhood
      // intersection theorem (see the blocking comment above).
      val stateRoot = new org.apache.hadoop.fs.Path(s"$path/state")
      val fs = stateRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
      // SELF-HEALING MIGRATION: a state tree written before the
      // variant index existed has state/batch=<b> levels with no
      // varstate sibling — reading varstate blindly would either
      // throw (no such path) or, worse, silently probe NOTHING for
      // the legacy batches and miss their alerts. Heal once: any
      // committed state batch below this id missing its varstate
      // level gets the level regenerated from its names and written
      // (idempotent — the same writer, the same recipe), after which
      // the uniform index read below is complete. Directory listing
      // is driver-side and bounded by the batch count.
      def batchLevels(root: org.apache.hadoop.fs.Path): Set[Long] =
        if (!fs.exists(root)) Set.empty
        else fs.listStatus(root).filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.startsWith("batch="))
          .map(_.stripPrefix("batch=").toLong).toSet
      // LEGACY-LAYOUT HEAL (r19 advice): levels written before r18
      // are block-partitioned (state/batch=<b>/block=<k>/... with
      // key+name data files); r18+ levels are flat files carrying
      // block as a data column. Partition discovery throws
      // ("conflicting directory structures") over a tree mixing the
      // two depths, so resuming a pre-r18 gate would kill every
      // whole-tree state read the moment this trigger commits its
      // first flat level. Heal first: rewrite each legacy level flat
      // — same rows, same schema — through a tmp tree OUTSIDE state/
      // so no crash window leaves a mixed or missing level. Order
      // per level: write stateheal/batch=<b> (overwrite, idempotent)
      // → delete the legacy level → rename the healed level in. A
      // replayed trigger finishes whichever window a crash left:
      // uncommitted tmp (no _SUCCESS) → drop it, the legacy level is
      // intact (deletion only ever follows a committed tmp) and the
      // rewrite loop redoes it; committed tmp + legacy level → redo
      // delete+rename; committed tmp + missing level → rename;
      // committed tmp + flat level → drop the stale tmp. Listing is
      // driver-side, one listStatus per committed level per trigger
      // (the varstate heal's non-memoization rationale applies: a
      // tree swapped out from under a running gate must be seen).
      val healRoot = new org.apache.hadoop.fs.Path(s"$path/stateheal")
      def isLegacy(b: Long): Boolean =
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/state/batch=$b"))
          .exists(st => st.isDirectory &&
            st.getPath.getName.startsWith("block="))
      def finishHeal(b: Long): Unit = {
        val lvl = new org.apache.hadoop.fs.Path(s"$path/state/batch=$b")
        val tmp = new org.apache.hadoop.fs.Path(s"$path/stateheal/batch=$b")
        val committed = fs.exists(new org.apache.hadoop.fs.Path(
          s"$path/stateheal/batch=$b/_SUCCESS"))
        if (!committed) fs.delete(tmp, true)
        else if (fs.exists(lvl) && !isLegacy(b)) fs.delete(tmp, true)
        else {
          if (fs.exists(lvl)) fs.delete(lvl, true)
          fs.rename(tmp, lvl)
        }
      }
      batchLevels(healRoot).foreach(finishHeal)
      batchLevels(stateRoot).filter(isLegacy).foreach { b =>
        s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
            "key LONG, name STRING, block LONG"))
          .parquet(s"$path/state/batch=$b")
          .select(col("key"), col("name"), col("block"))
          .write.mode("overwrite").parquet(s"$path/stateheal/batch=$b")
        finishHeal(b)
      }
      if (fs.exists(healRoot)) fs.delete(healRoot, true)
      // NOT memoized across triggers: the heal must notice a
      // varstate tree modified or deleted OUT FROM UNDER a running
      // gate (the legacy-migration spec pins exactly that), and a
      // same-JVM "already verified" floor would trust a tree that no
      // longer exists. Two driver-side listings of ≤ batch-count
      // entries per trigger is the price of that soundness.
      val missingVar = (batchLevels(stateRoot) -- batchLevels(
        new org.apache.hadoop.fs.Path(s"$path/varstate"))).filter(_ < id)
      missingVar.foreach { b =>
        slimFrame(s.read.schema(StateSchema).parquet(s"$path/state")
            .filter(col("batch") === b)
            .select(col("key"), col("name"), col("block")), maxEdits)
          .write.mode("overwrite").parquet(s"$path/varstate/batch=$b")
      }
      val stateExists = fs.exists(stateRoot)
      // within-batch + cross-batch candidate pairs, (key, match_key,
      // match_name, dist), mirrored so BOTH members of a sibling
      // pair alert (the bestMatches rule).
      //
      // TRICKLE gear (the streaming serving case — hundreds of
      // registrations, not a backfill): ONE merged probe plan. The
      // match side is the variant index (batches < id) UNIONED with
      // the trigger's own cached slim frame, the probe side is the
      // broadcast slim frame, and self-pairs are filtered — so a
      // batch-batch sibling pair appears in both directions exactly
      // like the mirrored within-stage produced, while the trigger
      // pays ONE join pipeline instead of two (the within-batch
      // linkPairs machinery was pure fixed overhead at ≤ 2000 rows:
      // its explode/distinct/join stages cost more than the ~100
      // DPs they organize). Candidate completeness is the same
      // deletion-neighborhood intersection theorem; the DP verify is
      // the same thresholded levenshtein; output identity with the
      // two-stage plan is spec-pinned.
      val alertPairs: DataFrame = if (trickle) {
        val probe = slimB.select(col("key"), col("block"), col("len"),
          col("skey"))
        val ownSide = slimB.select(col("key").as("match_key"),
          col("block"), col("len").as("mlen"), col("skey"))
        val ownNames = recs.select(col("key").as("match_key"),
          col("name").as("match_name"))
        val (matchSide, matchNames) =
          if (stateExists) {
            val varstate = s.read.schema(VarStateSchema)
              .parquet(s"$path/varstate")
            (varstate.filter(col("batch") < id)
              .select(col("key").as("match_key"), col("block"),
                col("len").as("mlen"), col("skey"))
              .unionByName(ownSide),
             s.read.schema(StateSchema).parquet(s"$path/state")
              .filter(col("batch") < id)
              .select(col("key").as("match_key"),
                col("name").as("match_name"))
              .unionByName(ownNames))
          } else (ownSide, ownNames)
        matchSide.join(broadcast(probe), Seq("block", "skey"))
          .filter(abs(col("len") - col("mlen")) <= maxEdits &&
            col("key") =!= col("match_key"))
          .select(col("key"), col("match_key"))
          .distinct() // a pair collides once per shared variant
          .join(recs.select(col("key"), col("name")), "key")
          .join(matchNames, "match_key")
          .withColumn("dist",
            levenshtein(col("name"), col("match_name"), maxEdits).cast("long"))
          .filter(col("dist") >= 0 && col("dist") <= maxEdits)
          .select(col("key"), col("match_key"), col("match_name"),
            col("dist"))
      } else {
      // BACKFILL gear: the two-stage plan — the composite-blocked
      // half-pair stage within the batch (each unordered pair's DP
      // runs once, then mirrors), plus the symmetric shuffle probe
      // against the index.
      val half = linkPairs(recs, maxEdits)
      val within = half
        .select(col("key"), col("match_key"), col("match_name"), col("dist"))
        .unionByName(half.select(col("match_key").as("key"),
          col("key").as("match_key"), col("name").as("match_name"),
          col("dist")))
      val cross =
        if (!stateExists) within.limit(0)
        else {
          // the linkPairs slim-frame shape on both sides: (key,
          // block, len, hashed variant) — block rides as its own
          // join column so hash collisions stay within-block
          // overgeneration; names re-attach after the pair distinct
          val stateRecs = s.read.schema(StateSchema).parquet(s"$path/state")
            .filter(col("batch") < id)
            .select(col("key"), col("name"), col("block"))
          val varstate = s.read.schema(VarStateSchema)
            .parquet(s"$path/varstate")
          val slimState = varstate.filter(col("batch") < id)
            .select(col("key").as("match_key"), col("block"),
              col("len").as("mlen"), col("skey"))
          // the batch's own frame is the CACHED slim frame written
          // above (same rows the level read-back would produce, one
          // write→read cycle saved per trigger) — the state side's
          // neighborhoods are read, never re-exploded. A backfill
          // batch's variant frame is too wide to broadcast, so this
          // gear keeps the symmetric shuffle join.
          val slimBatch = slimB
            .select(col("key"), col("block"), col("len"), col("skey"))
          // shuffle-hash, building on the BATCH side (bounded by the
          // trigger, always the smaller frame): sort-merge would sort
          // the accumulated state index per trigger — the one
          // per-trigger cost that grows with state, and exactly the
          // sort the linkPairs self-join hint eliminates (r20)
          val joined = slimState.join(
            slimBatch.hint("shuffle_hash"), Seq("block", "skey"))
          // key =!= match_key: a key RE-REGISTERING in a later batch
          // must not match its own earlier version — the bestMatches
          // contract (key < match_key can never self-pair) applied to
          // the cross probe, and the same filter the merged trickle
          // plan carries, so the two gears stay row-identical on
          // re-registration streams (spec-pinned)
          val cand = joined
            .filter(abs(col("len") - col("mlen")) <= maxEdits &&
              col("key") =!= col("match_key"))
            .select(col("key"), col("match_key"))
            .distinct() // a pair collides once per shared variant
          cand
            .join(recs.select(col("key"), col("name")), "key")
            .join(stateRecs.select(col("key").as("match_key"),
              col("name").as("match_name")), "match_key")
            .withColumn("dist",
              levenshtein(col("name"), col("match_name"), maxEdits).cast("long"))
            .filter(col("dist") >= 0 && col("dist") <= maxEdits)
            .select(col("key"), col("match_key"), col("match_name"), col("dist"))
        }
      within.unionByName(cross)
      }
      val w = Window.partitionBy(col("key"))
        .orderBy(col("dist").asc, col("match_key").asc)
      val alerts = alertPairs
        .withColumn("rank", row_number().over(w))
        .withColumn("n_candidates",
          count(lit(1)).over(Window.partitionBy(col("key"))))
        .filter(col("rank") === 1)
        .select(col("key"), col("match_key"), col("match_name"),
          col("dist"), col("n_candidates"))
      // the varstate future must be SETTLED before this call can
      // exit on ANY path — a zombie write racing a same-JVM replay's
      // own overwrite of the identical level is the one way the
      // concurrency could corrupt the tree. `ready` in the finally
      // waits without masking an alerts failure; the commit point
      // below then surfaces the future's own outcome.
      try alerts.write.mode("overwrite").parquet(s"$path/alerts/batch=$id")
      finally scala.concurrent.Await.ready(varWrite,
        scala.concurrent.duration.Duration.Inf)
      // the commit point: everything above must be on disk first
      scala.concurrent.Await.result(varWrite,
        scala.concurrent.duration.Duration.Inf)
      // FLAT level files, block as a DATA column (r18): the probe
      // joins every block and the heal filters by batch only, so
      // block=* subdirs bought no pruning anywhere — they only
      // multiplied the per-trigger footer count (a 50-record trickle
      // level was 25 one-row files; the probe re-reads this tree
      // every trigger, and its file count IS the gate's fixed cost).
      // A trickle level is ONE file; a backfill level is
      // block-clustered and AQE-sized.
      val stateOut =
        if (trickle) recs.coalesce(1) else recs.repartition(col("block"))
      stateOut.write.mode("overwrite")
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

  // ---------------------------------------------------------------
  // f33_block_*: the composite-blocking BINDING demonstration (the
  // d09/g04 pattern — the claim "the segment keys are what makes ER
  // finish at all when the coarse blocker degenerates" needs a
  // corpus where it degenerates). blockDemoCorpus collapses the
  // coarse key to ONE fat block — the 100 TB hazard shape (a 25-value
  // blocker at corpus scale) reproduced at bench scale: the coarse
  // gear pays the full |B|²/2 pair stream, the composite gear pays
  // the linear explode + the true near-match candidates. Both gears
  // produce the IDENTICAL pair set on this corpus (spec-pinned — the
  // segment keys are loss-free by the pigeonhole, and the planted
  // siblings are the recall assertion); bench_guard enforces
  // coarse ≥ 2× fine (ratio floor, the d09 convention).
  // ---------------------------------------------------------------

  /** Planted sibling ids: source key + k·offset (disjoint from real
    * keys; two plant families under 1× and 2× the offset). */
  val DemoSiblingOffset = 1000000L

  /** Demo corpus size: big enough that the coarse single-block pair
    * stream (n²/2 ≈ 8M) dwarfs both gears' fixed costs with margin
    * over the ≥2× floor, small enough to stay clear of the d09 r10
    * spill cliff. */
  val DemoRecs = 4000

  /** Single-block derivation of the customer table: the first `nRecs`
    * customers, ONE shared block (the degenerate coarse blocker),
    * plus deterministic planted siblings — every 40th record
    * re-registered under key+offset with TWO digit substitutions
    * (the classic sibling-account typo), and every 160th under
    * key+2·offset with a leading-digit DELETE + trailing APPEND
    * (same length, every segment after the deletion SHIFTED — the
    * pair only the probe window's d ≠ 0 branches can catch). */
  def blockDemoCorpus(customer: DataFrame, nRecs: Int = DemoRecs): DataFrame = {
    val base = customer
      .select(col("c_custkey").as("key"), col("c_name").as("name"))
      .orderBy(col("key")).limit(nRecs)
      .withColumn("block", lit(0L))
    // "Customer#%09d" is 18 chars: positions 10-18 are the digits
    val subs = base.filter(pmod(col("key"), lit(40)) === 0)
      .select((col("key") + DemoSiblingOffset).as("key"),
        concat(substring(col("name"), 1, 16),
          translate(substring(col("name"), 17, 2),
            "0123456789", "1234567890")).as("name"),
        col("block"))
    val shifts = base.filter(pmod(col("key"), lit(160)) === 1)
      .select((col("key") + 2 * DemoSiblingOffset).as("key"),
        concat(substring(col("name"), 1, 9),
          substring(col("name"), 11, 8), lit("7")).as("name"),
        col("block"))
    base.unionByName(subs).unionByName(shifts)
  }

  /** Bench pair: the coarse block-only gear on the degenerate corpus
    * (pays the single-block quadratic)… */
  def f33BlockCoarse(s: SparkSession, dir: String): DataFrame =
    linkPairs(blockDemoCorpus(Tables.customer(s, dir)),
      segmentBlocked = false)

  /** …vs the composite segment-blocked gear on the identical corpus
    * (identical output, candidate generation bounded by aligned-
    * segment collisions). */
  def f33BlockFine(s: SparkSession, dir: String): DataFrame =
    linkPairs(blockDemoCorpus(Tables.customer(s, dir)),
      segmentBlocked = true)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f33_dup_accounts" -> (f33 _),
    "f33b_capped_audit" -> (f33b _),
    "f35_golden_record" -> (f35 _))

  val oracles: Map[String, String] = Map(
    "f33_dup_accounts" -> f33Sql,
    // the capped gear answers to the SAME exhaustive SQL: zero loss
    // at the gate's SFs is a hash-exact fact, not a prose claim
    "f33b_capped_audit" -> f33Sql,
    "f35_golden_record" -> f35Sql)
}
