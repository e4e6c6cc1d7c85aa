package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset assembly operators — the two steps between a cleaned corpus
  * and a training run that every large-scale pipeline needs and that
  * must be REPRODUCIBLE across reruns, engines and partitionings:
  *
  *  - [[c02]] deterministic train/validation/test splitting: the
  *    assignment is a pure function of doc_id (a 60-bit md5 prefix mod
  *    100 against fraction cutoffs), so adding machines, reordering
  *    input files or re-running months later yields the SAME split —
  *    never `rand()` and never row position, both of which silently
  *    reshuffle eval sets between runs. Narrow map, no shuffle; the
  *    per-split counts face aggregates it with one combiner-friendly
  *    shuffle on a 3-value key.
  *
  *  - [[c03]] sequence packing: assign documents to fixed token-budget
  *    training sequences (the "sample packing" step that turns ragged
  *    documents into dense batches). Greedy global packing is
  *    inherently sequential, so the scalable form shards first
  *    (pmod(doc_id, nShards) — shards pack independently and in
  *    parallel) and packs WITHIN each shard by running token cumsum
  *    over a deterministic order: a doc starts a new sequence whenever
  *    the tokens before it fill the current budget. One window shuffle
  *    on the shard key; integer arithmetic throughout, so the oracle
  *    replays it bit-for-bit. Waste (budget overshoot) is bounded by
  *    one document per boundary, the same guarantee the sequential
  *    greedy packer gives within a shard.
  *
  * Both token counts reuse t03's whitespace tokenizer
  * (TextAnalysis.wsTokenCount) — one definition of "token" across the
  * text stack.
  */
object Split {

  /** Percent of the hash space routed to train / validation (the rest
    * is test) — the conventional 80/10/10. */
  val TrainPct = 80
  val ValPct = 10

  /** Tokens per packed training sequence (c03). */
  val PackBudget = 512

  /** Shards that pack independently (c03). At 100 TB this is the
    * parallelism knob: packing is embarrassingly parallel across
    * shards and sequence ids only need to be unique per (shard, seq). */
  val PackShards = 8

  /** The ONE definition of bucket→split cutoffs, shared by the
    * per-doc (c02) and per-cluster (c23) assignments so the two can
    * never drift on fractions. */
  private def splitOf(bucket: Column): Column =
    when(bucket < TrainPct, "train")
      .when(bucket < TrainPct + ValPct, "val")
      .otherwise("test")

  /** The ONE split-hash definition: 60-bit md5 prefix of the key's
    * decimal string, mod 100. */
  private def splitBucket(s: SparkSession, key: Column): Column =
    pmod(graft.plans.GraftFunctions.md5Prefix60(s, key.cast("string")),
      lit(100))

  /** Deterministic split assignment for any (doc_id, ...) frame:
    * (doc_id, bucket, split). */
  def assignSplits(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        splitBucket(docs.sparkSession, col("doc_id")).as("bucket"))
      .withColumn("split", splitOf(col("bucket")))

  /** c02 face: the full assignment over the documents table. */
  def c02(s: SparkSession, dir: String): DataFrame =
    assignSplits(Tables.documents(s, dir))
      .select(col("doc_id"), col("bucket"), col("split"))

  /** The md5-bucket expression in oracle SQL — the ONE replay of
    * [[splitBucket]], shared by every oracle that routes on the split
    * hash (c02/c23 full assignment, c06/c07 train filters) so the two
    * engines' hash definitions cannot drift per-oracle. */
  private def bucketSqlOf(key: String): String =
    s"CAST(('0x' || substring(md5(CAST($key AS VARCHAR)), 1, 15)) AS BIGINT) % 100"

  /** The oracle replays the 60-bit md5 prefix exactly as d04b/d07 do:
    * hex-prefix → BIGINT → mod 100 → CASE cutoffs. */
  val c02Sql: String =
    s"""SELECT doc_id,
       ${bucketSqlOf("doc_id")} AS bucket,
       CASE WHEN ${bucketSqlOf("doc_id")} < $TrainPct THEN 'train'
            WHEN ${bucketSqlOf("doc_id")} < ${TrainPct + ValPct} THEN 'val'
            ELSE 'test' END AS split
       FROM documents"""

  // ---------------------------------------------------------------
  // c23: LEAKAGE-SAFE split — the eval-integrity hole in per-doc
  // splitting, closed. c02 hashes each doc_id independently, so the
  // two sides of a near-dup pair land in different splits with
  // probability 2·0.8·0.2 + … ≈ 34% — near-verbatim training copies
  // of eval documents, the contamination d08/d11 exist to DETECT,
  // manufactured by the split itself. The fix assigns whole near-dup
  // CLUSTERS (d06 connected components over the pair graph): the
  // split key is the cluster's component label (its min doc_id)
  // pushed through the SAME md5 bucket and cutoffs as c02, so
  // singleton docs — almost all of any corpus — get exactly their
  // c02 assignment, and no near-dup pair (nor transitive chain) can
  // ever straddle splits. Scale shape: the pair join is d02's
  // (capped in production), the CC loop is d06's (diameter-bounded,
  // localCheckpoint lineage cuts), the assignment a narrow map.
  // ---------------------------------------------------------------

  /** Leakage-safe assignment for any (doc_id, …) frame given its
    * near-dup pair frame (a, b): (doc_id, component, bucket, split) —
    * one split per connected component. */
  def clusterSplit(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comps = Dedup.connectedComponents(
      pairs.select(col("a"), col("b")),
      docs.select(col("doc_id").as("id")))
    comps.select(col("id").as("doc_id"), col("component"),
        splitBucket(docs.sparkSession, col("component")).as("bucket"))
      .withColumn("split", splitOf(col("bucket")))
  }

  /** c23 face: census-routed pair generation (plain on the oracle
    * corpora, so DuckDB's exhaustive replay stays exact — the d06
    * convention; callers can also pass any pair frame into
    * [[clusterSplit]] directly). */
  def c23(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // routed pair stage — plain on the oracle corpora (d06's note)
    clusterSplit(docs, Dedup.autoPairs(docs))
  }

  /** The oracle wraps d06's recursive-CTE component query as a
    * subquery and applies c02's exact hash/cutoff expressions to the
    * component label (BIGINT → VARCHAR renders identically in both
    * engines). */
  val c23Sql: String = {
    val h = bucketSqlOf("component")
    s"""SELECT doc_id, component, $h AS bucket,
       CASE WHEN $h < $TrainPct THEN 'train'
            WHEN $h < ${TrainPct + ValPct} THEN 'val'
            ELSE 'test' END AS split
       FROM (${Dedup.d06Sql}) comp"""
  }

  /** Sequence packing of any (doc_id, text) frame:
    * (doc_id, shard, seq, tokens, offset) — `seq` is the packed
    * sequence index within the shard, `offset` the doc's token start
    * inside its sequence. */
  def packSequences(docs: DataFrame, budget: Int = PackBudget,
      shards: Int = PackShards,
      tokenCount: Column =
        graft.functions.TextAnalysis.wsTokenCount(col("text"))): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(shards)).as("shard"),
        tokenCount.cast("long").as("tokens"))
      .withColumn("running", sum(col("tokens")).over(w))
      // the tokens BEFORE this doc decide its sequence; a doc longer
      // than the budget occupies its sequence(s) alone — the standard
      // pack-then-chunk convention (the chunk half lives in
      // [[packChunks]]: this face records each doc's ASSIGNMENT, that
      // one the budget-true pieces a training run consumes)
      .select(col("doc_id"), col("shard"), col("tokens"),
        // integral DIV, not `/`: long/int division in Spark routes
        // through a double, which can misassign a sequence once a
        // shard's running sum passes ~2^52 — the one non-integer step
        // in a chain documented as integer-exact
        expr(s"(running - tokens) DIV $budget").as("seq"),
        pmod(col("running") - col("tokens"), lit(budget.toLong)).as("offset"))
  }

  /** c03 face: packing assignment over the documents table. */
  def c03(s: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(s, dir))
      .select(col("doc_id"), col("shard"), col("seq"),
        col("tokens"), col("offset"))

  val c03Sql: String =
    s"""WITH t AS (
         SELECT doc_id, doc_id % $PackShards AS shard,
                CAST(${TextOps.sqlNw} AS BIGINT) AS tokens
         FROM documents),
       r AS (
         SELECT doc_id, shard, tokens,
                sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS running
         FROM t)
       SELECT doc_id, shard,
              CAST((running - tokens) // $PackBudget AS BIGINT) AS seq,
              tokens,
              CAST((running - tokens) % $PackBudget AS BIGINT) AS offset
       FROM r"""

  // ---------------------------------------------------------------
  // c19: packing-efficiency audit — the numbers a training team
  // checks before a run burns compute on padding (c03 records each
  // doc's ASSIGNMENT; c19 publishes the per-shard report card): doc
  // and token totals, sequence count, boundary-crossing docs (each
  // one pays a truncation-or-continuation cost downstream), and the
  // FILL rate tokens/(n_seqs·budget) — the fraction of the training
  // batch that is content rather than padding. Integer identities
  // off c03's running sums (n_seqs = ⌈total/budget⌉ via integral
  // DIV; a doc crosses a boundary iff offset + tokens > budget), so
  // the only division is the final rounded fill.
  // ---------------------------------------------------------------

  /** Per-shard packing report over a packSequences frame:
    * (shard, n_docs, total_tokens, n_seqs, split_docs, fill). */
  def packEfficiency(packed: DataFrame,
      budget: Int = PackBudget): DataFrame =
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_tokens"),
        // greatest(...,1) keeps the all-empty-docs shard at 1
        // sequence in BOTH engines (Spark DIV truncates toward zero,
        // DuckDB // floors — they disagree exactly at total = 0)
        expr(s"(greatest(sum(tokens), 1) - 1) DIV $budget + 1")
          .as("n_seqs"),
        sum(when(col("offset") + col("tokens") > budget, 1L)
          .otherwise(0L)).as("split_docs"))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        col("n_seqs"), col("split_docs"),
        round(col("total_tokens").cast("double") /
          (col("n_seqs") * budget), 6).as("fill"))

  def c19(s: SparkSession, dir: String): DataFrame =
    packEfficiency(packSequences(Tables.documents(s, dir)))

  /** Wraps c03's replay with the report aggregate (the d14
    * composition convention). */
  val c19Sql: String = {
    val nSeqs = s"((greatest(sum(tokens), 1) - 1) // $PackBudget + 1)"
    s"""WITH p AS ($c03Sql)
       SELECT shard, count(*) AS n_docs,
         CAST(sum(tokens) AS BIGINT) AS total_tokens,
         CAST($nSeqs AS BIGINT) AS n_seqs,
         CAST(sum(CASE WHEN "offset" + tokens > $PackBudget THEN 1 ELSE 0 END) AS BIGINT) AS split_docs,
         round(CAST(sum(tokens) AS DOUBLE) / ($nSeqs * $PackBudget), 6) AS fill
       FROM p GROUP BY 1"""
  }

  /** c03c face: packing on SUBWORD counts under the pinned WordPiece
    * vocab (plans.SubwordCount) instead of whitespace counts — the
    * tokenizer-realistic budget basis an actual training run packs
    * on (whitespace counts under-fill sequences by the subword
    * expansion factor). Identical packing math and plan shape (the
    * single shard-window shuffle); only the per-doc count expression
    * changes, and the oracle replays the greedy tokenizer itself. */
  def c03c(s: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(s, dir),
      tokenCount = graft.plans.GraftFunctions.subwordCount(s, col("text")))
      .select(col("doc_id"), col("shard"), col("seq"),
        col("tokens"), col("offset"))

  val c03cSql: String =
    s"""WITH src AS (SELECT doc_id, text FROM documents),
       ${graft.plans.SubwordCount.oracleTokensCtes},
       t AS (
         SELECT doc_id, doc_id % $PackShards AS shard, tokens
         FROM sub),
       r AS (
         SELECT doc_id, shard, tokens,
                sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS running
         FROM t)
       SELECT doc_id, shard,
              CAST((running - tokens) // $PackBudget AS BIGINT) AS seq,
              CAST(tokens AS BIGINT) AS tokens,
              CAST((running - tokens) % $PackBudget AS BIGINT) AS offset
       FROM r"""

  /** Chunked packing of any (doc_id, text) frame — the CONSUMABLE view
    * of [[packSequences]]. Under the concat-and-cut convention a
    * document may span budget boundaries (and a doc longer than the
    * budget spans several), so what a training run actually reads is
    * each document SPLIT at those boundaries: one row per
    * (doc, sequence-it-touches) with the token count and in-sequence
    * offset of that piece. Every emitted sequence then holds exactly
    * `budget` tokens except each shard's final partial one — the
    * invariant SplitSpec pins. A zero-token doc keeps one empty chunk
    * row so c03's row-per-doc accounting survives into this view.
    * Cost: the same single window shuffle as [[packSequences]] plus a
    * narrow explode bounded by ceil(tokens/budget) rows per doc —
    * still shard-parallel, still integer-exact. */
  def packChunks(docs: DataFrame, budget: Int = PackBudget,
      shards: Int = PackShards): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = budget.toLong
    docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(shards)).as("shard"),
        graft.functions.TextAnalysis.wsTokenCount(col("text"))
          .cast("long").as("tokens"))
      .withColumn("running", sum(col("tokens")).over(w))
      .withColumn("tok_start", col("running") - col("tokens"))
      .withColumn("first_seq", expr(s"tok_start DIV $b"))
      .withColumn("last_seq",
        expr(s"if(tokens = 0, first_seq, (running - 1) DIV $b)"))
      .select(col("doc_id"), col("shard"), col("tokens"), col("running"),
        col("tok_start"), col("first_seq"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq"))
      .select(col("doc_id"), col("shard"), col("seq"),
        (col("seq") - col("first_seq")).as("chunk_idx"),
        (least((col("seq") + 1) * b, col("running"))
          - greatest(col("seq") * b, col("tok_start"))).as("chunk_tokens"),
        (greatest(col("tok_start"), col("seq") * b) - col("seq") * b)
          .as("offset"))
  }

  /** c03b face: the chunk view over the documents table. */
  def c03b(s: SparkSession, dir: String): DataFrame =
    packChunks(Tables.documents(s, dir))

  /** Every derived column CAST to BIGINT — DuckDB's windowed sum (and
    * arithmetic on it) goes HUGEINT, which pandas renders float64 and
    * the driver's canonical-string hash then rejects (the c03/c06 r10
    * lesson, now a check.py-enforced rule). */
  val c03bSql: String =
    s"""WITH t AS (
         SELECT doc_id, doc_id % $PackShards AS shard,
                CAST(${TextOps.sqlNw} AS BIGINT) AS tokens
         FROM documents),
       r AS (
         SELECT doc_id, shard, tokens,
                sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS running
         FROM t),
       e AS (
         SELECT doc_id, shard, tokens, running,
                CAST(running - tokens AS BIGINT) AS tok_start,
                CAST((running - tokens) // $PackBudget AS BIGINT) AS first_seq,
                CAST(CASE WHEN tokens = 0
                          THEN (running - tokens) // $PackBudget
                          ELSE (running - 1) // $PackBudget END AS BIGINT) AS last_seq
         FROM r)
       SELECT doc_id, shard, CAST(g.seq AS BIGINT) AS seq,
              CAST(g.seq - first_seq AS BIGINT) AS chunk_idx,
              CAST(LEAST((g.seq + 1) * $PackBudget, running)
                   - GREATEST(g.seq * $PackBudget, tok_start) AS BIGINT) AS chunk_tokens,
              CAST(GREATEST(tok_start, g.seq * $PackBudget)
                   - g.seq * $PackBudget AS BIGINT) AS offset
       FROM e, LATERAL (SELECT unnest(generate_series(first_seq, last_seq)) AS seq) g"""

  // ---------------------------------------------------------------
  // c09: deterministic global sequence shuffle + training manifest —
  // the last mile from packed sequences to a training run. Training
  // order must be SHUFFLED (packing order is doc_id order — strongly
  // correlated with source/time) yet REPRODUCIBLE and partition-
  // independent: the c02 principle applied to ordering. Each packed
  // sequence (shard, seq) gets a salted 60-bit md5 hash; the hash
  // routes it to an output shard (pmod) and orders it within the
  // shard (hash asc, (shard, seq) tiebreak — collisions at 60 bits
  // are near-impossible but the order must be TOTAL to be
  // deterministic). A different salt ("epoch1", ...) yields an
  // independent reshuffle — epoch reshuffling without rand().
  //
  // Scale: sequence rows are tiny (counts, not text) — the shuffle
  // assignment is a narrow map over the packed frame; the in-shard
  // rank is a window per out_shard (parallel across shards, never a
  // global single-partition sort). writeTrainingShards materializes
  // data partitioned by out_shard, size-bounds files via the
  // existing compact machinery, and emits a per-shard manifest
  // (sequence/doc counts + token totals) a training job reads
  // instead of listing data files.
  // ---------------------------------------------------------------

  /** Output training shards (c09). */
  val ShuffleOutShards = 16

  /** Default shuffle salt; vary per epoch for independent orders. */
  val ShuffleSalt = "epoch0"

  /** Sequence-level rollup of [[packChunks]] output: one row per
    * packed sequence with its doc count and true token total. */
  def sequenceFrame(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chunk_tokens")).as("seq_tokens"))

  /** Salted-hash shuffle assignment over a (shard, seq, ...) frame:
    * + shuffle_hash, out_shard, ord (1-based rank within out_shard). */
  def shuffleSequences(seqs: DataFrame, salt: String = ShuffleSalt,
      outShards: Int = ShuffleOutShards): DataFrame = {
    require(outShards > 0)
    val s = seqs.sparkSession
    val h = graft.plans.GraftFunctions.md5Prefix60(s,
      concat_ws(":", lit(salt), col("shard"), col("seq")))
    seqs
      .withColumn("shuffle_hash", h)
      .withColumn("out_shard", pmod(col("shuffle_hash"), lit(outShards)))
      .withColumn("ord", row_number().over(
        Window.partitionBy(col("out_shard"))
          .orderBy(col("shuffle_hash"), col("shard"), col("seq")))
        .cast("long"))
  }

  /** c09 face: the full shuffle assignment over the packed documents
    * table. */
  def c09(s: SparkSession, dir: String): DataFrame =
    shuffleSequences(sequenceFrame(packChunks(Tables.documents(s, dir))))
      .select(col("shard"), col("seq"), col("n_docs"), col("seq_tokens"),
        col("shuffle_hash"), col("out_shard"), col("ord"))

  /** c09b face: the per-shard training manifest. */
  def c09b(s: SparkSession, dir: String): DataFrame =
    shuffleSequences(sequenceFrame(packChunks(Tables.documents(s, dir))))
      .groupBy(col("out_shard"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("n_docs")).as("n_docs"),
        sum(col("seq_tokens")).as("total_tokens"))

  // the oracle reuses the (already bit-exact) c03b chunk replay as a
  // nested subquery, rolls it to sequences, and replays the salted
  // md5-prefix hash the same way c02 does
  private def c09BaseSql: String =
    s"""seqs AS (
         SELECT shard, seq, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(chunk_tokens) AS BIGINT) AS seq_tokens
         FROM ($c03bSql) GROUP BY 1, 2),
       h AS (
         SELECT *,
           CAST(('0x' || substring(md5('$ShuffleSalt:' || shard || ':' || seq), 1, 15)) AS BIGINT) AS shuffle_hash
         FROM seqs)"""

  val c09Sql: String =
    s"""WITH $c09BaseSql
       SELECT shard, seq, n_docs, seq_tokens, shuffle_hash,
              shuffle_hash % $ShuffleOutShards AS out_shard,
              CAST(row_number() OVER (
                PARTITION BY shuffle_hash % $ShuffleOutShards
                ORDER BY shuffle_hash, shard, seq) AS BIGINT) AS ord
       FROM h"""

  val c09bSql: String =
    s"""WITH $c09BaseSql
       SELECT shuffle_hash % $ShuffleOutShards AS out_shard,
              CAST(count(*) AS BIGINT) AS n_seqs,
              CAST(sum(n_docs) AS BIGINT) AS n_docs,
              CAST(sum(seq_tokens) AS BIGINT) AS total_tokens
       FROM h GROUP BY 1"""

  /** Materialize a shuffled training run: sequence rows written
    * partitioned by out_shard (each shard's rows in training order),
    * size-bounded via [[graft.sources.Ingest.compact]], plus a
    * `_manifest` parquet of the per-shard counts and token totals.
    * The manifest is written LAST, from a re-read of the swapped-in
    * data — a crash mid-write leaves data without a manifest (the
    * incomplete state a training job can detect), never a manifest
    * describing missing data. */
  def writeTrainingShards(seqs: DataFrame, dir: String,
      targetBytes: Long = 128L << 20): Unit = {
    val s = seqs.sparkSession
    seqs
      .repartition(col("out_shard"))
      .sortWithinPartitions(col("out_shard"), col("ord"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("out_shard").parquet(dir)
    graft.sources.Ingest.compact(s, dir, targetBytes)
    s.read.parquet(dir)
      .groupBy(col("out_shard"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("n_docs")).as("n_docs"),
        sum(col("seq_tokens")).as("total_tokens"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/_manifest")
  }

  // ---------------------------------------------------------------
  // c04: weighted mixture / epochs — the data-mixing step: each
  // source gets a sampling weight; weight < 1 downsamples, weight > 1
  // upsamples (full copies + a deterministic fractional extra copy).
  // copies(doc) = floor(w) + [hash-bucket(doc) < frac(w)·100], with
  // the weight held as an INTEGER w×100 so both engines compute the
  // same copies with no floating point anywhere. The hash is salted
  // with the source so per-source subsampling decisions are
  // independent. Narrow map + explode — no shuffle; the mixture is
  // reproducible run-over-run like c02.
  // ---------------------------------------------------------------

  /** Demo weight schedule for the synthetic srcN sources:
    * w×100 = ((N mod 4) + 1) × 75 → 0.75, 1.50, 2.25, 3.00 — covers
    * downsampling, integer epochs and fractional epochs. */
  private def weightX100(idx: org.apache.spark.sql.Column) =
    (pmod(idx, lit(4)) + 1) * 75

  /** Mixture expansion of any (doc_id, source, ...) frame: the input
    * columns plus `copy` in 1..copies — carried columns ride along so
    * the assembly composition (c06) can thread token counts through. */
  def mixtureEpochs(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    // a source with no digit index gets the NEUTRAL weight (1 epoch)
    // in BOTH engines — without the guard, Spark's ANSI cast of the
    // empty extract threw while DuckDB's CAST('') also errored; and a
    // silent null would have dropped the source from the mixture. The
    // length guard keeps the cast total (regexp_extract returns ""
    // on no-match), mirroring the oracle's TRY_CAST.
    // the extract is capped at 9 digits so the int cast can never
    // overflow (ANSI would throw; DuckDB's TRY_CAST would NULL —
    // divergent); both engines' regexes take the same leftmost window
    val idxStr = regexp_extract(col("source"), "([0-9]{1,9})", 1)
    val idx = when(length(idxStr) > 0, idxStr).otherwise(lit(null)).cast("int")
    val w100 = coalesce(weightX100(idx), lit(100))
    val bucket = pmod(graft.plans.GraftFunctions.md5Prefix60(s,
      concat(col("source"), lit(":"), col("doc_id").cast("string"))), lit(100))
    val carried = docs.columns.map(col).toSeq
    docs.select(carried :+
        ((floor(w100 / 100) +
          when(bucket < pmod(w100, lit(100)), 1).otherwise(0))
          .cast("int").as("copies")): _*)
      .select(carried :+
        explode(when(col("copies") >= 1, sequence(lit(1), col("copies")))
          .otherwise(array().cast("array<int>"))).as("copy"): _*)
  }

  def c04(s: SparkSession, dir: String): DataFrame =
    mixtureEpochs(Tables.documents(s, dir).select(col("doc_id"), col("source")))

  val c04Sql: String =
    """WITH m AS (
         SELECT doc_id, source,
                COALESCE(((TRY_CAST(regexp_extract(source, '([0-9]{1,9})', 1) AS INT) % 4) + 1) * 75, 100) AS w100,
                CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
         FROM documents),
       c AS (
         SELECT doc_id, source,
                CAST(w100 // 100 + (CASE WHEN bucket < w100 % 100 THEN 1 ELSE 0 END) AS INT) AS copies
         FROM m)
       SELECT doc_id, source, CAST(g.copy AS INT) AS copy
       FROM c, LATERAL (SELECT unnest(generate_series(1, copies)) AS copy) g"""

  // ---------------------------------------------------------------
  // c06: the ASSEMBLY COMPOSITION — scrub → split(train) → mixture →
  // pack as ONE declarative plan (the c01 pattern applied to dataset
  // assembly): PII-redact the corpus, keep the train split, expand to
  // mixture epochs, pack the epoch stream into token-budget
  // sequences. Token counts are taken on the REDACTED text (what a
  // training run would actually see), the packing order is
  // (doc_id, copy) within the shard so epochs of one doc stay
  // adjacent, and the whole chain is still: narrow maps + one window
  // shuffle. Oracle replays every stage bit-for-bit.
  // ---------------------------------------------------------------

  def c06(s: SparkSession, dir: String): DataFrame = {
    val (_, _, _, red) = Redact.redactions(col("text"))
    val scrubbed = Redact.plantedDocs(s, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.TextAnalysis.wsTokenCount(red)
          .cast("long").as("tokens"))
    val train = scrubbed.filter(splitBucket(s, col("doc_id")) < TrainPct)
    val mixed = mixtureEpochs(train)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("doc_id"), col("copy"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mixed
      .withColumn("shard", pmod(col("doc_id"), lit(PackShards)))
      .withColumn("running", sum(col("tokens")).over(w))
      .select(col("doc_id"), col("copy"), col("shard"), col("tokens"),
        expr(s"(running - tokens) DIV $PackBudget").as("seq"),
        pmod(col("running") - col("tokens"), lit(PackBudget.toLong)).as("offset"))
  }

  val c06Sql: String = {
    import Redact.{EmailPattern, Ipv4Pattern, PhonePattern}
    s"""WITH planted AS (
         SELECT doc_id, source,
                CASE WHEN doc_id % 5 = 0
                     THEN text || ' contact user' || doc_id || '@example.com or +1 555 010' || doc_id || ' from host 10.0.' || (doc_id % 250) || '.7'
                     ELSE text END AS text0
         FROM documents),
       scrub AS (
         SELECT doc_id, source,
                regexp_replace(regexp_replace(regexp_replace(text0, '$EmailPattern', '<EMAIL>', 'g'), '$Ipv4Pattern', '<IP>', 'g'), '$PhonePattern', '<PHONE>', 'g') AS text
         FROM planted),
       tok AS (
         SELECT doc_id, source, CAST(${TextOps.sqlNw} AS BIGINT) AS tokens
         FROM scrub),
       train AS (
         SELECT * FROM tok
         WHERE ${bucketSqlOf("doc_id")} < $TrainPct),
       m AS (
         SELECT doc_id, source, tokens,
                COALESCE(((TRY_CAST(regexp_extract(source, '([0-9]{1,9})', 1) AS INT) % 4) + 1) * 75, 100) AS w100,
                CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
         FROM train),
       mixed AS (
         SELECT doc_id, tokens, CAST(g.copy AS INT) AS copy
         FROM (SELECT doc_id, tokens,
                      CAST(w100 // 100 + (CASE WHEN bucket < w100 % 100 THEN 1 ELSE 0 END) AS INT) AS copies
               FROM m) c,
              LATERAL (SELECT unnest(generate_series(1, copies)) AS copy) g),
       r AS (
         SELECT doc_id, copy, doc_id % $PackShards AS shard, tokens,
                sum(tokens) OVER (PARTITION BY doc_id % $PackShards
                                  ORDER BY doc_id, copy
                                  ROWS UNBOUNDED PRECEDING) AS running
         FROM mixed)
       SELECT doc_id, copy, shard, tokens,
              CAST((running - tokens) // $PackBudget AS BIGINT) AS seq,
              CAST((running - tokens) % $PackBudget AS BIGINT) AS offset
       FROM r"""
  }

  // ---------------------------------------------------------------
  // c07: the assembly chain WITH eval-set decontamination — the full
  // compliance pipeline a shipping training corpus runs:
  // scrub → decontaminate → split(train) → mixture → pack. c06 packs
  // every train doc; the real chain first carves out the eval/
  // benchmark set (here d08's deterministic doc_id % 7 == 0 split of
  // the scrubbed corpus) and DROPS every remaining doc sharing
  // >= WinnowMinShared winnow fingerprints with any eval doc
  // (near-verbatim eval material in the training set inflates
  // reported scores). Decontamination runs on the SCRUBBED text —
  // what is actually retained — between scrub and split. Cost on top
  // of c06: the two winnow-fp derivations and one fp equi-join
  // (d08's shape — never a cross join) plus an anti-join; the
  // packing stays one window shuffle. The corpus's planted near-dup
  // pairs straddle the % 7 split (5 in-train contaminated docs at
  // BOTH sf0.001 and sf0.01 — checked against DuckDB), so the
  // oracle exercises real drops at spec and driver scale.
  // ---------------------------------------------------------------

  def c07(s: SparkSession, dir: String): DataFrame = {
    val (_, _, _, red) = Redact.redactions(col("text"))
    // ONE redaction pass feeds fingerprints AND token counts — cached,
    // or the regex-heavy scrub tree re-runs per consumer
    val scrubbed = Redact.plantedDocs(s, dir)
      .select(col("doc_id"), col("source"), red.as("text"))
      .transform(graft.CacheRegistry.register)
    val isBench = pmod(col("doc_id"), lit(Dedup.BenchIdMod)) === 0
    val corpus = scrubbed.filter(!isBench)
    val bench = scrubbed.filter(isBench).select(col("doc_id"), col("text"))
    val contaminated = Dedup.decontaminate(
        corpus.select(col("doc_id"), col("text")), bench, maxDf = None)
      .select(col("doc_id")).distinct()
    val clean = corpus.join(contaminated, Seq("doc_id"), "left_anti")
    val toks = clean.select(col("doc_id"), col("source"),
      graft.functions.TextAnalysis.wsTokenCount(col("text"))
        .cast("long").as("tokens"))
    val train = toks.filter(splitBucket(s, col("doc_id")) < TrainPct)
    val mixed = mixtureEpochs(train)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("doc_id"), col("copy"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mixed
      .withColumn("shard", pmod(col("doc_id"), lit(PackShards)))
      .withColumn("running", sum(col("tokens")).over(w))
      .select(col("doc_id"), col("copy"), col("shard"), col("tokens"),
        expr(s"(running - tokens) DIV $PackBudget").as("seq"),
        pmod(col("running") - col("tokens"), lit(PackBudget.toLong)).as("offset"))
  }

  val c07Sql: String = {
    import Redact.{EmailPattern, Ipv4Pattern, PhonePattern}
    import graft.operators.{Dedup => D}
    s"""WITH planted AS (
         SELECT doc_id, source,
                CASE WHEN doc_id % 5 = 0
                     THEN text || ' contact user' || doc_id || '@example.com or +1 555 010' || doc_id || ' from host 10.0.' || (doc_id % 250) || '.7'
                     ELSE text END AS text0
         FROM documents),
       scrub AS (
         SELECT doc_id, source,
                regexp_replace(regexp_replace(regexp_replace(text0, '$EmailPattern', '<EMAIL>', 'g'), '$Ipv4Pattern', '<IP>', 'g'), '$PhonePattern', '<PHONE>', 'g') AS text
         FROM planted),
       ${D.winnowFpsSqlFrom("scrub")},
       contaminated AS (
         SELECT DISTINCT doc_id FROM (
           SELECT c.doc_id
           FROM fps c JOIN fps b ON c.fp = b.fp
           WHERE c.doc_id % ${D.BenchIdMod} <> 0 AND b.doc_id % ${D.BenchIdMod} = 0
           GROUP BY c.doc_id, b.doc_id
           HAVING count(*) >= ${D.WinnowMinShared})),
       tok AS (
         SELECT doc_id, source, CAST(${TextOps.sqlNw} AS BIGINT) AS tokens
         FROM scrub
         WHERE doc_id % ${D.BenchIdMod} <> 0
           AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
       train AS (
         SELECT * FROM tok
         WHERE ${bucketSqlOf("doc_id")} < $TrainPct),
       m AS (
         SELECT doc_id, source, tokens,
                COALESCE(((TRY_CAST(regexp_extract(source, '([0-9]{1,9})', 1) AS INT) % 4) + 1) * 75, 100) AS w100,
                CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
         FROM train),
       mixed AS (
         SELECT doc_id, tokens, CAST(g.copy AS INT) AS copy
         FROM (SELECT doc_id, tokens,
                      CAST(w100 // 100 + (CASE WHEN bucket < w100 % 100 THEN 1 ELSE 0 END) AS INT) AS copies
               FROM m) c,
              LATERAL (SELECT unnest(generate_series(1, copies)) AS copy) g),
       r AS (
         SELECT doc_id, copy, doc_id % $PackShards AS shard, tokens,
                sum(tokens) OVER (PARTITION BY doc_id % $PackShards
                                  ORDER BY doc_id, copy
                                  ROWS UNBOUNDED PRECEDING) AS running
         FROM mixed)
       SELECT doc_id, copy, shard, tokens,
              CAST((running - tokens) // $PackBudget AS BIGINT) AS seq,
              CAST((running - tokens) % $PackBudget AS BIGINT) AS offset
       FROM r"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c02_train_split" -> (c02 _),
    "c23_cluster_split" -> (c23 _),
    "c03_pack_sequences" -> (c03 _),
    "c19_pack_efficiency" -> (c19 _),
    "c03b_pack_chunks" -> (c03b _),
    "c03c_pack_subword" -> (c03c _),
    "c09_seq_shuffle" -> (c09 _),
    "c09b_shard_manifest" -> (c09b _),
    "c04_mixture_epochs" -> (c04 _),
    "c06_assemble" -> (c06 _),
    "c07_assemble_decontaminated" -> (c07 _))

  val oracles: Map[String, String] = Map(
    "c02_train_split" -> c02Sql,
    "c23_cluster_split" -> c23Sql,
    "c03_pack_sequences" -> c03Sql,
    "c19_pack_efficiency" -> c19Sql,
    "c03b_pack_chunks" -> c03bSql,
    "c03c_pack_subword" -> c03cSql,
    "c09_seq_shuffle" -> c09Sql,
    "c09b_shard_manifest" -> c09bSql,
    "c04_mixture_epochs" -> c04Sql,
    "c06_assemble" -> c06Sql,
    "c07_assemble_decontaminated" -> c07Sql)
}
