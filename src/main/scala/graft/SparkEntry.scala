package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The composite weighted-z risk engine is the reference's
    * core capability (poller.py:333-495). */
  def entry(spark: SparkSession): DataFrame =
    operators.Fraud.f04(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Fraud.queries ++
      operators.RiskEngine.queries ++ operators.IncrementalStats.queries ++
      operators.TextOps.queries ++ operators.Dedup.queries ++
      operators.Similarity.queries ++ operators.Corpus.queries ++
      operators.Split.queries ++ operators.Redact.queries ++
      operators.Histogram.queries ++ functions.Geo.queries ++
      multimodal.Binary.queries ++
      streaming.Alerts.queries

  /** Bench-only faces (run by Bench, NOT by Verify — no oracle row):
    * the df-capped production paths of the quadratic-pair dedup
    * queries. The oracle faces above pin `maxDf = None` so DuckDB can
    * replay the exhaustive pair join, but the capped path is what runs
    * at 100 TB — these entries make BENCH time the plan that actually
    * scales, alongside its conservative exhaustive twin. */
  // named so each sorts immediately AFTER its exhaustive twin in
  // Bench's alphabetical order: the twin absorbs the query family's
  // one-time plan-codegen cost, making capped-vs-exhaustive a
  // like-for-like throughput comparison instead of a JIT-attribution
  // artifact
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_corpus_clean_capped" -> ((s, dir) =>
      operators.Corpus.clean(Tables.documents(s, dir))),
    "d02_ngram_jaccard_capped" -> ((s, dir) => operators.Dedup.d02(s, dir)),
    "d07_winnow_pairs_capped" -> ((s, dir) =>
      operators.Dedup.winnowPairs(Tables.documents(s, dir))),
    // the cap-binding demonstration pair: same query, boilerplate-heavy
    // corpus where template-shingle df >> DefaultMaxDf — exhaustive
    // pays the quadratic candidate join, capped must beat it big
    "d09_boilerplate" -> ((s, dir) =>
      operators.Dedup.d09(s, dir, maxDf = None)),
    "d09_boilerplate_capped" -> ((s, dir) =>
      operators.Dedup.d09(s, dir, maxDf = Some(operators.Dedup.DefaultMaxDf))),
    // the production dedup COMPOSITION at its production settings:
    // capped candidate pairs feeding connected-components clustering
    // (the oracle face d06 pins maxDf = None for the DuckDB replay)
    "d06_dedup_clusters_capped" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      operators.Dedup.connectedComponents(
        operators.Dedup.jaccardPairs(docs,
          maxDf = Some(operators.Dedup.DefaultMaxDf))
          .select(org.apache.spark.sql.functions.col("a"),
            org.apache.spark.sql.functions.col("b")),
        docs.select(org.apache.spark.sql.functions.col("doc_id").as("id")))
    }),
    // the streaming near-dup gate end-to-end (r10's incremental-state
    // operator, made bench-measurable): the documents table ingested
    // as 2 micro-batches through gateBatch — within-batch pair drop,
    // then the cross-batch pruned-broadcast gate + census maintenance
    // against the sealed first half. Side effects land in a fresh
    // temp dir per run; the returned frame is the accepted corpus, so
    // the count the bench takes reads the real output. The measured
    // number is per-trigger LATENCY (a dozen small jobs), not
    // throughput — it exists as a round-over-round regression signal
    // for the gate's fixed costs.
    "st02_neardup_gate_e2e" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      // pid-scoped scratch under a fixed base, wiped at face start: a
      // fresh random temp dir per run would leave an sf-scale corpus
      // copy behind every bench invocation until /tmp fills, while one
      // shared fixed dir would let two concurrent bench processes wipe
      // each other's state mid-run. Dead siblings (pids no longer
      // alive) are swept too, so leftovers are bounded by live runs.
      val base = new org.apache.hadoop.fs.Path(
        s"${System.getProperty("java.io.tmpdir")}/graft-gatebench")
      val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(base))
        fs.listStatus(base).foreach { st =>
          val alive = scala.util.Try(st.getPath.getName.toLong).toOption
            .exists(p => ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false))
          if (!alive) fs.delete(st.getPath, true)
        }
      val root = s"$base/${ProcessHandle.current().pid()}"
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val docsDir = s"$root/docs"; val fpDir = s"$root/fp"
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      (0L to 1L).foreach { b =>
        streaming.Ingest.gateBatch(
          docs.filter(pmod(col("doc_id"), lit(2)) === b), b, docsDir, fpDir)
        if (b == 0L) streaming.Ingest.maintain(s, docsDir, fpDir, belowBatch = 1L)
      }
      s.read.parquet(docsDir)
    }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Fraud.oracles ++
      operators.RiskEngine.oracles ++ operators.IncrementalStats.oracles ++
      operators.TextOps.oracles ++ operators.Dedup.oracles ++
      operators.Similarity.oracles ++ operators.Corpus.oracles ++
      operators.Split.oracles ++ operators.Redact.oracles ++
      operators.Histogram.oracles ++ functions.Geo.oracles ++
      multimodal.Binary.oracles ++
      streaming.Alerts.oracles
}
