package graft.streaming

import graft.functions.TextAnalysis
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Checkpointed incremental collection — the Spark analog of the
  * reference's resumable collector (analist_poller.py:206
  * save_checkpoint: atomic temp-file writes every N pages so a crash
  * resumes without data loss or duplicates).
  *
  * In Structured Streaming both halves are engine guarantees instead
  * of hand-rolled file renames:
  *   - the `checkpointLocation` WAL records which input files/offsets
  *     each micro-batch committed (the "checkpoint" itself), and
  *   - the file sink's transaction log makes output exactly-once, so
  *     killing the process mid-batch and calling [[resume]] again
  *     continues from the last committed batch — the atomic-rename
  *     property, but per-batch and distributed.
  *
  * Dedup state (canonical-fingerprint, [[dedupStream]]) lives in the
  * same checkpoint, so a duplicate arriving after a restart is still
  * dropped as long as it lands within the watermark. State is bounded
  * by the watermark horizon — O(docs per watermark window), not
  * O(corpus) — which is what survives an unbounded stream.
  */
object Ingest {

  /** Exact streaming dedup on the canonical text fingerprint (same
    * canonicalization as the batch d01 operator, so batch backfill and
    * streaming ingest drop the same duplicates). */
  def dedupStream(input: DataFrame, tsCol: String = "ts",
      textCol: String = "text", watermark: String = "10 minutes"): DataFrame =
    input
      .withColumn("fp", graft.plans.GraftFunctions.fingerprint(
        input.sparkSession, col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Start — or resume from `checkpointDir`, if it exists — the
    * deduplicated NDJSON→parquet ingestion. Calling this again after a
    * crash or stop with the same three directories is the reference's
    * resume-on-failure loop: already-committed batches are skipped,
    * the in-flight one replays, output stays exactly-once. */
  def resume(spark: SparkSession, inDir: String, schema: StructType,
      outDir: String, checkpointDir: String,
      tsCol: String = "ts", textCol: String = "text",
      watermark: String = "10 minutes"): StreamingQuery =
    dedupStream(spark.readStream.schema(schema).json(inDir),
        tsCol, textCol, watermark)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  // ---------------------------------------------------------------
  // Streaming NEAR-dup gate — the missing composition between the
  // batch dedup stack (d07 winnowing) and a continuously-ingesting
  // pipeline. Exact dedup ([[dedupStream]]) only drops bit-identical
  // re-crawls; a near-duplicate arriving a day later sails through.
  // This gate runs the c01-style cascade per micro-batch:
  //   1. within-batch near-dup pairs via Dedup.winnowPairs (capped
  //      production path) — drop the higher doc_id of each pair;
  //   2. cross-batch gate: a batch doc sharing >= minShared winnow
  //      fingerprints with ANY already-accepted doc is dropped. The
  //      sealed-corpus state is the accepted docs' FINGERPRINTS
  //      (doc_id, fp), persisted per batch — never re-derived from
  //      text, so each micro-batch pays one fp equi-join against
  //      state, not a corpus re-scan. At 100 TB that state is what
  //      you bucket on fp (sources.Ingest.writeBucketed) and compact.
  //   3. survivors' docs and fingerprints land in batch=<id>
  //      subdirectories via OVERWRITE — a replayed micro-batch
  //      rewrites exactly the same directories from exactly the same
  //      corpus view (only batches < its own id), so crash-replay is
  //      idempotent: no duplicates, no self-matching.
  // ---------------------------------------------------------------

  /** One micro-batch of the near-dup gate (the foreachBatch body —
    * public so a replay is testable as a plain call). Reads corpus
    * fingerprint state from `fpDir` (batches BELOW `batchId` only),
    * writes survivors to `docsDir/batch=<id>` and their fingerprints
    * to `fpDir/batch=<id>`. Returns the survivor count. */
  def gateBatch(batch: DataFrame, batchId: Long, docsDir: String,
      fpDir: String, minShared: Int = graft.operators.Dedup.WinnowMinShared,
      maxDf: Option[Int] = Some(graft.operators.Dedup.DefaultMaxDf)): Long = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    // "batch" is this sink's partition-directory column; an input
    // column of the same name would silently shadow the corpus-view
    // filter on re-read
    require(!batch.columns.contains("batch"),
      "near-dup gate input must not carry a 'batch' column (reserved for the sink layout)")
    try {
      val docs = batch.select(col("doc_id"), col("text"))
        .transform(graft.CacheRegistry.register)
      // 1. within-batch near-dups: keep the lower doc_id of each pair
      // (same cap as the cross gate — one knob governs both joins)
      val innerDrops = Dedup.winnowPairs(docs, minShared, maxDf)
        .select(col("b").as("doc_id")).distinct()
      val kept = docs.join(innerDrops, Seq("doc_id"), "left_anti")
      val keptFps = Dedup.winnowFps(kept)
        .transform(graft.CacheRegistry.register)
      // 2. cross-batch gate against the sealed fingerprint state.
      // Restricting to batch < batchId is what makes replay
      // idempotent: the rerun sees the same corpus as the first run,
      // not its own previous output.
      val root = new org.apache.hadoop.fs.Path(fpDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the cross join is fp-keyed, so a boilerplate fingerprint
      // present in many corpus docs would contribute (corpus df ×
      // batch df) rows — the same quadratic hazard the batch
      // operators cap. Drop above-cap corpus fingerprints from the
      // GATE join (d02/d07's documented loss mode: a doc near-dup
      // only through ultra-common fingerprints passes). At scale the
      // df would be maintained incrementally with the state; one agg
      // per micro-batch is honest at this state size.
      val sealedFps =
        if (!fs.exists(root) || fs.listStatus(root).isEmpty) None
        else {
          val all = spark.read.parquet(fpDir)
            .filter(col("batch") < batchId)
            .select(col("doc_id").as("corpus_id"), col("fp"))
          Some(maxDf.fold(all) { k =>
            val hot = all.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
              .filter(col("_df") > k).select(col("fp"))
            all.join(hot, Seq("fp"), "left_anti")
          })
        }
      // cached: consumed by BOTH the survivors write and the survFps
      // write — uncached, the sealed-state scan + fp join would run
      // twice per trigger (the state is the thing that grows for the
      // stream's lifetime; pay its join once)
      val crossDrops = sealedFps match {
        case None => None
        case Some(corpus) => Some(keptFps.join(corpus, Seq("fp"))
          .groupBy(col("corpus_id"), col("doc_id"))
          .agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= minShared)
          .select(col("doc_id")).distinct()
          .transform(graft.CacheRegistry.register))
      }
      val survivors = crossDrops.fold(kept)(d => kept.join(d, Seq("doc_id"), "left_anti"))
        .transform(graft.CacheRegistry.register)
      // 3. idempotent per-batch writes: overwrite, never append
      survivors.write.mode(SaveMode.Overwrite)
        .parquet(s"$docsDir/batch=$batchId")
      val survFps = crossDrops.fold(keptFps)(d =>
        keptFps.join(d, Seq("doc_id"), "left_anti"))
      survFps.write.mode(SaveMode.Overwrite)
        .parquet(s"$fpDir/batch=$batchId")
      survivors.count()
    } finally
      // a micro-batch IS a query-face boundary for the cache registry:
      // leaving the pins would accumulate one shingle/fp cache per
      // trigger for the stream's lifetime
      graft.CacheRegistry.unpersistAll()
  }

  /** Start — or resume — the near-dup-gated NDJSON ingestion:
    * exact dups are assumed handled upstream ([[dedupStream]] /
    * batch d01); this gate drops near-duplicates within each
    * micro-batch and against everything accepted before it. */
  def resumeNearDupGated(spark: SparkSession, inDir: String,
      schema: StructType, docsDir: String, fpDir: String,
      checkpointDir: String,
      minShared: Int = graft.operators.Dedup.WinnowMinShared,
      maxDf: Option[Int] = Some(graft.operators.Dedup.DefaultMaxDf)): StreamingQuery =
    spark.readStream.schema(schema).json(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch, batchId, docsDir, fpDir, minShared, maxDf); ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
