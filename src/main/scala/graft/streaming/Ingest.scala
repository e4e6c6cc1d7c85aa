package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.Path

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
      textCol: String = "text", watermark: String = "10 minutes"): DataFrame = {
    // same reserved-name convention as the gate's "batch" guard: a
    // user column named fp would be silently overwritten by the
    // derived fingerprint AND persisted under the user's name
    require(!input.columns.contains("fp"),
      "dedupStream input must not carry an 'fp' column (reserved for the derived fingerprint)")
    input
      .withColumn("fp", graft.plans.GraftFunctions.fingerprint(
        input.sparkSession, col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

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
  //      fingerprints with ANY already-accepted doc is dropped.
  //   3. survivors' docs and fingerprints land in batch=<id>
  //      subdirectories via OVERWRITE — a replayed micro-batch
  //      rewrites exactly the same directories from exactly the same
  //      corpus view (only batches < its own id), so crash-replay is
  //      idempotent: no duplicates, no self-matching.
  //
  // State layout — designed so PER-TRIGGER WORK IS INDEPENDENT OF
  // CORPUS SIZE (O(batch + matched state)), the property an
  // unbounded-ingest gate lives or dies by:
  //
  //   fpDir/batch=<id>/fpb=<b>/          accepted (doc_id, fp) rows,
  //     sub-partitioned by the fingerprint bucket fpb =
  //     pmod(hash(fp), FpBuckets). The cross-batch gate collects the
  //     micro-batch's <= FpBuckets distinct bucket ids (a bounded
  //     driver-side set, NOT data) and partition-PRUNES the state
  //     scan to matched buckets, then joins with the batch side
  //     BROADCAST — no exchange, no sort, no unmatched-bucket bytes
  //     on the state side, ever. This beats a metastore-bucketed
  //     table (sources.Ingest.writeBucketed) for stream state: the
  //     in-memory catalog loses bucket specs across JVM restarts
  //     (silently reintroducing the exchange on resume), while fpb
  //     directories are self-describing to any fresh reader.
  //
  //   fpDir/_census/delta/batch=<id>/    per-batch (fp, df) counts of
  //     that batch's accepted fingerprints — the document-frequency
  //     census maintained INCREMENTALLY instead of re-aggregating the
  //     whole (doc_id, fp) corpus every trigger. Underscore-prefixed,
  //     so corpus reads of fpDir never see it.
  //
  //   fpDir/_census/merged/fpb=<b>/      compact-and-swap merge of
  //     all deltas <= the id recorded in merged/_max (written inside
  //     the directory BEFORE the atomic swap, so the merge and its
  //     frontier are never observable out of sync). One pre-aggregated
  //     row per fp; each fpb's file is sorted by df DESCENDING so the
  //     already-hot probe (df > k) skips cold row groups via parquet
  //     min/max stats. Hot-fingerprint detection per trigger is then
  //     O(hot + recent deltas): already-hot merged rows + merged rows
  //     in the deltas' buckets (partition-pruned point lookups) +
  //     delta-only fps — never a corpus-sized aggregation.
  // ---------------------------------------------------------------

  /** Fingerprint-bucket fanout of the gate state. 64 keeps every
    * bucket a handful of files at test scale; at 100 TB this is the
    * knob you raise (bucket count scales with state size, pruning
    * ratio scales with batch-to-bucket coverage). */
  val FpBuckets = 64

  /** Census deltas are folded into `merged` every this many batches
    * (from inside [[gateBatch]], which may only compact batches below
    * its own id — those are the ones foreachBatch has committed). */
  val CensusCompactInterval = 16

  private def fpBucket(c: Column): Column = pmod(hash(c), lit(FpBuckets))

  private def censusDir(fpDir: String) = s"$fpDir/_census"

  private def hadoopFs(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Ids of state batches present under `fpDir` (directory names, no
    * data read). */
  private def stateBatchIds(spark: SparkSession, fpDir: String): Seq[Long] = {
    val (fs, root) = hadoopFs(spark, fpDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .flatMap(n => scala.util.Try(n.stripPrefix("batch=").toLong).toOption)
  }

  private def censusDeltaSchema: StructType = StructType(Seq(
    StructField("fp", LongType), StructField("df", LongType),
    StructField("batch", LongType)))

  private def censusMergedSchema: StructType = StructType(Seq(
    StructField("fp", LongType), StructField("df", LongType),
    StructField("fpb", IntegerType)))

  /** Crash recovery for the census compact-and-swap. The swap is two
    * renames (merged→trash, tmp→merged); a crash between them leaves
    * merged ABSENT while the complete new merge sits in tmp (its
    * `_max` marker is written only after the data, so tmp-with-_max
    * means fully written) and the old merged sits in trash. Every
    * census reader/writer calls this first: it completes an
    * interrupted swap (rename tmp→merged), discards a stale tmp from
    * a crash BEFORE the swap-out (merged still present — the deltas
    * were not yet deleted, so the next compaction simply re-merges),
    * and clears leftover trash. After this runs, the census is always
    * either the pre-compaction or the post-compaction state — never
    * lost. */
  private def recoverCensus(spark: SparkSession, fpDir: String): Unit = {
    val cDir = censusDir(fpDir)
    val (fs, _) = hadoopFs(spark, cDir)
    val merged = new Path(s"$cDir/merged")
    val tmp = new Path(s"$cDir/.merged._compact_tmp")
    val trash = new Path(s"$cDir/.merged._compact_old")
    if (fs.exists(tmp)) {
      val tmpComplete = fs.exists(new Path(tmp, "_max"))
      if (!fs.exists(merged) && tmpComplete)
        require(fs.rename(tmp, merged),
          s"recoverCensus: could not complete interrupted swap of $tmp")
      else fs.delete(tmp, true)
    }
    fs.delete(trash, true)
  }

  /** The merged census's frontier: highest batch id folded into
    * `merged`, or -1 when no merge has happened. Lives INSIDE the
    * merged directory so the atomic swap updates data and frontier
    * together. */
  private def mergedMaxBatch(spark: SparkSession, fpDir: String): Long = {
    val (fs, _) = hadoopFs(spark, fpDir)
    val marker = new Path(s"${censusDir(fpDir)}/merged/_max")
    if (!fs.exists(marker)) -1L
    else scala.util.Using.resource(fs.open(marker)) { in =>
      new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    }
  }

  /** The accepted-corpus fingerprint view a gate for batch
    * `belowBatch` must see: all state rows of earlier batches,
    * optionally partition-pruned to the given fingerprint buckets
    * (the scan's PartitionFilters, not a post-read filter). */
  def corpusView(spark: SparkSession, fpDir: String, belowBatch: Long,
      docIdType: DataType, buckets: Option[Seq[Int]] = None): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", docIdType), StructField("fp", LongType),
      StructField("batch", LongType), StructField("fpb", IntegerType)))
    val base = spark.read.schema(schema).parquet(fpDir)
      .filter(col("batch") < belowBatch)
    buckets.fold(base)(bs => base.filter(col("fpb").isin(bs: _*)))
      .select(col("doc_id").as("corpus_id"), col("fp"))
  }

  /** Fingerprints whose accepted-corpus document frequency over
    * batches < `belowBatch` exceeds `k` — from the CENSUS, never from
    * the per-doc state. Merged rows answer with one pushed-down scan
    * (df > k, row-group-skippable); delta rows are re-aggregated only
    * over the uncompacted recent batches; fps that may have CROSSED
    * the threshold since the last compaction are resolved by
    * partition-pruned point lookups of the merged census in the
    * deltas' buckets. None = no census yet (no earlier batch). */
  def hotFps(spark: SparkSession, fpDir: String, belowBatch: Long,
      k: Int): Option[DataFrame] = {
    recoverCensus(spark, fpDir)
    val (fs, _) = hadoopFs(spark, fpDir)
    val mergedMax = mergedMaxBatch(spark, fpDir)
    require(mergedMax < belowBatch,
      s"census already compacted through batch $mergedMax but batch $belowBatch is " +
        "being gated/replayed — compaction must only cover batches below the " +
        "stream's committed frontier")
    val mergedPath = new Path(s"${censusDir(fpDir)}/merged")
    val merged =
      if (!fs.exists(mergedPath)) None
      else Some(spark.read.schema(censusMergedSchema)
        .parquet(mergedPath.toString))
    val deltaPath = new Path(s"${censusDir(fpDir)}/delta")
    val deltas =
      if (!fs.exists(deltaPath) || fs.listStatus(deltaPath).isEmpty) None
      else Some(spark.read.schema(censusDeltaSchema)
        .parquet(deltaPath.toString)
        .filter(col("batch") > mergedMax && col("batch") < belowBatch))
    (merged, deltas) match {
      case (None, None) => None
      case (Some(m), None) =>
        Some(m.filter(col("df") > k).select(col("fp")))
      case (None, Some(d)) =>
        Some(d.groupBy(col("fp")).agg(sum(col("df")).as("ddf"))
          .filter(col("ddf") > k).select(col("fp")))
      case (Some(m), Some(d)) =>
        // recent-delta aggregate: O(uncompacted batches), cached
        // because it feeds both the crossed-threshold probe and the
        // delta-only branch
        val dAgg = d.groupBy(col("fp")).agg(sum(col("df")).as("ddf"))
          .transform(graft.CacheRegistry.register)
        val dBuckets = dAgg.select(fpBucket(col("fp")).as("fpb"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val alreadyHot = m.filter(col("df") > k).select(col("fp"))
        if (dBuckets.isEmpty) Some(alreadyHot)
        else {
          val crossed = m.filter(col("fpb").isin(dBuckets: _*))
            .join(broadcast(dAgg), Seq("fp"))
            .filter(col("df") + col("ddf") > k).select(col("fp"))
          // delta-only fps (not in merged): ddf alone decides; a fp
          // ALSO present in merged lands in `crossed` too — the final
          // distinct() collapses it
          val newlyHot = dAgg.filter(col("ddf") > k).select(col("fp"))
          Some(alreadyHot.union(crossed).union(newlyHot).distinct())
        }
    }
  }

  /** The cross-batch drop set for one micro-batch: doc_ids of
    * `keptFps` (the batch survivors' (doc_id, fp) fingerprints)
    * sharing >= `minShared` non-hot fingerprints with any accepted
    * corpus doc. Exposed separately from [[gateBatch]] so its plan
    * shape — broadcast batch side, partition-pruned exchange-free
    * state side — is assertable in specs. None = no drops possible
    * (no earlier state, or nothing to probe after the hot filter). */
  def crossGateDrops(keptFps: DataFrame, fpDir: String, batchId: Long,
      docIdType: DataType, minShared: Int,
      maxDf: Option[Int]): Option[DataFrame] = {
    val spark = keptFps.sparkSession
    val earlier = stateBatchIds(spark, fpDir).filter(_ < batchId)
    if (earlier.isEmpty) return None
    // fail fast on a state layout without fpb bucketing (pre-bucketed
    // or foreign writes): the schema'd read would fill fpb with null
    // and the bucket filter would silently drop EVERY corpus row —
    // the gate would accept all near-duplicates with no error. EVERY
    // earlier batch is checked (one listStatus per sealed batch, the
    // same metadata the scan's partition discovery touches anyway):
    // a single flat batch among bucketed ones would otherwise be
    // silently excluded. Underscore AND dot prefixes are ignored —
    // parquet readers skip both, and compaction leaves benign
    // dot-prefixed tmp/trash dirs a crash away at any time.
    locally {
      val (fs, _) = hadoopFs(spark, fpDir)
      earlier.foreach { id =>
        val all = fs.listStatus(new Path(s"$fpDir/batch=$id"))
        // a dot-prefixed compaction TRASH dir means a crashed swap may
        // hold a bucket's only copy — parquet readers would silently
        // skip it, so gating must stop until maintain() recovers it.
        // Stale _compact_tmp leftovers are benign (source intact).
        require(!all.exists(_.getPath.getName.endsWith("._compact_old")),
          s"state batch=$id under $fpDir holds an interrupted compaction swap " +
            "(._compact_old) — run maintain() to recover before gating")
        val children = all.filterNot { st =>
          val n = st.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        require(children.isEmpty || children.forall(st =>
            st.isDirectory && st.getPath.getName.startsWith("fpb=")),
          s"fingerprint state batch=$id under $fpDir is not fpb-bucketed " +
            "(flat per-batch files) — rebuild the state with this layout")
      }
    }
    // The hot-df cap guards the fp equi-join's fanout: a boilerplate
    // fingerprint in df corpus docs would contribute (df × batch
    // occurrences) join rows. Dropping above-cap fps from the BATCH
    // side is equivalent to dropping them from the corpus side (a
    // match needs the fp on both sides) and filters the small frame.
    val hot = maxDf.flatMap(k => hotFps(spark, fpDir, batchId, k))
    // gateBatch writes a census delta with every state batch, so a
    // defined cap with existing state but NO census is corruption —
    // running uncapped would both lose the fanout guard and change
    // drop decisions (hot fps would count toward shared) silently
    require(maxDf.isEmpty || hot.isDefined,
      s"df cap $maxDf configured but no census exists under $fpDir " +
        "despite sealed state batches — census lost or foreign state")
    val gateFps = hot.fold(keptFps)(h =>
        keptFps.join(broadcast(h), Seq("fp"), "left_anti"))
      .transform(graft.CacheRegistry.register)
    // bounded by construction: at most FpBuckets distinct values
    val buckets = gateFps.select(fpBucket(col("fp")).as("fpb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (buckets.isEmpty) None
    else {
      val corpus = corpusView(spark, fpDir, batchId, docIdType, Some(buckets))
      // batch side is micro-batch-sized -> broadcast; the state scan
      // streams matched buckets straight into the hash probe
      Some(corpus.join(broadcast(gateFps), Seq("fp"))
        .groupBy(col("corpus_id"), col("doc_id"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
        .select(col("doc_id")).distinct()
        .transform(graft.CacheRegistry.register))
    }
  }

  /** One micro-batch of the near-dup gate (the foreachBatch body —
    * public so a replay is testable as a plain call). Reads corpus
    * fingerprint state from `fpDir` (batches BELOW `batchId` only),
    * writes survivors to `docsDir/batch=<id>`, their fingerprints to
    * `fpDir/batch=<id>` (fpb-bucketed) and the batch's df census
    * delta to `fpDir/_census/delta/batch=<id>`. Returns the survivor
    * count.
    *
    * doc_id must be GLOBALLY UNIQUE for the stream's lifetime (the
    * upstream collector's contract — reference item ids): the gate
    * keys corpus state by doc_id alone, so a reused id would merge
    * two documents' fingerprints under one corpus_id in the shared
    * count and could inflate it past minShared. */
  def gateBatch(batch: DataFrame, batchId: Long, docsDir: String,
      fpDir: String, minShared: Int = graft.operators.Dedup.WinnowMinShared,
      maxDf: Option[Int] = Some(graft.operators.Dedup.DefaultMaxDf)): Long = {
    import graft.operators.Dedup
    // "batch" is this sink's partition-directory column; an input
    // column of the same name would silently shadow the corpus-view
    // filter on re-read
    require(!batch.columns.contains("batch"),
      "near-dup gate input must not carry a 'batch' column (reserved for the sink layout)")
    // a cache SCOPE, not a global unpersistAll: a trigger boundary must
    // release exactly the caches this call pinned — clearing the whole
    // registry from a stream-execution thread would clobber caches a
    // concurrent stream or host query is mid-flight on
    graft.CacheRegistry.scoped {
      // ALL input columns survive the gate (metadata — timestamps,
      // urls — rides along to the sink); the fingerprint pipeline runs
      // on the (doc_id, text) projection only
      val docs = batch.transform(graft.CacheRegistry.register)
      // ONE fingerprint derivation feeds everything in the trigger:
      // the within-batch pair join, the cross-batch gate probe, and
      // the state/census writes all consume this cached fp-partitioned
      // frame (deriving keptFps via winnowFps(kept) instead re-ran the
      // gram/window pipeline a second time per batch)
      val fps = Dedup.winnowFps(docs.select(col("doc_id"), col("text")))
        .repartition(col("fp"))
        .transform(graft.CacheRegistry.register)
      // 1. within-batch near-dups: keep the lower doc_id of each pair
      // (same cap as the cross gate — one knob governs both joins).
      // innerDrops is tiny but gates every downstream frame — cached
      // so the pair aggregation runs once, not once per consumer.
      val innerDrops = Dedup.winnowPairsFromFps(fps, minShared, maxDf)
        .select(col("b").as("doc_id")).distinct()
        .transform(graft.CacheRegistry.register)
      val kept = docs.join(innerDrops, Seq("doc_id"), "left_anti")
      // winnowFps is per-doc deterministic, so filtering the fp frame
      // by surviving doc_id IS winnowFps(kept)
      val keptFps = fps.join(innerDrops, Seq("doc_id"), "left_anti")
        .transform(graft.CacheRegistry.register)
      // 2. cross-batch gate against the sealed fingerprint state.
      // Restricting to batch < batchId is what makes replay
      // idempotent: the rerun sees the same corpus as the first run,
      // not its own previous output.
      val crossDrops = crossGateDrops(keptFps, fpDir, batchId,
        batch.schema("doc_id").dataType, minShared, maxDf)
      val survivors = crossDrops.fold(kept)(d =>
          kept.join(d, Seq("doc_id"), "left_anti"))
        .transform(graft.CacheRegistry.register)
      // 3. idempotent per-batch writes: overwrite, never append
      survivors.write.mode(SaveMode.Overwrite)
        .parquet(s"$docsDir/batch=$batchId")
      val survFps = crossDrops.fold(keptFps)(d =>
          keptFps.join(d, Seq("doc_id"), "left_anti"))
        .transform(graft.CacheRegistry.register)
      // repartition on the bucket BEFORE the dynamic-partition write:
      // without it every task writes a file into every fpb dir it
      // touches (tasks × buckets small files — measured 11.7 s of a
      // 25 s micro-batch at sf0.1, and a file-count explosion the
      // later batches' corpus scans pay for); with it each bucket
      // gets one or two files and the write is ~10x cheaper
      survFps.withColumn("fpb", fpBucket(col("fp")))
        .repartition(col("fpb"))
        .write.mode(SaveMode.Overwrite).partitionBy("fpb")
        .parquet(s"$fpDir/batch=$batchId")
      // census delta: this batch's contribution to the per-fp df —
      // winnowFps is distinct per doc, so count == docs carrying fp
      survFps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"${censusDir(fpDir)}/delta/batch=$batchId")
      // periodic census maintenance over COMMITTED batches only
      // (everything below this batch's id); idempotent under replay
      if (batchId > 0 && batchId % CensusCompactInterval == 0)
        compactCensus(batch.sparkSession, fpDir, belowBatch = batchId)
      survivors.count()
    }
  }

  /** Fold census deltas of batches below `belowBatch` into the
    * compacted `merged` census (compact-and-swap: written to a temp
    * directory WITH its new `_max` frontier, atomically renamed in,
    * merged deltas deleted last — a crash at any point leaves a state
    * a later run reads consistently or re-compacts). Each fpb
    * partition is one file sorted by df descending, so the gate's
    * already-hot probe reads only hot row groups. Returns the new
    * frontier, or None when there was nothing to fold. */
  def compactCensus(spark: SparkSession, fpDir: String,
      belowBatch: Long = Long.MaxValue): Option[Long] = {
    recoverCensus(spark, fpDir)
    val cDir = censusDir(fpDir)
    val (fs, _) = hadoopFs(spark, cDir)
    val deltaRoot = new Path(s"$cDir/delta")
    val mergedMax = mergedMaxBatch(spark, fpDir)
    val deltaIds =
      if (!fs.exists(deltaRoot)) Seq.empty[Long]
      else fs.listStatus(deltaRoot).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
        .flatMap(n => scala.util.Try(n.stripPrefix("batch=").toLong).toOption)
    val toMerge = deltaIds.filter(id => id > mergedMax && id < belowBatch)
    if (toMerge.isEmpty) return None
    val newMax = toMerge.max
    val deltas = spark.read.schema(censusDeltaSchema)
      .parquet(deltaRoot.toString)
      .filter(col("batch") > mergedMax && col("batch") <= newMax)
      .select(col("fp"), col("df"))
    val mergedPath = new Path(s"$cDir/merged")
    val all =
      if (!fs.exists(mergedPath)) deltas
      else spark.read.schema(censusMergedSchema).parquet(mergedPath.toString)
        .select(col("fp"), col("df")).unionByName(deltas)
    // recoverCensus above guarantees no tmp/trash leftovers exist here
    val tmp = new Path(s"$cDir/.merged._compact_tmp")
    all.groupBy(col("fp")).agg(sum(col("df")).as("df"))
      .withColumn("fpb", fpBucket(col("fp")))
      // one writer task per bucket group; the fpb-prefixed sort both
      // satisfies the dynamic-partition writer (no re-sort that would
      // scramble the df order) and lands df-descending row groups
      .repartition(col("fpb"))
      .sortWithinPartitions(col("fpb"), col("df").desc)
      .write.mode(SaveMode.Overwrite).partitionBy("fpb")
      .parquet(tmp.toString)
    scala.util.Using.resource(
        fs.create(new Path(tmp, "_max"), true)) { out =>
      out.write(newMax.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val trash = new Path(s"$cDir/.merged._compact_old")
    if (fs.exists(mergedPath))
      require(fs.rename(mergedPath, trash),
        s"compactCensus: could not swap out $mergedPath")
    require(fs.rename(tmp, mergedPath),
      s"compactCensus: could not swap in $tmp")
    fs.delete(trash, true)
    // everything at or below the new frontier is folded in — including
    // any stale deltas a crash between a previous swap and its delete
    // left behind (they were already part of that merge)
    deltaIds.filter(_ <= newMax)
      .foreach(id => fs.delete(new Path(deltaRoot, s"batch=$id"), true))
    Some(newMax)
  }

  /** The gate state's maintenance pass — run while the stream is
    * stopped, or with `belowBatch` = the committed frontier: folds
    * census deltas ([[compactCensus]]) and small-file-compacts every
    * sealed state/docs batch directory via [[graft.sources.Ingest
    * .compact]] (per-trigger file sinks accumulate KB-files; at scale
    * the per-file open overhead would dominate the pruned gate scan).
    *
    * Known growth path, deliberately NOT implemented here: per-trigger
    * driver metadata (one listStatus per sealed batch in the layout
    * check + partition discovery over batch dirs) grows with the
    * number of sealed batches, so a stream running for years wants
    * old batches FOLDED into consolidated generations the way the
    * census folds deltas into `merged` — same compact-and-swap with
    * the fold marker written inside the swapped directory, plus a
    * gate-side exclusion of not-yet-deleted originals derived from
    * that marker (without it, the window between swap and deletion
    * double-counts folded rows and changes drop decisions). File
    * counts are already bounded (compact above); directory counts are
    * what consolidation would bound. */
  def maintain(spark: SparkSession, docsDir: String, fpDir: String,
      belowBatch: Long = Long.MaxValue,
      targetBytes: Long = 128L << 20): Unit = {
    // recover orphaned swaps at the ROOTS first: a batch dir renamed
    // to .batch=N._compact_old by a crashed compact is invisible to
    // the name-based enumerations below, so without this sweep the
    // per-batch compact calls would never reach (or restore) it
    graft.sources.Ingest.recoverSwaps(spark, docsDir)
    graft.sources.Ingest.recoverSwaps(spark, fpDir)
    compactCensus(spark, fpDir, belowBatch)
    stateBatchIds(spark, fpDir).filter(_ < belowBatch).foreach { id =>
      graft.sources.Ingest.compact(spark, s"$fpDir/batch=$id", targetBytes)
    }
    val (fs, docsRoot) = hadoopFs(spark, docsDir)
    if (fs.exists(docsRoot))
      fs.listStatus(docsRoot).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
        .flatMap(n => scala.util.Try(n.stripPrefix("batch=").toLong).toOption)
        .filter(_ < belowBatch)
        .foreach { id =>
          graft.sources.Ingest.compact(spark, s"$docsDir/batch=$id", targetBytes)
        }
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
