package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming CDC upsert — the c11 merge enforced AT INGEST, closing
  * the batch-vs-streaming asymmetry for corpus maintenance the same
  * way the 41f gate closed it for decontamination. This is the
  * reference's poller loop as a stream: each cycle re-PUTs changed
  * listings by `_id` with a version, Elasticsearch keeps the highest
  * version per id (external-version optimistic concurrency), deletes
  * arrive as tombstones.
  *
  * Layout is merge-on-read with amortized compaction (the LSM shape
  * every table format uses for exactly this problem):
  *
  *  - per trigger, [[upsertBatch]] writes the batch's per-key winners
  *    to `deltaDir/batch=N` — overwrite by batch id, so foreachBatch's
  *    replay-after-crash is idempotent (exactly-once state);
  *  - [[snapshotView]] merges base + deltas on read: winner per key by
  *    (version, batch) precedence, tombstones dropped. The base side
  *    is NEVER shuffled — delta winners broadcast into a LeftAnti +
  *    union (the c11 plan shape);
  *  - [[compactUpserts]] folds a PINNED set of delta dirs into a new
  *    base under the same two-rename swap discipline (and suffix
  *    convention) as `sources.Ingest.compact`, so its recoverSwaps
  *    handles crash windows; deltas are deleted only after the swap
  *    commits, and re-applying an already-folded delta is a no-op
  *    (latest-wins is idempotent), so every crash window re-converges.
  *
  * Version precedence (not arrival order) resolves conflicts: a
  * late-arriving OLD version of a doc cannot clobber the newer one —
  * exactly ES's external-version semantics, and what a distributed
  * crawler with out-of-order delivery needs. Within one (key,
  * version), puts outrank tombstones (keep data on ambiguity).
  */
object UpsertStream {

  val UpdateSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("version", LongType),
    StructField("op", StringType)))

  private val SnapshotSchema = StructType(UpdateSchema.fields.filterNot(
    _.name == "op"))

  private def hfs(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Winner per key by (version desc, batch desc, put-over-delete). */
  private def latestPerKey(updates: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("version").desc, col("batch").desc, col("op").desc)
    updates.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Persist one trigger's updates as `deltaDir/batch=<id>` (per-key
    * winners only — bounded by distinct keys). Idempotent per batch
    * id: the overwrite makes foreachBatch replay exactly-once. */
  def upsertBatch(batch: DataFrame, batchId: Long, deltaDir: String): Unit = {
    require(!batch.columns.contains("batch"),
      "upsert input must not carry a 'batch' column (reserved for the delta layout)")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("version").desc, col("op").desc)
    batch.select(col("doc_id"), col("text"), col("version"), col("op"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .write.mode("overwrite").parquet(s"$deltaDir/batch=$batchId")
  }

  /** The merge algebra over in-memory frames: base (doc_id, text,
    * version) + deltas (doc_id, text, version, op, batch) →
    * (doc_id, text, version). */
  def mergeView(base: DataFrame, deltas: DataFrame): DataFrame = {
    val winners = latestPerKey(deltas)
    val untouched = base
      .join(broadcast(winners.select(col("doc_id"))), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), col("version"))
    untouched.unionByName(
      winners.filter(col("op") =!= "delete")
        .select(col("doc_id"), col("text"), col("version")))
  }

  private def readBase(s: SparkSession, baseDir: String): DataFrame =
    if (hfs(s, baseDir).exists(new Path(baseDir)))
      s.read.parquet(baseDir).select(col("doc_id"), col("text"), col("version"))
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      SnapshotSchema)

  private def deltaBatchDirs(s: SparkSession, deltaDir: String): Seq[Path] = {
    val root = new Path(deltaDir)
    val f = hfs(s, deltaDir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("batch="))
  }

  /** Current snapshot: base + all landed deltas, merged on read. */
  def snapshotView(s: SparkSession, baseDir: String, deltaDir: String): DataFrame = {
    val dirs = deltaBatchDirs(s, deltaDir)
    if (dirs.isEmpty) readBase(s, baseDir)
    else mergeView(readBase(s, baseDir),
      s.read.option("basePath", deltaDir).parquet(dirs.map(_.toString): _*))
  }

  /** Fold the delta dirs present at entry into a new base snapshot.
    * Two-rename swap with `sources.Ingest.compact`'s suffix convention
    * (its recoverSwaps restores every crash window); folded deltas are
    * deleted only after the swap commits. Like compact, not
    * reader-atomic — run between triggers / in a maintenance window. */
  def compactUpserts(s: SparkSession, baseDir: String, deltaDir: String): Unit = {
    graft.sources.Ingest.recoverSwaps(s, baseDir)
    val dirs = deltaBatchDirs(s, deltaDir) // PINNED set: a trigger
    // landing mid-fold keeps its delta dir and re-applies later (no-op
    // for folded rows — latest-wins is idempotent)
    if (dirs.isEmpty) return
    val merged = mergeView(readBase(s, baseDir),
      s.read.option("basePath", deltaDir).parquet(dirs.map(_.toString): _*))
    val root = new Path(baseDir)
    val f = hfs(s, baseDir)
    val tmp = new Path(root.getParent, s".${root.getName}._compact_tmp")
    f.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    val trash = new Path(root.getParent, s".${root.getName}._compact_old")
    f.delete(trash, true)
    if (f.exists(root))
      require(f.rename(root, trash), s"upsert fold: could not swap out $root")
    require(f.rename(tmp, root), s"upsert fold: could not swap in $tmp")
    f.delete(trash, true)
    val df = hfs(s, deltaDir)
    dirs.foreach(d => df.delete(d, true))
  }

  /** Start — or resume from `checkpointDir` — the NDJSON CDC ingest:
    * each micro-batch lands as one idempotent delta generation. */
  def resumeUpsert(s: SparkSession, inDir: String, deltaDir: String,
      checkpointDir: String): StreamingQuery =
    s.readStream.schema(UpdateSchema).json(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => upsertBatch(b, id, deltaDir))
      .start()
}
