package graft.streaming

import graft.functions.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
