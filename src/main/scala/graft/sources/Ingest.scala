package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.Path

/** Sources and sinks (SURVEY.md §2 rows 42–43) — the Spark-native
  * analog of the reference's ingestion layer:
  *
  *  - NDJSON bulk ingest (reference: ingestion/bulk_ingest.py, batch
  *    size 1000) → `spark.read.json` reads NDJSON natively; "batch
  *    size" at scale is the file-split size, not a client loop.
  *  - Typed index mappings (ingestion/index_template.json) → explicit
  *    `StructType` schemas, never schema inference in production paths.
  *  - ILM rollover + retention (ingestion/ilm_policy.json: 1 d hot,
  *    30 d delete) → date-partitioned parquet layout + partition-prune
  *    deletes of expired partitions.
  */
object Ingest {

  /** Schema'd NDJSON read — no inference pass over 100 TB. */
  def readNdjson(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def writeNdjson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readCsv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    s.read.schema(schema).option("header", header.toString).csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  /** Media-file ingest via Spark's binaryFile source — how raw
    * image/audio payloads actually ENTER the multimodal pipeline
    * (m01–m03 then operate on the (media_id, payload, meta) frame).
    * One row per file with content bytes; `pathGlobFilter` prunes at
    * listing time, media_id derives from the file name, and the meta
    * struct matches `multimodal.Binary.mediaTable`'s shape so the
    * dHash/energy operators consume it unchanged. binaryFile is scan-
    * only by design (no write side — sinks for media are the rolled
    * segment dirs); maxPartitionBytes governs files-per-task exactly
    * as for parquet. */
  def readMedia(s: SparkSession, dir: String, glob: String = "*",
      mediaType: String = "application/octet-stream"): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.[A-Za-z0-9]+$", 1)
          .cast("long").as("media_id"),
        col("content").as("payload"),
        struct(lit(mediaType).as("media_type"),
          col("length").as("n_bytes"),
          lower(substring(hex(col("content")), 1, 16)).as("header_hex"))
          .as("meta"))

  /** ORC read/write — the columnar alternative to parquet for
    * warehouse interop; same pushdown/pruning behavior. */
  def readOrc(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Date-partitioned parquet write — the rollover analog: one
    * partition directory per day keyed by `tsCol`, so retention and
    * time-range queries are partition-prune operations. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Append).partitionBy("dt").parquet(path)

  /** Bucketed write: pre-shuffles once at write time so repeated
    * equi-joins/aggregations on `bucketCols` need NO exchange at read
    * time — the co-located-join layout for fact tables that join on
    * the same key query after query. Requires a table catalog
    * (saveAsTable), as bucket metadata lives in the metastore. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Retention expiry (ILM delete phase): drop whole partition
    * directories older than `keepDays` relative to `asOf` — a
    * metadata-only operation, no data scan. */
  def expireRetention(s: SparkSession, path: String, keepDays: Int,
      asOf: java.time.LocalDate): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val cutoff = asOf.minusDays(keepDays.toLong)
    val expired = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("dt=") &&
          (try java.time.LocalDate.parse(p.getName.stripPrefix("dt="))
            .isBefore(cutoff)
          catch { case _: Exception => false })
      }
    expired.foreach(fs.delete(_, true))
    expired.map(_.getName)
  }

  /** The write segment appenders target (partition-style name so a
    * plain `spark.read.parquet(root)` discovers sealed segments and
    * the active one uniformly, as one string partition column). */
  val ActiveSegment = "seg=active"

  /** Append rows to the table's ACTIVE write segment — the analog of
    * indexing through the reference's write alias
    * (ingestion/index_alias.json `is_write_index`). */
  def appendActive(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(s"$path/$ActiveSegment")

  /** Size-triggered rollover — the ILM hot-phase `max_size` analog
    * (reference: ingestion/ilm_policy.json `max_size: 1gb` + the write
    * alias swap of ingestion/index_alias.json). When the active
    * segment's data bytes reach `maxBytes`, it is SEALED: atomically
    * renamed to the next `seg=sNNNNNN` directory (same reader
    * guarantee as compact()'s swap — a scan sees the old or the new
    * layout, never a mix) and a fresh empty active segment takes its
    * place. Sealed names are deliberately NON-numeric ("s000001"):
    * while the recreated active dir is empty it contributes nothing to
    * partition-type inference, and all-numeric values would flip the
    * `seg` column to an integral type (dropping leading zeros and
    * null-ing `seg = 'active'` comparisons) until the next append.
    * The counter is monotonic across retention: a `_last_seg` marker
    * in the table root remembers the last issued number, so deleting
    * old sealed segments never reissues their names to an incremental
    * consumer (the ES rollover counter semantics). Sealed segments are
    * immutable, so compaction and retention operate on them per
    * directory exactly like the ES shrink/delete phases. Metadata-only
    * — no data is read or rewritten. Returns the sealed segment name,
    * or None below the threshold. */
  def rollPartition(s: SparkSession, path: String, maxBytes: Long): Option[String] = {
    val active = new Path(path, ActiveSegment)
    val fs = active.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(active)) return None
    val bytes = fs.listStatus(active).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    if (bytes < maxBytes) return None
    val root = new Path(path)
    val marker = new Path(root, "_last_seg")
    val fromMarker =
      if (!fs.exists(marker)) 0
      else scala.util.Using.resource(fs.open(marker)) { in =>
        scala.util.Try(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toInt).getOrElse(0)
      }
    val fromDirs = fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.startsWith("seg=s"))
      .flatMap(n => scala.util.Try(n.stripPrefix("seg=s").toInt).toOption)
      .foldLeft(0)(math.max)
    val next = math.max(fromMarker, fromDirs) + 1
    val segName = f"seg=s$next%06d"
    // RESERVE the number before sealing: a crash between rename and a
    // trailing marker write would leave the counter stale, and once
    // the sealed segment expired its name could be REISSUED to an
    // incremental consumer — the exact violation the marker exists to
    // prevent. Reserving first means a crash merely burns a number
    // (the next roll issues next+1), which the contract permits.
    scala.util.Using.resource(fs.create(marker, true)) { out =>
      out.write(next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    require(fs.rename(active, new Path(root, segName)),
      s"rollPartition: could not seal $active as $segName")
    fs.mkdirs(active)
    Some(segName)
  }

  /** Retention for the rollover layout — the ILM delete phase over
    * sealed segments: keep the newest `keep` sealed `seg=sNNNNNN`
    * directories, drop the rest (segment numbers are issue-ordered,
    * so lowest = oldest). Never touches the active segment, and the
    * `_last_seg` marker keeps the rollover counter monotonic, so an
    * expired segment's name is never reissued to an incremental
    * consumer. Metadata-only — no data scan. Returns deleted names. */
  def expireSegments(s: SparkSession, path: String, keep: Int): Seq[String] = {
    require(keep >= 0, s"keep must be >= 0, got $keep")
    val root = new Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val sealedSegs = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg=s"))
      .flatMap { st =>
        scala.util.Try(st.getPath.getName.stripPrefix("seg=s").toInt)
          .toOption.map(n => (n, st.getPath))
      }
      .sortBy(_._1)
    val expired = sealedSegs.dropRight(keep)
    expired.foreach { case (_, p) => fs.delete(p, true) }
    expired.map(_._2.getName)
  }

  /** Small-file compaction — the maintenance pass every streaming
    * sink needs: a per-trigger file sink accumulates thousands of
    * KB-sized files per partition, and at 100 TB the per-file
    * open/footer overhead starts to dominate scan time. Each partition
    * directory (or the root, if unpartitioned) holding more than
    * `minFiles` data files is rewritten into ceil(bytes/targetBytes)
    * files and swapped in via directory renames. The swap is
    * crash-safe ([[recoverSwaps]] restores any interrupted state) but
    * NOT reader-atomic: between the two renames a concurrent scan's
    * partition discovery can observe the directory absent and silently
    * return without its rows — run compaction in a maintenance window,
    * not concurrently with readers of the same table.
    *
    * Runs per-directory so a routine nightly call touches only the
    * hot partitions (older ones were compacted by earlier runs).
    * Returns (dirName, filesBefore, filesAfter) per rewritten dir. */
  /** Crash recovery for [[compact]]'s two-rename swap, runnable on
    * any directory independently of compaction itself: restores a
    * directory whose only copy sits in `.X._compact_old` (crash
    * between swap-out and swap-in), discards stale `._compact_tmp`
    * leftovers, both among `path`'s CHILDREN and for `path` itself
    * (unpartitioned swaps use siblings of the target). Callers that
    * enumerate `path`'s children by name (e.g. the streaming gate's
    * maintenance pass) MUST run this first — an orphaned child is
    * invisible to name-based listings, so per-child compact calls
    * alone would never reach it. */
  def recoverSwaps(s: SparkSession, path: String): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val selfTrash = new Path(root.getParent, s".${root.getName}._compact_old")
    val selfTmp = new Path(root.getParent, s".${root.getName}._compact_tmp")
    if (!fs.exists(root) && fs.exists(selfTrash))
      require(fs.rename(selfTrash, root),
        s"compact: could not restore interrupted swap of $root")
    else fs.delete(selfTrash, true)
    fs.delete(selfTmp, true)
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.endsWith("._compact_old"))
      .foreach { st =>
        val orig = new Path(root,
          st.getPath.getName.stripPrefix(".").stripSuffix("._compact_old"))
        if (!fs.exists(orig))
          require(fs.rename(st.getPath, orig),
            s"compact: could not restore interrupted swap of $orig")
        else fs.delete(st.getPath, true)
      }
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.endsWith("._compact_tmp"))
      .foreach(st => fs.delete(st.getPath, true))
  }

  def compact(s: SparkSession, path: String,
      targetBytes: Long = 128L << 20,
      minFiles: Int = 2): Seq[(String, Int, Int)] = {
    val root = new Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    // crash recovery BEFORE anything else — see recoverSwaps: the
    // two-rename swap can leave a directory's only copy in its trash
    recoverSwaps(s, path)
    if (!fs.exists(root)) return Seq.empty
    val parts = fs.listStatus(root).toSeq.filter(st =>
      st.isDirectory && st.getPath.getName.contains("="))
    val dirs = if (parts.nonEmpty) parts.map(_.getPath) else Seq(root)
    dirs.flatMap { dir =>
      val files = fs.listStatus(dir).toSeq.filter(st =>
        st.isFile && !st.getPath.getName.startsWith("_"))
      if (files.size <= minFiles) None
      else {
        val total = files.map(_.getLen).sum
        val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
        val tmp = new Path(dir.getParent, s".${dir.getName}._compact_tmp")
        fs.delete(tmp, true)
        s.read.parquet(dir.toString).coalesce(n)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val trash = new Path(dir.getParent, s".${dir.getName}._compact_old")
        fs.delete(trash, true)
        require(fs.rename(dir, trash), s"compact: could not swap out $dir")
        require(fs.rename(tmp, dir), s"compact: could not swap in $tmp")
        fs.delete(trash, true)
        val after = fs.listStatus(dir).count(st =>
          st.isFile && !st.getPath.getName.startsWith("_"))
        Some((dir.getName, files.size, after))
      }
    }
  }
}
