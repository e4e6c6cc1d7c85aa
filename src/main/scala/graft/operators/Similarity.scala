package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2 rows 35–36).
  *
  * Scale design: the query set is small and BROADCAST; the corpus is
  * scanned exactly once. Brute force ranks per-query via a window on
  * the broadcast-joined pairs; the LSH variant prunes the corpus scan
  * to hyperplane-sign bucket collisions (equi-join on the sketch, no
  * cross join), then ranks within candidates.
  */
object Similarity {

  val TopK = 5
  /** every 50th vector is a query (deterministic, data-derived) */
  val QueryStride = 50

  private[operators] def queriesDf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))

  // ---------------------------------------------------------------
  // s01: exact cosine top-k — broadcast query set × one corpus pass.
  // ---------------------------------------------------------------
  /** Production face: exact cosine top-k of `queries` (qid, qe)
    * against `corpus` (vec_id, embedding) — broadcast query set, one
    * corpus pass, WindowGroupLimit rank pushdown. */
  def annBruteForce(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val s = corpus.sparkSession
    val pairs = corpus.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.plans.GraftFunctions.cosine(s, col("qe"), col("embedding")).as("cos"))
    rankTopK(pairs, k)
  }

  private[operators] def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
  }

  def s01(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    annBruteForce(e, queriesDf(e))
  }

  val s01Sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                  WHERE vec_id % $QueryStride = 0),
       c AS (SELECT qid, vec_id,
               list_sum(list_transform(list_zip(qe::DOUBLE[], embedding::DOUBLE[]), x -> x[1]*x[2]))
               / (sqrt(list_sum(list_transform(qe::DOUBLE[], x -> x*x)))
                * sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))) AS cos
             FROM q, embeddings WHERE vec_id <> qid),
       r AS (SELECT qid, vec_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
             FROM c)
       SELECT qid, rank, vec_id, cos FROM r WHERE rank <= $TopK"""

  // ---------------------------------------------------------------
  // s02: hyperplane-LSH bucketed ANN — the scale path. Deterministic
  // ±1 hyperplanes (hash-seeded, RNG-free so plans are reproducible
  // across runs/executors). AND-OR amplification: `Bands` independent
  // sign-sketches of `BitsPerBand` planes each; a corpus vector is a
  // candidate if ANY band key matches the query's (equi-join on
  // (band, key) — candidates ≈ Bands/2^BitsPerBand of the corpus,
  // never a cross join). Rows-only driver check; recall vs s01 in
  // DedupSpec.
  // ---------------------------------------------------------------
  val Bands = 3
  val BitsPerBand = 3
  val NumPlanes: Int = Bands * BitsPerBand
  val Dim = 64

  /** plane p, component d → ±1, from a fixed public hash (MurmurHash3
    * via Scala's stdlib) so every executor materializes the identical
    * plane matrix without any RNG or driver broadcast of state. */
  def planeSign(p: Int, d: Int): Int =
    if ((scala.util.hashing.MurmurHash3.productHash((p, d)) & 1) == 1) 1 else -1

  /** sign bit of v · plane(p) — native graft_dot (the zip_with/
    * aggregate HOF form is interpreted per element; the fused loop
    * accumulates in the same index order, so buckets are unchanged). */
  private def signBit(v: Column, p: Int): Column = {
    val plane = typedLit((0 until Dim).map(planeSign(p, _).toFloat).toArray)
      .cast("array<float>")
    val dotP = graft.plans.GraftFunctions.dot(
      org.apache.spark.sql.SparkSession.active, v, plane)
    when(dotP > 0, lit(1)).otherwise(lit(0))
  }

  /** Whole-sketch bucket id (all planes) — used by tests. */
  def lshBucket(v: Column): Column =
    (0 until NumPlanes).map(p => signBit(v, p) * (1 << p)).reduce(_ + _)

  /** (band, key) rows for one vector: key = the band's sign bits. */
  private def bandKeys(v: Column): Column = {
    val bands = (0 until Bands).map { b =>
      val key = (0 until BitsPerBand)
        .map(k => signBit(v, b * BitsPerBand + k) * (1 << k)).reduce(_ + _)
      struct(lit(b).as("band"), key.as("key"))
    }
    array(bands: _*)
  }

  /** DuckDB replay of s02: the ±1 plane matrix is Scala-computed and
    * INLINED as literals, so both engines build bit-exact sign
    * sketches (index-order double folds on both sides — the same
    * precedent as the s01/d05 cosine oracles). Numeric-only
    * interpolation; no backslashes. */
  lazy val s02Sql: String = {
    def signsLit(p: Int): String =
      (0 until Dim).map(d => planeSign(p, d).toString).mkString("[", ",", "]")
    def dot(p: Int): String =
      s"list_sum(list_transform(list_zip(embedding::DOUBLE[], ${signsLit(p)}::DOUBLE[]), x -> x[1]*x[2]))"
    def key(b: Int): String =
      (0 until BitsPerBand).map(k =>
        s"(CASE WHEN ${dot(b * BitsPerBand + k)} > 0 THEN 1 ELSE 0 END) * ${1 << k}")
        .mkString(" + ")
    val bandSelects = (0 until Bands).map(b =>
      s"SELECT vec_id, embedding, $b AS band, ${key(b)} AS key FROM embeddings")
      .mkString("\n       UNION ALL ")
    s"""WITH banded AS ($bandSelects),
       q AS (SELECT vec_id AS qid, embedding AS qe, band, key
             FROM banded WHERE vec_id % $QueryStride = 0),
       pairs AS (
         SELECT DISTINCT qid, c.vec_id,
           list_sum(list_transform(list_zip(qe::DOUBLE[], c.embedding::DOUBLE[]), x -> x[1]*x[2]))
           / (sqrt(list_sum(list_transform(qe::DOUBLE[], x -> x*x)))
            * sqrt(list_sum(list_transform(c.embedding::DOUBLE[], x -> x*x)))) AS cos
         FROM banded c JOIN q ON c.band = q.band AND c.key = q.key AND c.vec_id <> q.qid),
       r AS (SELECT qid, vec_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
             FROM pairs)
       SELECT qid, rank, vec_id, cos FROM r WHERE rank <= $TopK"""
  }

  /** Production face: LSH-bucketed ANN of `queries` (qid, qe) against
    * `corpus` (vec_id, embedding) — both sides banded with the same
    * deterministic plane matrix, candidates from the (band, key)
    * equi-join only. */
  def annLsh(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val s = corpus.sparkSession
    val c = corpus.select(col("vec_id"), col("embedding"),
        explode(bandKeys(col("embedding"))).as("bk"))
      .select(col("vec_id"), col("embedding"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val q = queries.select(col("qid"), col("qe"),
        explode(bandKeys(col("qe"))).as("bk"))
      .select(col("qid"), col("qe"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val pairs = c.join(broadcast(q), Seq("band", "key"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.plans.GraftFunctions.cosine(s, col("qe"), col("embedding")).as("cos"))
      .distinct() // a pair may collide in several bands
    rankTopK(pairs, k)
  }

  def s02(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    annLsh(e, queriesDf(e))
  }

  // ---------------------------------------------------------------
  // s03: IVF ANN — KMeans coarse quantizer (Spark ML), corpus bucketed
  // by nearest-centroid cell, queries probe the `NumProbes` nearest
  // cells, exact cosine rank within probed cells only.
  //
  // Scale posture: the quantizer trains on a SAMPLE (centroids are
  // model metadata, k×dim doubles — not a data collect); assignment is
  // one broadcast-model map over the corpus; the probe join is an
  // equi-join on cell id touching NumProbes/NumCells of the corpus.
  // ---------------------------------------------------------------
  val NumCells = 16
  val NumProbes = 4
  val KmeansSeed = 42L
  val QuantizerSampleRows = 100000
  /** Historical (r13–r14): the probe-list computation used to be a
    * driver-side loop over a collected query set, capped here with a
    * fail-fast. r15 removed the last bounded driver step from the
    * retrieval stack — probes are now a distributed
    * queries × broadcast(centers) cross (NumCells rows per query)
    * ranked by a per-qid window, so the query set can be any size.
    * The constant remains only for the s03 face's deterministic
    * input bound (kept so bench numbers stay round-comparable). */
  val MaxQueryRows = 10000

  /** Production face: IVF ANN of `queriesIn` (qid, qe) against
    * `corpusIn` (vec_id, embedding). */
  def annIvf(corpusIn: DataFrame, queriesIn: DataFrame,
      k: Int = TopK): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    val s = corpusIn.sparkSession
    val e = corpusIn.withColumn("features", array_to_vector(col("embedding")))
    // Bounded training sample WITHOUT a full corpus pass (the old
    // count()+sample() pair read the corpus twice just to size a
    // fraction): LocalLimit short-circuits each partition scan at
    // QuantizerSampleRows, and the xxhash64 scatter filter decorrelates
    // the sample from storage order (a layout clustered by content
    // would otherwise feed the quantizer one region of the space).
    // Modulus 4 keeps ≥ NumCells rows even at tiny SF.
    val train = e
      .filter(pmod(xxhash64(col("vec_id")), lit(4)) === 0)
      .limit(QuantizerSampleRows)
    // coarse quantization needs rough cells, not convergence — cap
    // iterations (each KMeans iteration is a full pass + driver sync)
    // and use random init: k-means|| spends several extra passes
    // optimizing seed quality that the recall-gated probe search
    // doesn't need
    val model = new KMeans().setK(NumCells).setSeed(KmeansSeed).setMaxIter(8)
      .setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell").fit(train)

    val corpus = model.transform(e).select(col("vec_id"), col("embedding"), col("cell"))

    // per-query probe list, fully DISTRIBUTED (r15 — the last bounded
    // driver step in the retrieval stack removed): centroids are model
    // metadata (NumCells × Dim doubles) broadcast as a tiny frame;
    // each query meets all NumCells centers in a broadcast cross
    // (NumCells rows per query), squared-L2 folds component-ascending
    // (bit-identical to the old driver loop), and a per-qid window
    // keeps the NumProbes nearest (distance, then cell — the stable
    // sort order the driver path used). No collect, no cap — and the
    // candidate join below is deliberately UNHINTED: AQE broadcasts
    // the (probes × query) frame while the query set is serving-
    // batch-sized and degrades to a shuffle join on `cell` for a
    // corpus-scale query set, instead of the forced-broadcast driver
    // OOM the old collect path's cap existed to prevent.
    import s.implicits._
    // the query frame feeds BOTH the probe cross and the candidate
    // join — cached so an expensive upstream query pipeline runs once
    val queries = queriesIn.select(col("qid"), col("qe"))
      .transform(graft.CacheRegistry.register)
    val centersDf = model.clusterCenters.zipWithIndex
      .map { case (c: Vector, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "cv")
    val wp = Window.partitionBy(col("qid"))
      .orderBy(col("_d2").asc, col("cell").asc)
    val probes = queries
      .crossJoin(broadcast(centersDf))
      .withColumn("_d2", aggregate(
        zip_with(col("qe").cast("array<double>"), col("cv"),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("_pr", row_number().over(wp))
      .filter(col("_pr") <= NumProbes)
      .select(col("qid"), col("cell"))

    val cand = corpus.join(probes.join(queries, "qid"), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.plans.GraftFunctions.cosine(s, col("qe"), col("embedding")).as("cos"))
      .distinct()
    rankTopK(cand, k)
  }

  def s03(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    // the stride-derived query set grows with the corpus; bound it
    // DETERMINISTICALLY (by id range, not limit — a limit would pick
    // partition-order-dependent queries). annIvf itself no longer
    // needs a cap (probes are distributed, r15); the face keeps its
    // historical input bound so bench numbers stay round-comparable
    annIvf(e, queriesDf(e)
      .filter(col("qid") < lit(QueryStride.toLong * MaxQueryRows)))
  }

  // ---------------------------------------------------------------
  // s03b: IVF core semantics with a PINNED codebook — the same
  // cell-assign / probe / rank dataflow as s03, but the coarse
  // quantizer is a deterministic ±1 sign-pattern codebook (Murmur-
  // derived, inlined as literals in BOTH engines) instead of trained
  // KMeans centroids. This makes the whole IVF pipeline DuckDB-
  // replayable bit-for-bit (KMeans itself is engine-specific — s03
  // stays recall-gated), and it is FULLY distributed: assignment is a
  // narrow fold-argmax map, probe lists come from a window over a
  // 16-row-per-query explode — no driver-side centroid collect at all.
  // ---------------------------------------------------------------
  val CoreCells = 16
  val CoreProbes = 4

  /** codebook cell c, component d → ±1; seed tuple disjoint from
    * `planeSign`'s so the codebook is decorrelated from the s02
    * hyperplanes. */
  def centroidSign(c: Int, d: Int): Int =
    if ((scala.util.hashing.MurmurHash3.productHash((7, c, d)) & 1) == 1) 1 else -1

  private def centroidLit(c: Int): Column =
    typedLit((0 until Dim).map(d => centroidSign(c, d).toFloat).toArray)
      .cast("array<float>")

  /** Production face: IVF ANN of `queries` (qid, qe) against `corpus`
    * (vec_id, embedding) over the pinned codebook. Each corpus vector
    * lands in exactly ONE cell (argmax cosine, earliest cell wins
    * ties), so probe candidates need no dedup. */
  /** all-cells DOT as ONE array column: per row, cosine = dot scaled
    * by the same positive constant (1/(‖v‖·8)) for every cell, so
    * argmax/probe-rank over dots ≡ over cosines for a third of the
    * arithmetic. The 16 codegen'd dots are materialized once, and the
    * argmax folds over cheap element refs instead of duplicating dot
    * subtrees (when/otherwise folds double their branch tree per level) */
  private def cellDots(s: SparkSession, v: Column): Column =
    array((0 until CoreCells).map(c =>
      graft.plans.GraftFunctions.dot(s, v, centroidLit(c))): _*)

  /** Coarse-quantizer assignment over the pinned codebook:
    * (vec_id, embedding, cell) with cell = argmax-dot (smallest cell
    * id on exact ties — matching the oracle's ORDER BY dot DESC,
    * cell ASC). Narrow codegen'd map, no shuffle. */
  def assignCells(corpus: DataFrame, extra: Seq[String] = Nil): DataFrame =
    corpus
      .withColumn("_d", cellDots(corpus.sparkSession, col("embedding")))
      // coalesce makes the column NON-NULLABLE: otherwise a
      // downstream equi-join infers isnotnull(cell) and inlines all
      // 16 dots a second time into a Filter (constraint-inference
      // tree duplication)
      .withColumn("cell", coalesce(
        (array_position(col("_d"), array_max(col("_d"))) - 1).cast("int"),
        lit(-1)))
      .select((Seq("vec_id", "embedding", "cell") ++ extra).map(col): _*)

  def annIvfCore(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK, numProbes: Int = CoreProbes): DataFrame = {
    val s = corpus.sparkSession
    val assigned = assignCells(corpus)
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("cell").asc)
    val probes = queries
      .select(col("qid"), col("qe"), posexplode(cellDots(s, col("qe"))))
      .withColumnsRenamed(Map("pos" -> "cell", "col" -> "qcos"))
      .withColumn("_pr", row_number().over(wq))
      .filter(col("_pr") <= numProbes)
      .select(col("qid"), col("qe"), col("cell"))
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.plans.GraftFunctions.cosine(s, col("qe"), col("embedding")).as("cos"))
    rankTopK(cand, k)
  }

  def s03b(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    annIvfCore(e, queriesDf(e))
  }

  /** DuckDB replay of s03b: the ±1 codebook is inlined as a VALUES
    * table; assignment and probe ranking are row_number argmax/top-N
    * over the corpus × codebook cross (16 rows per vector — the same
    * work the Spark fold does). Numeric-only interpolation. */
  /** The s03b replay, optionally label-filtered — ONE builder so
    * the plain core (s03b) and the filtered core (s21) can never
    * drift: `filtered` threads label/qlabel through the CTEs and
    * adds the tenant predicate to the candidate join. */
  private def ivfCoreSql(filtered: Boolean,
      numProbes: Int = CoreProbes): String = {
    def cvLit(c: Int): String =
      (0 until Dim).map(d => centroidSign(c, d).toString)
        .mkString("[", ",", "]") + "::DOUBLE[]"
    val centRows = (0 until CoreCells).map(c => s"($c, ${cvLit(c)})").mkString(",\n         ")
    val lab = if (filtered) ", e.label" else ""
    val labCol = if (filtered) ", label" else ""
    val qlab = if (filtered) ", label AS qlabel" else ""
    val qlabCol = if (filtered) ", qlabel" else ""
    val labPred = if (filtered) " AND a.label = qp.qlabel" else ""
    s"""WITH cent(cell, cv) AS (VALUES
         $centRows),
       ec AS (SELECT e.vec_id, e.embedding$lab, c.cell,
                list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cv), x -> x[1]*x[2])) AS ccos
              FROM embeddings e CROSS JOIN cent c),
       asg AS (SELECT vec_id, embedding$labCol, cell FROM
               (SELECT vec_id, embedding$labCol, cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS rn
                FROM ec) WHERE rn = 1),
       qp AS (SELECT qid, qe$qlabCol, cell FROM
              (SELECT vec_id AS qid, embedding AS qe$qlab, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS pr
               FROM ec WHERE vec_id % $QueryStride = 0) WHERE pr <= $numProbes),
       cand AS (SELECT qid, a.vec_id,
                  list_sum(list_transform(list_zip(qe::DOUBLE[], a.embedding::DOUBLE[]), x -> x[1]*x[2]))
                  / (sqrt(list_sum(list_transform(qe::DOUBLE[], x -> x*x)))
                   * sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x*x)))) AS cos
                FROM asg a JOIN qp USING (cell) WHERE a.vec_id <> qp.qid$labPred),
       r AS (SELECT qid, vec_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
             FROM cand)
       SELECT qid, rank, vec_id, cos FROM r WHERE rank <= $TopK"""
  }

  lazy val s03bSql: String = ivfCoreSql(filtered = false)

  // ---------------------------------------------------------------
  // s21: filtered vector search — the tenant-isolation query every
  // current vector store leads with (search only MY label's vectors):
  // s03b's cell-probe ANN with the label predicate composed INTO the
  // candidate join, so pruning composes — a candidate must share the
  // query's probed cell AND its label. The predicate provably
  // commutes with the index: cell assignment is per-vector
  // independent, so filtering the corpus first and indexing the
  // filtered slice yields the identical candidate set (spec-pinned
  // equality — the guarantee a serving layer needs before it pushes
  // filters into a shared index instead of maintaining one index per
  // tenant). At 100 TB the same predicate lands on the s05b
  // artifact's partition columns.
  // ---------------------------------------------------------------

  /** s03b's probe ANN restricted per query to corpus rows sharing
    * the query's label: queries carry (qid, qe, qlabel). */
  def annIvfFiltered(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val s = corpus.sparkSession
    val assigned = assignCells(corpus, Seq("label"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("cell").asc)
    val probes = queries
      .select(col("qid"), col("qe"), col("qlabel"),
        posexplode(cellDots(s, col("qe"))))
      .withColumnsRenamed(Map("pos" -> "cell", "col" -> "qcos"))
      .withColumn("_pr", row_number().over(wq))
      .filter(col("_pr") <= CoreProbes)
      .select(col("qid"), col("qe"), col("qlabel"), col("cell"))
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid") &&
        col("label") === col("qlabel"))
      .select(col("qid"), col("vec_id"),
        graft.plans.GraftFunctions.cosine(s, col("qe"), col("embedding")).as("cos"))
    rankTopK(cand, k)
  }

  def s21(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    // the ONE labeled-query-set definition, shared with s20 — the
    // exact baseline and the filtered index can never drift to
    // different query populations
    annIvfFiltered(e, queriesLabeled(e))
  }

  lazy val s21Sql: String = ivfCoreSql(filtered = true)

  // ---------------------------------------------------------------
  // s04: product-quantization ANN (PQ + ADC) — the embedding-
  // COMPRESSION scale path. 64-d vectors are split into `SubSpaces`
  // 8-d subvectors; each subvector is encoded as the argmax-dot code
  // of a pinned 16-entry ±1 codebook → the whole vector becomes 8
  // small ints (4 B packed vs 256 B of floats: at 100 TB the ADC scan
  // touches 1/32 of the bytes a brute-force scan reads, and the
  // compressed corpus fits executor memory long after floats don't).
  //
  // Query side builds a 128-entry lookup table (its dot against every
  // code of every subspace); the asymmetric-distance scan is then 8
  // array lookups + 7 adds per corpus row — no float math at all.
  // Top `ReRank` ADC candidates per query are exact-cosine re-ranked
  // (fetch-by-id equi-join) into the final top-k.
  //
  // The ±1 codebook makes every dot a SIGNED SUM of vector slots, so
  // encode/LUT/ADC are flat codegen'd arithmetic in Spark and replay
  // bit-exactly in DuckDB (ordered list aggregation on the SQL side;
  // both engines add in subspace order).
  // ---------------------------------------------------------------
  val SubSpaces: Int = graft.plans.Pq.SubSpaces
  val SubDim: Int = graft.plans.Pq.SubDim
  val CodesPerSub: Int = graft.plans.Pq.CodesPerSub
  /** ADC candidates per query before exact re-rank. */
  val ReRank = 20

  /** codebook: subspace m, code j, component d → ±1 (seed tuple
    * disjoint from the s02 planes and the s03b codebook). Shared with
    * the native expressions — [[graft.plans.Pq.codeSign]] is the
    * single source of truth for Spark AND the oracle VALUES. */
  def codeSign(m: Int, j: Int, d: Int): Int = graft.plans.Pq.codeSign(m, j, d)

  /** Encode a vector to its `SubSpaces` PQ codes (the compressed
    * representation a production pipeline would persist). Native
    * fused loop — the Column-tree form (array of 16 element_at-chain
    * dots per subspace × argmax referencing it twice) fell out of
    * whole-stage codegen into ~0.5 ms/row interpreted eval. */
  def pqEncode(s: SparkSession, v: Column): Column =
    graft.plans.GraftFunctions.pqCodes(s, v)

  /** The query-side ADC lookup table: 128 dots ordered (m*16 + j). */
  private def pqLut(s: SparkSession, q: Column): Column =
    graft.plans.GraftFunctions.pqSubDots(s, q)

  /** Production face: PQ/ADC ANN of `queries` (qid, qe) against
    * `corpus` (vec_id, embedding). The ADC scan pairs the broadcast
    * query LUTs with the compressed corpus only; full embeddings are
    * re-read for the ReRank candidates alone (fetch-by-id join). */
  def annPq(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val s = corpus.sparkSession
    val codes = corpus.select(col("vec_id"), pqEncode(s, col("embedding")).as("codes"))
    val q = queries.select(col("qid"), pqLut(s, col("qe")).as("lut"))
    // approx dot = Σ_m lut[m*16 + codes[m]] — fixed ascending-m chain
    val adc = (0 until SubSpaces).map(m =>
      element_at(col("lut"),
        lit(m * CodesPerSub + 1) + element_at(col("codes"), m + 1)))
      .reduce(_ + _)
    val cand = codes.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), adc.as("approx"))
    val wa = Window.partitionBy(col("qid"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val top = cand.withColumn("_r", row_number().over(wa))
      .filter(col("_r") <= ReRank)
      .select(col("qid"), col("vec_id"))
    exactReRank(corpus, queries, top, k)
  }

  /** Exact-cosine re-rank of an approximate candidate list — the tail
    * every compressed-scan face (s04/s05/s17) shares. The candidate
    * list is provably ≤ |queries|×ReRank rows → broadcast IT against
    * the corpus fetch (size-based planning would broadcast the corpus
    * at test SF, which inverts at 100 TB). */
  private def exactReRank(corpus: DataFrame, queries: DataFrame,
      top: DataFrame, k: Int): DataFrame = {
    val s = corpus.sparkSession
    val exact = corpus.join(broadcast(top), Seq("vec_id"))
      .join(broadcast(queries.select(col("qid"), col("qe"))), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        graft.plans.GraftFunctions.cosine(s, col("qe"), col("embedding")).as("cos"))
    rankTopK(exact, k)
  }

  def s04(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    annPq(e, queriesDf(e))
  }

  /** DuckDB replay of s04: codebook inlined as VALUES; encode and LUT
    * are the same cross-join + argmax/ordered-list shapes as s03b's
    * oracle; the ADC sum indexes the two list columns inside one
    * list_transform lambda so the add order is the Spark chain's. */
  lazy val s04Sql: String = {
    def cvLit(m: Int, j: Int): String =
      (0 until SubDim).map(d => codeSign(m, j, d).toString)
        .mkString("[", ",", "]") + "::DOUBLE[]"
    val cbRows = (for (m <- 0 until SubSpaces; j <- 0 until CodesPerSub)
      yield s"($m, $j, ${cvLit(m, j)})").mkString(",\n         ")
    val subIdx = (0 until SubSpaces).map(_.toString).mkString("[", ",", "]")
    s"""WITH cb(m, j, cv) AS (VALUES
         $cbRows),
       sd AS (SELECT e.vec_id, cb.m, cb.j,
                list_sum(list_transform(list_zip(
                  e.embedding[cb.m*$SubDim+1 : (cb.m+1)*$SubDim]::DOUBLE[], cb.cv),
                  x -> x[1]*x[2])) AS dot
              FROM embeddings e CROSS JOIN cb),
       codes AS (SELECT vec_id, list(j ORDER BY m) AS cl FROM
                 (SELECT vec_id, m, j,
                    row_number() OVER (PARTITION BY vec_id, m ORDER BY dot DESC, j) AS rn
                  FROM sd) WHERE rn = 1 GROUP BY vec_id),
       lut AS (SELECT vec_id AS qid, list(dot ORDER BY m, j) AS ll
               FROM sd WHERE vec_id % $QueryStride = 0 GROUP BY vec_id),
       adc AS (SELECT qid, c.vec_id,
                 list_sum(list_transform($subIdx,
                   m -> ll[m*$CodesPerSub + cl[m+1] + 1])) AS approx
               FROM codes c CROSS JOIN lut WHERE c.vec_id <> lut.qid),
       top AS (SELECT qid, vec_id FROM
               (SELECT qid, vec_id,
                  row_number() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS r
                FROM adc) WHERE r <= $ReRank),
       ex AS (SELECT qid, t.vec_id,
                list_sum(list_transform(list_zip(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), x -> x[1]*x[2]))
                / (sqrt(list_sum(list_transform(q.embedding::DOUBLE[], x -> x*x)))
                 * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x)))) AS cos
              FROM top t
              JOIN embeddings e ON e.vec_id = t.vec_id
              JOIN embeddings q ON q.vec_id = t.qid),
       r AS (SELECT qid, vec_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
             FROM ex)
       SELECT qid, rank, vec_id, cos FROM r WHERE rank <= $TopK"""
  }

  // ---------------------------------------------------------------
  // s05: IVF-PQ — the production composition (FAISS's default shape).
  // s04's ADC scan still visits |Q|×|C| pairs (cheaper bytes per
  // pair, same pair count); s05 prunes FIRST with the s03b coarse
  // quantizer (probe `CoreProbes` of `CoreCells` cells), then runs
  // the ADC lookup scan only within probed cells, then exact-cosine
  // re-ranks the top `ReRank`. At 100 TB: the corpus is stored once
  // as (cell, 8 code ints); a query touches cells/probes of the
  // compressed corpus — both the byte volume AND the candidate count
  // shrink. Fully deterministic → DuckDB-replayable end to end.
  // ---------------------------------------------------------------
  def annIvfPq(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val s = corpus.sparkSession
    def cellDots(v: Column): Column = Similarity.cellDots(s, v)
    // one narrow pass stores the compressed corpus: coarse cell +
    // PQ codes (non-nullable cell — see s03b on constraint inference)
    val assigned = corpus
      .withColumn("_d", cellDots(col("embedding")))
      .withColumn("cell", coalesce(
        (array_position(col("_d"), array_max(col("_d"))) - 1).cast("int"),
        lit(-1)))
      .select(col("vec_id"), col("cell"), pqEncode(s, col("embedding")).as("codes"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("cell").asc)
    val probes = queries
      .select(col("qid"), col("qe"), posexplode(cellDots(col("qe"))))
      .withColumnsRenamed(Map("pos" -> "cell", "col" -> "qcos"))
      .withColumn("_pr", row_number().over(wq))
      .filter(col("_pr") <= CoreProbes)
      .select(col("qid"), col("cell"), pqLut(s, col("qe")).as("lut"))
    val adc = (0 until SubSpaces).map(m =>
      element_at(col("lut"),
        lit(m * CodesPerSub + 1) + element_at(col("codes"), m + 1)))
      .reduce(_ + _)
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), adc.as("approx"))
    val wa = Window.partitionBy(col("qid"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val top = cand.withColumn("_r", row_number().over(wa))
      .filter(col("_r") <= ReRank)
      .select(col("qid"), col("vec_id"))
    exactReRank(corpus, queries, top, k)
  }

  def s05(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    annIvfPq(e, queriesDf(e))
  }

  /** DuckDB replay of s05 — s03b's assignment/probe CTEs composed
    * with s04's codes/LUT/ADC CTEs, candidates restricted to probed
    * cells. */
  lazy val s05Sql: String = {
    def centLit(c: Int): String =
      (0 until Dim).map(d => centroidSign(c, d).toString)
        .mkString("[", ",", "]") + "::DOUBLE[]"
    val centRows = (0 until CoreCells).map(c => s"($c, ${centLit(c)})")
      .mkString(",\n         ")
    def cvLit(m: Int, j: Int): String =
      (0 until SubDim).map(d => codeSign(m, j, d).toString)
        .mkString("[", ",", "]") + "::DOUBLE[]"
    val cbRows = (for (m <- 0 until SubSpaces; j <- 0 until CodesPerSub)
      yield s"($m, $j, ${cvLit(m, j)})").mkString(",\n         ")
    val subIdx = (0 until SubSpaces).map(_.toString).mkString("[", ",", "]")
    s"""WITH cent(cell, cv) AS (VALUES
         $centRows),
       cb(m, j, sv) AS (VALUES
         $cbRows),
       ec AS (SELECT e.vec_id, c.cell,
                list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cv), x -> x[1]*x[2])) AS cdot
              FROM embeddings e CROSS JOIN cent c),
       asg AS (SELECT vec_id, cell FROM
               (SELECT vec_id, cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cell) AS rn
                FROM ec) WHERE rn = 1),
       sd AS (SELECT e.vec_id, cb.m, cb.j,
                list_sum(list_transform(list_zip(
                  e.embedding[cb.m*$SubDim+1 : (cb.m+1)*$SubDim]::DOUBLE[], cb.sv),
                  x -> x[1]*x[2])) AS dot
              FROM embeddings e CROSS JOIN cb),
       codes AS (SELECT vec_id, list(j ORDER BY m) AS cl FROM
                 (SELECT vec_id, m, j,
                    row_number() OVER (PARTITION BY vec_id, m ORDER BY dot DESC, j) AS rn
                  FROM sd) WHERE rn = 1 GROUP BY vec_id),
       qp AS (SELECT qid, cell FROM
              (SELECT vec_id AS qid, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cell) AS pr
               FROM ec WHERE vec_id % $QueryStride = 0) WHERE pr <= $CoreProbes),
       lut AS (SELECT vec_id AS qid, list(dot ORDER BY m, j) AS ll
               FROM sd WHERE vec_id % $QueryStride = 0 GROUP BY vec_id),
       adc AS (SELECT qp.qid, a.vec_id,
                 list_sum(list_transform($subIdx,
                   m -> ll[m*$CodesPerSub + cl[m+1] + 1])) AS approx
               FROM asg a
               JOIN qp ON a.cell = qp.cell
               JOIN codes co ON co.vec_id = a.vec_id
               JOIN lut ON lut.qid = qp.qid
               WHERE a.vec_id <> qp.qid),
       top AS (SELECT qid, vec_id FROM
               (SELECT qid, vec_id,
                  row_number() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS r
                FROM adc) WHERE r <= $ReRank),
       ex AS (SELECT qid, t.vec_id,
                list_sum(list_transform(list_zip(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), x -> x[1]*x[2]))
                / (sqrt(list_sum(list_transform(q.embedding::DOUBLE[], x -> x*x)))
                 * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x)))) AS cos
              FROM top t
              JOIN embeddings e ON e.vec_id = t.vec_id
              JOIN embeddings q ON q.vec_id = t.qid),
       r AS (SELECT qid, vec_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
             FROM ex)
       SELECT qid, rank, vec_id, cos FROM r WHERE rank <= $TopK"""
  }

  // ---------------------------------------------------------------
  // s17: scalar quantization (SQ8) — the int8-per-dimension member of
  // the compression family, between brute force (s01: 4 B/dim floats)
  // and PQ (s04: 0.5 B/dim codes). Each dimension is affinely mapped
  // to 0..255 against the CORPUS-WIDE per-dim min/max (one 1-row
  // aggregate, broadcast): 4× byte reduction with far lower
  // reconstruction error than PQ — FAISS's SQ8 default and the common
  // first step when embeddings stop fitting memory but PQ recall is
  // not acceptable. The approximate scan reconstructs each dimension
  // at its quantization-bin MIDPOINT (deq = mn + (code + 0.5)·step),
  // factored per query so the per-pair loop is one native int×double
  // dot (see annSq8); top `ReRank` per query re-rank exact, s04's
  // tail.
  //
  // Determinism: quantization is floor((v − mn)·256/(mx − mn))
  // clamped to 255 — floor, not round, so no rounding-mode edge
  // exists to diverge on; min/max of floats are exact; both engines
  // run the identical IEEE double expression and fold in index order
  // (the s01 precedent). Zero-range dims (mx == mn) encode 0 and
  // reconstruct mn exactly.
  //
  // Scale: the stats row is a combiner-friendly 128-aggregate pass;
  // encode is one narrow projection (the compressed corpus a
  // production pipeline persists); the ADC-style scan carries only
  // (qid, vec_id, approx); re-rank fetches ≤ |Q|×ReRank embeddings
  // by id. Same plan skeleton as s04 with 4× the code bytes and no
  // codebook training at all.
  // ---------------------------------------------------------------

  /** Corpus-wide per-dimension min/max — the SQ8 "codebook" (1 row,
    * two Dim-length arrays; broadcast everywhere it's used). */
  private[operators] def sq8Stats(corpus: DataFrame): DataFrame =
    corpus.agg(
      array((1 to Dim).map(d =>
        min(element_at(col("embedding"), d).cast("double"))): _*).as("mn"),
      array((1 to Dim).map(d =>
        max(element_at(col("embedding"), d).cast("double"))): _*).as("mx"))

  /** floor-quantize one embedding against the broadcast stats row:
    * array<int> of 0..255 (the persisted compressed form). */
  private def sq8Codes: Column =
    transform(col("embedding"), (v, i) => {
      val mn = element_at(col("mn"), i + 1)
      val mx = element_at(col("mx"), i + 1)
      when(mx === mn, lit(0L)).otherwise(
        least(lit(255L), floor((v.cast("double") - mn) * lit(256.0) / (mx - mn))))
        .cast("int")
    })

  /** The persisted compressed form: (vec_id, codes array<int> of
    * 0..255) against the corpus's own stats row. */
  private[graft] def sq8Encoded(corpus: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(sq8Stats(corpus)))
      .select(col("vec_id"), sq8Codes.as("codes"))

  /** Production face: SQ8 approximate scan + exact re-rank of
    * `queries` (qid, qe) against `corpus` (vec_id, embedding).
    *
    * The approximate dot Σ_d q_d·(mn_d + (c_d + 0.5)·step_d) is
    * FACTORED per query into qoff + Σ_d qs_d·c_d with
    * qs_d = q_d·step_d and qoff = Σ_d (q_d·mn_d + 0.5·qs_d) — the
    * per-pair hot loop is then the native codegen'd graft_sq8dot over
    * the code ints, and the HOF transforms run only on the |Q|-sized
    * broadcast side. Both engines compute the SAME factored
    * expression (not the algebraically-equal unfactored one — IEEE
    * rounding differs between the two forms). */
  /** The factored SQ8 query prep against the broadcast stats row:
    * (qid, qe, qs, qoff) with qs_d = q_d·step_d and
    * qoff = Σ_d (q_d·mn_d + 0.5·qs_d) — the SAME factored expression
    * s17 and s18 (and both engines' oracles) must compute; a single
    * definition so the two faces can never drift apart. */
  private def sq8QueryPrep(queries: DataFrame,
      stats: DataFrame): DataFrame =
    queries.crossJoin(broadcast(stats))
      .withColumn("qs", transform(col("qe"), (q, i) =>
        q.cast("double") *
          (element_at(col("mx"), i + 1) - element_at(col("mn"), i + 1)) /
          lit(256.0)))
      .withColumn("qoff", aggregate(
        transform(col("qe"), (q, i) =>
          q.cast("double") * element_at(col("mn"), i + 1) +
            lit(0.5) * element_at(col("qs"), i + 1)),
        lit(0.0), _ + _))
      .select(col("qid"), col("qe"), col("qs"), col("qoff"))

  def annSq8(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val s = corpus.sparkSession
    val stats = sq8Stats(corpus)
    val coded = sq8Encoded(corpus)
    val qPrep = sq8QueryPrep(queries, stats)
    val cand = coded.join(broadcast(qPrep), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (col("qoff") +
          graft.plans.GraftFunctions.sq8Dot(s, col("codes"), col("qs")))
          .as("approx"))
    val wa = Window.partitionBy(col("qid"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val top = cand.withColumn("_r", row_number().over(wa))
      .filter(col("_r") <= ReRank)
      .select(col("qid"), col("vec_id"))
    exactReRank(corpus, queries, top, k)
  }

  def s17(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    annSq8(e, queriesDf(e))
  }

  /** DuckDB replay of s17: per-dim min/max as ordered lists, the same
    * floor-quantize and midpoint-reconstruct expressions over an
    * inlined 1..Dim index list (the s04 list_transform pattern), then
    * s04's re-rank tail. */
  lazy val s17Sql: String = {
    val idx = (1 to Dim).mkString("[", ",", "]")
    s"""WITH st AS (
         SELECT list(mn ORDER BY d) AS mn, list(mx ORDER BY d) AS mx
         FROM (SELECT d, min(embedding[d]::DOUBLE) AS mn,
                      max(embedding[d]::DOUBLE) AS mx
               FROM embeddings
               CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS d)
               GROUP BY d)),
       codes AS (
         SELECT vec_id,
           list_transform($idx, d -> CASE WHEN mx[d] = mn[d] THEN 0
             ELSE least(255, floor((embedding[d]::DOUBLE - mn[d]) * 256.0
                                   / (mx[d] - mn[d])))::INT END) AS cl
         FROM embeddings CROSS JOIN st),
       q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
             WHERE vec_id % $QueryStride = 0),
       qp AS (SELECT qid, qe,
                list_transform($idx,
                  d -> qe[d]::DOUBLE * (mx[d] - mn[d]) / 256.0) AS qs
              FROM q CROSS JOIN st),
       qp2 AS (SELECT qid, qs,
                 list_sum(list_transform($idx,
                   d -> qe[d]::DOUBLE * mn[d] + 0.5 * qs[d])) AS qoff
               FROM qp CROSS JOIN st),
       cand AS (
         SELECT qid, c.vec_id,
           qoff + list_sum(list_transform(list_zip(qs, cl), x -> x[1]*x[2])) AS approx
         FROM codes c CROSS JOIN qp2 WHERE c.vec_id <> qp2.qid),
       top AS (SELECT qid, vec_id FROM
               (SELECT qid, vec_id,
                  row_number() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS r
                FROM cand) WHERE r <= $ReRank),
       ex AS (SELECT qid, t.vec_id,
                list_sum(list_transform(list_zip(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), x -> x[1]*x[2]))
                / (sqrt(list_sum(list_transform(q.embedding::DOUBLE[], x -> x*x)))
                 * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x)))) AS cos
              FROM top t
              JOIN embeddings e ON e.vec_id = t.vec_id
              JOIN embeddings q ON q.vec_id = t.qid),
       r AS (SELECT qid, vec_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
             FROM ex)
       SELECT qid, rank, vec_id, cos FROM r WHERE rank <= $TopK"""
  }

  // ---------------------------------------------------------------
  // s18: IVF-SQ8 — the remaining cell of the IVF × compression
  // matrix (s03: IVF over raw floats; s04: flat SQ-less PQ; s05:
  // IVF-PQ; s17: flat SQ8): prune FIRST with the s03b coarse
  // quantizer (probe CoreProbes of CoreCells cells), then run s17's
  // factored SQ8 scan only within probed cells, then s04's exact
  // re-rank tail. FAISS's IVF,SQ8 — the index a pipeline picks when
  // PQ recall is not acceptable but raw floats don't fit: 4× byte
  // reduction AND cells/probes candidate pruning. Fully
  // deterministic (pinned centroids + floor quantization), so the
  // composed DuckDB replay is bit-exact.
  //
  // Scale: the compressed corpus is ONE narrow pass storing (cell,
  // 64 code bytes); a query touches probes/cells of it; the stats
  // row and the |Q|·probes prep frame broadcast; the hot loop is the
  // same native graft_sq8dot as s17 over a CoreProbes/CoreCells
  // slice of the pairs.
  // ---------------------------------------------------------------
  def annIvfSq8(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val s = corpus.sparkSession
    val stats = sq8Stats(corpus)
    // one narrow pass: coarse cell (the shared s03b assignment) +
    // SQ8 codes — the persisted form
    val assigned = assignCells(corpus)
      .crossJoin(broadcast(stats))
      .select(col("vec_id"), col("cell"), sq8Codes.as("codes"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("cell").asc)
    val probes = queries
      .select(col("qid"), posexplode(cellDots(s, col("qe"))))
      .withColumnsRenamed(Map("pos" -> "cell", "col" -> "qcos"))
      .withColumn("_pr", row_number().over(wq))
      .filter(col("_pr") <= CoreProbes)
      .select(col("qid"), col("cell"))
    // s17's factored query prep, computed ONCE per query, then fanned
    // to its probe cells by a |Q|-sized join (both frames broadcast)
    val qPrep = sq8QueryPrep(queries, stats)
      .select(col("qid"), col("qs"), col("qoff"))
    val probeQ = probes.join(qPrep, "qid")
    val cand = assigned.join(broadcast(probeQ), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (col("qoff") +
          graft.plans.GraftFunctions.sq8Dot(s, col("codes"), col("qs")))
          .as("approx"))
    val wa = Window.partitionBy(col("qid"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val top = cand.withColumn("_r", row_number().over(wa))
      .filter(col("_r") <= ReRank)
      .select(col("qid"), col("vec_id"))
    exactReRank(corpus, queries, top, k)
  }

  def s18(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    annIvfSq8(e, queriesDf(e))
  }

  /** DuckDB replay of s18 — s05's cent/ec/asg/probe CTEs composed
    * with s17's st/codes/qp CTEs, candidates restricted to probed
    * cells. */
  lazy val s18Sql: String = {
    def centLit(c: Int): String =
      (0 until Dim).map(d => centroidSign(c, d).toString)
        .mkString("[", ",", "]") + "::DOUBLE[]"
    val centRows = (0 until CoreCells).map(c => s"($c, ${centLit(c)})")
      .mkString(",\n         ")
    val idx = (1 to Dim).mkString("[", ",", "]")
    s"""WITH cent(cell, cv) AS (VALUES
         $centRows),
       ec AS (SELECT e.vec_id, c.cell,
                list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cv), x -> x[1]*x[2])) AS cdot
              FROM embeddings e CROSS JOIN cent c),
       asg AS (SELECT vec_id, cell FROM
               (SELECT vec_id, cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cell) AS rn
                FROM ec) WHERE rn = 1),
       st AS (
         SELECT list(mn ORDER BY d) AS mn, list(mx ORDER BY d) AS mx
         FROM (SELECT d, min(embedding[d]::DOUBLE) AS mn,
                      max(embedding[d]::DOUBLE) AS mx
               FROM embeddings
               CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS d)
               GROUP BY d)),
       codes AS (
         SELECT vec_id,
           list_transform($idx, d -> CASE WHEN mx[d] = mn[d] THEN 0
             ELSE least(255, floor((embedding[d]::DOUBLE - mn[d]) * 256.0
                                   / (mx[d] - mn[d])))::INT END) AS cl
         FROM embeddings CROSS JOIN st),
       pr AS (SELECT qid, cell FROM
              (SELECT vec_id AS qid, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cell) AS pr
               FROM ec WHERE vec_id % $QueryStride = 0) WHERE pr <= $CoreProbes),
       q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
             WHERE vec_id % $QueryStride = 0),
       qp AS (SELECT qid, qe,
                list_transform($idx,
                  d -> qe[d]::DOUBLE * (mx[d] - mn[d]) / 256.0) AS qs
              FROM q CROSS JOIN st),
       qp2 AS (SELECT qid, qs,
                 list_sum(list_transform($idx,
                   d -> qe[d]::DOUBLE * mn[d] + 0.5 * qs[d])) AS qoff
               FROM qp CROSS JOIN st),
       cand AS (
         SELECT qp2.qid, a.vec_id,
           qoff + list_sum(list_transform(list_zip(qs, cl), x -> x[1]*x[2])) AS approx
         FROM asg a
         JOIN pr ON a.cell = pr.cell
         JOIN codes c ON c.vec_id = a.vec_id
         JOIN qp2 ON qp2.qid = pr.qid
         WHERE a.vec_id <> qp2.qid),
       top AS (SELECT qid, vec_id FROM
               (SELECT qid, vec_id,
                  row_number() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS r
                FROM cand) WHERE r <= $ReRank),
       ex AS (SELECT qid, t.vec_id,
                list_sum(list_transform(list_zip(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), x -> x[1]*x[2]))
                / (sqrt(list_sum(list_transform(q.embedding::DOUBLE[], x -> x*x)))
                 * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x)))) AS cos
              FROM top t
              JOIN embeddings e ON e.vec_id = t.vec_id
              JOIN embeddings q ON q.vec_id = t.qid),
       r AS (SELECT qid, vec_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
             FROM ex)
       SELECT qid, rank, vec_id, cos FROM r WHERE rank <= $TopK"""
  }

  // ---------------------------------------------------------------
  // s11: kNN classification over the ANN stack — the serving-side
  // CONSUMER of s01–s05: predict each query vector's label by
  // majority vote among its exact top-k cosine neighbors, scored
  // against the embeddings table's own labels (leave-one-out: the
  // query never votes for itself — s01 already excludes it). The
  // label column has sat unused by the similarity family until now;
  // this face closes the loop retrieval → prediction → evaluation.
  //
  // Vote tie-break is total and deterministic: most votes, then best
  // top neighbor rank within the tied label (nearest-neighbor
  // preference, the standard kNN tie rule), then smallest label.
  //
  // Scale: everything downstream of the s01 top-k frame is
  // query-set-sized (|Q| × k rows) — the vote, the window and the
  // label joins are trivially broadcast-able; the corpus is touched
  // exactly once, inside s01.
  // ---------------------------------------------------------------

  /** kNN majority vote over a (qid, rank, vec_id, cos) top-k frame
    * and a (vec_id, label) frame: one row per qid with the predicted
    * and true label. */
  def knnClassify(topk: DataFrame, labels: DataFrame): DataFrame = {
    val votes = topk
      .join(labels.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("qid"), col("label"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("best_rank").asc, col("label").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(labels.select(col("vec_id").as("qid"),
        col("label").as("true_label")), "qid")
      .select(col("qid"), col("true_label"),
        col("label").as("pred_label"), col("votes"),
        (col("label") === col("true_label")).as("correct"))
  }

  def s11(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    knnClassify(s01(s, dir), e)
  }

  val s11Sql: String =
    s"""WITH topk AS ($s01Sql),
       votes AS (SELECT qid, label, count(*) AS votes, min(rank) AS best_rank
                 FROM topk JOIN embeddings e ON e.vec_id = topk.vec_id
                 GROUP BY 1, 2),
       best AS (SELECT qid, label, votes,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY votes DESC, best_rank, label) AS rn
                FROM votes)
       SELECT b.qid, q.label AS true_label, b.label AS pred_label,
         b.votes, b.label = q.label AS correct
       FROM best b JOIN embeddings q ON q.vec_id = b.qid
       WHERE rn = 1"""

  // ---------------------------------------------------------------
  // d13: semantic deduplication (SemDeDup, Abbas et al. 2023) — the
  // embedding-space counterpart of d01/d05: cluster the corpus with
  // the coarse quantizer, then WITHIN each cluster drop every vector
  // that has a lower-id neighbor above the cosine threshold (keep-
  // first, the d01 rule — the lowest id of every near-dup chain
  // survives). d05 detects pairs given a blocking label; d13 derives
  // the blocking from the data (the pinned ±1 codebook, so the whole
  // dataflow stays DuckDB-replayable — trained KMeans would make it
  // engine-specific like s03) and makes the REMOVAL decision.
  //
  // Scale: assignment is a narrow codegen'd map; the pair join is
  // cell-bucketed (candidates meet inside a cell, never all-pairs —
  // at 100 TB the quantizer bounds candidate counts exactly like
  // s03's IVF bounds probe counts); the removal aggregation shuffles
  // only surviving pairs.
  // ---------------------------------------------------------------

  val SemDedupThreshold = 0.4 // the d05 near-dup bar, cell-blocked

  /** Removed-vector report over any (vec_id, embedding) frame:
    * (vec_id, cell, dup_of, n_dups) — one row per DROPPED vector,
    * dup_of = its smallest lower-id near-neighbor in the cell. */
  def semanticDedup(corpus: DataFrame,
      threshold: Double = SemDedupThreshold): DataFrame = {
    val s = corpus.sparkSession
    val asg = assignCells(corpus)
      .repartition(col("cell"))
      .transform(graft.CacheRegistry.register)
    val a = asg.select(col("cell"), col("vec_id").as("a"),
      col("embedding").as("ea"))
    val b = asg.select(col("cell"), col("vec_id").as("b"),
      col("embedding").as("eb"))
    a.join(b, Seq("cell"))
      .filter(col("a") < col("b"))
      .select(col("cell"), col("a"), col("b"),
        graft.plans.GraftFunctions.cosine(s, col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col("cell"), col("b").as("vec_id"))
      .agg(min(col("a")).as("dup_of"), count(lit(1)).as("n_dups"))
      .select(col("vec_id"), col("cell"), col("dup_of"), col("n_dups"))
  }

  def d13(s: SparkSession, dir: String): DataFrame =
    semanticDedup(Tables.embeddings(s, dir))

  lazy val d13Sql: String = {
    def cvLit(c: Int): String =
      (0 until Dim).map(d => centroidSign(c, d).toString)
        .mkString("[", ",", "]") + "::DOUBLE[]"
    val centRows = (0 until CoreCells).map(c => s"($c, ${cvLit(c)})")
      .mkString(",\n         ")
    s"""WITH cent(cell, cv) AS (VALUES
         $centRows),
       ec AS (SELECT e.vec_id, e.embedding, c.cell,
                list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cv), x -> x[1]*x[2])) AS ccos
              FROM embeddings e CROSS JOIN cent c),
       asg AS (SELECT vec_id, embedding, cell FROM
               (SELECT vec_id, embedding, cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS rn
                FROM ec) WHERE rn = 1),
       p AS (SELECT a.cell, a.vec_id AS a, b.vec_id AS b
             FROM asg a JOIN asg b
             ON a.cell = b.cell AND a.vec_id < b.vec_id
             WHERE list_sum(list_transform(list_zip(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), x -> x[1]*x[2]))
               / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x*x)))
                * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x*x))))
               >= CAST('$SemDedupThreshold' AS DOUBLE))
       SELECT b AS vec_id, cell, min(a) AS dup_of, count(*) AS n_dups
       FROM p GROUP BY 1, 2"""
  }

  // ---------------------------------------------------------------
  // s12: ANN recall evaluation — the acceptance metric an ANN rollout
  // ships with, as a driver-checked FACE instead of a spec-only
  // property: per query, |approx top-k ∩ exact top-k| / k for the
  // pinned-codebook IVF (s03b) against brute force (s01). Everything
  // is |Q|×k-sized after the two retrievals; the join is on
  // (qid, vec_id) pairs.
  // ---------------------------------------------------------------
  def s12(s: SparkSession, dir: String): DataFrame = {
    val exact = s01(s, dir).select(col("qid"), col("vec_id"))
    val approx = s03b(s, dir).select(col("qid"), col("vec_id"),
      lit(1L).as("hit"))
    exact.join(approx, Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("qid"), col("k"), col("hits"),
        round(col("hits").cast("double") / col("k"), 6).as("recall"))
  }

  lazy val s12Sql: String =
    s"""WITH e AS ($s01Sql),
       a AS ($s03bSql)
       SELECT e.qid, count(*) AS k,
         CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*), 6) AS recall
       FROM e LEFT JOIN a ON e.qid = a.qid AND e.vec_id = a.vec_id
       GROUP BY 1"""

  // ---------------------------------------------------------------
  // s22: probe-budget recall curve — the d17 threshold-curve
  // methodology applied to ANN serving (s12 measures ONE operating
  // point; the curve is what a serving team actually tunes against):
  // corpus-wide recall@k of the IVF index at each probe budget,
  // against the s01 exact ground truth. One exact pass (cached —
  // ground truth is probe-independent) + one cell-probe pass per
  // budget; counts are exact integers and the only division is the
  // final rounded recall, so the whole curve is driver-checked.
  // ---------------------------------------------------------------
  val CurveProbes: Seq[Int] = Seq(1, 2, 4)

  /** (probes, expected, hits, recall) — micro recall@k over all
    * queries, one row per probe budget. */
  def recallCurve(corpus: DataFrame, queries: DataFrame,
      probesList: Seq[Int] = CurveProbes, k: Int = TopK): DataFrame = {
    val exact = annBruteForce(corpus, queries, k)
      .select(col("qid"), col("vec_id"))
      .transform(graft.CacheRegistry.register) // one ground-truth pass, |Q|·k rows
    probesList.map { p =>
      val approx = annIvfCore(corpus, queries, k, numProbes = p)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("qid", "vec_id"), "left")
        .agg(count(lit(1)).as("expected"),
          sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(lit(p.toLong).as("probes"), col("expected"), col("hits"),
          round(col("hits").cast("double") / col("expected"), 6).as("recall"))
    }.reduce(_ unionByName _)
  }

  def s22(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    recallCurve(e, queriesDf(e))
  }

  lazy val s22Sql: String = {
    val rows = CurveProbes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS probes, count(*) AS expected,
           CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
           round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*), 6) AS recall
         FROM e LEFT JOIN (${ivfCoreSql(filtered = false, numProbes = p)}) a
           ON e.qid = a.qid AND e.vec_id = a.vec_id"""
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS ($s01Sql)
       $rows"""
  }

  // ---------------------------------------------------------------
  // s13: MMR diversified re-rank (Carbonell & Goldstein 1998) — the
  // result-diversification pass a retrieval stack runs over its
  // top-k: greedily pick argmax of λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s)
  // so near-duplicate hits don't crowd the page. The greedy loop is
  // SEQUENTIAL — expressed as a FIXED-ITERATION relational unroll
  // (the g03 fixpoint pattern): MmrK steps, each an anti-join
  // (remaining pool) + a max-sim join against the selected set + a
  // per-query rank-1 pick, all over the cached pool/pair-sim frames.
  // Per query the pool is MmrPool rows and the pair-sim frame
  // MmrPool² — everything after the s01-style scan is
  // query-set-sized. Doubles are safe here BECAUSE the cosines are
  // the proven bit-exact s01 machinery and λ ships string-pinned;
  // ordering ties break on vec_id (total). One lazy plan, no
  // per-step materialization (fixed iteration ⇒ linear lineage).
  // ---------------------------------------------------------------
  val MmrPool = 10
  val MmrK = 5
  val MmrLambda = "0.7"

  def s13(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    mmr(e, queriesDf(e))
  }

  /** MMR over any (vec_id, embedding) corpus + (qid, qe) query set. */
  def mmr(e: DataFrame, queries: DataFrame): DataFrame = {
    val s = e.sparkSession
    val pool = annBruteForce(e, queries, MmrPool)
      .withColumnRenamed("cos", "rel")
      .transform(graft.CacheRegistry.register)
    // pairwise sims inside each query's pool
    // the pair frame is query-set-sized (|Q|·MmrPool² rows) — always
    // the broadcast side against the corpus-scale embedding table
    val ea = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val eb = e.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val pairSims = ea.join(
        broadcast(pool.select(col("qid"), col("vec_id").as("a"))
          .join(pool.select(col("qid"), col("vec_id").as("b")), Seq("qid"))
          .filter(col("a") =!= col("b"))), Seq("a"))
      .join(eb, Seq("b"))
      .select(col("qid"), col("a"), col("b"),
        graft.plans.GraftFunctions.cosine(s, col("ea"), col("eb")).as("sim"))
      .transform(graft.CacheRegistry.register)
    // The greedy loop is sequential PER QUERY and the per-query frame
    // is MmrPool + MmrPool² rows by construction — so after the two
    // declarative corpus passes above, the selection runs as one
    // cogroup shuffle with the loop local to each query group (the
    // sessionize precedent: per-key sequential logic belongs in a
    // grouped map, not in an N-step relational unroll whose 4 rounds
    // of anti-join/agg/window each pay full stage overhead for
    // query-set-sized data — measured 8-18 s vs ~2 s at sf0.1).
    // Score arithmetic is the SAME IEEE ops the oracle's unrolled SQL
    // runs (lam*rel - (1-lam)*max sim on bit-identical cosines), so
    // parity carries over; ties break on vec_id, a total order.
    import s.implicits._
    val lamD = MmrLambda.toDouble
    val picks = pool.select(col("qid"), col("vec_id"), col("rel"))
      .as[(Long, Long, Double)].groupByKey(_._1)
      .cogroup(pairSims.as[(Long, Long, Long, Double)].groupByKey(_._1)) {
        (qid, poolIt, simIt) =>
          val cands = poolIt.map(t => (t._2, t._3)).toArray.sortBy(_._1)
          val sim = simIt.map(t => ((t._2, t._3), t._4)).toMap
          val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
          val out = scala.collection.mutable.ListBuffer
            .empty[(Long, Int, Long, Double)]
          (1 to math.min(MmrK, cands.length)).foreach { step =>
            var bestId = -1L
            var bestScore = Double.NegativeInfinity
            cands.foreach { case (id, rel) =>
              if (!selected.contains(id)) {
                val ms =
                  if (selected.isEmpty) 0.0
                  else selected.map(s => sim((id, s))).max
                val score = lamD * rel - (1.0 - lamD) * ms
                // argmax, tie -> smaller vec_id (cands are id-sorted,
                // so strict > keeps the first, i.e. smallest, id)
                if (score > bestScore) { bestScore = score; bestId = id }
              }
            }
            selected += bestId
            out += ((qid, step, bestId, bestScore))
          }
          out.iterator
      }
      .toDF("qid", "step", "vec_id", "mmr_score")
    picks.select(col("qid"), col("step"), col("vec_id"),
      round(col("mmr_score"), 6).as("mmr_score"))
  }

  val s13Sql: String = {
    val lam = s"CAST('$MmrLambda' AS DOUBLE)"
    val cosExpr = (x: String, y: String) =>
      s"""list_sum(list_transform(list_zip($x::DOUBLE[], $y::DOUBLE[]), v -> v[1]*v[2]))
         / (sqrt(list_sum(list_transform($x::DOUBLE[], v -> v*v)))
          * sqrt(list_sum(list_transform($y::DOUBLE[], v -> v*v))))"""
    val steps = (2 to MmrK).map { j =>
      s"""ms$j AS (SELECT r.qid, r.vec_id, r.rel, max(ps.sim) AS ms
             FROM pool r
             JOIN ps ON ps.qid = r.qid AND ps.a = r.vec_id
             JOIN sel${j - 1} s ON s.qid = ps.qid AND s.vec_id = ps.b
             WHERE NOT EXISTS (SELECT 1 FROM sel${j - 1} x
                               WHERE x.qid = r.qid AND x.vec_id = r.vec_id)
             GROUP BY 1, 2, 3),
       pick$j AS (SELECT qid, vec_id, $j AS step,
                    $lam * rel - (1 - $lam) * ms AS mmr_score
                  FROM (SELECT qid, vec_id, rel, ms,
                          row_number() OVER (PARTITION BY qid
                            ORDER BY $lam * rel - (1 - $lam) * ms DESC,
                            vec_id) AS rn
                        FROM ms$j)
                  WHERE rn = 1),
       sel$j AS (SELECT * FROM sel${j - 1} UNION ALL SELECT * FROM pick$j)"""
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                  WHERE vec_id % $QueryStride = 0),
       c AS (SELECT qid, vec_id, ${cosExpr("qe", "embedding")} AS rel
             FROM q, embeddings WHERE vec_id <> qid),
       pool AS (SELECT qid, vec_id, rel FROM (
                  SELECT qid, vec_id, rel,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY rel DESC, vec_id) AS rank
                  FROM c) WHERE rank <= $MmrPool),
       ps AS (SELECT p1.qid, p1.vec_id AS a, p2.vec_id AS b,
                ${cosExpr("e1.embedding", "e2.embedding")} AS sim
              FROM pool p1
              JOIN pool p2 ON p1.qid = p2.qid AND p1.vec_id <> p2.vec_id
              JOIN embeddings e1 ON e1.vec_id = p1.vec_id
              JOIN embeddings e2 ON e2.vec_id = p2.vec_id),
       sel1 AS (SELECT qid, vec_id, 1 AS step, $lam * rel AS mmr_score
                FROM (SELECT qid, vec_id, rel,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY rel DESC, vec_id) AS rank
                      FROM pool) WHERE rank = 1),
       $steps
       SELECT qid, step, vec_id, round(mmr_score, 6) AS mmr_score
       FROM sel$MmrK"""
  }

  // ---------------------------------------------------------------
  // s14: centroid-prototypicality pruning — the data-pruning member
  // of the embedding family (d05/d13 drop near-DUPLICATES; s14 ranks
  // every member of a cluster by closeness to the cluster CENTROID
  // and flags the most prototypical slice). This is the
  // self-supervised prototype metric of Sorscher et al. 2022
  // ("Beyond neural scaling laws"): against an abundant corpus the
  // most prototypical (easiest) examples are the ones worth
  // dropping, and SemDeDup-style pipelines apply the same
  // centroid-distance ranking inside k-means cells. The cluster key
  // here is the embeddings table's `label` column — the operator
  // takes any (vec_id, embedding, label) frame, so IVF cell ids
  // (s03) or semantic-dedup cells (d13) slot in unchanged.
  //
  // Oracle parity: the centroid is a cross-ROW mean per dimension,
  // so unlike the per-pair list-fold cosines (s01's fixed in-list
  // order) its sum order is plan-dependent — every cross-row sum
  // here (centroid accumulation, dot products, both norms) therefore
  // rounds its terms to 6 and sums in DECIMAL(25,8) (the t09/s10
  // discipline: order-invariant, engine-exact), with one double
  // division / sqrt at the end and display rounding only. The prune
  // boundary is integer arithmetic (rank ≤ n·20 DIV 100) — no float
  // ties.
  //
  // Scale: two narrow shuffles over the exploded (row, dim) frame —
  // one (label, dim)-keyed centroid aggregate (combiner-friendly,
  // output is #labels × dims — tiny), one (vec_id)-keyed rollup for
  // the dots; the ranking window partitions by label, whose width is
  // a CELL, not the corpus (IVF cells and semantic-dedup buckets are
  // capacity-bounded by construction; a degenerate one-label corpus
  // would need the q04 TakeOrdered shaping instead, documented
  // here). No pair joins anywhere — cost is O(rows × dims).
  // ---------------------------------------------------------------

  /** Prototype slice size: flag the top 20% most-central members of
    * each cluster. */
  val PrunePct = 20

  /** Per-cluster prototypicality ranking of (vec_id, embedding,
    * label): (label, vec_id, cos_centroid, rank, n_label, pruned). */
  def centroidPrune(e: DataFrame, prunePct: Int = PrunePct): DataFrame = {
    val dec = (c: Column) => round(c, 6).cast("decimal(25,8)")
    val ex = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("d", "v0")))
      .select(col("vec_id"), col("label"), col("d"),
        col("v0").cast("double").as("v"))
      .transform(graft.CacheRegistry.register) // feeds centroid AND dots
    val cent = ex.groupBy(col("label"), col("d"))
      .agg((sum(dec(col("v"))).cast("double") / count(lit(1))).as("c"))
      .transform(graft.CacheRegistry.register) // feeds dots AND its norm
    val dots = ex.join(cent, Seq("label", "d"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(dec(col("v") * col("c"))).cast("double").as("num"),
        sum(dec(col("v") * col("v"))).cast("double").as("nd"))
    val cn = cent.groupBy(col("label"))
      .agg(sum(dec(col("c") * col("c"))).cast("double").as("nc"))
    val wr = Window.partitionBy(col("label"))
      .orderBy(col("cos_centroid").desc, col("vec_id").asc)
    dots.join(cn, "label")
      .select(col("label"), col("vec_id"),
        round(col("num") / (sqrt(col("nd")) * sqrt(col("nc"))), 6)
          .as("cos_centroid"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .withColumn("n_label",
        count(lit(1)).over(Window.partitionBy(col("label"))).cast("long"))
      .withColumn("pruned", col("rank") <= expr(s"(n_label * $prunePct) DIV 100"))
  }

  def s14(s: SparkSession, dir: String): DataFrame =
    centroidPrune(Tables.embeddings(s, dir))

  val s14Sql: String =
    s"""WITH ex AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS d,
           CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
       cent AS (SELECT label, d,
                  CAST(sum(CAST(round(v, 6) AS DECIMAL(25,8))) AS DOUBLE) / count(*) AS c
                FROM ex GROUP BY 1, 2),
       dots AS (SELECT ex.vec_id, ex.label,
                  CAST(sum(CAST(round(ex.v * cent.c, 6) AS DECIMAL(25,8))) AS DOUBLE) AS num,
                  CAST(sum(CAST(round(ex.v * ex.v, 6) AS DECIMAL(25,8))) AS DOUBLE) AS nd
                FROM ex JOIN cent ON ex.label = cent.label AND ex.d = cent.d
                GROUP BY 1, 2),
       cn AS (SELECT label, CAST(sum(CAST(round(c * c, 6) AS DECIMAL(25,8))) AS DOUBLE) AS nc
              FROM cent GROUP BY 1),
       cs AS (SELECT d.vec_id, d.label,
                round(d.num / (sqrt(d.nd) * sqrt(cn.nc)), 6) AS cos_centroid
              FROM dots d JOIN cn ON d.label = cn.label),
       rk AS (SELECT *, row_number() OVER (PARTITION BY label
                ORDER BY cos_centroid DESC, vec_id) AS rank,
                count(*) OVER (PARTITION BY label) AS n_label FROM cs)
       SELECT label, vec_id, cos_centroid, rank, n_label,
         rank <= (n_label * $PrunePct) // 100 AS pruned
       FROM rk"""

  // ---------------------------------------------------------------
  // s20: hard-negative mining — the retrieval-TRAINING-data face (the
  // DPR/contrastive-learning data prep step beside the serving faces):
  // for each query, the top-k most-similar corpus vectors whose label
  // DIFFERS from the query's (label = the positive/topic grouping),
  // plus the query's best positive cosine and the margin. A negative
  // that outranks or crowds the positive is exactly the "hard"
  // example a contrastive trainer wants; margin ≤ 0 flags the queries
  // whose positives are currently beaten.
  //
  // Scale: the exclusion predicate (label ≠ qlabel) is composed into
  // the broadcast candidate join — never a post-filter over a wider
  // top-k (a post-filter would under-fill k when positives crowd the
  // head, the s21 commute lesson). Two independent corpus passes
  // (negatives ranked via the WindowGroupLimit pushdown; positives
  // reduced map-side to one max per query), each a broadcast join +
  // partial agg — the corpus is never shuffled or cached. At index
  // scale the same predicate composes into s21's cell-probe join
  // (filtered ANN) verbatim; this face pins the EXACT baseline the
  // indexed variant is measured against (the s01/s12 convention).
  // ---------------------------------------------------------------

  private[operators] def queriesLabeled(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))

  /** Top-k cross-label hard negatives per query with the positive
    * margin: (qid, rank, vec_id, label, cos, pos_cos, margin). A
    * query whose label has no other member gets null pos_cos/margin
    * (no positive to compare — the left-join contract). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      k: Int = TopK): DataFrame = {
    val s = corpus.sparkSession
    val cos = graft.plans.GraftFunctions.cosine(s, col("qe"), col("embedding"))
    val negs = corpus
      .join(broadcast(queries),
        col("vec_id") =!= col("qid") && col("label") =!= col("qlabel"))
      .select(col("qid"), col("vec_id"), col("label"), cos.as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val ranked = negs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val pos = corpus
      .join(broadcast(queries),
        col("vec_id") =!= col("qid") && col("label") === col("qlabel"))
      .groupBy(col("qid")).agg(max(cos).as("pos_cos"))
    // pos is one row per query (queries-sized by construction) —
    // broadcast it so the final enrich never plans a shuffle
    ranked.join(broadcast(pos), Seq("qid"), "left")
      .select(col("qid"), col("rank"), col("vec_id"), col("label"),
        col("cos"), col("pos_cos"),
        (col("pos_cos") - col("cos")).as("margin"))
  }

  def s20(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    hardNegatives(e, queriesLabeled(e))
  }

  val s20Sql: String = {
    val cosOf = (v: String) =>
      s"""list_sum(list_transform(list_zip(qe::DOUBLE[], $v::DOUBLE[]), x -> x[1]*x[2]))
               / (sqrt(list_sum(list_transform(qe::DOUBLE[], x -> x*x)))
                * sqrt(list_sum(list_transform($v::DOUBLE[], x -> x*x))))"""
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
                  FROM embeddings WHERE vec_id % $QueryStride = 0),
       negs AS (SELECT qid, vec_id, label, ${cosOf("embedding")} AS cos
                FROM q, embeddings WHERE vec_id <> qid AND label <> qlabel),
       r AS (SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY cos DESC, vec_id) AS rank
             FROM negs),
       pos AS (SELECT qid, max(${cosOf("embedding")}) AS pos_cos
               FROM q, embeddings WHERE vec_id <> qid AND label = qlabel
               GROUP BY qid)
       SELECT r.qid, rank, vec_id, label, cos, pos_cos,
         pos_cos - cos AS margin
       FROM r LEFT JOIN pos ON r.qid = pos.qid WHERE rank <= $TopK"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s20_hard_negatives" -> (s20 _),
    "s14_centroid_prune" -> (s14 _),
    "s13_mmr" -> (s13 _),
    "s12_ann_recall" -> (s12 _),
    "s11_knn_classify" -> (s11 _),
    "d13_semantic_dedup" -> (d13 _),
    "s01_ann_bruteforce" -> (s01 _),
    "s02_ann_lsh" -> (s02 _),
    "s03_ann_ivf" -> (s03 _),
    "s03b_ivf_core" -> (s03b _),
    "s04_pq_adc" -> (s04 _),
    "s05_ivfpq" -> (s05 _),
    "s17_ann_sq8" -> (s17 _),
    "s18_ivf_sq8" -> (s18 _),
    "s21_filtered_ann" -> (s21 _),
    "s22_recall_curve" -> (s22 _))

  val oracles: Map[String, String] = Map(
    "s20_hard_negatives" -> s20Sql,
    "s14_centroid_prune" -> s14Sql,
    "s13_mmr" -> s13Sql,
    "s12_ann_recall" -> s12Sql,
    "s11_knn_classify" -> s11Sql,
    "d13_semantic_dedup" -> d13Sql,
    "s01_ann_bruteforce" -> s01Sql,
    "s02_ann_lsh" -> s02Sql,
    "s03b_ivf_core" -> s03bSql,
    "s04_pq_adc" -> s04Sql,
    "s05_ivfpq" -> s05Sql,
    "s17_ann_sq8" -> s17Sql,
    "s18_ivf_sq8" -> s18Sql,
    "s21_filtered_ann" -> s21Sql,
    "s22_recall_curve" -> s22Sql)
}
