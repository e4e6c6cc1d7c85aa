package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the documents corpus — the engine-side
  * analogs of the reference deployment's Elasticsearch retrieval
  * primitives (the reference indexes every listing into ES and its
  * pollers/dashboards query by `match` relevance and fuzzy terms;
  * ingestion/index_template.json maps `title`/`description` as
  * analyzed `text`). A user running keyword search against the
  * reference's index needs the same capability here:
  *
  *  - s06: BM25-ranked top-k match query (Robertson/Sparck Jones;
  *    the scoring function behind ES `match` — Lucene practical
  *    scoring), with the Lucene IDF form `ln(1 + (N-df+0.5)/(df+0.5))`
  *    and classic `(k1+1)` tf saturation, k1=1.2 b=0.75.
  *  - s07: fuzzy term matching with ES `fuzziness: AUTO` edit budgets
  *    (len<=2 exact, 3..5 one edit, >5 two edits) resolved against a
  *    corpus vocabulary census, Levenshtein distance.
  *
  * Scale design: query terms are a handful of literals, so everything
  * query-sized is BROADCAST. s06 stages one slim cached frame
  * (doc_id, dl, matched-terms array — the full token array is never
  * materialized past the projection) and the only corpus-scale
  * shuffle is the (doc, term) tf aggregation over docs that matched
  * at least one term; df and corpus stats ride tiny broadcast joins
  * and top-k is TakeOrdered (rank materialized after the limit, so no
  * global window). In production N/avgdl/df come from an incrementally
  * maintained lexicon (the IncrementalStats pattern) rather than a
  * per-query census — the census here doubles as the oracle-checkable
  * construction of that lexicon. s07's vocabulary census is the
  * classic token-distinct rollup (vocab << corpus by Heaps' law); the
  * edit-distance probe runs vocab x |terms| against the broadcast
  * query set, never corpus x terms.
  */
object Search {

  val K1 = 1.2
  val B = 0.75
  val TopK = 20

  /** Mixed-selectivity match query over the synthetic corpus: "dup"
    * is rare (df ~5% of docs) so IDF dominates; the other two are
    * common terms that differentiate via tf saturation and length
    * normalization. */
  val QueryTerms: Seq[String] = Seq("dup", "merge", "hash")

  /** Fuzzy probes: one exact hit, typos at each AUTO edit budget, and
    * one ("tabel" -> "table", a transposition = 2 edits at a 1-edit
    * budget) that the AUTO cutoff correctly rejects. */
  val FuzzyTerms: Seq[String] =
    Seq("haash", "colum", "vectr", "qery", "merrge", "streem", "tabel", "scan")

  /** Exact double literal for the oracle: DuckDB parses the shortest
    * round-trip decimal back to the identical IEEE double (via a
    * string cast — a bare SQL decimal literal would be DECIMAL-typed
    * and could re-round differently mid-expression). */
  private def dlit(x: Double): String = s"CAST('$x' AS DOUBLE)"

  private def tokenized(docs: DataFrame): DataFrame =
    docs.filter(trim(col("text")) =!= "")
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))

  /** The BM25 per-term contribution over columns tf/dl/df/n/avgdl —
    * one expression shared by the match (s06) and phrase (s08) faces,
    * with [[bm25ScoreSql]] its token-for-token DuckDB replay. */
  private def bm25ScoreExpr: Column = {
    val idf = round(log(lit(1.0) +
      (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))), 6)
    val denom = col("tf").cast("double") +
      lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / col("avgdl"))
    round(idf * (col("tf").cast("double") * lit(K1 + 1)) / denom, 6)
  }

  private def bm25ScoreSql: String = {
    val half = dlit(0.5); val one = dlit(1.0)
    val k1 = dlit(K1); val k1p1 = dlit(K1 + 1); val omb = dlit(1.0 - B)
    val b = dlit(B)
    s"""round(round(ln($one + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + $half)/(CAST(df AS DOUBLE) + $half)), 6)
       * (CAST(tf AS DOUBLE) * $k1p1)
       / (CAST(tf AS DOUBLE) + $k1 * ($omb + $b * CAST(dl AS DOUBLE) / avgdl)), 6)"""
  }

  // ---------------------------------------------------------------
  // s06: BM25 top-k match query.
  // ---------------------------------------------------------------

  /** BM25 top-k of `terms` against `docs` (doc_id, text): returns
    * (rank, doc_id, score, terms_matched). Per-term contributions are
    * rounded and summed through DECIMAL so the per-doc score is
    * independent of aggregation order (and engine-portable). */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = TopK): DataFrame = {
    // slim staged frame: per-doc length + ONLY the query-term tokens
    // (the t05 lesson — stage arrays consumed by lambdas as columns);
    // consumed by both the tf branch and the corpus-stats branch, so
    // cache it rather than re-scan the corpus
    val toks = tokenized(docs)
      .select(col("doc_id"), size(col("w")).as("dl"),
        filter(col("w"), t => t.isin(terms: _*)).as("qw"))
      .transform(graft.CacheRegistry.register)
    val g = toks.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.select(col("doc_id"), col("dl"), explode(col("qw")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .transform(graft.CacheRegistry.register)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(g))
      .select(col("doc_id"), bm25ScoreExpr.as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c").cast("decimal(25,8)")).cast("double").as("score"),
        count(lit(1)).as("terms_matched"))
    // top-k via TakeOrdered (total order: doc_id tiebreak), THEN rank
    // over the k survivors — never a global single-partition window
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("score"), col("terms_matched"))
  }

  def s06(s: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(s, dir), QueryTerms)

  val s06Sql: String = {
    val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
    raw"""WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                  FROM documents WHERE trim(text) <> ''),
       g AS (SELECT count(*) AS n, CAST(sum(len(w)) AS DOUBLE)/count(*) AS avgdl FROM toks),
       tf AS (SELECT doc_id, dl, tk AS term, count(*) AS tf
              FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS tk FROM toks)
              WHERE tk IN ($termList) GROUP BY 1, 2, 3),
       dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       sc AS (SELECT doc_id, $bm25ScoreSql AS c
              FROM tf JOIN dfreq USING (term) CROSS JOIN g),
       agg AS (SELECT doc_id, CAST(sum(CAST(c AS DECIMAL(25,8))) AS DOUBLE) AS score,
                 count(*) AS terms_matched FROM sc GROUP BY 1),
       r AS (SELECT doc_id, score, terms_matched,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM agg)
       SELECT CAST(rank AS BIGINT) AS rank, doc_id, score,
         CAST(terms_matched AS BIGINT) AS terms_matched
       FROM r WHERE rank <= $TopK"""
  }

  // ---------------------------------------------------------------
  // s07: fuzzy term matching (ES fuzziness AUTO).
  // ---------------------------------------------------------------

  /** Resolve `terms` against the corpus vocabulary under AUTO edit
    * budgets: returns one row per (q_term, matched variant) with the
    * edit distance, the variant's doc frequency, and the number of
    * distinct docs matching ANY variant of that term. */
  def fuzzyMatch(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val s = docs.sparkSession
    // distinct (doc, token) pairs, cached pre-partitioned on token:
    // the vocab census aggregates on the cache's partitioning and the
    // doc-match probe is a broadcast join, so the corpus is shuffled
    // exactly once (SURVEY §5 multi-consumer cache rule)
    val pairs = tokenized(docs)
      .select(col("doc_id"), explode(col("w")).as("tok")).distinct()
      .repartition(col("tok"))
      .transform(graft.CacheRegistry.register)
    val vocab = pairs.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val q = s.createDataset(terms)(org.apache.spark.sql.Encoders.STRING)
      .toDF("q_term")
      .withColumn("max_edits",
        when(length(col("q_term")) <= 2, 0)
          .when(length(col("q_term")) <= 5, 1).otherwise(2))
    val variants = vocab.join(broadcast(q),
        levenshtein(col("q_term"), col("tok")) <= col("max_edits"))
      .select(col("q_term"), col("tok").as("variant"),
        levenshtein(col("q_term"), col("tok")).cast("long").as("dist"),
        col("df"))
      .transform(graft.CacheRegistry.register)
    val nDocs = pairs
      .join(broadcast(variants.select(col("q_term"), col("variant"))),
        col("tok") === col("variant"))
      .groupBy(col("q_term"))
      .agg(count_distinct(col("doc_id")).as("n_docs"))
    variants.join(broadcast(nDocs), "q_term")
      .select(col("q_term"), col("variant"), col("dist"), col("df"),
        col("n_docs"))
  }

  def s07(s: SparkSession, dir: String): DataFrame =
    fuzzyMatch(Tables.documents(s, dir), FuzzyTerms)

  val s07Sql: String = {
    val termList = FuzzyTerms.map(t => s"'$t'").mkString(", ")
    raw"""WITH toks AS (SELECT DISTINCT doc_id, tok FROM
                 (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                  FROM documents WHERE trim(text) <> '')),
       vocab AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1),
       q AS (SELECT unnest([$termList]) AS q_term),
       qd AS (SELECT q_term, CASE WHEN len(q_term) <= 2 THEN 0
                    WHEN len(q_term) <= 5 THEN 1 ELSE 2 END AS max_edits FROM q),
       v AS (SELECT q_term, tok AS variant, levenshtein(q_term, tok) AS dist, df
             FROM qd, vocab WHERE levenshtein(q_term, tok) <= max_edits),
       nd AS (SELECT v.q_term, count(DISTINCT t.doc_id) AS n_docs
              FROM v JOIN toks t ON t.tok = v.variant GROUP BY 1)
       SELECT v.q_term, v.variant, CAST(v.dist AS BIGINT) AS dist,
         CAST(v.df AS BIGINT) AS df, CAST(nd.n_docs AS BIGINT) AS n_docs
       FROM v JOIN nd ON v.q_term = nd.q_term"""
  }

  // ---------------------------------------------------------------
  // The production lexicon: s06 fits corpus stats (df/N/avgdl)
  // in-query, which is the oracle-checkable construction — at 100 TB
  // those stats are a fit-once artifact maintained incrementally and
  // shipped with the corpus (the RiskEngine stats-artifact pattern).
  // The artifact is EXACTLY mergeable (df/doc-count/token-sum are
  // sums), so a crawl delta updates the lexicon without a rescan, and
  // scoring from the artifact is bit-identical to the in-query census
  // (spec-pinned) — the same fold==recompute contract IncrementalStats
  // holds for the market stats.
  // ---------------------------------------------------------------

  /** Corpus lexicon: full-vocab doc frequencies + the corpus totals
    * BM25 needs. `stats` stores sum_dl (not avgdl) so merges stay
    * exact; avgdl is derived at scoring time. */
  case class Lexicon(vocab: DataFrame, stats: DataFrame)

  def fitLexicon(docs: DataFrame): Lexicon = {
    val toks = tokenized(docs)
    val vocab = toks.select(col("doc_id"), explode(array_distinct(col("w"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("w"))).as("sum_dl"))
    Lexicon(vocab, stats)
  }

  def writeLexicon(lex: Lexicon, path: String): Unit = {
    lex.vocab.write.mode("overwrite").parquet(s"$path/vocab")
    lex.stats.write.mode("overwrite").parquet(s"$path/stats")
  }

  def readLexicon(s: SparkSession, path: String): Lexicon =
    Lexicon(s.read.parquet(s"$path/vocab"), s.read.parquet(s"$path/stats"))

  /** Exact incremental maintenance: lexicon(a ∪ b) == merge(lexicon(a),
    * lexicon(b)) — all three fields are sums. */
  def mergeLexicons(a: Lexicon, b: Lexicon): Lexicon = {
    val vocab = a.vocab.unionByName(b.vocab)
      .groupBy(col("tok")).agg(sum(col("df")).as("df"))
    val stats = a.stats.unionByName(b.stats)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    Lexicon(vocab, stats)
  }

  /** The spec-pinned scoring/top-k block shared by [[bm25WithLexicon]]
    * and [[queryBm25Index]]: df/N/avgdl broadcast off the lexicon, the
    * decimal(25,8)-summed per-doc score, TakeOrdered top-k, then the
    * rank window over the k survivors. Lives in ONE place so a parity
    * fix (the s06 double rule, the tie-break order) cannot miss a
    * copy. `tf` must carry (doc_id, dl, term, tf). */
  private def scoreTfWithLexicon(tf: DataFrame, lex: Lexicon,
      terms: Seq[String], k: Int): DataFrame = {
    val dfreq = lex.vocab.filter(col("tok").isin(terms: _*))
      .select(col("tok").as("term"), col("df"))
    val g = lex.stats.select(col("n_docs").as("n"),
      (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(g))
      .select(col("doc_id"), bm25ScoreExpr.as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c").cast("decimal(25,8)")).cast("double").as("score"),
        count(lit(1)).as("terms_matched"))
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("score"), col("terms_matched"))
  }

  /** s06 scoring with df/N/avgdl from a prebuilt lexicon instead of an
    * in-query census — bit-identical to [[bm25]] on the same corpus
    * (the fit-once production path). */
  def bm25WithLexicon(docs: DataFrame, terms: Seq[String], lex: Lexicon,
      k: Int = TopK): DataFrame = {
    val tf = tokenized(docs)
      .select(col("doc_id"), size(col("w")).as("dl"),
        explode(filter(col("w"), t => t.isin(terms: _*))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    scoreTfWithLexicon(tf, lex, terms, k)
  }

  // ---------------------------------------------------------------
  // s08: phrase query (ES match_phrase, zero slop).
  // ---------------------------------------------------------------

  /** Adjacent-bigram phrase with tf variation in the corpus (one doc
    * contains it twice at sf0.01). */
  val PhraseTerms: Seq[String] = Seq("hash", "join")

  /** Phrase search: exact adjacent-token occurrences of `phrase`,
    * BM25-scored with the phrase as a single "term" (tf = occurrence
    * count, df = docs containing it). Returns (rank, doc_id, tf,
    * score). One corpus scan: the slim (doc_id, dl, tf) frame is
    * cached and feeds both the corpus stats and the match set. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
      k: Int = TopK): DataFrame = {
    require(phrase.length >= 2, "a phrase needs at least two tokens")
    val n = phrase.length
    val pstr = phrase.mkString(" ")
    val grams = when(size(col("w")) >= n,
      transform(sequence(lit(1), size(col("w")) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(col("w"), i + j)): _*)))
      .otherwise(array().cast("array<string>"))
    val perDoc = tokenized(docs)
      .select(col("doc_id"), size(col("w")).as("dl"), col("w"))
      .select(col("doc_id"), col("dl"),
        size(filter(grams, g => g === pstr)).cast("long").as("tf"))
      .transform(graft.CacheRegistry.register)
    val g = perDoc.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = perDoc.filter(col("tf") > 0)
    val dfreq = tf.agg(count(lit(1)).as("df"))
    val scored = tf.crossJoin(broadcast(dfreq)).crossJoin(broadcast(g))
      .select(col("doc_id"), col("tf"), bm25ScoreExpr.as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("tf"), col("score"))
  }

  def s08(s: SparkSession, dir: String): DataFrame =
    phraseSearch(Tables.documents(s, dir), PhraseTerms)

  val s08Sql: String = {
    val pstr = PhraseTerms.mkString(" ")
    raw"""WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                  FROM documents WHERE trim(text) <> ''),
       pd AS (SELECT doc_id, len(w) AS dl,
                len(list_filter(list_transform(generate_series(1, greatest(len(w)-1, 0)),
                  i -> w[i] || ' ' || w[i+1]), x -> x = '$pstr')) AS tf
              FROM toks),
       g AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM pd),
       tf AS (SELECT doc_id, dl, tf FROM pd WHERE tf > 0),
       dfq AS (SELECT count(*) AS df FROM tf),
       sc AS (SELECT doc_id, tf, $bm25ScoreSql AS score
              FROM tf CROSS JOIN dfq CROSS JOIN g),
       r AS (SELECT doc_id, tf, score,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc)
       SELECT CAST(rank AS BIGINT) AS rank, doc_id, CAST(tf AS BIGINT) AS tf,
         score
       FROM r WHERE rank <= $TopK"""
  }

  // ---------------------------------------------------------------
  // s09: hybrid retrieval — BM25 + vector, fused by Reciprocal Rank
  // Fusion (the ES 8 hybrid-search default). The corpus has no text
  // encoder, so the vector query comes from pseudo-relevance
  // feedback (Rocchio): the centroid of the top-PrfK BM25 hits'
  // embeddings — the classic IR bridge when queries arrive as text
  // but the index carries vectors. RRF(d) = Σ_lists 1/(60 + rank_d),
  // rank-only fusion, so the two retrievers' incomparable score
  // scales never meet.
  //
  // Scale: the lexical list is s06; the PRF centroid is a PrfK-row
  // join + one 64-row aggregation; the vector pass is one corpus
  // scan against the broadcast 1-row centroid (s01's shape); fusion
  // joins two k-row lists. Cosine here uses the double-HOF form, not
  // graft_cosine: the centroid is double-valued and the float-typed
  // native expression would quantize it differently than the oracle.
  // ---------------------------------------------------------------

  val PrfK = 3
  val RrfK = 60
  val HybridTopK = 10

  /** Index-ordered double cosine over two array<double> columns —
    * bit-identical to DuckDB's list lambdas. */
  private def dcos(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v * v)
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v * v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Hybrid top-k: RRF fusion of the BM25 list and a PRF-centroid
    * cosine list. Returns (rank, doc_id, rrf, rank_lex, rank_vec) —
    * absent-from-list ranks read 0. */
  def hybridSearch(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      k: Int = HybridTopK): DataFrame = {
    val lex = bm25(docs, terms, TopK)
      .select(col("doc_id"), col("rank").as("rank_lex"))
      .transform(graft.CacheRegistry.register)
    val qv = lex.filter(col("rank_lex") <= PrfK)
      .join(emb, col("vec_id") === col("doc_id"))
      .select(col("rank_lex").as("rk"), posexplode(col("embedding")))
      .groupBy(col("pos"))
      .agg(((sum(when(col("rk") === 1, col("col").cast("double")).otherwise(lit(0.0)))
          + sum(when(col("rk") === 2, col("col").cast("double")).otherwise(lit(0.0))))
          + sum(when(col("rk") === 3, col("col").cast("double")).otherwise(lit(0.0))))
        .as("qsum"))
      .select(col("pos"), (col("qsum") / lit(3.0)).as("q"))
    val qvec = qv.agg(sort_array(collect_list(struct(col("pos"), col("q"))))
        .as("ps"))
      .select(transform(col("ps"), p => p.getField("q")).as("qe"))
    val vc = emb.crossJoin(broadcast(qvec))
      .select(col("vec_id").as("doc_id"),
        dcos(col("qe"), col("embedding").cast("array<double>")).as("cos"))
    val vtop = vc.orderBy(col("cos").desc, col("doc_id").asc).limit(TopK)
    val vr = vtop.withColumn("rank_vec", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("rank_vec"))
    val fused = lex.join(vr, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(RrfK) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rank_vec")), lit(0.0)))
          .as("rrfraw"),
        coalesce(col("rank_lex"), lit(0L)).as("rank_lex"),
        coalesce(col("rank_vec"), lit(0L)).as("rank_vec"))
    val top = fused.orderBy(col("rrfraw").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("rrfraw").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), round(col("rrfraw"), 6).as("rrf"),
        col("rank_lex"), col("rank_vec"))
  }

  def s09(s: SparkSession, dir: String): DataFrame =
    hybridSearch(Tables.documents(s, dir), Tables.embeddings(s, dir),
      QueryTerms)

  val s09Sql: String = {
    val one = dlit(1.0); val zero = dlit(0.0); val three = dlit(3.0)
    val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
    val half = dlit(0.5); val k1 = dlit(K1); val k1p1 = dlit(K1 + 1)
    val omb = dlit(1.0 - B); val b = dlit(B)
    raw"""WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                  FROM documents WHERE trim(text) <> ''),
       g AS (SELECT count(*) AS n, CAST(sum(len(w)) AS DOUBLE)/count(*) AS avgdl FROM toks),
       tf AS (SELECT doc_id, dl, tk AS term, count(*) AS tf
              FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS tk FROM toks)
              WHERE tk IN ($termList) GROUP BY 1, 2, 3),
       dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       sc AS (SELECT doc_id, round(round(ln($one + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + $half)/(CAST(df AS DOUBLE) + $half)), 6)
                * (CAST(tf AS DOUBLE) * $k1p1)
                / (CAST(tf AS DOUBLE) + $k1 * ($omb + $b * CAST(dl AS DOUBLE) / avgdl)), 6) AS c
              FROM tf JOIN dfreq USING (term) CROSS JOIN g),
       agg AS (SELECT doc_id, CAST(sum(CAST(c AS DECIMAL(25,8))) AS DOUBLE) AS score FROM sc GROUP BY 1),
       lex AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex
               FROM agg QUALIFY rank_lex <= $TopK),
       pe AS (SELECT l.rank_lex AS rk, e.embedding AS emb FROM lex l
              JOIN embeddings e ON e.vec_id = l.doc_id WHERE l.rank_lex <= $PrfK),
       pos AS (SELECT rk, i, CAST(emb[i] AS DOUBLE) AS v FROM pe,
               LATERAL (SELECT unnest(generate_series(1, len(emb))) AS i)),
       qv AS (SELECT i, (sum(CASE WHEN rk = 1 THEN v ELSE 0 END)
                       + sum(CASE WHEN rk = 2 THEN v ELSE 0 END)
                       + sum(CASE WHEN rk = 3 THEN v ELSE 0 END)) / $three AS q
              FROM pos GROUP BY i),
       qvec AS (SELECT list(q ORDER BY i) AS qe FROM qv),
       vc AS (SELECT vec_id AS doc_id,
                list_sum(list_transform(list_zip(qe, embedding::DOUBLE[]), x -> x[1]*x[2]))
                / (sqrt(list_sum(list_transform(qe, x -> x*x)))
                 * sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))) AS cos
              FROM embeddings CROSS JOIN qvec),
       vr AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_vec
              FROM vc QUALIFY rank_vec <= $TopK),
       f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
               coalesce($one/($RrfK + l.rank_lex), $zero)
             + coalesce($one/($RrfK + v.rank_vec), $zero) AS rrfraw,
               coalesce(l.rank_lex, 0) AS rank_lex, coalesce(v.rank_vec, 0) AS rank_vec
             FROM lex l FULL OUTER JOIN vr v ON l.doc_id = v.doc_id),
       r2 AS (SELECT doc_id, rrfraw, rank_lex, rank_vec,
                row_number() OVER (ORDER BY rrfraw DESC, doc_id) AS rank FROM f)
       SELECT CAST(rank AS BIGINT) AS rank, doc_id, round(rrfraw, 6) AS rrf,
         CAST(rank_lex AS BIGINT) AS rank_lex, CAST(rank_vec AS BIGINT) AS rank_vec
       FROM r2 WHERE rank <= $HybridTopK"""
  }

  // ---------------------------------------------------------------
  // s10: ranking evaluation — the metrics harness that closes the
  // retrieval family: s06-s09 PRODUCE rankings, s10 MEASURES one
  // (precision@k / recall@k / MRR / graded NDCG@k), the numbers a
  // relevance dashboard or an offline eval of a retriever change
  // reports. Relevance labels are deterministic pseudo-qrels derived
  // from the corpus itself: a doc's grade = how many distinct query
  // terms it contains (0..3; binary-relevant at >= RelMin) — so the
  // whole evaluation is oracle-replayable with no external judgment
  // file, while the operator takes ANY (doc_id, rel) frame in
  // production.
  //
  // Oracle-parity: the DCG gain (2^rel - 1) / log2(rank + 1) is
  // computed as (2^rel - 1) * Ln2 / ln(rank + 1) with Ln2 pinned once
  // in Scala and shipped as a string-cast double (the s06 double
  // rule); every term is rounded then DECIMAL-summed; IDCG re-ranks
  // the SAME graded corpus ideally (rel desc, doc_id tiebreak).
  //
  // Scale: the ranking is k rows; grading is one narrow corpus scan
  // (no shuffle past the aggregation); IDCG's ideal head is
  // TakeOrdered, never a global window; the final row is a crossJoin
  // of 1-row aggregates.
  // ---------------------------------------------------------------

  val EvalK = 10
  /** Binary-relevance cut: docs carrying >= RelMin of the query terms. */
  val RelMin = 2
  /** ln(2), pinned once (shipped to the oracle as a string cast). */
  val Ln2: Double = math.log(2.0)

  /** Per-doc graded relevance vs `terms`: (doc_id, rel in 0..|terms|). */
  private def graded(docs: DataFrame, terms: Seq[String]): DataFrame =
    tokenized(docs).select(col("doc_id"),
      terms.map(t => when(array_contains(col("w"), t), 1L).otherwise(0L))
        .reduce(_ + _).as("rel"))

  /** Evaluate a (rank, doc_id) ranking against a (doc_id, rel) graded
    * frame: one row of k/n_rel/hits/precision/recall/mrr/dcg/idcg/ndcg. */
  def rankEval(ranking: DataFrame, rel: DataFrame, k: Int = EvalK): DataFrame = {
    val dcgTerm = round((pow(lit(2.0), col("rel")) - lit(1.0)) * lit(Ln2) /
      log(col("rk").cast("double") + lit(1.0)), 6)
    val judged = ranking.filter(col("rank") <= k)
      .join(rel, Seq("doc_id"), "left")
      .select(col("rank").as("rk"), coalesce(col("rel"), lit(0L)).as("rel"))
    val head = judged.agg(
      sum(when(col("rel") >= RelMin, 1L).otherwise(0L)).as("hits"),
      min(when(col("rel") >= RelMin, col("rk"))).as("first_rel"),
      sum(dcgTerm.cast("decimal(25,8)")).cast("double").as("dcg_k"))
    val nRel = rel.agg(
      sum(when(col("rel") >= RelMin, 1L).otherwise(0L)).as("n_rel"))
    val ideal = rel.orderBy(col("rel").desc, col("doc_id").asc).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rel").desc, col("doc_id").asc)).cast("long"))
      .agg(sum(dcgTerm.cast("decimal(25,8)")).cast("double").as("idcg_k"))
    head.crossJoin(nRel).crossJoin(ideal)
      .select(lit(k.toLong).as("k"), col("n_rel"), col("hits"),
        round(col("hits").cast("double") / k, 6).as("precision_k"),
        round(col("hits").cast("double") / col("n_rel"), 6).as("recall_k"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr"),
        col("dcg_k"), col("idcg_k"),
        round(col("dcg_k") / col("idcg_k"), 6).as("ndcg_k"))
  }

  /** s10 face: the s06 BM25 ranking judged against term-count qrels. */
  def s10(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    rankEval(bm25(docs, QueryTerms), graded(docs, QueryTerms))
  }

  val s10Sql: String = {
    val ln2 = dlit(Ln2); val one = dlit(1.0); val zero = dlit(0.0)
    val two = dlit(2.0)
    val relSum = QueryTerms.map(t =>
      s"(CASE WHEN list_contains(w, '$t') THEN 1 ELSE 0 END)").mkString(" + ")
    raw"""WITH rel AS (
         SELECT doc_id, CAST($relSum AS BIGINT) AS rel
         FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents WHERE trim(text) <> '')),
       ranked AS (SELECT rank AS rk, doc_id FROM ($s06Sql) WHERE rank <= $EvalK),
       judged AS (
         SELECT rk, coalesce(rel, 0) AS rel
         FROM ranked LEFT JOIN rel USING (doc_id)),
       head AS (
         SELECT CAST(sum(CASE WHEN rel >= $RelMin THEN 1 ELSE 0 END) AS BIGINT) AS hits,
                min(CASE WHEN rel >= $RelMin THEN rk END) AS first_rel,
                CAST(sum(CAST(round((power($two, rel) - $one) * $ln2 / ln(CAST(rk AS DOUBLE) + $one), 6) AS DECIMAL(25,8))) AS DOUBLE) AS dcg_k
         FROM judged),
       nr AS (SELECT CAST(sum(CASE WHEN rel >= $RelMin THEN 1 ELSE 0 END) AS BIGINT) AS n_rel FROM rel),
       ihead AS (
         SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rk
         FROM rel QUALIFY rk <= $EvalK),
       ideal AS (
         SELECT CAST(sum(CAST(round((power($two, rel) - $one) * $ln2 / ln(CAST(rk AS DOUBLE) + $one), 6) AS DECIMAL(25,8))) AS DOUBLE) AS idcg_k
         FROM ihead)
       SELECT CAST($EvalK AS BIGINT) AS k, n_rel, hits,
         round(CAST(hits AS DOUBLE) / $EvalK, 6) AS precision_k,
         round(CAST(hits AS DOUBLE) / n_rel, 6) AS recall_k,
         round(coalesce($one / first_rel, $zero), 6) AS mrr,
         dcg_k, idcg_k, round(dcg_k / idcg_k, 6) AS ndcg_k
       FROM head CROSS JOIN nr CROSS JOIN ideal"""
  }

  // ---------------------------------------------------------------
  // s15: the shippable POSTINGS index — the lexical serving artifact
  // beside s05b's IVF-PQ (r16-late). The lexicon above ships the
  // STATS (df/N/sum_dl) but scoring still scans the corpus per query
  // for tf; a serving index stores the postings themselves —
  // (term, doc_id, tf, dl) — partitioned by a term-hash bucket, so a
  // query reads ONLY its terms' buckets (Spark partition pruning on
  // the directory layout — the s05b inverted-list trick applied to
  // text) and the corpus text is never touched at query time. At
  // 100 TB this is the difference between a match query costing a
  // corpus scan and costing |query terms| bucket reads of
  // tf-compressed rows. Deltas append: postings rows are per-doc
  // facts (union-exact) and the lexicon merges exactly, so
  // append == rebuild row-for-row (spec-pinned).
  //
  // The bucket function is the assembly stack's salted-free 60-bit
  // md5 (the c02/c09 family) — replayed driver-side for the query's
  // bucket list (|terms| hashes of literal strings, not a data
  // collect).
  // ---------------------------------------------------------------

  val IndexBuckets = 64

  /** Driver-side replay of md5Prefix60 for a literal term — calls the
    * SAME static the codegen'd expression calls, so the engine and the
    * query-side bucket list cannot drift (a divergence here would make
    * queries read the wrong bucket directories and silently return
    * partial results). */
  private[graft] def termBucket(term: String, buckets: Int): Int =
    java.lang.Math.floorMod(graft.plans.Md5Prefix60.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(term)),
      buckets.toLong).toInt

  /** Full postings of (doc_id, text): (doc_id, dl, term, tf, bucket)
    * plus, when `positions` is set, the sorted in-doc token positions
    * per (term, doc) — the Lucene DOCS_AND_FREQS vs
    * DOCS_AND_FREQS_AND_POSITIONS distinction: match queries (s15)
    * never pay for positions; phrase serving (s16) requires them. */
  private def postingsOf(docs: DataFrame, buckets: Int,
      positions: Boolean): DataFrame = {
    val s = docs.sparkSession
    val exploded = tokenized(docs)
      .select(col("doc_id"), size(col("w")).as("dl"),
        posexplode(col("w")).as(Seq("pos", "term")))
    val grouped =
      if (positions)
        exploded.groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"),
            sort_array(collect_list(col("pos"))).as("positions"))
      else
        exploded.groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
    grouped.withColumn("bucket",
      pmod(graft.plans.GraftFunctions.md5Prefix60(s, col("term")),
        lit(buckets)))
  }

  /** Write the serving index: bucket-partitioned postings + the exact
    * lexicon (df/N/sum_dl) beside them. `positions = true` ships the
    * positional variant phrase queries serve from. */
  def writeBm25Index(docs: DataFrame, path: String,
      buckets: Int = IndexBuckets, positions: Boolean = false): Unit = {
    postingsOf(docs, buckets, positions)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    writeLexicon(fitLexicon(docs), s"$path/lex")
    writeIndexMeta(docs.sparkSession, path, buckets, positions, LayoutStatic)
  }

  /** The index's layout contract, persisted beside the postings. A
    * delta written with a different bucket count scatters terms into
    * directories the query-side bucket replay never reads, and a
    * positions-less delta appended to a positional index reads
    * positions = null → empty phrase intersection — BOTH silently
    * drop documents from results with no error, so every append and
    * every query validates against the meta recorded at build time.
    *
    * `layout` records the postings DIRECTORY SHAPE (r16 advice item
    * 1): "static" = flat postings/bucket=N (writeBm25Index /
    * appendBm25Index), "batched" = nested postings/batch=id/bucket=N
    * (indexBatch / maintainBm25Index). The two shapes cannot mix
    * under one postings root — Spark's partition discovery throws
    * "conflicting directory structures" on every subsequent read, so
    * a static append onto a maintained index (or a batch fold onto a
    * static one) would strand a corrupted artifact. Writers validate
    * layout alongside buckets/positions; readers accept either shape
    * (partition discovery handles each uniformly on its own). */
  private[operators] val LayoutStatic = "static"
  private[operators] val LayoutBatched = "batched"

  private def writeIndexMeta(s: SparkSession, path: String,
      buckets: Int, positions: Boolean, layout: String): Unit =
    s.range(1).select(lit(buckets).as("buckets"),
        lit(positions).as("positions"), lit(layout).as("layout"))
      .write.mode("overwrite").parquet(s"$path/meta")

  private def indexMetaExists(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Require the caller's layout args to match the persisted meta;
    * `positions = None` checks the bucket count only, `layout = None`
    * accepts either directory shape (the query paths — partition
    * discovery reads each shape fine on its own). */
  private def checkIndexMeta(s: SparkSession, path: String,
      buckets: Int, positions: Option[Boolean],
      layout: Option[String] = None): Unit = {
    val row = s.read.parquet(s"$path/meta").head()
    val mb = row.getAs[Int]("buckets")
    val mp = row.getAs[Boolean]("positions")
    require(mb == buckets,
      s"index at $path was built with buckets=$mb; caller passed $buckets")
    positions.foreach(p => require(mp == p,
      s"index at $path was built with positions=$mp; caller passed $p " +
        "(positional and match-only layouts cannot mix)"))
    layout.foreach { l =>
      val ml =
        if (row.schema.fieldNames.contains("layout"))
          row.getAs[String]("layout")
        else "unknown(pre-layout meta)"
      require(ml == l,
        s"index at $path has postings layout '$ml'; this writer " +
          s"produces '$l' — static (flat bucket=N) and batched " +
          "(batch=id/bucket=N) partition depths cannot mix under one " +
          "postings root (every later read would throw on conflicting " +
          "directory structures)")
    }
  }

  /** Exact delta append: postings rows are per-doc facts (plain
    * append), the lexicon merges by sums. The merged lexicon frames
    * are materialized (localCheckpoint) BEFORE the overwrite so the
    * write never reads the path it replaces. */
  def appendBm25Index(delta: DataFrame, s: SparkSession, path: String,
      buckets: Int = IndexBuckets, positions: Boolean = false): Unit = {
    checkIndexMeta(s, path, buckets, Some(positions), Some(LayoutStatic))
    postingsOf(delta, buckets, positions)
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$path/postings")
    val merged = mergeLexicons(readLexicon(s, s"$path/lex"),
      fitLexicon(delta))
    val v = merged.vocab.localCheckpoint(true)
    val st = merged.stats.localCheckpoint(true)
    writeLexicon(Lexicon(v, st), s"$path/lex")
  }

  /** Serve a match query from the artifact alone: only the query
    * terms' bucket directories are read (partition pruning), the
    * corpus text is never touched. Bit-identical to [[bm25]] on the
    * indexed corpus — the s15 face's oracle IS s06's SQL. */
  def queryBm25Index(s: SparkSession, path: String, terms: Seq[String],
      k: Int = TopK, buckets: Int = IndexBuckets): DataFrame = {
    checkIndexMeta(s, path, buckets, positions = None)
    val bks = terms.map(termBucket(_, buckets)).distinct
    val tf = s.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(bks: _*) && col("term").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    scoreTfWithLexicon(tf, readLexicon(s, s"$path/lex"), terms, k)
  }

  // ---------------------------------------------------------------
  // Streaming index maintenance (row 41r): the ES-ingest edge for
  // the serving artifact — every micro-batch of documents lands in
  // the postings index exactly once, crash-replay included. Postings
  // are per-doc FACTS, so the batch's rows go to their own
  // batch=<id> partition level (a replayed batch OVERWRITES its own
  // directory instead of appending twice — the UpsertStream
  // idempotence posture, and bucket pruning still works: bucket is
  // the next directory level down). The lexicon is mergeable state,
  // so it rides the generation-versioned foldBatchWith machinery
  // (vocab folds by per-token df sum, stats by sums; a replayed id
  // rebuilds its own generation from the same parent) and the
  // latest generation is republished as the index's lex/ the query
  // side already reads. A maintained index therefore serves through
  // the SAME queryBm25Index/queryPhraseIndex paths as a static one.
  // ---------------------------------------------------------------

  /** Fold one document micro-batch into a maintained index —
    * idempotent under replay of the same `id` (spec-pinned). */
  def indexBatch(batch: DataFrame, id: Long, path: String,
      buckets: Int = IndexBuckets, positions: Boolean = false): Unit = {
    val s = batch.sparkSession
    if (indexMetaExists(s, path))
      checkIndexMeta(s, path, buckets, Some(positions), Some(LayoutBatched))
    else writeIndexMeta(s, path, buckets, positions, LayoutBatched)
    postingsOf(batch, buckets, positions)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings/batch=$id")
    val lex = fitLexicon(batch)
    val vocab = IncrementalStats.foldBatchWith(s"$path/vocabstate",
      lex.vocab, id)(fs => fs.reduce(_ unionByName _)
        .groupBy(col("tok")).agg(sum(col("df")).as("df")))
    val stats = IncrementalStats.foldBatchWith(s"$path/statsstate",
      lex.stats, id)(fs => fs.reduce(_ unionByName _)
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl")))
    writeLexicon(Lexicon(vocab, stats), s"$path/lex")
  }

  /** Maintain the serving index over a document stream. */
  def maintainBm25Index(stream: DataFrame, path: String,
      checkpointDir: String, buckets: Int = IndexBuckets,
      positions: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        indexBatch(batch, id, path, buckets, positions)
      }
      .start()

  /** pid- AND tag-scoped scratch (see [[graft.PidScratch]]): wipes
    * only this face's subdir, so s15 and s16 never destroy each
    * other's artifact. */
  private def scratch(s: SparkSession, tag: String): String =
    graft.PidScratch.fresh(s, "graft-bm25index", tag)

  /** s15: full artifact lifecycle — build the postings index, load it
    * back, serve the s06 query from it; the oracle is s06's own SQL
    * ("the index changes nothing", the d12/s05b pattern). */
  def s15(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s, "match")
    writeBm25Index(Tables.documents(s, dir), path)
    queryBm25Index(s, path, QueryTerms)
  }

  // ---------------------------------------------------------------
  // s16: phrase serving from the POSITIONAL index — s08 evaluated
  // without touching the corpus. Phrase tf falls out of the postings
  // alone: for phrase t_0 … t_{n-1}, fold the per-term position
  // arrays with acc' = (acc + 1) ∩ positions(t_j) — after the last
  // term, |acc| is the exact adjacent-occurrence count (zero slop),
  // because positions within one (term, doc) posting are distinct
  // and sorted. n-1 doc-keyed joins over |phrase-term postings|
  // rows; everything else (df of the phrase, corpus stats, BM25) is
  // the s08 arithmetic fed from the artifact. Reads only the phrase
  // terms' bucket directories, like s15.
  // ---------------------------------------------------------------

  /** Serve a zero-slop phrase query from a POSITIONAL index: output
    * shape and arithmetic are s08's (rank, doc_id, tf, score) — the
    * s16 face's oracle IS s08's SQL. */
  def queryPhraseIndex(s: SparkSession, path: String, phrase: Seq[String],
      k: Int = TopK, buckets: Int = IndexBuckets): DataFrame = {
    require(phrase.length >= 2, "a phrase needs at least two tokens")
    // the meta check (not a sampled-footer schema probe, which can
    // miss a positions-less delta) is what guarantees every indexed
    // doc actually carries positions
    checkIndexMeta(s, path, buckets, Some(true))
    val bks = phrase.map(termBucket(_, buckets)).distinct
    val post = s.read.parquet(s"$path/postings")
    val pruned = post
      .filter(col("bucket").isin(bks: _*) && col("term").isin(phrase.distinct: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("positions"))
      .transform(graft.CacheRegistry.register) // one pruned read, n aliases
    def termFrame(t: String, i: Int): DataFrame =
      pruned.filter(col("term") === t)
        .select(col("doc_id"), col("dl"), col("positions").as(s"p$i"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft {
      termFrame(phrase.head, 0).select(col("doc_id"), col("dl"),
        col("p0").as("acc"))
    } { case (acc, (t, i)) =>
      acc.join(termFrame(t, i).drop("dl"), "doc_id")
        .select(col("doc_id"), col("dl"),
          array_intersect(transform(col("acc"), p => p + 1), col(s"p$i"))
            .as("acc"))
    }
      .select(col("doc_id"), col("dl"), size(col("acc")).cast("long").as("tf"))
      .filter(col("tf") > 0)
      .transform(graft.CacheRegistry.register) // feeds dfreq AND scoring
    val dfreq = matched.agg(count(lit(1)).as("df"))
    val lex = readLexicon(s, s"$path/lex")
    val g = lex.stats.select(col("n_docs").as("n"),
      (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val scored = matched.crossJoin(broadcast(dfreq)).crossJoin(broadcast(g))
      .select(col("doc_id"), col("tf"), bm25ScoreExpr.as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("tf"), col("score"))
  }

  /** s16: positional-index lifecycle — build WITH positions, serve
    * the s08 phrase from the artifact; oracle = s08's SQL. */
  def s16(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s, "phrase")
    writeBm25Index(Tables.documents(s, dir), path, positions = true)
    queryPhraseIndex(s, path, PhraseTerms)
  }

  // ---------------------------------------------------------------
  // s19: more-like-this — ES's `more_like_this` query, the "similar
  // listings" feature an ES-backed marketplace serves from the same
  // index the reference writes to: per SOURCE document, select its
  // most characteristic terms (top tf·idf — t07's arithmetic,
  // exactly), then run them as a BM25 match (s06's scoring,
  // exactly) over the corpus, excluding the source. Unlike s06 the
  // query side is DATA-DRIVEN — each source doc gets its own term
  // set — which is precisely what MLT adds over match.
  //
  // Scale: the full-vocab (doc, term, tf) frame is ONE combiner-
  // friendly aggregate (t07's cost); the per-source term choice is a
  // WindowGroupLimit over the |Q|-sized slice; candidate generation
  // is an inverted-index equi-join of the broadcast (qdoc, term)
  // pairs against the tf frame — candidates = the chosen terms'
  // postings, never |Q|×|corpus|; per-(qdoc, doc) scores decimal-sum
  // and the top-k is a per-qdoc window.
  // ---------------------------------------------------------------
  val MltStride = 100
  val MltTerms = 3
  val MltK = 5

  /** More-like-this over (doc_id, text): (qdoc, rank, doc_id, score,
    * terms_matched) — top `k` BM25 neighbors of every stride-picked
    * source doc on its own top `nTerms` tf·idf terms. */
  def moreLikeThis(docs: DataFrame, stride: Int = MltStride,
      nTerms: Int = MltTerms, k: Int = MltK): DataFrame = {
    val toks = tokenized(docs)
      .select(col("doc_id"), size(col("w")).as("dl"), col("w"))
    val tf = toks.select(col("doc_id"), col("dl"),
        explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .transform(graft.CacheRegistry.register) // full-vocab, used 3×
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .transform(graft.CacheRegistry.register) // vocab-sized, used 2×
    val g = tf.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // t07's selection arithmetic verbatim: tf · round(ln(n/df), 6)
    val wq = Window.partitionBy(col("qdoc"))
      .orderBy(col("tsc").desc, col("term").asc)
    val qterms = tf.filter(col("doc_id") % stride === 0)
      .join(dfreq, "term").crossJoin(broadcast(g))
      .select(col("doc_id").as("qdoc"), col("term"),
        round(col("tf").cast("double") *
          round(log(col("n").cast("double") / col("df").cast("double")), 6),
          6).as("tsc"))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nTerms)
      .select(col("qdoc"), col("term"))
    val wk = Window.partitionBy(col("qdoc"))
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(qterms), "term")
      .filter(col("doc_id") =!= col("qdoc"))
      .join(broadcast(dfreq), "term").crossJoin(broadcast(g))
      .select(col("qdoc"), col("doc_id"), bm25ScoreExpr.as("c"))
      .groupBy(col("qdoc"), col("doc_id"))
      .agg(sum(col("c").cast("decimal(25,8)")).cast("double").as("score"),
        count(lit(1)).as("terms_matched"))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qdoc"), col("rank"), col("doc_id"), col("score"),
        col("terms_matched"))
  }

  def s19(s: SparkSession, dir: String): DataFrame =
    moreLikeThis(Tables.documents(s, dir))

  val s19Sql: String =
    raw"""WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                  FROM documents WHERE trim(text) <> ''),
       tf AS (SELECT doc_id, dl, tk AS term, count(*) AS tf
              FROM (SELECT doc_id, len(w) AS dl, unnest(w) AS tk FROM toks)
              GROUP BY 1, 2, 3),
       dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       g AS (SELECT count(*) AS n,
               CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl
             FROM (SELECT DISTINCT doc_id, dl FROM tf)),
       qt AS (SELECT qdoc, term FROM
              (SELECT tf.doc_id AS qdoc, term,
                 row_number() OVER (PARTITION BY tf.doc_id ORDER BY
                   round(CAST(tf AS DOUBLE) *
                     round(ln(CAST(n AS DOUBLE)/CAST(df AS DOUBLE)), 6), 6)
                   DESC, term) AS rk
               FROM tf JOIN dfreq USING (term) CROSS JOIN g
               WHERE tf.doc_id % $MltStride = 0)
              WHERE rk <= $MltTerms),
       sc AS (SELECT qt.qdoc, tf.doc_id, $bm25ScoreSql AS c
              FROM tf JOIN qt USING (term)
              JOIN dfreq USING (term) CROSS JOIN g
              WHERE tf.doc_id <> qt.qdoc),
       agg AS (SELECT qdoc, doc_id,
                 CAST(sum(CAST(c AS DECIMAL(25,8))) AS DOUBLE) AS score,
                 count(*) AS terms_matched
               FROM sc GROUP BY 1, 2),
       r AS (SELECT qdoc, doc_id, score, terms_matched,
               row_number() OVER (PARTITION BY qdoc
                 ORDER BY score DESC, doc_id) AS rank FROM agg)
       SELECT qdoc, CAST(rank AS BIGINT) AS rank, doc_id, score,
         CAST(terms_matched AS BIGINT) AS terms_matched
       FROM r WHERE rank <= $MltK"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s19_more_like_this" -> (s19 _),
    "s06_bm25" -> (s06 _),
    "s07_fuzzy_match" -> (s07 _),
    "s08_match_phrase" -> (s08 _),
    "s09_hybrid_rrf" -> (s09 _),
    "s10_rank_eval" -> (s10 _),
    "s15_bm25_index" -> (s15 _),
    "s16_phrase_index" -> (s16 _))

  val oracles: Map[String, String] = Map(
    "s19_more_like_this" -> s19Sql,
    "s06_bm25" -> s06Sql,
    "s07_fuzzy_match" -> s07Sql,
    "s08_match_phrase" -> s08Sql,
    "s09_hybrid_rrf" -> s09Sql,
    "s10_rank_eval" -> s10Sql,
    "s15_bm25_index" -> s06Sql,
    "s16_phrase_index" -> s08Sql)
}
