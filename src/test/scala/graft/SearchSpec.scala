package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

/** s06 BM25 + s07 fuzzy matching: hand-computed score pinning, ranking
  * semantics on the real corpus, and the AUTO edit-budget cutoff. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("s06: BM25 scores pinned against hand computation") {
    // N=3, avgdl=5, df(x)=2 -> idf = round(ln(1 + 1.5/2.5), 6) = 0.470004
    // doc1 tf=3: 0.470004 * 6.6 / (3 + 1.2*(0.25 + 0.75)) = 0.738578
    // doc2 tf=1: 0.470004 * 2.2 / (1 + 1.2)               = 0.470004
    val docs = Seq(
      (1L, "x x x a b"),
      (2L, "x a b c d"),
      (3L, "a b c d e")).toDF("doc_id", "text")
    try {
      val rows = Search.bm25(docs, Seq("x"), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3)))
      assert(rows.toSeq == Seq(
        (1L, 1L, 0.738578, 1L),
        (2L, 2L, 0.470004, 1L)), s"got ${rows.toSeq}")
    } finally CacheRegistry.unpersistAll()
  }

  test("s06: rare-term IDF dominates ranking on the real corpus") {
    try {
      val top = Search.s06(spark, sf()).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(top.nonEmpty && top.length <= Search.TopK)
      // ranks are 1..n and scores non-increasing with doc_id tiebreak
      assert(top.map(_._1).toSeq == (1L to top.length).toSeq)
      top.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
          s"rank order violated: $a then $b")
      case _ => ()
      }
      // the rare query term ("dup", df ~5%) carries ~4x the IDF of the
      // common terms: every top-3 doc must actually contain it
      val topIds = top.take(3).map(_._2).toSet
      val withDup = Tables.documents(spark, sf())
        .filter(col("doc_id").isInCollection(topIds))
        .filter(array_contains(split(lower(col("text")), "\\s+"), "dup"))
        .count()
      assert(withDup == topIds.size,
        s"expected all of $topIds to contain the rare term")
    } finally CacheRegistry.unpersistAll()
  }

  test("s07: AUTO edit budgets — matches pinned, transposition cut off") {
    try {
      val rows = Search.s07(spark, sf()).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val expected = Set(
        ("haash", "hash", 1L), ("colum", "column", 1L),
        ("vectr", "vector", 1L), ("qery", "query", 1L),
        ("merrge", "merge", 1L), ("streem", "stream", 1L),
        ("scan", "scan", 0L))
      assert(rows == expected, s"got $rows")
      // "tabel" -> "table" is 2 edits at a 1-edit budget: absent above
    } finally CacheRegistry.unpersistAll()
  }

  test("s06 lexicon: artifact round-trip scores identically; merge == refit") {
    import graft.operators.Search
    val docs = Tables.documents(spark, sf())
    val dir = java.nio.file.Files.createTempDirectory("graft-lex").toString
    try {
      Search.writeLexicon(Search.fitLexicon(docs), dir)
      val fromArtifact = Search.bm25WithLexicon(docs, Search.QueryTerms,
          Search.readLexicon(spark, dir))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3)))
      CacheRegistry.unpersistAll()
      val inQuery = Search.s06(spark, sf())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3)))
      assert(fromArtifact.sameElements(inQuery),
        "the fit-once artifact must score bit-identically to the in-query census")
      // exact incremental maintenance: fit two halves, merge, compare
      // against a full refit — the IncrementalStats fold==recompute
      // contract for the lexicon
      val merged = Search.mergeLexicons(
        Search.fitLexicon(docs.filter(col("doc_id") % 2 === 0)),
        Search.fitLexicon(docs.filter(col("doc_id") % 2 =!= 0)))
      val full = Search.fitLexicon(docs)
      def vmap(l: Search.Lexicon) = l.vocab.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(vmap(merged) == vmap(full), "merged vocab df must equal refit")
      assert(merged.stats.collect().head.toSeq ==
        full.stats.collect().head.toSeq, "merged totals must equal refit")
    } finally CacheRegistry.unpersistAll()
  }

  test("s08: phrase matches are adjacent-exact and tf-ranked") {
    // doc 2 has the phrase twice, doc 1 once, doc 3 has both words but
    // NOT adjacent (the match-vs-match_phrase distinction), doc 4 has
    // the reversed order
    val docs = Seq(
      (1L, "a hash join b"),
      (2L, "hash join c hash join"),
      (3L, "hash c join"),
      (4L, "join hash")).toDF("doc_id", "text")
    try {
      val rows = graft.operators.Search.phraseSearch(docs, Seq("hash", "join"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.map(_._2).toSet == Set(1L, 2L),
        s"only adjacent in-order occurrences count: ${rows.toSeq}")
      assert(rows.head == ((1L, 2L, 2L)),
        s"the tf=2 doc must rank first: ${rows.toSeq}")
    } finally CacheRegistry.unpersistAll()
  }

  test("s09: RRF fuses both lists; consensus docs outrank single-list docs") {
    import graft.operators.Search
    try {
      val rows = Search.s09(spark, sf()).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
          r.getLong(4)))
      assert(rows.length == Search.HybridTopK)
      // every fused doc came from at least one list, and rrf is the
      // exact RRF of the recorded ranks
      rows.foreach { case (_, id, rrf, rl, rv) =>
        assert(rl > 0 || rv > 0, s"doc $id in neither list")
        val expect = (if (rl > 0) 1.0 / (Search.RrfK + rl) else 0.0) +
          (if (rv > 0) 1.0 / (Search.RrfK + rv) else 0.0)
        assert(math.abs(rrf - expect) < 1e-6, s"doc $id rrf $rrf != $expect")
      }
      // PRF closes the loop: the BM25 seeds are nearest their own
      // centroid, so at least one doc sits in BOTH lists — and any
      // both-lists doc must outrank every one-list-only doc whose
      // single rank is no better
      val both = rows.filter(r => r._4 > 0 && r._5 > 0)
      assert(both.nonEmpty, "no consensus docs — fusion is vacuous")
      assert(both.map(_._1).min == 1L,
        "a consensus doc should take the top fused rank here")
    } finally CacheRegistry.unpersistAll()
  }

  test("s07: df and n_docs agree for single-variant terms") {
    try {
      val bad = Search.s07(spark, sf())
        .groupBy(col("q_term"))
        .agg(count(lit(1)).as("nv"), max(col("df")).as("df"),
          max(col("n_docs")).as("nd"))
        .filter(col("nv") === 1 && col("df") =!= col("nd"))
        .count()
      assert(bad == 0L,
        "a single-variant term must match exactly df distinct docs")
    } finally CacheRegistry.unpersistAll()
  }
}
