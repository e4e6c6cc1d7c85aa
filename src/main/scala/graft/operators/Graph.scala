package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** g03: PageRank over the co-purchase part graph — the iterative
  * graph-analytics counterpart to d06's connected components. Parts
  * bought together in one order form an undirected edge; PageRank
  * over the symmetrized graph surfaces the "hub" parts whose
  * centrality a recommendation / fraud-ring view ranks by (the
  * reference's co-occurrence dashboards stop at pair counts — q20;
  * this is the global-structure extension a marketplace graph needs).
  *
  * Oracle-parity rules (SURVEY §4): a fixed iteration count unrolled
  * in the DuckDB oracle (DuckDB forbids aggregates in a recursive CTE
  * term), and the WHOLE iteration runs in integer-scaled arithmetic —
  * rank × 10^12 as BIGINT, integer division for the per-edge share
  * and the damping factor (× 85 div 100). Decimal `round` ties broke
  * a double formulation at the 9th digit (engines disagree on
  * half-up-vs-half-even for doubles); integer division has no ties,
  * so the fixpoint is bit-exact across engines by construction.
  * Magnitudes are safe in BIGINT: total mass ≤ 10^12, and the
  * damping product peaks at 8.5 × 10^13.
  *
  * Scale: per-order line count is bounded (TPC-H ≤ 7), so the pair
  * explode is LINEAR in orders, never quadratic in parts. The
  * symmetrized edge frame is built once, pre-partitioned on `src`,
  * and cached with its out-degree window — each iteration consumes
  * that partitioning (only the small per-node rank frame shuffles)
  * plus one combiner-friendly shuffle on `dst` for the neighbor sum.
  * The fixed iteration count builds ONE lazy plan (no per-round
  * checkpoint or materialization): with Iters small and each round a
  * join + aggregate over the cached edge frame, Catalyst handles the
  * plan depth fine and the whole fixpoint runs as a single job.
  */
object Graph {

  /** Fixed-point scale: ranks live in [0, 10^12] as BIGINT. */
  val Scale = 1000000000000L
  val DampingNum = 85L // damping 0.85 as the rational 85/100
  val DampingDen = 100L
  val Iters = 5

  /** Distinct undirected co-purchase edges (a < b) from a
    * (l_orderkey, l_partkey) frame.
    *
    * r20 shape: ONE basket aggregation (collect_set dedups the
    * (orderkey, partkey) multiplicity the old plan paid a separate
    * distinct shuffle for) + an in-row sorted-pair explode, then the
    * edge distinct — two shuffles instead of the old three
    * (distinct li → self-join re-exchange on orderkey → edge
    * distinct), and no join. Per-basket work is C(|basket|, 2) pair
    * structs — exactly the rows the self-join emitted — and the
    * basket array is bounded by order size (≤ 17 items on the sf
    * corpus; a degenerate mega-basket would cost the self-join the
    * same |basket|² rows, so the array form adds no new worst case).
    * Output proven set-identical to the self-join at sf0.1
    * (exceptAll both ways = 0) and by the unchanged DuckDB oracles.
    * Measured 2.97 → 2.05 s steady-state at sf0.1 (plans/r20). */
  def coEdges(lineitem: DataFrame): DataFrame = {
    val arr = array_sort(collect_set(col("l_partkey")))
    lineitem.groupBy(col("l_orderkey"))
      .agg(arr.as("parts"))
      .select(explode(flatten(transform(col("parts"), (x, i) =>
        transform(slice(col("parts"), i + lit(2),
            size(col("parts")) - i - lit(1)),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** PageRank over undirected (a, b) edges: (node, outdeg, rank_e12)
    * after exactly `iters` damped iterations from a uniform start,
    * rank_e12 = rank scaled by 10^12 in exact integer arithmetic.
    * The graph has no dangling nodes by construction (symmetrized
    * edges give every node out-degree ≥ 1). */
  /** Symmetrize + out-degree in one cached, src-partitioned frame:
    * the window consumes the repartition's hash distribution, and
    * every iteration's rank join consumes the cache's partitioning —
    * the shared edge posture of [[pagerank]] and
    * [[personalizedPagerank]]. */
  private def symWithOutdeg(edges: DataFrame): DataFrame =
    edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .withColumn("outdeg",
        count(lit(1)).over(Window.partitionBy(col("src"))))
      .transform(graft.CacheRegistry.register)

  def pagerank(edges: DataFrame, iters: Int = Iters): DataFrame = {
    val sym = symWithOutdeg(edges)
    val nDf = sym.select(col("src")).distinct()
      .agg(count(lit(1)).as("n"))
    // (node, outdeg, per-node jump term) — the static left side of
    // every iteration; jump = (0.15 × Scale) div n, exact integer
    // division. Carrying outdeg here saves the final degree join.
    val nodes = sym.select(col("src").as("node"), col("outdeg")).distinct()
      .crossJoin(broadcast(nDf))
      .select(col("node"), col("outdeg"),
        expr(s"(${Scale * (DampingDen - DampingNum) / DampingDen}L div n)")
          .as("jump"),
        expr(s"(${Scale}L div n)").as("r0"))
      .transform(graft.CacheRegistry.register)
    iterate(sym, nodes, iters).select(col("node"), col("outdeg"),
      col("rank_e12"))
  }

  /** The damped fixpoint shared by [[pagerank]] and
    * [[personalizedPagerank]]: `nodes` carries (node, outdeg, jump,
    * r0, …) — the jump/start columns are what distinguish uniform from
    * seeded teleport; extra columns pass through. */
  private def iterate(sym: DataFrame, nodes: DataFrame,
      iters: Int): DataFrame = {
    val carry = nodes.columns.filterNot(Seq("jump", "r0").contains)
      .map(col).toSeq
    // fixed iteration count, each round referencing the previous ONCE
    // → lineage grows linearly, so the whole fixpoint stays ONE lazy
    // plan with no per-round materialization (d06 needs per-round
    // localCheckpoint cuts only because its convergence probe makes
    // the reference count 2 per round — exponential growth)
    var ranks = nodes.select(carry :+ col("r0").as("rank_e12"): _*)
    (1 to iters).foreach { _ =>
      val contrib = sym
        // shuffle-HASH, not sort-merge: the static plan puts an SMJ
        // here (the rank subtree's size estimate blows past the
        // broadcast threshold), which would re-sort the cached edge
        // frame every iteration. Pinning SHJ streams the cached
        // frame with no sort on either side — measured neutral at
        // sf0.1 (AQE was already converting at runtime: 9.8 vs
        // 9.9 s isolated) but it makes the no-sort plan the PINNED
        // shape instead of an AQE favor. A broadcast hint would be
        // the wrong 100 TB posture: the rank side is
        // node-cardinality — small per partition, huge in total.
        .join(ranks.select(col("node").as("src"), col("rank_e12"))
          .hint("shuffle_hash"), "src")
        .select(col("dst"), expr("rank_e12 div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("sumc"))
      ranks = nodes
        .join(contrib.hint("shuffle_hash"),
          col("node") === col("dst"), "left")
        .select(carry :+
          (col("jump") +
            expr(s"(coalesce(sumc, 0L) * ${DampingNum}L) div ${DampingDen}L"))
            .as("rank_e12"): _*)
    }
    ranks
  }

  def g03(s: SparkSession, dir: String): DataFrame =
    pagerank(coEdges(Tables.lineitem(s, dir)))

  /** The teleport numerator (0.15 × Scale) shared by both oracles. */
  private val JumpNum = Scale * (DampingDen - DampingNum) / DampingDen

  /** Unrolled fixed-point CTEs shared VERBATIM by g03Sql and f34Sql
    * (the Spark sides share `iterate` the same way): rK computed
    * from r(K-1), Iters times; all arithmetic BIGINT (DuckDB's sum()
    * widens to HUGEINT — cast back). Expects `sym` (src, dst,
    * outdeg), `nodes` (node, jump, …), `r0` (node, rank_e12). */
  // The unrolled-fixpoint replay is an sf0.01/sf0.1 oracle
  // instrument: at the sf1 replica (24M-row sym × Iters rounds)
  // DuckDB's evaluation of the chain spills past this host's disk —
  // measured r19, with and without MATERIALIZED round hints — so the
  // sf1 spot-oracle covers the iterative family through q28's window
  // chains instead; the Spark side serves g03 at sf1 in ~12 s (the
  // mart-staged face).
  private val iterCtes: String = (1 to Iters).map { k =>
    s"""c$k AS (SELECT s.dst, CAST(sum(r.rank_e12 // s.outdeg) AS BIGINT) AS sumc
             FROM sym s JOIN r${k - 1} r ON s.src = r.node GROUP BY 1),
       r$k AS (SELECT b.node, b.jump + (coalesce(c$k.sumc, 0) * $DampingNum) // $DampingDen AS rank_e12
             FROM nodes b LEFT JOIN c$k ON b.node = c$k.dst)"""
  }.mkString(",\n       ")

  /** co-purchase graph CTEs (li → e → sym0 → sym) shared verbatim by
    * g03Sql and f34Sql — the SQL twin of coEdges + symWithOutdeg. */
  private val coGraphCtes: String =
    """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       sym0 AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       sym AS (SELECT src, dst,
                 count(*) OVER (PARTITION BY src) AS outdeg
               FROM sym0)"""

  val g03Sql: String = {
    val jumpNum = JumpNum
    s"""WITH $coGraphCtes,
       nn AS (SELECT count(DISTINCT src) AS n FROM sym0),
       nodes AS (SELECT DISTINCT src AS node,
                   $jumpNum // n AS jump, $Scale // n AS r0
                 FROM sym0, nn),
       r0 AS (SELECT node, r0 AS rank_e12 FROM nodes),
       $iterCtes
       SELECT deg.node, deg.outdeg, CAST(r.rank_e12 AS BIGINT) AS rank_e12
       FROM (SELECT DISTINCT src AS node, outdeg FROM sym) deg
       JOIN r$Iters r ON deg.node = r.node"""
  }

  // ---------------------------------------------------------------
  // f34: personalized-PageRank risk propagation — guilt-by-
  // association over the co-purchase graph. The reference scores
  // each listing INDIVIDUALLY (f04/f21); fraud rings don't act
  // individually: scam listings are bundled into the same orders as
  // other scam listings, so a listing co-purchased with known-
  // anomalous ones deserves elevated scrutiny even when its own
  // price is clean. PPR from the seed set of f21's price anomalies
  // is the standard propagation: identical damped fixpoint to g03,
  // but ALL teleport mass returns to the seeds (r0 and the jump term
  // are Scale div |S| and 0.15·Scale div |S| on seeds, 0 elsewhere),
  // so rank measures proximity-to-fraud rather than global
  // centrality — nodes unreachable from every seed read exactly 0.
  //
  // Oracle parity: g03's rules verbatim — exact integer arithmetic
  // end to end (no float ties exist), the fixpoint unrolled in the
  // oracle, and the seed set composes f21's own SQL as a subquery
  // (the s11/s12 precedent), so seed semantics can't drift.
  //
  // Scale: identical plan economy to g03 (one cached src-partitioned
  // edge frame, node-cardinality rank frames, shuffle-hash joins);
  // the seed frame joins in as one broadcast-sized semi join at
  // setup. |S| counts seeds PRESENT IN THE GRAPH — an isolated
  // anomaly can't silently dilute the teleport mass.
  // ---------------------------------------------------------------

  /** PPR of `seeds` (a `node` column) over undirected (a, b) edges:
    * (node, is_seed, outdeg, rank_e12) after `iters` damped rounds,
    * teleport restricted to the in-graph seed set. */
  def personalizedPagerank(edges: DataFrame, seeds: DataFrame,
      iters: Int = Iters): DataFrame = {
    val sym = symWithOutdeg(edges)
    // node-cardinality, consumed twice (the |S| aggregate + the
    // is_seed join) — cached so the node-distinct + semi-join
    // subtree runs once
    val graphSeeds = sym.select(col("src").as("node")).distinct()
      .join(seeds.select(col("node")).distinct(), Seq("node"), "left_semi")
      .withColumn("is_seed", lit(true))
      .transform(graft.CacheRegistry.register)
    val nS = graphSeeds.agg(count(lit(1)).as("ns"))
    val jumpNum = Scale * (DampingDen - DampingNum) / DampingDen
    val nodes = sym.select(col("src").as("node"), col("outdeg")).distinct()
      .join(broadcast(graphSeeds), Seq("node"), "left")
      .crossJoin(broadcast(nS))
      .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"),
        col("outdeg"),
        when(col("is_seed"), expr(s"(${jumpNum}L div ns)"))
          .otherwise(lit(0L)).as("jump"),
        when(col("is_seed"), expr(s"(${Scale}L div ns)"))
          .otherwise(lit(0L)).as("r0"))
      .transform(graft.CacheRegistry.register)
    iterate(sym, nodes, iters)
      .select(col("node"), col("is_seed"), col("outdeg"), col("rank_e12"))
  }

  /** Face: propagate from f21's price-anomaly seeds over the
    * co-purchase graph. */
  def f34(s: SparkSession, dir: String): DataFrame =
    personalizedPagerank(coEdges(Tables.lineitem(s, dir)),
      Fraud.f21(s, dir).select(col("item_id").as("node")))

  val f34Sql: String = {
    val jumpNum = JumpNum
    s"""WITH $coGraphCtes,
       anom AS (SELECT item_id AS node FROM (${Fraud.f21Sql})),
       gseeds AS (SELECT DISTINCT src AS node FROM sym0
                  WHERE src IN (SELECT node FROM anom)),
       ns AS (SELECT count(*) AS ns FROM gseeds),
       nodes AS (SELECT g.node,
                   g.node IN (SELECT node FROM gseeds) AS is_seed,
                   CASE WHEN g.node IN (SELECT node FROM gseeds)
                        THEN $jumpNum // ns ELSE 0 END AS jump,
                   CASE WHEN g.node IN (SELECT node FROM gseeds)
                        THEN $Scale // ns ELSE 0 END AS r0
                 FROM (SELECT DISTINCT src AS node FROM sym0) g, ns),
       r0 AS (SELECT node, r0 AS rank_e12 FROM nodes),
       $iterCtes
       SELECT deg.node, n.is_seed, deg.outdeg,
         CAST(r.rank_e12 AS BIGINT) AS rank_e12
       FROM (SELECT DISTINCT src AS node, outdeg FROM sym) deg
       JOIN r$Iters r ON deg.node = r.node
       JOIN nodes n ON n.node = deg.node"""
  }

  // ---------------------------------------------------------------
  // g04: triangle counting + local clustering coefficient — the
  // cohesion metrics next to g03's centrality (fraud rings and
  // recommendation neighborhoods are dense triangles; bridges are
  // not). Triangles enumerate via the ordered compact-forward join
  // over DEGREE-ORIENTED edges (r15 verdict item 1): every edge
  // {u, v} points from the endpoint that is SMALLER in the total
  // order (degree, id) to the larger, so each triangle x ≺ y ≺ z is
  // produced EXACTLY once by (x,y) ⋈ (y,z) ⋈ (x,z) — no /6 dedup,
  // no symmetric blowup — and, crucially, the wedge fan-out at the
  // middle node y is bounded by y's FORWARD degree, which degree
  // ordering caps at O(√m) (arboricity bound: a node can have at
  // most √(2m) neighbors of degree ≥ its own). Under id ordering
  // the same join's fan-out is Σ d⁻(y)·d⁺(y), which on a hub whose
  // id sits mid-range goes quadratic in the hub degree — the
  // documented scale-killer on the near-complete co-purchase graph
  // (see g05's note below), demonstrated binding by the
  // g04_hub_skew bench pair. cc(v) = 2·T(v)/(deg·(deg−1)), 0 pinned
  // for deg < 2; everything integer until that one rounded division.
  //
  // Oracle parity: the per-node OUTPUT (node, degree, n_triangles,
  // clustering) is orientation-invariant — both orientations
  // enumerate the identical triangle set, each exactly once — so
  // the DuckDB replay keeps the simpler id-orientation and the spec
  // pins degree-ordered == id-ordered row-for-row besides.
  // ---------------------------------------------------------------

  /** The (node, degree) frame of an undirected a<b edge set. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))

  /** Re-orient a<b-by-id undirected edges by the total order
    * (degree, id): output (a, b) has a ≺ b. Two node-keyed joins
    * against the caller's degree frame — linear, shuffle on the
    * endpoints. */
  def orientByDegree(edges: DataFrame, deg: DataFrame): DataFrame = {
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    edges
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
      .select(when(fwd, col("a")).otherwise(col("b")).as("x"),
        when(fwd, col("b")).otherwise(col("a")).as("y"))
      .select(col("x").as("a"), col("y").as("b"))
  }

  def orientByDegree(edges: DataFrame): DataFrame =
    orientByDegree(edges, degrees(edges))

  /** Hub gate for the adaptive orientation (the q20 adaptive-prune
    * pattern): re-orienting costs two linear node-keyed joins over
    * the edge frame, and changes the wedge count only through degree
    * VARIANCE — on a degree-uniform graph every total order pays the
    * same Σ d⁻·d⁺, so orientation there is pure overhead (measured:
    * +2 s on the sf0.1 co-purchase graph, degrees ~uniform at ~119).
    * It pays exactly when a hub could go quadratic, i.e. when the
    * largest single-node wedge potential max_deg² dwarfs the linear
    * O(|E|) orientation cost. The gate reads ONE row off the (node-
    * cardinality, cached) degree frame — the g03 bounded-pull
    * convention, never a data collect. */
  val SkewFactor = 16L

  /** Per-input memo of the hub-gate decision (the q20 catalogSize
    * rationale, r16 advice item 2): the gate is one bounded-pull
    * aggregate but still a Spark ACTION, so plan-only uses of
    * triangles() (Explain, spec plan asserts) would launch real jobs
    * on every call — and within one session the same edge frame's
    * skew class never flips. Keyed by the CANONICALIZED analyzed
    * plan (structural equality, alias-invariant); bounded by a
    * clear-at-64 cap so held plan trees can't accumulate across a
    * long bench sweep. */
  private val hubGateMemo = scala.collection.concurrent.TrieMap
    .empty[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Boolean]

  /** Per-input memo of linkPredict's (packable, wedge-mass) probe —
    * same bounds as [[hubGateMemo]], but NOT the same staleness
    * contract: a stale hub-gate verdict only costs performance, while
    * a stale `packable` on in-session-mutated input would be a
    * CORRECTNESS hazard — which is why the packed gear carries a
    * runtime id-range guard (see linkPredict's idGuard) that turns a
    * stale verdict into a loud failure, never silent key corruption. */
  private val linkStatsMemo = scala.collection.concurrent.TrieMap
    .empty[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      (Boolean, Long)]

  /** The shared first half of [[triangles]] and [[graphCensus]]:
    * the cached degree frame plus the per-edge common-neighbor frame
    * (a, b, common = N⁺(a) ∩ N⁺(b) under the adaptive orientation).
    * Factored out (r20) so the census can aggregate the commons
    * directly without the per-node credit explode. */
  private def edgeCommons(edges: DataFrame,
      degreeOrdered: Option[Boolean],
      degIn: Option[DataFrame]): (DataFrame, DataFrame) = {
    val e0 = edges.transform(graft.CacheRegistry.register)
    // the per-node degree frame is needed for the OUTPUT regardless;
    // caching it makes the gate read and the orientation joins free
    // riders on work the operator already does. A mart-served caller
    // passes the materialized degree frame (degIn) and skips the
    // edge-frame degree shuffle entirely.
    val deg = degIn.getOrElse(degrees(e0))
      .transform(graft.CacheRegistry.register)
    val orient = degreeOrdered.getOrElse {
      if (hubGateMemo.size > 64) hubGateMemo.clear()
      hubGateMemo.getOrElseUpdate(
        edges.queryExecution.analyzed.canonicalized, {
          val r = deg.agg(max(col("degree")).cast("long"),
            (sum(col("degree")) / 2).cast("long")).head()
          // an empty edge frame aggregates to nulls — nothing to orient
          !r.isNullAt(0) &&
            r.getLong(0) * r.getLong(0) > SkewFactor * r.getLong(1)
        })
    }
    // only a genuinely NEW frame gets a cache pin — re-registering e0
    // on the unoriented gear would hold a duplicate registry entry
    val e = if (orient)
      orientByDegree(e0, deg).transform(graft.CacheRegistry.register)
    else e0
    // Adjacency-intersection core (r20 optimization — compact-forward,
    // Schank & Wagner 2005 / Latapy 2008, public algorithmics): the
    // r19 core enumerated every directed WEDGE as a self-join row
    // (e1.b = e2.a, ~37M rows at sf0.1's 148M-wedge co-purchase graph)
    // and closed it with a second self-join. This core instead builds
    // each node's out-neighbor list ONCE (one |E|-row shuffle; array
    // payload totals |E| ids — the same mass the cached edge frame
    // already holds) and intersects the two endpoint lists per edge:
    // the triangles containing edge (a,b) are exactly N⁺(a) ∩ N⁺(b)
    // under any total order, so the wedge intermediate never exists.
    // Work is Σ_edges (d⁺(a)+d⁺(b)) ≈ the wedge mass in COMPARISONS
    // but with |E| rows instead of Σd⁻d⁺ rows through the shuffle —
    // measured 11.4 → 6.7 s steady-state on g04 at sf0.1 (plans/r20).
    // The orientation gears and the hub gate are unchanged: a skewed
    // hub's out-list under id order is hub-degree-sized and every
    // incident edge pays an O(hub-degree) probe (the same quadratic
    // the wedge join paid), while degree order caps out-degrees by
    // the degeneracy — so the g04_hub_skew demo pair still binds.
    // shuffle-HASH on the adjacency side (the g03 iterate rationale):
    // node-cardinality but array-carrying — small per partition, huge
    // in total, so never a broadcast; SHJ skips sort-merge's sort of
    // the array payloads.
    val adj = e.groupBy(col("a").as("node"))
      .agg(collect_list(col("b")).as("nbrs"))
      .transform(graft.CacheRegistry.register)
    // inner joins: an edge whose endpoint has no out-neighbors closes
    // no triangle through it; dropped rows contribute only zeros
    val commons = e
      .join(adj.select(col("node").as("a"), col("nbrs").as("na"))
        .hint("shuffle_hash"), "a")
      .join(adj.select(col("node").as("b"), col("nbrs").as("nb"))
        .hint("shuffle_hash"), "b")
      // `common` is computed once per edge in its own projection
      // (CollapseProject keeps a multiply-referenced non-cheap
      // expression un-inlined, so the intersect runs once per edge).
      .select(col("a"), col("b"),
        array_intersect(col("na"), col("nb")).as("common"))
    (deg, commons)
  }

  /** Per-node triangle metrics over undirected (a, b) edges:
    * (node, degree, n_triangles, clustering). `degreeOrdered`:
    * None = adaptive (orient iff the hub gate fires — the
    * production default), Some(true)/Some(false) pin the gear (the
    * hub-skew bench pair and the equality spec). Both gears produce
    * identical rows — the per-node output is orientation-invariant
    * (spec-pinned). */
  def triangles(edges: DataFrame,
      degreeOrdered: Option[Boolean] = None,
      degIn: Option[DataFrame] = None): DataFrame = {
    val (deg, commons) = edgeCommons(edges, degreeOrdered, degIn)
    // one fused pass per edge: endpoints each credit |common|
    // triangles, every common neighbor credits 1 — no wedge rows,
    // no second pass over the join subtree.
    val perNode = commons
      .select(explode(concat(
        array(
          struct(col("a").as("node"), size(col("common")).cast("long").as("c")),
          struct(col("b").as("node"), size(col("common")).cast("long").as("c"))),
        transform(col("common"),
          z => struct(z.as("node"), lit(1L).as("c"))))).as("s"))
      .groupBy(col("s.node").as("node"))
      .agg(sum(col("s.c")).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(round(
            (lit(2L) * coalesce(col("n_triangles"), lit(0L))).cast("double") /
              (col("degree") * (col("degree") - 1)), 6))
          .as("clustering"))
  }

  def g04(s: SparkSession, dir: String): DataFrame =
    triangles(coEdges(Tables.lineitem(s, dir)))

  /** The hub-skew demonstration graph: a wheel over the first
    * `maxNodes` part ids — one hub (the MEDIAN-rank id, so
    * id-orientation splits its spokes half-in/half-out and the
    * id-ordered wedge join fans out (deg/2)² at the hub) joined to
    * every other node, plus the id-ordered path i—(i+1) through the
    * non-hub nodes (so the result is non-trivial: every path edge
    * closes a triangle with the hub). Degree ordering orients every
    * spoke INTO the hub (it is the unique maximum-degree node), so
    * its forward degree is 0 and the hub contributes zero wedges —
    * the arboricity bound doing its job. The bench pair runs the
    * same `triangles` both ways; bench_guard enforces id-ordered ≥
    * 2× degree-ordered (the d09 cap-binding pattern). */
  def wheelEdges(s: SparkSession, dir: String,
      maxNodes: Int = WheelNodes): DataFrame = {
    val w = Window.orderBy(col("id"))
    // row_number over one partition: the node list is bounded by
    // maxNodes (bench input construction, not a corpus-scale
    // operator); orders is the id source because the part catalog
    // (20k at sf0.1) is too small for the quadratic term to dwarf
    // the pair's fixed costs
    val ids = Tables.orders(s, dir).select(col("o_orderkey").as("id"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxNodes)
      .transform(graft.CacheRegistry.register)
    // clamp only steadies hubRn's arithmetic; a dir with < 3 ids
    // yields a degenerate (possibly empty) edge set, which the
    // consumers handle (triangles' gate null-checks the empty agg)
    val n = math.max(ids.count(), 3L)
    val hubRn = n / 2
    val hub = ids.filter(col("rn") === hubRn).select(col("id").as("hub"))
    val rest = ids.filter(col("rn") =!= hubRn)
    val spokes = rest.crossJoin(broadcast(hub))
      .select(least(col("id"), col("hub")).as("a"),
        greatest(col("id"), col("hub")).as("b"))
    val path = rest
      .withColumn("nxt", lead(col("id"), 1).over(Window.orderBy(col("rn"))))
      .filter(col("nxt").isNotNull)
      .select(least(col("id"), col("nxt")).as("a"),
        greatest(col("id"), col("nxt")).as("b"))
    spokes.union(path).distinct()
  }

  /** Wheel size for the hub-skew pair: 16k order keys → the
    * id-ordered plan pays ~(8k)² = 6.4×10⁷ hub wedges through the
    * closure probe; the degree-ordered plan ~2 per path node.
    * (The count()-era calibration chased this upward to 100k nodes
    * because the eliminated-join bench read 2 s at ANY size; under
    * the honest noop-sink measurement the per-wedge cost is real —
    * ~10⁻⁷ s through the closure probe. 12k nodes measured 3.3 vs
    * 1.5 s full-run — ratio 2.1, too thin over the 2.0 guard floor
    * for ordinary churn; 16k buys ~80% more quadratic term for
    * ~1.5 s of bench.) */
  val WheelNodes = 16000

  val g04Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
             FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM e e1 JOIN e e2 ON e1.b = e2.a
               JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       pn AS (SELECT node, count(*) AS n_triangles FROM (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri) GROUP BY 1),
       deg AS (SELECT node, count(*) AS degree FROM (
                SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1)
       SELECT deg.node, degree,
         CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles,
         CASE WHEN degree < 2 THEN 0.0
              ELSE round(CAST(2 * coalesce(n_triangles, 0) AS DOUBLE) / (degree * (degree - 1)), 6)
         END AS clustering
       FROM deg LEFT JOIN pn ON deg.node = pn.node"""

  // ---------------------------------------------------------------
  // g05: link prediction — the classic neighborhood scores (common
  // neighbors, Jaccard, Adamic–Adar) for NON-adjacent 2-hop pairs:
  // the "parts bought together by the same baskets but never yet in
  // one basket" recommendation candidates, and the third member of
  // the graph family (g03 ranks nodes, g04 measures cohesion, g05
  // scores missing EDGES).
  //
  // Oracle-parity: Adamic–Adar terms 1/ln(deg m) are rounded to 6
  // and DECIMAL-summed (a common neighbor has degree ≥ 2 by
  // construction, so ln never hits 0); Jaccard divides two BIGINTs
  // once at the end; candidate set bounded by MinCommon and the
  // existing-edge anti-join.
  //
  // Scale (r16, the honest version of "apply the g04 medicine"):
  // unlike triangle counting, OPEN-wedge scoring admits no
  // arboricity bound — every wedge x—m—y is a candidate that must
  // reach the (x, y) aggregate, because its count IS the common-
  // neighbor score, so Σ_m C(deg m, 2) join rows are the output's
  // information content and no orientation makes them fewer. What
  // CAN go: the legacy plan enumerated each wedge TWICE (symmetric
  // frame self-joined on the middle, deg(m)² ordered pairs filtered
  // to a<b post-join) and shuffled the 2|E| symmetric frame to get
  // there. linkPredict now splits the wedge by the middle's id-
  // position — m<x<y (forward×forward), x<m<y (in×out), x<y<m
  // (backward×backward) — over the ONE a<b edge frame with degrees
  // attached: three equi-joins whose union is each wedge EXACTLY
  // once (the cases partition on where m sorts), i.e. the minimal
  // C(deg,2) row count, with the a-side/b-side inequality pushed
  // into the join condition. Spec pins compact == legacy row-for-
  // row; the unsampled sf0.1 face (g05_link_predict_full, benched
  // under a guard bar) runs the full near-complete co-purchase
  // graph through it.
  // ---------------------------------------------------------------

  /** Predicted links need at least this many shared neighbors. */
  val MinCommon = 3
  /** Keep the top-k predictions per left node — the recommender
    * output shape, and what keeps the face (and the 100 TB job's
    * sink) node-bounded instead of pair-bounded: the unranked
    * candidate set reads 1.76M rows at sf0.01 alone. */
  val TopPredictions = 3

  /** The Adamic–Adar contribution of a common neighbor of degree
    * `d` — rounded then DECIMAL-cast so the sum is order-exact
    * across engines and plans. */
  private def aaTerm(d: Column): Column =
    round(lit(1.0) / log(d.cast("double")), 6).cast("decimal(25,8)")

  /** Shared scoring tail: (a, b, cn, aa) candidate pairs → ranked
    * non-edge predictions with Jaccard + Adamic–Adar. */
  private def scoreTail(hops: DataFrame, e: DataFrame,
      deg: DataFrame): DataFrame = {
    val wr = Window.partitionBy(col("a"))
      .orderBy(col("cn").desc, col("b").asc)
    hops
      .join(e, Seq("a", "b"), "left_anti") // existing edges are not predictions
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= TopPredictions)
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
      .select(col("a"), col("rank"), col("b"), col("cn"),
        round(col("cn").cast("double") /
          (col("da") + col("db") - col("cn")), 6).as("jaccard"),
        round(col("aa"), 6).as("adamic_adar"))
  }

  /** Non-edge 2-hop pairs with neighborhood scores over undirected
    * (a, b) edges: (a, b, cn, jaccard, adamic_adar). Compact wedge
    * enumeration — each wedge x—m—y (x < y) is generated EXACTLY
    * once by the id-position of its middle (see the block comment):
    * minimal Σ C(deg, 2) join output, no symmetric-frame blowup.
    *
    * The wedge AGGREGATE is where the face actually spends (the
    * near-complete sf0.1 graph makes 148M wedge rows landing on
    * ~101M distinct pairs — avg group size 1.5, so map-side combine
    * buys nothing and per-group state size is everything). Three
    * lean-state moves, all result-identical by construction:
    * (1) the Adamic–Adar term is pre-scaled to a 32-bit int on the
    * ~|E| edge frame (round(1/ln d, 6)·10^6 is an integer ≤ 1.45M;
    * the long-typed sum of ≤ deg_max of them is nowhere near
    * overflow), so the hot aggregate sums primitives, not
    * decimal(25,8), and shuffle rows carry 12 data bytes —
    * ~|E| ln() calls instead of ~Σd², and a flat 16-byte agg buffer
    * with no overflow-checked decimal path; (2) when node ids fit
    * 31 bits, (x, y) packs into ONE long key (x<y keeps the packing
    * order-stable) — half the key bytes, one hash/compare per probe;
    * (3) the aggregate's partition count is sized from the EXACT
    * wedge count Σ C(d, 2) — a one-row action on the cached degree
    * frame — so each final-agg task holds ~2M groups (~100 MB)
    * instead of inheriting whatever shuffle.partitions says; at
    * 1000 executors the same formula spreads a 100 TB graph's wedge
    * mass without per-task spill. */
  def linkPredict(edges: DataFrame, minCommon: Int = MinCommon): DataFrame = {
    val e0 = edges.transform(graft.CacheRegistry.register)
    // node-cardinality, consumed 4× (ed build ×2, scoreTail ×2) —
    // cached so the edge scan + degree shuffle runs once
    val deg = degrees(e0).transform(graft.CacheRegistry.register)
    // ONE bounded action on the cached node-sized frame: id range
    // (decides the packed-key gear) + exact wedge mass (sizes the
    // aggregate). Warms the deg cache the big plan reuses anyway.
    // Memoized per canonicalized edge plan (the hubGateMemo rationale,
    // r18 advice): the probe is a real Spark job, and plan-only uses
    // of linkPredict (Explain, spec plan asserts) must not launch a
    // degree shuffle on every call — within one session the same edge
    // frame's id range and wedge mass never change. min/max are cast
    // to long IN the agg so the probe is id-type-agnostic (an
    // IntegerType node column otherwise throws on getLong).
    val (packable, wedgeRows) = {
      if (linkStatsMemo.size > 64) linkStatsMemo.clear()
      linkStatsMemo.getOrElseUpdate(
        edges.queryExecution.analyzed.canonicalized, {
          val statsRow = deg.agg(min(col("node")).cast("long"),
            max(col("node")).cast("long"),
            sum(col("degree") * (col("degree") - lit(1L))).cast("long"))
            .head()
          (!statsRow.isNullAt(0) && statsRow.getLong(0) >= 0L &&
             statsRow.getLong(1) < (1L << 31),
           if (statsRow.isNullAt(2)) 0L else statsRow.getLong(2) / 2)
        })
    }
    val sessParts =
      e0.sparkSession.sessionState.conf.numShufflePartitions
    // ~2M groups (≤ wedge rows) per final-agg task ≈ 100 MB of hash
    // map — in-memory at local[32]/8g AND at executor scale
    val aggParts = math.max(sessParts,
      math.min(4096L, wedgeRows / 2000000L + 1L).toInt)
    // the one frame all three wedge cases self-join: a<b edges with
    // both endpoint degrees attached, each endpoint's Adamic–Adar
    // term pre-scaled to a long HERE (ta/tb), once per edge — the
    // wedge stream below only copies integers
    val scale = lit(1000000L)
    // degree-1 guard: a pendant endpoint can never BE a wedge middle
    // (a middle carries two edges), so its term is never consumed —
    // but ed is CACHED, which materializes the column for every row,
    // and 1/ln(1) is Infinity (a decimal cast of it is an ANSI
    // error). Zero is the safe never-read placeholder.
    def termOf(d: Column): Column =
      when(d >= 2, (aaTerm(d) * scale).cast("int")).otherwise(lit(0))
    // packed-gear range guard (r19 advice item 3): `packable` comes
    // from a plan-keyed MEMO, and unlike hubGateMemo (where staleness
    // is output-invariant) a stale packable=true after the same path
    // is rewritten in-session with ids >= 2^31 would CORRUPT the
    // shifted pack keys. Guarding the edge endpoints (|E| rows, once,
    // inside the cached frame) covers every wedge's x/y — the wedge
    // stream only copies these values — so a stale verdict fails
    // loudly instead of merging unrelated pairs.
    val idGuard: Column => Column =
      if (packable) { c =>
        val l = c.cast("long")
        when(l >= 0L && l < lit(1L << 31), c).otherwise(raise_error(
          concat(lit("linkPredict: node id out of packed range "),
            c.cast("string"))))
      } else identity
    val ed = e0
      .withColumn("a", idGuard(col("a")))
      .withColumn("b", idGuard(col("b")))
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
      .withColumn("ta", termOf(col("da")))
      .withColumn("tb", termOf(col("db")))
      .transform(graft.CacheRegistry.register)
    // m < x < y: two forward edges (m,x), (m,y) — join on the shared
    // lower endpoint, strict b-inequality inside the join condition;
    // the middle is the shared a, so its term is p.ta
    val c1 = ed.as("p").join(ed.as("q"),
        col("p.a") === col("q.a") && col("p.b") < col("q.b"))
      .select(col("p.b").as("x"), col("q.b").as("y"), col("p.ta").as("tm"))
    // x < m < y: edges (x,m), (m,y) — the in×out case; middle = p.b
    val c2 = ed.as("p").join(ed.as("q"), col("p.b") === col("q.a"))
      .select(col("p.a").as("x"), col("q.b").as("y"), col("p.tb").as("tm"))
    // x < y < m: two backward edges (x,m), (y,m); middle = shared b
    val c3 = ed.as("p").join(ed.as("q"),
        col("p.b") === col("q.b") && col("p.a") < col("q.a"))
      .select(col("p.a").as("x"), col("q.a").as("y"), col("p.tb").as("tm"))
    val wedges = c1.union(c2).union(c3)
    // the long-sum of pre-rounded 10^6-scaled terms re-divided once
    // IS the decimal sum cast to double: each term is an exact
    // integer, the long sum is exact, and one IEEE division by 10^6
    // is the correctly-rounded double of the same rational the
    // decimal cast would produce
    // ids ride as LONG from here down, both gears: shiftleft on an
    // IntegerType column is Int-typed in Spark (a 32-bit shift wraps
    // to garbage), and the two gears must agree on the output schema
    // for any input id type
    val hops = (if (packable) {
      wedges
        .select(shiftleft(col("x").cast("long"), 32)
          .bitwiseOR(col("y").cast("long")).as("xy"),
          col("tm"))
        .repartition(aggParts, col("xy"))
        .groupBy(col("xy"))
        .agg(count(lit(1)).as("cn"), sum(col("tm")).as("aae6"))
        .filter(col("cn") >= minCommon)
        .select(shiftright(col("xy"), 32).as("a"),
          col("xy").bitwiseAND(lit(0xffffffffL)).as("b"),
          col("cn"), (col("aae6").cast("double") / 1e6).as("aa"))
    } else {
      wedges
        .repartition(aggParts, col("x"), col("y"))
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("cn"), sum(col("tm")).as("aae6"))
        .filter(col("cn") >= minCommon)
        .select(col("x").cast("long").as("a"),
          col("y").cast("long").as("b"), col("cn"),
          (col("aae6").cast("double") / 1e6).as("aa"))
    })
    scoreTail(hops, e0, deg)
  }

  /** The legacy symmetric-frame 2-hop plan (each wedge enumerated
    * twice, a<b filtered post-join) — identical output, kept as the
    * spec's equality anchor for the compact rewrite. */
  def linkPredictLegacy(edges: DataFrame,
      minCommon: Int = MinCommon): DataFrame = {
    val e = edges.transform(graft.CacheRegistry.register)
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .union(e.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .withColumn("deg",
        count(lit(1)).over(Window.partitionBy(col("src"))))
      .transform(graft.CacheRegistry.register)
    val deg = sym.select(col("src").as("node"), col("deg").as("degree"))
      .distinct()
    val hops = sym.select(col("dst").as("a"), col("src").as("m"), col("deg"))
      .join(sym.select(col("src").as("m2"), col("dst").as("b")),
        col("m") === col("m2"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"),
        sum(aaTerm(col("deg"))).cast("double").as("aa"))
      .filter(col("cn") >= minCommon)
    scoreTail(hops, e, deg)
  }

  /** Face input: the deterministic 10% part-id subgraph. The FULL
    * co-purchase graph is near-complete (median degree 119 at sf0.1,
    * Σdeg² ≈ 3×10^8 2-hop rows — a 133 s bench face whose
    * predictions are also meaningless on an almost-complete graph);
    * the sampled subgraph keeps realistic sparsity (deg ~15), stays
    * non-vacuous at both SFs, and leaves the operator itself
    * unchanged and fully general. */
  def g05(s: SparkSession, dir: String): DataFrame =
    linkPredict(coEdges(
      Tables.lineitem(s, dir).filter(col("l_partkey") % 10 === 0)))

  /** The UNSAMPLED operator on the full near-complete co-purchase
    * graph (r15 verdict item 1's "done" bar) — benched under a
    * guard ceiling so the minimal-wedge plan's scale posture is a
    * measured number, not a claim. Stays benchOnly: its DuckDB
    * replay at sf0.01 is the g05 oracle face's job. */
  def g05Full(s: SparkSession, dir: String): DataFrame =
    linkPredict(coEdges(Tables.lineitem(s, dir)))

  /** Hub-skew bench pair (id-ordered baseline, gear pinned). */
  def g04HubSkew(s: SparkSession, dir: String): DataFrame =
    triangles(wheelEdges(s, dir), degreeOrdered = Some(false))

  /** Hub-skew bench pair (degree-ordered production gear, pinned —
    * the adaptive gate picks this same gear on this input; pinning
    * keeps the pair a clean A/B with no gate job in the timing). */
  def g04HubSkewOrdered(s: SparkSession, dir: String): DataFrame =
    triangles(wheelEdges(s, dir), degreeOrdered = Some(true))

  val g05Sql: String =
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                 WHERE l_partkey % 10 = 0),
       e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
             FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       sym AS (SELECT a AS src, b AS dst FROM e
               UNION ALL SELECT b, a FROM e),
       symd AS (SELECT src, dst, count(*) OVER (PARTITION BY src) AS deg
                FROM sym),
       deg AS (SELECT DISTINCT src, deg FROM symd),
       hops AS (SELECT h1.dst AS a, h1.src AS m, h2.dst AS b, h1.deg
                FROM symd h1 JOIN symd h2 ON h1.src = h2.src
                WHERE h1.dst < h2.dst),
       agg AS (SELECT a, b, count(*) AS cn,
                 CAST(sum(CAST(round(1.0 / ln(CAST(deg AS DOUBLE)), 6) AS DECIMAL(25,8))) AS DOUBLE) AS aa
               FROM hops GROUP BY 1, 2 HAVING count(*) >= $MinCommon),
       ne AS (SELECT agg.* FROM agg
              LEFT JOIN e ON agg.a = e.a AND agg.b = e.b
              WHERE e.a IS NULL),
       rk AS (SELECT *, row_number() OVER (PARTITION BY a
                ORDER BY cn DESC, b) AS rank FROM ne)
       SELECT rk.a, rank, rk.b, cn,
         round(CAST(cn AS DOUBLE) / (da.deg + db.deg - cn), 6) AS jaccard,
         round(aa, 6) AS adamic_adar
       FROM rk JOIN deg da ON rk.a = da.src JOIN deg db ON rk.b = db.src
       WHERE rank <= $TopPredictions"""

  // ---------------------------------------------------------------
  // g06: k-core decomposition — the density filter of the graph
  // family (g03 ranks nodes, g04 measures cohesion, g05 scores
  // missing edges; g06 EXTRACTS the dense kernel). The k-core is the
  // maximal subgraph where every node keeps degree ≥ k — the classic
  // fraud-ring / collusion-community primitive (Seidman 1983): a
  // ring of accounts trading with each other survives the peel,
  // loosely-attached organic buyers do not. Computed by the standard
  // simultaneous peel: drop ALL nodes of degree < k, recompute
  // degrees on the induced subgraph, repeat to fixpoint.
  //
  // Oracle parity: the peel is deterministic (no tie-breaks, no
  // floats — pure degree thresholding), so the DuckDB replay unrolls
  // KcoreUnroll rounds of the identical round body; past the
  // fixpoint every extra round is the identity, so the unroll bound
  // only needs rounds(sf0.01) ≤ KcoreUnroll (measured 5 at k=80 on
  // sf0.01 AND sf0.1; the spec pins a planted slow-peel graph and
  // the fail-fast). The CTEs are MATERIALIZED: each round references
  // its predecessor three times, and DuckDB's default inline
  // expansion would grow 3^rounds.
  //
  // Scale: each round is one combiner-friendly degree aggregate plus
  // two node-keyed semi-joins over a frame that only SHRINKS; the
  // loop carries the d06 discipline — eager localCheckpoint per
  // round (flat lineage), metadata-only convergence probe (isEmpty
  // on the dropped-node set, never a collect), maxIter fail-fast.
  // Unlike connected components there is no pointer-doubling analog
  // (peeling depth is a property of the degeneracy ordering, not of
  // reachability), but rounds are bounded by the peel DEPTH — small
  // on real degree distributions (≤ 5 observed here) — and the
  // fail-fast turns a pathological input (a long path peels 2 nodes
  // per round at k = 2) into an error, not a hang.
  // ---------------------------------------------------------------

  /** Face threshold: between the co-purchase graph's min degree (38-
    * 42) and the cascade point (k ≥ 90 empties it) — the core is
    * non-trivial (143 of 2000 nodes peel at sf0.01) and non-empty at
    * both oracle SFs. */
  val KcoreK = 80
  /** Oracle unroll budget (rounds past the fixpoint are no-ops). */
  val KcoreUnroll = 12

  /** The k-core of undirected (a, b) edges: (node, degree,
    * core_degree) for every node that survives — full-graph degree
    * beside the induced-subgraph degree the core guarantee holds on
    * (core_degree ≥ k by construction). Empty output when the whole
    * graph peels away. */
  def kcore(edges: DataFrame, k: Int = KcoreK, maxIter: Int = 30): DataFrame = {
    val e0 = edges.select(col("a"), col("b"))
      .transform(graft.CacheRegistry.register)
    val fullDeg = degrees(e0).transform(graft.CacheRegistry.register)
    var cur = e0.localCheckpoint(true)
    // node-cardinality, consumed three times (probe + both semi-joins,
    // and the CONVERGED round's frame IS the output's core degrees) —
    // checkpointed so the degree shuffle runs once per round
    var deg = degrees(cur).localCheckpoint(true)
    var converged = deg.filter(col("degree") < k).isEmpty
    var i = 0
    while (!converged && i < maxIter) {
      val keep = deg.filter(col("degree") >= k).select(col("node"))
      cur = cur
        .join(keep, cur("a") === keep("node"), "left_semi")
        .join(keep, cur("b") === keep("node"), "left_semi")
        .localCheckpoint(true)
      deg = degrees(cur).localCheckpoint(true)
      converged = deg.filter(col("degree") < k).isEmpty
      i += 1
    }
    require(converged, s"kcore: no fixpoint after $maxIter rounds")
    deg.withColumnRenamed("degree", "core_degree")
      .join(fullDeg, "node")
      .select(col("node"), col("degree"), col("core_degree"))
  }

  /** The face pins maxIter to the ORACLE's unroll budget: a peel
    * needing 13-30 rounds would converge on the Spark side but leave
    * the 12-round DuckDB replay mid-peel — a silent hash mismatch.
    * Capping at KcoreUnroll turns that (data-growth) scenario into an
    * explicit fail-fast naming the bound to raise. Observed rounds: 5
    * at both sf0.01 and sf0.1. */
  def g06(s: SparkSession, dir: String): DataFrame =
    kcore(coEdges(Tables.lineitem(s, dir)), maxIter = KcoreUnroll)

  /** DuckDB replay: KcoreUnroll unrolled peel rounds, MATERIALIZED
    * (see the block comment — inline expansion is 3^rounds). */
  val g06Sql: String = {
    val rounds = (1 to KcoreUnroll).map { i =>
      s"""d$i AS MATERIALIZED (SELECT node, count(*) AS c FROM (
             SELECT a AS node FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) GROUP BY 1),
       e$i AS MATERIALIZED (SELECT e${i - 1}.a, e${i - 1}.b FROM e${i - 1}
             JOIN d$i da ON e${i - 1}.a = da.node
             JOIN d$i db ON e${i - 1}.b = db.node
             WHERE da.c >= $KcoreK AND db.c >= $KcoreK)"""
    }.mkString(",\n       ")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
             FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       $rounds,
       fdeg AS (SELECT node, count(*) AS degree FROM (
                  SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
       cdeg AS (SELECT node, count(*) AS core_degree FROM (
                  SELECT a AS node FROM e$KcoreUnroll
                  UNION ALL SELECT b FROM e$KcoreUnroll) GROUP BY 1)
       SELECT c.node, f.degree, c.core_degree
       FROM cdeg c JOIN fdeg f ON c.node = f.node"""
  }

  // ---------------------------------------------------------------
  // g07: one-row graph census — the health summary a graph pipeline
  // publishes before anyone runs the expensive analytics (the c13
  // corpus-census idea applied to the graph family): node/edge
  // counts, max degree (the hub-gate signal), triangle and wedge
  // totals, and the GLOBAL clustering coefficient 3·tri/wedges (the
  // transitivity ratio — how much of the co-purchase structure is
  // genuinely clustered vs star-shaped). Everything derives from ONE
  // aggregate over g04's per-node triangle frame: n_edges = Σdeg/2,
  // wedges = ΣC(deg,2), triangles = Σ per-node counts / 3 — integer
  // identities, so the census is exact and the only division is the
  // final rounded coefficient.
  // ---------------------------------------------------------------

  /** One census row over any undirected edge frame: (n_nodes,
    * n_edges, max_degree, n_wedges, n_triangles, gcc). Nodes are the
    * edge-incident ones (an isolated vertex has no edge row — the
    * g04 convention). */
  def graphCensus(edges: DataFrame,
      degIn: Option[DataFrame] = None): DataFrame = {
    // r20: the census needs only the triangle TOTAL, so it aggregates
    // the per-edge common-neighbor frame directly — Σ|common| counts
    // each triangle exactly once at its (a, b) edge, which equals the
    // old Σ per-node credits DIV 3 — and skips triangles()'s per-node
    // credit explode, its groupBy shuffle, and the degree join. The
    // degree side of the census is one aggregate over the cached
    // degree frame both paths already build.
    val (deg, commons) = edgeCommons(edges, None, degIn)
    // integral DIV, not `/` (the packSequences lesson): Column `/`
    // routes long sums through a double, which loses exactness past
    // ~2^52 — reachable for Σ deg·(deg−1) on a hub-skewed TB graph
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(degree) DIV 2").as("n_edges"),
      max(col("degree")).as("max_degree"),
      expr("sum(degree * (degree - 1)) DIV 2").as("n_wedges"))
    val triStats = commons
      .agg(sum(size(col("common")).cast("long")).as("tri0"))
    degStats.crossJoin(triStats)
      // null parity with the per-node formulation: an EMPTY graph
      // aggregates to null (no rows anywhere), while a graph with
      // nodes but no closeable edge (commons empty after the inner
      // joins) must read 0 — the per-node sum saw explicit zeros.
      .select(col("n_nodes"), col("n_edges"), col("max_degree"),
        col("n_wedges"),
        coalesce(col("tri0"),
          when(col("n_nodes") > 0, lit(0L))).as("n_triangles"))
      .select(col("n_nodes"), col("n_edges"), col("max_degree"),
        col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise(round((lit(3L) * col("n_triangles")).cast("double") /
            col("n_wedges"), 6)).as("gcc"))
  }

  def g07(s: SparkSession, dir: String): DataFrame =
    graphCensus(coEdges(Tables.lineitem(s, dir)))

  /** Wraps g04's per-node replay with the census aggregate (the d14
    * composition convention). */
  val g07Sql: String =
    s"""WITH t AS ($g04Sql)
       SELECT * , CASE WHEN n_wedges = 0 THEN 0.0
         ELSE round(CAST(3 * n_triangles AS DOUBLE) / n_wedges, 6) END AS gcc
       FROM (
         SELECT count(*) AS n_nodes,
           CAST(sum(degree) // 2 AS BIGINT) AS n_edges,
           max(degree) AS max_degree,
           CAST(sum(degree * (degree - 1)) // 2 AS BIGINT) AS n_wedges,
           CAST(sum(n_triangles) // 3 AS BIGINT) AS n_triangles
         FROM t)"""

  // ---------------------------------------------------------------
  // GRAPH MART (r18 verdict item 2 — the c10_clean_staged posture
  // applied to graphs): every in-plan graph face rebuilds the
  // co-purchase edge frame from lineitem (self-join + two distincts,
  // the single most expensive shared subtree of the family); a
  // production pipeline builds the symmetric edge + degree frames
  // ONCE and serves census / triangles / k-core / PageRank /
  // propagation off the artifact. The mart is two narrow parquet
  // frames — edges (a, b: a<b undirected, distinct) and degrees
  // (node, degree) — and the staged twins are ORACLE faces sharing
  // the in-plan faces' SQL (the d12/s15 "the artifact changes
  // nothing" convention): bit-identical output is the contract, the
  // skipped rebuild is the bench delta. At 100 TB the mart is the
  // only posture that works at all: nobody re-derives a trillion-row
  // edge list five times a day.
  // ---------------------------------------------------------------

  /** Materialize the co-purchase graph mart from ONE cached
    * co-purchase join: `martDir/edges` + `martDir/degrees`. */
  def writeGraphMart(s: SparkSession, dir: String, martDir: String): Unit =
    graft.CacheRegistry.scoped {
      val e = coEdges(Tables.lineitem(s, dir))
        .transform(graft.CacheRegistry.register)
      e.write.mode("overwrite").parquet(s"$martDir/edges")
      degrees(e).write.mode("overwrite").parquet(s"$martDir/degrees")
    }

  def martEdges(s: SparkSession, martDir: String): DataFrame =
    s.read.parquet(s"$martDir/edges")
  def martDegrees(s: SparkSession, martDir: String): DataFrame =
    s.read.parquet(s"$martDir/degrees")

  // ---------------------------------------------------------------
  // Cross-session build-once ensure (r19 verdict item 6 — the 31e
  // census-artifact pattern applied to the mart): the mart is a
  // per-CORPUS artifact, so a pid-scoped root made every fresh JVM
  // rebuild it (5.9 s at sf1). The root is now STABLE, keyed by a
  // per-file (path, length, mtime) fingerprint of the lineitem input
  // (the same validity key strength as the gear census — an
  // mtime-preserving replace still flips it via length, and any
  // rewrite flips mtime). A corpus change yields a DIFFERENT root, so
  // a matching root can never serve stale data; stale sibling
  // versions of the same tag are swept on rebuild. Commit protocol:
  // build into a pid-suffixed tmp sibling, write FINGERPRINT last,
  // then one atomic local-fs rename — a torn build is invisible
  // (validity also demands both parquet _SUCCESS markers, so a
  // partially deleted artifact is rebuilt, spec-pinned). Corpora
  // whose input can't be fingerprinted fall back to the r18
  // pid-scoped posture. A production deployment would key on a table
  // version instead of file statuses.
  // ---------------------------------------------------------------
  private val martLock = new Object

  /** Mart-build counter — spec hook: a matching artifact must be
    * SERVED (no Spark job), never rebuilt. */
  private[graft] val martBuilds = new java.util.concurrent.atomic.AtomicLong

  private def martBase: String =
    s"${System.getProperty("java.io.tmpdir")}/graft-graphmart-shared"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Per-file (path, length, mtime) fingerprint of the mart's input
    * table — None when unfingerprintable (missing path, status
    * failure), which routes to the pid-scoped fallback. Pure
    * driver-side FileSystem listing, NEVER a DataFrame: a fresh
    * `spark.read.parquet` pays a schema-inference job, and the whole
    * point of the serve path is zero jobs (spec-pinned). */
  private def martFingerprint(s: SparkSession, dir: String): Option[String] =
    scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/lineitem.parquet")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        def leaves(x: org.apache.hadoop.fs.FileStatus)
            : Seq[org.apache.hadoop.fs.FileStatus] =
          if (x.isDirectory)
            fs.listStatus(x.getPath).toSeq
              .filterNot { c =>
                val n = c.getPath.getName
                n.startsWith("_") || n.startsWith(".")
              }.flatMap(leaves)
          else Seq(x)
        val stats = leaves(fs.getFileStatus(p))
          .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
          .sortBy(_._1)
        if (stats.isEmpty) None
        else {
          val sep = "\u0000"
          Some(md5hex(stats.map { case (f, l, m) => s"$f$sep$l$sep$m" }
            .mkString("\n")))
        }
      }
    }.toOption.flatten

  private def martValid(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, fp: String): Boolean =
    scala.util.Try {
      val marker = new org.apache.hadoop.fs.Path(root, "FINGERPRINT")
      fs.exists(marker) &&
        fs.exists(new org.apache.hadoop.fs.Path(root, "edges/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(root, "degrees/_SUCCESS")) && {
          val in = fs.open(marker)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          txt.trim == fp
        }
    }.getOrElse(false)

  def ensureGraphMart(s: SparkSession, dir: String): String =
    martLock.synchronized {
      val tag = "mart-" + dir.replaceAll("[^A-Za-z0-9.-]", "_")
      martFingerprint(s, dir) match {
        case Some(fp) =>
          val base = new org.apache.hadoop.fs.Path(martBase)
          val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
          val root = new org.apache.hadoop.fs.Path(base, s"$tag-$fp")
          if (!martValid(fs, root, fp)) {
            martBuilds.incrementAndGet()
            val tmp = new org.apache.hadoop.fs.Path(base,
              s".build-${ProcessHandle.current().pid()}-$tag-$fp")
            fs.delete(tmp, true)
            writeGraphMart(s, dir, tmp.toString)
            val out = fs.create(
              new org.apache.hadoop.fs.Path(tmp, "FINGERPRINT"), true)
            try out.write((fp + "\n").getBytes("UTF-8")) finally out.close()
            // a concurrent pid may have committed a valid root while we
            // built — serve it and drop ours; else replace the garbage
            if (martValid(fs, root, fp)) fs.delete(tmp, true)
            else {
              fs.delete(root, true)
              fs.mkdirs(base)
              if (!fs.rename(tmp, root)) fs.delete(tmp, true)
            }
            // sweep stale corpus versions of this tag + dead-pid tmp
            // leftovers — the leak stays bounded by live versions
            scala.util.Try {
              fs.listStatus(base).foreach { st =>
                val n = st.getPath.getName
                if (n.startsWith(s"$tag-") && n != s"$tag-$fp")
                  fs.delete(st.getPath, true)
                else if (n.startsWith(".build-")) {
                  val pid = n.stripPrefix(".build-").takeWhile(_.isDigit)
                  val alive = pid.nonEmpty && scala.util.Try(
                    ProcessHandle.of(pid.toLong)
                      .map[Boolean](_.isAlive).orElse(false)).getOrElse(true)
                  if (!alive) fs.delete(st.getPath, true)
                }
              }
            }
          }
          root.toString
        case None =>
          val root = graft.PidScratch.path("graft-graphmart", tag)
          val marker =
            new org.apache.hadoop.fs.Path(s"$root/degrees/_SUCCESS")
          val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (!fs.exists(marker)) {
            martBuilds.incrementAndGet()
            writeGraphMart(s, dir,
              graft.PidScratch.fresh(s, "graft-graphmart", tag))
          }
          root
      }
    }

  def g03Staged(s: SparkSession, dir: String): DataFrame =
    pagerank(martEdges(s, ensureGraphMart(s, dir)))

  def g04Staged(s: SparkSession, dir: String): DataFrame = {
    val m = ensureGraphMart(s, dir)
    triangles(martEdges(s, m), degIn = Some(martDegrees(s, m)))
  }

  def g06Staged(s: SparkSession, dir: String): DataFrame =
    kcore(martEdges(s, ensureGraphMart(s, dir)), maxIter = KcoreUnroll)

  def g07Staged(s: SparkSession, dir: String): DataFrame = {
    val m = ensureGraphMart(s, dir)
    graphCensus(martEdges(s, m), Some(martDegrees(s, m)))
  }

  def f34Staged(s: SparkSession, dir: String): DataFrame =
    personalizedPagerank(martEdges(s, ensureGraphMart(s, dir)),
      Fraud.f21(s, dir).select(col("item_id").as("node")))

  /** Bench face: ONE fresh mart build + a full artifact read-back
    * of BOTH halves (edges ∪ degrees, harmonized to two long
    * columns — r19 advice item 5: returning edges alone
    * under-measured the stated denominator) — the cost a production
    * pipeline pays once per graph refresh, measured so the
    * staged-vs-in-plan delta has its denominator. */
  def g08MartBuild(s: SparkSession, dir: String): DataFrame = {
    val root = graft.PidScratch.fresh(s, "graft-graphmart",
      "build-" + dir.replaceAll("[^A-Za-z0-9.-]", "_"))
    writeGraphMart(s, dir, root)
    martEdges(s, root)
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .unionByName(martDegrees(s, root)
        .select(col("node").cast("long").as("a"),
          col("degree").cast("long").as("b")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g03_pagerank" -> (g03 _),
    "g04_triangles" -> (g04 _),
    "g05_link_predict" -> (g05 _),
    "g06_kcore" -> (g06 _),
    "g07_graph_census" -> (g07 _),
    "f34_risk_propagation" -> (f34 _),
    // mart-served staged twins: same output, same oracle, the
    // lineitem rebuild replaced by the artifact read
    "g03_pagerank_staged" -> (g03Staged _),
    "g04_triangles_staged" -> (g04Staged _),
    "g06_kcore_staged" -> (g06Staged _),
    "g07_census_staged" -> (g07Staged _),
    "f34_propagation_staged" -> (f34Staged _))

  val oracles: Map[String, String] = Map(
    "g03_pagerank" -> g03Sql,
    "g04_triangles" -> g04Sql,
    "g05_link_predict" -> g05Sql,
    "g06_kcore" -> g06Sql,
    "g07_graph_census" -> g07Sql,
    "f34_risk_propagation" -> f34Sql,
    "g03_pagerank_staged" -> g03Sql,
    "g04_triangles_staged" -> g04Sql,
    "g06_kcore_staged" -> g06Sql,
    "g07_census_staged" -> g07Sql,
    "f34_propagation_staged" -> f34Sql)
}
