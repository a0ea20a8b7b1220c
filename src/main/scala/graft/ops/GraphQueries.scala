package graft.ops

import graft.ops.Pin.PinOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q121/q122: graph analytics over the co-purchase part graph — the
  * two classic whole-graph operators (triangle counting, PageRank)
  * that complement [[Components]]' connectivity family, registered
  * over a real derived graph so the DuckDB oracle pins them on data.
  * No reference counterpart (the reference has no graph surface);
  * these are the operators a training-data/analytics engine needs
  * once near-dup edges, co-occurrence pairs, or link tables exist as
  * frames. Algorithm cores live in [[GraphOps]].
  *
  * The graph: parts co-purchased within an order (q110's pair table,
  * un-thresholded) — undirected, canonical edges a < b. Vertices are
  * edge endpoints; parts never co-purchased don't appear (the same
  * vertex-universe rule as [[Components.connectedComponents]]).
  */
object GraphQueries {
  import Tables._

  /** Canonical (a < b, distinct) co-purchase edge list. Shared by both
    * graph queries; derived from lineitem exactly like q110's pair
    * table so the two surfaces can never disagree on what "the
    * co-purchase graph" means.
    */
  private def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    // ONE exchange builds per-order DISTINCT part sets (collect_set
    // dedups, so the old standalone `.distinct()` pre-pass is fused
    // into the aggregate), pairs enumerate EXECUTOR-LOCALLY from the
    // sorted set (array order ⇒ a < b), then the global pair distinct.
    // Replaces the distinct → broadcast self-join → distinct chain:
    // same edge set, but the derivation drops one full pass over the
    // distinct frame plus the broadcast build/probe (r10 stage trace:
    // the old chain owned ~2.8 s of every graph query's cold run —
    // seven queries ride this helper). Set sizes are bounded by order
    // width (≤7 lineitems in this schema), so the per-row expansion is
    // O(width²) with a small constant — the same pairs the join
    // emitted, produced where the data already sits (guide §2.4).
    //
    // TWO chained generators, NOT a lambda HOF: the first form of this
    // rewrite built the pairs with flatten(transform(... transform
    // (slice ...))), and lambda higher-order functions are
    // CodegenFallback — at the 64× replica the pair stage went
    // GC-bound on interpreted struct allocation (709 task-seconds of
    // GC in one stage). posexplode + explode(slice(...)) stay inside
    // WholeStageCodegen (the docShingles lesson, re-learned).
    lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps")) - col("i") - lit(1))).as("b"))
      .distinct()
  }

  private val edgesCteSql: String =
    "li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
      "edges AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b FROM li x " +
      "JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)"

  // ---------------------------------------------------------------------
  // q121 — per-node triangle counts ([[GraphOps.triangleCounts]]:
  // degree-ordered orientation, each triangle found once at its
  // lowest-degree corner, wedge table bounded O(m^1.5) instead of
  // hub-quadratic). The oracle is the naive a<b<c three-way self-join
  // — exact, and super-linear in exactly the way the oriented plan
  // exists to avoid, the q99→q111 relationship on the graph axis.
  //
  // Scale: at 100 TB the edge frame arrives pre-materialized (edge
  // DERIVATION is the expensive part here, not the counting);
  // orientation is what survives skew — see GraphOps scaladoc.
  val q121: QuerySpec = QuerySpec(
    "q121_triangle_count",
    (s, d) =>
      GraphOps.triangleCounts(copurchaseEdges(s, d), "a", "b")
        .select(col("v").as("part_key"), col("n_tri"))
        .orderBy("part_key"),
    Some(
      s"WITH $edgesCteSql, " +
        "verts AS (SELECT a AS v FROM edges UNION SELECT b FROM edges), " +
        "tris AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM edges e1 " +
        "JOIN edges e2 ON e1.b = e2.a JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b), " +
        "pernode AS (SELECT v, count(*) AS n_tri FROM (SELECT x AS v FROM tris " +
        "UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris) GROUP BY 1) " +
        "SELECT verts.v AS part_key, CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri " +
        "FROM verts LEFT JOIN pernode ON pernode.v = verts.v ORDER BY part_key"
    ),
  )

  // ---------------------------------------------------------------------
  // q122 — fixed-point PageRank ([[GraphOps.pageRankFixed]]: 3 damped
  // iterations at integer scale 10⁹ — bit-identical on any engine and
  // any row order, which is what lets a DuckDB oracle hash-pin all N
  // ranks of an iterative numeric algorithm at all).
  val q122: QuerySpec = QuerySpec(
    "q122_pagerank_fixed",
    (s, d) =>
      GraphOps.pageRankFixed(copurchaseEdges(s, d), "a", "b")
        .select(col("v").as("part_key"), col("pr").as("pagerank_fp"))
        .orderBy("part_key"),
    Some(
      s"WITH $edgesCteSql, " +
        "sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges), " +
        "deg AS (SELECT a AS v, count(*) AS d FROM sym GROUP BY 1), " +
        "pr0 AS (SELECT v, CAST(1000000000 AS BIGINT) AS pr, d FROM deg), " +
        "it1 AS (SELECT s.b AS v, CAST(150000000 + (85 * sum(p.pr // p.d)) // 100 AS BIGINT) AS pr " +
        "FROM sym s JOIN pr0 p ON p.v = s.a GROUP BY 1), " +
        "pr1 AS (SELECT i.v, i.pr, d.d FROM it1 i JOIN deg d ON d.v = i.v), " +
        "it2 AS (SELECT s.b AS v, CAST(150000000 + (85 * sum(p.pr // p.d)) // 100 AS BIGINT) AS pr " +
        "FROM sym s JOIN pr1 p ON p.v = s.a GROUP BY 1), " +
        "pr2 AS (SELECT i.v, i.pr, d.d FROM it2 i JOIN deg d ON d.v = i.v), " +
        "it3 AS (SELECT s.b AS v, CAST(150000000 + (85 * sum(p.pr // p.d)) // 100 AS BIGINT) AS pr " +
        "FROM sym s JOIN pr2 p ON p.v = s.a GROUP BY 1) " +
        "SELECT v AS part_key, pr AS pagerank_fp FROM it3 ORDER BY part_key"
    ),
  )

  // ---------------------------------------------------------------------
  // q139 — multi-source BFS hop distance ([[GraphOps.bfsHops]]): how
  // many co-purchase hops each part sits from the nearest max-size
  // (p_size = 50) part. The reachability-with-distance primitive the
  // graph family lacks (components answer "connected at all",
  // PageRank "how central" — neither answers "how FAR"), and the
  // iterative-loop shape where first-discovery-is-final lets each
  // round shuffle only the frontier, never re-relax settled vertices.
  //
  // The oracle is a recursive CTE enumerating every (vertex, depth)
  // derivation then taking min(depth) — exact, and exponential in
  // path multiplicity the way the level-synchronous plan never is
  // (the q99→q111 relationship on the traversal axis). Both sides
  // cap depth at 20; the co-purchase graph's diameter is ~2, so the
  // cap is a safety rail, not a semantic bound.
  val q139: QuerySpec = QuerySpec(
    "q139_bfs_hops",
    (s, d) =>
      GraphOps.bfsHops(
        copurchaseEdges(s, d), "a", "b",
        part(s, d).where(col("p_size") === 50), "p_partkey")
        .select(col("v").as("part_key"), col("d").as("hops"))
        .orderBy("part_key"),
    Some(
      s"WITH RECURSIVE $edgesCteSql, " +
        "sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges), " +
        "seeds AS (SELECT DISTINCT a AS v FROM sym JOIN part ON p_partkey = a WHERE p_size = 50), " +
        "r AS (SELECT v, 0 AS d FROM seeds " +
        "UNION SELECT s.b AS v, r.d + 1 AS d FROM r JOIN sym s ON s.a = r.v WHERE r.d < 20) " +
        "SELECT v AS part_key, CAST(min(d) AS BIGINT) AS hops FROM r GROUP BY 1 ORDER BY 1"
    ),
  )

  // ---------------------------------------------------------------------
  // q150 — density communities by deterministic label propagation
  // ([[GraphOps.labelPropagation]], 3 synchronous rounds, min-label
  // ties). The fourth graph axis: components say "connected",
  // PageRank "central", BFS "how far" — LPA says "which DENSE
  // region", and one component can hold many communities. The
  // determinism engineering (sync rounds + total-order tie-break +
  // fixed round count) is what makes an algorithm that is usually
  // run-order-dependent ORACLE-CHECKABLE: DuckDB replays the same
  // three rounds as windowed mode-with-tie-break CTEs and must agree
  // on every one of the N per-node assignments.
  val q150: QuerySpec = QuerySpec(
    "q150_label_propagation",
    (s, d) =>
      GraphOps.labelPropagation(copurchaseEdges(s, d), "a", "b", rounds = 3)
        .select(col("v").as("part_key"), col("lbl").as("community"))
        .orderBy("part_key"),
    Some {
      val round = (r: Int, prev: String) =>
        s"l$r AS (SELECT v, lbl FROM (SELECT u.v AS v, p.lbl, count(*) AS c, " +
          "row_number() OVER (PARTITION BY u.v ORDER BY count(*) DESC, p.lbl) AS rn " +
          s"FROM und u JOIN $prev p ON p.v = u.u GROUP BY 1, 2) WHERE rn = 1)"
      s"WITH $edgesCteSql, " +
        "und AS (SELECT a AS v, b AS u FROM edges UNION ALL SELECT b, a FROM edges), " +
        "l0 AS (SELECT DISTINCT v, v AS lbl FROM und), " +
        s"${round(1, "l0")}, ${round(2, "l1")}, ${round(3, "l2")} " +
        "SELECT v AS part_key, lbl AS community FROM l3 ORDER BY part_key"
    },
  )

  // ---------------------------------------------------------------------
  // q180 — local clustering coefficient: cc(v) = 2·tri(v) /
  // (deg(v)·(deg(v)−1)) — the "how cliquish is this node's
  // neighborhood" statistic that separates hub-and-spoke structure
  // (cc → 0) from community structure (cc → 1); the per-node
  // companion to q121's raw triangle counts and q150's communities.
  //
  // Determinism: triangles and degrees are exact integers;
  // cc_bp = (2·10⁴·tri) div (deg·(deg−1)) floors to an integer (0 for
  // deg < 2 — an isolated edge endpoint has no possible triangle).
  //
  // Scale: degrees are one edge aggregate; triangles ride
  // [[GraphOps.triangleCounts]]' degree-ordered orientation (wedges
  // O(m^1.5), not hub-quadratic); the final join is |V|-sized.
  val q180: QuerySpec = QuerySpec(
    "q180_clustering_coeff",
    (s, d) => {
      // both consumers (degrees, triangle orientation) read the edge
      // frame — one eager checkpoint pins ONE derivation of the
      // distinct co-purchase self-join instead of two full recomputes
      val edges = copurchaseEdges(s, d).pinLineage()
      val deg = edges.select(col("a").as("v"))
        .unionAll(edges.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("degree"))
      GraphOps.triangleCounts(edges, "a", "b")
        .join(deg, Seq("v"))
        .select(col("v").as("part_key"), col("degree"), col("n_tri"),
          when(col("degree") >= 2,
            expr("(20000 * n_tri) div (degree * (degree - 1))"))
            .otherwise(lit(0L)).as("cc_bp"))
        .orderBy("part_key")
    },
    Some(
      s"WITH $edgesCteSql, " +
        "verts AS (SELECT a AS v FROM edges UNION SELECT b FROM edges), " +
        "deg AS (SELECT v, count(*) AS degree FROM " +
        "(SELECT a AS v FROM edges UNION ALL SELECT b FROM edges) GROUP BY 1), " +
        "tris AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM edges e1 " +
        "JOIN edges e2 ON e1.b = e2.a JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b), " +
        "pernode AS (SELECT v, count(*) AS n_tri FROM (SELECT x AS v FROM tris " +
        "UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris) GROUP BY 1) " +
        "SELECT verts.v AS part_key, degree, " +
        "CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri, " +
        "CASE WHEN degree >= 2 THEN (20000 * CAST(coalesce(n_tri, 0) AS BIGINT)) " +
        "// (degree * (degree - 1)) ELSE 0 END AS cc_bp " +
        "FROM verts JOIN deg USING (v) LEFT JOIN pernode ON pernode.v = verts.v " +
        "ORDER BY part_key"
    ),
  )

  // ---------------------------------------------------------------------
  // q256 — HUB-CAPPED clustering coefficient (r9): q180's bounded-work
  // form ([[GraphOps.hubCappedClusteringCoeff]]). The top 1% of
  // vertices by (degree desc, v) — the q63 heavy-hitter trigger,
  // rank-based so it fires on any degree distribution — are
  // excluded-and-reported (is_hub, cc_bp = −1; exclusion, never
  // sampling, so the WHOLE operator stays deterministic and
  // oracle-checked); everyone else gets the exact coefficient over the
  // hub-pruned subgraph, with both degrees reported. q180 remains the
  // full exact statistic; this is the form a 100 TB graph runs when
  // the densest vertices dominate wedge mass (q180's 256× probe:
  // 531.8 s, ~all of it wedges at the dense tail).
  //
  // Determinism: the hub set is a rank with a total order; everything
  // downstream is q180's integer arithmetic on the pruned subgraph.
  // Work bound: every pruned degree ≤ the lowest hub degree BY
  // CONSTRUCTION — the wedge table is m·d_cap-bounded.
  val q256: QuerySpec = QuerySpec(
    "q256_cc_hub_capped",
    (s, d) =>
      GraphOps.hubCappedClusteringCoeff(copurchaseEdges(s, d), "a", "b", hubFrac = 100)
        .select(col("v").as("part_key"), col("degree"), col("is_hub"),
          col("pruned_degree"), col("n_tri"), col("cc_bp"))
        .orderBy("part_key"),
    Some(
      s"WITH $edgesCteSql, " +
        "deg AS (SELECT v, count(*) AS degree FROM " +
        "(SELECT a AS v FROM edges UNION ALL SELECT b FROM edges) GROUP BY 1), " +
        "t AS (SELECT count(*) AS n FROM deg), " +
        "hubs AS MATERIALIZED (SELECT v FROM " +
        "(SELECT v, row_number() OVER (ORDER BY degree DESC, v) AS rk FROM deg), t " +
        "WHERE rk <= (n + 99) // 100), " +
        "ep AS MATERIALIZED (SELECT a, b FROM edges " +
        "WHERE a NOT IN (SELECT v FROM hubs) AND b NOT IN (SELECT v FROM hubs)), " +
        "degp AS (SELECT v, count(*) AS pd FROM " +
        "(SELECT a AS v FROM ep UNION ALL SELECT b FROM ep) GROUP BY 1), " +
        "tris AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM ep e1 " +
        "JOIN ep e2 ON e1.b = e2.a JOIN ep e3 ON e3.a = e1.a AND e3.b = e2.b), " +
        "pern AS (SELECT v, count(*) AS n_tri FROM (SELECT x AS v FROM tris " +
        "UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris) GROUP BY 1) " +
        "SELECT d.v AS part_key, d.degree, d.v IN (SELECT v FROM hubs) AS is_hub, " +
        "CAST(coalesce(dp.pd, 0) AS BIGINT) AS pruned_degree, " +
        "CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri, " +
        "CASE WHEN d.v IN (SELECT v FROM hubs) THEN -1 " +
        "WHEN coalesce(dp.pd, 0) >= 2 THEN " +
        "(20000 * CAST(coalesce(p.n_tri, 0) AS BIGINT)) // (dp.pd * (dp.pd - 1)) " +
        "ELSE 0 END AS cc_bp " +
        "FROM deg d LEFT JOIN degp dp ON dp.v = d.v LEFT JOIN pern p ON p.v = d.v " +
        "ORDER BY part_key"
    ),
  )

  // ---------------------------------------------------------------------
  // q190 — bounded k-core peel ([[GraphOps.kCorePeel]]): 4 synchronous
  // rounds of dropping co-purchase vertices with degree < 80, then
  // each survivor's in-core degree. The graph-quality filter the
  // family lacks (components: "connected at all", PageRank: "how
  // central", triangles: "how clustered" — the core answers "how
  // EMBEDDED": survives only with ≥k similarly-embedded neighbors),
  // and the filter link-graph corpus curation runs before trusting
  // pages (Seidman 1983 k-cores).
  //
  // Bounded rounds are the oracle-checkable statistic (the q122
  // fixed-iteration rule); at sf0.01 the 80-peel has real cascade
  // (115.7k → 105.3k edges over 4 rounds, fixpoint at 6) so the pin
  // exercises genuine attrition, not a no-op. The oracle replays the
  // same 4 rounds as MATERIALIZED CTEs — without MATERIALIZED,
  // DuckDB inlines each round's frame into its 3 consumers and the
  // chain re-executes exponentially (the engine-side analog is
  // exactly why the loop pins lineage per round).
  val q190: QuerySpec = QuerySpec(
    "q190_kcore_peel",
    (s, d) =>
      GraphOps.kCorePeel(copurchaseEdges(s, d), "a", "b", k = 80, rounds = 4)
        .select(col("v").as("part_key"), col("deg").as("core_deg"))
        .orderBy("part_key"),
    Some {
      val rounds = (1 to 4).map { r =>
        val prev = if (r == 1) "e0" else s"e${r - 1}"
        s"d$r AS MATERIALIZED (SELECT v, count(*) AS dg FROM " +
          s"(SELECT a AS v FROM $prev UNION ALL SELECT b FROM $prev) GROUP BY 1), " +
          s"k$r AS MATERIALIZED (SELECT v FROM d$r WHERE dg >= 80), " +
          s"e$r AS MATERIALIZED (SELECT a, b FROM $prev " +
          s"WHERE a IN (SELECT v FROM k$r) AND b IN (SELECT v FROM k$r))"
      }.mkString(", ")
      s"WITH $edgesCteSql, e0 AS MATERIALIZED (SELECT a, b FROM edges), $rounds " +
        "SELECT v AS part_key, CAST(count(*) AS BIGINT) AS core_deg FROM " +
        "(SELECT a AS v FROM e4 UNION ALL SELECT b FROM e4) " +
        "GROUP BY 1 ORDER BY part_key"
    },
  )

  val all: Seq[QuerySpec] = Seq(q121, q122, q139, q150, q180, q190, q256)
}
