package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Pin.PinOps

/** Whole-graph analytics over edge-list frames — triangle counting and
  * fixed-point PageRank — completing the DataFrame-native graph
  * surface [[Components]] starts. Same contract: the graph IS an edge
  * frame (undirected; direction of input rows is irrelevant), vertices
  * are edge endpoints, everything stays distributed.
  */
object GraphOps {

  /** Canonicalize to (a < b, distinct, no self-loops). */
  private def canon(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
      .where(col("s") =!= col("t"))
      .select(least(col("s"), col("t")).as("a"), greatest(col("s"), col("t")).as("b"))
      .distinct()

  /** Per-JVM scratch root for bucketed adjacency tables — same
    * lifecycle contract as the interop round-trip root: writers run in
    * overwrite mode against stable names, the directory dies with the
    * JVM. Driver-local default, correct for local masters; a cluster
    * deployment points this at shared storage (where the adjacency
    * write happens once at ingestion, not per job).
    */
  private lazy val adjScratch: String = {
    val d = Files.createTempDirectory("graft_graph_adj")
    sys.addShutdownHook(org.apache.commons.io.FileUtils.deleteDirectory(d.toFile))
    d.toString
  }

  /** Materialize the symmetrized adjacency as a BUCKETED, bucket-sorted
    * table on the vertex key — the layout every round of an iterative
    * graph loop then joins/aggregates against with ZERO exchange and
    * zero sort on the edge side (the q179 co-location machinery applied
    * to iteration). This replaces the round-1..5 `repartition.persist`
    * idiom: an InMemoryRelation also keeps its partitioning, but it
    * keeps it in EXECUTOR MEMORY — at 100 TB the adjacency does not fit
    * in storage memory, and a spilled/evicted cache silently recomputes
    * the symmetrize-shuffle per round. A bucketed table is the
    * disk-native form of the same layout: columnar, pruned reads, the
    * partitioning+ordering recorded in the catalog, amortized across
    * every round (and, at ingestion time, every JOB).
    *
    * One file per bucket: the writer repartitions by the bucket
    * expression first, so bucket-side sort order is preserved at scan
    * time (multi-file buckets forfeit the sorted-scan contract).
    */
  private def bucketedSym(e: DataFrame, tag: String): DataFrame = {
    val spark = e.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val name = s"graft_adj_$tag"
    e.union(e.select(col("b").as("a"), col("a").as("b")))
      .repartition(n, col("a"))
      .write.mode("overwrite")
      .bucketBy(n, "a").sortBy("a")
      .option("path", s"$adjScratch/$tag")
      .saveAsTable(name)
    spark.table(name)
  }

  /** Session conf flag: "true" → iterative loops land their
    * symmetrized adjacency as a persistent BUCKETED table
    * ([[bucketedSym]] — the ingestion-time layout a production
    * deployment amortizes across jobs); anything else → the same
    * layout held as a PINNED in-session frame ([[pinnedSym]]).
    */
  val BucketedAdjacencyFlag = "spark.graft.bucketedAdjacency"

  /** The [[bucketedSym]] layout without the table landing: symmetrize,
    * hash-partition and sort on the vertex key, then pin
    * ([[Pin]]: localCheckpoint, or reliable checkpoint under
    * [[Pin.Flag]]). `Dataset.checkpoint` PRESERVES the physical plan's
    * outputPartitioning and outputOrdering in the resulting LogicalRDD,
    * so every round's join/aggregate on `a` still plans with ZERO
    * exchange and zero sort on the adjacency side — identical
    * round-shape to the bucketed table, minus the parquet encode,
    * file commit, catalog round-trip and per-round columnar re-scan
    * (measured r10: the landing owned ~2–4 s of each graph query at
    * bench scale). Unlike a `persist` (the layout idiom this family
    * rejected in r8), checkpoint blocks are the frame's SOURCE, not a
    * cache: under memory pressure they spill to disk rather than
    * silently evict-and-recompute the symmetrize shuffle per round.
    * The durability trade is [[Pin]]'s documented contract (executor
    * loss kills the loop; flip [[Pin.Flag]] for reliable checkpoints);
    * deployments that want the adjacency as a persistent artifact
    * flip [[BucketedAdjacencyFlag]] and get the r9 table landing
    * unchanged.
    */
  private def pinnedSym(e: DataFrame): DataFrame =
    Pin.pinPartitioned(
      e.union(e.select(col("b").as("a"), col("a").as("b"))),
      parts = Seq(col("a")), sortBy = Seq(col("a")))

  /** The adjacency layout every iterative round joins against:
    * bucketed table or pinned frame by [[BucketedAdjacencyFlag]] —
    * same partitioning+ordering contract either way.
    */
  private def symLayout(e: DataFrame, tag: String): DataFrame =
    if (e.sparkSession.conf.getOption(BucketedAdjacencyFlag)
      .exists(_.equalsIgnoreCase("true"))) bucketedSym(e, tag)
    else pinnedSym(e)

  /** Per-vertex triangle counts by degree-ordered orientation (the
    * node-iterator++ / compact-forward algorithm): orient every edge
    * from its lower-(degree, id) endpoint, enumerate wedges only
    * between oriented out-neighbors, close them against the canonical
    * edge set — each triangle found exactly once, at its
    * lowest-degree corner.
    *
    * Orientation is what makes this survive skew: out-degree under
    * (deg, id) order is O(√m) even for a hub adjacent to every other
    * vertex, so the wedge table is Σ d⁺(v)² = O(m^1.5) worst case
    * instead of the un-oriented hub-quadratic Σ d(v)². All steps are
    * equijoins/groupBys on vertex/edge keys; the closing join probes
    * with candidates, never materializing non-edges.
    *
    * @return (v, n_tri) for every edge endpoint (0 for triangle-free
    *         vertices).
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // edges re-enter the plan three times (degrees, orientation,
    // closing probe): materialize once, the Components edge rule.
    // deg and the oriented edge frame are ALSO multiply referenced
    // (deg ×3, or ×2 via the wedge self-join), and self-join alias
    // dedup breaks exchange-reuse canonicalization — without their own
    // checkpoints each reference recomputes a full-edge aggregation.
    val e = canon(edges, srcCol, dstCol).pinLineage(eager = true)
    val deg = e.select(col("a").as("v"))
      .union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
      .pinLineage(eager = true) // |V| rows
    val lower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val or = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(lower, col("a")).otherwise(col("b")).as("u"),
        when(lower, col("b")).otherwise(col("a")).as("w"))
      .pinLineage(eager = true) // |E| rows, read twice by the wedge self-join
    val wedges = or.as("e1")
      .join(or.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.w") < col("e2.w"))
      .select(col("e1.u").as("c0"), col("e1.w").as("c1"), col("e2.w").as("c2"))
    // wedge legs are id-ordered (c1 < c2), so the closing edge is
    // already canonical — one equijoin against e
    val tris = wedges.join(e, col("c1") === col("a") && col("c2") === col("b"))
      .select("c0", "c1", "c2")
    val perNode = tris
      .select(explode(array(col("c0"), col("c1"), col("c2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.select("v")
      .join(perNode, Seq("v"), "left_outer")
      .select(col("v"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** HUB-CAPPED local clustering coefficient (r9 — q180's bounded-work
    * form): the top ⌈|V|/hubFrac⌉ vertices by (degree desc, v) — the
    * q63 heavy-hitter trigger applied to degrees, rank-based so it
    * fires on ANY degree distribution — are EXCLUDED-AND-REPORTED
    * (is_hub = true, cc_bp = −1, never sampled: exclusion is
    * deterministic, which keeps the WHOLE operator oracle-checkable
    * where per-hub wedge sampling would not be); every other vertex
    * gets its exact coefficient over the hub-PRUNED subgraph — the
    * standard drop-super-hubs-first practice for wedge counting, with
    * the pruned degree reported alongside the full one so downstream
    * sees exactly what was computed.
    *
    * Work bound: every pruned degree is ≤ the lowest hub degree BY
    * CONSTRUCTION (anything heavier ranks into the hub set), so the
    * oriented wedge table is bounded by m·d_cap instead of q180's
    * m^1.5-with-a-dense-tail — the 256× replica's 95× blowup was
    * exactly the wedge mass at the densest vertices.
    *
    * Scale: degrees are one edge aggregate; the hub rank rides
    * [[Ranks.withGlobalRank]] (range-partitioned two-level rank, no
    * single-task sort); the vertex count re-enters as a 1-row
    * broadcast; pruning is two anti-joins against the (|V|/hubFrac)-row
    * hub list; triangles ride [[triangleCounts]]' orientation on the
    * pruned edges.
    */
  def hubCappedClusteringCoeff(
      edges: DataFrame, srcCol: String, dstCol: String, hubFrac: Int = 100): DataFrame = {
    require(hubFrac >= 2, "hubFrac < 2 would exclude half the graph or more")
    // read by degrees AND both pruning anti-joins
    val e = canon(edges, srcCol, dstCol).pinLineage(eager = true)
    val deg = e.select(col("a").as("v"))
      .union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
      .pinLineage(eager = true)
    val tot = deg.agg(count(lit(1)).as("__n"))
    val hubs = Ranks
      .withGlobalRank(deg, Seq(col("degree").desc, col("v").asc), "__rk")
      .join(broadcast(tot))
      .where(col("__rk") <= expr(s"(__n + ${hubFrac - 1}) div $hubFrac"))
      .select(col("v").as("__hub"))
    val ep = e
      .join(hubs, col("a") === col("__hub"), "left_anti")
      .join(hubs, col("b") === col("__hub"), "left_anti")
    val degP = ep.select(col("a").as("v"))
      .union(ep.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("pruned_degree"))
    deg
      .join(hubs.select(col("__hub").as("v"), lit(true).as("__is_hub")), Seq("v"), "left_outer")
      .join(degP, Seq("v"), "left_outer")
      .join(triangleCounts(ep, "a", "b"), Seq("v"), "left_outer")
      .select(
        col("v"),
        col("degree"),
        coalesce(col("__is_hub"), lit(false)).as("is_hub"),
        coalesce(col("pruned_degree"), lit(0L)).as("pruned_degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(coalesce(col("__is_hub"), lit(false)), lit(-1L))
          .when(coalesce(col("pruned_degree"), lit(0L)) >= 2,
            expr("(20000 * coalesce(n_tri, 0)) div (pruned_degree * (pruned_degree - 1))"))
          .otherwise(lit(0L)).as("cc_bp"))
  }

  /** PageRank in exact fixed-point arithmetic: `iters` damped
    * (d = 0.85) iterations over the symmetrized edge set, rank mass
    * carried as integers at scale `S`. Every step is integer-exact —
    * contribution = pr div deg, damping = (85·Σ) div 100 — so the
    * result is bit-identical on any engine and any row order: the
    * float-PageRank reproducibility problem (parallel sum order
    * changes ranks) is defined away. Fixed iteration count keeps the
    * operator a pure dataflow (one declarative plan, no convergence
    * probe); [[Components]] owns the data-dependent-iteration
    * pattern.
    *
    * Each iteration is one edge⋈rank equijoin + one map-side-combined
    * groupBy — shuffle ∝ edges, the minimum a message-passing round
    * costs. Mass is conserved up to floor loss (values ≤ N·S): the
    * Σ·85 step accumulates in DECIMAL(38,0), so BIGINT safety holds
    * past 10⁸ vertices at the default S = 10⁹; lower S as N
    * approaches 10⁹ (resolution knob, not a correctness one).
    *
    * @return (v, pr) over edge endpoints; pr ≈ S × classic PageRank
    *         with uniform init.
    */
  def pageRankFixed(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      scale: Long = 1000000000L,
  ): DataFrame = {
    // The symmetrized edge list is the streamed side of one join PER
    // ITERATION, always on the same key: land it ONCE as a bucketed,
    // bucket-sorted table ([[bucketedSym]]) so every iteration's
    // sort-merge join reads the layout exchange-free and sort-free,
    // and the per-iteration shuffle carries ranks (|V| rows), never
    // edges.
    val sym = symLayout(canon(edges, srcCol, dstCol), "pr")
    // deg: |V| rows, referenced every iteration — freeze it once (the
    // groupBy rides the bucketing, so this costs no exchange)
    val deg = sym.groupBy(col("a").as("v")).agg(count(lit(1)).as("deg"))
      .pinLineage(eager = true)
    var pr = deg.select(col("v"), lit(scale).as("pr"), col("deg"))
    for (_ <- 1 to iters) {
      val contrib = sym.as("s")
        .join(pr.as("p"), col("s.a") === col("p.v"))
        .select(col("s.b").as("v"), expr("pr div deg").as("c"))
        .groupBy("v")
        .agg(sum(col("c").cast(DecimalType(38, 0))).as("cs"))
      pr = deg.as("g")
        .join(contrib.as("t"), col("g.v") === col("t.v"))
        .select(col("g.v").as("v"),
          (lit(scale * 15 / 100) + expr("(85 * cs) div 100")).as("pr"),
          col("g.deg").as("deg"))
    }
    pr.select(col("v"), col("pr").cast("long").as("pr"))
  }

  /** Multi-source BFS hop distance: for every vertex reachable from
    * `seeds` within `maxHops`, the minimum number of edges to the
    * nearest seed. Level-synchronous expansion — round k's frontier is
    * exactly the vertices first reached at distance k, so a vertex's
    * first discovery IS its minimum distance (uniform edge weights)
    * and no relaxation/min-merge pass is ever needed.
    *
    * Loop hygiene (the q122 frame-reuse lesson): each round's frontier
    * is checkpointed EAGERLY — it is read twice (emptiness probe +
    * next round's expansion join) and the probe rides the
    * materialization; the accumulated distance frame checkpoints
    * LAZILY (the q120 rule — it is only read next round, so its pin
    * materializes as part of that round's single job). Per round the
    * shuffle carries one frontier expansion (≤ |E| rows) and the
    * anti-join against distances — never the whole graph re-derived.
    *
    * Termination is the empty frontier — a limit-1 probe on the
    * already-materialized checkpoint, not a count. `maxHops` bounds
    * adversarial diameters (a path graph degenerates to one round per
    * vertex; for such graphs run [[Components.connectedComponentsStar]]
    * -style doubling instead).
    *
    * @return (v, d) — reached vertices only; seeds outside the edge
    *         set are dropped (the vertex-universe rule).
    */
  def bfsHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int = 20,
  ): DataFrame = {
    val sym = symLayout(canon(edges, srcCol, dstCol), "bfs")
    var frontier = seeds.select(col(seedCol).as("v")).distinct()
      .join(sym.select(col("a").as("v")), Seq("v"), "left_semi")
      .pinLineage(eager = true)
    var dist = frontier.withColumn("d", lit(0L))
    var k = 0
    var done = frontier.isEmpty
    while (!done && k < maxHops) {
      k += 1
      val next = sym
        .join(frontier.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .select(col("b").as("v")).distinct()
        .join(dist, Seq("v"), "left_anti")
        .pinLineage(eager = true) // probed + expanded next round
      // For k ≥ 2 the eager action above ALSO materialized the lazy
      // dist(k−1) pin (it reads dist), so the superseded frontier —
      // from then on referenced only by plans backed by their own
      // blocks — can release its blocks. NOT at k = 1: dist(0) is a
      // plain projection that keeps reading the seed frontier's RDD
      // until dist(1) materializes.
      if (k >= 2) frontier.unpin()
      if (next.isEmpty) done = true
      else {
        dist = dist.union(next.withColumn("d", lit(k.toLong)))
          .pinLineage(eager = false) // pinned by next round's job
        frontier = next
      }
    }
    dist
  }

  /** Deterministic synchronous label propagation (fixed `rounds`):
    * every vertex starts as its own label; each round it adopts the
    * label most frequent among its NEIGHBORS, ties to the smallest
    * label. Detects density communities — a different axis from
    * [[Components]]' connectivity (one component can hold many
    * communities) and from PageRank's centrality.
    *
    * Determinism is the whole design: textbook LPA is notoriously
    * run-order-dependent (async updates, random tie-breaks). Here
    * updates are synchronous (round k reads ONLY round k−1's labels),
    * the tie-break is a total order (count desc, label asc — a
    * struct-argmax aggregate, no window), and the round count is
    * fixed — so the labeling is a pure function of the graph and an
    * integer-exact oracle can pin all N assignments. Fixed rounds also
    * keep the operator one declarative plan (the q122 rule);
    * oscillation on bipartite-ish structures is cut off by the round
    * budget rather than chased to a fixpoint.
    *
    * Scale: the symmetrized adjacency persists pre-partitioned and
    * pre-sorted on the join key (the [[pageRankFixed]] layout-reuse
    * idiom), so each round costs one edge⋈label join whose streamed
    * side reuses the cached layout plus two map-side-combined
    * aggregates; the per-round shuffle carries (v, label) pairs
    * bounded by |E|, never the graph re-derived.
    *
    * @return (v, lbl) over edge endpoints after `rounds` rounds.
    */

  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int = 3,
  ): DataFrame = {
    val sym = symLayout(canon(edges, srcCol, dstCol), "lpa")
    var labels = sym.select(col("a").as("v")).distinct().withColumn("lbl", col("v"))
    for (_ <- 1 to rounds) {
      // join on `a` (rides the bucketing — the labels side, |V| rows,
      // is the only exchange), collect toward `b`: by symmetry of sym
      // this delivers exactly each vertex's multiset of neighbor
      // labels, same as joining on b and grouping by a.
      labels = sym.as("s")
        .join(labels.as("p"), col("s.a") === col("p.v"))
        .groupBy(col("s.b").as("v"), col("p.lbl").as("nl"))
        .agg(count(lit(1)).as("c"))
        .groupBy("v")
        .agg(max(struct(col("c"), (-col("nl")).as("neg"))).as("m"))
        .select(col("v"), (-col("m.neg")).as("lbl"))
    }
    labels
  }

  /** Bounded k-core peel: `rounds` synchronous rounds of dropping every
    * vertex with degree < `k` (and the edges touching it), then the
    * per-vertex degree inside the surviving subgraph. The k-core is the
    * classic graph-quality filter (Seidman 1983): link-graph corpus
    * curation keeps pages that survive the peel, fraud/bot analysis
    * looks at what a deep core retains.
    *
    * Bounded rounds are the oracle-checkable statistic (the q122
    * fixed-iteration rule): both engines run exactly `rounds`
    * synchronous peels, so every surviving (vertex, degree) pair is a
    * pure function of the graph. Once a round drops nothing the peel
    * is at ITS fixpoint — the true k-core — and remaining rounds are
    * no-ops; the loop detects that with a 1-row probe on the
    * materialized degree frame and exits early (identical result,
    * fewer jobs). Production use runs rounds = a diameter rail (each
    * round only cascades one deletion "layer", so depth needed =
    * longest deletion chain, small for real heavy-tailed graphs).
    *
    * Scale (r11 — DELTA-FRONTIER form, guide §2.4/§5): the symmetrized
    * adjacency lands ONCE ([[symLayout]]) and is NEVER filtered or
    * re-derived; the full degree aggregate runs ONCE (it rides the
    * layout — a directed row (a,b) exists per endpoint, so count-by-a
    * IS the degree). Each round then maintains the surviving degrees
    * by SUBTRACTION: only the edges incident to the round's PEEL
    * LAYER (the vertices that just fell below k) are aggregated — one
    * broadcast semi-join probe of the pinned adjacency feeding a
    * near-empty count, joined co-partitioned against the |V'|-row
    * degree frame (both sides carry the adjacency's captured
    * HashPartitioning, so the round still shuffles NOTHING). The old
    * form recounted every vertex's degree from the filtered adjacency
    * every round — r× full-graph aggregates through a filter stack
    * that grew two anti-joins per round; the delta form does one
    * full-graph aggregate total, and per-round work proportional to
    * the layer's edge neighborhood. A pathological first round (most
    * of the graph below k) exceeds the broadcast rail and falls back
    * to a shuffled semi-join for that round only. [[peelRound]] holds
    * the delta-equivalence argument; GraphOpsSpec pins delta ≡
    * recount on random graphs.
    *
    * @return (v, deg) for vertices surviving `rounds` peels, with
    *         degree counted inside the surviving subgraph.
    */
  def kCorePeel(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int,
      broadcastRailRows: Long = 4000000L,
  ): DataFrame = {
    val adj = symLayout(canon(edges, srcCol, dstCol), "kcore")
    // the one full recount; lazy pin — the round's probe materializes it
    var deg = Pin.pinAligned(
      adj.groupBy(col("a").as("v")).agg(count(lit(1)).as("dg")), eager = false)
    var prevDeg: Option[DataFrame] = None
    var stable = false
    for (_ <- 1 to rounds if !stable) {
      val dead = deg.where(col("dg") < k).select("v")
      // ONE job per round: materializes this round's lazy degree
      // checkpoint and reads the layer size off it
      val nDead = dead.count()
      // deg is now backed by its own blocks — release round t−1's
      prevDeg.foreach(Pin.unpin)
      prevDeg = None
      if (nDead == 0L) stable = true
      else {
        val layer =
          if (nDead <= broadcastRailRows) broadcast(dead) else dead
        prevDeg = Some(deg)
        deg = Pin.pinAligned(peelRound(adj, deg, layer, k), eager = false)
      }
    }
    deg.select(col("v"), col("dg").as("deg"))
  }

  /** One peel round's DELTA degree update: survivors (dg ≥ k) keep
    * dg − (edges lost to the layer); vertices whose degree hits 0
    * leave the frame (they have no surviving edge — exactly the
    * vertices a recount of the filtered adjacency would no longer
    * see, so frame membership stays recount-identical round by
    * round).
    *
    * Equivalence to the recount (why probing the ORIGINAL adjacency
    * is exact): an edge (v, u) with u in this round's layer is
    * guaranteed still present in the surviving subgraph — u was alive
    * until this round, so no earlier layer removed the edge from u's
    * side, and while v survives nothing removed it from v's side.
    * Rows whose v is itself dead (layer–layer edges, dead–layer
    * edges) drop out at the join: the survivor frame is the LEFT side
    * of a left-outer. So per survivor, `lost` counts exactly the
    * edges the recount would stop seeing this round.
    */
  private[ops] def peelRound(
      adj: DataFrame, deg: DataFrame, layer: DataFrame, k: Int): DataFrame = {
    val losses = adj
      .join(layer.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
      .groupBy(col("a").as("v")).agg(count(lit(1)).as("lost"))
    deg.where(col("dg") >= k)
      .join(losses, Seq("v"), "left_outer")
      .select(col("v"), (col("dg") - coalesce(col("lost"), lit(0L))).as("dg"))
      .where(col("dg") >= 1L)
  }
}
