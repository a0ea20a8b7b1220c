package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.Pin.PinOps

/** Similarity search over embedding columns, in three scale tiers:
  *
  *  1. [[bruteForceTopK]] — exact cosine against a handful of anchors
  *     (broadcast the anchors, one scan, per-partition heap). The
  *     baseline and the correctness oracle for the approximate tiers.
  *  2. [[annTopK]] / [[annNearDupPairs]] — IVF with a data-scaled
  *     sign-LSH coarse quantizer ([[cellBits]]/[[withCells]]): cells
  *     grow with the corpus so per-cell work stays flat, and
  *     hamming-≤1 multiprobe recovers cross-cell recall (the nprobe
  *     analog). [[ivfTopK]] / [[ivfNearDupPairs]] are the
  *     bring-your-own-quantizer forms for corpora that already carry a
  *     cluster assignment column.
  *  3. [[VectorFunctions.signBucket]] LSH — for high-similarity
  *     near-dup (cosine ≳ 0.9) where random-hyperplane collision
  *     probability is useful; exercised in VectorFunctionsSpec.
  *
  * At 100 TB the same three tiers hold: anchors/centroids broadcast,
  * candidate generation is an equijoin on (cell) or (bucket) — uniform
  * shuffle keys, no N² anywhere — and exact cosine runs only on the
  * candidate set.
  */
object SimilarityPipeline {

  /** Exact top-k neighbors for each vector in `queries` (small,
    * broadcast) over `corpus`. Output: (query_id, vec_id, score),
    * k rows per query.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        VectorFunctions.cosine(col("embedding"), col("q_emb")).as("score"),
      )
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** IVF top-k: like [[bruteForceTopK]] but only same-cell candidates
    * are scored. `cellCol` is the coarse-quantizer assignment.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, cellCol: String = "label"): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"), col(cellCol).as("q_cell"))
    val scored = corpus
      .join(broadcast(q), col(cellCol) === col("q_cell") && col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        VectorFunctions.cosine(col("embedding"), col("q_emb")).as("score"),
      )
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** IVF-bucketed near-duplicate pairs: same-cell pairs with exact
    * cosine ≥ `threshold`, computed by the native codegen'd
    * [[graft.expressions.FloatVecCosine]] — one fused loop per
    * candidate pair, no N² cross product (the cell equijoin bounds the
    * pair count), no per-element row blowup.
    */
  def ivfNearDupPairs(corpus: DataFrame, threshold: Double, cellCol: String = "label"): DataFrame = {
    val e = corpus.select(col("vec_id"), col(cellCol).as("cell"), col("embedding"))
    e.as("a")
      .join(e.as("b"), col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"),
        col("b.vec_id").as("vb"),
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("cos"),
      )
      .where(col("cos") >= threshold)
  }

  // ------------------------------------------------------------------
  // Data-scaled coarse quantizer (the real IVF path; the cellCol
  // variants above remain for corpora that already carry a clustering).
  //
  // Cells are sign-LSH buckets of `bits` seeded random hyperplanes
  // (VectorFunctions.signBucket — deterministic, no fit pass, no
  // driver state). `cellBits` picks bits so the expected cell
  // occupancy stays ~`targetOccupancy` regardless of corpus size:
  // cells ∝ N, so per-cell candidate-pair counts stay FLAT as the
  // corpus grows — the property that makes the join cost O(N·occ)
  // instead of quadratic-in-the-hottest-cell (the fixed-10-cell
  // version this replaces grew per-cell pairs quadratically).
  //
  // Recall across a cell boundary is recovered by hamming-≤1
  // multiprobe (standard IVF nprobe analog): queries probe their own
  // cell plus every 1-bit-flip neighbor; the pair join bands on each
  // bit-masked key. Cost multiplier is (bits+1), still linear in N.
  // ------------------------------------------------------------------

  /** Hyperplane count for ~`targetOccupancy` vectors per cell
    * (cells = 2^bits ≈ n / targetOccupancy, clamped to [1, 16] bits).
    *
    * INTEGER-ONLY derivation (r9, ADVICE fix): round(log₂(n/occ)) = the
    * largest k with n/occ ≥ 2^(k−1/2), i.e. n² ≥ occ²·2^(2k−1) — an
    * exact integer comparison, so the DuckDB oracles reproduce the bit
    * count with the SAME integer test instead of a float log whose
    * last-ulp behavior near half-integer boundaries could differ
    * between engines and desynchronize the whole q37/q38/q217 cascade.
    * (Half-up rounding at the boundary c = 2^(k+1/2) picks k+1 — the
    * ≥ in the integer test — matching Scala `.round` and DuckDB
    * `round` on positive values.)
    */
  def cellBits(n: Long, targetOccupancy: Int = 64): Int = {
    val n2 = BigInt(n) * BigInt(n)
    val occ2 = BigInt(targetOccupancy) * BigInt(targetOccupancy)
    (1 to 16).reverse.find(k => n2 >= occ2 * (BigInt(1) << (2 * k - 1))).getOrElse(1)
  }

  /** Adds the quantizer assignment as a `cell` column. */
  def withCells(corpus: DataFrame, bits: Int, dim: Int = 64, seed: Long = 42L): DataFrame =
    corpus.withColumn("cell", VectorFunctions.signBucket(col("embedding"), dim, bits, seed))

  /** ANN top-k with the sign-LSH quantizer and hamming-≤1 multiprobe:
    * each (broadcast) query scores candidates from bits+1 cells; exact
    * cosine ranks them. One scan of the corpus, no N² anywhere.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int, dim: Int = 64): DataFrame = {
    val c = withCells(corpus, bits, dim)
    val probes = array(
      col("cell") +: (0 until bits).map(b => col("cell").bitwiseXOR(lit(1L << b))): _*)
    val q = withCells(queries, bits, dim)
      .select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(probes).as("probe"))
    val scored = c
      .join(broadcast(q), col("cell") === col("probe") && col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        VectorFunctions.cosine(col("embedding"), col("q_emb")).as("score"),
      )
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  // ------------------------------------------------------------------
  // Spherical k-means coarse quantizer — entirely DataFrame ops, no
  // driver-side math. Where sign-LSH cells are data-independent,
  // k-means cells ADAPT to the corpus (a natural cluster maps to its
  // own cell even when it straddles a hyperplane), at the cost of a
  // few extra passes at index-build time. Standard IVF practice:
  // build once, reuse for many queries.
  // ------------------------------------------------------------------

  /** `iters` Lloyd iterations with cosine assignment (spherical
    * k-means). Returns the final centroids as (cell, centroid) — one
    * row per cell, array<float> centroid.
    *
    * Every step is relational and executor-side:
    *  - init: k deterministic seeds (best-spread not attempted; the
    *    xxhash64 order is stable run-to-run, which matters more here —
    *    a retry must build the same index);
    *  - assign: corpus ⋈ broadcast(centroids), argmax cosine per
    *    vector via the native codegen'd [[VectorFunctions.cosine]];
    *  - update: posexplode the assigned embeddings → per-(cell, dim)
    *    mean → re-assemble arrays with `array_sort(collect_list)`.
    * Centroids are localCheckpoint'ed per iteration (k tiny rows) so
    * the lineage does not stack across iterations.
    */
  def kmeansCentroids(corpus: DataFrame, cells: Int, iters: Int = 3): DataFrame = {
    require(cells > 0 && iters >= 1)
    val emb = corpus.select(col("vec_id"), col("embedding"))
    // init needs no checkpoint: consumed exactly once (iteration 1's
    // assignment); every later iteration starts from a checkpointed
    // centroid table.
    var centroids = emb
      .withColumn("__h", xxhash64(col("vec_id")))
      .orderBy("__h")
      .limit(cells)
      .select(
        (row_number().over(Window.orderBy("__h")) - 1).as("cell"),
        col("embedding").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assignCells(emb, centroids)
      val updated = assigned
        .join(emb, "vec_id")
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(avg(col("v")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(
          col("cell"),
          transform(col("pm"), x => x.getField("m").cast("float")).as("centroid"))
      // a cell can lose all members; its centroid simply drops out
      // (fewer live cells — harmless, assignment is argmax over live)
      centroids = updated.pinLineage()
    }
    centroids
  }

  /** Argmax-cosine cell assignment of `emb` (vec_id, embedding) against
    * `centroids` (cell, centroid): one broadcast join + one
    * partial-aggregable max (map-side combined — cheaper than a window
    * sort, which cannot partial-aggregate). Deterministic tie-break on
    * lowest cell id via the negated-cell struct component.
    */
  def assignCells(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb
      .join(broadcast(centroids))
      .select(
        col("vec_id"),
        struct(
          VectorFunctions.cosine(col("embedding"), col("centroid")).as("cos"),
          (-col("cell")).as("negCell")).as("sc"))
      .groupBy("vec_id")
      .agg(max(col("sc")).as("best"))
      .select(col("vec_id"), (-col("best.negCell")).cast("int").as("cell"))

  /** IVF top-k under the k-means quantizer with nprobe > 1: each query
    * searches its `nprobe` nearest cells. Index build
    * ([[kmeansCentroids]]) is the expensive once-per-corpus step; the
    * query path is a broadcast of (query × probes) against the
    * cell-partitioned corpus — identical join shape to [[annTopK]].
    */
  def kmeansTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      cells: Int,
      iters: Int = 3,
      nprobe: Int = 2,
  ): DataFrame = {
    val centroids = kmeansCentroids(corpus, cells, iters)
    val c = corpus.join(assignCells(corpus.select(col("vec_id"), col("embedding")), centroids), "vec_id")
    val qScored = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .join(broadcast(centroids))
      .select(
        col("query_id"), col("q_emb"), col("cell"),
        VectorFunctions.cosine(col("q_emb"), col("centroid")).as("ccos"))
    val wq = Window.partitionBy("query_id").orderBy(desc("ccos"), asc("cell"))
    val probes = qScored
      .withColumn("__rn", row_number().over(wq))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cell"))
    val scored = c
      .join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"),
        VectorFunctions.cosine(col("embedding"), col("q_emb")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  // -------------------------------------------------------------------
  // FIXED-POINT spherical k-means (q42's r9 form): every decision the
  // pipeline makes — seeding, Lloyd assignment, centroid update and
  // normalization, probe choice, final ranking — is defined over exact
  // int64 arithmetic, so a DuckDB oracle replays the whole algorithm
  // verbatim and the output hash-matches cross-engine (the q29/q92
  // fix-point idiom extended to an ITERATIVE algorithm, the q122
  // pagerank precedent). The float kmeansCentroids/kmeansTopK above
  // stay as the documented production form (cheaper per step, no
  // integer-width preconditions); SimilarityPipelineSpec pins the two
  // forms' recall agreement.
  //
  // Integer-width argument (unit-norm inputs, scale S=1e7, centroid
  // scale CS=1e6, dim 64 — every bound N-INDEPENDENT except the raw
  // per-cell component sums, which hold to ~9e11 rows per cell):
  //  - quantized components |qᵢ| ≤ S, so round-0 dots ≤ 64·S² = 6.4e15;
  //  - truncated means |mᵢ| ≤ S, norms ‖m‖² ≤ 64·S² = 6.4e15 < 2⁵³
  //    (Exact.isqrt's domain), isqrt ≤ 8e7;
  //  - normalized centroids |ĉᵢ| = |mᵢ|·CS/⌊‖m‖⌋ ≈ CS, so per-round
  //    assignment dots ≤ 64·S·CS·(1+1/r) ≈ 6.4e14;
  //  - the final ranking is q29's key with its own documented bounds.
  // -------------------------------------------------------------------

  /** `iters` exact-integer Lloyd rounds over a pre-quantized corpus
    * `fp = (vec_id, q: array<long>)`. Seeds are the `cells` lowest
    * vec_ids' raw fp vectors (norm ≈ scale on unit-norm input, so
    * round-0 argmax-dot is argmax-cosine up to quantization — and the
    * DEFINITION is the integer dot, identical in both engines).
    * Per round: argmax-dot assignment (tie → lowest cell), truncated
    * integer mean (sign·(|Σq| div n)), then normalization to a
    * CS-scaled unit vector via [[graft.ops.Exact.isqrt]] — the count
    * and norm cancel out of cosine, so this IS spherical k-means, just
    * with the normalization pinned to exact integers. Empty cells drop
    * out (assignment is argmax over live centroids, both engines).
    */
  def kmeansCentroidsFp(
      fp: DataFrame, cells: Int, iters: Int, centScale: Long = 1000000L): DataFrame = {
    require(cells > 0 && iters >= 1)
    var cents = fp
      .orderBy("vec_id")
      .limit(cells)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int").as("cell"),
        col("q").as("cent"))
    for (_ <- 1 to iters) {
      val means = assignCellsFp(fp, cents)
        .join(fp, "vec_id")
        .select(col("cell"), posexplode(col("q")).as(Seq("i", "v")))
        .groupBy("cell", "i")
        .agg(sum("v").as("s"), count(lit(1)).as("nc"))
        // truncated integer mean via abs/negate so Spark `div` (trunc)
        // and DuckDB `//` agree regardless of their negative-operand
        // conventions — both see non-negative operands only
        .select(col("cell"), col("i"),
          when(col("s") < 0, -expr("(-s) div nc")).otherwise(expr("s div nc")).as("m"))
      val norms = means
        .groupBy("cell")
        .agg(sum(col("m") * col("m")).as("n2"))
        .select(col("cell"), graft.ops.Exact.isqrt(col("n2")).as("r"))
      val updated = means
        .join(norms, "cell")
        .select(col("cell"), col("i"),
          when(col("r") === 0, col("m"))
            .otherwise(
              when(col("m") < 0, -expr(s"((-m) * $centScale) div r"))
                .otherwise(expr(s"(m * $centScale) div r"))).as("c"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("i"), col("c")))).as("ic"))
        .select(col("cell"), transform(col("ic"), x => x.getField("c")).as("cent"))
      val next = updated.pinLineage() // eager: reads (and retires) the old cents
      graft.ops.Pin.unpin(cents)
      cents = next
    }
    cents
  }

  /** Argmax-integer-dot assignment of `fp = (vec_id, q)` against
    * `cents = (cell, cent)` — [[assignCells]]'s shape (broadcast join +
    * partial-aggregable max over a (dot, −cell) struct, tie → lowest
    * cell) with the float cosine replaced by [[VectorFunctions.dotLong]].
    */
  def assignCellsFp(fp: DataFrame, cents: DataFrame): DataFrame =
    fp.join(broadcast(cents))
      .select(
        col("vec_id"),
        struct(
          VectorFunctions.dotLong(col("q"), col("cent")).as("dot"),
          (-col("cell")).as("negCell")).as("sc"))
      .groupBy("vec_id")
      .agg(max(col("sc")).as("best"))
      .select(col("vec_id"), (-col("best.negCell")).cast("int").as("cell"))

  /** IVF top-k under the fixed-point k-means quantizer: the
    * hash-matchable form of [[kmeansTopK]]. Same plan shape — index
    * build is the once-per-corpus cost, queries probe their `nprobe`
    * best cells (integer dot, tie → lowest cell), candidates ranked by
    * q29's exact integer key (query norm constant per group, candidate
    * norm divided out, sign-carried quotient at 1e-18 resolution).
    * Output (query_id, vec_id, rank_fp) is all int64.
    */
  def kmeansTopKFp(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      cells: Int,
      iters: Int = 2,
      nprobe: Int = 2,
      scale: Long = 10000000L,
  ): DataFrame = {
    // the quantized corpus is read by every Lloyd round, the final
    // assignment AND the ranking join — pin it once (at production
    // scale this frame is the persisted fp ledger)
    val fp = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"))
      .pinLineage()
    val cents = kmeansCentroidsFp(fp, cells, iters)
    val assigned = fp.join(assignCellsFp(fp, cents), "vec_id")
    val qfp = queries.select(
      col("vec_id").as("query_id"),
      VectorFunctions.quantizeFp(col("embedding"), scale).as("qq"))
    val wq = Window.partitionBy("query_id").orderBy(desc("cdot"), asc("cell"))
    val probes = qfp
      .join(broadcast(cents))
      .select(col("query_id"), col("qq"), col("cell"),
        VectorFunctions.dotLong(col("qq"), col("cent")).as("cdot"))
      .withColumn("__rn", row_number().over(wq))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("qq"), col("cell"))
    val w = Window.partitionBy("query_id").orderBy(desc("rank_fp"), asc("vec_id"))
    assigned
      .join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        VectorFunctions.dotLong(col("q"), col("qq")).as("dot_fp"),
        VectorFunctions.dotLong(col("q"), col("q")).as("n_fp"))
      .select(col("query_id"), col("vec_id"),
        (when(col("dot_fp") < 0, lit(-1L)).otherwise(lit(1L)) *
          VectorFunctions.rankFp(col("dot_fp"), col("n_fp"))).as("rank_fp"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select("query_id", "vec_id", "rank_fp")
  }

  /** SEMANTIC dedup under the fixed-point k-means quantizer (q259) —
    * the SemDeDup recipe (Abbas et al. 2023, public): cluster the
    * corpus, compare pairs INSIDE a cluster only, and drop every
    * vector that has a lower-id cluster-mate at cosine ≥ tNum/tDen.
    * q25/q30's keep-first rule extended to the SEMANTIC axis: the
    * survivor set is {v : no u < v in v's cell with cos(u,v) ≥ τ},
    * and the emitted rows are the DROPS, each with its minimal
    * witness (`keeper` — which may itself be dropped through a chain,
    * exactly like q30's pair list; survivors = anti-join on vec_id).
    *
    * Work bound: clustering is the once-per-corpus kmeans cost
    * (n·cells integer dots per round, centroids broadcast); the pair
    * stage touches INTRA-CELL pairs only — with cells ≈ isqrt(n)/2
    * (q42's sizing) that is Σ|cell|²/2 ≈ n^1.5 in expectation, never
    * n². At 100 TB the published lever is cells ∝ n (constant cluster
    * size ⇒ LINEAR pair work) with the assignment itself going
    * through the IVF probe (kmeansTopKFp's shape) instead of the
    * dense broadcast — the decision rule below is unchanged by either
    * swap. Every decision (Lloyd rounds, assignment, the
    * cross-multiplied threshold d ≥ 0 ∧ d²·tDen² ≥ tNum²·nₐ·n_b, the
    * min-witness pick) is exact int64/DECIMAL(38,0), so the whole
    * operator hash-matches its DuckDB replay.
    */
  def semanticDedupFp(
      corpus: DataFrame, cells: Int, tNum: Int, tDen: Int,
      iters: Int = 2, scale: Long = 10000000L): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum < tDen, "threshold must be in (0,1)")
    val fp = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"))
      .pinLineage()
    val cents = kmeansCentroidsFp(fp, cells, iters)
    // pin: the n·cells assignment pass is the expensive post-cluster
    // step — both sides of the self-join read THIS frame, not two
    // recomputations of it
    val assigned = fp.join(assignCellsFp(fp, cents), "vec_id").pinLineage()
    // minimal witness per dropped vector — the per-vb frame is the
    // (tiny) dup-pair set, never the corpus
    semanticDupDrops(assigned, tNum, tDen)
  }

  /** SEMANTIC decontamination under the same fixed-point k-means
    * quantizer (q260): flag every NON-benchmark vector that has a
    * benchmark cluster-mate at cosine ≥ tNum/tDen — the embedding-axis
    * member of the decontamination family (q75/q117/q149/q188/q208
    * test n-gram overlap, which PARAPHRASED eval leakage defeats;
    * semantic similarity is how production pipelines catch it).
    * `isBench` marks the benchmark rows inside `corpus` (a predicate
    * over the corpus columns — at production scale, a membership
    * column the loader stamps).
    *
    * Same machinery, same bounds as [[semanticDedupFp]]: one
    * clustering over the UNION (train + bench share cells, which is
    * what makes cross-frame comparison intra-cell), pair work =
    * train×bench WITHIN a cell only, every decision exact int64 so
    * the DuckDB oracle replays the pipeline clustering included.
    * Output: one row per flagged training vector with its minimal
    * benchmark witness — the drop manifest a decontamination pass
    * ships.
    */
  def semanticDecontamFp(
      corpus: DataFrame, isBench: Column, cells: Int, tNum: Int, tDen: Int,
      iters: Int = 2, scale: Long = 10000000L): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum < tDen, "threshold must be in (0,1)")
    val fp = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"),
        isBench.as("is_bench"))
      .pinLineage()
    val cents = kmeansCentroidsFp(fp.select("vec_id", "q"), cells, iters)
    val assigned = fp
      .join(assignCellsFp(fp.select("vec_id", "q"), cents), "vec_id")
      .pinLineage()
    semanticDecontamHits(assigned, tNum, tDen)
  }

  // -------------------------------------------------------------------
  // The 100 TB SemDeDup shape (r10): cells ∝ n + IVF-probed
  // assignment. The flat q259/q260 forms size cells ≈ isqrt(n)/2 and
  // assign by the dense n·cells broadcast dot — n^1.5 pair work and
  // n^1.5 assignment work. The published lever (SemDeDup §scaling /
  // the FAISS IVF recipe): hold CLUSTER SIZE constant (cells = n/K ⇒
  // intra-cell pair work is Σ|cell|²/2 ≈ n·K/2, LINEAR), and route
  // assignment through a small fixed COARSE quantizer — each point
  // finds its best coarse cell (n·√cells dots), then argmaxes only
  // over the fine centroids OF THAT COARSE CELL (n·√cells expected) —
  // n·2√cells total instead of n·cells = n²/K. One coarse level is
  // implemented; the same construction nests (coarse-of-coarse) to
  // keep the multiplier bounded at any scale. The DECISION RULE —
  // intra-cell pairs, the cross-multiplied integer threshold, the
  // min-witness pick — is untouched by the swap, and every step stays
  // exact int64, so the scaled operators carry their own full DuckDB
  // replays (q261/q262).
  // -------------------------------------------------------------------

  /** Two-level IVF-probed fixed-point k-means: `cells` fine centroids
    * (seeded from the lowest vec_ids, `iters` Lloyd rounds), with
    * every assignment — in-round and final — probed through a FIXED
    * coarse quantizer of isqrt(cells) centroids (the lowest-vec_id
    * seeds, the same idiom). Per round: fine centroids pick their
    * coarse cell (cells·√cells dots, broadcast); each point picks its
    * best LIVE coarse cell (a coarse cell can lose all fine members —
    * ranking is restricted to live ones so every point stays
    * assigned), then argmaxes over that cell's fine centroids via a
    * gcell-keyed join — the blocked join IS the probe. All argmaxes
    * tie-break (dot DESC, cell ASC); means/normalization are
    * q42RoundCtes' exact integer forms. Returns (vec_id, cell).
    */
  def ivfAssignCellsFp(
      fp: DataFrame, cells: Int, iters: Int,
      centScale: Long = 1000000L): DataFrame =
    ivfIndexFp(fp, cells, iters, centScale)._1

  /** [[ivfAssignCellsFp]] with the index internals exposed for
    * consumers that SEARCH the index rather than only read the
    * assignment: returns (final assignment (vec_id, cell), final fine
    * centroids (cell, cent), coarse centroids (gcell, gcent)). The
    * assignment frame is byte-identical to `ivfAssignCellsFp`'s — the
    * public method delegates here.
    */
  private[llm] def ivfIndexFp(
      fp: DataFrame, cells: Int, iters: Int,
      centScale: Long = 1000000L): (DataFrame, DataFrame, DataFrame) = {
    require(cells > 0 && iters >= 1)
    val g = math.max(1L, graft.ops.Exact.isqrtLong(cells.toLong)).toInt
    val coarse = fp
      .orderBy("vec_id")
      .limit(g)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int").as("gcell"),
        col("q").as("gcent"))
      .pinLineage()
    var cents = fp
      .orderBy("vec_id")
      .limit(cells)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int").as("cell"),
        col("q").as("cent"))
      .pinLineage()
    // one probed assignment pass against the CURRENT fine centroids
    def assign(c: DataFrame): DataFrame = probedAssignFp(fp, c, coarse)
    for (_ <- 1 to iters) {
      val means = assign(cents)
        .join(fp, "vec_id")
        .select(col("cell"), posexplode(col("q")).as(Seq("i", "v")))
        .groupBy("cell", "i")
        .agg(sum("v").as("s"), count(lit(1)).as("nc"))
        .select(col("cell"), col("i"),
          when(col("s") < 0, -expr("(-s) div nc")).otherwise(expr("s div nc")).as("m"))
      val norms = means
        .groupBy("cell")
        .agg(sum(col("m") * col("m")).as("n2"))
        .select(col("cell"), graft.ops.Exact.isqrt(col("n2")).as("r"))
      val next = means
        .join(norms, "cell")
        .select(col("cell"), col("i"),
          when(col("r") === 0, col("m"))
            .otherwise(
              when(col("m") < 0, -expr(s"((-m) * $centScale) div r"))
                .otherwise(expr(s"(m * $centScale) div r"))).as("c"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("i"), col("c")))).as("ic"))
        .select(col("cell"), transform(col("ic"), x => x.getField("c")).as("cent"))
        .pinLineage() // eager: reads (and retires) the old cents
      graft.ops.Pin.unpin(cents)
      cents = next
    }
    (assign(cents), cents, coarse)
  }

  /** One probed assignment pass of `fp = (vec_id, q, …)` against fine
    * centroids `cents = (cell, cent)` through coarse quantizer
    * `coarse = (gcell, gcent)` — [[ivfIndexFp]]'s per-round assignment,
    * factored out so an ALREADY-BUILT (frozen) index can assign any
    * frame: fine centroids pick their coarse cell, points argmax over
    * the LIVE coarse cells, then only over their coarse cell's fine
    * members (the gcell-keyed blocked join — never the dense n·cells
    * dot). All argmaxes tie-break (dot DESC, cell ASC). Returns
    * (vec_id, cell).
    */
  private[llm] def probedAssignFp(
      fp: DataFrame, cents: DataFrame, coarse: DataFrame): DataFrame = {
    val fg = cents.join(broadcast(coarse))
      .select(col("cell"), col("cent"),
        struct(
          VectorFunctions.dotLong(col("cent"), col("gcent")).as("dot"),
          (-col("gcell")).as("ng")).as("sc"))
      .groupBy("cell", "cent")
      .agg(max(col("sc")).as("b"))
      .select(col("cell"), col("cent"), (-col("b.ng")).cast("int").as("gcell"))
    val live = fg.select("gcell").distinct()
    val pg = fp.join(broadcast(coarse.join(live, "gcell")))
      .select(col("vec_id"),
        struct(
          VectorFunctions.dotLong(col("q"), col("gcent")).as("dot"),
          (-col("gcell")).as("ng")).as("sc"))
      .groupBy("vec_id")
      .agg(max(col("sc")).as("b"))
      .select(col("vec_id"), (-col("b.ng")).cast("int").as("gcell"))
    // the probe: points meet ONLY their coarse cell's fine
    // centroids — a gcell-keyed join, never the dense n·cells dot
    fp.join(pg, "vec_id")
      .join(fg, "gcell")
      .select(col("vec_id"),
        struct(
          VectorFunctions.dotLong(col("q"), col("cent")).as("dot"),
          (-col("cell")).as("negCell")).as("sc"))
      .groupBy("vec_id")
      .agg(max(col("sc")).as("best"))
      .select(col("vec_id"), (-col("best.negCell")).cast("int").as("cell"))
  }

  /** q259's semantic dedup at the 100 TB shape: cells = max(2,
    * n div targetCell) (constant expected cluster size ⇒ LINEAR
    * intra-cell pair work) with [[ivfAssignCellsFp]] clustering. The
    * drop rule, threshold and min-witness pick are byte-identical to
    * [[semanticDedupFp]] — only the blocking geometry changes.
    * `knownRows` takes the parquet-footer count (CorpusStats) so
    * sizing costs no scan.
    */
  def semanticDedupFpScaled(
      corpus: DataFrame, tNum: Int, tDen: Int,
      targetCell: Int = 32, iters: Int = 2, scale: Long = 10000000L,
      knownRows: Option[Long] = None): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum < tDen, "threshold must be in (0,1)")
    require(targetCell > 1, "targetCell must exceed 1")
    val n = knownRows.getOrElse(corpus.count())
    val cells = math.max(2L, n / targetCell).toInt
    val fp = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"))
      .pinLineage()
    val assigned = fp.join(ivfAssignCellsFp(fp, cells, iters), "vec_id").pinLineage()
    semanticDupDrops(assigned, tNum, tDen)
  }

  /** q260's semantic decontamination at the same 100 TB shape: one
    * scaled clustering over the union, train×bench pairs within a
    * cell only — [[semanticDecontamFp]]'s rule under
    * [[ivfAssignCellsFp]]'s geometry.
    */
  def semanticDecontamFpScaled(
      corpus: DataFrame, isBench: Column, tNum: Int, tDen: Int,
      targetCell: Int = 32, iters: Int = 2, scale: Long = 10000000L,
      knownRows: Option[Long] = None): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum < tDen, "threshold must be in (0,1)")
    require(targetCell > 1, "targetCell must exceed 1")
    val n = knownRows.getOrElse(corpus.count())
    val cells = math.max(2L, n / targetCell).toInt
    val fp = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"),
        isBench.as("is_bench"))
      .pinLineage()
    val assigned = fp
      .join(ivfAssignCellsFp(fp.select("vec_id", "q"), cells, iters), "vec_id")
      .pinLineage()
    semanticDecontamHits(assigned, tNum, tDen)
  }

  /** INCREMENTAL semantic dedup at the scaled geometry (q265): the
    * batch-vs-base operating mode q88 gives the lexical cascade,
    * applied to the semantic axis. The clustering is built over the
    * BASE frame only — the frozen index a production corpus already
    * maintains — and sized on the BASE count (cells = max(2,
    * n_base div targetCell)); the FULL frame (base and incoming) is
    * then assigned through the frozen two-level probe
    * ([[probedAssignFp]] — 2·√cells dots per vector, the q264 query
    * path applied to ingest), and the pair stage compares INCOMING ×
    * BASE within a cell only: base×base never materializes (it was
    * deduped when it WAS incoming — q88's argument verbatim), and
    * incoming×incoming is the next batch's base×base. Output: one row
    * per flagged incoming vector with its minimal base witness — the
    * same drop-manifest shape as q260, because "is this new vector a
    * semantic dup of the corpus" and "is this training vector a
    * semantic dup of the benchmark" are the same cross-frame question
    * with the frames renamed. Every decision exact int64; the oracle
    * replays the base-only clustering, the frozen-probe assignment of
    * the full frame, and the hit rule.
    */
  def semanticDedupIncrementalFp(
      corpus: DataFrame, isIncoming: Column, tNum: Int, tDen: Int,
      targetCell: Int = 32, iters: Int = 2, scale: Long = 10000000L): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum < tDen, "threshold must be in (0,1)")
    require(targetCell > 1, "targetCell must exceed 1")
    val fp = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"),
        isIncoming.as("inc"))
      .pinLineage()
    val base = fp.where(!col("inc")).select("vec_id", "q")
    val cells = math.max(2L, base.count() / targetCell).toInt
    val (_, cents, coarse) = ivfIndexFp(base, cells, iters)
    val assigned = fp
      .join(probedAssignFp(fp.select("vec_id", "q"), cents, coarse), "vec_id")
      .pinLineage()
    // the cross-frame hit rule is q260's with the frames renamed:
    // "bench" = the base corpus, "train" = the incoming batch
    semanticDecontamHits(
      assigned.withColumn("is_bench", !col("inc")), tNum, tDen)
      .withColumnRenamed("bench_witness", "base_witness")
  }

  /** The SemDeDup drop rule over an assigned frame (vec_id, q, cell) —
    * factored so the flat (q259) and scaled (q261) geometries share
    * one decision path byte for byte.
    */
  private def semanticDupDrops(assigned: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val tn2 = tNum.toLong * tNum
    val td2 = tDen.toLong * tDen
    val dup = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"), col("a.cell").as("cell"),
        VectorFunctions.dotLong(col("a.q"), col("b.q")).as("dot_fp"),
        VectorFunctions.dotLong(col("a.q"), col("a.q")).as("na"),
        VectorFunctions.dotLong(col("b.q"), col("b.q")).as("nb"))
      // na/nb > 0 excludes zero quantized vectors: 0 ≥ 0 would pass
      // the cross-multiplied test vacuously and the cos2_bp div by
      // na·nb = 0 would throw under ANSI (r9-ADVICE); a zero vector
      // has no cosine to anything, so it can never be a dup
      .where(col("dot_fp") >= 0 && col("na") > 0 && col("nb") > 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), td2, col("na"), col("nb"), tn2) >= 0)
    val w = Window.partitionBy("vb").orderBy(asc("va"))
    dup
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(
        col("vb").as("vec_id"), col("va").as("keeper"), col("cell").cast("long").as("cell"),
        VectorFunctions.cos2Bp(col("dot_fp"), col("na"), col("nb")).as("cos2_bp"))
  }

  /** The decontamination hit rule over an assigned frame
    * (vec_id, q, cell, is_bench) — shared by q260 and q262.
    */
  private def semanticDecontamHits(assigned: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val train = assigned.where(!col("is_bench"))
      .select(col("vec_id").as("tv"), col("q").as("tq"), col("cell"))
    val bench = assigned.where(col("is_bench"))
      .select(col("vec_id").as("bv"), col("q").as("bq"), col("cell"))
    val tn2 = tNum.toLong * tNum
    val td2 = tDen.toLong * tDen
    val hits = train
      .join(bench, Seq("cell"))
      .select(
        col("tv"), col("bv"), col("cell"),
        VectorFunctions.dotLong(col("tq"), col("bq")).as("dot_fp"),
        VectorFunctions.dotLong(col("tq"), col("tq")).as("na"),
        VectorFunctions.dotLong(col("bq"), col("bq")).as("nb"))
      // na/nb > 0: see semanticDupDrops
      .where(col("dot_fp") >= 0 && col("na") > 0 && col("nb") > 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), td2, col("na"), col("nb"), tn2) >= 0)
    val w = Window.partitionBy("tv").orderBy(asc("bv"))
    hits
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(
        col("tv").as("vec_id"), col("bv").as("bench_witness"),
        col("cell").cast("long").as("cell"),
        VectorFunctions.cos2Bp(col("dot_fp"), col("na"), col("nb")).as("cos2_bp"))
  }

  /** Near-dup pairs under the sign-LSH quantizer: candidates = pairs
    * whose cells agree on all bits or differ in exactly one (banded
    * join on each bit-masked key), then exact cosine ≥ `threshold`
    * verifies candidates only — same candidates-then-verify shape as
    * [[TextPipeline.dedupCascade]].
    */
  def annNearDupPairs(corpus: DataFrame, threshold: Double, bits: Int, dim: Int = 64): DataFrame = {
    val e = withCells(corpus, bits, dim).select(col("vec_id"), col("cell"), col("embedding"))
    val banded = e.select(
      col("vec_id"),
      explode(array((0 until bits).map(b =>
        struct(lit(b).as("m"), col("cell").bitwiseAND(lit(~(1L << b))).as("key"))): _*)).as("bk"))
      .select(col("vec_id"), col("bk.m").as("m"), col("bk.key").as("key"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.m") === col("b.m") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .distinct() // same-cell pairs collide on every masked key
    val emb = corpus.select(col("vec_id"), col("embedding"))
    cand
      .join(emb.select(col("vec_id").as("va"), col("embedding").as("ea")), Seq("va"))
      .join(emb.select(col("vec_id").as("vb"), col("embedding").as("eb")), Seq("vb"))
      .select(col("va"), col("vb"), VectorFunctions.cosine(col("ea"), col("eb")).as("cos"))
      .where(col("cos") >= threshold)
  }

  // ------------------------------------------------------------------
  // Portable forms (round 8): same cascade shapes as withCells /
  // annTopK / annNearDupPairs, but every float decision replaced by an
  // exact-integer one (md5-derived planes, fixed-point dots, q29's
  // ranking key, cross-multiplied threshold) so the WHOLE candidate
  // cascade hash-matches a DuckDB oracle — the q31/q32 r7 precedent
  // applied to the ANN axis. The splitmix64/float forms above remain
  // the at-scale variants, recall-parity-pinned in spec.
  // ------------------------------------------------------------------

  /** [[withCells]] with md5-derived planes and integer sign decisions. */
  def withCellsPortable(corpus: DataFrame, bits: Int, dim: Int = 64): DataFrame =
    corpus.withColumn("cell", VectorFunctions.signBucketPortable(col("embedding"), dim, bits))

  /** [[annTopK]] with the portable quantizer and q29's exact ranking
    * key sign(d)·(d²·10⁴ div n) — per query, the anchor norm is
    * constant, so the key is monotone in cosine at 1e-18 resolution;
    * ties broken by vec_id. Output is all exact int64.
    */
  def annTopKPortable(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int, dim: Int = 64): DataFrame = {
    val S = graft.llm.LlmQueries.Q29Scale
    val c = withCellsPortable(corpus, bits, dim)
    val probes = array(
      col("cell") +: (0 until bits).map(b => col("cell").bitwiseXOR(lit(1L << b))): _*)
    val q = withCellsPortable(queries, bits, dim)
      .select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(probes).as("probe"))
    val scored = c
      .join(broadcast(q), col("cell") === col("probe") && col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        VectorFunctions.dotFp(col("embedding"), col("q_emb"), S).as("dot_fp"),
        VectorFunctions.dotFp(col("embedding"), col("embedding"), S).as("n_fp"),
      )
      .select(
        col("query_id"), col("vec_id"), col("dot_fp"),
        (when(col("dot_fp") < 0, lit(-1L)).otherwise(lit(1L)) *
          VectorFunctions.rankFp(col("dot_fp"), col("n_fp"))).as("rank_fp"),
      )
    val w = Window.partitionBy("query_id").orderBy(desc("rank_fp"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** [[annNearDupPairs]] with the portable quantizer and an EXACT
    * threshold: cos ≥ tn/td ⟺ d ≥ 0 ∧ td²·d² ≥ tn²·nₐ·n_b — all in
    * DECIMAL(38,0), no float anywhere. Emits the exact integer
    * `cos2_bp` = d²·10⁴ div (nₐ·n_b) (squared cosine in basis points)
    * instead of a rounded float score.
    */
  /** The portable cascade's shared core: banded hamming-≤1 candidate
    * pairs with their exact fixed-point dot and squared norms —
    * (va, vb, dot_fp, na, nb) — surviving `bandPred` (an exact integer
    * predicate over those columns).
    *
    * Shape (r10, stage-traced at a 64× replica): the verify dot runs
    * INSIDE the banded join stage — each side carries its quantized
    * vector and precomputed squared norm through the band explode
    * (n·bits rows of ~d·8 bytes: n·log n, linear-ish), one codegen'd
    * int64 [[VectorFunctions.dotLong]] per banded COLLISION, and the
    * consumer's predicate filters BEFORE the pair distinct. The r9
    * form deduped ALL collisions and then re-joined the corpus twice
    * to score survivors: at the 64× replica that was a 57 M-row
    * distinct exchange plus two 57 M-row sort-merge joins dragging
    * 264-byte embedding arrays — 450 s of the composed operator's
    * 522 s, GC-bound (probes/r10/q224_stagetrace). Filter∘distinct ≡
    * distinct∘filter here because dot/na/nb are deterministic in
    * (va, vb) — so the exchange now carries THRESHOLD SURVIVORS
    * (output-proportional: the whole point of banding) instead of the
    * full collision mass. Multi-band collisions re-score before the
    * dedup (measured 1.7× mean duplicate dots) — integer dots are
    * ~free next to the exchanges they replace. Quantization is
    * per-vector, pre-explode; `vec_quantize_fp` is bit-identical to
    * the `FloatVecDotFp` quantizer (pinned in spec), so every emitted
    * integer is unchanged from the r9 form.
    */
  private[graft] def portableVerifiedPairs(
      corpus: DataFrame, bits: Int, dim: Int, bandPred: Column): DataFrame = {
    val S = graft.llm.LlmQueries.Q29Scale
    val e = withCellsPortable(corpus, bits, dim).select(
      col("vec_id"), col("cell"),
      VectorFunctions.quantizeFp(col("embedding"), S).as("qv"))
    val withNorm = e.select(col("vec_id"), col("cell"), col("qv"),
      VectorFunctions.dotLong(col("qv"), col("qv")).as("nq"))
    val banded = withNorm.select(
      col("vec_id"), col("qv"), col("nq"),
      explode(array((0 until bits).map(b =>
        struct(lit(b).as("m"), col("cell").bitwiseAND(lit(~(1L << b))).as("key"))): _*)).as("bk"))
      .select(col("vec_id"), col("qv"), col("nq"), col("bk.m").as("m"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.m") === col("b.m") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        VectorFunctions.dotLong(col("a.qv"), col("b.qv")).as("dot_fp"),
        col("a.nq").as("na"), col("b.nq").as("nb"))
      .where(bandPred)
      .distinct() // same-cell SURVIVORS collide on every masked key
  }

  def annNearDupPairsPortable(corpus: DataFrame, tNum: Int, tDen: Int, bits: Int, dim: Int = 64): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold must be a rational in (0, 1]")
    portableVerifiedPairs(corpus, bits, dim,
      col("dot_fp") >= 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), tDen.toLong * tDen,
          col("na"), col("nb"), tNum.toLong * tNum) >= 0)
      .select(
        col("va"), col("vb"), col("dot_fp"),
        VectorFunctions.cos2Bp(col("dot_fp"), col("na"), col("nb")).as("cos2_bp"),
      )
  }

  /** Hard-negative mining on the portable cascade (q217's r8 form):
    * candidate pairs inside the cosine band [loNum/loDen, hiNum/hiDen)
    * — both bounds as EXACT cross-multiplied integer tests (lo > 0 ⇒
    * d ≥ 0 on every survivor, so the upper test needs no sign branch) —
    * mirrored to both directions so every anchor ranks its own
    * negatives, top-k per anchor by the q29 integer key computed
    * against the NEGATIVE's norm (the anchor norm is constant within
    * its ranking). Output is all exact int64.
    */
  def annHardNegativesPortable(
      corpus: DataFrame, k: Int,
      loNum: Int, loDen: Int, hiNum: Int, hiDen: Int,
      bits: Int, dim: Int = 64): DataFrame = {
    require(loNum > 0 && loDen > 0 && hiNum > 0 && hiDen > 0 &&
      loNum.toLong * hiDen < hiNum.toLong * loDen, "band must be 0 < lo < hi")
    val band = portableVerifiedPairs(corpus, bits, dim,
      // the band test rides INTO the shared core, ahead of its pair
      // distinct — the dedup exchange carries band members only
      col("dot_fp") >= 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), loDen.toLong * loDen,
          col("na"), col("nb"), loNum.toLong * loNum) >= 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), hiDen.toLong * hiDen,
          col("na"), col("nb"), hiNum.toLong * hiNum) < 0)
      .select(col("va"), col("vb"), col("dot_fp"), col("na"), col("nb"))
      // the mirror union reads the band twice; without the pin the
      // whole candidate join (the expensive half) would run twice.
      // pinLineage, not a bare localCheckpoint: the
      // spark.graft.reliableCheckpoints durability hatch must keep
      // covering this path on lossy-executor clusters (r9 ADVICE fix)
      .pinLineage()
    val directed = band
      .select(col("va").as("anchor_id"), col("vb").as("negative_id"),
        col("dot_fp"), col("nb").as("n_neg"), col("na"), col("nb"))
      .unionByName(band
        .select(col("vb").as("anchor_id"), col("va").as("negative_id"),
          col("dot_fp"), col("na").as("n_neg"), col("na"), col("nb")))
      .select(
        col("anchor_id"), col("negative_id"), col("dot_fp"),
        // d ≥ 0 throughout the band, so the key is the plain quotient
        VectorFunctions.rankFp(col("dot_fp"), col("n_neg")).as("rank_fp"),
        VectorFunctions.cos2Bp(col("dot_fp"), col("na"), col("nb")).as("cos2_bp"),
      )
    val w = Window.partitionBy("anchor_id").orderBy(desc("rank_fp"), asc("negative_id"))
    directed
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("anchor_id"), col("rank").cast("long").as("rank"),
        col("negative_id"), col("dot_fp"), col("cos2_bp"))
  }

  /** Directed banded candidates under a DETERMINISTIC per-anchor cap:
    * each vector's hamming-≤1 collision partners, ordered by a
    * portable md5 key (unbiased with respect to ids and geometry —
    * the q31 hash-order idiom) with negative_id as the total-order
    * tie-break, truncated to `cap` per anchor. The cap is the r9
    * answer to q217's 256× probe: on a corpus whose similarity band
    * sits in the BULK of the cosine distribution, true band mass is
    * quadratic and every surfaced pair must be exact-scored — the cap
    * converts that to ≤ N·cap scored rows BY CONTRACT, trading recall
    * the caller can see (the cap is part of the operator's name).
    */
  private[llm] def cappedDirectedCandidates(
      corpus: DataFrame, bits: Int, cap: Int, dim: Int = 64): DataFrame = {
    require(cap > 0)
    val e = withCellsPortable(corpus, bits, dim).select(col("vec_id"), col("cell"))
    val banded = e.select(
      col("vec_id"),
      explode(array((0 until bits).map(b =>
        struct(lit(b).as("m"), col("cell").bitwiseAND(lit(~(1L << b))).as("key"))): _*)).as("bk"))
      .select(col("vec_id"), col("bk.m").as("m"), col("bk.key").as("key"))
    // Enumeration shape (r10, measured): the candidate set goes
    // through a whole-stage-codegen HashAggregate distinct on two
    // int64 keys, then one per-anchor md5-order window. A bounded
    // O(cap) per-(anchor, band) buffer BEFORE the distinct (the
    // provably-equivalent pushdown — any global top-cap member has
    // < cap band-local predecessors) was built and probed both ways
    // at 64× replicas: the object-aggregate machinery it needs
    // (ObjectHashAggregate; sort-based fallback at default config,
    // object-buffer churn with the fallback threshold raised) costs
    // 1.9×/3.0× MORE than the exchange it avoids (warm 64×: 103.5 s /
    // 160.8 s vs 53.6 s for this form — probes/r10/). The cap still
    // bounds everything DOWNSTREAM (scoring, band test, ranking run
    // on ≤ N·cap rows); the enumeration itself stays the codegen'd
    // distinct, whose mass is the true banded collision count.
    // Enumeration halving (r10, stage-traced): the directed collision
    // set is mirror-SYMMETRIC — (x, y) collides in band m iff (y, x)
    // does — so enumerating it directed (a ≠ b) pushed 2× the banded
    // collision mass through the join and the dedup exchange (the two
    // stages owning 747 of 773 s at a 64× replica,
    // probes/r10/q258_stagetrace). Enumerate UNDIRECTED (a < b),
    // dedup half the rows, and mirror AFTER the distinct — the
    // directed candidate set, md5 order, and cap selection are
    // byte-identical.
    val undirected = banded.as("a")
      .join(banded.as("b"),
        col("a.m") === col("b.m") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .distinct() // same-cell pairs collide on every masked key
      // the mirror union reads the frame twice; the pin keeps the
      // join + dedup (the expensive half) single-execution — the q217
      // band-pin rationale verbatim (plan-audited: the two union
      // branches do NOT canonicalize to a reusable exchange, the
      // mirror projections sit above distinct aggregates Spark plans
      // separately)
      .pinLineage()
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("__h").asc, col("negative_id").asc)
    undirected
      .select(col("va").as("anchor_id"), col("vb").as("negative_id"))
      .unionByName(undirected
        .select(col("vb").as("anchor_id"), col("va").as("negative_id")))
      .withColumn("__h",
        md5(concat_ws("|", lit("hn"), col("anchor_id").cast("string"),
          col("negative_id").cast("string"))))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .select("anchor_id", "negative_id")
  }

  /** CAPPED hard-negative mining (q258): [[annHardNegativesPortable]]
    * with the candidate stage bounded per anchor — exact scoring, the
    * cross-multiplied band, and the q29 ranking all run on ≤ N·cap
    * rows however dense the band is. With `cap` ≥ the true candidate
    * fan-in the result EQUALS the uncapped operator (spec-pinned);
    * below it, recall trades deterministically (md5 order — unbiased,
    * replayable, and hash-matched by the oracle). Candidates are
    * directed from the start (no mirror union): each anchor caps and
    * ranks its OWN view of the band.
    */
  def annHardNegativesCapped(
      corpus: DataFrame, k: Int,
      loNum: Int, loDen: Int, hiNum: Int, hiDen: Int,
      bits: Int, cap: Int, dim: Int = 64): DataFrame = {
    require(loNum > 0 && loDen > 0 && hiNum > 0 && hiDen > 0 &&
      loNum.toLong * hiDen < hiNum.toLong * loDen, "band must be 0 < lo < hi")
    val S = graft.llm.LlmQueries.Q29Scale
    val emb = corpus.select(col("vec_id"), col("embedding"))
    val scored = cappedDirectedCandidates(corpus, bits, cap, dim)
      .join(emb.select(col("vec_id").as("anchor_id"), col("embedding").as("ea")), Seq("anchor_id"))
      .join(emb.select(col("vec_id").as("negative_id"), col("embedding").as("eb")), Seq("negative_id"))
      .select(
        col("anchor_id"), col("negative_id"),
        VectorFunctions.dotFp(col("ea"), col("eb"), S).as("dot_fp"),
        VectorFunctions.dotFp(col("ea"), col("ea"), S).as("na"),
        VectorFunctions.dotFp(col("eb"), col("eb"), S).as("nb"))
      .where(col("dot_fp") >= 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), loDen.toLong * loDen,
          col("na"), col("nb"), loNum.toLong * loNum) >= 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), hiDen.toLong * hiDen,
          col("na"), col("nb"), hiNum.toLong * hiNum) < 0)
      .select(
        col("anchor_id"), col("negative_id"), col("dot_fp"),
        VectorFunctions.rankFp(col("dot_fp"), col("nb")).as("rank_fp"),
        VectorFunctions.cos2Bp(col("dot_fp"), col("na"), col("nb")).as("cos2_bp"))
    val w = Window.partitionBy("anchor_id").orderBy(desc("rank_fp"), asc("negative_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("anchor_id"), col("rank").cast("long").as("rank"),
        col("negative_id"), col("dot_fp"), col("cos2_bp"))
  }

  /** Hard-negative mining at the 100 TB shape (q263): q217's job —
    * per anchor, the top-k negatives in the cosine band
    * [loNum/loDen, hiNum/hiDen) — with candidates blocked by
    * [[ivfAssignCellsFp]]'s cells-∝-n clustering instead of the
    * sign-LSH band join. This is how a production contrastive
    * pipeline actually mines: the IVF index built for retrieval
    * doubles as the negative sampler (cluster-mates ARE the
    * near-but-not-identical pool), and the geometry bounds the work
    * without a cap — intra-cell pairs are Σ|cell|²/2 ≈ n·targetCell/2
    * (LINEAR at constant expected cluster size), and a vector has
    * exactly ONE cell, so candidate pairs are unique BY CONSTRUCTION:
    * the pair-distinct exchange that dominates the banded forms
    * (q217's stage-trace: the 57 M-row dedup) does not exist here at
    * all. The recall trade is the IVF one (band members in foreign
    * cells are unseen) — the same deliberate trade q258 makes via its
    * cap, expressed through blocking geometry instead of truncation.
    *
    * Scoring/band/ranking are q217's exactly: quantized int64 dot
    * inside the pair join (codegen'd [[VectorFunctions.dotLong]]),
    * both band bounds cross-multiplied integer tests, undirected
    * enumeration mirrored to both directions (mirror-symmetry, the
    * q258 halving), per-anchor top-k by the q29 key against the
    * negative's norm. Every emitted integer replays in DuckDB —
    * clustering included — via the q261 CTE chain.
    */
  def annHardNegativesScaled(
      corpus: DataFrame, k: Int,
      loNum: Int, loDen: Int, hiNum: Int, hiDen: Int,
      targetCell: Int = 32, iters: Int = 2,
      knownRows: Option[Long] = None): DataFrame = {
    require(loNum > 0 && loDen > 0 && hiNum > 0 && hiDen > 0 &&
      loNum.toLong * hiDen < hiNum.toLong * loDen, "band must be 0 < lo < hi")
    require(targetCell > 1, "targetCell must exceed 1")
    val n = knownRows.getOrElse(corpus.count())
    val cells = math.max(2L, n / targetCell).toInt
    val S = graft.llm.LlmQueries.Q29Scale
    val fp = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), S).as("q"))
      .pinLineage()
    val assigned = fp
      .join(ivfAssignCellsFp(fp, cells, iters), "vec_id")
      .select(col("vec_id"), col("q"),
        VectorFunctions.dotLong(col("q"), col("q")).as("nq"), col("cell"))
      .pinLineage()
    // undirected intra-cell pairs, scored IN the join stage, band
    // filter before any exchange — the fused-verify shape with no
    // distinct to fuse into (cell membership is unique)
    val band = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        VectorFunctions.dotLong(col("a.q"), col("b.q")).as("dot_fp"),
        col("a.nq").as("na"), col("b.nq").as("nb"))
      .where(col("dot_fp") >= 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), loDen.toLong * loDen,
          col("na"), col("nb"), loNum.toLong * loNum) >= 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), hiDen.toLong * hiDen,
          col("na"), col("nb"), hiNum.toLong * hiNum) < 0)
      // the mirror union reads the band twice; the pin keeps the pair
      // join (the expensive half) single-execution — q217's rationale
      .pinLineage()
    val directed = band
      .select(col("va").as("anchor_id"), col("vb").as("negative_id"),
        col("dot_fp"), col("nb").as("n_neg"), col("na"), col("nb"))
      .unionByName(band
        .select(col("vb").as("anchor_id"), col("va").as("negative_id"),
          col("dot_fp"), col("na").as("n_neg"), col("na"), col("nb")))
      .select(
        col("anchor_id"), col("negative_id"), col("dot_fp"),
        VectorFunctions.rankFp(col("dot_fp"), col("n_neg")).as("rank_fp"),
        VectorFunctions.cos2Bp(col("dot_fp"), col("na"), col("nb")).as("cos2_bp"))
    val w = Window.partitionBy("anchor_id").orderBy(desc("rank_fp"), asc("negative_id"))
    directed
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("anchor_id"), col("rank").cast("long").as("rank"),
        col("negative_id"), col("dot_fp"), col("cos2_bp"))
  }

  /** IVF top-k search at the 100 TB shape (q264): [[kmeansTopKFp]]'s
    * job — per query, the k best corpus vectors by the exact q29
    * integer key — under [[ivfIndexFp]]'s cells-∝-n geometry, with the
    * QUERY path probed through the same two-level quantizer the corpus
    * assignment uses. q42's flat form ranks every query against ALL
    * cells (n_q·cells dots — at cells ∝ n that is the dense assignment
    * cost all over again); here a query dots the √cells coarse
    * centroids once, descends into its best LIVE coarse cell, ranks
    * only THAT cell's fine members (√cells expected), and probes its
    * `nprobe` best fine cells — 2·√cells dots per query, the identical
    * multiplier the corpus-side probe buys, and the construction nests
    * (coarse-of-coarse) when √cells itself grows inconvenient.
    * Candidate scan stays nprobe·targetCell rows per query — CONSTANT
    * at the scaled sizing, vs the flat form's nprobe·√n-sized cells.
    *
    * Every decision — Lloyd rounds, coarse/fine argmaxes (dot DESC,
    * cell ASC), probe ranking, the signed q29 key — is exact int64;
    * the oracle replays the whole index AND the probed search.
    */
  def ivfTopKScaled(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      targetCell: Int = 32,
      iters: Int = 2,
      nprobe: Int = 2,
      scale: Long = 10000000L,
      knownRows: Option[Long] = None): DataFrame = {
    require(targetCell > 1, "targetCell must exceed 1")
    val n = knownRows.getOrElse(corpus.count())
    val cells = math.max(2L, n / targetCell).toInt
    val fp = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"))
      .pinLineage()
    val (cellOf, cents, coarse) = ivfIndexFp(fp, cells, iters)
    val assigned = fp.join(cellOf, "vec_id").pinLineage()
    // fine→coarse for the FINAL centroids — the same argmax the last
    // assignment pass ran (dot DESC, gcell ASC), rebuilt here for the
    // query descent
    val fg = cents.join(broadcast(coarse))
      .select(col("cell"), col("cent"),
        struct(
          VectorFunctions.dotLong(col("cent"), col("gcent")).as("dot"),
          (-col("gcell")).as("ng")).as("sc"))
      .groupBy("cell", "cent")
      .agg(max(col("sc")).as("b"))
      .select(col("cell"), col("cent"), (-col("b.ng")).cast("int").as("gcell"))
    val live = fg.select("gcell").distinct()
    val qfp = queries.select(
      col("vec_id").as("query_id"),
      VectorFunctions.quantizeFp(col("embedding"), scale).as("qq"))
    // query → best live coarse cell (a coarse cell with no fine
    // members never ranks — ivfAssignCellsFp's rail)
    val qg = qfp
      .join(broadcast(coarse.join(live, "gcell")))
      .select(col("query_id"), col("qq"),
        struct(
          VectorFunctions.dotLong(col("qq"), col("gcent")).as("dot"),
          (-col("gcell")).as("ng")).as("sc"))
      .groupBy("query_id", "qq")
      .agg(max(col("sc")).as("b"))
      .select(col("query_id"), col("qq"), (-col("b.ng")).cast("int").as("gcell"))
    // nprobe best fine cells WITHIN the query's coarse cell
    val wq = Window.partitionBy("query_id").orderBy(desc("cdot"), asc("cell"))
    val probes = qg
      .join(broadcast(fg), "gcell")
      .select(col("query_id"), col("qq"), col("cell"),
        VectorFunctions.dotLong(col("qq"), col("cent")).as("cdot"))
      .withColumn("__rn", row_number().over(wq))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("qq"), col("cell"))
    // candidates = probed cells' members, ranked by q29's exact key —
    // kmeansTopKFp's tail verbatim
    val w = Window.partitionBy("query_id").orderBy(desc("rank_fp"), asc("vec_id"))
    assigned
      .join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        VectorFunctions.dotLong(col("q"), col("qq")).as("dot_fp"),
        VectorFunctions.dotLong(col("q"), col("q")).as("n_fp"))
      .select(col("query_id"), col("vec_id"),
        (when(col("dot_fp") < 0, lit(-1L)).otherwise(lit(1L)) *
          VectorFunctions.rankFp(col("dot_fp"), col("n_fp"))).as("rank_fp"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select("query_id", "vec_id", "rank_fp")
  }

  // -------------------------------------------------------------------
  // PCA — the dimensionality reduction that fronts ANN at scale
  // (project 64-dim embeddings to a few principal axes before
  // bucketing/search). Fully declarative power iteration, the
  // kmeansCentroids discipline: every iterate is a d-row DataFrame
  // pinned by localCheckpoint; NOTHING is collected to the driver.

  /** Sample covariance of the embedding corpus as a (i, j, c) frame
    * (d² rows). The corpus-sized pass is the DOUBLE EXPLODE into
    * (i, j, xi·xj) — generator-in-codegen, zero joins, no shuffle of
    * raw pairs: the groupBy(i, j) partial-aggregates map-side, so the
    * exchange carries d² rows PER PARTITION, independent of N. Means
    * fold in algebraically afterwards (Σxixj − n·mi·mj)/(n−1) via two
    * broadcast joins of the d-row mean table.
    */
  def covariance(corpus: DataFrame): DataFrame = {
    val emb = corpus.select(col("vec_id"), col("embedding"))
    val e1 = emb.select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
    val raw = e1
      .select(col("i"), col("xi"), posexplode(col("embedding")).as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg(sum(col("xi").cast("double") * col("xj")).as("s"), count(lit(1)).as("n"))
    val mean = emb
      .select(posexplode(col("embedding")).as(Seq("i", "xi")))
      .groupBy("i")
      .agg(avg(col("xi").cast("double")).as("m"))
    raw
      .join(broadcast(mean.select(col("i"), col("m").as("mi"))), Seq("i"))
      .join(broadcast(mean.select(col("i").as("j"), col("m").as("mj"))), Seq("j"))
      .select(
        col("i"), col("j"),
        ((col("s") - col("n") * col("mi") * col("mj")) / (col("n") - 1)).as("c"))
  }

  /** One dominant eigenvector of a (i, j, c) matrix frame by power
    * iteration: v ← normalize(C·v), `iters` times from the uniform
    * 1/√d start. Every iterate is d rows; the matvec is one equijoin
    * on j (the d-row iterate BROADCASTS — the cov frame never
    * re-shuffles per round, at any d that fits a task) + a map-side-
    * combined sum; the norm is a 1-row anchor
    * (the q79 idiom). localCheckpoint per round pins lineage — the
    * kmeans pattern, so 15 rounds cost 15 tiny jobs, not an
    * exponentially nested plan.
    */
  def powerIteration(cov: DataFrame, iters: Int = 15): DataFrame = {
    // The covariance frame is DIMENSION-sized (d² rows — KBs to MBs at
    // any real d), but a 32-partition layout makes every iteration
    // stage launch 32 near-empty tasks; at ~3ms task overhead × ~6
    // stages per pin that IS the measured cost of the loop. One
    // partition ⇒ one task per stage.
    val covLocal = cov.coalesce(1)
    val d = covLocal.select(col("i")).distinct()
    val dn = d.agg(count(lit(1)).as("dn")) // 1-row dimension anchor
    var v = d.crossJoin(dn)
      .select(col("i"), (lit(1.0) / sqrt(col("dn"))).as("v"))
      .pinLineage()
    for (it <- 1 to iters) {
      val w = covLocal
        .join(broadcast(v.select(col("i").as("j"), col("v").as("vj"))), Seq("j"))
        .groupBy("i")
        .agg(sum(col("c") * col("vj")).as("w"))
      val norm = w.agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      // Rank-deficient guard: on a zero covariance (or a deflation
      // that zeroed the residual — e.g. a corpus of exact duplicates)
      // w ≡ 0 and the norm is 0; under ANSI this divide would THROW.
      // A zero vector is the honest degenerate axis: projections
      // collapse to 0 and the grid consumers' cell-0 fallback keeps
      // their recall contract.
      v = w.crossJoin(norm) // 1-row norm anchor
        .select(col("i"),
          (col("w") / when(col("nrm") > 0, col("nrm")).otherwise(lit(1.0))).as("v"))
      // pin every 3rd round (and the last). Measured alternatives at
      // bench scale: pin EVERY round = 30 eager jobs (slowest); NO
      // pins = the broadcast input of round k lazily re-executes the
      // whole k-1 prefix — exponential blowup, >300s. The loop cost
      // is a per-round fixed floor (codegen + scheduling of ~6 tiny
      // stages), amortized over corpus size: the 16× probe moved the
      // whole query 1.1×.
      if (it % 3 == 0 || it == iters) v = v.pinLineage()
    }
    // ±v are both eigenvectors; pin the sign (non-negative loading
    // sum) so downstream projections are orientation-stable.
    val sgn = v.agg(when(sum(col("v")) >= 0, 1.0).otherwise(-1.0).as("sgn"))
    v.crossJoin(sgn).select(col("i"), (col("v") * col("sgn")).as("v"))
  }

  /** Top-2 axes of a covariance frame by BLOCK orthogonal iteration
    * (r7 — replaces the power-iterate-then-deflate-then-power-iterate
    * form): both iterates ride ONE matvec join per round (the cov
    * frame is scanned once for two columns, not once per axis), and
    * the per-round Gram–Schmidt step keeps a2 EXACTLY orthogonal to a1
    * at every round — the property the PCA-grid's distance-contraction
    * recall guarantee rests on, now structural instead of a final
    * correction. v1's sequence is IDENTICAL to plain power iteration
    * (the GS step never feeds v2 back into v1); v2 converges to the
    * second eigenvector at the standard subspace-iteration rate — and
    * the d²-row DEFLATED MATRIX the old form materialized and
    * checkpointed per call is gone, which at bench scale halved the
    * loop's fixed-cost stage count. Rank-deficient guard as in
    * [[powerIteration]]: zero norms yield the honest zero axis.
    * Returns the d-row (i, a1, a2) loading table, both signs pinned
    * (non-negative loading sum).
    */
  def topTwoAxes(cov: DataFrame, iters: Int = 15): DataFrame = {
    val covLocal = cov.coalesce(1) // d² rows; one task per stage (see powerIteration)
    val d = covLocal.select(col("i")).distinct()
    val dn = d.agg(count(lit(1)).as("dn"))
    def safeDiv(x: Column, n: Column): Column =
      x / when(n > 0, n).otherwise(lit(1.0))
    // init: v1 uniform, v2 alternating-sign — deterministic, unit, and
    // never parallel to v1 for d ≥ 2
    var vs = d.crossJoin(dn)
      .select(col("i"),
        (lit(1.0) / sqrt(col("dn"))).as("v1"),
        (when(col("i") % 2 === 0, lit(1.0)).otherwise(lit(-1.0)) / sqrt(col("dn"))).as("v2"))
      .pinLineage()
    for (it <- 1 to iters) {
      val w = covLocal
        .join(broadcast(vs.select(col("i").as("j"), col("v1").as("y1"), col("v2").as("y2"))),
          Seq("j"))
        .groupBy("i")
        .agg(sum(col("c") * col("y1")).as("w1"), sum(col("c") * col("y2")).as("w2"))
      // ALL round scalars in ONE 1-row anchor (s11 = Σw1², s12 = Σw1w2,
      // s22 = Σw2²): normalize-then-orthogonalize has the closed form
      //   v1 = w1/√s11,  r = w2 − (s12/s11)·w1,  ‖r‖ = √(s22 − s12²/s11)
      // so the round is matvec → stats agg → one crossJoin → one
      // projection. Anchoring norm/dot/norm as three SEPARATE
      // crossJoins of nested aggregates multiplies the unpinned
      // subplan ~8× per round — measured 10× slower across the pin
      // cadence; one anchor keeps the doubling at the powerIteration
      // rate the cadence was tuned for.
      val st = w.agg(
        sum(col("w1") * col("w1")).as("s11"),
        sum(col("w1") * col("w2")).as("s12"),
        sum(col("w2") * col("w2")).as("s22"))
      vs = w.crossJoin(st) // 1-row stats anchor
        .select(
          col("i"),
          safeDiv(col("w1"), sqrt(col("s11"))).as("v1"),
          safeDiv(
            col("w2") - when(col("s11") > 0, col("s12") / col("s11")).otherwise(lit(0.0)) * col("w1"),
            sqrt(greatest(
              col("s22") - when(col("s11") > 0, col("s12") * col("s12") / col("s11"))
                .otherwise(lit(0.0)),
              lit(0.0)))).as("v2"))
      // pin cadence: the powerIteration rule (every 3rd + last)
      if (it % 3 == 0 || it == iters) vs = vs.pinLineage()
    }
    val sgn = vs.agg(
      when(sum(col("v1")) >= 0, lit(1.0)).otherwise(lit(-1.0)).as("s1"),
      when(sum(col("v2")) >= 0, lit(1.0)).otherwise(lit(-1.0)).as("s2"))
    vs.crossJoin(sgn)
      .select(col("i"), (col("v1") * col("s1")).as("a1"), (col("v2") * col("s2")).as("a2"))
  }

  // -------------------------------------------------------------------
  // FIXED-POINT PCA (r9): the q42 move — define every decision of an
  // iterative numeric algorithm over exact integers — applied to power
  // iteration, which upgrades q202 from rows-only to a real DuckDB
  // oracle. The float topTwoAxes/pcaProject above stay the production
  // form; the spec pins fp-vs-float axis agreement on an anisotropic
  // corpus.
  //
  // Integer-width plan (S = 1e7 quantization, CS = 1e6 axis scale,
  // T = 5e5 per-round downscale target, dim 64; trunc division always
  // via abs/negate so both engines agree):
  //  - centered values |c| ≤ 2S; scatter entries |A₀| ≤ N·4e14 —
  //    summed in DECIMAL(38,0)/HUGEINT, then uniformly downscaled by
  //    D_A = (max|A₀| div 6e10)+1 so |A| ≤ 6e10 (int64 from here on);
  //  - matvec |Σ A·v| ≤ 64·6e10·(CS+ε) < 3.9e18 < 2⁶³;
  //  - per-round downscale to |w| ≤ T ⇒ ‖w‖ ≤ 4e6, norms ≤ 64·T² =
  //    1.6e13 < 2⁵³ (Exact.isqrt domain), normalized |v| ≤ CS·(1+1/r);
  //  - Gram–Schmidt at fixed-point scale 2¹⁹ = 524288 (the largest
  //    that fits: worst-case |dotw| ≤ ‖w‖·‖a₁‖ ≤ 4e6·4e6 = 1.6e13 even
  //    on the degenerate r=0 path, and 1.6e13·2¹⁹ = 8.4e18 < 2⁶³);
  //    projection components ≤ ‖w‖ ≤ 4e6, the orthogonalized vector
  //    stays ≤ 4.5e6 and its norm² ≤ 1.3e15 < 2⁵³. The coefficient
  //    quantum leaves a parallel residual ≤ ‖a₁‖/2¹⁹ ≈ 2e-6 relative —
  //    axis 2 is therefore the true second direction only when
  //    λ₂/λ₁ ≫ 2e-6 (every realistic spectrum; the spec pins a 20×
  //    fixture). Consumers needing a distance-contraction guarantee
  //    fold the 2e-6 into their safety margin.
  // Seeds are the argmax-diagonal coordinate axes (ties → lowest i;
  // axis 2 excludes axis 1's seed) — deterministic, SQL-trivial, and
  // aligned with the dominant directions. Zero matrices/vectors flow
  // through as honest zeros (D = max div T + 1 ≥ 1; r = 0 keeps w).
  // -------------------------------------------------------------------

  private val FpDownscaleTarget = 500000L

  /** Truncating integer division for y > 0 (both engines' sign-split
    * `div` idiom, as driver code).
    */
  @inline private def truncDiv(x: Long, y: Long): Long =
    if (x < 0) -((-x) / y) else x / y

  /** Top-2 fixed-point axes of a pre-quantized corpus
    * `fp = (vec_id, q: array<long>)`: truncated-mean centering, exact
    * integer scatter matrix (DECIMAL accumulate, uniform downscale),
    * `iters` exact power-iteration rounds per axis (axis 2
    * orthogonalized against the FINAL axis 1 every round — deflation
    * with a fixed pivot, so the axis-1 sequence is untouched), signs
    * pinned. Returns the d-row (i, a1, a2) loading table, both at
    * `centScale`. Every step replayable verbatim in DuckDB.
    *
    * Execution split (the r10 rework, measured not guessed): the ONLY
    * data-scale stage is the scatter — N·d² multiply-adds, distributed
    * with map-side DECIMAL combine. Everything after operates on the
    * d×d matrix, which is BOUNDED BY THE EMBEDDING DIMENSION (d² = 4096
    * longs at d = 64) and independent of corpus size — so it is
    * collected once (the same driver-safety class as RawSink's
    * metadata-sized seal list or a broadcast build) and the 2·iters
    * power rounds run as exact int64 driver arithmetic. The previous
    * form ran each round as distributed jobs over 64-row frames with
    * per-round checkpoints: ~12.5 s of pure scheduling at ANY corpus
    * size (the profiled r9 sf0.1 cost — the rounds themselves are
    * microseconds of integer math). Same integers bit for bit: each
    * driver op mirrors one oracle CTE (matvec, `div`-downscale,
    * isqrt-normalize, 2¹⁹-coefficient deflation, sign pin), with
    * `Math.*Exact` making any width-plan violation loud.
    */
  def topTwoAxesFp(fp: DataFrame, iters: Int = 8, centScale: Long = 1000000L): DataFrame = {
    require(iters >= 1)
    val spark = fp.sparkSession
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("a1", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("a2", org.apache.spark.sql.types.LongType, nullable = false)))
    // one-pass exact aggregates (r10): Σq + the row count, then the
    // scatter of the rows centered on the truncated integer mean —
    // two N-row aggregate passes whose exchanges carry d-/d²-sized
    // STATES, in place of the r9 N·d mean explode and N·d² scatter
    // explode through a hash aggregate (the dominant term of q202/q224
    // at replica scale; same integers bit for bit — see
    // [[graft.expressions.VectorAggregates]])
    val sumRow = fp.agg(
      VectorFunctions.vecSumLong(col("q")).as("s"), count(lit(1)).as("n")).head()
    val n = sumRow.getLong(1)
    if (n == 0L)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
    val mArr: Array[Long] = sumRow.getSeq[Long](0)
      .map(s => if (s < 0) -((-s) / n) else s / n).toArray
    val flat = fp.agg(VectorFunctions.scatterMatrix(
        VectorFunctions.subLong(col("q"), typedlit(mArr.toSeq))).as("a0"))
      .head().getSeq[java.math.BigDecimal](0) // d² values — dimension-bounded, never corpus-bounded
    // ---- driver-exact integer power iteration (mirrors the oracle
    // CTE chain `ap`/`dg`/`k1`/`v*_t` op for op) ----
    val dim = mArr.length
    val a0m = Array.tabulate(dim, dim)((i, j) => BigInt(flat(i * dim + j).toBigInteger))
    val maxA = a0m.iterator.flatten.map(_.abs).max
    val dA = maxA / 60000000000L + 1 // operands non-negative: BigInt / = div
    val am = Array.tabulate(dim, dim) { (i, j) =>
      val v = a0m(i)(j)
      (if (v.signum < 0) -((-v) / dA) else v / dA).toLong
    }
    def matvec(v: Array[Long]): Array[Long] =
      Array.tabulate(dim) { i =>
        var s = 0L; var j = 0
        while (j < dim) { s = Math.addExact(s, Math.multiplyExact(am(i)(j), v(j))); j += 1 }
        s
      }
    def downscale(w: Array[Long]): Array[Long] = {
      val dw = w.iterator.map(math.abs).max / FpDownscaleTarget + 1
      w.map(truncDiv(_, dw))
    }
    def normalize(w: Array[Long]): Array[Long] = {
      var n2 = 0L
      w.foreach(x => n2 = Math.addExact(n2, Math.multiplyExact(x, x)))
      val r = graft.ops.Exact.isqrtLong(n2)
      if (r == 0L) w
      else w.map(x => truncDiv(Math.multiplyExact(x, centScale), r))
    }
    def signPin(v: Array[Long]): Array[Long] = {
      val s = if (v.sum >= 0) 1L else -1L
      v.map(_ * s)
    }
    def seed(k: Int): Array[Long] =
      Array.tabulate(dim)(i => if (i == k) centScale else 0L)
    // argmax diagonal, ties → lowest i (the oracle's ORDER BY a DESC, i)
    val diag = Array.tabulate(dim)(i => (am(i)(i), i))
    val k1 = diag.maxBy { case (a, i) => (a, -i) }._2
    var v1 = seed(k1)
    for (_ <- 1 to iters) v1 = normalize(downscale(matvec(v1)))
    val a1 = signPin(v1)
    def orth(w: Array[Long]): Array[Long] = {
      var dw = 0L; var d11 = 0L
      var i = 0
      while (i < dim) {
        dw = Math.addExact(dw, Math.multiplyExact(w(i), a1(i)))
        d11 = Math.addExact(d11, Math.multiplyExact(a1(i), a1(i)))
        i += 1
      }
      if (d11 == 0L) w
      else {
        val coef = truncDiv(Math.multiplyExact(dw, 524288L), d11)
        Array.tabulate(dim) { i =>
          val p = Math.multiplyExact(coef, a1(i))
          Math.subtractExact(w(i), truncDiv(p, 524288L))
        }
      }
    }
    val k2 = diag.filter(_._2 != k1).maxBy { case (a, i) => (a, -i) }._2
    var v2 = seed(k2)
    for (_ <- 1 to iters) v2 = normalize(orth(downscale(matvec(v2))))
    val a2 = signPin(v2)
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](dim)
    for (i <- 0 until dim) rows.add(org.apache.spark.sql.Row(i, a1(i), a2(i)))
    spark.createDataFrame(rows, outSchema)
  }

  /** Exact integer projections of a pre-quantized corpus onto fp axes:
    * center on the truncated integer means, dot against both axes —
    * (vec_id, p1_fp, p2_fp) at scale S·CS per unit²
    * (|p| ≤ 64·2S·(CS+ε) ≈ 1.3e15, int64-exact).
    */
  def projectFpOnAxes(fp: DataFrame, axes: DataFrame): DataFrame = {
    // one-pass exact mean (r10): same integers as the r9 N·d explode →
    // groupBy(i) form, as a single d-long aggregate state
    val sumRow = fp.agg(
      VectorFunctions.vecSumLong(col("q")).as("s"), count(lit(1)).as("n")).head()
    val n = sumRow.getLong(1)
    val mArr: Seq[Long] =
      if (n == 0L) Seq.empty
      else sumRow.getSeq[Long](0).map(s => if (s < 0) -((-s) / n) else s / n)
    val a1arr = axes.agg(
      expr("transform(array_sort(collect_list(struct(i, a1))), s -> s.a1)").as("a1arr"))
    val a2arr = axes.agg(
      expr("transform(array_sort(collect_list(struct(i, a2))), s -> s.a2)").as("a2arr"))
    // dot is linear, so the centered projection splits exactly in ℤ:
    // Σ(xᵢ−mᵢ)·aᵢ = dot(q,a) − dot(m,a) — two fully-codegen'd
    // LongVecDot passes instead of an interpreted (CodegenFallback)
    // zip_with materializing the centered array per row per axis.
    // The m-term is row-constant (64 codegen'd multiplies — cheaper
    // than any mechanism to hoist it); bounds unchanged (each split
    // term ≤ 64·S·(CS+ε) ≈ 6.4e14 < the documented 1.3e15 envelope).
    fp.crossJoin(broadcast(a1arr))
      .crossJoin(broadcast(a2arr))
      .select(col("vec_id"),
        (VectorFunctions.dotLong(col("q"), col("a1arr")) -
          VectorFunctions.dotLong(typedlit(mArr), col("a1arr"))).as("p1_fp"),
        (VectorFunctions.dotLong(col("q"), col("a2arr")) -
          VectorFunctions.dotLong(typedlit(mArr), col("a2arr"))).as("p2_fp"))
  }

  /** Fixed-point PCA projection (q202's r9 form): quantize, learn the
    * fixed-point top-2 axes, and project — every step integer-exact
    * and hash-matched by the DuckDB replay.
    */
  def pcaProjectFp(
      corpus: DataFrame, iters: Int = 8,
      scale: Long = 10000000L, centScale: Long = 1000000L): DataFrame = {
    val fp = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"))
      .pinLineage()
    projectFpOnAxes(fp, topTwoAxesFp(fp, iters, centScale))
  }

  /** Exact-isqrt L2 normalization of a quantized corpus: each
    * component sign·((|x|·scale) div ⌊‖q‖⌋) — unit vectors at scale S,
    * zero vectors pass through. Near-unit inputs keep |x·scale| ≤ 1e14
    * (the Q29Scale precondition); ‖q‖² ≤ 64·S² < 2⁵³ = isqrt's domain.
    */
  def l2NormalizeFp(fp: DataFrame, scale: Long = 10000000L): DataFrame =
    // one codegen'd per-row pass (LongVecL2NormFp) — same integers as
    // the explode→join→groupBy form it replaced (r ties to components
    // within one row, so the per-row fusion is semantically free), but
    // ZERO shuffles instead of two over N·dim element rows
    fp.select(col("vec_id"), VectorFunctions.l2NormFp(col("q"), scale).as("q"))

  /** The fixed-point grid cell width for threshold tn/td at p'-scale
    * CS (1e6 = one unit of projected distance): ceiling-isqrt of
    * 2(1−t)·CS² — CEILING, not floor: wider cells keep the
    * contraction-losslessness direction — plus a 1/1024 + 8-quantum
    * safety margin that dominates every fixed-point error source
    * (axis-norm quantum ~2e-6, qn rounding, projection truncation).
    */
  def gridWidthFp(tNum: Int, tDen: Int): Long = {
    val w0 = graft.ops.Exact.isqrtLong(2L * (tDen - tNum) * 1000000000000L / tDen) + 1
    w0 + w0 / 1024 + 8
  }

  /** Fixed-point grid cells: projections downscaled to p'-scale 1e6
    * (sign-split truncation), FLOOR-divided by the cell width (floor,
    * not trunc — negative coordinates must not fold onto cell 0).
    */
  def gridCellsFp(fp: DataFrame, axes: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val w = gridWidthFp(tNum, tDen)
    projectFpOnAxes(fp, axes)
      .select(col("vec_id"),
        when(col("p1_fp") < 0, -expr("(-p1_fp) div 10000000"))
          .otherwise(expr("p1_fp div 10000000")).as("d1"),
        when(col("p2_fp") < 0, -expr("(-p2_fp) div 10000000"))
          .otherwise(expr("p2_fp div 10000000")).as("d2"))
      .select(col("vec_id"),
        when(col("d1") >= 0, expr(s"d1 div $w"))
          .otherwise(-expr(s"((-d1) + $w - 1) div $w")).as("cx"),
        when(col("d2") >= 0, expr(s"d2 div $w"))
          .otherwise(-expr(s"((-d2) + $w - 1) div $w")).as("cy"))
  }

  /** [[gridImpliedCandidates]] for the fp cells (same histogram-only
    * statistic; integer arithmetic end to end).
    */
  def gridImpliedCandidatesFp(cells: DataFrame): Long = {
    val hist = cells.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
    val ordered = hist.as("a")
      .join(hist.as("b"),
        abs(col("a.cx") - col("b.cx")) <= 1 && abs(col("a.cy") - col("b.cy")) <= 1)
      .agg(coalesce(sum(col("a.n") * col("b.n")), lit(0L)).cast("long"))
      .head().getLong(0)
    val n = cells.count()
    (ordered - n) / 2
  }

  /** Grid-branch pairs under the exact integer threshold: 3×3 probe
    * equijoin on the fp cells, verify d ≥ 0 ∧ td²·d² ≥ tn²·nₐ·n_b on
    * RAW fp vectors (same test as the sign-LSH branch, so both
    * branches emit identical values for identical pairs). Output
    * (va, vb, dot_fp, cos2_bp) — all int64.
    */
  private def gridPairsFp(fpRaw: DataFrame, cells: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val probes = cells.select(
      col("vec_id"),
      explode(expr("flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(cx + dx AS cx, cy + dy AS cy))))"))
        .as("cell"))
      .select(col("vec_id"), col("cell.cx").as("cx"), col("cell.cy").as("cy"))
    val cand = probes.as("a")
      .join(cells.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .distinct() // near-boundary pairs can meet in 2 probe windows
    cand
      .join(fpRaw.select(col("vec_id").as("va"), col("q").as("qa")), Seq("va"))
      .join(fpRaw.select(col("vec_id").as("vb"), col("q").as("qb")), Seq("vb"))
      .select(col("va"), col("vb"),
        VectorFunctions.dotLong(col("qa"), col("qb")).as("dot_fp"),
        VectorFunctions.dotLong(col("qa"), col("qa")).as("na"),
        VectorFunctions.dotLong(col("qb"), col("qb")).as("nb"))
      .where(col("dot_fp") >= 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), tDen.toLong * tDen,
          col("na"), col("nb"), tNum.toLong * tNum) >= 0)
      .select(col("va"), col("vb"), col("dot_fp"),
        VectorFunctions.cos2Bp(col("dot_fp"), col("na"), col("nb")).as("cos2_bp"))
  }

  /** FIXED-POINT adaptive near-dup (q224's r9 form): the same physical
    * strategy choice as [[adaptiveNearDupPairs]] — lossless PCA-grid
    * when the cell histogram implies ≤ budgetFactor·N candidates,
    * linear sign-LSH + exact verify otherwise — with EVERY decision
    * integer-exact: fp normalization ([[l2NormalizeFp]]), fp axes
    * ([[topTwoAxesFp]]), fp projections/cells (ceiling width +
    * documented safety margin keeps the grid branch lossless under
    * the fixed-point error budget), an integer histogram decision,
    * and the cross-multiplied threshold on both branches. Both
    * branches and the CHOICE replay verbatim in DuckDB — an adaptive
    * operator whose whole planning is oracle-checkable.
    */
  def adaptiveNearDupPairsFp(
      corpus: DataFrame,
      tNum: Int, tDen: Int,
      iters: Int = 6,
      budgetFactor: Int = 8,
      scale: Long = 10000000L,
      knownRows: Option[Long] = None): DataFrame = {
    require(tNum > 0 && tDen > 0 && 9L * tNum >= 7L * tDen,
      s"adaptive near-dup needs threshold >= 7/9 (got $tNum/$tDen): below it the 3x3" +
        " probe cannot thin ANY corpus and grid applicability is moot")
    // callers reading a parquet corpus pass the footer count
    // (CorpusStats) — same integer, no sizing scan
    val n = knownRows.getOrElse(corpus.count())
    val fpRaw = corpus
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"))
      .pinLineage()
    val fpNorm = l2NormalizeFp(fpRaw, scale).pinLineage()
    val cells = gridCellsFp(fpNorm, topTwoAxesFp(fpNorm, iters), tNum, tDen)
      .pinLineage() // the index artifact: N×3, read by histogram + join
    if (gridImpliedCandidatesFp(cells) <= budgetFactor.toLong * n)
      gridPairsFp(fpRaw, cells, tNum, tDen)
    else annNearDupPairsPortable(corpus, tNum, tDen, cellBits(n))
  }

  /** Top-2 principal axes and the corpus projected onto them. Returns
    * (vec_id, p1, p2). The projection is one broadcast join of the
    * two d-row axes into the exploded corpus — the same shape as
    * scoring against any fixed linear map.
    */
  def pcaProject(corpus: DataFrame, iters: Int = 15): DataFrame = {
    val axes = topTwoAxes(covariance(corpus).pinLineage(), iters)
    corpus
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .join(broadcast(axes), Seq("i"))
      .groupBy("vec_id")
      .agg(
        sum(col("x").cast("double") * col("a1")).as("p1"),
        sum(col("x").cast("double") * col("a2")).as("p2"))
  }

  // ------------------------------------------------------------------
  // PCA grid blocking — LOSSLESS near-dup candidates from a learned
  // 2-D projection. On L2-NORMALIZED vectors, cos(x,y) ≥ t ⟺
  // ‖x̂−ŷ‖ ≤ √(2(1−t)), and any orthonormal projection CONTRACTS
  // distance — so two vectors in a qualifying pair land within
  // w = √(2(1−t)) of each other on BOTH principal axes, i.e. within
  // one grid cell of each other at cell width w. 9-cell (3×3) probing
  // therefore has recall 1.0 BY CONSTRUCTION — unlike sign-LSH's
  // probabilistic recall — while precision (candidate thinning) is
  // whatever the top-2 axes' variance buys on this corpus. Exact
  // full-space cosine verifies candidates; wrong pairs cost work,
  // never answers.
  // ------------------------------------------------------------------

  /** Near-dup pairs (va, vb, cos ≥ threshold) via lossless PCA-grid
    * blocking. One grid key per vector; each vector probes its 3×3
    * cell neighborhood; a qualifying pair meets in exactly one
    * (probe, home) combination under the va < vb order.
    */
  def pcaGridNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      iters: Int = 15,
      maxCellWidth: Double = 2.0 / 3): DataFrame = {
    val w = math.sqrt(2.0 * (1.0 - threshold))
    // Candidate-budget rail: projections of unit vectors live in the
    // unit disk, so each axis spans at most [-1, 1]. When the 3×3
    // probe window (3 cells of width w) covers that whole span — 3w ≥
    // 2, i.e. threshold ≤ 7/9 — blocking is structurally OFF: every
    // vector probes every occupied cell and candidates go quadratic,
    // the plan that dies at 100×. Answers would still be correct
    // (losslessness never depended on w), so failing LOUDLY here is
    // the only way the misconfiguration surfaces. Production semantic
    // dedup (t ≥ 0.8 ⇒ w ≤ 0.63) passes; stress/recall specs that
    // WANT the degenerate regime opt out via maxCellWidth.
    require(w <= maxCellWidth,
      f"pca-grid cell width $w%.3f exceeds $maxCellWidth%.3f (threshold $threshold%.2f < 7/9" +
        " ⇒ 3×3 probe covers the whole projected span ⇒ super-linear candidates);" +
        " raise the threshold or opt out explicitly for stress testing")
    val normed = l2Normalized(corpus)
    gridPairs(normed, gridCells(normed, w, iters), threshold)
  }

  private def l2Normalized(corpus: DataFrame): DataFrame =
    corpus.select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(x / greatest(sqrt(aggregate(transform(embedding, y -> CAST(y AS DOUBLE) * y), CAST(0 AS DOUBLE), (a, v) -> a + v)), CAST(1e-12 AS DOUBLE)) AS FLOAT))")
        .as("embedding"))

  /** (vec_id, cx, cy) grid keys at cell width w over the learned top-2
    * axes. Degenerate-corpus guard: on a rank-deficient normalized
    * corpus (e.g. MANY exact duplicates — precisely a dedup query's
    * input) the covariance or its deflation is the zero matrix, power
    * iteration divides by a zero norm, and the projections come back
    * NaN/NULL. Unguarded, those rows would get NULL cell keys and
    * silently match NOTHING — breaking the lossless contract on the
    * easiest possible pairs. Degenerate projections collapse to cell 0
    * instead: candidates inflate, recall survives (the documented
    * trade direction: wrong candidates cost verify work, never
    * answers).
    */
  private def gridCells(normed: DataFrame, w: Double, iters: Int): DataFrame = {
    def safeCell(p: Column): Column =
      floor(coalesce(nanvl(p, lit(0d)), lit(0d)) / w).cast("long")
    pcaProject(normed, iters)
      .select(col("vec_id"), safeCell(col("p1")).as("cx"), safeCell(col("p2")).as("cy"))
  }

  private def gridPairs(normed: DataFrame, proj: DataFrame, threshold: Double): DataFrame = {
    val home = normed.join(proj, "vec_id")
    val probes = home.select(
      col("vec_id"), col("embedding"),
      explode(expr("flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(cx + dx AS cx, cy + dy AS cy))))"))
        .as("cell"))
      .select(col("vec_id"), col("embedding"), col("cell.cx").as("cx"), col("cell.cy").as("cy"))
    probes.as("a")
      .join(home.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"),
        col("b.vec_id").as("vb"),
        graft.functions.VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Candidate pairs the 3×3 grid probe would generate, computed from
    * the CELL HISTOGRAM only — tiny (≤ occupied-cell count squared per
    * probe window), never touches vectors. The applicability statistic
    * the adaptive near-dup operator plans from.
    */
  def gridImpliedCandidates(proj: DataFrame): Long = {
    val hist = proj.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
    val ordered = hist.as("a")
      .join(hist.as("b"),
        abs(col("a.cx") - col("b.cx")) <= 1 && abs(col("a.cy") - col("b.cy")) <= 1)
      .agg(coalesce(sum(col("a.n") * col("b.n")), lit(0L)).cast("long"))
      .head().getLong(0)
    val n = proj.count()
    (ordered - n) / 2 // drop self-pairs, halve the mirror
  }

  /** Near-dup pairs (va, vb, cos ≥ threshold) with the physical
    * strategy chosen FROM DATA STATISTICS — the AQE pattern applied to
    * blocking. The lossless PCA grid only thins when the top-2 axes
    * carry real variance (clustered / anisotropic corpora — which
    * near-dup-rich corpora are); on an ISOTROPIC corpus every
    * projection-, pivot-, or box-based lossless filter degenerates to
    * all-pairs (distance concentration — there is provably no lossless
    * sub-quadratic path), so the honest scale fallback is the linear
    * sign-LSH candidate generator with exact verification
    * (probabilistic recall, the documented q38 trade). The decision
    * statistic is the grid's own cell histogram: tiny, linear to
    * compute, and exact for the cost it predicts. Grid projections are
    * pinned before the histogram so the chosen branch never recomputes
    * the PCA.
    */
  def adaptiveNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      iters: Int = 6,
      budgetFactor: Double = 8.0,
      knownRows: Option[Long] = None): DataFrame = {
    val w = math.sqrt(2.0 * (1.0 - threshold))
    require(w <= 2.0 / 3,
      f"adaptive near-dup needs threshold >= 7/9 (got $threshold%.2f): below it the 3×3" +
        " probe cannot thin ANY corpus and grid applicability is moot")
    val normed = l2Normalized(corpus)
    val n = knownRows.getOrElse(corpus.count())
    val proj = gridCells(normed, w, iters).pinLineage() // the index artifact: N×3
    if (gridImpliedCandidates(proj) <= budgetFactor * n) gridPairs(normed, proj, threshold)
    else annNearDupPairs(corpus, threshold, cellBits(n))
  }
}
