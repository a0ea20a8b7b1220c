package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list by iterated min-label
  * propagation — the step that turns near-duplicate PAIRS (q30/q41/q38
  * output) into dedup CLUSTERS so a pipeline can keep one canonical
  * document per cluster. Spark has no built-in graph operator surface
  * in SQL; this is the DataFrame-native form:
  *
  *  - every vertex starts labeled with itself;
  *  - each round, labels flow across edges and each vertex keeps the
  *    MINIMUM label seen (one join + one map-side-combined groupBy);
  *  - stop when a round changes nothing.
  *
  * Rounds needed ≈ the min-vertex's eccentricity (~component
  * diameter: the min label walks one hop per round) — dedup clusters
  * are short-diameter (near-dup similarity is transitive-ish), so
  * this converges in a handful of rounds. The driver only runs the
  * loop and a 1-row convergence probe per round; all data stays
  * distributed. Each round `localCheckpoint`s the label frame: without
  * it the plan lineage doubles per iteration and planning time, not
  * data, becomes the bottleneck (the iterative-algorithm analog of the
  * q41 cascade's materialization barrier).
  *
  * At larger diameters the classic large-star/small-star alternation
  * (Kiveris et al., "Connected Components in MapReduce and Beyond")
  * brings rounds down to O(log² n); the propagation core below is
  * unchanged.
  */
object Components {

  /** @return (v, comp) — comp is the minimum vertex id in v's component.
    *         Vertices not in `edges` don't appear (callers union-in
    *         singletons if they need them).
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
  ): DataFrame = {
    // undirected: propagate both ways
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .localCheckpoint(eager = true) // edges are re-joined every round
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("comp", col("v"))
      .localCheckpoint(eager = true)
    var round = 0
    var done = false
    while (!done && round < maxIter) {
      val prop = sym.join(labels, col("a") === col("v"))
        .select(col("b").as("v"), col("comp"))
        .union(labels.select(col("v"), col("comp")))
        .groupBy("v").agg(min(col("comp")).as("comp"))
        .localCheckpoint(eager = true)
      val changed = prop
        .join(labels.select(col("v"), col("comp").as("prev")), "v")
        .where(col("comp") =!= col("prev"))
        .limit(1).count()
      labels = prop
      done = changed == 0L
      round += 1
    }
    require(done, s"connectedComponents did not converge in $maxIter rounds " +
      "(diameter larger than expected — raise maxIter or switch to star contraction)")
    labels
  }
}
