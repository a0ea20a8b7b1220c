package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over embedding columns, in three scale tiers:
  *
  *  1. [[bruteForceTopK]] — exact cosine against a handful of anchors
  *     (broadcast the anchors, one scan, per-partition heap). The
  *     baseline and the correctness oracle for the approximate tiers.
  *  2. [[ivfTopK]] / [[ivfNearDupPairs]] — IVF-style: a coarse
  *     quantizer assigns each vector to a cell (here the embeddings
  *     table's `label` column stands in for a k-means assignment);
  *     search touches only same-cell candidates. Recall is bounded by
  *     the quantizer (cross-cell neighbors are missed — the standard
  *     IVF nprobe=1 tradeoff); cost drops from O(N·Q) to
  *     O(N·Q / cells).
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
}
