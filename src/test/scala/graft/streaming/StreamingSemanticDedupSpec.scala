package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.llm.SimilarityPipeline

case class SemVec(vec_id: Long, embedding: Seq[Float])

class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.ops.Tables.embeddings(spark, sfDir)
  private lazy val vectors: Seq[SemVec] =
    emb.select("vec_id", "embedding").as[SemVec].collect().toSeq

  private lazy val cells: Int =
    math.max(2L, graft.ops.Exact.isqrtLong(vectors.length.toLong) / 2).toInt

  /** vec_quantize_fp's exact rule: round-half-away-from-zero on the
    * binary double of element·scale (math.round would be half-UP —
    * divergent on negative halves).
    */
  private def quant(x: Float): Long = {
    val p = x.toDouble * 10000000L
    val ap = math.abs(p)
    val f = math.floor(ap)
    val m = f.toLong + (if (ap - f >= 0.5d) 1L else 0L)
    if (p < 0) -m else m
  }

  /** The frozen quantizer = q259's own clustering (kmeansCentroidsFp at
    * the same sizing/iters), collected once — the "recluster
    * periodically, assign continuously" operating point.
    */
  private lazy val frozen: (StreamingSemanticDedup.FrozenQuantizer, Map[Long, Int]) = {
    val fp = emb.select(col("vec_id"),
      VectorFunctions.quantizeFp(col("embedding"), 10000000L).as("q"))
    val centsDf = SimilarityPipeline.kmeansCentroidsFp(fp, cells, iters = 2)
    val cents = centsDf.as[(Int, Seq[Long])].collect().toSeq
    val assignments = SimilarityPipeline.assignCellsFp(fp, centsDf)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    (new StreamingSemanticDedup.FrozenQuantizer(cents), assignments)
  }

  /** Batch truth: the intra-cell threshold pair set over the SAME
    * frozen assignment, recomputed with plain-Scala exact integers.
    */
  private lazy val batchPairs: Set[(Long, Long, Long, Long)] = {
    val byId = vectors.map(v => v.vec_id ->
      v.embedding.map(quant)).toMap
    val (_, assign) = frozen
    (for {
      grp <- assign.groupBy(_._2).toSeq
      ids = grp._2.keys.toSeq.sorted
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (byId(ids(i)), byId(ids(j)))
      d = a.zip(b).map { case (x, y) => x * y }.sum
      na = a.map(x => x * x).sum; nb = b.map(x => x * x).sum
      if d >= 0 && na > 0 && nb > 0 &&
        BigInt(d) * BigInt(d) * 100 >= BigInt(na) * BigInt(nb) * 9
    } yield (ids(i), ids(j), grp._1.toLong,
      (BigInt(d) * BigInt(d) * 10000 / (BigInt(na) * BigInt(nb))).toLong)).toSet
  }

  private def drive(slices: Seq[Seq[SemVec]], name: String): Seq[(Long, Long, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SemVec]
    val out = StreamingSemanticDedup.semanticDedupStream(
      in.toDF(), frozen._1, tNum = 3, tDen = 10)
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    slices.foreach { s => if (s.nonEmpty) { in.addData(s); q.processAllAvailable() } }
    q.stop()
    spark.table(name).as[(Long, Long, Long, Long)].collect().toSeq
  }

  test("stream assignment through the frozen quantizer equals assignCellsFp exactly") {
    val (quantizer, assign) = frozen
    val byId = vectors.map(v => v.vec_id ->
      v.embedding.map(quant)).toMap
    byId.foreach { case (id, q) =>
      assert(quantizer.cellOf(q) == assign(id), s"vector $id assigned to a different cell")
    }
  }

  test("semantic dedup ledger reproduces the batch pair set exactly — in-order arrival") {
    val got = drive(Seq(vectors), "ssd_inorder_t")
    assert(got.toSet == batchPairs, "pair ledger must equal the batch intra-cell threshold pairs")
    assert(got.length == got.distinct.length, "every pair exactly once")
    assert(got.nonEmpty)
  }

  test("ledger converges at scrambled arrival orders/slicings; min-witness reduction IS q259's manifest") {
    val rnd = new scala.util.Random(11)
    val scrambled = rnd.shuffle(vectors)
    val got = drive(scrambled.grouped((scrambled.size + 3) / 4).toSeq, "ssd_scram_t")
    assert(got.toSet == batchPairs)
    assert(got.length == got.distinct.length, "exactly-once at any order")
    // the stateless consumer reduction: min keeper per dropped vector
    // over the ledger == the batch drop manifest under the same frozen
    // clustering (semanticDedupFp with identical cells/iters — its
    // internal clustering IS the quantizer this spec froze)
    val manifest = SimilarityPipeline
      .semanticDedupFp(emb, cells = cells, tNum = 3, tDen = 10, iters = 2)
      .select("vec_id", "keeper").as[(Long, Long)].collect().toSet
    val reduced = got.groupBy(_._2).map { case (vb, g) => (vb, g.map(_._1).min) }.toSet
    assert(reduced == manifest,
      "min-witness reduction of the pair ledger must equal the batch drop manifest")
  }

  test("probed (two-level) frozen quantizer degenerates to flat under one coarse cell") {
    val (quantizer, _) = frozen
    val fp = emb.select(col("vec_id"),
      VectorFunctions.quantizeFp(col("embedding"), 10000000L).as("q"))
    val cents = SimilarityPipeline.kmeansCentroidsFp(fp, cells, iters = 2)
      .as[(Int, Seq[Long])].collect().toSeq
    // a single coarse centroid ⇒ every fine centroid lives in it ⇒
    // the probe must reproduce the flat argmax bit for bit
    val probed = new StreamingSemanticDedup.FrozenQuantizer(
      cents, coarse = Some(Seq(0 -> cents.head._2)))
    val byId = vectors.map(v => v.vec_id ->
      v.embedding.map(quant)).toMap
    byId.foreach { case (id, q) =>
      assert(probed.cellOf(q) == quantizer.cellOf(q), s"probe drift at vector $id")
    }
  }
}
