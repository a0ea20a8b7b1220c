package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilarityPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.ops.Tables.embeddings(spark, sfDir)

  test("bruteForceTopK returns k rows per query, scores descending, no self-match") {
    val out = SimilarityPipeline.bruteForceTopK(emb, emb.where(col("vec_id") < 3), 5)
    val rows = out.as[(Long, Long, Double)].collect()
    assert(rows.length == 15)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val scores = g.sortBy(r => (-r._3, r._2)).map(_._3)
      assert(scores.sorted.reverse.toSeq == scores.toSeq)
    }
    assert(rows.forall(r => r._1 != r._2))
  }

  test("ivfTopK ⊆ bruteForceTopK candidates and agrees on same-cell neighbors") {
    val queries = emb.where(col("vec_id") < 5)
    val ivf = SimilarityPipeline.ivfTopK(emb, queries, 3)
      .as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    // every IVF neighbor must share the query's cell
    val cells = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(ivf.forall { case (q, v, _) => cells(q) == cells(v) })
    // scores must match brute force exactly for the same pairs
    val bf = SimilarityPipeline.bruteForceTopK(emb, queries, 500)
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, s) => (q, v) -> s }.toMap
    assert(ivf.forall { case (q, v, s) => math.abs(bf((q, v)) - s) < 1e-9 })
  }

  test("ivfNearDupPairs matches HOF cosine within fp tolerance and threshold") {
    val pairs = SimilarityPipeline.ivfNearDupPairs(emb, 0.4)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(_._3 >= 0.4))
    // cross-check a few pairs against the HOF cosine
    val sample = pairs.take(5)
    if (sample.nonEmpty) {
      val ids = sample.flatMap(p => Seq(p._1, p._2)).toSet.toSeq
      val vecs = emb.where(col("vec_id").isin(ids: _*))
        .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
      sample.foreach { case (a, b, c) =>
        val (va, vb) = (vecs(a), vecs(b))
        val dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val exact = dot / (math.sqrt(va.map(x => x.toDouble * x.toDouble).sum) *
          math.sqrt(vb.map(x => x.toDouble * x.toDouble).sum))
        assert(math.abs(exact - c) < 1e-6, s"pair ($a,$b): $exact vs $c")
      }
    }
  }
}
