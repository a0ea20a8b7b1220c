package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact integer sqrt: the one-step correction over float sqrt must be
  * EXACT — it sits inside hash-matched fixed-point pipelines (q42's
  * centroid normalization), where an off-by-one at a perfect-square
  * boundary would silently desynchronize Spark from the DuckDB oracle.
  */
class ExactSpec extends SparkSpec {
  import spark.implicits._

  /** Reference isqrt via BigInt bisection-free Newton (independent of
    * any float path).
    */
  private def refIsqrt(n: Long): Long = {
    if (n < 2) return n
    val big = BigInt(n)
    var x = big
    var y = (x + 1) / 2
    while (y < x) { x = y; y = (x + big / x) / 2 }
    x.toLong
  }

  // boundary-adversarial inputs: perfect squares and their neighbors
  // across the whole q42 domain (n2 ≤ 64·10¹⁴), plus tiny edge cases
  private val cases: Seq[Long] = {
    val roots = Seq(1L, 2L, 3L, 10L, 999L, 1000L, 31623L, 1000000L,
      12345678L, 79999999L, 80000000L)
    Seq(0L, 1L, 2L, 3L, 5L, 8L) ++
      roots.flatMap(r => Seq(r * r - 1, r * r, r * r + 1)) ++
      Seq((1L << 53) - 1, 6400000000000000L)
  }

  test("isqrtLong equals the BigInt reference on perfect-square boundaries") {
    cases.filter(_ >= 0).foreach { n =>
      assert(Exact.isqrtLong(n) == refIsqrt(n), s"isqrtLong($n)")
    }
  }

  test("isqrt Column form equals isqrtLong over the boundary sweep") {
    val df = cases.filter(_ >= 0).toDF("n")
    val got = df.select(col("n"), Exact.isqrt(col("n")).as("r"))
      .as[(Long, Long)].collect().toMap
    cases.filter(_ >= 0).foreach { n =>
      assert(got(n) == Exact.isqrtLong(n), s"isqrt Column($n)")
    }
  }

  test("isqrtSql correction matches — the mirrored CASE is the same function") {
    // evaluate the DuckDB-targeted SQL text through Spark's parser: the
    // expression uses only ANSI pieces both engines share (CASE, CAST,
    // floor, sqrt, integer compares), so Spark can execute it verbatim
    val sql = Exact.isqrtSql("n")
    val df = cases.filter(_ >= 0).toDF("n")
    val got = df.selectExpr("n", s"$sql AS r").as[(Long, Long)].collect().toMap
    cases.filter(_ >= 0).foreach { n =>
      assert(got(n) == Exact.isqrtLong(n), s"isqrtSql($n)")
    }
  }

  test("quantizeFp + dotLong compose to dotFp exactly") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val s = 10000000L
    val pairs = emb.select(col("vec_id").as("va"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("vb"), col("embedding").as("eb")))
      .where(col("va") < col("vb"))
    import graft.functions.VectorFunctions._
    val diffs = pairs.select(
      (dotLong(quantizeFp(col("ea"), s), quantizeFp(col("eb"), s)) -
        dotFp(col("ea"), col("eb"), s)).as("d"))
      .where(col("d") =!= 0L)
    assert(diffs.isEmpty, "materialized quantization diverged from dotFp")
  }
}
