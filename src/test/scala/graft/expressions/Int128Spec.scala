package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

/** The Int128 arithmetic is load-bearing for every fixed-point
  * similarity decision (thresholds, rankings, cos² values), so it is
  * pinned three ways: against BigInt on adversarial raw longs,
  * against the DECIMAL(38,0) SQL forms it replaced on real corpus
  * rows, and at the expression level for null/codegen behavior.
  */
class Int128Spec extends SparkSpec {
  import spark.implicits._

  private val edge = Array(Long.MinValue, Long.MinValue + 1, -2L, -1L, 0L, 1L, 2L,
    Long.MaxValue - 1, Long.MaxValue, 1L << 31, -(1L << 31), (1L << 62) + 3, 6400000000000000L)

  // deterministic adversarial stream: edges, full-range, and the
  // fixed-point envelope (|dot| ≲ 6.4e15) all interleaved
  private def longStream(rnd: scala.util.Random): Long = rnd.nextInt(4) match {
    case 0 => edge(rnd.nextInt(edge.length))
    case 1 => rnd.nextLong()
    case _ => rnd.between(-10000000000000000L, 10000000000000001L)
  }
  private def kStream(rnd: scala.util.Random): Long =
    if (rnd.nextInt(20) == 0) 0L else rnd.between(1L, 10001L)

  test("cmpProd3 equals the BigInt sign of a·b·k1 − c·d·k2 on adversarial longs") {
    val rnd = new scala.util.Random(128128L)
    for (_ <- 1 to 200000) {
      val (a, b, c, d) = (longStream(rnd), longStream(rnd), longStream(rnd), longStream(rnd))
      val (k1, k2) = (kStream(rnd), kStream(rnd))
      val exp = (BigInt(a) * BigInt(b) * BigInt(k1) - BigInt(c) * BigInt(d) * BigInt(k2)).signum
      assert(Int128.cmpProd3(a, b, k1, c, d, k2) == exp, s"cmpProd3($a,$b,$k1,$c,$d,$k2)")
    }
    assertThrows[IllegalArgumentException](Int128.cmpProd3(1L, 1L, -1L, 1L, 1L, 1L))
  }

  test("rankFp equals the BigInt (dot²·10⁴) div n wherever the quotient fits int64") {
    val rnd = new scala.util.Random(42042L)
    for (_ <- 1 to 100000) {
      val dot = if (rnd.nextBoolean()) rnd.between(-6400000000000000L, 6400000000000001L)
      else longStream(rnd)
      val n = if (rnd.nextBoolean()) rnd.between(1L, Long.MaxValue) else rnd.between(1L, 101L)
      val exp = BigInt(dot) * BigInt(dot) * 10000 / BigInt(n)
      if (exp.isValidLong) assert(Int128.rankFp(dot, n) == exp.toLong, s"rankFp($dot,$n)")
      else assertThrows[ArithmeticException](Int128.rankFp(dot, n))
    }
    assertThrows[ArithmeticException](Int128.rankFp(5L, 0L))
    assertThrows[ArithmeticException](Int128.rankFp(5L, -3L))
  }

  test("cos2Bp equals the BigInt (dot²·10⁴) div (na·nb) on dot/norm triples; throws loudly otherwise") {
    val rnd = new scala.util.Random(259260L)
    for (_ <- 1 to 20000) {
      // real triples: dot = x·y, na = x·x, nb = y·y over random int vectors
      val x = Array.fill(8)(rnd.between(-10000000L, 10000001L))
      val y = Array.fill(8)(rnd.between(-10000000L, 10000001L))
      val dot = x.zip(y).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
      val na = x.map(a => BigInt(a) * BigInt(a)).sum
      val nb = y.map(b => BigInt(b) * BigInt(b)).sum
      if (na > 0 && nb > 0) {
        val exp = dot * dot * 10000 / (na * nb)
        assert(Int128.cos2Bp(dot.toLong, na.toLong, nb.toLong) == exp.toLong,
          s"cos2Bp($dot,$na,$nb)")
      }
    }
    // exact-boundary triples: parallel vectors hit cos²·10⁴ = 10⁴ exactly
    assert(Int128.cos2Bp(25L, 25L, 25L) == 10000L)
    assert(Int128.cos2Bp(0L, 7L, 11L) == 0L)
    assertThrows[ArithmeticException](Int128.cos2Bp(1L, 0L, 5L)) // zero norm stays loud
    assertThrows[ArithmeticException](Int128.cos2Bp(10L, 1L, 1L)) // not a C-S triple
  }

  test("expression forms match the DECIMAL(38,0) SQL forms bit-for-bit on real corpus pairs") {
    val emb = graft.ops.Tables.embeddings(spark, sfDir)
    val fp = emb.select(col("vec_id"),
      VectorFunctions.quantizeFp(col("embedding"), 10000000L).as("q"))
    val pairs = fp.as("a").join(fp.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(20000)
      .select(
        VectorFunctions.dotLong(col("a.q"), col("b.q")).as("dot_fp"),
        VectorFunctions.dotLong(col("a.q"), col("a.q")).as("na"),
        VectorFunctions.dotLong(col("b.q"), col("b.q")).as("nb"))
    val checked = pairs.select(
      (VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), 25L, col("na"), col("nb"), 16L) >= 0)
        .as("t_new"),
      expr("cast(dot_fp as decimal(38,0)) * dot_fp * 25 >= cast(na as decimal(38,0)) * nb * 16")
        .as("t_dec"),
      VectorFunctions.cos2Bp(col("dot_fp"), col("na"), col("nb")).as("c_new"),
      expr("cast((cast(dot_fp as decimal(38,0)) * dot_fp * 10000) div " +
        "(cast(na as decimal(38,0)) * nb) as bigint)").as("c_dec"),
      VectorFunctions.rankFp(col("dot_fp"), col("na")).as("r_new"),
      expr("cast((cast(dot_fp as decimal(38,0)) * dot_fp * 10000) div na as bigint)").as("r_dec"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getBoolean(0) == r.getBoolean(1), "threshold filter diverged from decimal")
      assert(r.getLong(2) == r.getLong(3), "cos2_bp diverged from decimal")
      assert(r.getLong(4) == r.getLong(5), "rank_fp diverged from decimal")
    }
  }

  test("expressions are null-intolerant and exact under both codegen and interpretation") {
    val df = Seq(
      (Some(300L), Some(500L)),
      (None, Some(5L)),
      (Some(3L), None),
    ).toDF("d", "a")
    val out = df.select(
      VectorFunctions.prodCmp3(col("d"), col("d"), 25L, col("a"), col("a"), 16L).as("cmp"),
      VectorFunctions.cos2Bp(col("d"), col("a"), col("a")).as("c")).collect()
    assert(out(0).getInt(0) ==
      (BigInt(300) * 300 * 25 - BigInt(500) * 500 * 16).signum)
    assert(out(0).getLong(1) == (BigInt(300) * 300 * 10000 / (BigInt(500) * 500)).toLong)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }
}
