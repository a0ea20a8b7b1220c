package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.functions.VectorFunctions

/** Parity + overflow pins for the one-pass PCA aggregates: they must
  * reproduce the r9 explode-based forms' integers BIT FOR BIT (the
  * q202/q224 oracles replay those integers), and the scatter cells must
  * stay exact PAST int64 — the whole reason they accumulate in int128.
  */
class VectorAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.ops.Tables.embeddings(spark, sfDir)
  private lazy val fp = emb.select(
    col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), 10000000L).as("q"))

  test("vec_sum_long matches the explode->groupBy sums bit-for-bit on real embeddings") {
    val viaAgg = fp.agg(VectorFunctions.vecSumLong(col("q")))
      .head().getSeq[Long](0)
    val viaExplode = fp.select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy("i").agg(sum("x").as("s"))
      .orderBy("i").as[(Int, Long)].collect().map(_._2).toSeq
    assert(viaAgg == viaExplode)
  }

  test("scatter_matrix matches the double-posexplode DECIMAL scatter bit-for-bit") {
    val dec38 = DecimalType(38, 0)
    val c = fp.limit(100).select(col("q").as("c"))
    val viaAgg = c.agg(VectorFunctions.scatterMatrix(col("c")))
      .head().getSeq[java.math.BigDecimal](0)
    val dim = math.sqrt(viaAgg.length.toDouble).round.toInt
    val viaExplode = c
      .select(col("c"), posexplode(col("c")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("c")).as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg(sum((col("xi") * col("xj")).cast(dec38)).as("a0"))
      .as[(Int, Int, java.math.BigDecimal)].collect()
    assert(viaExplode.length == viaAgg.length)
    viaExplode.foreach { case (i, j, v) =>
      assert(v.compareTo(viaAgg(i * dim + j)) == 0, s"scatter cell ($i,$j) diverged")
    }
  }

  test("scatter_matrix stays exact past int64: the int128 carry path vs BigInt") {
    // products of ±2e7 components are 4e14; 30k rows push a cell past
    // 1.2e19 > Long.MaxValue — a wrapping accumulator would go negative
    val big = 20000000L
    val rows = (0 until 30000).map { k =>
      (k.toLong, Seq(big, -big, if (k % 2 == 0) big else -big))
    }
    val df = rows.toDF("vec_id", "q")
    val got = df.agg(VectorFunctions.scatterMatrix(col("q")))
      .head().getSeq[java.math.BigDecimal](0)
    val ref = Array.fill(3, 3)(BigInt(0))
    rows.foreach { case (_, v) =>
      for (i <- 0 until 3; j <- 0 until 3)
        ref(i)(j) += BigInt(v(i)) * BigInt(v(j))
    }
    assert(ref(0)(0) > BigInt(Long.MaxValue), "fixture must actually exceed int64")
    for (i <- 0 until 3; j <- 0 until 3)
      assert(BigInt(got(i * 3 + j).toBigInteger) == ref(i)(j), s"cell ($i,$j)")
  }

  test("vec_sum_long survives int64-boundary partials across partition merges") {
    // per-partition partials near Long.MaxValue/2 must merge exactly
    // (addExact would throw on a true overflow rather than wrap)
    val df = spark.range(0, 8, 1, 4)
      .select(array(lit(Long.MaxValue / 16), lit(-Long.MaxValue / 16)).as("q"))
    val s = df.agg(VectorFunctions.vecSumLong(col("q"))).head().getSeq[Long](0)
    assert(s == Seq(8L * (Long.MaxValue / 16), -8L * (Long.MaxValue / 16)))
  }

  test("empty input yields empty arrays; length drift and null elements throw") {
    val empty = fp.where(lit(false))
    assert(empty.agg(VectorFunctions.vecSumLong(col("q"))).head().getSeq[Long](0).isEmpty)
    assert(empty.agg(VectorFunctions.scatterMatrix(col("q")))
      .head().getSeq[java.math.BigDecimal](0).isEmpty)
    val drift = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("q")
    val e1 = intercept[Exception] {
      drift.agg(VectorFunctions.vecSumLong(col("q"))).head()
    }
    assert(e1.getMessage.contains("length changed") ||
      Option(e1.getCause).exists(_.getMessage.contains("length changed")))
    val withNull = spark.sql(
      "SELECT array(1L, CAST(NULL AS BIGINT)) AS q UNION ALL SELECT array(2L, 3L)")
    val e2 = intercept[Exception] {
      withNull.agg(VectorFunctions.scatterMatrix(col("q"))).head()
    }
    assert(e2.getMessage.contains("null element") ||
      Option(e2.getCause).exists(_.getMessage.contains("null element")))
  }

  test("topTwoAxesFp over the aggregates is deterministic and projections match the registered q202 oracle shape") {
    // the axes' alignment/order pins live in SimilarityPipelineSpec;
    // here: two invocations agree (oracle replay depends on it)
    val a1 = graft.llm.SimilarityPipeline.topTwoAxesFp(fp, iters = 4)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    val a2 = graft.llm.SimilarityPipeline.topTwoAxesFp(fp, iters = 4)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a1 == a2 && a1.nonEmpty)
  }
}
