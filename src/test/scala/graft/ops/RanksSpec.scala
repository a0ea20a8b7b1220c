package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RanksSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random frame: (id, v) with heavy value ties
  private def frame(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 2654435761L % 97) % 13)).toDF("id", "v")

  test("withGlobalRank equals the unpartitioned row_number on a total order") {
    val df = frame(500)
    val got = Ranks
      .withGlobalRank(df, Seq(col("v"), col("id")), "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rk", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("withGlobalRank respects descending orders") {
    val df = frame(101)
    val got = Ranks
      .withGlobalRank(df, Seq(col("v").desc, col("id")), "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rk", row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("withGlobalPrefixSum equals the unpartitioned running sum and rank") {
    val df = frame(400)
    val got = Ranks
      .withGlobalPrefixSum(df, Seq(col("v"), col("id")), col("v"), "rk", "ps")
      .select("id", "rk", "ps").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val w = Window.orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("ps", sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "rk", "ps").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == want)
  }

  test("ntileFromRank reproduces SQL ntile for every (n, k) shape including n < k") {
    for (n <- Seq(1, 3, 4, 5, 17, 100); k <- Seq(2, 4, 7)) {
      val df = frame(n)
      val got = Ranks
        .withGlobalRank(df, Seq(col("v"), col("id")), "rk")
        .crossJoin(df.agg(count(lit(1)).as("__n")))
        .select(col("id"), Ranks.ntileFromRank(col("rk"), col("__n"), k).as("b"))
        .as[(Long, Long)].collect().toMap
      val want = df
        .withColumn("b", ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "b").as[(Long, Long)].collect().toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("the ranked frame's sorts stay partitioned (no data-sized single-task sort)") {
    // the range exchange happens at localCheckpoint materialization (it
    // is lineage-truncated out of the downstream plan); what the
    // downstream plan must show is (a) the rank window partitioned by
    // __pid — parallel across range partitions — and (b) exactly one
    // SinglePartition exchange, the P-row partition-count prefix sum
    // (bounded by config, not data)
    val plan = Ranks
      .withGlobalRank(frame(500), Seq(col("v"), col("id")), "rk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid#"), s"rank window must partition by pid:\n$plan")
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singles == 1, s"expected exactly the P-row offsets SinglePartition, got $singles:\n$plan")
  }
}
