package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 10L, "p10"), (1L, 100L, "p100"), (1L, 199L, "p199"), (1L, 200L, "p200"),
    (2L, 100L, "q100"),
  ).toDF("user_id", "ts", "tag")

  private val intervals = Seq(
    (1L, 100L, 200L, "iA"), // [100, 200): contains p100, p199; NOT p200 (exclusive end)
    (1L, 150L, 450L, "iB"), // crosses bucket boundaries; contains p199, p200
    (2L, 0L, 50L, "iC"), // q100 outside
  ).toDF("user_id", "start", "end", "iv")

  test("bucketed range join matches exact containment incl. boundary semantics") {
    val out = RangeJoin.bucketedRangeJoin(
      points, intervals, Seq("user_id"), "ts", "start", "end", bucketWidth = 100L)
      .select("tag", "iv").as[(String, String)].collect().toSet
    assert(out == Set(("p100", "iA"), ("p199", "iA"), ("p199", "iB"), ("p200", "iB")))
  }

  test("no duplicate pairs when an interval spans many buckets") {
    val out = RangeJoin.bucketedRangeJoin(
      points, intervals, Seq("user_id"), "ts", "start", "end", bucketWidth = 10L)
      .select("tag", "iv").as[(String, String)].collect().toSeq
    assert(out.size == out.distinct.size)
    assert(out.toSet == Set(("p100", "iA"), ("p199", "iA"), ("p199", "iB"), ("p200", "iB")))
  }

  test("empty and inverted intervals produce no pairs (and no descending bucket explosion)") {
    val bad = Seq(
      (1L, 100L, 100L, "empty"), // [t, t)
      (1L, 500L, 0L, "inverted"), // end << start
    ).toDF("user_id", "start", "end", "iv")
    val out = RangeJoin.bucketedRangeJoin(
      points, bad, Seq("user_id"), "ts", "start", "end", bucketWidth = 10L)
    assert(out.count() == 0)
  }

  test("bucket math is exact beyond double precision (nanosecond-epoch magnitudes)") {
    // 2^53-scale values: double division would mis-bucket by ±256ns
    val base = 1700000000000000000L // ~1.7e18
    val pts = Seq((1L, base + 999L, "p")).toDF("user_id", "ts", "tag")
    val ivs = Seq((1L, base + 990L, base + 1000L, "i")).toDF("user_id", "start", "end", "iv")
    val out = RangeJoin.bucketedRangeJoin(
      pts, ivs, Seq("user_id"), "ts", "start", "end", bucketWidth = 1000L)
      .select("tag", "iv").as[(String, String)].collect().toSeq
    assert(out == Seq(("p", "i")))
  }

  test("plans as an equijoin, not a nested-loop/cartesian product") {
    val out = RangeJoin.bucketedRangeJoin(
      points, intervals, Seq("user_id"), "ts", "start", "end", bucketWidth = 100L)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must bucket into an equijoin:\n$plan")
  }
}
