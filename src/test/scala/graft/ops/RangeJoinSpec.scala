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

  test("plans as an equijoin, not a nested-loop/cartesian product") {
    val out = RangeJoin.bucketedRangeJoin(
      points, intervals, Seq("user_id"), "ts", "start", "end", bucketWidth = 100L)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must bucket into an equijoin:\n$plan")
  }
}
