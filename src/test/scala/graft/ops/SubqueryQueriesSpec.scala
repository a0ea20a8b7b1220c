package graft.ops

import org.apache.spark.sql.execution.FormattedMode

import graft.SparkSpec

/** Plan-shape pins for the subquery family: the VALUE of q112–q118 is
  * that the declared subquery semantics compile to the decorrelated /
  * semi / anti / broadcast plans a hand-optimized rewrite would
  * produce — so the shapes themselves are regression-tested, not just
  * the answers (those are oracle-hashed by the driver).
  */
class SubqueryQueriesSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  test("q112: the correlated scalar subquery decorrelates — no per-row re-execution survives") {
    val p = plan("q112_small_quantity_revenue")
    // decorrelation leaves ONE aggregate over lineitem joined back;
    // a surviving correlated subquery would print a Subquery node
    // re-planned under a Filter
    assert(!p.contains("InSubquery") && !p.contains("ScalarSubquery"),
      s"correlated subquery must be rewritten into a join:\n$p")
    assert(p.contains("avg("), "the per-part average aggregate must exist exactly once")
  }

  test("q113: EXISTS compiles to LeftSemi with the lag residual, never a nested loop over pairs") {
    val p = plan("q113_priority_late_orders")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(!p.contains("CartesianProduct"), "no all-pairs anywhere")
  }

  test("q115: NOT EXISTS compiles to LeftAnti; the average anchor joins as a 1-row broadcast") {
    val p = plan("q115_inactive_above_avg")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row average must broadcast, not shuffle")
  }

  test("q116: the revenue max re-enters as a broadcast, and no CartesianProduct appears") {
    val p = plan("q116_top_supplier_revenue")
    assert(p.contains("BroadcastExchange"), s"the 1-row max must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), "no all-pairs anywhere")
  }

  test("q110/q113/q114: no query in the subquery family plans a CartesianProduct") {
    Seq("q110_basket_affinity", "q114_large_volume_orders", "q118_gap_fill_interpolate")
      .foreach { n =>
        assert(!plan(n).contains("CartesianProduct"), s"$n must not plan a cartesian product")
      }
  }

  test("q138: NOT IN plants the single-column null-aware anti join, not a plain LeftAnti") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val df = Registry.byName("q138_parts_no_distressed_supplier").run(spark, sfDir)
    val physical = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val naaj = physical.collect {
      case b: BroadcastHashJoinExec if b.isNullAwareAntiJoin => b
    }
    assert(naaj.nonEmpty,
      s"NOT IN must compile to the null-aware anti join (three-valued semantics):\n$physical")
  }
}
