package graft.ops

import org.apache.spark.sql.functions._

/** q87/q90: scale-mechanics operators — bloom-accelerated key-set
  * membership and robust (median/MAD) outlier detection.
  *
  * Both are extensions in the q39–q63 spirit: no reference counterpart
  * (the reference's membership gating is exact and driver-sized —
  * SURVEY.md E4/J3; its validation stops at count equality — A6), but
  * operators any engine running at 100 TB needs as first-class,
  * oracle-checked citizens.
  */
object ScaleQueries {
  import Exact._
  import Tables._

  // ---------------------------------------------------------------------
  // q87 — bloom-prefiltered semi-join: revenue of lineitems belonging
  // to urgent finished orders, with the fact side pre-filtered by a
  // bloom of the qualifying order keys before the exact semi-join
  // cleans the false positives ([[BloomJoin]]). The answer is
  // EXACTLY the plain semi-join's (the oracle is that plain SQL); what
  // changes is the plan: the codegen'd `might_contain` probe drops
  // ~93% of lineitem rows at the scan (1,000 of 15,000 orders
  // qualify), so the join exchange moves ~7% of the fact.
  //
  // Scale: THE pattern for "fact ⋉ big key set" when the key set
  // outgrows a broadcast hash relation but its bloom bits fit
  // anywhere: bloom build is a distributed treeAggregate over the key
  // side; probe volume is what the semi-join shuffle would have been,
  // shrunk to the match fraction + fpp. Spark's AQE/InjectRuntimeFilter
  // plants the same filter automatically only under specific shapes
  // and thresholds; the explicit operator makes the plan's economics a
  // contract, not an optimizer maybe.
  val q87: QuerySpec = QuerySpec(
    "q87_bloom_semi_join",
    (s, d) => {
      val keys = orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      // expectedItems from domain knowledge (~1/15 of orders qualify):
      // right-sizing keeps the filter bits — which ride in the plan and
      // every task binary — proportional to the real key count
      BloomJoin
        .bloomSemiJoin(lineitem(s, d), keys, "l_orderkey", "o_orderkey",
          expectedItems = 4096)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"), revenueExpr.as("revenue"))
        .orderBy("l_returnflag")
    },
    Some(
      "SELECT l_returnflag, count(*) AS n_items, " +
        s"$revenueSql AS revenue " +
        "FROM lineitem WHERE l_orderkey IN (" +
        "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F') " +
        "GROUP BY 1 ORDER BY l_returnflag"
    ),
  )

  // ---------------------------------------------------------------------
  // q90 — robust outlier detection: per order priority, the median and
  // MAD (median absolute deviation) of o_totalprice, and how many
  // orders sit beyond the standard robust z-score gate
  // |x − median| > 3 · 1.4826 · MAD (1.4826 = 1/Φ⁻¹(3/4), the
  // consistency constant that makes MAD estimate σ under normality).
  // Median/MAD is the outlier rule that doesn't break when the
  // outliers themselves poison the estimate — mean/stddev (q07's
  // moments) shift with every extreme row; the 50th percentile
  // doesn't.
  //
  // Determinism: both engines compute the exact linear-interpolation
  // median (Spark `percentile` ≡ DuckDB `quantile_cont`, the q49
  // anchor); the gate compares UNROUNDED doubles identically on both
  // sides, and reported medians round to 6dp (q49's rule).
  //
  // Scale: two grouped exact percentiles (per-group value buffers —
  // the q49 caveat: profiling-grade, with `ApproxOps.percentiles` as
  // the sketch-backed 100 TB twin) plus broadcast joins of the 5-row
  // stats frames back onto the fact — the fact is scanned three times
  // (median, MAD, gate) but never shuffled: every join side that
  // moves is ≤ one row per group. At 100 TB persist the deviation
  // frame once or switch both percentiles to the approx twin.
  val q90: QuerySpec = QuerySpec(
    "q90_mad_outliers",
    (s, d) => {
      val o = orders(s, d)
      val med = o.groupBy("o_orderpriority")
        .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
      val dev = o.join(broadcast(med), Seq("o_orderpriority"))
        .withColumn("adev", abs(col("o_totalprice") - col("med")))
      // per-priority MAD needs its own grouped percentile pass; the
      // 5-row stats frame then broadcasts back for the outlier gate
      val stats = dev.groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          first(col("med")).as("med_g"),
          expr("percentile(adev, 0.5)").as("mad_raw"),
        )
      dev
        .select("o_orderpriority", "adev")
        .join(broadcast(stats), Seq("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(
          first(col("n")).as("n"),
          round(first(col("med_g")), 6).as("median_price"),
          round(first(col("mad_raw")), 6).as("mad"),
          sum(when(col("adev") > lit(3 * 1.4826) * col("mad_raw"), 1L).otherwise(0L))
            .as("n_outliers"),
        )
        .orderBy("o_orderpriority")
    },
    Some(
      "WITH med AS (SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med " +
        "FROM orders GROUP BY 1), " +
        "dev AS (SELECT o.o_orderpriority, abs(o_totalprice - med) AS adev, med " +
        "FROM orders o JOIN med USING (o_orderpriority)), " +
        "mad AS (SELECT o_orderpriority, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1) " +
        "SELECT d.o_orderpriority, count(*) AS n, " +
        "round(any_value(d.med), 6) AS median_price, round(any_value(m.mad), 6) AS mad, " +
        "CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers " +
        "FROM dev d JOIN mad m USING (o_orderpriority) GROUP BY 1 ORDER BY d.o_orderpriority"
    ),
  )

  val all: Seq[QuerySpec] = Seq(q87, q90)
}
