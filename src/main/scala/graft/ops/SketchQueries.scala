package graft.ops

import org.apache.spark.sql.functions._

/** q119: mergeable-sketch cardinality — the aggregate family whose
  * 100 TB story is REAGGREGATION: a sketch built per partition / per
  * day / per source merges into any coarser grain without touching
  * raw data again, which exact distinct counts fundamentally cannot
  * (they must re-shuffle raw keys for every new grouping).
  *
  * Spark 4 ships Apache DataSketches natives (`hll_sketch_agg`,
  * `hll_union_agg`, `theta_*` — codegen'd aggregates, not UDFs), so
  * the operator is a declarative aggregate like any other: partials
  * are sketches, the exchange carries kilobytes per group, and the
  * merge is associative+commutative (order-independent ⇒
  * deterministic output, property-pinned in the spec alongside
  * accuracy vs exact and the union-of-daily-sketches = one-shot-
  * sketch mergeability identity; theta's set algebra additionally
  * estimates intersections — audience overlap — which HLL cannot).
  *
  * No DuckDB oracle by design (different sketch implementation ⇒
  * different estimates): registered rows-only, like q29/q31.
  */
object SketchQueries {
  import Tables._

  val q119: QuerySpec = QuerySpec(
    "q119_sketch_reach",
    (s, d) => {
      events(s, d)
        .select(col("event_type"), col("user_id"))
        .groupBy("event_type")
        .agg(
          hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("hll_users"),
          theta_sketch_estimate(theta_sketch_agg(col("user_id"))).as("theta_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type")
    },
    None, // sketch estimates are implementation-defined — rows-only; accuracy/merge/algebra pinned in SketchQueriesSpec
  )

  // ---------------------------------------------------------------------
  // q181 — mergeable quantile sketch (DataSketches KLL): per-group
  // approximate P50/P95/P99 of the price distribution. The REAGGREGATION
  // story q119 tells for cardinality, applied to quantiles: exact
  // percentiles (q49) must re-sort raw values for every new grouping,
  // while KLL partials merge into any coarser grain carrying kilobytes
  // — the only per-group-quantile design that survives 100 TB × many
  // grains. Spark 4's kll_* functions are codegen'd native aggregates
  // (no UDF); the exchange moves sketches, not values.
  //
  // No DuckDB oracle by design (sketch estimates are implementation-
  // defined): registered rows-only like q119/q29; the spec pins the
  // KLL rank-error contract against exact ranks (±3% ≫ the k=200
  // sketch's ~1.65% bound) and the merge identity (union of monthly
  // sketches ≈ one-shot sketch).
  val q181: QuerySpec = QuerySpec(
    "q181_kll_quantiles",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("kll_sketch_agg_double(l_extendedprice)").as("sk"),
          count(lit(1)).as("n_rows"))
        .select(
          col("l_returnflag"),
          col("n_rows"),
          expr("kll_sketch_get_quantile_double(sk, 0.5)").as("p50"),
          expr("kll_sketch_get_quantile_double(sk, 0.95)").as("p95"),
          expr("kll_sketch_get_quantile_double(sk, 0.99)").as("p99"))
        .orderBy("l_returnflag"),
    None, // sketch estimates are implementation-defined — rows-only; error/merge contracts pinned in SketchQueriesSpec
  )

  // ---------------------------------------------------------------------
  // q196 — mergeable frequency sketch (CountMin): the q119/q181
  // reaggregation story for POINT FREQUENCIES. Per-shard sketches
  // (the builtin codegen'd `count_min_sketch` aggregate — binary
  // partials, map-side combined) merge via [[graft.expressions
  // .SketchExpressions.cmsMergeAll]] into any coarser grain — and the
  // CMS merge is EXACT (counter arrays add), so the per-shard route
  // is bit-identical to a one-shot sketch, spec-pinned as equality
  // rather than approximation. Point queries answer from the KB
  // sketch without touching raw data ([[graft.expressions
  // .SketchExpressions.cmsEstimate]]); exact counts ride along for
  // the one-sided-error contract (est ≥ exact, overshoot ≤ ε·N).
  //
  // Scale: raw data is touched once by the sharded aggregate; the
  // merge and every estimate operate on sketch tables whose size is
  // per-group KB, independent of corpus scale. No DuckDB oracle by
  // design (hash-defined estimates): rows-only like q119, contracts
  // pinned in SketchQueriesSpec.
  val q196: QuerySpec = QuerySpec(
    "q196_cms_topk_freq",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.expressions.SketchExpressions
      val ev = events(s, d).select(col("event_type"), col("user_id"))
      val merged = ev
        .withColumn("shard", pmod(col("user_id"), lit(8)))
        .groupBy("event_type", "shard")
        .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("cms"))
        .groupBy("event_type")
        .agg(collect_list(col("cms")).as("sks"))
        .select(col("event_type"), SketchExpressions.cmsMergeAll(col("sks")).as("cms"))
      val top = ev
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("exact_n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(desc("exact_n"), asc("user_id"))))
        .where(col("rk") <= 3)
      top
        .join(merged, Seq("event_type"))
        .select(
          col("event_type"), col("user_id"), col("exact_n"),
          SketchExpressions.cmsEstimate(col("cms"), col("user_id")).as("est_n"))
        .orderBy("event_type", "user_id")
    },
    None, // hash-defined estimates — rows-only; one-sided error + exact-merge identity pinned in SketchQueriesSpec
  )

  // ---------------------------------------------------------------------
  // q209 — ROLLING reach: trailing 7-day distinct users per day, from
  // per-day HLL sketches unioned in a RANGE window — the
  // sketch-as-window-aggregate composition (q119's mergeability ×
  // q207's range frames). Exact rolling distincts must re-shuffle raw
  // user ids for EVERY window position (trailing-28 ⇒ 28 passes'
  // worth of work); the sketch form touches raw data once (per-day
  // sketches, map-side combined) and every window slides over KB
  // partials. This is THE design for "rolling reach" dashboards at
  // 100 TB — the raw pass is one scan, the window runs on
  // calendar-sized state.
  //
  // The unpartitioned ORDER BY window is the documented
  // bounded-frame exception (Ranks rule): it runs over the per-day
  // frame — calendar-sized, not data-sized. Exact counts ride along
  // (computed by a 7-day band join at test scale) so the spec can
  // pin the ±5% error contract; no-oracle (sketch estimates), like
  // q119/q196.
  val q209: QuerySpec = QuerySpec(
    "q209_rolling_reach",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d).select(
        unix_date(to_date(col("ts").cast("timestamp"))).cast("long").as("day"),
        col("user_id"))
      val daily = ev.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      val w = Window.orderBy("day").rangeBetween(-6, 0)
      val rolled = daily.select(
        col("day"),
        hll_sketch_estimate(hll_union_agg(col("sk")).over(w)).as("est_users"))
      val exact = ev.select(col("day").as("d2"), col("user_id")).distinct()
        .join(daily.select(col("day")),
          col("d2").between(col("day") - 6, col("day")))
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      rolled.join(exact, Seq("day"))
        .select(col("day"), col("est_users"), col("exact_users"))
        .orderBy("day")
    },
    None, // sketch estimates — rows-only; ±5% error vs the in-row exact pinned in SketchQueriesSpec
  )

  val all: Seq[QuerySpec] = Seq(q119, q181, q196, q209)
}
