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

  val all: Seq[QuerySpec] = Seq(q119)
}
