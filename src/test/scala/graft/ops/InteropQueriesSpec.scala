package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InteropQueriesSpec extends SparkSpec {

  /** The parquet-direct digest both round-trips must reproduce. */
  private lazy val direct = Tables.orders(spark, sfDir)
    .groupBy("o_orderstatus")
    .agg(
      count(lit(1)).as("n"),
      Exact.dsum("o_totalprice").as("total"),
      max(col("o_orderdate").cast("date")).as("last_date"),
    )
    .orderBy("o_orderstatus")
    .collect().toSeq

  test("q71: CSV round-trip preserves counts, decimal-exact totals, and dates") {
    assert(InteropQueries.q71.run(spark, sfDir).collect().toSeq == direct)
  }

  test("q72: ORC round-trip preserves counts, decimal-exact totals, and dates") {
    assert(InteropQueries.q72.run(spark, sfDir).collect().toSeq == direct)
  }

  test("ORC reads keep column pruning (the property CSV structurally lacks)") {
    val src = Tables.orders(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_prune").toString
    src.write.mode("overwrite").orc(dir)
    val plan = spark.read.schema(src.schema).orc(dir)
      .select("o_orderstatus").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_orderstatus:string>"),
      s"ORC scan must prune to the projected column:\n$plan")
  }

  test("q153 reconciles generation-1 rows (no priority column) to 'unknown' losslessly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q153fix").toString
    Seq(
      (1L, 10.0, java.sql.Timestamp.valueOf("1994-06-01 00:00:00"), "1-URGENT"),
      (2L, 20.0, java.sql.Timestamp.valueOf("1994-07-01 00:00:00"), "5-LOW"),
      (3L, 30.0, java.sql.Timestamp.valueOf("1995-06-01 00:00:00"), "1-URGENT"),
      (4L, 40.0, java.sql.Timestamp.valueOf("1996-01-01 00:00:00"), "5-LOW"),
    ).toDF("o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val r = InteropQueries.q153.run(spark, dir).collect()
      .map(x => x.getAs[String]("pri") -> (x.getAs[Long]("n"), x.getAs[Double]("total"))).toMap
    // pre-1995 generation lacks the column entirely → 'unknown' carries
    // BOTH old rows; post-1995 rows keep their real priorities
    assert(r == Map(
      "unknown" -> (2L, 30.0), "1-URGENT" -> (1L, 30.0), "5-LOW" -> (1L, 40.0)))
  }

  test("q156 cross-format join equals the all-parquet plan row for row") {
    val direct = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_orders"), Exact.dsum("o_totalprice").as("total"))
      .orderBy("segment")
      .collect().toSeq
    assert(InteropQueries.q156.run(spark, sfDir).collect().toSeq == direct)
  }

  test("q179: bucketed join answer matches the plain join; plan has no shuffle under the join") {
    val plain = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), Exact.revenueExpr.as("revenue"))
      .orderBy("o_orderpriority")
      .collect().toSeq
    assert(InteropQueries.q179.run(spark, sfDir).collect().toSeq == plain)

    // with broadcast off, the bucketed fact-to-fact join must run with
    // ZERO exchanges — bucket co-location replaces both shuffles (the
    // property the layout investment buys)
    val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
  }

  test("q212: the listing read pushes TopN and plans only the 4 winning runs") {
    val out = InteropQueries.q212.run(spark, sfDir)
    val rows = out.collect()
    assert(rows.length <= 4 && rows.nonEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: ORDER BY logical_date DESC, customer_id ASC LIMIT 4"),
      s"the listing must ride the TopN pushdown:\n${plan.take(1200)}")
    // the landing wrote 12 sealed runs (2 customers × 6 months at this
    // sf); the seal record_counts must prune the scan to 4 input files
    def collectScans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectScans(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
      case other => other.children.flatMap(collectScans)
    }
    val scans = collectScans(out.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected the DSv2 scan in the plan")
    val planned = scans.head.scan.toBatch.planInputPartitions().length
    val full = graft.ops.Extraction.readSink(spark,
      InteropQueries.roundTripDir("jsonl_listing")).count()
    assert(full > 4, s"expected a full sink of runs, got $full rows")
    assert(planned == 4,
      s"TopN must open only the winning runs (planned $planned of $full)")
  }
}
