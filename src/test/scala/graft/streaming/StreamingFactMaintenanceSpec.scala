package graft.streaming

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class FactPayloadRow(
    customer_id: String, campaign_id: Long, date: java.sql.Date,
    impressions: Long, clicks: Long, conversions: Double, cost_micros: Long)

class StreamingFactMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def payload(rows: Seq[(String, Long, String, Long, Long, Double, Long)]): DataFrame =
    rows.toDF("customer_id", "campaign_id", "date_s", "impressions", "clicks",
      "conversions", "cost_micros")
      .withColumn("date", col("date_s").cast("date")).drop("date_s")

  private def snapshot(t: String): Map[(String, Long, String), (Long, Long, String)] = {
    // foreachBatch maintains the table from a CLONED session; a reader
    // session's relation cache holds the pre-replace file listing and
    // must refresh (standard cross-session Spark semantics — the same
    // instruction any external reader of a maintained table follows)
    spark.catalog.refreshTable(t)
    spark.table(t)
      .select("customer_id", "campaign_id", "date", "impressions", "clicks", "last_run_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString) ->
        (r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
  }

  test("batches fold under newest-run-wins; replay is idempotent; untouched dates never move") {
    val t = "graft_stream_fact"
    val dir = java.nio.file.Files.createTempDirectory("streamfact").toString
    try {
      // batch 0 creates the table: two dates, split rows of one grain sum
      StreamingFactMaintenance.maintainBatch(t, s"$dir/t")(payload(Seq(
        ("c1", 10L, "2024-03-01", 5L, 1L, 1.0, 100L),
        ("c1", 10L, "2024-03-01", 7L, 2L, 2.0, 200L), // same grain, same run: sums
        ("c2", 20L, "2024-03-02", 3L, 1L, 0.5, 50L),
      )), 0L)
      val after0 = snapshot(t)
      assert(after0(("c1", 10L, "2024-03-01")) == ((12L, 3L, "stream_000000000000")))
      assert(after0(("c2", 20L, "2024-03-02")) == ((3L, 1L, "stream_000000000000")))

      // batch 1: supersedes the (c1, 10, 03-01) grain and adds a new date
      val b1 = payload(Seq(
        ("c1", 10L, "2024-03-01", 100L, 9L, 9.0, 900L), // newer run wins the grain
        ("c3", 30L, "2024-03-03", 1L, 0L, 0.0, 10L),
      ))
      StreamingFactMaintenance.maintainBatch(t, s"$dir/t")(b1, 1L)
      val after1 = snapshot(t)
      assert(after1(("c1", 10L, "2024-03-01")) == ((100L, 9L, "stream_000000000001")))
      assert(after1(("c2", 20L, "2024-03-02")) == ((3L, 1L, "stream_000000000000")),
        "untouched date keeps its run")
      assert(after1(("c3", 30L, "2024-03-03")) == ((1L, 0L, "stream_000000000001")))

      // replay of batch 1 (foreachBatch crash contract): identical table
      StreamingFactMaintenance.maintainBatch(t, s"$dir/t")(b1, 1L)
      assert(snapshot(t) == after1, "replayed batch must not double-count")

      // empty batch: no-op
      StreamingFactMaintenance.maintainBatch(t, s"$dir/t")(b1.limit(0), 2L)
      assert(snapshot(t) == after1)

      // stream RESTART with a fresh checkpoint: batch ids reset to 0,
      // which sorts BELOW every stored id — arrival order must still
      // win (grain membership, not run-id string comparison)
      StreamingFactMaintenance.maintainBatch(t, s"$dir/t", "restart")(payload(Seq(
        ("c1", 10L, "2024-03-01", 55L, 5L, 5.0, 500L),
      )), 0L)
      val afterRestart = snapshot(t)
      assert(afterRestart(("c1", 10L, "2024-03-01")) == ((55L, 5L, "restart_000000000000")),
        "a fresh incarnation's data must replace stored grains, not be discarded")
      assert(afterRestart(("c2", 20L, "2024-03-02")) == after1(("c2", 20L, "2024-03-02")))
      assert(afterRestart(("c3", 30L, "2024-03-03")) == after1(("c3", 30L, "2024-03-03")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("toCatalogFact end to end: a live stream maintains the served table across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val t = "graft_stream_fact_live"
    val dir = java.nio.file.Files.createTempDirectory("streamfactlive").toString
    val in = MemoryStream[FactPayloadRow]
    val q = StreamingFactMaintenance
      .toCatalogFact(in.toDF(), t, s"$dir/t")
      .option("checkpointLocation", s"$dir/ck")
      .start()
    try {
      in.addData(
        FactPayloadRow("c1", 10L, java.sql.Date.valueOf("2024-04-01"), 5L, 1L, 1.0, 100L),
        FactPayloadRow("c1", 10L, java.sql.Date.valueOf("2024-04-01"), 7L, 2L, 2.0, 200L))
      q.processAllAvailable()
      assert(snapshot(t)(("c1", 10L, "2024-04-01"))._1 == 12L, "split rows of one batch sum")
      in.addData(
        FactPayloadRow("c1", 10L, java.sql.Date.valueOf("2024-04-01"), 50L, 5L, 5.0, 500L),
        FactPayloadRow("c2", 20L, java.sql.Date.valueOf("2024-04-02"), 3L, 1L, 0.5, 50L))
      q.processAllAvailable()
      val after = snapshot(t)
      assert(after(("c1", 10L, "2024-04-01"))._1 == 50L, "later trigger's grain replaces")
      assert(after(("c2", 20L, "2024-04-02"))._1 == 3L)
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
