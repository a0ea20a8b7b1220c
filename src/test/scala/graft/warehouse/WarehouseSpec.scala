package graft.warehouse

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-plan reconcile tests mirroring the reference's
  * tests/unit/warehouse/test_loader.py:51-201, plus replace-by-partition
  * publish semantics and idempotency (warehouse_semantics.md:27-30).
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def states(rows: (String, String, String)*): DataFrame =
    rows.map { case (d, status, run) =>
      ("google_ads", "c1", "q", Date.valueOf(d), status, run, "v1")
    }.toDF("source", "customer_id", "query_name", "logical_date", "status",
      "current_run_id", "schema_version")

  private def pointers(rows: (String, String)*): DataFrame =
    rows.map { case (d, run) =>
      ("google_ads", "c1", "q", Date.valueOf(d), run, "v1",
        Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("source", "customer_id", "query_name", "logical_date", "run_id",
      "schema_version", "loaded_at")

  test("reconcile classifies load / replace / noop / demote (golden plan)") {
    val plan = Warehouse.reconcile(
      states(
        ("2024-01-01", "success", "r2"), // pointer at r1 → replace
        ("2024-01-02", "success", "r1"), // no pointer → load
        ("2024-01-03", "success", "r1"), // pointer current → noop
        ("2024-01-05", "failed", "r1"),  // failed: not publishable, pointer → demote
      ),
      pointers(
        ("2024-01-01", "r1"),
        ("2024-01-03", "r1"),
        ("2024-01-04", "r9"), // orphan pointer → demote
        ("2024-01-05", "r1"),
      ),
    )
    val got = plan.select("logical_date", "action").as[(Date, String)].collect().toMap
    assert(got == Map(
      Date.valueOf("2024-01-01") -> "replace",
      Date.valueOf("2024-01-02") -> "load",
      Date.valueOf("2024-01-03") -> "noop",
      Date.valueOf("2024-01-04") -> "demote",
      Date.valueOf("2024-01-05") -> "demote",
    ))
  }

  test("publish replaces exactly the planned logical partitions, never mixes runs") {
    val curated = Files.createTempDirectory("curated").toString
    def raw(d: String, run: String, vals: Seq[Int]): DataFrame =
      vals.map(v => ("google_ads", "c1", "q", Date.valueOf(d), run, v))
        .toDF("source", "customer_id", "query_name", "logical_date", "run_id", "metric")

    // initial publish: two partitions from r1
    val plan1 = Warehouse.reconcile(
      states(("2024-01-01", "success", "r1"), ("2024-01-02", "success", "r1")),
      pointers(),
    )
    val rows1 = raw("2024-01-01", "r1", Seq(1, 2)).unionByName(raw("2024-01-02", "r1", Seq(3)))
    Warehouse.publish(spark, plan1, rows1, curated)
    assert(spark.read.parquet(curated).count() == 3)

    // r2 supersedes only 01-01; 01-02 untouched
    val plan2 = Warehouse.reconcile(
      states(("2024-01-01", "success", "r2"), ("2024-01-02", "success", "r1")),
      pointers(("2024-01-01", "r1"), ("2024-01-02", "r1")),
    )
    val rows2 = rows1.unionByName(raw("2024-01-01", "r2", Seq(7, 8, 9)))
    Warehouse.publish(spark, plan2, rows2, curated)
    val after = spark.read.parquet(curated)
    assert(after.count() == 4) // 3 new rows for 01-01 + 1 untouched for 01-02
    val runsPerDate = after.groupBy("logical_date")
      .agg(collect_set("run_id").as("runs"))
      .as[(Date, Seq[String])].collect().toMap
    assert(runsPerDate(Date.valueOf("2024-01-01")) == Seq("r2"))
    assert(runsPerDate(Date.valueOf("2024-01-02")) == Seq("r1"))

    // idempotency: re-publishing the same plan yields identical content
    Warehouse.publish(spark, plan2, rows2, curated)
    assert(spark.read.parquet(curated).count() == 4)
  }

  test("nextPointers: upserts load/replace, deletes demote, keeps noop") {
    val plan = Warehouse.reconcile(
      states(("2024-01-01", "success", "r2"), ("2024-01-02", "success", "r1"),
        ("2024-01-03", "success", "r1")),
      pointers(("2024-01-01", "r1"), ("2024-01-03", "r1"), ("2024-01-04", "r9")),
    )
    val next = Warehouse.nextPointers(
      pointers(("2024-01-01", "r1"), ("2024-01-03", "r1"), ("2024-01-04", "r9")),
      plan,
      Timestamp.valueOf("2024-02-01 00:00:00"),
    )
    val got = next.select("logical_date", "run_id").as[(Date, String)].collect().toMap
    assert(got == Map(
      Date.valueOf("2024-01-01") -> "r2", // replaced
      Date.valueOf("2024-01-02") -> "r1", // loaded
      Date.valueOf("2024-01-03") -> "r1", // noop kept
      // 2024-01-04 demoted away
    ))
  }

  test("enforcePrimaryKey keeps one row per grain, newest run wins") {
    val df = Seq(
      ("c1", 100L, Date.valueOf("2024-01-01"), "r1", 10L),
      ("c1", 100L, Date.valueOf("2024-01-01"), "r2", 20L),
      ("c1", 200L, Date.valueOf("2024-01-01"), "r1", 30L),
    ).toDF("customer_id", "campaign_id", "date", "run_id", "impressions")
    val got = Warehouse
      .enforcePrimaryKey(df, Seq("customer_id", "campaign_id", "date"), "run_id")
      .select("campaign_id", "impressions").as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 20L, 200L -> 30L))
  }

  test("q222 bitemporal: snapshots differ exactly on the restated month, tx=2 doubles it") {
    val rows = CatalogQueries.q222.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("tx"), r.getAs[String]("campaign_id"),
        r.getAs[Date]("month").toString) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("revenue"))).toMap
    val keys = rows.keys.map { case (_, c, m) => (c, m) }.toSet
    assert(keys.nonEmpty)
    keys.foreach { case (c, m) =>
      val (n1, r1) = rows((1L, c, m))
      val (n2, r2) = rows((2L, c, m))
      assert(n1 == n2, s"($c,$m): restatement must not change row count")
      if (m == "1995-01-01")
        assert(math.abs(r2 - 2 * r1) < 1e-6, s"($c,$m): tx=2 must read the doubled restatement")
      else
        assert(r1 == r2, s"($c,$m): non-restated month differs between snapshots")
    }
  }
}
