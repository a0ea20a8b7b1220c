package graft.warehouse

import org.apache.spark.sql.functions._

import graft.ops.{InteropQueries, QuerySpec, Tables}

/** The warehouse fact tables SERVED THROUGH THE SESSION CATALOG —
  * `saveAsTable` partitioned by date, consumers on `spark.table` —
  * closing the loop on the reference's served schema
  * (gads-etl `database/schema/warehouse_tables.sql:1-23`): the facts
  * are not just parquet a job wrote, they are a catalog surface any
  * session can query by name with partition pruning on `date`.
  */
object CatalogQueries {

  // -----------------------------------------------------------------
  // q186 — catalog-served campaign daily fact: synthesize two
  // extraction runs from `orders` (run 2 re-extracts January 1995
  // with doubled engagement — the overlap/backfill shape), build the
  // PK-deduped fact with [[FactTables.campaignDaily]] (newest run per
  // (customer_id, campaign_id, date) grain wins), register it in the
  // session catalog partitioned by date, and report per-campaign
  // rollups READ BACK VIA `spark.table` — the full
  // payload → authority → catalog → serve path in one oracle-checked
  // query.
  //
  // Determinism: engagement metrics derive integer-exactly from
  // o_orderkey; money follows the house rule (decimal-exact sums,
  // DOUBLE on output); total ORDER BY campaign_id.
  //
  // Scale: the authority window and both aggregations key on subsets
  // of the grain (map-side combinable); the catalog write partitions
  // by date so a 100 TB fact serves date-ranged readers from pruned
  // slices, and run-2-style backfills land via
  // [[FactTables.replaceDatePartitions]] touching ONLY the
  // re-extracted dates.
  val q186: QuerySpec = QuerySpec(
    "q186_catalog_fact_serving",
    (s, d) => {
      val dec = "decimal(18,4)"
      // One serving YEAR of payload: extraction batches cover bounded
      // date windows (the reference pulls per-date GAQL slices), and
      // the write cost of a date-partitioned table is ∝ distinct dates
      // touched — a whole-history rewrite is the anti-pattern the
      // replace-by-partition machinery exists to avoid.
      val base = Tables.orders(s, d)
        .where(col("o_orderdate").cast("date")
          .between(lit("1995-01-01").cast("date"), lit("1995-12-31").cast("date")))
        .select(
          col("o_custkey").cast("string").as("customer_id"),
          col("o_orderpriority").as("campaign_id"),
          col("o_orderdate").cast("date").as("date"),
          (col("o_orderkey") % 1000).as("impressions"),
          (col("o_orderkey") % 100).as("clicks"),
          col("o_totalprice").cast(dec).as("conversions"),
          (col("o_totalprice").cast(dec) * 1000000).cast("long").as("cost_micros"))
      val run1 = base.withColumn("run_id", lit(1L))
      val run2 = base
        .where(col("date").between(lit("1995-01-01").cast("date"), lit("1995-01-31").cast("date")))
        .withColumn("impressions", col("impressions") * 2)
        .withColumn("clicks", col("clicks") * 2)
        .withColumn("run_id", lit(2L))
      val fact = FactTables.campaignDaily(run1.unionByName(run2))
      FactTables.registerPartitioned(
        fact, "graft_fact_campaign_daily",
        Some(s"${InteropQueries.roundTripDir("catalog_fact")}/campaign_daily"))
      s.table("graft_fact_campaign_daily")
        .groupBy("campaign_id")
        .agg(
          count(lit(1)).as("n_grain_rows"),
          countDistinct(col("date")).as("n_days"),
          sum("impressions").as("impressions"),
          sum("clicks").as("clicks"),
          sum(col("conversions")).cast("double").as("conversions"),
          sum("cost_micros").as("cost_micros"))
        .orderBy("campaign_id")
    },
    Some(
      "WITH base AS (SELECT CAST(o_custkey AS VARCHAR) AS customer_id, " +
        "o_orderpriority AS campaign_id, CAST(o_orderdate AS DATE) AS date, " +
        "o_orderkey % 1000 AS impressions, o_orderkey % 100 AS clicks, " +
        "CAST(o_totalprice AS DECIMAL(18,4)) AS conversions, " +
        "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 1000000 AS BIGINT) AS cost_micros " +
        "FROM orders WHERE CAST(o_orderdate AS DATE) " +
        "BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'), " +
        "pay AS (SELECT *, 1 AS run_id FROM base " +
        "UNION ALL SELECT customer_id, campaign_id, date, impressions * 2, " +
        "clicks * 2, conversions, cost_micros, 2 AS run_id FROM base " +
        "WHERE date BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'), " +
        "mx AS (SELECT *, max(run_id) OVER (PARTITION BY customer_id, campaign_id, date) AS mr " +
        "FROM pay), " +
        "fact AS (SELECT customer_id, campaign_id, date, " +
        "CAST(sum(impressions) AS BIGINT) AS impressions, " +
        "CAST(sum(clicks) AS BIGINT) AS clicks, " +
        "CAST(sum(conversions) AS DECIMAL(18,4)) AS conversions, " +
        "CAST(sum(cost_micros) AS BIGINT) AS cost_micros " +
        "FROM mx WHERE run_id = mr GROUP BY 1, 2, 3) " +
        "SELECT campaign_id, count(*) AS n_grain_rows, " +
        "count(DISTINCT date) AS n_days, " +
        "CAST(sum(impressions) AS BIGINT) AS impressions, " +
        "CAST(sum(clicks) AS BIGINT) AS clicks, " +
        "CAST(sum(conversions) AS DOUBLE) AS conversions, " +
        "CAST(sum(cost_micros) AS BIGINT) AS cost_micros " +
        "FROM fact GROUP BY 1 ORDER BY campaign_id"
    ),
  )

  // -----------------------------------------------------------------
  // q222 — bitemporal point-in-time reads: for every TRANSACTION-time
  // snapshot ("what we knew after run T") report every VALID-time
  // month's revenue — the two-axis time-travel query underneath audit
  // questions like "what did January look like before the restatement
  // landed". q11/D2 resolve the LATEST frontier only; this enumerates
  // historical frontiers: per (grain, tx) the authority is the max
  // run_id ≤ tx, so run 2's restated January is visible only from
  // tx = 2 while every other month reads identically from both
  // snapshots — the algebra a snapshot-isolated table format (or the
  // run-fenced sink's seal order, T5) implements physically.
  //
  // Scale: the tx-frontier axis is a 2-row broadcast (|snapshots| is
  // run-count-bounded); authority is one window over (grain, tx) —
  // the same exchange q186's single-frontier load pays, multiplied by
  // the snapshot count a backfill audit actually asks about, never by
  // history size. Money decimal-exact; all keys total-ordered.
  val q222: QuerySpec = QuerySpec(
    "q222_bitemporal_read",
    (s, d) => {
      val dec = "decimal(18,4)"
      val base = Tables.orders(s, d)
        .where(col("o_orderdate").cast("date")
          .between(lit("1995-01-01").cast("date"), lit("1995-12-31").cast("date")))
        .select(
          col("o_orderpriority").as("campaign_id"),
          col("o_orderdate").cast("date").as("date"),
          col("o_orderkey"),
          col("o_totalprice").cast(dec).as("rev"))
      val run1 = base.withColumn("run_id", lit(1L))
      val run2 = base
        .where(col("date").between(lit("1995-01-01").cast("date"), lit("1995-01-31").cast("date")))
        .withColumn("rev", col("rev") * 2)
        .withColumn("run_id", lit(2L))
      val log = run1.unionByName(run2)
      val tx = s.range(1, 3).select(col("id").as("tx"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("tx", "campaign_id", "date", "o_orderkey")
        .orderBy(col("run_id").desc)
      log.join(broadcast(tx), col("run_id") <= col("tx"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(col("tx"), col("campaign_id"),
          date_trunc("month", col("date")).cast("date").as("month"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy("tx", "campaign_id", "month")
    },
    Some(
      "WITH base AS (SELECT o_orderpriority AS campaign_id, CAST(o_orderdate AS DATE) AS date, " +
        "o_orderkey, CAST(o_totalprice AS DECIMAL(18,4)) AS rev FROM orders " +
        "WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'), " +
        "log AS (SELECT campaign_id, date, o_orderkey, rev, 1 AS run_id FROM base " +
        "UNION ALL SELECT campaign_id, date, o_orderkey, rev * 2, 2 FROM base " +
        "WHERE date BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'), " +
        "tx AS (SELECT unnest([1, 2]) AS tx), " +
        "vis AS (SELECT *, row_number() OVER (PARTITION BY tx, campaign_id, date, o_orderkey " +
        "ORDER BY run_id DESC) AS rn FROM log JOIN tx ON run_id <= tx) " +
        "SELECT CAST(tx AS BIGINT) AS tx, campaign_id, " +
        "CAST(date_trunc('month', date) AS DATE) AS month, count(*) AS n_rows, " +
        "CAST(sum(rev) AS DOUBLE) AS revenue " +
        "FROM vis WHERE rn = 1 GROUP BY 1, 2, 3 ORDER BY tx, campaign_id, month"
    ),
  )

  val all: Seq[QuerySpec] = Seq(q186, q222)
}
