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

  val all: Seq[QuerySpec] = Seq(q186)
}
