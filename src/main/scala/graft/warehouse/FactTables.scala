package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.EtlFunctions

/** The serving schema (reference database/schema/warehouse_tables.sql:
  * fact_campaign_daily PK (customer_id, campaign_id, date);
  * fact_ad_group_daily PK (customer_id, ad_group_id, date)) as managed
  * Spark tables.
  *
  * PK enforcement is dedup-on-write (newest run wins,
  * [[Warehouse.enforcePrimaryKey]]) since Spark tables have no
  * constraint engine. Money lands as both micros (lossless int64,
  * the storage form) and currency decimal (the serving form, X8).
  *
  * Bucketing: both facts hash-bucket by `customer_id` so fact⋈fact and
  * fact⋈dim-by-customer joins co-locate — at 100 TB this removes the
  * dominant shuffle from every reconciliation/rollup join between the
  * two grains. The bucketed-join test proves the Exchange disappears.
  */
object FactTables {

  val CampaignGrain: Seq[String] = Seq("customer_id", "campaign_id", "date")
  val AdGroupGrain: Seq[String] = Seq("customer_id", "ad_group_id", "date")

  /** Build fact_campaign_daily rows from raw campaign-daily payloads
    * (columns: customer_id, campaign_id, date, impressions, clicks,
    * conversions, cost_micros, run_id). Re-aggregates on the grain
    * (A7: replace/re-extract overlap may land duplicate grain rows),
    * then PK-dedups keeping the newest run.
    */
  def campaignDaily(payload: DataFrame): DataFrame = {
    // Authority first, at run granularity: keep ALL rows of the newest
    // run per grain (a max-run filter, not a row dedup — a run may
    // legitimately land several rows per grain from split extraction
    // files), then re-aggregate those rows to the grain.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(CampaignGrain.map(col): _*)
    payload
      .withColumn("__max_run", max("run_id").over(w))
      .where(col("run_id") === col("__max_run"))
      .groupBy(CampaignGrain.map(col): _*)
      .agg(
        sum("impressions").as("impressions"),
        sum("clicks").as("clicks"),
        sum(col("conversions").cast("decimal(18,4)")).cast("decimal(18,4)").as("conversions"),
        sum("cost_micros").as("cost_micros"),
      )
      .withColumn("cost", EtlFunctions.microsToCurrency(col("cost_micros")))
  }

  /** Write a fact table bucketed on customer_id (co-located joins). */
  def writeBucketed(df: DataFrame, tableName: String, buckets: Int = 16): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, "customer_id")
      .sortBy("customer_id")
      .format("parquet")
      .saveAsTable(tableName)

  /** Join two same-bucketed facts on customer_id. With matching bucket
    * specs Spark plans a sort-merge join with NO shuffle exchange on
    * either side — the point of bucketing.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String): DataFrame =
    spark.table(left).as("l").join(spark.table(right).as("r"), Seq("customer_id"))
}
