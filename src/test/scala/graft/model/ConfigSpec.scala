package graft.model

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ConfigSpec extends AnyFunSuite {

  private val yaml =
    """# reference-shaped config (config/google_apis.yaml)
      |source: google_ads
      |customer_ids: "123-456-7890, 234-567-8901"
      |lookback_days_daily: 2
      |catch_up_window_days: 35
      |default_currency: ${CURRENCY}
      |queries:
      |  - name: campaign_daily
      |    entity: campaign
      |    date_column: segments.date
      |    fields: campaign.id, segments.date, metrics.impressions, metrics.clicks
      |  - name: ad_group_daily
      |    entity: ad_group
      |    date_column: segments.date
      |    fields: ad_group.id, campaign.id, segments.date, metrics.conversions
      |""".stripMargin

  test("parses the reference config shape with ${VAR} interpolation") {
    val cfg = ConfigLoader.parse(yaml, Map("CURRENCY" -> "USD"))
    assert(cfg.name == "google_ads")
    assert(cfg.customerIds == Seq("123-456-7890", "234-567-8901"))
    assert(cfg.lookbackDaysDaily == 2 && cfg.catchUpWindowDays == 35)
    assert(cfg.defaultCurrency == "USD")
    assert(cfg.queries.map(_.name) == Seq("campaign_daily", "ad_group_daily"))
    assert(cfg.queryByName("campaign_daily").fields.head == "campaign.id")
  }

  test("undefined ${VAR} is an error, not silent empty") {
    val e = intercept[IllegalArgumentException](ConfigLoader.parse(yaml, Map.empty))
    assert(e.getMessage.contains("CURRENCY"))
  }

  test("missing required field names the field and context") {
    val bad = yaml.replace("    entity: campaign\n", "")
    val e = intercept[IllegalArgumentException](
      ConfigLoader.parse(bad, Map("CURRENCY" -> "USD")))
    assert(e.getMessage.contains("entity") && e.getMessage.contains("queries[0]"))
  }

  test("duplicate query names rejected; unknown query lookup names candidates") {
    val dup = yaml.replace("ad_group_daily", "campaign_daily")
    intercept[IllegalArgumentException](ConfigLoader.parse(dup, Map("CURRENCY" -> "USD")))
    val cfg = ConfigLoader.parse(yaml, Map("CURRENCY" -> "USD"))
    val e = intercept[IllegalArgumentException](cfg.queryByName("nope"))
    assert(e.getMessage.contains("campaign_daily"))
  }
}

/** Config → generated plan equals the hand-built pipeline (mirrors the
  * reference's tests/unit/test_config_loader.py + the S2/S3 compile).
  */
class ExtractionSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("compile: declared fields projected + flattened, BETWEEN inclusive, __query_name injected") {
    val src = Seq(
      (1L, "a", Date.valueOf("2024-01-01"), 10L),
      (2L, "b", Date.valueOf("2024-01-03"), 20L),
      (3L, "c", Date.valueOf("2024-01-05"), 30L),
    ).toDF("id", "name", "date", "clicks")
      .select(struct(col("id"), col("name")).as("campaign"), col("date"), col("clicks"))
    val q = QueryDefinition("campaign_daily", "campaign", "date", Seq("campaign.id", "date", "clicks"))
    val got = graft.ops.Extraction.compile(
      src, q, Date.valueOf("2024-01-01"), Date.valueOf("2024-01-03"))
    assert(got.columns.toSeq == Seq("campaign_id", "date", "clicks", "__query_name"))
    val rows = got.select("campaign_id", "__query_name").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "campaign_daily"), (2L, "campaign_daily"))) // 01-05 excluded, bounds inclusive
    // equals the hand-built pipeline
    val hand = src
      .where(col("date").between(lit(Date.valueOf("2024-01-01")), lit(Date.valueOf("2024-01-03"))))
      .select(col("campaign.id").as("campaign_id"), col("date"), col("clicks"),
        lit("campaign_daily").as("__query_name"))
    assert(got.collect().toSet == hand.collect().toSet)
  }

  test("dailyWindow: lookback re-extraction horizon") {
    val (s, e) = graft.ops.Extraction.dailyWindow(Date.valueOf("2024-01-10"), 2)
    assert(s == Date.valueOf("2024-01-08") && e == Date.valueOf("2024-01-10"))
  }
}
