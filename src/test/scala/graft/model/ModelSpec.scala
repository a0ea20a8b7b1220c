package graft.model

import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.EtlFunctions

class ModelSpec extends AnyFunSuite {

  test("RunContext mints ISO-8601 UTC millis; lexicographic == chronological") {
    val a = RunContext.mint(Instant.parse("2024-03-01T12:00:00.123456Z"))
    val b = RunContext.mint(Instant.parse("2024-03-01T12:00:00.124Z"))
    assert(a.runId == "2024-03-01T12:00:00.123Z")
    assert(a.runId < b.runId)
  }

  test("QueryDefinition snake_case + payload schema with __query_name") {
    assert(QueryDefinition.snakeCase("campaign.id") == "campaign_id")
    val q = QueryDefinition("campaign_daily", "campaign", "segments.date",
      Seq("campaign.id", "metrics.clicks"))
    val s = Schemas.payloadSchema(q)
    assert(s.fieldNames.toSeq == Seq("campaign_id", "metrics_clicks", "__query_name"))
  }
}

class EtlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, v: String): String =
    Seq(v).toDF("x").select(c.cast("string").as("r")).head().getString(0)

  test("normalizeCustomerId strips hyphens") {
    assert(one(EtlFunctions.normalizeCustomerId(col("x")), "123-456-7890") == "1234567890")
  }

  test("csvSplitTrim splits and trims") {
    val got = Seq("a, b ,c,,").toDF("x")
      .select(EtlFunctions.csvSplitTrim(col("x")).as("r"))
      .head().getAs[scala.collection.Seq[String]]("r").toList
    assert(got == List("a", "b", "c"))
  }

  test("isoMillis format round-trips") {
    val got = Seq(java.sql.Timestamp.valueOf("2024-03-01 12:00:00.123"))
      .toDF("x").select(EtlFunctions.isoMillis(col("x")).as("r")).head().getString(0)
    assert(got == "2024-03-01T12:00:00.123Z")
  }

  test("markTerminal is idempotent; isTerminal detects") {
    assert(one(EtlFunctions.markTerminal(col("x")), "boom") == "[terminal] boom")
    assert(one(EtlFunctions.markTerminal(col("x")), "[terminal] boom") == "[terminal] boom")
    val t = Seq(("[terminal] x"), ("plain")).toDF("x")
      .select(EtlFunctions.isTerminal(col("x")).as("r")).as[Boolean].collect().toSeq
    assert(t == Seq(true, false))
  }

  test("micros ↔ currency") {
    val micros = Seq(1234567L).toDF("x")
      .select(EtlFunctions.microsToCurrency(col("x")).cast("string").as("r")).head().getString(0)
    assert(micros == "1.2346" || micros == "1.2345") // 18,4 rounding
    val back = Seq(1.2345).toDF("x")
      .select(EtlFunctions.currencyToMicros(col("x")).as("r")).head().getLong(0)
    assert(back == 1234500L)
  }
}
