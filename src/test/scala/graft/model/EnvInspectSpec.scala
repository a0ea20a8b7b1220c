package graft.model

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import graft.SparkSpec

class EnvInspectSpec extends SparkSpec {
  import spark.implicits._

  test(".env loading: comments, export prefix, quotes; real env wins on merge") {
    val f = Files.createTempFile("graft", ".env")
    Files.writeString(f,
      """# raw sink settings
        |RAW_SINK_ROOT=/data/raw
        |export API_VERSION=v17
        |QUOTED="hello world"
        |SINGLE='a=b'
        |
        |BAD LINE WITHOUT EQUALS IS SKIPPED? no equals no parse
        |""".stripMargin)
    val env = ConfigLoader.loadEnvFile(f)
    assert(env == Map(
      "RAW_SINK_ROOT" -> "/data/raw",
      "API_VERSION" -> "v17",
      "QUOTED" -> "hello world",
      "SINGLE" -> "a=b", // single-quoted value containing '='
    ))
    // merge: the real environment overrides the file
    val merged = ConfigLoader.envWithFile(f, Map("RAW_SINK_ROOT" -> "/override"))
    assert(merged("RAW_SINK_ROOT") == "/override" && merged("API_VERSION") == "v17")
    // interpolation through the merged env
    assert(ConfigLoader.interpolate("${RAW_SINK_ROOT}/payload", merged) == "/override/payload")
    // missing file is an actionable error (reference env.py:9-14)
    val e = intercept[IllegalArgumentException](
      ConfigLoader.loadEnvFile(java.nio.file.Paths.get("/nope/.env")))
    assert(e.getMessage.contains(".env"))
  }

  test("requiredEnv reports ALL missing prefixed keys in one error (client setup contract)") {
    val env = Map("GOOGLE_ADS_DEVELOPER_TOKEN" -> "t", "GOOGLE_ADS_CLIENT_ID" -> "id")
    val fields = Seq("DEVELOPER_TOKEN", "CLIENT_ID", "CLIENT_SECRET", "REFRESH_TOKEN")
    val e = intercept[IllegalArgumentException](
      ConfigLoader.requiredEnv("google_ads", fields, env))
    assert(e.getMessage.contains("GOOGLE_ADS_CLIENT_SECRET") &&
      e.getMessage.contains("GOOGLE_ADS_REFRESH_TOKEN"))
    val ok = ConfigLoader.requiredEnv("google_ads", Seq("DEVELOPER_TOKEN"), env)
    assert(ok == Map("DEVELOPER_TOKEN" -> "t"))
  }

  private def states = Seq(
    ("google_ads", "c1", "campaign_daily", Date.valueOf("2024-01-01"), "success",
      "r1", "v1", 42L, Timestamp.valueOf("2024-01-02 03:04:05"), null: String, 1L),
    ("google_ads", "c2", "campaign_daily", Date.valueOf("2024-01-01"), "pending",
      null: String, "v1", 0L, Timestamp.valueOf("2024-01-02 03:04:06"), null: String, 0L),
  ).toDF("source", "customer_id", "query_name", "logical_date", "status",
    "current_run_id", "schema_version", "record_count", "updated_at",
    "error_message", "attempt_count")

  test("formatStates: plain aligned table with '-' for null run ids; json array; empty message") {
    val table = graft.tools.Inspect.formatStates(states)
    val lines = table.split("\n")
    assert(lines.head.startsWith("source") && lines.head.contains("updated_at"))
    assert(lines.length == 3)
    assert(lines(2).contains("pending") && lines(2).contains("-"))
    // all rows align: header columns start at the same offsets
    assert(lines(1).indexOf("campaign_daily") == lines(2).indexOf("campaign_daily"))
    val json = graft.tools.Inspect.formatStates(states, format = "json")
    assert(json.startsWith("[{") && json.contains("\"record_count\":42"))
    assert(graft.tools.Inspect.formatStates(states.limit(0)) ==
      "No partition state records found.")
  }

  test("renderPreview: summary + per-partition JSON samples (consumer contract surface)") {
    val preview = Seq(
      ("google_ads", "c1", "campaign_daily", Date.valueOf("2024-01-01"), "r1", 10L, "x"),
      ("google_ads", "c1", "campaign_daily", Date.valueOf("2024-01-01"), "r1", 11L, "y"),
      ("google_ads", "c1", "ad_group_daily", Date.valueOf("2024-01-02"), "r2", 7L, "z"),
    ).toDF("source", "customer_id", "query_name", "logical_date", "run_id", "metric", "payload")
    val out = graft.tools.Inspect.renderPreview(preview)
    assert(out.contains("sample_rows"))
    assert(out.contains("campaign_daily 2024-01-01 sample:"))
    assert(out.contains("\"metric\":10"))
    val js = graft.tools.Inspect.renderPreview(preview, format = "json")
    assert(js.startsWith("[{") && js.contains("\"sample_rows\":2"))
    assert(graft.tools.Inspect.renderPreview(preview.limit(0)) ==
      "No authoritative partitions found.")
  }
}
