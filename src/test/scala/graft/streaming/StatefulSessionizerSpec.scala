package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StatefulSessionizer._

class StatefulSessionizerSpec extends SparkSpec {
  import spark.implicits._

  private val m = 60L * 1000000L // one minute in µs

  test("batch: gap splits sessions, open session flushed, max length enforced") {
    val evs = Seq(
      Event(1L, 1L, 0L), Event(1L, 2L, 10 * m), Event(1L, 3L, 60 * m), // gap at 60m
      Event(2L, 4L, 0L), Event(2L, 5L, 5 * m),
    ).toDS()
    val got = sessionizeBatch(evs, gapUs = 30 * m).collect().toSet
    assert(got == Set(
      Session(1L, 0L, 10 * m, 2), Session(1L, 60 * m, 60 * m, 1),
      Session(2L, 0L, 5 * m, 2),
    ))
    // max session length closes even without a gap
    val capped = sessionizeBatch(
      Seq(Event(1L, 1L, 0L), Event(1L, 2L, 10 * m), Event(1L, 3L, 20 * m)).toDS(),
      gapUs = 30 * m, maxSessionUs = 15 * m).collect()
    assert(capped.length == 2)
  }

  test("batch parity with the window-based Sessionize operator") {
    val ev = graft.ops.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "unix_micros(cast(ts as timestamp)) as ts_us")
    val viaState = sessionizeBatch(ev.as[Event], gapUs = 30 * m)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaWindow = graft.ops.Sessionize.sessions(ev, gapUs = 30 * m)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaState == viaWindow)
  }

  test("streaming: a later event closes a session; a QUIET user's session emits by timeout") {
    implicit val ctx = spark.sqlContext
    // base in 2024: an event at exactly the initial watermark (epoch 0)
    // would be dropped as late before reaching the stateful operator
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val baseUs = base.getEpochSecond * 1000000L
    def ts(us: Long) = java.sql.Timestamp.from(base.plusNanos(us * 1000))
    val in = MemoryStream[TsEvent]
    val q = sessionize(in.toDS(), gapUs = 30 * m, lateness = "1 minute")
      .writeStream.format("memory").queryName("stateful_sessions").outputMode("append").start()
    in.addData(TsEvent(1L, 1L, ts(0L)), TsEvent(1L, 2L, ts(10 * m)))
    q.processAllAvailable()
    assert(spark.table("stateful_sessions").count() == 0) // still open
    in.addData(TsEvent(1L, 3L, ts(100 * m))) // closes user 1's first session
    q.processAllAvailable()
    assert(spark.table("stateful_sessions").as[Session].collect().toSeq ==
      Seq(Session(1L, baseUs, baseUs + 10 * m, 2)))
    // user 1 goes quiet; another user's events advance the watermark far
    // past lastUs+gap → user 1's open session must emit via timeout
    in.addData(TsEvent(9L, 4L, ts(500 * m)))
    q.processAllAvailable()
    in.addData(TsEvent(9L, 5L, ts(900 * m)))
    q.processAllAvailable()
    val all = spark.table("stateful_sessions").as[Session].collect().toSet
    assert(all.contains(Session(1L, baseUs + 100 * m, baseUs + 100 * m, 1)),
      s"timed-out session missing from $all")
    q.stop()
  }

  test("streaming: in-watermark out-of-order event in a later micro-batch must not regress session end") {
    implicit val ctx = spark.sqlContext
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val baseUs = base.getEpochSecond * 1000000L
    def ts(us: Long) = java.sql.Timestamp.from(base.plusNanos(us * 1000))
    val in = MemoryStream[TsEvent]
    val q = sessionize(in.toDS(), gapUs = 30 * m, lateness = "20 minutes")
      .writeStream.format("memory").queryName("ooo_sessions").outputMode("append").start()
    in.addData(TsEvent(1L, 1L, ts(0L)), TsEvent(1L, 2L, ts(10 * m)))
    q.processAllAvailable()
    // out-of-order but within the 20-minute watermark: must merge
    // without moving end_us back to 5m (which would also move the
    // event-time timeout earlier)
    in.addData(TsEvent(1L, 3L, ts(5 * m)))
    q.processAllAvailable()
    in.addData(TsEvent(1L, 4L, ts(100 * m))) // closes the session
    q.processAllAvailable()
    assert(spark.table("ooo_sessions").as[Session].collect().toSeq ==
      Seq(Session(1L, baseUs, baseUs + 10 * m, 3)))
    q.stop()
  }
}

class PayloadReaderSpec extends SparkSpec {

  test("FAILFAST JSONL read crashes on missing declared fields (spec.md:42 semantics)") {
    val q = graft.model.QueryDefinition("q", "campaign", "date", Seq("campaign.id", "clicks"))
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
    java.nio.file.Files.writeString(dir.resolve("payload.jsonl"),
      """{"campaign_id":"1","clicks":"10","__query_name":"q"}
        |{"campaign_id":"2","clicks":"20","__query_name":"q"}
        |""".stripMargin)
    val ok = graft.sink.PayloadReader.readJsonl(spark, q, dir.toString)
    assert(ok.count() == 2)
    assert(ok.columns.toSeq == Seq("campaign_id", "clicks", "__query_name"))

    java.nio.file.Files.writeString(dir.resolve("bad.jsonl"), "{not json}\n")
    val e = intercept[Exception](graft.sink.PayloadReader.readJsonl(spark, q, dir.toString).count())
    assert(e.getMessage.contains("FAILFAST") || e.getCause != null)
  }

  test("well-formed record MISSING a declared field also crashes (not silently null-filled)") {
    val q = graft.model.QueryDefinition("q", "campaign", "date", Seq("campaign.id", "clicks"))
    val dir = java.nio.file.Files.createTempDirectory("jsonl_missing")
    // valid JSON, but no "clicks" key: Spark's FAILFAST alone would
    // null-fill it; the reference crashes (spec.md:42)
    java.nio.file.Files.writeString(dir.resolve("payload.jsonl"),
      """{"campaign_id":"1","__query_name":"q"}
        |""".stripMargin)
    val e = intercept[Exception](
      graft.sink.PayloadReader.readJsonl(spark, q, dir.toString).count())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("clicks")), s"expected missing-field error, got $e")
  }

  test("sink factory requires RAW_SINK_ROOT (K6)") {
    val e = intercept[IllegalArgumentException](
      graft.sink.PayloadReader.sinkFor(spark, Map.empty))
    assert(e.getMessage.contains("RAW_SINK_ROOT"))
    val sink = graft.sink.PayloadReader.sinkFor(spark,
      Map("RAW_SINK_ROOT" -> java.nio.file.Files.createTempDirectory("fac").toString))
    assert(sink != null)
  }
}
