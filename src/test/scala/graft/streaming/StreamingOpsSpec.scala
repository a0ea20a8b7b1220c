package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

case class Ev(ts: Timestamp, user_id: Long, value: Double)

/** MemoryStream tests for the streaming twins: watermark-gated emission
  * ≡ the reference's lookback-window supersession (late data inside the
  * horizon is admitted; beyond it, dropped).
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runToCompletion(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
  }

  test("tumblingCounts: hourly windows finalize at watermark; late data beyond horizon dropped") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingOps.tumblingCounts(in.toDF(), lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("tumbling_t").outputMode("append").start()

    in.addData(
      Ev(ts("2024-01-01 10:05:00"), 1L, 1.0),
      Ev(ts("2024-01-01 10:55:00"), 1L, 2.0),
      Ev(ts("2024-01-01 11:10:00"), 2L, 3.0),
    )
    q.processAllAvailable()
    // push the watermark far past 11:00 so the 10:00 window finalizes
    in.addData(Ev(ts("2024-01-01 14:00:00"), 9L, 0.0))
    q.processAllAvailable()
    // this event is 3h late, beyond the 1h watermark → must be dropped
    in.addData(Ev(ts("2024-01-01 10:30:00"), 1L, 100.0))
    q.processAllAvailable()
    in.addData(Ev(ts("2024-01-01 18:00:00"), 9L, 0.0))
    runToCompletion(q)

    val rows = spark.table("tumbling_t")
      .select("user_id", "hour_start", "n_events", "sum_value")
      .as[(Long, Timestamp, Long, Double)].collect().toSet
    assert(rows.contains((1L, ts("2024-01-01 10:00:00"), 2L, 3.0))) // late 100.0 NOT included
    assert(rows.contains((2L, ts("2024-01-01 11:00:00"), 1L, 3.0)))
  }

  test("hoppingCounts: each event lands in size/slide overlapping windows, finalized at watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = StreamingOps.hoppingCounts(
      in.toDF().toDF("ts", "event_type", "value"),
      size = "10 minutes", slide = "5 minutes", lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("hopping_t").outputMode("append").start()

    in.addData(
      (ts("2024-01-01 10:02:00"), "click", 1.0), // windows [09:55,10:05) and [10:00,10:10)
      (ts("2024-01-01 10:07:00"), "click", 2.0), // windows [10:00,10:10) and [10:05,10:15)
    )
    q.processAllAvailable()
    in.addData((ts("2024-01-01 14:00:00"), "view", 0.0)) // advance watermark → finalize
    runToCompletion(q)

    val rows = spark.table("hopping_t")
      .select("win_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect()
    val clicks = rows.filter(_._2 == "click").map(r => (r._1, r._3, r._4)).toSet
    assert(clicks == Set(
      (ts("2024-01-01 09:55:00"), 1L, 1.0),
      (ts("2024-01-01 10:00:00"), 2L, 3.0), // both events overlap here
      (ts("2024-01-01 10:05:00"), 1L, 2.0),
    ))
    // overlap invariant: total window-event assignments = 2 × events
    assert(rows.filter(_._2 == "click").map(_._3).sum == 4L)
  }

  test("sessionize: 30-minute gap splits sessions per user") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingOps.sessionize(in.toDF(), gap = "30 minutes", lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("session_t").outputMode("append").start()

    in.addData(
      Ev(ts("2024-01-01 10:00:00"), 1L, 1.0),
      Ev(ts("2024-01-01 10:10:00"), 1L, 1.0), // same session
      Ev(ts("2024-01-01 11:00:00"), 1L, 1.0), // 50-min gap → new session
    )
    q.processAllAvailable()
    in.addData(Ev(ts("2024-01-01 15:00:00"), 9L, 0.0)) // advance watermark
    runToCompletion(q)

    val sessions = spark.table("session_t")
      .where($"user_id" === 1L)
      .select("n_events").as[Long].collect().toSeq.sorted
    assert(sessions == Seq(1L, 2L))
  }

  test("cleanStream: quality gates match batch cleanCorpus; duplicates collapse first-seen within horizon") {
    implicit val ctx = spark.sqlContext
    case class Doc(doc_id: Long, text: String, ts: Timestamp)
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    val good = ("w " * 19).trim + " the" // 20 tokens, 1 stopword ⇒ passes both gates
    val short = "too few tokens the"     // fails length gate
    val in = MemoryStream[(Long, String, Timestamp)]
    val stream = in.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingOps
      .cleanStream(stream, stop, minTokens = 20, maxTokens = 500, minStopwordRatio = 0.01)
      .writeStream.format("memory").queryName("clean_t").outputMode("append").start()
    in.addData(
      (1L, good, ts("2024-01-01 10:00:00")),
      (2L, short, ts("2024-01-01 10:00:01")),
      (3L, good, ts("2024-01-01 10:00:02")), // exact duplicate of 1 ⇒ dropped
    )
    q.processAllAvailable()
    val kept = spark.table("clean_t").select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L), s"got $kept")
    // batch parity of the gate semantics (dedup winner differs by design:
    // batch = min doc_id, stream = first seen)
    val batchDf = Seq((1L, good, "en", "s", good.length.toLong),
      (2L, short, "en", "s", short.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batchKept = graft.llm.TextPipeline
      .cleanCorpus(batchDf, stop, 20, 500, 0.01)
      .select("doc_id").as[Long].collect().toSeq
    assert(batchKept == Seq(1L))
    q.stop()
  }

  test("batch parity: streaming transforms applied to a batch frame match q28 shape") {
    val batch = Seq(
      Ev(ts("2024-01-01 10:05:00"), 1L, 1.5),
      Ev(ts("2024-01-01 10:35:00"), 1L, 2.5),
      Ev(ts("2024-01-01 12:00:00"), 1L, 4.0),
    ).toDF()
    val got = StreamingOps.tumblingCounts(batch)
      .select("hour_start", "n_events", "sum_value")
      .as[(Timestamp, Long, Double)].collect().toSet
    assert(got == Set(
      (ts("2024-01-01 10:00:00"), 2L, 4.0),
      (ts("2024-01-01 12:00:00"), 1L, 4.0),
    ))
  }

  test("intervalJoinStreams: inner join pairs across micro-batches, window gates matches") {
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[View]
    val buys = MemoryStream[Buy]
    val out = StreamingOps.intervalJoinStreams(
      views.toDF(), buys.toDF(),
      key = ("v_user", "b_user"), ts = ("v_ts", "b_ts"),
      window = "30 minutes", lateness = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ssj_inner_t").outputMode("append").start()

    views.addData(
      View(1L, ts("2024-01-01 10:00:00")),
      View(2L, ts("2024-01-01 10:00:00")),
      View(3L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // purchases arrive in a LATER micro-batch: user 1 inside the
    // window, user 2 outside it, user 3 BEFORE the view (no match)
    buys.addData(
      Buy(1L, ts("2024-01-01 10:20:00")),
      Buy(2L, ts("2024-01-01 11:20:00")),
      Buy(3L, ts("2024-01-01 09:50:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj_inner_t").select("v_user", "b_ts")
      .as[(Long, Timestamp)].collect().toSet
    assert(got == Set((1L, ts("2024-01-01 10:20:00"))),
      "only the in-window purchase pairs; both sides buffered across batches")
  }

  test("intervalJoinStreams: leftOuter emits unmatched views with nulls once eviction proves no match") {
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[View]
    val buys = MemoryStream[Buy]
    val out = StreamingOps.intervalJoinStreams(
      views.toDF(), buys.toDF(),
      key = ("v_user", "b_user"), ts = ("v_ts", "b_ts"),
      window = "30 minutes", lateness = "10 minutes", joinType = "leftOuter")
    val q = out.writeStream.format("memory").queryName("ssj_outer_t").outputMode("append").start()

    views.addData(View(1L, ts("2024-01-01 10:00:00")), View(2L, ts("2024-01-01 10:00:00")))
    buys.addData(Buy(1L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // advance BOTH watermarks far past view+window+lateness so the
    // unmatched view finalizes as a null-extended row
    views.addData(View(99L, ts("2024-01-01 13:00:00")))
    buys.addData(Buy(99L, ts("2024-01-01 13:00:01")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj_outer_t").select("v_user", "b_user")
      .as[(Long, Option[Long])].collect().toSet
    assert(got.contains((1L, Some(1L))), "matched pair emits")
    assert(got.contains((2L, None)), "unmatched view must finalize with null right side")
  }

  test("intervalJoinStreams parity with the batch interval join on the events table") {
    implicit val ctx = spark.sqlContext
    val ev = graft.ops.Tables.events(spark, sfDir).select("user_id", "event_type", "ts")
    val views = ev.where($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts".as("v_ts")).as[View].collect().toSeq
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("b_user"), $"ts".as("b_ts")).as[Buy].collect().toSeq

    val want = spark.createDataset(views).toDF()
      .join(
        spark.createDataset(purchases).toDF(),
        $"v_user" === $"b_user" && $"b_ts" >= $"v_ts" &&
          $"b_ts" <= $"v_ts" + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"))
      .count()

    val vIn = MemoryStream[View]
    val bIn = MemoryStream[Buy]
    val q = StreamingOps.intervalJoinStreams(
      vIn.toDF(), bIn.toDF(),
      key = ("v_user", "b_user"), ts = ("v_ts", "b_ts"),
      window = "30 minutes", lateness = "10 minutes")
      .writeStream.format("memory").queryName("ssj_parity_t").outputMode("append").start()
    vIn.addData(views)
    bIn.addData(purchases)
    q.processAllAvailable()
    q.stop()

    assert(spark.table("ssj_parity_t").count() == want,
      "stream-stream interval join must reproduce the batch join pair-for-pair")
  }
}

case class View(v_user: Long, v_ts: Timestamp)
case class Buy(b_user: Long, b_ts: Timestamp)
