package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingFunnel._

/** The streaming funnel must (a) finalize exactly once per user at
  * watermark passage, (b) honor the out-of-order earliest-anchor rule
  * (a late-but-in-horizon earlier view re-anchors the funnel), and
  * (c) agree with the batch funnelDepths on identical input.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val HOUR_US = 3600L * 1000000L

  test("finalizes once per user with batch-equal depths, including out-of-order re-anchoring") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StepEvent]
    val out = funnelStream(in.toDS(), Seq("view", "click", "purchase"),
      windowUs = 2 * HOUR_US, lateness = "4 hours")
    val q = out.writeStream.format("memory").queryName("funnel_t").outputMode("append").start()

    in.addData(
      // user 1: clean full funnel
      StepEvent(1L, "view", ts("2024-01-01 10:00:00")),
      StepEvent(1L, "click", ts("2024-01-01 11:00:00")),
      StepEvent(1L, "purchase", ts("2024-01-01 12:00:00")),
      // user 2: click appears FIRST (out of order within the batch)
      StepEvent(2L, "click", ts("2024-01-01 10:30:00")),
      // user 3: view then click outside the 2h window
      StepEvent(3L, "view", ts("2024-01-01 10:00:00")),
      StepEvent(3L, "click", ts("2024-01-01 12:30:00")),
    )
    q.processAllAvailable()
    // user 2's view arrives in a LATER micro-batch, earlier in event
    // time (in-horizon late data): the funnel must re-anchor, so the
    // 10:30 click now converts (10:00 view → 10:30 click = depth 2)
    in.addData(StepEvent(2L, "view", ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // advance the watermark far past every deadline → all users finalize
    in.addData(StepEvent(99L, "view", ts("2024-01-02 12:00:00")))
    q.processAllAvailable()
    in.addData(StepEvent(98L, "view", ts("2024-01-04 12:00:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("funnel_t").as[Conversion].collect()
      .groupBy(_.user_id).view.mapValues(_.map(_.depth).sorted.toSeq).toMap
    assert(got(1L) == Seq(3))
    assert(got(2L) == Seq(2), "late in-horizon view must re-anchor user 2's funnel")
    // user 3's click is past episode 1's deadline (10:00 + 2h): it must
    // not convert episode 1 (depth stays 1) and instead seeds a second,
    // headless episode (depth 0) — it could still have converted had a
    // view arrived above the watermark, so it can't just be swallowed.
    assert(got(3L) == Seq(0, 1), "outside-window click must not convert")
    assert(got.get(99L).contains(Seq(1)), "quiet users finalize by timeout, not by more data")
    // exact per-user episode counts — a double emission anywhere fails
    assert(got.view.mapValues(_.size).toMap == Map(1L -> 1, 2L -> 1, 3L -> 2, 99L -> 1),
      s"episode emission counts drifted: $got")

    // batch parity on single-episode users (the documented contract;
    // user 3's input is two streaming episodes, which batch's one
    // global pass cannot represent)
    val batch = graft.ops.AnalyticQueries.funnelDepths(
      Seq(
        (1L, "view", ts("2024-01-01 10:00:00")),
        (1L, "click", ts("2024-01-01 11:00:00")),
        (1L, "purchase", ts("2024-01-01 12:00:00")),
        (2L, "click", ts("2024-01-01 10:30:00")),
        (2L, "view", ts("2024-01-01 10:00:00")),
        (3L, "view", ts("2024-01-01 10:00:00")),
        (3L, "click", ts("2024-01-01 12:30:00")),
      ).toDF("user_id", "event_type", "ts"),
      Seq("view", "click", "purchase"), "2 HOURS",
    ).collect().map(r => r.getLong(0) -> r.getAs[Int]("depth")).toMap
    Seq(1L, 2L).foreach(u => assert(got(u) == Seq(batch(u)), s"stream/batch parity for user $u"))
    assert(batch(3L) == 1, "batch's single-episode view of user 3")
  }

  test("returning user opens a NEW episode after finalization (bounded state, one row per attempt)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StepEvent]
    val out = funnelStream(in.toDS(), Seq("view", "click"),
      windowUs = 1 * HOUR_US, lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("funnel_ep").outputMode("append").start()

    in.addData(StepEvent(7L, "view", ts("2024-01-01 10:00:00"))) // episode 1: view only
    q.processAllAvailable()
    // watermark past 11:00 deadline (anchor+window) → episode 1 finalizes at depth 1
    in.addData(StepEvent(99L, "view", ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // user 7 returns: full funnel = episode 2
    in.addData(
      StepEvent(7L, "view", ts("2024-01-02 09:00:00")),
      StepEvent(7L, "click", ts("2024-01-02 09:30:00")),
    )
    q.processAllAvailable()
    in.addData(StepEvent(98L, "view", ts("2024-01-03 13:00:00"))) // flush everything
    q.processAllAvailable()
    q.stop()

    val eps = spark.table("funnel_ep").as[Conversion].collect()
      .filter(_.user_id == 7L).sortBy(_.last_anchor_us).map(_.depth).toSeq
    assert(eps == Seq(1, 2), s"two episodes with their own depths, got $eps")
  }

  test("active key finalizes an expired episode inline (timeouts never fire for keys with data)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StepEvent]
    val out = funnelStream(in.toDS(), Seq("view", "click"),
      windowUs = 1 * HOUR_US, lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("funnel_inline").outputMode("append").start()

    // Batch 1: episode 1 (view only) AND the watermark advancer together,
    // so at the end of batch 1 wm = 12:00 — already past the 11:00
    // deadline (anchor 10:00 + 1h window).
    in.addData(
      StepEvent(7L, "view", ts("2024-01-01 10:00:00")),
      StepEvent(99L, "view", ts("2024-01-01 13:00:00")),
    )
    q.processAllAvailable()
    // User 7 stays continuously active: every subsequent trigger carries
    // data for them, so the EventTimeTimeout path alone would never
    // finalize episode 1 — the data branch must drain it inline.
    in.addData(
      StepEvent(7L, "view", ts("2024-01-01 12:30:00")),
      StepEvent(7L, "click", ts("2024-01-01 12:45:00")),
    )
    q.processAllAvailable()
    in.addData(StepEvent(98L, "view", ts("2024-01-02 13:00:00"))) // flush episode 2
    q.processAllAvailable()
    q.stop()

    val eps = spark.table("funnel_inline").as[Conversion].collect()
      .filter(_.user_id == 7L).sortBy(_.last_anchor_us).map(_.depth).toSeq
    assert(eps == Seq(1, 2),
      s"episode 1 (depth 1) must finalize inline, episode 2 (view→click = depth 2) separately; got $eps")
  }

  test("early arrivals beyond the deadline are carried to the next episode, not swallowed") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StepEvent]
    val out = funnelStream(in.toDS(), Seq("view", "click"),
      windowUs = 1 * HOUR_US, lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("funnel_carry").outputMode("append").start()

    // One batch, low watermark: episode 1's view AND the next attempt's
    // events land in the same buffer. 12:30/12:45 are past episode 1's
    // 11:00 deadline, so when the watermark eventually passes they must
    // seed episode 2 — one finalization emitting both episodes in order.
    in.addData(
      StepEvent(7L, "view", ts("2024-01-01 10:00:00")),
      StepEvent(7L, "view", ts("2024-01-01 12:30:00")),
      StepEvent(7L, "click", ts("2024-01-01 12:45:00")),
    )
    q.processAllAvailable()
    in.addData(StepEvent(99L, "view", ts("2024-01-02 13:00:00"))) // wm past everything
    q.processAllAvailable()
    q.stop()

    val eps = spark.table("funnel_carry").as[Conversion].collect()
      .filter(_.user_id == 7L).sortBy(_.last_anchor_us).map(_.depth).toSeq
    assert(eps == Seq(1, 2), s"buffer must split at the episode-1 deadline; got $eps")
  }

  test("drainExpired: splits at deadlines, cascades across a watermark jump, keeps the open tail") {
    val w = 100L // µs window; wm in ms
    // events 10 (ep1, deadline 110µs=0ms... use bigger numbers for ms math
    val US = 1000L // 1ms in µs
    // ep1: step0@10ms → deadline 110ms; ep2: step0@200ms,step1@250ms → deadline 250ms; open: step0@400ms
    val buf = Seq(Vector(10 * US, 200 * US, 400 * US), Vector(250 * US))
    val (eps, rest) = drainExpired(buf, wmMs = 300L, windowUs = 100 * US, nSteps = 2)
    assert(eps == List((1, 10 * US), (2, 250 * US)), s"got $eps")
    assert(rest == Seq(Vector(400 * US), Vector.empty), s"got $rest")
    // nothing expired → untouched
    val (none, same) = drainExpired(buf, wmMs = 100L, windowUs = 100 * US, nSteps = 2)
    assert(none.isEmpty && same == buf)
  }

  test("repeated step names are rejected (ambiguous bucketing)") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      funnelStream(spark.emptyDataset[StepEvent], Seq("view", "click", "view"), HOUR_US)
    }
  }

  test("deadlineUs: full depth → last anchor; partial → anchor+window; no step-0 → maxBuf+window") {
    val w = 100L
    assert(deadlineUs(Seq(Vector(10L), Vector(50L)), w, 2) == 50L) // full
    assert(deadlineUs(Seq(Vector(10L), Vector.empty), w, 2) == 110L) // partial
    assert(deadlineUs(Seq(Vector.empty, Vector(70L)), w, 2) == 170L) // headless buffer
  }

  test("resolve: greedy earliest-anchor over buffered timestamps") {
    val w = 100L
    // step0 min anchors; step1 must be in (anchor, anchor+w]
    assert(resolve(Seq(Vector(10L, 50L), Vector(60L), Vector.empty), w) == (2, 60L))
    // boundary: exactly anchor+w converts (inclusive end, exclusive start)
    assert(resolve(Seq(Vector(10L), Vector(110L)), w) == (2, 110L))
    assert(resolve(Seq(Vector(10L), Vector(10L)), w)._1 == 1, "strictly-after required")
    assert(resolve(Seq(Vector.empty, Vector(5L)), w) == (0, 0L), "no first step, no funnel")
  }
}
