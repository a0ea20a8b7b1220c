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
      .map(c => c.user_id -> c.depth).toMap
    assert(got(1L) == 3)
    assert(got(2L) == 2, "late in-horizon view must re-anchor user 2's funnel")
    assert(got(3L) == 1, "outside-window click must not convert")
    assert(got.contains(99L), "quiet users finalize by timeout, not by more data")
    // exactly one emission per finalized user
    val emissions = spark.table("funnel_t").as[Conversion].collect().map(_.user_id)
    assert(emissions.length == emissions.distinct.length)

    // batch parity: same events through the batch operator (restricted
    // to users with step events, as the stream is)
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
    Seq(1L, 2L, 3L).foreach(u => assert(got(u) == batch(u), s"stream/batch parity for user $u"))
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
