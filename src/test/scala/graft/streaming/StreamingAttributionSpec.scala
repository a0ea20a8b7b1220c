package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingAttribution._

/** The streaming attribution must (a) credit each purchase to the most
  * recent preceding touch exactly once, (b) let late-but-in-horizon
  * touches take the credit before finalization, (c) keep the
  * unbounded-preceding frame across compaction (a purchase long after
  * its touch finalized still credits it), and (d) agree with the batch
  * q94 window on identical input.
  */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runStream(
      name: String,
      lateness: String = "30 minutes",
  )(batches: Seq[TouchEvent]*): Map[Long, (Long, String)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TouchEvent]
    val q = attributeStream(in.toDS(), lateness)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    val rows = spark.table(name).as[Attribution].collect()
    assert(rows.map(_.event_id).distinct.length == rows.length, "duplicate emission")
    rows.map(a => a.event_id -> ((a.user_id, a.channel))).toMap
  }

  test("credits most recent preceding touch; no prior touch = none; one touch, two purchases") {
    val got = runStream("attr_basic_t")(
      Seq(
        TouchEvent(1L, 10L, "view", ts("2024-01-01 10:00:00")),
        TouchEvent(1L, 11L, "click", ts("2024-01-01 10:05:00")),
        TouchEvent(1L, 12L, "purchase", ts("2024-01-01 10:10:00")),
        TouchEvent(1L, 13L, "purchase", ts("2024-01-01 10:12:00")),
        TouchEvent(2L, 20L, "purchase", ts("2024-01-01 10:00:00")),
      ),
      // flush: watermark far past every purchase
      Seq(TouchEvent(99L, 990L, "view", ts("2024-01-02 10:00:00"))),
    )
    assert(got(12L) == ((1L, "click")))
    assert(got(13L) == ((1L, "click")), "a purchase is not a touch; credit persists")
    assert(got(20L) == ((2L, "none")))
    assert(!got.contains(990L), "touches emit nothing")
  }

  test("late in-horizon touch slots before a not-yet-final purchase and takes the credit") {
    val got = runStream("attr_late_t")(
      Seq(
        TouchEvent(1L, 10L, "view", ts("2024-01-01 10:00:00")),
        TouchEvent(1L, 12L, "purchase", ts("2024-01-01 10:10:00")),
      ),
      // later micro-batch, earlier event time, inside the horizon
      Seq(TouchEvent(1L, 11L, "click", ts("2024-01-01 10:05:00"))),
      Seq(TouchEvent(99L, 990L, "view", ts("2024-01-02 10:00:00"))),
    )
    assert(got(12L) == ((1L, "click")), "late in-horizon touch must re-order before the purchase")
  }

  test("unbounded-preceding frame survives compaction (purchase long after its touch finalized)") {
    val got = runStream("attr_compact_t")(
      Seq(TouchEvent(1L, 10L, "email", ts("2024-01-01 10:00:00"))),
      // watermark passes the touch → it compacts into lastChannel
      Seq(TouchEvent(98L, 980L, "view", ts("2024-01-03 10:00:00"))),
      // purchase two days after the touch left the buffer (above the
      // current watermark — an older purchase would be late-dropped)
      Seq(TouchEvent(1L, 11L, "purchase", ts("2024-01-03 11:00:00"))),
      Seq(TouchEvent(99L, 990L, "view", ts("2024-01-05 10:00:00"))),
    )
    assert(got(11L) == ((1L, "email")), "compacted touch must still carry the credit")
  }

  test("same-timestamp events order by event_id (the batch determinism rule)") {
    val got = runStream("attr_tie_t")(
      Seq(
        TouchEvent(1L, 10L, "view", ts("2024-01-01 10:00:00")),
        // same ts as the purchase, LARGER event_id → sorts after, no credit
        TouchEvent(1L, 30L, "click", ts("2024-01-01 10:10:00")),
        TouchEvent(1L, 20L, "purchase", ts("2024-01-01 10:10:00")),
      ),
      Seq(TouchEvent(99L, 990L, "view", ts("2024-01-02 10:00:00"))),
    )
    assert(got(20L) == ((1L, "view")), "tie at the purchase ts must break by event_id")
  }

  test("parity with the batch q94 window on the events table") {
    val ev = graft.ops.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts")
    // batch truth: the exact q94 frame, kept per-purchase (pre-rollup)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = ev
      .withColumn("attr",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), coalesce(col("attr"), lit("none")).as("channel"))
      .as[(Long, String)].collect().toMap

    val rows = ev.as[TouchEvent].collect().toSeq
    val flushTs = new Timestamp(rows.map(_.ts.getTime).max + 7L * 24 * 3600 * 1000)
    val got = runStream("attr_parity_t")(
      rows,
      Seq(TouchEvent(999999L, 9999990L, "view", flushTs)),
    )
    assert(got.size == want.size, s"stream emitted ${got.size} purchases, batch has ${want.size}")
    want.foreach { case (eid, ch) =>
      assert(got(eid)._2 == ch, s"event $eid: stream=${got(eid)._2} batch=$ch")
    }
  }
}
