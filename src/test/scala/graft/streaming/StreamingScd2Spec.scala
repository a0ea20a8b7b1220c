package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingScd2._

class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  test("closed intervals match the batch operator (q73's non-null rows) on in-order input") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TypedEvent]
    val q = scd2Stream(in.toDS(), lateness = "1 hour")
      .writeStream.format("memory").queryName("scd2_parity").outputMode("append").start()

    val evs = Seq(
      TypedEvent(1L, 1L, "view", ts("2024-01-01 10:00:00")),
      TypedEvent(1L, 2L, "view", ts("2024-01-01 10:20:00")), // same type: collapses
      TypedEvent(1L, 3L, "click", ts("2024-01-01 10:40:00")),
      TypedEvent(1L, 4L, "purchase", ts("2024-01-01 11:00:00")),
      TypedEvent(2L, 5L, "view", ts("2024-01-01 10:05:00")),
    )
    in.addData(evs: _*)
    q.processAllAvailable()
    in.addData(TypedEvent(99L, 6L, "view", ts("2024-01-02 13:00:00"))) // advance wm
    q.processAllAvailable()
    q.stop()

    val got = spark.table("scd2_parity").as[Interval].collect()
      .map(i => (i.user_id, i.event_id, i.event_type, i.valid_from_us, i.valid_to_us)).toSet
    assert(got == Set(
      (1L, 1L, "view", us("2024-01-01 10:00:00"), us("2024-01-01 10:40:00")),
      (1L, 3L, "click", us("2024-01-01 10:40:00"), us("2024-01-01 11:00:00")),
    ), s"got $got")
    // open intervals (purchase@11:00 for user 1, view for users 2/99)
    // stay in state — append mode emits only immutable rows

    // batch twin agrees
    val batch = scd2Batch(spark.createDataset(evs))
      .collect().map(i => (i.user_id, i.event_id, i.event_type, i.valid_from_us, i.valid_to_us)).toSet
    assert(batch == got, "stream (wm past everything) ≡ batch closed intervals")

    // and the batch twin matches q73's closed rows for the same shape:
    // q73 runs on the events table; here assert the twin against the
    // batch window form directly
    val df = spark.createDataset(evs).toDF()
      .select(col("user_id"), col("event_id"), col("event_type"),
        (col("ts").cast("long") * 1000000L).as("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val q73closed = df
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .where(col("valid_to_us").isNotNull)
      .select("user_id", "event_id", "event_type", "ts_us", "valid_to_us")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(q73closed == got, "window-form closed intervals ≡ streaming twin")
  }

  test("a late in-horizon event SPLITS the interval it lands inside") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TypedEvent]
    val q = scd2Stream(in.toDS(), lateness = "4 hours")
      .writeStream.format("memory").queryName("scd2_split").outputMode("append").start()

    // A@10:00 and A@12:00 arrive first (would collapse into one run)
    in.addData(
      TypedEvent(7L, 1L, "A", ts("2024-01-01 10:00:00")),
      TypedEvent(7L, 2L, "A", ts("2024-01-01 12:00:00")),
    )
    q.processAllAvailable()
    // late but in-horizon B@11:00 — inside the would-be A run
    in.addData(TypedEvent(7L, 3L, "B", ts("2024-01-01 11:00:00")))
    q.processAllAvailable()
    in.addData(TypedEvent(99L, 9L, "A", ts("2024-01-02 13:00:00"))) // wm past everything
    q.processAllAvailable()
    q.stop()

    val got = spark.table("scd2_split").as[Interval].collect()
      .filter(_.user_id == 7L)
      .sortBy(_.valid_from_us)
      .map(i => (i.event_type, i.valid_from_us, i.valid_to_us)).toSeq
    assert(got == Seq(
      ("A", us("2024-01-01 10:00:00"), us("2024-01-01 11:00:00")),
      ("B", us("2024-01-01 11:00:00"), us("2024-01-01 12:00:00")),
    ), s"late B must split the A run: $got")
    // A@12:00 reopens and stays open (no later event) — not emitted
  }

  test("no premature emission: an interval is held until the watermark passes its end") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TypedEvent]
    val q = scd2Stream(in.toDS(), lateness = "4 hours")
      .writeStream.format("memory").queryName("scd2_hold").outputMode("append").start()

    in.addData(
      TypedEvent(7L, 1L, "A", ts("2024-01-01 10:00:00")),
      TypedEvent(7L, 2L, "B", ts("2024-01-01 10:30:00")),
    )
    q.processAllAvailable()
    // wm = 10:30 - 4h < 10:00: NOTHING may emit yet — a late pre-10:30
    // event could still change both intervals
    assert(spark.table("scd2_hold").count() == 0, "no emission before the watermark")
    in.addData(TypedEvent(99L, 9L, "A", ts("2024-01-01 15:00:00"))) // wm → 11:00
    q.processAllAvailable()
    q.stop()
    val got = spark.table("scd2_hold").as[Interval].collect()
      .filter(_.user_id == 7L).map(i => (i.event_type, i.valid_to_us)).toSeq
    assert(got == Seq(("A", us("2024-01-01 10:30:00"))),
      s"only the A interval (ends 10:30 < wm 11:00) is immutable: $got")
  }
}
