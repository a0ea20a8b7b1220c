package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Fixture pins for the time-series family's exact-integer decision
  * rules (the oracle hashes real-data results; these pin the hand-
  * computable semantics: window exclusion, flag direction, tie-break).
  */
class TimeSeriesQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("q135 flags only the spike, judges it against the PRIOR-6 window, and skips warm-up days") {
    val dir = java.nio.file.Files.createTempDirectory("q135fix").toString
    // days 1-7 flat at 100.00; day 8 spikes to 200.00; day 9 back flat
    val rows = (1 to 9).map { i =>
      val price = if (i == 8) 200.0 else 100.0
      ("A", ts(f"1995-01-$i%02d 00:00:00"), price, 0.0)
    }
    rows.toDF("l_returnflag", "l_shipdate", "l_extendedprice", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = TimeSeriesQueries.q135.run(spark, dir).collect()
    // the 6 warm-up days cannot flag (n < 6); the flat days cannot
    // (zero deviation fails the strict inequality); day 9 sees the
    // spike in its baseline, inflating variance enough to pass
    assert(r.length == 1, r.mkString(";"))
    assert(r.head.getAs[java.sql.Date]("day").toString == "1995-01-08")
    assert(r.head.getAs[String]("direction") == "above")
    assert(r.head.getAs[Long]("rev_micro") == 200000000L) // 200.00 in micro-units
  }

  test("q136 locates the rate shift and breaks statistic ties to the earliest day") {
    val dir = java.nio.file.Files.createTempDirectory("q136fix").toString
    // type A: 1/day for days 1-5, then 3/day for days 6-10 — the
    // cumulative curve bends at day 5 (T = |10·cum − i·20| peaks at 50)
    val a = (1 to 5).flatMap(d => Seq((d, 1))) ++
      (6 to 10).flatMap(d => (1 to 3).map(k => (d, k * 100)))
    // type B: perfectly uniform 2/day — T ≡ 0 everywhere, so the
    // argmax tie must resolve to the EARLIEST day
    val b = (1 to 10).flatMap(d => Seq((d, 0), (d, 1)))
    val df = (a.map(("A", _)) ++ b.map(("B", _))).zipWithIndex.map {
      case ((t, (day, _)), i) =>
        (i.toLong, ts(f"2024-01-$day%02d 12:00:00"), 1L, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.parquet(s"$dir/events.parquet")
    val r = TimeSeriesQueries.q136.run(spark, dir).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[java.sql.Date]("cp_day").toString, x.getAs[Long]("t_stat"))).toMap
    assert(r("A") == ("2024-01-05", 50L))
    assert(r("B") == ("2024-01-01", 0L))
  }
}
