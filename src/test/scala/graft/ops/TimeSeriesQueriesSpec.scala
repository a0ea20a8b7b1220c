package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit, to_timestamp}

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

  test("q143 sweep counts inclusive spans and first-peak ties break to the earliest day") {
    val dir = java.nio.file.Files.createTempDirectory("q143fix").toString
    // one priority, three orders: spans [1,5], [3,7], [6,9] (order date
    // through last ship date, inclusive). Open counts: d1-2 → 1,
    // d3-5 → 2, d6-7 → 2, d8-9 → 1 — peak 2, FIRST reached on day 3.
    Seq(
      (1L, "1-URGENT", ts("1995-01-01 00:00:00")),
      (2L, "1-URGENT", ts("1995-01-03 00:00:00")),
      (3L, "1-URGENT", ts("1995-01-06 00:00:00")),
    ).toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    Seq(
      (1L, ts("1995-01-02 00:00:00")), (1L, ts("1995-01-05 00:00:00")),
      (2L, ts("1995-01-07 00:00:00")),
      (3L, ts("1995-01-09 00:00:00")),
    ).toDF("l_orderkey", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = TimeSeriesQueries.q143.run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("peak") == 2L)
    assert(r.head.getAs[Long]("first_peak_day") ==
      java.time.LocalDate.of(1995, 1, 3).toEpochDay)
  }

  test("q145 recovers an exact linear slope, including the sign-factored negative branch") {
    val dir = java.nio.file.Files.createTempDirectory("q145fix").toString
    // supplier 1: +100 cents/day (1.00, 2.00, 3.00); supplier 2: −100
    // cents/day — pins the sign·(|num| div den) form (a floor-division
    // would give −⌈·⌉ = off-by-one on any non-exact negative slope;
    // here the slope is exact so both agree, and the magnitude check
    // pins the arithmetic end to end)
    Seq(
      (1L, ts("1995-01-01 00:00:00"), 1.00), (1L, ts("1995-01-02 00:00:00"), 2.00),
      (1L, ts("1995-01-03 00:00:00"), 3.00),
      (2L, ts("1995-01-01 00:00:00"), 3.00), (2L, ts("1995-01-02 00:00:00"), 2.00),
      (2L, ts("1995-01-03 00:00:00"), 1.00),
    ).toDF("l_suppkey", "l_shipdate", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = TimeSeriesQueries.q145.run(spark, dir).collect()
      .map(x => x.getAs[Long]("sk") -> x.getAs[Long]("slope_micro")).toMap
    assert(r(1L) == 100000000L) // 100 cents/day in micro-cents
    assert(r(2L) == -100000000L)
  }

  test("q146 scores a perfectly periodic stream 0 and a bursty one by the exact CV2") {
    val dir = java.nio.file.Files.createTempDirectory("q146fix").toString
    // user 1: 6 events exactly 10s apart → 5 equal gaps → CV² = 0.
    // user 2: gaps 1,1,1,1,100 s → n=5, Σg=104, Σg²=10004,
    // cv2_milli = 1000·5·(5·10004−104²) div (4·104²) = 4530.
    val u1 = (0 to 5).map(i => (i.toLong, ts("2024-01-01 00:00:00").getTime + i * 10000L, 1L))
    val gaps = Seq(0L, 1L, 2L, 3L, 4L, 104L) // cumulative seconds
    val u2 = gaps.zipWithIndex.map { case (g, i) =>
      (100L + i, ts("2024-01-01 00:00:00").getTime + g * 1000L, 2L)
    }
    (u1 ++ u2).map { case (id, ms, uid) => (id, new Timestamp(ms), uid) }
      .toDF("event_id", "ts", "user_id")
      .write.parquet(s"$dir/events.parquet")
    val r = TimeSeriesQueries.q146.run(spark, dir).collect()
      .map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("cv2_milli")).toMap
    assert(r(1L) == 0L)
    assert(r(2L) == 4530L)
  }

  test("q151 merges overlapping and TOUCHING episodes, keeps gapped ones apart") {
    val dir = java.nio.file.Files.createTempDirectory("q151fix").toString
    // supplier 1: order spans [1,5], [5,7] (touching → merge), [10,12]
    // → 2 episodes: [1,7] (7 days) and [10,12] (3 days), 10 covered
    Seq(
      (1L, 100L, ts("1995-01-01 00:00:00")), (1L, 100L, ts("1995-01-05 00:00:00")),
      (1L, 101L, ts("1995-01-05 00:00:00")), (1L, 101L, ts("1995-01-07 00:00:00")),
      (1L, 102L, ts("1995-01-10 00:00:00")), (1L, 102L, ts("1995-01-12 00:00:00")),
    ).toDF("l_suppkey", "l_orderkey", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = TimeSeriesQueries.q151.run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_episodes") == 2L)
    assert(r.head.getAs[Long]("covered_days") == 10L)
    assert(r.head.getAs[Long]("longest_days") == 7L)
  }

  test("q152 band bounds are strict-after and inclusive-at-300s") {
    val dir = java.nio.file.Files.createTempDirectory("q152fix").toString
    val t0 = ts("2024-01-01 00:00:00").getTime
    // user 1: click@0, view@100s, purchase@400s → click→view (100s in),
    // view→purchase (exactly 300s — counted), click→purchase (400s — out).
    // user 2: two events at the SAME µs → strict-after excludes both directions.
    Seq(
      (1L, t0, 1L, "click"), (2L, t0 + 100000L, 1L, "view"), (3L, t0 + 400000L, 1L, "purchase"),
      (4L, t0, 2L, "click"), (5L, t0, 2L, "view"),
    ).map { case (id, ms, u, ty) => (id, new Timestamp(ms), u, ty) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val r = TimeSeriesQueries.q152.run(spark, dir).collect()
      .map(x => (x.getAs[String]("type_a"), x.getAs[String]("type_b")) ->
        x.getAs[Long]("n_pairs")).toMap
    assert(r == Map(("click", "view") -> 1L, ("view", "purchase") -> 1L))
  }

  test("q225: perfectly weekly series scores seasonal MAE 0 and beats persistence") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q225fix").toString
    // 21 days of exact period-7 revenue: 10,20,…,70 repeating ×3.
    // Seasonal-naive (day−7) errors are all 0 over its 14 evaluable
    // days; persistence pays +10 within weeks and −60 at the two week
    // boundaries: (18·10 + 2·60)/20 = 15.00 = 1500 cents.
    val rows = (0 until 21).map { i =>
      (f"1995-01-${i + 1}%02d", 10.0 * (i % 7 + 1))
    }
    rows.toDF("d", "l_extendedprice")
      .select(to_timestamp(col("d")).as("l_shipdate"),
        col("l_extendedprice"), lit(0.0).as("l_discount"), lit("A").as("l_returnflag"))
      .write.parquet(s"$dir/lineitem.parquet")
    val r = TimeSeriesQueries.q225.run(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_seasonal") == 14L && row.getAs[Long]("n_persist") == 20L)
    assert(row.getAs[Long]("mae_seasonal_cents") == 0L, "period-7 series must backtest to MAE 0")
    assert(row.getAs[Long]("mae_persist_cents") == 1500L)
    assert(row.getAs[Boolean]("seasonal_wins"))
  }

  test("q225: fractional cents TRUNCATE (never round) — the cast semantics both engines must share") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q225trunc").toString
    // day 1 revenue = 10.01 × (1 − 0.05) = 9.5095 → 950 cents ONLY
    // under truncation (rounding gives 951); day 2 = 20.00 → 2000.
    // Persistence MAE = 2000 − 950 = 1050; a round-semantics engine
    // would report 1049. Pins ADVICE r6 item 2: Spark's decimal→long
    // cast truncates, so the oracle wraps its cents in trunc().
    Seq(("1995-01-01", 10.01, 0.05), ("1995-01-02", 20.00, 0.0))
      .toDF("d", "l_extendedprice", "l_discount")
      .select(to_timestamp(col("d")).as("l_shipdate"),
        col("l_extendedprice"), col("l_discount"), lit("A").as("l_returnflag"))
      .write.parquet(s"$dir/lineitem.parquet")
    val row = TimeSeriesQueries.q225.run(spark, dir).collect().head
    assert(row.getAs[Long]("n_persist") == 1L)
    assert(row.getAs[Long]("mae_persist_cents") == 1050L,
      "fractional cents must truncate: 9.5095 → 950, not 951")
  }

  test("q231 Theil–Sen: one anomalous day cannot move the median off the true slope") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q231fix").toString
    // 4 days climbing exactly 1 cent/day (1.00 → 1.03), then a 10.00
    // outlier on day 5. All 10 pairwise slopes in milli-cents/day:
    // six pairs among the clean days = 1000; the four outlier pairs =
    // 225000/299000/449000/897000. Fixed-rank picks over the sorted
    // list: q1 (rank 3) = 1000, median (rank 5) = 1000 — the true
    // slope, untouched by the outlier OLS would chase — q3 (rank 7) =
    // 225000, the band exposing the contamination.
    val rows = Seq(
      ("1995-01-01", 1.00), ("1995-01-02", 1.01), ("1995-01-03", 1.02),
      ("1995-01-04", 1.03), ("1995-01-05", 10.00))
    rows.toDF("d", "l_extendedprice")
      .select(to_timestamp(col("d")).as("l_shipdate"), col("l_extendedprice"),
        lit(0.0).as("l_discount"), lit("A").as("l_returnflag"))
      .write.parquet(s"$dir/lineitem.parquet")
    val r = TimeSeriesQueries.q231.run(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_days") == 5L && row.getAs[Long]("n_pairs") == 10L)
    assert(row.getAs[Long]("slope_q1_milli") == 1000L)
    assert(row.getAs[Long]("slope_med_milli") == 1000L,
      "the pairwise-slope median must resist a single anomalous day")
    assert(row.getAs[Long]("slope_q3_milli") == 225000L)
  }

  test("q243 conformal band: rank pick, band value, and holdout coverage, hand-planted") {
    val dir = java.nio.file.Files.createTempDirectory("q243fix").toString
    // flag A: base week at 10.00; then 21 calibration days whose lag-7
    // residuals are a permutation of 1..21 cents -> n_cal = 21,
    // k = (9*22+9) div 10 = 20, band = 20 cents (2nd largest).
    // Holdout: residual 5 (covered) and residual 100 (not) -> 5000 bp.
    val rs = (0 until 21).map(i => ((i * 5) % 21) + 1)
    val vals = scala.collection.mutable.Map[Int, Long]() // day index -> cents
    (0 until 7).foreach(i => vals(i) = 1000L)
    rs.zipWithIndex.foreach { case (r, i) => vals(i + 7) = vals(i) + r }
    val d0 = java.time.LocalDate.parse("2000-01-01")
    val calRows = vals.toSeq.map { case (i, c) =>
      (d0.plusDays(i).toString, c / 100.0)
    }
    val holdRows = Seq(
      ("2001-01-01", 5.00), ("2001-01-08", 5.05),   // r = 5
      ("2001-01-02", 5.00), ("2001-01-09", 6.00))   // r = 100
    (calRows ++ holdRows).toDF("d", "l_extendedprice")
      .select(to_timestamp(col("d")).as("l_shipdate"),
        col("l_extendedprice"), lit("A").as("l_returnflag"))
      .write.parquet(s"$dir/lineitem.parquet")
    val r = TimeSeriesQueries.q243.run(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_cal") == 21L)
    assert(row.getAs[Long]("band_cents") == 20L)
    assert(row.getAs[Long]("n_hold") == 2L)
    assert(row.getAs[Long]("cover_bp") == 5000L)
  }
}
