package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for q49–q54 (the DuckDB oracle pins exact values;
  * these pin the *meaning*, so a future refactor that stays hash-equal
  * by accident still can't drift semantically).
  */
class AnalyticQueriesSpec extends SparkSpec {

  test("q49: percentiles are ordered within every group") {
    val rows = AnalyticQueries.q49.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p75) =
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75, s"unordered percentiles in $r")
    }
  }

  test("q50: cube emits every grain and the ALL/ALL row is the grand total") {
    val df = AnalyticQueries.q50.run(spark, sfDir)
    val rows = df.collect()
    val statuses = rows.map(_.getAs[String]("status_lbl")).distinct
    val years = rows.map(_.getAs[String]("yr_lbl")).distinct
    assert(statuses.contains("ALL") && years.contains("ALL"))
    // 4 grains: (s,y), (s,ALL), (ALL,y), (ALL,ALL). CUBE only emits
    // groups present in the data, so count leaves actually present
    // instead of assuming a full nS × nY cross product.
    val nS = statuses.count(_ != "ALL")
    val nY = years.count(_ != "ALL")
    val nLeaves = rows.count(r =>
      r.getAs[String]("status_lbl") != "ALL" && r.getAs[String]("yr_lbl") != "ALL")
    assert(rows.length == nLeaves + nS + nY + 1,
      s"expected cube lattice ($nLeaves leaves + $nS + $nY + 1), got ${rows.length} rows")
    val grand = rows.filter(r =>
      r.getAs[String]("status_lbl") == "ALL" && r.getAs[String]("yr_lbl") == "ALL")
    assert(grand.length == 1)
    val leafCount = rows
      .filter(r => r.getAs[String]("status_lbl") != "ALL" && r.getAs[String]("yr_lbl") != "ALL")
      .map(_.getAs[Long]("n_orders")).sum
    assert(grand.head.getAs[Long]("n_orders") == leafCount)
  }

  test("q51: pivot columns partition the yearly total") {
    val wide = AnalyticQueries.q51.run(spark, sfDir)
    assert(wide.columns.toSeq == Seq("yr", "F", "O", "P"))
    // Row-wise F+O+P must equal the unpivoted yearly total (null = no
    // orders in that status-year).
    val totals = graft.ops.Tables.orders(spark, sfDir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(Exact.dsum("o_totalprice").as("total"))
    val joined = wide
      .select(col("yr"),
        (coalesce(col("F"), lit(0d)) + coalesce(col("O"), lit(0d)) + coalesce(col("P"), lit(0d)))
          .as("wide_total"))
      .join(totals, "yr")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("wide_total") - r.getAs[Double]("total")) < 1e-6, r.toString)
    }
  }

  test("q52: window frames — first-row ma7 equals revenue, cum_revenue runs monotone") {
    val rows = AnalyticQueries.q52.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_.getAs[Long]("cust"))
    byCust.foreach { case (_, rs) =>
      // rows arrive ordered (cust, day) from the query's total ORDER BY
      val first = rs.head
      assert(math.abs(first.getAs[Double]("ma7") - first.getAs[Double]("revenue")) < 1e-6)
      val cums = rs.map(_.getAs[Double]("cum_revenue"))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a },
        "cum_revenue must be nondecreasing (revenue is nonnegative)")
    }
  }

  test("q53: rankings are deterministic and mutually consistent") {
    val rows = AnalyticQueries.q53.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (_, rs) =>
      val rns = rs.map(_.getAs[Int]("rn")).sorted.toSeq
      assert(rns == (1 to rns.length), s"row_number must be dense 1..n, got $rns")
      rs.foreach { r =>
        assert(r.getAs[Int]("rk") <= r.getAs[Int]("rn"), "rank <= row_number")
        assert(r.getAs[Int]("drk") <= r.getAs[Int]("rk"), "dense_rank <= rank")
        assert((1 to 4).contains(r.getAs[Int]("quartile")))
      }
    }
  }

  test("q56: funnel gating — strict order AND conversion window, per constructed fixture") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full funnel inside windows → depth 3
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 11:00:00")),
      (1L, "purchase", t("2024-01-01 12:30:00")),
      // user 2: click BEFORE first view → not a conversion → depth 1
      (2L, "click", t("2024-01-01 09:00:00")),
      (2L, "view", t("2024-01-01 10:00:00")),
      // user 3: click outside the 2h window → depth 1
      (3L, "view", t("2024-01-01 10:00:00")),
      (3L, "click", t("2024-01-01 12:00:01")),
      // user 4: no view at all (error events only) → depth 0
      (4L, "error", t("2024-01-01 10:00:00")),
      // user 5: purchase without click → depth 1 (sequence, not set)
      (5L, "view", t("2024-01-01 10:00:00")),
      (5L, "purchase", t("2024-01-01 10:30:00")),
      // user 6: SECOND view opens no new window (earliest-completion
      // gating) — click is 1h after view#2 but 3h after view#1 → depth 1
      (6L, "view", t("2024-01-01 10:00:00")),
      (6L, "view", t("2024-01-01 12:00:00")),
      (6L, "click", t("2024-01-01 13:00:00")),
    ).toDF("user_id", "event_type", "ts")
    val depths = AnalyticQueries
      .funnelDepths(ev, Seq("view", "click", "purchase"), "2 HOURS")
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("depth")).toMap
    assert(depths == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 1, 6L -> 1))
  }

  test("q57: cohort offsets are whole weeks and week 0 covers every cohort") {
    val rows = AnalyticQueries.q57.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_epoch_day"))
    byCohort.foreach { case (_, rs) =>
      val offsets = rs.map(_.getAs[Long]("weeks_since"))
      assert(offsets.contains(0L), "a user's first-active week is always active")
      assert(offsets.forall(_ >= 0L))
    }
    // cohort keys are Mondays (ISO week truncation): epoch day 0 was a Thursday
    byCohort.keys.foreach(d => assert(math.floorMod(d + 3, 7) == 0, s"epoch day $d is not a Monday"))
  }

  test("q58: streaks on the real table agree with a brute-force per-user recomputation") {
    val rows = AnalyticQueries.q58.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // brute-force oracle: longest run of consecutive days from the raw table
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .collect().map(r => r.getLong(0) -> r.getAs[java.sql.Date]("day").toLocalDate)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val uid = r.getLong(0)
      val ds = days(uid)
      var best = 1L; var cur = 1L
      ds.sliding(2).filter(_.length == 2).foreach { p =>
        cur = if (p(1) == p(0).plusDays(1)) cur + 1 else 1
        best = math.max(best, cur)
      }
      assert(r.getAs[Long]("longest_streak") == best, s"user $uid")
    }
  }

  test("q59: JSON field totals cover every event") {
    val rows = AnalyticQueries.q59.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      // n_parsed counts non-null extractions — a typo'd JSON path would
      // fail HERE (count(*) alone cannot detect silent null-drop)
      assert(r.getAs[Long]("n_parsed") == r.getAs[Long]("n"),
        "every event's props must parse to a non-null k")
      assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k"))
    }
  }

  test("q60: users_csv is the sorted distinct membership it claims") {
    AnalyticQueries.q60.run(spark, sfDir).collect().foreach { r =>
      val members = r.getAs[String]("users_csv").split(",").toSeq
      assert(members.length.toLong == r.getAs[Long]("n_users"))
      assert(members == members.distinct.sorted, "csv must be sorted distinct")
    }
  }

  test("q61: exact-co-moment correlation agrees with Spark's streaming corr()") {
    val exact = AnalyticQueries.q61.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("corr_qty_price")).toMap
    val streaming = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(corr("l_quantity", "l_extendedprice").as("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("c")).toMap
    assert(exact.keySet == streaming.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - streaming(k)) < 1e-6, s"flag $k: $v vs ${streaming(k)}")
      assert(math.abs(v) <= 1.0)
    }
  }

  test("q62: unpivot is the exact inverse of the q51 pivot (round trip)") {
    val wide = AnalyticQueries.q51.run(spark, sfDir).collect()
    val long = AnalyticQueries.q62.run(spark, sfDir).collect()
    val nonNullCells = wide.map(r =>
      Seq("F", "O", "P").count(c => !r.isNullAt(r.fieldIndex(c)))).sum
    assert(long.length == nonNullCells, "one long row per non-null wide cell")
    // every long row equals its wide cell
    val wideMap = wide.map(r => r.getAs[Int]("yr") -> r).toMap
    long.foreach { r =>
      val cell = wideMap(r.getAs[Int]("yr")).getAs[Double](r.getAs[String]("status"))
      assert(cell == r.getAs[Double]("total"))
    }
  }

  test("q63: heavy-hitter shares are consistent fractions of the table") {
    val total = Tables.events(spark, sfDir).count().toDouble
    val rows = AnalyticQueries.q63.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("share") > 0.15)
      assert(math.abs(r.getAs[Double]("share") - r.getAs[Long]("cnt") / total) < 1e-6)
    }
    // each share is rounded to 6dp (±5e-7), so the sum's bound is n·5e-7
    assert(rows.map(_.getAs[Double]("share")).sum <= 1.0 + rows.length * 5e-7)
  }

  test("q64: percent_rank and cume_dist are proper per-group CDFs") {
    val rows = AnalyticQueries.q64.run(spark, sfDir).collect()
    val n = Tables.customer(spark, sfDir).count()
    assert(rows.length == n, "one rank row per customer")
    val byNation = rows.groupBy(_.getAs[Number]("c_nationkey").longValue)
    byNation.foreach { case (_, rs) =>
      rs.foreach { r =>
        val (pr, cd) = (r.getAs[Double]("pr"), r.getAs[Double]("cd"))
        assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
        assert(pr <= cd + 1e-9, "percent_rank never exceeds cume_dist")
      }
      assert(rs.exists(_.getAs[Double]("pr") == 0.0), "group minimum has pr=0")
      assert(rs.exists(_.getAs[Double]("cd") == 1.0), "group maximum has cd=1")
    }
  }

  test("q67: rank-trimmed mean keeps ~98% and discards both tails") {
    val got = AnalyticQueries.q67.run(spark, sfDir).collect()
    val totals = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), min("l_extendedprice").as("lo"),
        max("l_extendedprice").as("hi"), avg("l_extendedprice").as("plain"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    got.foreach { r =>
      val t = totals(r.getAs[String]("l_returnflag"))
      val kept = r.getAs[Long]("n_kept").toDouble / t.getAs[Long]("n")
      assert(kept > 0.955 && kept < 0.995, s"trim fraction $kept not ≈ 98%")
      val avg = r.getAs[Double]("trimmed_avg")
      assert(avg > t.getAs[Double]("lo") && avg < t.getAs[Double]("hi"))
    }
  }

  test("q73: SCD2 intervals are per-user contiguous, open-ended last, type-alternating") {
    val rows = AnalyticQueries.q73.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("valid_from_us"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"),
            s"user $u: intervals must chain exactly")
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"),
            s"user $u: consecutive intervals with the same type were not collapsed")
        case _ => ()
      }
      assert(sorted.last.get(sorted.last.fieldIndex("valid_to_us")) == null,
        s"user $u: the current interval must be open-ended")
    }
  }

  test("q74: monthly reaggregation conserves total revenue and day counts") {
    val monthly = AnalyticQueries.q74.run(spark, sfDir).collect()
    val direct = Tables.lineitem(spark, sfDir)
      .agg(Exact.revenueExpr.as("rev"),
        countDistinct(col("l_shipdate").cast("date")).as("days"))
      .head()
    assert(math.abs(monthly.map(_.getAs[Double]("revenue")).sum - direct.getAs[Double]("rev"))
      < 1e-4, "sum of monthly == direct total (decimal-exact routes)")
    assert(monthly.map(_.getAs[Long]("n_days")).sum == direct.getAs[Long]("days"))
  }

  test("q81: only the requested grains appear, and each grain totals consistently") {
    val rows = AnalyticQueries.q81.run(spark, sfDir).collect()
    def isAll(r: org.apache.spark.sql.Row, c: String) = r.getAs[String](c) == "ALL"
    // requested: (s,p), (s), (); NOT (p) alone
    assert(!rows.exists(r => isAll(r, "status_lbl") && !isAll(r, "prio_lbl")),
      "the unrequested (priority)-only grain must not appear")
    val grand = rows.filter(r => isAll(r, "status_lbl") && isAll(r, "prio_lbl"))
    assert(grand.length == 1)
    val leaves = rows.filter(r => !isAll(r, "status_lbl") && !isAll(r, "prio_lbl"))
    val mids = rows.filter(r => !isAll(r, "status_lbl") && isAll(r, "prio_lbl"))
    assert(leaves.map(_.getAs[Long]("n_orders")).sum == grand.head.getAs[Long]("n_orders"))
    assert(mids.map(_.getAs[Long]("n_orders")).sum == grand.head.getAs[Long]("n_orders"))
  }

  test("q82: exactly ceil(20%) per stratum, deterministic across runs") {
    val rows = AnalyticQueries.q82.run(spark, sfDir).collect()
    val totals = Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val perSource = rows.groupBy(_.getAs[String]("source"))
    totals.foreach { case (src, n) =>
      val want = math.ceil(n * 0.2).toLong
      assert(perSource.get(src).map(_.length.toLong).getOrElse(0L) == want,
        s"$src must sample exactly ceil(0.2·$n) = $want")
    }
    val again = AnalyticQueries.q82.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(again == rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet)
  }

  test("q83: buckets are equal-depth within 1 and ordered by value range") {
    val rows = AnalyticQueries.q83.run(spark, sfDir).collect()
    rows.groupBy(_.getAs[String]("l_returnflag")).foreach { case (f, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("bucket"))
      assert(sorted.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L, 4L))
      val counts = sorted.map(_.getAs[Long]("n"))
      assert(counts.max - counts.min <= 1, s"$f: equi-depth within 1, got ${counts.toSeq}")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9,
            s"$f: bucket ranges must not overlap")
        case _ => ()
      }
    }
  }

  test("q84: EXCEPT and INTERSECT partition the 1997 cohort") {
    val rows = AnalyticQueries.q84.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("cohort") -> r.getAs[Long]("n_customers")).toMap
    val y97 = Tables.orders(spark, sfDir)
      .where(year(col("o_orderdate")) === 1997).select("o_custkey").distinct().count()
    assert(rows("only_1997") + rows("both_years") == y97,
      "only-1997 ⊎ both-years must partition the 1997 customer set")
  }

  test("q85: interval durations telescope to the user's time span; TWA bounded by k range") {
    val rows = AnalyticQueries.q85.run(spark, sfDir).collect()
    val spans = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("user_id")
      .agg((max("us") - min("us")).as("span"), min("k").as("klo"), max("k").as("khi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = spans(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("span_us") == t.getAs[Long]("span"),
        "lead-diff intervals must telescope to max(ts) - min(ts)")
      assert(r.getAs[Long]("n_intervals") == t.getAs[Long]("n") - 1)
      val twa = r.getAs[Double]("twa_k")
      assert(twa >= t.getAs[Long]("klo") - 1e-6 && twa <= t.getAs[Long]("khi") + 1e-6,
        "a weighted average cannot leave the value range")
    }
  }

  test("q80: one mode row per active user; it really is the max count") {
    val rows = AnalyticQueries.q80.run(spark, sfDir).collect()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.length == users, "exactly one mode per user")
    val maxes = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type").count()
      .groupBy("user_id").agg(max("count").as("mx"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("mx")).toMap
    rows.foreach(r => assert(r.getAs[Long]("n") == maxes(r.getAs[Long]("user_id")),
      s"mode count must equal the user's max type count: $r"))
  }

  test("q54: hopping 10m/5m assigns every event to exactly 2 windows") {
    val winEvents = AnalyticQueries.q54.run(spark, sfDir)
      .agg(sum("n_events")).head.getLong(0)
    val events = Tables.events(spark, sfDir).count()
    assert(winEvents == 2 * events,
      s"size/slide=2 overlapping windows: $winEvents != 2×$events")
  }

  test("q157 shares telescope: region shares sum to ~10⁴, one region share per region") {
    val rows = AnalyticQueries.q157.run(spark, sfDir).collect()
    val byRegion = rows.groupBy(_.getAs[String]("region"))
    byRegion.foreach { case (reg, rs) =>
      // floor loss < 1 bp per nation
      val s = rs.map(_.getAs[Long]("share_of_region_bp")).sum
      assert(s <= 10000L && s > 10000L - rs.length, s"$reg region-share sum $s")
      assert(rs.map(_.getAs[Long]("region_share_bp")).distinct.length == 1,
        s"$reg must carry ONE region-of-total share")
    }
    val rshares = byRegion.map(_._2.head.getAs[Long]("region_share_bp")).sum
    assert(rshares <= 10000L && rshares > 10000L - byRegion.size)
  }

  test("q194: CDC tombstones drop keys, updates after deletes re-materialize") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q194fix").toString
    // user 1: I,U          → survives as U
    // user 2: I,U,D        → tombstoned, absent
    // user 3: I,D,U        → delete then update → re-materialized
    // user 4: D            → delete of a never-inserted key → absent
    // user 5: U            → update without insert → upsert, survives
    Seq(
      (1L, "2024-01-01 00:00:01", 1L, "signup", 1.0),
      (2L, "2024-01-01 00:00:02", 1L, "click", 2.0),
      (3L, "2024-01-01 00:00:01", 2L, "signup", 3.0),
      (4L, "2024-01-01 00:00:02", 2L, "view", 4.0),
      (5L, "2024-01-01 00:00:03", 2L, "error", 5.0),
      (6L, "2024-01-01 00:00:01", 3L, "signup", 6.0),
      (7L, "2024-01-01 00:00:02", 3L, "error", 7.0),
      (8L, "2024-01-01 00:00:03", 3L, "purchase", 8.5),
      (9L, "2024-01-01 00:00:01", 4L, "error", 9.0),
      (10L, "2024-01-01 00:00:01", 5L, "click", 10.0),
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val rows = AnalyticQueries.q194.run(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(rows.keySet == Set(1L, 3L, 5L), s"got ${rows.keySet}")
    assert(rows(1L).getAs[String]("last_op") == "U" &&
      rows(1L).getAs[Double]("last_value") == 2.0)
    assert(rows(3L).getAs[String]("last_op") == "U" &&
      rows(3L).getAs[Double]("last_value") == 8.5 &&
      rows(3L).getAs[Long]("n_deletes_replayed") == 1L)
    assert(rows(5L).getAs[Long]("n_ops") == 1L)
  }

  test("q210: FIFO overlap matching — oldest receipts absorb issues, shortfall reported") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q210fix").toString
    // part 1: receipts (odd ln) 10 then 5; issues (even ln) 8 then 6.
    // FIFO: issue#1 (qty axis [0,8)) overlaps receipt#1 [0,10) → 8;
    // issue#2 [8,14) overlaps receipt#1 by 2 and receipt#2 [10,15) by 4
    // → matched 14, short 0, 3 match pairs.
    // part 2: receipt 3, issue 9 → matched 3, short 6, 1 pair.
    Seq(
      (1L, 101L, 1, "1995-01-01", 10.0),
      (1L, 102L, 3, "1995-01-02", 5.0),
      (1L, 103L, 2, "1995-01-03", 8.0),
      (1L, 104L, 4, "1995-01-04", 6.0),
      (2L, 105L, 1, "1995-01-01", 3.0),
      (2L, 106L, 2, "1995-01-02", 9.0),
    ).toDF("l_partkey", "l_orderkey", "l_linenumber", "dt", "l_quantity")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        to_timestamp(col("dt")).as("l_shipdate"), col("l_quantity"))
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = AnalyticQueries.q210.run(spark, dir).collect()
      .map(r => r.getAs[Long]("pk") -> r).toMap
    assert(rows(1L).getAs[Long]("matched_qty") == 14L)
    assert(rows(1L).getAs[Long]("short_qty") == 0L)
    assert(rows(1L).getAs[Long]("n_matches") == 3L)
    assert(rows(2L).getAs[Long]("matched_qty") == 3L)
    assert(rows(2L).getAs[Long]("short_qty") == 6L)
    assert(rows(2L).getAs[Long]("n_matches") == 1L)
  }

  test("q215: merged history+delta state is row-identical to a from-scratch recompute") {
    import spark.implicits._
    // the algebraic-identity claim, pinned inside Spark (the DuckDB
    // oracle pins it cross-engine): merge(state(hist), state(delta))
    // must equal the direct full aggregation, bit-for-bit — decimal
    // accumulation makes this exact, not approximate.
    val merged = AnalyticQueries.q215.run(spark, sfDir)
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag").as("flag"),
        date_trunc("month", col("l_shipdate").cast("date")).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("qty_dec"),
        Exact.revenueDecimal.as("rev_dec"),
        min(col("l_shipdate").cast("date")).as("min_day"),
        max(col("l_shipdate").cast("date")).as("max_day"))
      .select(col("flag"), col("month"), col("n"),
        col("qty_dec").cast("double").as("sum_qty"),
        col("rev_dec").cast("double").as("revenue"),
        col("min_day"), col("max_day"),
        round(col("qty_dec").cast("double") / col("n"), 6).as("avg_qty"))
      .orderBy("flag", "month")
    assert(merged.collect().toSeq == direct.collect().toSeq)
    // groups live on both sides of the cutoff (the merge is exercised)
    val months = merged.select("month").as[java.sql.Date].collect().map(_.toString)
    assert(months.exists(_ < "1998-06") && months.exists(_ >= "1998-06"),
      "fixture no longer spans the delta cutoff — the merge path is untested")
  }

  test("q221: delete retracts, update replaces, churn counts gross movement") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q221fix").toString
    // user 1 (grp 1): I v=10 → U v=20 → D.  contributions 10, 20, 0;
    //   deltas +10, +10, −20 ⇒ net 0, churn 40, dead.
    // user 2 (grp 2): I v=5 → U v=7.  deltas +5, +2 ⇒ net 7, churn 7, alive.
    Seq(
      (101L, "2020-01-01 00:00:00", 1L, "signup", 10.0),
      (102L, "2020-01-01 00:01:00", 1L, "click", 20.0),
      (103L, "2020-01-01 00:02:00", 1L, "error", 99.0),
      (104L, "2020-01-01 00:00:00", 2L, "signup", 5.0),
      (105L, "2020-01-01 00:01:00", 2L, "click", 7.0),
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.parquet(s"$dir/events.parquet")
    val got = AnalyticQueries.q221.run(spark, dir).collect()
      .map(r => r.getAs[Long]("grp") ->
        (r.getAs[Long]("n_alive"), r.getAs[Double]("sum_value"),
          r.getAs[Long]("n_ops"), r.getAs[Double]("churn"))).toMap
    assert(got(1L) == ((0L, 0.0, 3L, 40.0)), s"deleted key not retracted: ${got(1L)}")
    assert(got(2L) == ((1L, 7.0, 2L, 7.0)), s"update not replaced: ${got(2L)}")
  }

  test("q223: steady-but-never-daily-top user wins the true ranking and the merge misses it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q223fix").toString
    // day 1: users 11–15 burst 3 events each (they fill the daily top-5);
    // day 2: users 21–25 likewise. user 1 posts 2 events BOTH days —
    // never in a daily top-5, but 4 total beats every burster's 3.
    var id = 0L
    def ev(day: String, user: Long, n: Int) = (1 to n).map { i =>
      id += 1; (id, s"$day 0$i:00:00", user, "click", 1.0)
    }
    val rows =
      (11L to 15L).flatMap(u => ev("2020-01-01", u, 3)) ++
        (21L to 25L).flatMap(u => ev("2020-01-02", u, 3)) ++
        ev("2020-01-01", 1L, 2) ++ ev("2020-01-02", 1L, 2)
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.parquet(s"$dir/events.parquet")
    val got = AnalyticQueries.q223.run(spark, dir).collect()
    val r1 = got.find(_.getAs[Int]("rank") == 1).get
    assert(r1.getAs[Long]("true_user") == 1L, "true #1 must be the steady user")
    assert(!r1.getAs[Boolean]("agree"), "the merged path must miss the steady user")
    assert(r1.getAs[Long]("missed_total") == 1L, "true 4 vs merged best 3")
  }
}
