package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The three properties that justify shipping sketches instead of
  * exact distincts: bounded error, exact mergeability (union of
  * per-day sketches ≡ one-shot sketch — THE reaggregation story), and
  * theta's set algebra estimating intersections HLL cannot.
  */
class SketchQueriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = Tables.events(spark, sfDir).select(
    col("event_type"), col("user_id"), to_date(col("ts").cast("timestamp")).as("day"))

  test("q119: HLL and theta estimates land within 5% of exact per event type") {
    val rows = Registry.byName("q119_sketch_reach").run(spark, sfDir)
      .select("event_type", "hll_users", "theta_users", "exact_users")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, hll, theta, exact) =>
      assert(math.abs(hll - exact).toDouble / exact < 0.05, s"$t: hll=$hll exact=$exact")
      assert(math.abs(theta - exact) / exact < 0.05, s"$t: theta=$theta exact=$exact")
    }
  }

  test("union of per-day sketches equals the one-shot sketch — reaggregation without raw data") {
    val daily = ev.groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val oneShot = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val m = merged.as[(String, Long)].collect().toMap
    val o = oneShot.as[(String, Long)].collect().toMap
    assert(m == o, s"merged-daily and one-shot estimates must be IDENTICAL: $m vs $o")
  }

  test("theta set algebra: view ∩ purchase audience within 10% of the exact overlap") {
    val sk = ev.where(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(theta_sketch_agg(col("user_id")).as("sk"))
    val both = sk.agg(
      theta_sketch_estimate(
        theta_intersection(
          max(when(col("event_type") === "view", col("sk"))),
          max(when(col("event_type") === "purchase", col("sk"))))).as("est"))
      .as[Double].head()
    val exact = ev.where(col("event_type") === "view").select("user_id").distinct()
      .intersect(ev.where(col("event_type") === "purchase").select("user_id").distinct())
      .count()
    assert(exact > 0, "fixture must have overlapping audiences")
    assert(math.abs(both - exact) / exact < 0.10, s"theta∩=$both exact=$exact")
  }

  test("q181: KLL quantiles respect the rank-error contract against exact ranks") {
    val rows = SketchQueries.q181.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val n = r.getAs[Long]("n_rows").toDouble
      for ((cname, q) <- Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))) {
        val v = r.getAs[Double](cname)
        val rank = li.where(col("l_returnflag") === flag &&
          col("l_extendedprice") <= v).count().toDouble / n
        // k=200 KLL: ~1.65% normalized rank error at 99% confidence
        assert(math.abs(rank - q) <= 0.03,
          s"$flag $cname: estimated value sits at rank $rank, wanted $q +- 0.03")
      }
    }
  }

  test("q181: monthly KLL sketches merge to the one-shot sketch's quantiles (rank-bounded)") {
    val li = Tables.lineitem(spark, sfDir)
    val merged = li
      .groupBy(month(col("l_shipdate")).as("m"))
      .agg(expr("kll_sketch_agg_double(l_extendedprice)").as("sk"))
      .agg(expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5)").as("p50"))
      .head().getAs[Double]("p50")
    val n = li.count().toDouble
    val rank = li.where(col("l_extendedprice") <= merged).count().toDouble / n
    assert(math.abs(rank - 0.5) <= 0.03,
      s"merged-monthly P50 sits at rank $rank — mergeability broken")
  }

  test("q209: rolling sketch reach within 5% of the in-row exact trailing distinct") {
    val rows = SketchQueries.q209.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getAs[Long]("est_users"), r.getAs[Long]("exact_users"))
      assert(exact > 0)
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"day ${r.getAs[Long]("day")}: est=$est exact=$exact")
    }
    // windows genuinely roll: the trailing-7 reach must exceed the
    // busiest single day's reach somewhere (otherwise the union did
    // nothing)
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts").cast("timestamp")).as("d"))
      .agg(countDistinct(col("user_id")).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("exact_users")).max >= daily,
      "trailing-7 reach must dominate any single day")
  }

  test("q196: CMS estimates are one-sided (est ≥ exact) and ε-bounded") {
    val rows = SketchQueries.q196.run(spark, sfDir).collect()
    assert(rows.length >= 10, "3 top users per event type expected")
    val totals = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { r =>
      val (t, exact, est) = (r.getAs[String]("event_type"),
        r.getAs[Long]("exact_n"), r.getAs[Long]("est_n"))
      assert(est >= exact, s"$t: CMS must never under-count (est=$est exact=$exact)")
      // ε = 0.001 ⇒ overshoot ≤ ε·N (deterministic for the fixed seed;
      // the 3× slack keeps this robust to testdata regeneration)
      assert(est - exact <= math.max(3L, (0.003 * totals(t)).toLong),
        s"$t: overshoot ${est - exact} beyond ε·N bound (N=${totals(t)})")
    }
  }

  test("q196: merged per-shard sketches ≡ one-shot sketch — CMS merge is exact") {
    import graft.expressions.SketchExpressions
    val users = ev.select("event_type", "user_id")
    val viaShards = users
      .withColumn("shard", pmod(col("user_id"), lit(8)))
      .groupBy("event_type", "shard")
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("cms"))
      .groupBy("event_type")
      .agg(collect_list(col("cms")).as("sks"))
      .select(col("event_type"), SketchExpressions.cmsMergeAll(col("sks")).as("cms"))
    val oneShot = users.groupBy("event_type")
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("cms"))
    val probe = users.select("event_type", "user_id").distinct()
    def estimates(sk: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
      probe.join(sk, Seq("event_type"))
        .select(col("event_type"), col("user_id"),
          SketchExpressions.cmsEstimate(col("cms"), col("user_id")).as("e"))
        .as[(String, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(estimates(viaShards) == estimates(oneShot),
      "shard-merged and one-shot CMS must answer every point query identically")
  }

  test("cms_estimate accepts every item type the builtin aggregate sketches") {
    import graft.expressions.SketchExpressions
    // string column: sketch event_type itself, then point-query it
    val strSk = ev.agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("cms"))
    val strEst = ev.groupBy("event_type").count()
      .crossJoin(strSk)
      .select(col("event_type"), col("count"),
        SketchExpressions.cmsEstimate(col("cms"), col("event_type")).as("e"))
      .as[(String, Long, Long)].collect()
    strEst.foreach { case (t, exact, est) =>
      assert(est >= exact && est - exact <= math.max(3L, (0.003 * ev.count()).toLong),
        s"string item '$t': est=$est exact=$exact")
    }
    // int item against a long-built sketch: widened to the same long path
    val intSk = ev.agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("cms"))
    val someUser = ev.select("user_id").head().getLong(0)
    val viaInt = intSk.select(SketchExpressions.cmsEstimate(
      col("cms"), lit(someUser.toInt)).as("e")).head().getLong(0)
    val viaLong = intSk.select(SketchExpressions.cmsEstimate(
      col("cms"), lit(someUser)).as("e")).head().getLong(0)
    assert(viaInt == viaLong, "int item must widen to the identical long hash path")
  }

}
