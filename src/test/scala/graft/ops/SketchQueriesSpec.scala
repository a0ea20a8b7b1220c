package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The properties that justify shipping sketches instead of exact
  * distincts: bounded error, exact mergeability (union of per-part
  * sketches ≡ one-shot sketch — THE reaggregation story), and theta's
  * set algebra estimating intersections HLL cannot. Covers BOTH
  * families: the portable integer forms the registered queries run
  * (KMV reach, bottom-k-by-hash quantiles, portable CMS — each
  * DuckDB-oracle-checked for exactness, so the spec pins their
  * STATISTICAL contracts) and the Spark-native DataSketches
  * aggregates that remain the at-scale binary-partial machinery.
  */
class SketchQueriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = Tables.events(spark, sfDir).select(
    col("event_type"), col("user_id"), to_date(col("ts").cast("timestamp")).as("day"))

  // ------------------------------------------------------------------
  // Portable forms (the registered queries)
  // ------------------------------------------------------------------

  test("q119: KMV reach is exact below k and error-bounded above it") {
    val rows = Registry.byName("q119_sketch_reach").run(spark, sfDir)
      .select("event_type", "est_users", "exact_users")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, est, exact) =>
      if (exact < 256) // n < k ⇒ the KMV estimate IS the exact distinct count
        assert(est == exact, s"$t: below k the sketch must be exact (est=$est exact=$exact)")
      else // k=256 ⇒ σ ≈ 1/√254 ≈ 6.3%; pin 4σ
        assert(math.abs(est - exact).toDouble / exact < 0.25, s"$t: est=$est exact=$exact")
    }
  }

  test("q119: KMV estimator stays error-bounded well above k (synthetic 50k distinct)") {
    import graft.functions.MinHash.portableHash60
    // 50 000 distinct ids ≫ k=256: the division branch is exercised
    // regardless of testdata scale.
    val n = 50000
    val est = spark.range(n.toLong)
      .select(shiftright(portableHash60(concat(lit("u|"), col("id").cast("string"))), 12).as("h48"))
      .distinct()
      .orderBy("h48").limit(256)
      .agg(max("h48")).as[Long].head()
    val kmv = (255L << 48) / est
    assert(math.abs(kmv - n).toDouble / n < 0.25,
      s"KMV at n=$n: est=$kmv (k=256, 4σ ≈ 25%)")
  }

  test("q119: bottom-k of unioned daily bottom-k's equals the one-shot bottom-k — exact mergeability") {
    import graft.functions.MinHash.portableHash60
    val hashed = ev.select(col("event_type"), col("day"),
      shiftright(portableHash60(concat(lit("u|"), col("user_id").cast("string"))), 12).as("h48"))
    import org.apache.spark.sql.expressions.Window
    // per-day bottom-k states
    val daily = hashed.select("event_type", "day", "h48").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type", "day").orderBy("h48")))
      .where(col("rn") <= 256).select("event_type", "h48")
    def bottomK(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
      df.distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("h48")))
        .where(col("rn") <= 256)
        .groupBy("event_type").agg(sort_array(collect_list("h48")).as("ks"))
        .as[(String, Seq[Long])].collect().toMap
    val merged = bottomK(daily)
    val oneShot = bottomK(hashed.select("event_type", "h48"))
    assert(merged == oneShot,
      "bottom-k(union of per-day bottom-k states) must equal bottom-k(all) EXACTLY")
  }

  test("q181: sample quantiles respect the rank-error contract against exact ranks") {
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
        // k=1024 sample: σ = √(p(1−p)/k) ≤ 1.6%; pin ~3σ
        assert(math.abs(rank - q) <= 0.05,
          s"$flag $cname: estimated value sits at rank $rank, wanted $q +- 0.05")
      }
    }
  }

  test("q181: every quantile estimate is an actual data value (nearest-rank, no interpolation)") {
    val rows = SketchQueries.q181.run(spark, sfDir).collect()
    val li = Tables.lineitem(spark, sfDir)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val prices = Seq(r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Double]("p99"))
      val found = li.where(col("l_returnflag") === flag &&
        col("l_extendedprice").isin(prices: _*)).count()
      assert(found >= 1, s"$flag: picked values must exist in the data")
    }
  }

  test("q196: CMS estimates are one-sided (est ≥ exact) and collision-bounded") {
    val rows = SketchQueries.q196.run(spark, sfDir).collect()
    assert(rows.length >= 10, "3 top users per event type expected")
    val totals = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { r =>
      val (t, exact, est) = (r.getAs[String]("event_type"),
        r.getAs[Long]("exact_n"), r.getAs[Long]("est_n"))
      assert(est >= exact, s"$t: CMS must never under-count (est=$est exact=$exact)")
      // d=4, w=1024: expected overshoot per row ≈ (N−f)/w; min over 4
      // rows is far tighter. Pin 16·N/w + 3 (generous, deterministic
      // for fixed data, robust to testdata regeneration).
      assert(est - exact <= 3L + 16L * totals(t) / 1024L,
        s"$t: overshoot ${est - exact} beyond the d×w collision bound (N=${totals(t)})")
    }
  }

  test("q196: the portable CMS build is shard-merge-exact by construction (counters add)") {
    import graft.functions.MinHash.portableHash60
    // counter[d][b] built per shard then SUMMED must equal the one-shot
    // counter — trivially true for a sum, which is exactly the point:
    // the groupBy IS the CMS merge. Verify on row d=0.
    val cells = ev.where(col("user_id").isNotNull)
      .select(col("event_type"),
        pmod(portableHash60(concat(lit("cms0|"), col("user_id").cast("string"))), lit(1024L)).as("b"),
        pmod(col("user_id"), lit(8L)).as("shard"))
    val viaShards = cells.groupBy("event_type", "b", "shard").count()
      .groupBy("event_type", "b").agg(sum("count").as("cnt"))
    val oneShot = cells.groupBy("event_type", "b").agg(count(lit(1)).as("cnt"))
    assert(viaShards.except(oneShot).isEmpty && oneShot.except(viaShards).isEmpty,
      "per-shard counter sums must be bit-identical to the one-shot counters")
  }

  test("q209: rolling KMV reach is exact below k and windows genuinely roll") {
    val rows = SketchQueries.q209.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getAs[Long]("est_users"), r.getAs[Long]("exact_users"))
      assert(exact > 0)
      if (exact < 256)
        assert(est == exact,
          s"day ${r.getAs[Long]("day")}: below k the windowed KMV must be exact")
      else
        assert(math.abs(est - exact).toDouble / exact <= 0.25,
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

  // ------------------------------------------------------------------
  // Native DataSketches machinery (hll_*, theta_*, kll_*,
  // count_min_sketch) — the binary-partial at-scale alternative the
  // library keeps alongside the portable registered forms.
  // ------------------------------------------------------------------

  test("native HLL and theta estimates land within 5% of exact per event type") {
    val est = ev.groupBy("event_type").agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("hll_users"),
      theta_sketch_estimate(theta_sketch_agg(col("user_id"))).as("theta_users"),
      countDistinct(col("user_id")).as("exact_users"))
      .as[(String, Long, Double, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (t, hll, theta, exact) =>
      assert(math.abs(hll - exact).toDouble / exact < 0.05, s"$t: hll=$hll exact=$exact")
      assert(math.abs(theta - exact) / exact < 0.05, s"$t: theta=$theta exact=$exact")
    }
  }

  test("union of per-day native sketches equals the one-shot sketch — reaggregation without raw data") {
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

  test("native KLL quantiles respect the rank-error contract against exact ranks") {
    val li = Tables.lineitem(spark, sfDir)
    val rows = li.groupBy("l_returnflag")
      .agg(expr("kll_sketch_agg_double(l_extendedprice)").as("sk"), count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("n_rows"),
        expr("kll_sketch_get_quantile_double(sk, 0.5)").as("p50"),
        expr("kll_sketch_get_quantile_double(sk, 0.95)").as("p95"),
        expr("kll_sketch_get_quantile_double(sk, 0.99)").as("p99"))
      .collect()
    assert(rows.nonEmpty)
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

  test("monthly KLL sketches merge to the one-shot sketch's quantiles (rank-bounded)") {
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

  test("native CMS: merged per-shard sketches ≡ one-shot sketch — CMS merge is exact") {
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

  test("native CMS: estimates are one-sided (est ≥ exact) and ε-bounded") {
    import graft.expressions.SketchExpressions
    import org.apache.spark.sql.expressions.Window
    val users = ev.select("event_type", "user_id")
    val sk = users.groupBy("event_type")
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("cms"))
    val top = users.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("exact_n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(desc("exact_n"), asc("user_id"))))
      .where(col("rk") <= 3)
    val rows = top.join(sk, Seq("event_type"))
      .select(col("event_type"), col("exact_n"),
        SketchExpressions.cmsEstimate(col("cms"), col("user_id")).as("est_n"))
      .collect()
    assert(rows.length >= 10)
    val totals = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    rows.foreach { r =>
      val (t, exact, est) = (r.getAs[String]("event_type"),
        r.getAs[Long]("exact_n"), r.getAs[Long]("est_n"))
      assert(est >= exact, s"$t: CMS must never under-count (est=$est exact=$exact)")
      assert(est - exact <= math.max(3L, (0.003 * totals(t)).toLong),
        s"$t: overshoot ${est - exact} beyond ε·N bound (N=${totals(t)})")
    }
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
