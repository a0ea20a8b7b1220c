package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Auto-salting invariants: the histogram-driven plan is an economics
  * dial, never a correctness one — the salted join must EQUAL the
  * plain join, hot keys must fan out over their planned factor, and
  * cold keys must pass through with salt 0 against a single
  * (unreplicated) right row.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // q255's skew shape: 3/4 of events collapse onto key 0 (the classic
  // default-key pathology), the rest stay per-user cold keys
  private def skewed = Tables.events(spark, sfDir).select(
    when(col("user_id") % 4 =!= 0, lit(0L)).otherwise(col("user_id")).as("k"),
    col("value"))

  private def dim = skewed.select("k").distinct()
    .withColumn("weight", pmod(col("k"), lit(97L)) + 1)

  /** The q220 factor key 0 should get at this scale (data-derived: the
    * test corpus's user count varies by SF).
    */
  private def expectedFactor: Long = {
    val n0 = skewed.where(col("k") === 0).count()
    val nKeys = skewed.select("k").distinct().count()
    val total = skewed.count()
    math.min(16L, (n0 * nKeys + total - 1) / total)
  }

  test("skewPlan: exactly the hot key, q220's ceiling factor, plan size bounded") {
    val plan = Skew.skewPlan(skewed, Seq("k"), minSaltFactor = 2,
      maxHotKeys = 100, maxSaltFactor = 16)
    val rows = plan.as[(Long, Long)].collect().toMap
    assert(rows.keySet == Set(0L), s"hot set was ${rows.keySet}")
    assert(rows(0L) == expectedFactor, s"expected factor $expectedFactor, got ${rows(0L)}")
    assert(rows(0L) >= 2L)
    // a tight cap must bind
    val capped = Skew.skewPlan(skewed, Seq("k"), 2, 100, maxSaltFactor = 2)
      .as[(Long, Long)].collect().toMap
    assert(capped(0L) == 2L, s"maxSaltFactor cap did not bind: $capped")
    // plan size bound by construction
    val wide = Skew.skewPlan(skewed, Seq("k"), 2, maxHotKeys = 1, 16)
    assert(wide.count() <= 1)
  }

  test("saltLeft: hot key fans out over its factor, cold keys pass through at salt 0") {
    val f = expectedFactor
    val plan = Skew.skewPlan(skewed, Seq("k"), 2, 100, 16)
    val salted = Skew.saltLeft(skewed, plan, Seq("k"))
    val perKey = salted.groupBy("k")
      .agg(countDistinct(col("__salt")).as("n_salts"),
        max(col("__salt")).as("mx"), min(col("__salt")).as("mn"))
    val hot = perKey.where(col("k") === 0).as[(Long, Long, Int, Int)].head()
    assert(hot._2 == f && hot._3 == f - 1 && hot._4 == 0,
      s"hot key did not fan out over [0,$f): $hot")
    val cold = perKey.where(col("k") =!= 0)
    assert(cold.where(col("n_salts") =!= 1 || col("mx") =!= 0).isEmpty,
      "a cold key was salted")
  }

  test("saltRight: hot key replicated factor times, cold keys single") {
    val plan = Skew.skewPlan(skewed, Seq("k"), 2, 100, 16)
    val salted = Skew.saltRight(dim, plan, Seq("k"))
    val perKey = salted.groupBy("k").agg(count(lit(1)).as("n"))
    assert(perKey.where(col("k") === 0).as[(Long, Long)].head()._2 == expectedFactor)
    assert(perKey.where(col("k") =!= 0 && col("n") =!= 1).isEmpty,
      "a cold dim key was replicated")
  }

  test("autoSaltedInnerJoin equals the plain inner join") {
    val got = Skew.autoSaltedInnerJoin(skewed, dim, Seq("k"), 2, 100, 16)
    val want = skewed.join(dim, Seq("k"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("autoSaltedInnerJoin is a no-op plan on a uniform key (empty plan, still correct)") {
    val uniform = Tables.events(spark, sfDir).select(col("event_type").as("k"), col("value"))
    val d = uniform.select("k").distinct().withColumn("weight", length(col("k")).cast("long"))
    assert(Skew.skewPlan(uniform, Seq("k"), 2, 100, 16).isEmpty,
      "uniform key produced a non-empty plan")
    val got = Skew.autoSaltedInnerJoin(uniform, d, Seq("k"), 2, 100, 16)
    val want = uniform.join(d, Seq("k"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
