package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BloomJoin invariants: the bloom is an economics dial, never a
  * correctness one — semi/anti results must EQUAL their exact-join
  * twins at any fpp, and the filter must never produce a false
  * negative (that is the sketch's contract; a false negative would
  * silently drop matching rows).
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def keys = Tables.orders(spark, sfDir)
    .where(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey")

  test("bloomSemiJoin equals exact left_semi") {
    val fact = Tables.lineitem(spark, sfDir)
    val k = keys.distinct()
    val got = BloomJoin.bloomSemiJoin(fact, keys, "l_orderkey", "o_orderkey")
    val want = fact.join(k, fact("l_orderkey") === k("o_orderkey"), "left_semi")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("bloomAntiJoin equals exact left_anti, even at a sloppy fpp") {
    val fact = Tables.lineitem(spark, sfDir)
    val k = keys.distinct()
    // fpp 0.5: the bloom passes many non-members — the exact anti-join
    // must still remove every true member and keep everything else
    val got = BloomJoin.bloomAntiJoin(fact, keys, "l_orderkey", "o_orderkey", fpp = 0.5)
    val want = fact.join(k, fact("l_orderkey") === k("o_orderkey"), "left_anti")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("mightContain has no false negatives over the inserted key set") {
    val ks = (1L to 2000L).map(_ * 7919).toDF("k")
    val bloom = BloomJoin.buildBloom(ks, "k", 2000)
    assert(ks.where(!BloomJoin.mightContain(bloom, col("k"))).isEmpty)
  }

  test("bloomAntiJoin keeps NULL-keyed fact rows, like the exact anti-join") {
    val fact = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (2L, "c"), (null, "d"))
      .toDF("k", "v")
    val ks = Seq(1L).toDF("key")
    val got = BloomJoin.bloomAntiJoin(fact, ks, "k", "key")
      .select("v").as[String].collect().toSet
    // NULL never equals any key ⇒ null-keyed rows are anti-join output
    assert(got == Set("b", "c", "d"))
    assert(BloomJoin.bloomSemiJoin(fact, ks, "k", "key")
      .select("v").as[String].collect().toSet == Set("a"))
  }

  test("semi + anti partition the fact exactly") {
    val fact = Tables.lineitem(spark, sfDir)
    val semi = BloomJoin.bloomSemiJoin(fact, keys, "l_orderkey", "o_orderkey").count()
    val anti = BloomJoin.bloomAntiJoin(fact, keys, "l_orderkey", "o_orderkey").count()
    assert(semi + anti == fact.count())
  }

  test("AutoSize keeps the observed fpp near nominal where a fixed 4096 guess degrades") {
    // 40k keys — 10x the old fixed guess. Probe with 200k disjoint
    // non-members and measure the PRE-FILTER pass rate directly.
    val ks = (1L to 40000L).map(_ * 2L).toDF("k") // even keys
    val probes = (1L to 200000L).map(_ * 2L + 1L).toDF("p") // odd: all non-members
    val auto = BloomJoin.buildBloom(ks, "k", BloomJoin.AutoSize, fpp = 0.01)
    val fixed = BloomJoin.buildBloom(ks, "k", 4096L, fpp = 0.01)
    val autoFp = probes.where(BloomJoin.mightContain(auto, col("p"))).count().toDouble / 200000
    val fixedFp = probes.where(BloomJoin.mightContain(fixed, col("p"))).count().toDouble / 200000
    assert(autoFp <= 0.03, s"auto-sized observed fpp $autoFp should be ~nominal 0.01")
    assert(fixedFp > 0.10, s"undersized filter should be degraded, got $fixedFp")
    // and no false negatives either way (the sketch contract)
    assert(ks.where(!BloomJoin.mightContain(auto, col("k"))).isEmpty)
  }

  test("string keys ride the xxhash64 bridge: semi/anti equal their exact twins") {
    val fact = Seq(("c1", 1L), ("c2", 2L), ("c3", 3L), (null, 4L), ("c1", 5L))
      .toDF("cust", "v")
    val strKeys = Seq("c1", "c3", "zz").toDF("key")
    val k = strKeys.distinct()
    val semi = BloomJoin.bloomSemiJoin(fact, strKeys, "cust", "key")
    val wantSemi = fact.join(k, fact("cust") === k("key"), "left_semi")
    assert(semi.exceptAll(wantSemi).isEmpty && wantSemi.exceptAll(semi).isEmpty)
    val anti = BloomJoin.bloomAntiJoin(fact, strKeys, "cust", "key")
    val wantAnti = fact.join(k, fact("cust") === k("key"), "left_anti")
    assert(anti.exceptAll(wantAnti).isEmpty && wantAnti.exceptAll(anti).isEmpty)
    // the NULL-keyed fact row is anti-join output (NULL matches no key)
    assert(anti.where(col("cust").isNull).count() == 1L)
  }

  test("q187 plan: bloom probe on both branches, exactly one anti-join (the member-ish sliver)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // registry lookup keeps the spec in lockstep with the shipped plan
    val q = Registry.byName("q187_bloom_anti_join").run(spark, sfDir)
    q.count() // settle AQE
    val physical = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = physical.toString
    // both branches carry the codegen'd probe as a row-level Filter —
    // the economics contract: non-members never reach any exchange
    assert(s.contains("might_contain"), s"bloom probe missing from plan:\n$s")
    val antiJoins = physical.collect {
      case j: BaseJoinExec if j.joinType.toString == "LeftAnti" => j
    }
    assert(antiJoins.size == 1,
      s"exactly the member-ish branch routes through one exact anti-join:\n$s")
  }

  test("mixed bridge representations fail loudly instead of silently dropping matches") {
    // string key side vs long fact side: the build would insert
    // xxhash64(string) while the probe sends raw longs — every true
    // match silently filtered. The join entry points must refuse.
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val strKeys = Seq("1", "2").toDF("key")
    val e1 = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(fact, strKeys, "k", "key")
    }
    assert(e1.getMessage.contains("bloom bridge mismatch"))
    val e2 = intercept[IllegalArgumentException] {
      BloomJoin.bloomAntiJoin(fact, strKeys, "k", "key")
    }
    assert(e2.getMessage.contains("bloom bridge mismatch"))
    // differing non-integral types diverge under xxhash64 too: refuse
    val dateKeys = Seq(java.sql.Date.valueOf("2024-01-01")).toDF("key")
    val strFact = Seq(("2024-01-01", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(strFact, dateKeys, "k", "key")
    }
    // integral widths may differ freely (both ride putLong)
    val intKeys = Seq(1, 2).toDF("key")
    assert(BloomJoin.bloomSemiJoin(fact, intKeys, "k", "key").count() == 2L)
  }

  test("q90 MAD fixture: hand-computed robust gate") {
    val df = Seq(
      ("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 100.0),
    ).toDF("o_orderpriority", "o_totalprice")
    // median 3, |dev| = [2,1,0,1,97], MAD 1 → gate 3·1.4826·1 = 4.4478
    // → only 100 (dev 97) is an outlier
    val dir = java.nio.file.Files.createTempDirectory("madfix").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = ScaleQueries.q90.run(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Double]("median_price") == 3.0)
    assert(row.getAs[Double]("mad") == 1.0)
    assert(row.getAs[Long]("n_outliers") == 1L)
    assert(row.getAs[Long]("n") == 5L)
  }
}
