package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class ScaleQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q93 profiles nulls, distincts, and typed min/max formatting") {
    val df = Seq(
      (1L, 10L, "F", 1.555, Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (2L, 10L, "O", 2.0, Timestamp.valueOf("2024-06-01 00:00:00"), "5-LOW"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      // one null per nullable column type class
      .union(Seq((3L, 10L, null.asInstanceOf[String], 0.5,
        Timestamp.valueOf("2024-03-01 00:00:00"), "5-LOW"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    val dir = java.nio.file.Files.createTempDirectory("proffix").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = ScaleQueries.q93.run(spark, dir).collect()
      .map(x => x.getAs[String]("col_name") -> x).toMap
    assert(r("o_orderkey").getAs[Long]("n_rows") == 3L)
    assert(r("o_orderstatus").getAs[Long]("n_nulls") == 1L)
    assert(r("o_orderstatus").getAs[Long]("n_distinct") == 2L) // F, O (null excluded)
    assert(r("o_custkey").getAs[Long]("n_distinct") == 1L)
    assert(r("o_totalprice").getAs[String]("min_value") == "0.50")
    assert(r("o_totalprice").getAs[String]("max_value") == "2.00")
    // epoch millis of 2024-01-01 UTC
    assert(r("o_orderdate").getAs[String]("min_value") == "1704067200000")
  }

  test("q96 counts planted orphans per FK edge") {
    val dir = java.nio.file.Files.createTempDirectory("fkfix").toString
    // minimal star: nation 1 row; customer 2 rows (one orphan nationkey);
    // orders 2 (one orphan custkey); lineitem 3 (two rows to a missing
    // order, sharing ONE missing key → 2 orphan rows, 1 orphan key)
    Seq((0, "A", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1L, "c1", 0, 0.0, "M"), (2L, "c2", 9, 0.0, "M"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    // one NULL FK: anti-join semantics count it as an orphan ROW but
    // (like count(DISTINCT)) not as an orphan KEY
    Seq[(java.lang.Long, java.lang.Long)]((10L, 1L), (11L, 99L), (12L, null))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((100L, "p")).toDF("p_partkey", "p_name").write.parquet(s"$dir/part.parquet")
    Seq((200L, "s")).toDF("s_suppkey", "s_name").write.parquet(s"$dir/supplier.parquet")
    Seq((10L, 100L, 200L), (77L, 100L, 200L), (77L, 100L, 200L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ScaleQueries.q96.run(spark, dir).collect()
      .map(x => x.getAs[String]("fk_edge") -> (x.getAs[Long]("n_orphan_rows"), x.getAs[Long]("n_orphan_keys"))).toMap
    assert(r("customer.c_nationkey->nation") == (1L, 1L))
    assert(r("orders.o_custkey->customer") == (2L, 1L)) // null FK: orphan row, not key
    assert(r("lineitem.l_orderkey->orders") == (2L, 1L))
    assert(r("lineitem.l_partkey->part") == (0L, 0L))
    assert(r("lineitem.l_suppkey->supplier") == (0L, 0L))
  }

  test("q94 credits the latest preceding non-purchase touch; none when absent") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      // user 1: view → click → purchase  ⇒ click
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 9.0, "{}"),
      // user 2: purchase with no prior events ⇒ none
      (4L, ts("2024-01-01 11:00:00"), 2L, "purchase", 5.0, "{}"),
      // user 3: purchase then view then purchase ⇒ none, view
      (5L, ts("2024-01-01 09:00:00"), 3L, "purchase", 1.0, "{}"),
      (6L, ts("2024-01-01 09:30:00"), 3L, "view", 0.0, "{}"),
      (7L, ts("2024-01-01 09:45:00"), 3L, "purchase", 2.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("attrfix").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ScaleQueries.q94.run(spark, dir).collect()
      .map(x => x.getAs[String]("channel") -> (x.getAs[Long]("n_purchases"), x.getAs[Long]("n_users"))).toMap
    assert(r("click") == (1L, 1L))
    assert(r("none") == (2L, 2L)) // users 2 and 3's first purchase
    assert(r("view") == (1L, 1L))
    assert(!r.contains("purchase")) // a purchase never self-attributes
  }

  test("q112's correlated subquery decorrelates: one per-part aggregate, no per-row re-execution") {
    val qe = ScaleQueries.q112.run(spark, sfDir).queryExecution
    val opt = qe.optimizedPlan.toString
    // RewriteCorrelatedScalarSubquery must have turned the scalar
    // subquery into a grouped aggregate joined back — a surviving
    // subquery expression would re-run the aggregate per outer row
    assert(!opt.contains("scalar-subquery"), s"subquery survived optimization:\n$opt")
    assert(opt.contains("Aggregate [l_partkey"), s"expected a per-part aggregate:\n$opt")
    // and the threshold comparison rides the join, not a filter above it
    assert("Join Inner, .*l_quantity.* < .*thr".r.findFirstIn(opt).isDefined ||
      opt.contains("(l_quantity"), s"threshold should join:\n$opt")
  }

  test("q132: CNF extraction pushes both per-table disjunctions to the scans; join stays hash") {
    val p = ScaleQueries.q132.run(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // the quantity OR must reach the lineitem scan as a pushed filter…
    assert(p.contains("PushedFilters: [IsNotNull(l_partkey), Or(Or(And(GreaterThanOrEqual(l_quantity"),
      s"quantity disjunction not pushed to lineitem scan:\n$p")
    // …and the brand/size OR the part scan
    assert(p.contains("Or(Or(And(EqualTo(p_brand"),
      s"brand/size disjunction not pushed to part scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), "equi-key must keep the join a hash join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the OR must not degrade the join to a nested loop")
  }

  test("q133 produces the zero-order bucket an inner join cannot") {
    val dir = java.nio.file.Files.createTempDirectory("q133fix").toString
    Seq(1L, 2L, 3L).toDF("c_custkey").write.parquet(s"$dir/customer.parquet")
    Seq(
      (10L, 1L, "1-URGENT", Timestamp.valueOf("1995-03-01 00:00:00")),
      (11L, 1L, "1-URGENT", Timestamp.valueOf("1995-06-01 00:00:00")),
      (12L, 2L, "5-LOW", Timestamp.valueOf("1995-03-01 00:00:00")), // wrong priority
      (13L, 1L, "1-URGENT", Timestamp.valueOf("1994-03-01 00:00:00")), // out of window
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    val r = ScaleQueries.q133.run(spark, dir).collect()
      .map(x => x.getAs[Long]("c_count") -> x.getAs[Long]("custdist")).toMap
    assert(r == Map(2L -> 1L, 0L -> 2L)) // cust 1 twice; custs 2 and 3 zero
  }

  test("q144 computes rule metrics from hand-countable baskets") {
    val dir = java.nio.file.Files.createTempDirectory("q144fix").toString
    // baskets: {1,2}, {1,2}, {1,3} → only pair (1,2) reaches nab ≥ 2;
    // n_1 = 3, n_2 = 2, N = 3 → lift_bp = 10000·2·3/(3·2) = 10000
    // (independence), conf_bp(1→2) = 10000·2 div 3 = 6666. The repeat
    // of part 2 in order 20 pins the per-ORDER distinct.
    Seq(
      (10L, 1L), (10L, 2L),
      (20L, 1L), (20L, 2L), (20L, 2L),
      (30L, 1L), (30L, 3L),
    ).toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ScaleQueries.q144.run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("pa") == 1L && r.head.getAs[Long]("pb") == 2L)
    assert(r.head.getAs[Long]("nab") == 2L)
    assert(r.head.getAs[Long]("lift_bp") == 10000L)
    assert(r.head.getAs[Long]("conf_bp") == 6666L)
  }

  test("q147 scores even revenue 0 and a hand-computed skewed split exactly") {
    val dir = java.nio.file.Files.createTempDirectory("q147fix").toString
    // nation 0: three equal customers → Gini 0. nation 1: revenues
    // x, 3x → G = (2·(1·x + 2·3x) − 3·4x) / (2·4x) = 2x/8x → 2500 bp.
    Seq(
      (1L, 0), (2L, 0), (3L, 0),
      (4L, 1), (5L, 1),
    ).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    Seq(
      (10L, 1L, 50.0), (11L, 2L, 50.0), (12L, 3L, 50.0),
      (13L, 4L, 100.0), (14L, 5L, 300.0),
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = ScaleQueries.q147.run(spark, dir).collect()
      .map(x => x.getAs[Int]("nk") -> x.getAs[Long]("gini_bp")).toMap
    assert(r == Map(0 -> 0L, 1 -> 2500L))
  }

  test("q148 risk counts are monotone in k over planted class sizes") {
    val dir = java.nio.file.Files.createTempDirectory("q148fix").toString
    // classes of size 1, 2, 10 (same nation, same segment, distinct
    // balance-thousand buckets): k=2 → 1 class/1 row at risk;
    // k=5 and k=10 → 2 classes/3 rows (10 is NOT < 10).
    val rows =
      Seq((1L, 0, "A", 500.0)) ++
        (2L to 3L).map((_, 0, "A", 1500.0)) ++
        (4L to 13L).map((_, 0, "A", 2500.0))
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    val r = ScaleQueries.q148.run(spark, dir).collect()
      .map(x => x.getAs[Long]("k") ->
        (x.getAs[Long]("classes_at_risk"), x.getAs[Long]("rows_at_risk"),
          x.getAs[Long]("classes_total"))).toMap
    assert(r == Map(2L -> (1L, 1L, 3L), 5L -> (2L, 3L, 3L), 10L -> (2L, 3L, 3L)))
  }

  test("q154 maps a hand-ranked column to exact percentile bp per flag") {
    val dir = java.nio.file.Files.createTempDirectory("q154fix").toString
    // prices 1..4 rank 1..4 of N=4 → bp 2500/5000/7500/10000;
    // A holds ranks 1-2 (mean 3750), R ranks 3-4 (mean 8750)
    Seq(
      ("A", 1.0, 1L, 1), ("A", 2.0, 2L, 1), ("R", 3.0, 3L, 1), ("R", 4.0, 4L, 1),
    ).toDF("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ScaleQueries.q154.run(spark, dir).collect()
      .map(x => x.getAs[String]("flag") -> x.getAs[Long]("mean_bp")).toMap
    assert(r == Map("A" -> 3750L, "R" -> 8750L))
  }

  test("q155 computes arm sizes, adaptive conversion, and lift from a planted design") {
    val dir = java.nio.file.Files.createTempDirectory("q155fix").toString
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    // arms by hash: 1,4,5 → A; 2,3 → B. Purchases: u1=1, u4=3, u2=3,
    // u3=3, u5=0 (clicks only — pins the zero-purchase left join).
    // U=5, T=10 → convert iff np·5 > 10: users 4, 2, 3.
    // A: 3 users / 1 conv (3333 bp); B: 2 / 2 (10000 bp);
    // lift = (10⁴·2·3) div (1·2) = 30000.
    val rows =
      Seq((1L, 1L, "purchase"), (2L, 1L, "click"), (3L, 5L, "click")) ++
        (10L to 12L).map((_, 4L, "purchase")) ++
        (20L to 22L).map((_, 2L, "purchase")) ++
        (30L to 32L).map((_, 3L, "purchase"))
    rows.map { case (id, u, ty) => (id, t0, u, ty) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val r = ScaleQueries.q155.run(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_a") == 3L && row.getAs[Long]("conv_a") == 1L)
    assert(row.getAs[Long]("n_b") == 2L && row.getAs[Long]("conv_b") == 2L)
    assert(row.getAs[Long]("cr_a_bp") == 3333L && row.getAs[Long]("cr_b_bp") == 10000L)
    assert(row.getAs[Long]("lift_bp") == 30000L)
  }

  test("q158 full separation gives U = 0 and rank-biserial −10000 bp") {
    val dir = java.nio.file.Files.createTempDirectory("q158fix").toString
    // A = prices {1,2}, R = {3,4}: ranks A:1,2 → R_A = 3,
    // U_A = 3 − 2·3/2 = 0; rb = 2·0/(2·2) − 1 → −10000 bp.
    // The N row must be ignored entirely.
    Seq(
      ("A", 1.0, 1L, 1), ("A", 2.0, 2L, 1), ("R", 3.0, 3L, 1), ("R", 4.0, 4L, 1),
      ("N", 0.5, 5L, 1),
    ).toDF("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ScaleQueries.q158.run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_a") == 2L && r.head.getAs[Long]("n_r") == 2L)
    assert(r.head.getAs[Long]("u_a") == 0L)
    assert(r.head.getAs[Long]("rank_biserial_bp") == -10000L)
  }

  test("q159 scores a planted dependent design cell-exactly and signs the deviations") {
    val dir = java.nio.file.Files.createTempDirectory("q159fix").toString
    val d0 = Timestamp.valueOf("1970-01-01 12:00:00") // epoch day 0 → dow 0
    val d1 = Timestamp.valueOf("1970-01-02 12:00:00") // dow 1
    // A: 3@dow0, 1@dow1; B: 1@dow0, 3@dow1 → every margin 4, N=8,
    // dev = O·8 − 16 = ±8; contrib = 1000·64 div (4·4·8) = 500
    val rows =
      (1 to 3).map(i => (i.toLong, d0, 1L, "A")) ++ Seq((4L, d1, 1L, "A")) ++
        Seq((5L, d0, 1L, "B")) ++ (6 to 8).map(i => (i.toLong, d1, 1L, "B"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val r = ScaleQueries.q159.run(spark, dir).collect()
      .map(x => (x.getAs[String]("ty"), x.getAs[Long]("dow")) ->
        (x.getAs[Long]("dev_scaled"), x.getAs[Long]("chi2_contrib_milli"))).toMap
    assert(r == Map(
      ("A", 0L) -> (8L, 500L), ("A", 1L) -> (-8L, 500L),
      ("B", 0L) -> (-8L, 500L), ("B", 1L) -> (8L, 500L)))
  }

  test("q160 promo share: one month, promo 100 of 400 total → 2500 bp") {
    val dir = java.nio.file.Files.createTempDirectory("q160fix").toString
    Seq((1L, "PROMO"), (2L, "STANDARD"))
      .toDF("p_partkey", "p_type").write.parquet(s"$dir/part.parquet")
    val t = Timestamp.valueOf("1995-01-15 00:00:00")
    Seq((1L, t, 100.0, 0.0), (2L, t, 300.0, 0.0))
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ScaleQueries.q160.run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("ship_month") == 199501L)
    assert(r.head.getAs[Double]("promo_rev") == 100.0)
    assert(r.head.getAs[Double]("total_rev") == 400.0)
    assert(r.head.getAs[Long]("promo_share_bp") == 2500L)
  }

  test("q161 volume shipping keeps distinct pairs within the nation set") {
    val dir = java.nio.file.Files.createTempDirectory("q161fix").toString
    Seq((1, "NATION_1"), (2, "NATION_2"), (3, "NATION_3"))
      .toDF("n_nationkey", "n_name").write.parquet(s"$dir/nation.parquet")
    Seq((1L, 1), (2L, 2), (3L, 3))
      .toDF("s_suppkey", "s_nationkey").write.parquet(s"$dir/supplier.parquet")
    Seq((1L, 2), (2L, 1), (3L, 3))
      .toDF("c_custkey", "c_nationkey").write.parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (20L, 2L), (30L, 3L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    val t = Timestamp.valueOf("1995-06-01 00:00:00")
    // N1→N2 kept, N2→N1 kept, N3→N3 dropped (same nation), N3→N2 kept
    Seq((10L, 1L, t, 100.0, 0.0), (20L, 2L, t, 200.0, 0.0),
      (30L, 3L, t, 999.0, 0.0), (10L, 3L, t, 300.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ScaleQueries.q161.run(spark, dir).collect()
      .map(x => (x.getAs[String]("supp_nation"), x.getAs[String]("cust_nation"),
        x.getAs[Long]("ship_year")) -> x.getAs[Double]("revenue")).toMap
    assert(r == Map(
      ("NATION_1", "NATION_2", 1995L) -> 100.0,
      ("NATION_2", "NATION_1", 1995L) -> 200.0,
      ("NATION_3", "NATION_2", 1995L) -> 300.0))
  }

  test("q162 KS distance on a perfectly interleaved design is 0.5") {
    val dir = java.nio.file.Files.createTempDirectory("q162fix").toString
    // A = {1,3}, R = {2,4}: the CDF gap peaks at 1/2 right after each
    // A step; the N row must be ignored.
    Seq(
      ("A", 1.0, 1L, 1), ("R", 2.0, 2L, 1), ("A", 3.0, 3L, 1), ("R", 4.0, 4L, 1),
      ("N", 0.5, 5L, 1),
    ).toDF("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ScaleQueries.q162.run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_a") == 2L && r.head.getAs[Long]("n_r") == 2L)
    assert(r.head.getAs[Long]("d_scaled") == 2L) // |1·2 − 0·2| at g=1
    assert(r.head.getAs[Long]("d_bp") == 5000L)
  }

  test("q163 entropy: a 2+2 user is ln 2 nats, a single-type user is 0") {
    val dir = java.nio.file.Files.createTempDirectory("q163fix").toString
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, t0, 10L, "click"), (2L, t0, 10L, "click"),
      (3L, t0, 10L, "view"), (4L, t0, 10L, "view"),
      (5L, t0, 21L, "click"), (6L, t0, 21L, "click"), (7L, t0, 21L, "click"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val r = ScaleQueries.q163.run(spark, dir).collect()
      .map(x => x.getAs[Long]("cohort") ->
        (x.getAs[Long]("n_users"), x.getAs[Double]("avg_entropy_nats"))).toMap
    assert(r == Map(0L -> ((1L, 0.6931)), 1L -> ((1L, 0.0))))
  }

  test("q165 seasonality index: 100 vs 300 over two weekdays → 5000/15000 bp") {
    val dir = java.nio.file.Files.createTempDirectory("q165fix").toString
    // epoch day 0 (dow 0) revenue 100; epoch day 1 (dow 1) revenue 300
    Seq(
      (1L, Timestamp.valueOf("1970-01-01 00:00:00"), 100.0),
      (2L, Timestamp.valueOf("1970-01-02 00:00:00"), 300.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = ScaleQueries.q165.run(spark, dir).collect()
      .map(x => x.getAs[Long]("dow") ->
        (x.getAs[Long]("n_days"), x.getAs[Double]("revenue"), x.getAs[Long]("index_bp")))
      .toMap
    assert(r == Map(0L -> ((1L, 100.0, 5000L)), 1L -> ((1L, 300.0, 15000L))))
  }

  test("q166 lag-7 autocorrelation of a proportional series is 1.0") {
    val dir = java.nio.file.Files.createTempDirectory("q166fix").toString
    // pairs (2,1) and (6,3): y = x/2 exactly → r = 1. The unpaired
    // day-1/day-2 rows must not contribute.
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (2L, Timestamp.valueOf("2024-01-02 00:00:00"), 3.0),
      (3L, Timestamp.valueOf("2024-01-08 00:00:00"), 2.0),
      (4L, Timestamp.valueOf("2024-01-09 00:00:00"), 6.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = ScaleQueries.q166.run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_pairs") == 2L)
    assert(r.head.getAs[Double]("autocorr_lag7") == 1.0)
  }

  test("q167 dominant supplier counts >half-share parts inside the window only") {
    val dir = java.nio.file.Files.createTempDirectory("q167fix").toString
    Seq((1L, "S1"), (2L, "S2"))
      .toDF("s_suppkey", "s_name").write.parquet(s"$dir/supplier.parquet")
    val in = Timestamp.valueOf("1997-06-01 00:00:00")
    val out = Timestamp.valueOf("1996-06-01 00:00:00")
    // part 1: s1 60 vs s2 40 → s1 dominant; part 2: s1 30 vs s2 70 →
    // s2 dominant; part 3: s1 sole shipper → dominant; the 1996 row
    // (s2 ships 1000 of part 3) must be excluded or it would flip p3.
    Seq(
      (1L, 1L, 60.0, in), (2L, 1L, 40.0, in),
      (1L, 2L, 30.0, in), (2L, 2L, 70.0, in),
      (1L, 3L, 10.0, in), (2L, 3L, 1000.0, out))
      .toDF("l_suppkey", "l_partkey", "l_quantity", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ScaleQueries.q167.run(spark, dir).collect()
      .map(x => (x.getAs[Long]("s_suppkey"), x.getAs[String]("s_name"),
        x.getAs[Long]("n_dominant_parts")))
    assert(r.toSeq == Seq((1L, "S1", 2L), (2L, "S2", 1L)))
  }

  test("q248 Mantel-Haenszel: a planted Simpson's paradox flips the pooled OR") {
    val dir = java.nio.file.Files.createTempDirectory("q248fix").toString
    // stratum A (order 1): a=1 b=9 c=20 d=80 -> OR 0.44
    // stratum B (order 2): a=60 b=40 c=3 d=1 -> OR 0.50
    // pooled: (61*81)/(49*23) = 4.38 -- the paradox: both strata < 1.
    // fixed-point: sr = 80e6 div 110 + 60e6 div 104 = 727272+576923
    //              ss = 180e6 div 110 + 120e6 div 104 = 1636363+1153846
    // or_mh_milli = 1000*1304195 div 2790209 = 467
    // or_marginal_milli = 4941000 div 1127 = 4384
    def rows(ok: Long, n: Int, disc: Double, flag: String) =
      Seq.fill(n)((ok, disc, flag))
    val li = rows(1L, 1, 0.06, "R") ++ rows(1L, 9, 0.06, "N") ++
      rows(1L, 20, 0.0, "R") ++ rows(1L, 80, 0.0, "N") ++
      rows(2L, 60, 0.06, "R") ++ rows(2L, 40, 0.06, "N") ++
      rows(2L, 3, 0.0, "R") ++ rows(2L, 1, 0.0, "N")
    li.toDF("l_orderkey", "l_discount", "l_returnflag")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "A"), (2L, "B")).toDF("o_orderkey", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val r = ScaleQueries.q248.run(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_exp_out") == 61L && r.getAs[Long]("n_ctl_ok") == 81L)
    assert(r.getAs[Long]("or_marginal_milli") == 4384L, "pooled OR must sit above 1")
    assert(r.getAs[Long]("or_mh_milli") == 467L,
      "the stratified common OR must sit below 1 - the paradox resolved")
  }

  test("q247 dispersion: constant counts give 0, clumped counts hand-computed") {
    val dir = java.nio.file.Files.createTempDirectory("q247fix").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // type P: 4 users, 1 event each -> variance 0, D = 0, mean 1000.
    // type C: users a (1 event) and b (5 events): n=2 sx=6 sxx=26 ->
    //   D = 1000*(2*26-36) div (1*6) = 2666; mean = 3000.
    val rows =
      (1 to 4).map(u => (s"u$u", "P", t0)) ++
        Seq(("a", "C", t0)) ++ (1 to 5).map(_ => ("b", "C", t0))
    import spark.implicits._
    rows.toDF("user_id", "event_type", "ts").write.parquet(s"$dir/events.parquet")
    val r = ScaleQueries.q247.run(spark, dir).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_users"), x.getAs[Long]("mean_milli"),
          x.getAs[Long]("dispersion_milli")))).toMap
    assert(r(("P")) == ((4L, 1000L, 0L)))
    assert(r(("C")) == ((2L, 3000L, 2666L)))
  }

  test("q241 DP release: seeded geometric noise matches an in-JVM recompute; release = true + noise") {
    val dir = java.nio.file.Files.createTempDirectory("q241fix").toString
    val day0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00") // epoch day 19723 -> dow 4
    val day1 = java.sql.Timestamp.valueOf("2024-01-02 10:00:00")
    (Seq.fill(7)(("view", day0)) ++ Seq.fill(3)(("view", day1)) ++
      Seq.fill(5)(("click", day0)))
      .toDF("event_type", "ts").write.parquet(s"$dir/events.parquet")

    def noiseOf(tp: String, dow: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graft-dp:$tp:$dow".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      def g(off: Int): Long = {
        val h = java.lang.Long.parseLong(hex.slice(off, off + 8), 16)
        math.floor(-math.log(1.0 - ((h.toDouble + 0.5) / 4294967296.0))).toLong
      }
      g(0) - g(8)
    }
    def dowOf(ts: java.sql.Timestamp): Int =
      (ts.toLocalDateTime.toLocalDate.toEpochDay % 7).toInt
    val r = ScaleQueries.q241.run(spark, dir).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Int]("dow")) ->
        ((x.getAs[Long]("true_n"), x.getAs[Long]("noise"),
          x.getAs[Long]("released")))).toMap
    assert(r.size == 3)
    for (((tp, dow), (tn, nz, rel)) <- r) {
      assert(nz == noiseOf(tp, dow), s"cell ($tp, $dow)")
      assert(rel == tn + nz)
    }
    assert(r((("view", dowOf(day0))))._1 == 7L)
    assert(r((("click", dowOf(day0))))._1 == 5L)
  }

  test("q227 t-closeness: planted skewed classes fire per threshold with exact TVD") {
    val dir = java.nio.file.Files.createTempDirectory("q227fix").toString
    // Three classes over segments {A, B}; corpus mix 24 A / 6 B (N=30).
    //   class (nk=0, bal_k=0): 3 B            → TVD 8000 bp (breaches both t)
    //   class (nk=0, bal_k=1): 3 A            → TVD 2000 bp (breaches t=1000
    //                                            ONLY — strict >, not ≥, at t=2000)
    //   class (nk=2, bal_k=0): 21 A + 3 B     → TVD  750 bp (safe at both)
    // The two nk=0 classes share a nation and differ only in the acctbal
    // bucket (100.00 → bal_k 0; 2500.00 → 250000 div 200000 = 1), pinning
    // that the class key is the JOINT (nation, balance-bucket) QI.
    // Hand arithmetic for class1: Σ_s |cnt·N − g·sz| = |0−24·3| + |90−18|
    // = 144 → 10⁴·144 div (2·3·30) = 8000; class2: 18+18=36 → 2000;
    // class3: 54+54=108 → 10⁴·108 div (2·24·30) = 750.
    val rows =
      Seq.tabulate(3)(i => (100L + i, s"c$i", 0, 100.0, "B")) ++
        Seq.tabulate(3)(i => (200L + i, s"d$i", 0, 2500.0, "A")) ++
        Seq.tabulate(21)(i => (300L + i, s"e$i", 2, 100.0, "A")) ++
        Seq.tabulate(3)(i => (400L + i, s"f$i", 2, 100.0, "B"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val r = ScaleQueries.q227.run(spark, dir).collect()
      .map(x => x.getAs[Long]("t_bp") ->
        ((x.getAs[Long]("classes_at_risk"), x.getAs[Long]("rows_at_risk"),
          x.getAs[Long]("worst_tvd_bp"), x.getAs[Long]("classes_total"))))
      .toMap
    assert(r(1000L) == ((2L, 6L, 8000L, 3L)))
    assert(r(2000L) == ((1L, 3L, 8000L, 3L)))
  }
}
