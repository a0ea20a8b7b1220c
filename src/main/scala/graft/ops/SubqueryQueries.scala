package graft.ops

import org.apache.spark.sql.functions._

/** q113–q116: the classic subquery shapes (TPC-H Q4/Q18/Q22/Q15) the
  * inventory gained after q112's correlated scalar — EXISTS, IN over
  * HAVING, NOT EXISTS plus an above-average gate, and max-over-
  * aggregate. Each is declared in the Spark-native form Catalyst
  * rewrites the SQL subquery INTO (semi/anti joins, aggregate-then-
  * join), so the plan is the decorrelated one by construction and the
  * DuckDB oracle proves the semantics match the subquery SQL.
  */
object SubqueryQueries {
  import Exact._
  import Tables._

  // ---------------------------------------------------------------------
  // q113 — EXISTS (TPC-H Q4 shape): orders in one quarter having at
  // least one lineitem shipped more than 60 days after the order date
  // (this schema carries no commit/receipt dates — "late" is
  // ship-lag), counted per priority.
  //
  // Scale: the date window is pushed into the orders scan (un-cast
  // timestamp compare, the q02 rule); EXISTS is a LEFT SEMI join on
  // l_orderkey with the 60-day lag as residual condition — one
  // uniform-key shuffle pair, the semi join emits each order at most
  // once however many late lineitems it has; the rollup key space is
  // the 5 priorities.
  val q113: QuerySpec = QuerySpec(
    "q113_priority_late_orders",
    (s, d) => {
      val o = orders(s, d).where(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      o.join(
        lineitem(s, d).select("l_orderkey", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some(
      "SELECT o_orderpriority, count(*) AS n_orders FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
        "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
        "GROUP BY 1 ORDER BY o_orderpriority"
    ),
  )

  // ---------------------------------------------------------------------
  // q114 — IN over HAVING (TPC-H Q18 shape): orders whose total
  // quantity exceeds 300, with the customer attached — the
  // "large-volume customer" report.
  //
  // Determinism: l_quantity is integer-valued; the total sums exactly
  // in DECIMAL and outputs as BIGINT. Total ORDER BY (qty desc,
  // orderkey).
  //
  // Scale: the IN-list is an aggregate on the fact's OWN join key —
  // groupBy(l_orderkey) then filter, so qualification never carries
  // the fact twice; qualifying keys (a tiny fraction) then semi-gate
  // orders and the customer dim joins last, on the reduced frame.
  val q114: QuerySpec = QuerySpec(
    "q114_large_volume_orders",
    (s, d) => {
      val qual = lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("qty"))
        .where(col("qty") > 300)
        .select(col("l_orderkey"), col("qty").cast("long").as("total_qty"))
      orders(s, d)
        .join(qual, col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate").cast("date").as("order_date"),
          col("total_qty"))
        .orderBy(desc("total_qty"), col("o_orderkey"))
    },
    Some(
      "SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, " +
        "CAST(q.qty AS BIGINT) AS total_qty " +
        "FROM orders JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty " +
        "FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300) q " +
        "ON o_orderkey = q.l_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "ORDER BY total_qty DESC, o_orderkey"
    ),
  )

  // ---------------------------------------------------------------------
  // q115 — NOT EXISTS + above-average gate (TPC-H Q22 shape):
  // customers with above-average positive balance and no URGENT
  // orders, rolled up per market segment.
  //
  // Determinism: the "above average" compare is exact integer-style
  // decimal arithmetic — bal·n > total — never a float average whose
  // summation order could flip a boundary row (the q79/q90 rule).
  //
  // Scale: the average rides a 1-row cross join (never a collect);
  // NOT EXISTS is a LEFT ANTI join against the pre-filtered URGENT
  // orders — the anti side carries only qualifying order keys, and
  // the priority filter is pushed into its scan.
  val q115: QuerySpec = QuerySpec(
    "q115_inactive_above_avg",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 2)
      val c = customer(s, d)
      val t = c.where(col("c_acctbal") > 0)
        .agg(
          sum(col("c_acctbal").cast(dec)).as("tot"),
          count(lit(1)).as("n"))
      c.crossJoin(t) // 1-row average anchor
        .where(col("c_acctbal").cast(dec) * col("n") > col("tot"))
        .join(
          orders(s, d).where(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
          col("o_custkey") === col("c_custkey"),
          "left_anti")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_custs"),
          round(sum(col("c_acctbal").cast(dec)).cast("double"), 2).as("total_bal"))
        .orderBy("c_mktsegment")
    },
    Some(
      "WITH t AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot, count(*) AS n " +
        "FROM customer WHERE c_acctbal > 0) " +
        "SELECT c_mktsegment, count(*) AS n_custs, " +
        "round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal " +
        "FROM customer, t WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > tot " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderpriority = '1-URGENT') " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ),
  )

  // ---------------------------------------------------------------------
  // q116 — max over an aggregate (TPC-H Q15 shape): the top supplier(s)
  // by lineitem revenue in one quarter. The classic "view + scalar max"
  // — revenue aggregates once, its 1-row max broadcasts back as an
  // equality gate (exact: revenue is DECIMAL, so the equality is safe
  // cross-engine where a float sum would not be).
  //
  // Scale: one l_suppkey shuffle for the revenue aggregate (date
  // filter pushed to the scan); the max re-enters as a broadcast,
  // never a driver-side collect; the supplier dim joins the ≤handful
  // of winners.
  val q116: QuerySpec = QuerySpec(
    "q116_top_supplier_revenue",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 2)
      val rev = lineitem(s, d)
        .where(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
          .as("rev"))
      val mx = rev.agg(max(col("rev")).as("mx"))
      rev
        .join(broadcast(mx), col("rev") === col("mx"))
        .join(supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), round(col("rev").cast("double"), 4).as("revenue"))
        .orderBy("s_suppkey")
    },
    Some(
      "WITH r AS (SELECT l_suppkey, " +
        "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01' " +
        "GROUP BY 1) " +
        "SELECT s_suppkey, s_name, round(CAST(rev AS DOUBLE), 4) AS revenue " +
        "FROM r JOIN supplier ON s_suppkey = l_suppkey " +
        "WHERE rev = (SELECT max(rev) FROM r) ORDER BY s_suppkey"
    ),
  )

  // ---------------------------------------------------------------------
  // q128 — double-correlated EXISTS + NOT EXISTS on the fact itself
  // (TPC-H Q21 shape): suppliers who were the SOLE late shipper on a
  // multi-supplier order ("late" = shipped >90 days after order date,
  // the q113 ship-lag convention), counted per supplier at
  // (order, supplier) grain. The last classic subquery shape the
  // family lacked: both subqueries correlate to the same fact table
  // the outer query scans.
  //
  // Scale: the correlated pair is declared as ONE aggregation pass —
  // per-(order, supplier) lateness, then per-order supplier/late
  // counts as a window over the per-supplier frame (order groups are
  // ≤ items-per-order wide, so the window parallelizes across
  // orders); EXISTS ⇔ n_supp ≥ 2, NOT EXISTS ⇔ n_late = 1. The fact
  // is scanned once (plus the broadcast orders date join); no per-row
  // re-execution, no self-join, no second fact pass. The DuckDB
  // oracle runs the textbook correlated form — the hash match proves
  // the single-pass window reformulation IS that semantics.
  val q128: QuerySpec = QuerySpec(
    "q128_lone_late_supplier",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
            .cast("int").as("late"))
      val w = Window.partitionBy("l_orderkey")
      li.groupBy("l_orderkey", "l_suppkey")
        .agg(max("late").as("was_late"))
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late", sum("was_late").over(w))
        .where(col("was_late") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
        .join(Tables.supplier(s, d).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(25)
    },
    Some(
      "WITH qual AS (SELECT DISTINCT l1.l_suppkey, l1.l_orderkey " +
        "FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey " +
        "WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey " +
        "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
        "AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)) " +
        "SELECT s_name, count(*) AS numwait FROM qual JOIN supplier ON s_suppkey = l_suppkey " +
        "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 25"
    ),
  )

  // ---------------------------------------------------------------------
  // q138 — NOT IN over a subquery (the null-aware anti join): parts
  // never shipped by any negative-balance supplier, per brand. The
  // LAST subquery shape the family lacked, and semantically DISTINCT
  // from q115's NOT EXISTS: NOT IN is three-valued — one NULL in the
  // subquery result empties the whole answer, and a NULL probe key is
  // never kept — so Catalyst cannot plan the plain LeftAnti hash join
  // and instead plants the single-column null-aware anti join
  // (plan-pinned in SubqueryQueriesSpec). Declared with Spark's
  // `Column.isin(Dataset)` subquery API under negation — the NOT IN
  // semantics, not an anti-join approximation of them.
  //
  // Scale: NAAJ requires broadcasting the subquery side (the
  // null-check needs every build row visible to every probe) — fine
  // here (distressed-supplier lineitems ≪ broadcast threshold), but
  // the 100 TB rule is: when keys are provably non-null, write NOT
  // EXISTS/LeftAnti instead (q115's shape) and keep the join
  // shuffleable. This query IS the documentation of that boundary.
  val q138: QuerySpec = QuerySpec(
    "q138_parts_no_distressed_supplier",
    (s, d) => {
      val flaggedParts = lineitem(s, d)
        .join(supplier(s, d).where(col("s_acctbal") < 0),
          col("l_suppkey") === col("s_suppkey"))
        .select("l_partkey")
      part(s, d)
        .where(!col("p_partkey").isin(flaggedParts))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"), dsum("p_retailprice").as("retail_value"))
        .orderBy("p_brand")
    },
    Some(
      s"SELECT p_brand, count(*) AS n_parts, ${dsumSql("p_retailprice")} AS retail_value " +
        "FROM part WHERE p_partkey NOT IN (" +
        "SELECT l_partkey FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE s_acctbal < 0) " +
        "GROUP BY 1 ORDER BY p_brand"
    ),
  )

  // ---------------------------------------------------------------------
  // q253 — correlated min-over-group with a multi-dim join (TPC-H Q2's
  // shape, r9): for every size-15 '%ALL'-type part, the European
  // supplier(s) offering it at the minimum observed cost. The testdata
  // has no partsupp (TESTDATA.md), so the q176/q251 emulation supplies
  // it: cost per (part, supplier) = min lineitem extended price — the
  // SHAPE (dim-filtered outer block, region-gated supplier chain, a
  // correlated `cost = (SELECT min(cost) ... WHERE same part)` scalar,
  // acctbal-desc top-100) is Q2's exactly.
  //
  // Scale: the ps emulation is one (part, supplier) hash aggregate of
  // the fact; nation/region and the size-filtered part dim broadcast;
  // the correlated min decorrelates into a per-part aggregate of the
  // SAME European frame (computed once, reused for gate and output —
  // no second fact scan) re-joined on (part, cost) — the aggregate and
  // the re-join share the l_partkey shuffle key. Doubles survive the
  // equality gate because min() SELECTS one of the scanned values
  // rather than computing a new float (the q116 decimal-equality rule
  // has nothing to protect here).
  val q253: QuerySpec = QuerySpec(
    "q253_min_cost_supplier",
    (s, d) => {
      val ps = lineitem(s, d)
        .groupBy("l_partkey", "l_suppkey")
        .agg(min("l_extendedprice").as("cost"))
      val euro = ps
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(
          broadcast(region(s, d).where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("l_partkey", "l_suppkey", "cost", "s_name", "s_acctbal", "n_name")
      val minc = euro.groupBy(col("l_partkey").as("mk")).agg(min("cost").as("min_cost"))
      euro
        .join(
          broadcast(part(s, d).where(col("p_size") === 15 && col("p_type").like("%ALL"))),
          col("l_partkey") === col("p_partkey"))
        .join(minc, col("l_partkey") === col("mk") && col("cost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("cost").as("min_cost"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some(
      "WITH ps AS (SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost " +
        "FROM lineitem GROUP BY 1, 2), " +
        "euro AS (SELECT ps.l_partkey, ps.cost, s.s_name, s.s_acctbal, n.n_name " +
        "FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'EUROPE') " +
        "SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, e.cost AS min_cost " +
        "FROM euro e JOIN part p ON e.l_partkey = p.p_partkey " +
        "WHERE p.p_size = 15 AND p.p_type LIKE '%ALL' " +
        "AND e.cost = (SELECT min(e2.cost) FROM euro e2 WHERE e2.l_partkey = e.l_partkey) " +
        "ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey LIMIT 100"
    ),
  )

  // ---------------------------------------------------------------------
  // q254 — group share of a global aggregate behind HAVING (TPC-H Q11's
  // shape, r9): parts whose one-nation revenue exceeds TWICE the mean
  // per-part value — Q11's 0.0001/SF fraction made scale-free (a fixed
  // fraction empties at larger part counts; share-of-mean keeps the
  // HAVING selective at every SF, ~8% here at both test scales).
  // partsupp's value emulates as lineitem revenue per part (q253's
  // emulation, revenue instead of min cost); the SHAPE (nation-gated
  // supplier chain, per-key aggregate, HAVING sum > global aggregate ×
  // fraction via scalar subqueries over the same view, value-desc
  // ordering) is Q11's exactly.
  //
  // Scale: one l_partkey hash aggregate (nation filter broadcast-
  // pruned before the fact shuffle); the global (total, count) pair
  // re-enters as a 1-row broadcast, never a driver collect. The HAVING
  // compare stays in EXACT decimal, cross-multiplied
  // (value·n_parts > total·2) so no engine ever divides — the q38
  // threshold idiom applied to money.
  val q254: QuerySpec = QuerySpec(
    "q254_part_value_share",
    (s, d) => {
      val rev = lineitem(s, d)
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(
          broadcast(nation(s, d).where(col("n_name") === "NATION_19")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(revenueDecimal.as("value_dec"))
      val tot = rev.agg(sum(col("value_dec")).as("tot"), count(lit(1)).as("n_parts"))
      rev
        .join(broadcast(tot))
        .where(col("value_dec") * col("n_parts") > col("tot") * 2)
        .select(col("l_partkey").as("ps_partkey"),
          round(col("value_dec").cast("double"), 4).as("value"))
        .orderBy(desc("value"), col("ps_partkey"))
    },
    Some(
      s"WITH r AS (SELECT l_partkey, $revenueDecimalSql AS v " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE n_name = 'NATION_19' GROUP BY 1) " +
        "SELECT l_partkey AS ps_partkey, round(CAST(v AS DOUBLE), 4) AS value " +
        "FROM r WHERE v * (SELECT count(*) FROM r) > (SELECT sum(v) FROM r) * 2 " +
        "ORDER BY value DESC, ps_partkey"
    ),
  )

  val all: Seq[QuerySpec] = Seq(q113, q114, q115, q116, q128, q138, q253, q254)
}
