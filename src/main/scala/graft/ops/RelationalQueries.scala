package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** q01–q24: the reference's relational surface re-expressed Spark-first.
  *
  * Each query cites the reference capability it covers (SURVEY.md §2.1
  * operator ids, with reference file:line in the scaladoc of each member).
  * All queries are pure `(SparkSession, sfDir) => DataFrame` programs over
  * the driver-generated parquet tables; every query ends in a total ORDER
  * BY over a unique key so the DuckDB oracle hash-match is deterministic.
  *
  * Scale notes appear per query: these run at sf0.01 for correctness but
  * are written for a 1000-executor cluster — aggregations are partial
  * (map-side combine comes free with groupBy/agg), dimension joins
  * broadcast, filters stay pushdown-friendly (no casts on the filtered
  * column), and no query collects to the driver.
  */
object RelationalQueries {
  import Tables._
  import Exact._

  // ---------------------------------------------------------------------
  // q01 — projection (S2/S3: GAQL SELECT field list, pipeline.py:92-97).
  // Column pruning reaches the parquet scan: ReadSchema lists only these
  // four columns.
  val q01: QuerySpec = QuerySpec(
    "q01_project",
    (s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"),
    Some(
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem " +
        "ORDER BY l_orderkey, l_linenumber"
    ),
  )

  // q02 — inclusive date-range predicate (F1: WHERE date BETWEEN,
  // pipeline.py:96). The filter is on the raw timestamp column (no cast)
  // so it pushes down to the parquet row-group stats.
  val q02: QuerySpec = QuerySpec(
    "q02_filter_date_range",
    (s, d) =>
      lineitem(s, d)
        .where(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        )
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("l_quantity"),
        )
        .orderBy("l_orderkey", "l_linenumber"),
    Some(
      "SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, l_quantity " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "ORDER BY l_orderkey, l_linenumber"
    ),
  )

  // q03 — nested→flat snake_case (S3: attr-path walk, pipeline.py:99-107).
  // Builds a struct then re-flattens it with `_`-joined names, exactly the
  // reference's `campaign.id → campaign_id` rename.
  val q03: QuerySpec = QuerySpec(
    "q03_flatten_snake_case",
    (s, d) =>
      nation(s, d)
        .select(
          struct(col("n_nationkey").as("nationkey"), col("n_name").as("name")).as("nation"),
          col("n_regionkey"),
        )
        .select(
          col("nation.nationkey").as("nation_nationkey"),
          col("nation.name").as("nation_name"),
          col("n_regionkey"),
        )
        .orderBy("nation_nationkey"),
    Some(
      "SELECT n_nationkey AS nation_nationkey, n_name AS nation_name, n_regionkey " +
        "FROM nation ORDER BY nation_nationkey"
    ),
  )

  // q04 — FLAGSHIP fact rollup at the campaign-daily grain (A7:
  // warehouse_tables.sql:2-11). scan → filter-free full agg → order.
  // Partial aggregation (map-side combine) means the shuffle carries one
  // row per (cust, d) per task, not per input row — the pattern that
  // holds at 100 TB.
  val q04: QuerySpec = QuerySpec(
    "q04_fact_rollup_daily",
    (s, d) =>
      lineitem(s, d)
        .groupBy(
          (col("l_orderkey") % 100).as("cust"),
          col("l_shipdate").cast("date").as("d"),
        )
        .agg(
          revenueExpr.as("revenue"),
          sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact in fp64
          count(lit(1)).as("n_rows"),
        )
        .orderBy("cust", "d"),
    Some(
      "SELECT l_orderkey % 100 AS cust, CAST(l_shipdate AS DATE) AS d, " +
        s"$revenueSql AS revenue, sum(l_quantity) AS sum_qty, count(*) AS n_rows " +
        "FROM lineitem GROUP BY 1, 2 ORDER BY cust, d"
    ),
  )

  // q05 — micros↔currency conversion (X8: cost_micros storage,
  // warehouse_tables.sql:9; /1e6 at serving).
  val q05: QuerySpec = QuerySpec(
    "q05_micros_currency",
    (s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice") * lit(1000000d), 0).cast(LongType).as("price_micros"),
        )
        .withColumn("price_currency", col("price_micros") / lit(1000000d))
        .orderBy("l_orderkey", "l_linenumber"),
    Some(
      "SELECT l_orderkey, l_linenumber, CAST(round(l_extendedprice * 1000000) AS BIGINT) AS price_micros, " +
        "CAST(round(l_extendedprice * 1000000) AS BIGINT) / 1000000.0 AS price_currency " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"
    ),
  )

  // q06 — count by group (A1: status_counts, cli.py:266-274).
  val q06: QuerySpec = QuerySpec(
    "q06_status_counts",
    (s, d) =>
      events(s, d).groupBy("event_type").agg(count(lit(1)).as("cnt")).orderBy("event_type"),
    Some("SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY event_type"),
  )

  // q07 — min/max/avg (A2: attempt-count stats, cli.py:282-291). The avg
  // is defined as exact-decimal sum / count to stay engine-independent.
  val q07: QuerySpec = QuerySpec(
    "q07_minmaxavg",
    (s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(
          min("value").as("min_value"),
          max("value").as("max_value"),
          round(dsum("value") / count(lit(1)), 4).as("avg_value"),
        )
        .orderBy("event_type"),
    Some(
      "SELECT event_type, min(value) AS min_value, max(value) AS max_value, " +
        s"round(${dsumSql("value")} / count(*), 4) AS avg_value " +
        "FROM events GROUP BY 1 ORDER BY event_type"
    ),
  )

  // q08 — per-group date range (A3: earliest/latest logical_date,
  // cli.py:275-281). Timestamps surface as epoch micros (exact integers)
  // so Spark-µs and DuckDB-ns readings agree.
  val q08: QuerySpec = QuerySpec(
    "q08_group_date_range",
    (s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(
          min(unix_micros(col("ts").cast("timestamp"))).as("first_us"),
          max(unix_micros(col("ts").cast("timestamp"))).as("last_us"),
        )
        .orderBy("event_type"),
    Some(
      "SELECT event_type, min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us " +
        "FROM events GROUP BY 1 ORDER BY event_type"
    ),
  )

  // q09 — bucketed histogram (A4: attempt buckets 1-2/3-5/6-10/10+,
  // cli.py:439-456). One `when` chain, one shuffle of 4 rows.
  val q09: QuerySpec = QuerySpec(
    "q09_histogram",
    (s, d) =>
      lineitem(s, d)
        .select(
          when(col("l_quantity") <= 2, "1-2")
            .when(col("l_quantity") <= 5, "3-5")
            .when(col("l_quantity") <= 10, "6-10")
            .otherwise("10+")
            .as("bucket")
        )
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket"),
    Some(
      "SELECT CASE WHEN l_quantity <= 2 THEN '1-2' WHEN l_quantity <= 5 THEN '3-5' " +
        "WHEN l_quantity <= 10 THEN '6-10' ELSE '10+' END AS bucket, count(*) AS cnt " +
        "FROM lineitem GROUP BY 1 ORDER BY bucket"
    ),
  )

  // q10 — multi-key top-N (T2: failed partitions by (-attempts, keys...),
  // cli.py:308-318). orderBy+limit compiles to TakeOrderedAndProject — a
  // per-partition bounded heap then a driver merge of N*partitions rows,
  // no global sort. Exactly the 100 TB-safe top-k.
  val q10: QuerySpec = QuerySpec(
    "q10_topn_multikey",
    (s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10),
    Some(
      "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
    ),
  )

  // q11 — latest-run-wins authority (D2: max run_id wins,
  // validator.py:114-121). Window dedup keeping exactly one row per key.
  val q11: QuerySpec = QuerySpec(
    "q11_latest_run_wins",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(
          col("user_id"),
          col("event_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          col("value"),
        )
        .orderBy("user_id")
    },
    Some(
      "SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, value FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM events) WHERE rn = 1 ORDER BY user_id"
    ),
  )

  // q12 — head-N per group (T4: preview sampling, consumer_preview.py:39-42).
  val q12: QuerySpec = QuerySpec(
    "q12_head_n_per_group",
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy(asc("ts"), asc("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("event_type"), col("rn"), col("event_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .orderBy("event_type", "rn")
    },
    Some(
      "SELECT event_type, rn, event_id, epoch_us(ts) AS ts_us FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS rn " +
        "FROM events) WHERE rn <= 5 ORDER BY event_type, rn"
    ),
  )

  // q13 — date-gap detection (E1: cli.py:381-398): for a sparse slice
  // (one user), enumerate each type's [min,max] day span and anti-join
  // the present days. sequence+explode stays distributed — the spans are
  // generated per group on executors, never on the driver.
  val q13: QuerySpec = QuerySpec(
    "q13_gap_detection",
    (s, d) => {
      val present = events(s, d)
        .where(col("user_id") === 7)
        .select(col("event_type"), col("ts").cast("date").as("day"))
        .distinct()
      val spans = present
        .groupBy("event_type")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("day"))
      spans
        .join(present, Seq("event_type", "day"), "left_anti")
        .orderBy("event_type", "day")
    },
    Some(
      "WITH present AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events WHERE user_id = 7), " +
        "bounds AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM present GROUP BY 1), " +
        "spans AS (SELECT event_type, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds) " +
        "SELECT s.event_type, s.day FROM spans s WHERE NOT EXISTS (" +
        "SELECT 1 FROM present p WHERE p.event_type = s.event_type AND p.day = s.day) " +
        "ORDER BY event_type, day"
    ),
  )

  // q14 — freshness lag (E3: cli.py:350-365) against a fixed anchor date
  // (determinism: no current_date()).
  val q14: QuerySpec = QuerySpec(
    "q14_freshness_lag",
    (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(max(col("ts").cast("date")).as("last_day"))
        .select(
          col("user_id"),
          col("last_day"),
          datediff(lit("2024-02-15").cast("date"), col("last_day")).cast(LongType).as("lag_days"),
        )
        .orderBy("user_id"),
    Some(
      "SELECT user_id, max(CAST(ts AS DATE)) AS last_day, " +
        "date_diff('day', max(CAST(ts AS DATE)), DATE '2024-02-15') AS lag_days " +
        "FROM events GROUP BY 1 ORDER BY user_id"
    ),
  )

  // q15 — date-range enumeration (E2: backfill planning, cli.py:597-655).
  val q15: QuerySpec = QuerySpec(
    "q15_date_enumerate",
    (s, d) =>
      s.range(1)
        .select(
          explode(
            sequence(lit("1994-01-01").cast("date"), lit("1994-03-31").cast("date"))
          ).as("day")
        )
        .groupBy(trunc(col("day"), "month").as("month_start"))
        .agg(count(lit(1)).as("n_days"))
        .orderBy("month_start"),
    Some(
      "SELECT CAST(date_trunc('month', day) AS DATE) AS month_start, count(*) AS n_days FROM (" +
        "SELECT CAST(unnest(generate_series(DATE '1994-01-01', DATE '1994-03-31', INTERVAL 1 DAY)) AS DATE) AS day) " +
        "GROUP BY 1 ORDER BY month_start"
    ),
  )

  // q16 — full reconcile (J1+J2: warehouse/loader.py:51-107): state vs
  // pointer snapshots classified load/replace/noop/demote in one
  // full-outer join — the set-based form of the reference's per-row
  // lookups, and the shape that scales (one shuffle on the key).
  val q16: QuerySpec = QuerySpec(
    "q16_reconcile_full_outer",
    (s, d) => {
      val states = orders(s, d)
        .where(col("o_orderstatus") === "O")
        .select(col("o_orderkey").as("k"), (col("o_orderkey") % 5).as("s_run"))
      val pointers = orders(s, d)
        .where(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("k"), (col("o_orderkey") % 7).as("p_run"))
      states
        .join(pointers, Seq("k"), "full_outer")
        .select(
          col("k"),
          when(col("p_run").isNull, "load")
            .when(col("s_run").isNull, "demote")
            .when(col("s_run") =!= col("p_run"), "replace")
            .otherwise("noop")
            .as("action"),
        )
        .orderBy("k")
    },
    Some(
      "WITH states AS (SELECT o_orderkey AS k, o_orderkey % 5 AS s_run FROM orders WHERE o_orderstatus = 'O'), " +
        "pointers AS (SELECT o_orderkey AS k, o_orderkey % 7 AS p_run FROM orders WHERE o_orderkey % 3 = 0) " +
        "SELECT COALESCE(s.k, p.k) AS k, CASE WHEN p.k IS NULL THEN 'load' WHEN s.k IS NULL THEN 'demote' " +
        "WHEN s.s_run <> p.p_run THEN 'replace' ELSE 'noop' END AS action " +
        "FROM states s FULL OUTER JOIN pointers p ON s.k = p.k ORDER BY k"
    ),
  )

  // q17 — anti-join demote (J2: warehouse/loader.py:92-101): customers
  // with no 'P'-status order (the filtered right side keeps the result
  // non-empty at every sf).
  val q17: QuerySpec = QuerySpec(
    "q17_anti_join_demote",
    (s, d) =>
      customer(s, d)
        .join(
          orders(s, d).where(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"),
          "left_anti",
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some(
      "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (" +
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P') " +
        "ORDER BY c_custkey"
    ),
  )

  // q18 — semi-join consumer gate (J3: consumer_preview.py:28-43): rows
  // visible only when their parent is authoritative.
  val q18: QuerySpec = QuerySpec(
    "q18_semi_join_success",
    (s, d) =>
      lineitem(s, d)
        .join(
          orders(s, d).where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"),
          "left_semi",
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
    Some(
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l WHERE EXISTS (" +
        "SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F') " +
        "ORDER BY l_orderkey, l_linenumber"
    ),
  )

  // q19 — last-writer-wins upsert (D1: INSERT..ON CONFLICT DO UPDATE,
  // state_store.py:123-163) as union + window dedup: two snapshots
  // merged, newest per (user_id, event_type) wins.
  val q19: QuerySpec = QuerySpec(
    "q19_upsert_last_writer",
    (s, d) => {
      val ev = events(s, d)
      val snapA = ev.where(col("event_id") % 2 === 0)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
      val snapB = ev.where(col("event_id") % 2 === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
          (col("value") * 2).as("value"))
      val w = Window.partitionBy("user_id", "event_type").orderBy(desc("ts"), desc("event_id"))
      snapA.unionByName(snapB)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
        .orderBy("user_id", "event_type")
    },
    Some(
      "WITH merged AS (" +
        "SELECT user_id, event_type, event_id, ts, value FROM events WHERE event_id % 2 = 0 " +
        "UNION ALL " +
        "SELECT user_id, event_type, event_id, ts, value * 2 AS value FROM events WHERE event_id % 2 = 1) " +
        "SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM merged) WHERE rn = 1 ORDER BY user_id, event_type"
    ),
  )

  // q20 — record-count validation (A6: validator.py:43-53): declared vs
  // actual row-count per partition, mismatch flagged.
  val q20: QuerySpec = QuerySpec(
    "q20_count_validate",
    (s, d) => {
      val actual = lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"), max(col("l_linenumber")).cast(LongType).as("declared"))
      orders(s, d)
        .join(actual, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .select(
          col("o_orderkey"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"),
          when(col("n_lines").isNull, "missing")
            .when(col("n_lines") === col("declared"), "ok")
            .otherwise("mismatch")
            .as("status"),
        )
        .orderBy("o_orderkey")
    },
    Some(
      "WITH actual AS (SELECT l_orderkey, count(*) AS n_lines, CAST(max(l_linenumber) AS BIGINT) AS declared " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT o_orderkey, COALESCE(n_lines, 0) AS n_lines, " +
        "CASE WHEN n_lines IS NULL THEN 'missing' WHEN n_lines = declared THEN 'ok' ELSE 'mismatch' END AS status " +
        "FROM orders o LEFT OUTER JOIN actual a ON o.o_orderkey = a.l_orderkey ORDER BY o_orderkey"
    ),
  )

  // q21 — star-schema join (J4: fact + dims, warehouse_tables.sql:15-16).
  // region/nation/customer are far under the broadcast threshold, so
  // Catalyst plans BroadcastHashJoins for them; only the
  // orders⋈lineitem spine shuffles. That asymmetry is the whole point at
  // 100 TB: dims ship to executors once, the fact table never re-sorts.
  val q21: QuerySpec = QuerySpec(
    "q21_star_join",
    (s, d) => {
      val r = region(s, d); val n = nation(s, d); val c = customer(s, d)
      val o = orders(s, d); val l = lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(revenueExpr.as("revenue"), count(lit(1)).as("n_rows"))
        .orderBy("r_name")
    },
    Some(
      "SELECT r_name, " + revenueSql + " AS revenue, count(*) AS n_rows " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY 1 ORDER BY r_name"
    ),
  )

  // q22 — union of runs (multi-partition union, the reference's
  // per-run/per-customer file outputs merged; SURVEY §2.2 set ops).
  val q22: QuerySpec = QuerySpec(
    "q22_union_runs",
    (s, d) => {
      val l = lineitem(s, d)
      val a = l.where(col("l_orderkey") % 2 === 0)
      val b = l.where(col("l_orderkey") % 2 === 1)
      a.unionByName(b)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },
    Some(
      "WITH u AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 0 " +
        "UNION ALL SELECT * FROM lineitem WHERE l_orderkey % 2 = 1) " +
        "SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_rows " +
        "FROM u GROUP BY 1 ORDER BY l_returnflag"
    ),
  )

  // q23 — two-grain rollup (A7: the campaign vs ad-group grains as one
  // GROUPING SETS query; SURVEY §2.2). rollup + grouping-filter ≡
  // GROUPING SETS ((flag),(flag,status)).
  val q23: QuerySpec = QuerySpec(
    "q23_rollup_two_grain",
    (s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          revenueExpr.as("revenue"),
          count(lit(1)).as("n_rows"),
        )
        .where(grouping(col("l_returnflag")) === 0)
        .select("l_returnflag", "l_linestatus", "sum_qty", "revenue", "n_rows")
        .orderBy(asc("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some(
      "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        revenueSql + " AS revenue, count(*) AS n_rows " +
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus)) " +
        "ORDER BY l_returnflag ASC, l_linestatus ASC NULLS FIRST"
    ),
  )

  // q24 — distinct-entity counts (A5: cli.py:350-361). Exact
  // countDistinct (the oracle needs exactness); at 100 TB the same call
  // with approx_count_distinct is the first knob to turn.
  val q24: QuerySpec = QuerySpec(
    "q24_distinct_entities",
    (s, d) =>
      events(s, d)
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .agg(
          countDistinct(col("event_type")).as("n_types"),
          countDistinct(col("user_id")).as("n_users"),
        )
        .orderBy("user_bucket"),
    Some(
      "SELECT user_id % 10 AS user_bucket, count(DISTINCT event_type) AS n_types, " +
        "count(DISTINCT user_id) AS n_users FROM events GROUP BY 1 ORDER BY user_bucket"
    ),
  )

  // ---------------------------------------------------------------------
  // q125 — snapshot diff: row-level reconciliation of two table
  // versions into added/removed/changed classes with per-column
  // change flags — the audit a replace-by-partition warehouse
  // (SURVEY D3) runs before promoting a rewrite, one level deeper
  // than q16's key-presence reconcile (which classes KEYS; this
  // classes VALUES). The two snapshots derive deterministically from
  // orders (modulo-key deletions/additions, an exact +10.0 price
  // drift, a status flip) so the oracle sees identical inputs.
  //
  // Scale: one full outer join on the snapshot key — the minimum any
  // row-diff costs — with change predicates evaluated in the join's
  // projection, never a second pass; 'unchanged' rows (the ~95%
  // bulk) drop INSIDE the join output filter, so only the diff
  // itself survives the exchange downstream. Column flags are plain
  // boolean expressions — a wide table diffs by generating one flag
  // per column, same plan.
  val q125: QuerySpec = QuerySpec(
    "q125_snapshot_diff",
    (s, d) => {
      val o = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val snapA = o.where(col("o_orderkey") % 97 =!= 0)
      val snapB = o.where(col("o_orderkey") % 89 =!= 0)
        .select(
          col("o_orderkey"),
          when(col("o_orderkey") % 13 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      snapA.as("a")
        .join(snapB.as("b"), col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
        .select(
          coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("o_orderkey"),
          when(col("a.o_orderkey").isNull, "added")
            .when(col("b.o_orderkey").isNull, "removed")
            .otherwise("changed").as("class"),
          (col("a.o_orderkey").isNotNull && col("b.o_orderkey").isNotNull &&
            col("a.o_orderstatus") =!= col("b.o_orderstatus")).as("status_changed"),
          (col("a.o_orderkey").isNotNull && col("b.o_orderkey").isNotNull &&
            col("a.o_totalprice") =!= col("b.o_totalprice")).as("price_changed"),
          col("a.o_orderkey").isNull.as("is_added"),
          col("b.o_orderkey").isNull.as("is_removed"))
        .where(col("is_added") || col("is_removed") ||
          col("status_changed") || col("price_changed"))
        .select("o_orderkey", "class", "status_changed", "price_changed")
        .orderBy("o_orderkey")
    },
    Some(
      "WITH snap_a AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
        "WHERE o_orderkey % 97 <> 0), " +
        "snap_b AS (SELECT o_orderkey, " +
        "CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus, " +
        "CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 89 <> 0) " +
        "SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey, " +
        "CASE WHEN a.o_orderkey IS NULL THEN 'added' " +
        "WHEN b.o_orderkey IS NULL THEN 'removed' ELSE 'changed' END AS class, " +
        "CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL " +
        "AND a.o_orderstatus <> b.o_orderstatus THEN TRUE ELSE FALSE END AS status_changed, " +
        "CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL " +
        "AND a.o_totalprice <> b.o_totalprice THEN TRUE ELSE FALSE END AS price_changed " +
        "FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey " +
        "WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL " +
        "OR a.o_orderstatus <> b.o_orderstatus OR a.o_totalprice <> b.o_totalprice " +
        "ORDER BY o_orderkey"
    ),
  )

  // ---------------------------------------------------------------------
  // q226 — declarative data-quality EXPECTATIONS gate (Deequ-shaped):
  // a fixed rule set — completeness, key uniqueness, value range,
  // domain membership, referential integrity — evaluated over the
  // orders feed in as few passes as the rules allow, emitting the
  // per-rule (checked, violations, pass) table a load pipeline gates
  // on before publish. q93 PROFILES columns (descriptive); this one
  // GATES them (normative) — the A6/validate-stage discipline (the
  // reference's record-count check) generalized to arbitrary
  // predicates. Rule results are DATA, so downstream "block the
  // publish" logic is a filter on pass = false, not code.
  //
  // Scale: the four row-local rules share ONE conditional-aggregation
  // scan (violations are count(CASE ...) columns, map-side combined);
  // only referential integrity pays a join — an anti-join against the
  // broadcast-able customer key set (E4's bloom form when the dim
  // outgrows broadcast). The rule axis unpivots from one 1-row frame:
  // adding a rule adds a CASE column, never a scan.
  val q226: QuerySpec = QuerySpec(
    "q226_quality_expectations",
    (s, d) =>
      Expectations.evaluate(orders(s, d), Seq(
        Expectations.NotNull("completeness_orderpriority", "o_orderpriority"),
        Expectations.Unique("uniqueness_orderkey", Seq("o_orderkey")),
        Expectations.Predicate("range_totalprice_positive", col("o_totalprice") > 0),
        Expectations.InSet("domain_orderstatus", "o_orderstatus", Seq("O", "F", "P")),
        Expectations.RefIntegrity("referential_custkey", "o_custkey",
          customer(s, d), "c_custkey"),
      )),
    Some(
      // NULL counts as a violation for predicate/domain rules (the
      // library's semantics: an expectation that cannot be established
      // is not met) — the IS NULL arms keep the oracle aligned.
      "WITH r AS (SELECT count(*) AS n, " +
        "count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS v_completeness, " +
        // count(col), not count(*): NULL keys are excluded from the
        // uniqueness count (the library's Unique semantics)
        "count(o_orderkey) - count(DISTINCT o_orderkey) AS v_uniqueness, " +
        "count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 END) AS v_range, " +
        "count(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END) AS v_domain " +
        "FROM orders), " +
        "ref AS (SELECT count(*) AS v_referential FROM orders o " +
        "WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)), " +
        "rules AS (" +
        "SELECT 'completeness_orderpriority' AS rule, n AS n_checked, CAST(v_completeness AS BIGINT) AS n_violations FROM r " +
        "UNION ALL SELECT 'uniqueness_orderkey', n, CAST(v_uniqueness AS BIGINT) FROM r " +
        "UNION ALL SELECT 'range_totalprice_positive', n, CAST(v_range AS BIGINT) FROM r " +
        "UNION ALL SELECT 'domain_orderstatus', n, CAST(v_domain AS BIGINT) FROM r " +
        "UNION ALL SELECT 'referential_custkey', n, CAST(v_referential AS BIGINT) FROM r CROSS JOIN ref) " +
        "SELECT rule, n_checked, n_violations, n_violations = 0 AS pass " +
        "FROM rules ORDER BY rule"
    ),
  )

  // ---------------------------------------------------------------------
  // q250 — TPC-H Q12's shape (two-branch conditional aggregate over a
  // fact⋈fact join): for each return class of lines shipped in 1997,
  // how many belong to high-priority orders vs everything else. The
  // testdata lineitem carries no l_shipmode/l_receiptdate (TESTDATA.md),
  // so l_returnflag stands in as the small-cardinality grouping key and
  // l_shipdate as the year window — the SHAPE (selective date filter
  // pushed to the fact scan, equi-join on the order key, CASE-branch
  // sums with map-side combine, 3-row result) is Q12's exactly.
  //
  // Scale: both sides are fact-sized, so this is the one relational
  // query whose join legitimately shuffles both inputs on o_orderkey —
  // no broadcast pretence. The 1997 filter prunes lineitem row groups
  // before the exchange (min/max stats on l_shipdate), orders carries
  // only (o_orderkey, o_orderpriority) into the shuffle after pruning,
  // and the conditional sums collapse to 3 groups map-side. On a
  // cluster with both tables bucketed by order key (q179's layout) the
  // exchange disappears entirely.
  val q250: QuerySpec = QuerySpec(
    "q250_priority_linecount",
    (s, d) =>
      lineitem(s, d)
        .where(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        )
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0).otherwise(1))
            .as("low_line_count"),
        )
        .orderBy("l_returnflag"),
    Some(
      "SELECT l_returnflag, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
  )

  // ---------------------------------------------------------------------
  // q251 — TPC-H Q16's shape (distinct-count grouping behind a NOT IN
  // supplier exclusion): how many distinct suppliers ship each
  // surviving (brand, type, size) part profile, excluding suppliers in
  // bad standing. The testdata has no partsupp table and supplier has
  // no s_comment (TESTDATA.md), so lineitem provides the part⇄supplier
  // association and s_acctbal < 0 stands in for the complaints
  // predicate — the SHAPE (negated dim predicates, IN-list on size,
  // NOT IN subquery as an anti-join, count(DISTINCT) per 3-part key,
  // count-desc ordering) is Q16's exactly.
  //
  // Scale: the exclusion list is a filtered slice of the supplier dim
  // — broadcast left_anti, so the fact never shuffles for it (NOT IN
  // is null-sensitive in general, but s_suppkey is a non-null key, so
  // anti-join ≡ NOT IN here; the E4 bloom form takes over if the dim
  // ever outgrows broadcast). The part predicates prune the dim BEFORE
  // its join (~15% of sizes survive the IN-list), and countDistinct
  // compiles to the two-phase partial-distinct aggregate — per-group
  // supplier sets never concentrate on one task.
  val q251: QuerySpec = QuerySpec(
    "q251_supplier_cnt_excl",
    (s, d) =>
      lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .where(
          col("p_brand") =!= "Brand#45" &&
            !col("p_type").like("MEDIUM%") &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .join(
          broadcast(supplier(s, d).where(col("s_acctbal") < 0).select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"),
          "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size")),
    Some(
      "SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%' " +
        "AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) " +
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY p_brand, p_type, p_size " +
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
    ),
  )

  val all: Seq[QuerySpec] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12,
    q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q125, q226,
    q250, q251,
  )
}
