package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable-sketch queries — cardinality (q119), quantiles (q181),
  * point frequencies (q196), rolling reach (q209). The family whose
  * 100 TB story is REAGGREGATION: a sketch built per partition / per
  * day / per source merges into any coarser grain without touching
  * raw data again, which exact distincts/percentiles fundamentally
  * cannot (they must re-shuffle raw keys or re-sort raw values for
  * every new grouping).
  *
  * Since round 9 every registered query here runs a PORTABLE sketch
  * whose estimate is defined over exact integers (md5-derived hashes,
  * BIGINT ranks and divisions), so each carries a real DuckDB oracle
  * — the same upgrade q37/q38 (portable sign-LSH), q42 (fixed-point
  * Lloyd) and q202 (fixed-point power iteration) made in rounds 8–9.
  * The constructions are the classic ones:
  *
  *  - '''q119 / q209 — KMV (k-minimum-values), the theta-sketch
  *    family.''' State per group = the k smallest distinct 48-bit
  *    hashes (KB, mergeable: bottom-k of a union is the bottom-k of
  *    the concatenated per-part bottom-k's — an EXACT identity, not
  *    an approximation). Estimate = (k−1)·2⁴⁸ div h₍ₖ₎ — one BIGINT
  *    division, bit-identical in every engine; when a group has
  *    fewer than k distinct hashes the estimator degrades to the
  *    EXACT distinct count (the small-range regime needs no
  *    ln-based linear-counting branch, the reason KMV rather than
  *    raw-HLL is the portable registration). σ ≈ 1/√(k−2) ≈ 6% at
  *    k=256; the spec additionally pins the merge identity and the
  *    n<k exactness.
  *  - '''q181 — bottom-k-by-hash quantile sample.''' The sample
  *    (k=1024 smallest row-hashes per group) is a uniform random
  *    subset fixed by md5, mergeable exactly like KMV; quantile
  *    estimates are nearest-rank picks from the sample under a
  *    total order, so every output value is an actual data value
  *    (doubles compare bit-equal cross-engine). Rank error
  *    σ = √(p(1−p)/k) ≤ 1.6%.
  *  - '''q196 — CountMin with portable row hashes.''' Counters are
  *    plain BIGINT sums over (row, bucket) cells — CMS merge is
  *    counter ADDITION, so the per-shard build (a map-side-combined
  *    groupBy) is bit-identical to a one-shot sketch by
  *    construction, and the point estimate is a min over d cells.
  *
  * The Spark-native DataSketches aggregates (hll_sketch_agg, theta_*,
  * kll_*, count_min_sketch — codegen'd, no UDFs) remain first-class
  * library machinery: SketchQueriesSpec pins their error bounds,
  * merge identities and theta set algebra alongside the portable
  * forms, and GraftExtensions exposes the CMS surface in SQL. At
  * 100 TB either family works; the portable forms exist so the
  * registered estimates are cross-engine verifiable, the same reason
  * MinHash.portableHash60 exists (repo:functions/MinHash.scala).
  *
  * Reference anchor: the reference has no sketches at all — its
  * distinct counts are exact SQL over state tables
  * (ref:database/queries.py) — so this family is part of the
  * beyond-reference LLM-pipeline surface.
  */
object SketchQueries {
  import Tables._
  import graft.functions.MinHash.{portableHash48 => hash48, portableHash60}

  private val duckHash48 =
    "CAST(('0x' || substr(md5(%s), 1, 15)) AS BIGINT) // 4096"

  // KMV parameters. (k−1)·2⁴⁸ fits comfortably in BIGINT
  // (255·2⁴⁸ ≈ 7.2e16 < 2⁶³), which is what caps k·hash-width here:
  // 48-bit hashes keep the numerator exact in BOTH engines' int64.
  private val KmvK = 256
  private val KmvNum = (KmvK - 1).toLong << 48 // 71776119061217280

  /** q119 — audience reach per event type: portable KMV distinct-user
    * estimate beside the exact count. Plan shape: one scan → distinct
    * (group, hash) → per-group bottom-k via row_number≤k (Spark 3.5+
    * inserts WindowGroupLimit, so each input partition keeps only its
    * local top-k before the shuffle — state per group is k longs,
    * never the raw id set). The estimate is one BIGINT division.
    */
  val q119: QuerySpec = QuerySpec(
    "q119_sketch_reach",
    (s, d) => {
      val ev = events(s, d).where(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"))
      val hashed = ev
        .select(col("event_type"),
          hash48(concat(lit("u|"), col("user_id").cast("string"))).as("h48"))
        .distinct()
      val ranked = hashed.withColumn("rn",
        row_number().over(Window.partitionBy("event_type").orderBy("h48")))
      val kth = ranked.where(col("rn") === KmvK)
        .select(col("event_type"), col("h48").as("hk"))
      val nd = hashed.groupBy("event_type").agg(count(lit(1)).as("nd"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      nd.join(kth, Seq("event_type"), "left")
        .join(exact, Seq("event_type"))
        .select(
          col("event_type"),
          when(col("hk").isNotNull, expr(s"$KmvNum div hk"))
            .otherwise(col("nd")).as("est_users"),
          col("exact_users"))
        .orderBy("event_type")
    },
    Some(
      "WITH ev AS (SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL), " +
        s"h AS (SELECT DISTINCT event_type, ${duckHash48.format("'u|' || CAST(user_id AS VARCHAR)")} AS h48 FROM ev), " +
        "r AS (SELECT event_type, h48, row_number() OVER (PARTITION BY event_type ORDER BY h48) AS rn FROM h), " +
        s"kth AS (SELECT event_type, h48 AS hk FROM r WHERE rn = $KmvK), " +
        "nd AS (SELECT event_type, count(*) AS nd FROM h GROUP BY 1), " +
        "ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users FROM ev GROUP BY 1) " +
        s"SELECT nd.event_type, CASE WHEN kth.hk IS NOT NULL THEN $KmvNum // kth.hk ELSE nd.nd END AS est_users, ex.exact_users " +
        "FROM nd LEFT JOIN kth USING (event_type) JOIN ex ON nd.event_type = ex.event_type ORDER BY 1"),
  )

  // ---------------------------------------------------------------------
  // q181 — mergeable quantile sketch: per-group approximate P50/P95/P99
  // of the price distribution from a bottom-k-by-hash sample. Exact
  // percentiles (q49) must re-sort raw values for every new grouping;
  // the hash-sample is a FUNCTION of the row multiset (md5 of the row
  // key), so per-shard bottom-k samples merge into any coarser grain
  // carrying k rows — the only per-group-quantile design that both
  // survives 100 TB × many grains AND replays exactly in a second
  // engine. Estimates are nearest-rank picks under the total order
  // (price, hash): actual data values, never interpolated floats.
  //
  // Scale: row_number≤k per group is WindowGroupLimit-pruned (each
  // input partition keeps k rows before the shuffle); the quantile
  // window then runs on ≤k-row frames per group — the documented
  // bounded-frame exception (Ranks rule). The native KLL aggregates
  // remain pinned in SketchQueriesSpec as the at-scale alternative
  // when cross-engine replay is not required.
  private val QuantK = 1024

  val q181: QuerySpec = QuerySpec(
    "q181_kll_quantiles",
    (s, d) => {
      val li = lineitem(s, d).select(
        col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
        .withColumn("h", portableHash60(concat(
          lit("q|"), col("l_orderkey").cast("string"),
          lit("|"), col("l_linenumber").cast("string"))))
      val sample = li.withColumn("rn",
        row_number().over(Window.partitionBy("l_returnflag")
          .orderBy("h", "l_orderkey", "l_linenumber")))
        .where(col("rn") <= QuantK)
      val ranked = sample
        .withColumn("rn2", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("l_extendedprice", "h")))
        .withColumn("ns", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      val nRows = lineitem(s, d).groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
      ranked
        .groupBy("l_returnflag")
        .agg(
          max(when(col("rn2") === expr("(50 * ns + 99) div 100"), col("l_extendedprice"))).as("p50"),
          max(when(col("rn2") === expr("(95 * ns + 99) div 100"), col("l_extendedprice"))).as("p95"),
          max(when(col("rn2") === expr("(99 * ns + 99) div 100"), col("l_extendedprice"))).as("p99"))
        .join(nRows, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_rows"), col("p50"), col("p95"), col("p99"))
        .orderBy("l_returnflag")
    },
    Some(
      "WITH li AS (SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber, " +
        "CAST(('0x' || substr(md5('q|' || CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM lineitem), " +
        "s AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY h, l_orderkey, l_linenumber) AS rn FROM li " +
        s"QUALIFY rn <= $QuantK), " +
        "r AS (SELECT l_returnflag, l_extendedprice, " +
        "row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice, h) AS rn2, " +
        "count(*) OVER (PARTITION BY l_returnflag) AS ns FROM s), " +
        "n AS (SELECT l_returnflag, count(*) AS n_rows FROM lineitem GROUP BY 1) " +
        "SELECT n.l_returnflag, n.n_rows, " +
        "max(CASE WHEN rn2 = (50 * ns + 99) // 100 THEN l_extendedprice END) AS p50, " +
        "max(CASE WHEN rn2 = (95 * ns + 99) // 100 THEN l_extendedprice END) AS p95, " +
        "max(CASE WHEN rn2 = (99 * ns + 99) // 100 THEN l_extendedprice END) AS p99 " +
        "FROM r JOIN n USING (l_returnflag) GROUP BY 1, 2 ORDER BY 1"),
  )

  // ---------------------------------------------------------------------
  // q196 — CountMin frequency sketch with portable row hashes: the
  // q119/q181 reaggregation story for POINT FREQUENCIES. The sketch is
  // d=4 rows × w=1024 buckets of BIGINT counters; the build is one
  // groupBy over (group, row, bucket) — map-side combined, so every
  // shard's partial IS a CMS and the exchange adds counters, which is
  // exactly the CMS merge (bit-identical to a one-shot build, by
  // construction rather than by test). Point queries answer from the
  // KB counter table without touching raw data: est = min over d of
  // counter[d][bucket_d(key)] — one-sided (est ≥ exact), overshoot
  // ≤ N/w per row in expectation. The native count_min_sketch
  // aggregate + cmsMergeAll/cmsEstimate expressions remain pinned in
  // SketchQueriesSpec/GraftExtensionsSpec as the binary-partial form.
  private[graft] val CmsD = 4
  private[graft] val CmsW = 1024L

  /** Row-r CMS bucket of a key column — single-sourced so the batch
    * sketch (q196) and its streaming twin
    * ([[graft.streaming.StreamingCmsFreq]]) can never disagree on the
    * hash family (the splitCol composition rule). `w` defaults to the
    * q196 geometry but is caller-suppliable so a twin running a
    * different width projects into ITS counter table, not 1024's.
    */
  private[graft] def cmsBucket(row: Int, c: Column, w: Long = CmsW): Column =
    pmod(portableHash60(concat(lit(s"cms$row|"), c.cast("string"))), lit(w))

  val q196: QuerySpec = QuerySpec(
    "q196_cms_topk_freq",
    (s, d) => {
      val ev = events(s, d).where(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"))
      def bucket(row: Int, c: Column): Column = cmsBucket(row, c)
      val cells = (0 until CmsD).map(r =>
        struct(lit(r.toLong).as("d"), bucket(r, col("user_id")).as("b")))
      val counters = ev
        .select(col("event_type"), explode(array(cells: _*)).as("db"))
        .groupBy(col("event_type"), col("db.d").as("d"), col("db.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val top = ev
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("exact_n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(desc("exact_n"), asc("user_id"))))
        .where(col("rk") <= 3)
      top
        .select(col("event_type"), col("user_id"), col("exact_n"),
          explode(array(cells: _*)).as("db"))
        .select(col("event_type"), col("user_id"), col("exact_n"),
          col("db.d").as("d"), col("db.b").as("b"))
        .join(counters, Seq("event_type", "d", "b"))
        .groupBy("event_type", "user_id", "exact_n")
        .agg(min(col("cnt")).as("est_n"))
        .select(col("event_type"), col("user_id"), col("exact_n"), col("est_n"))
        .orderBy("event_type", "user_id")
    },
    Some(
      "WITH ev AS (SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL), " +
        "ds AS (SELECT unnest(range(4)) AS d), " +
        "cnts AS (SELECT event_type, d, " +
        "CAST(('0x' || substr(md5('cms' || CAST(d AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS b, " +
        "count(*) AS cnt FROM ev CROSS JOIN ds GROUP BY 1, 2, 3), " +
        "top AS (SELECT event_type, user_id, count(*) AS exact_n, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id) AS rk " +
        "FROM ev GROUP BY 1, 2 QUALIFY rk <= 3), " +
        "probe AS (SELECT t.event_type, t.user_id, t.exact_n, d, " +
        "CAST(('0x' || substr(md5('cms' || CAST(d AS VARCHAR) || '|' || CAST(t.user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS b " +
        "FROM top t CROSS JOIN ds) " +
        "SELECT p.event_type, p.user_id, p.exact_n, min(c.cnt) AS est_n " +
        "FROM probe p JOIN cnts c ON p.event_type = c.event_type AND p.d = c.d AND p.b = c.b " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2"),
  )

  // ---------------------------------------------------------------------
  // q209 — ROLLING reach: trailing-7-day distinct users per day from
  // per-day KMV states unioned across the window — the sketch-as-
  // window-aggregate composition (q119's mergeability × q207's range
  // frames). Exact rolling distincts must re-shuffle raw user ids for
  // EVERY window position; the KMV form touches raw data once (per-day
  // bottom-k states, WindowGroupLimit-pruned) and the trailing union
  // runs over ≤ 7k hashes per day — calendar-sized state, KB per day.
  // The KMV merge identity makes the window union EXACT sketch
  // semantics: bottom-k of the union of daily bottom-k's ≡ bottom-k of
  // the union of raw ids (spec-pinned). Exact counts ride along so the
  // spec can pin the error contract.
  //
  // Scale: the window membership is the q108 shape — each state row
  // CONTRIBUTES itself to the 7 window days via an executor-local
  // explode, then a semi join restricts to days that exist (a
  // days-BETWEEN join would be a nested-loop in Spark; the oracle may
  // use it at DuckDB scale, the engine must not). Fan-out is a
  // constant 7× on rows already capped at k per day.
  val q209: QuerySpec = QuerySpec(
    "q209_rolling_reach",
    (s, d) => {
      val ev = events(s, d).where(col("user_id").isNotNull).select(
        unix_date(to_date(col("ts").cast("timestamp"))).cast("long").as("day"),
        col("user_id"))
      val hashed = ev
        .select(col("day"),
          hash48(concat(lit("u|"), col("user_id").cast("string"))).as("h48"))
        .distinct()
      // per-day KMV state: the k smallest hashes of that day
      val state = hashed.withColumn("rn",
        row_number().over(Window.partitionBy("day").orderBy("h48")))
        .where(col("rn") <= KmvK)
        .select(col("day"), col("h48"))
      val days = hashed.select(col("day").as("wday")).distinct()
      // trailing-7-day union of daily states: explode-contribute to
      // day..day+6, keep real days, dedupe hashes across the window
      val window7 = state
        .select(explode(sequence(col("day"), col("day") + 6)).as("wday"), col("h48"))
        .join(days, Seq("wday"), "left_semi")
        .distinct()
      val ranked = window7.withColumn("rn",
        row_number().over(Window.partitionBy("wday").orderBy("h48")))
      val kth = ranked.where(col("rn") === KmvK)
        .select(col("wday"), col("h48").as("hk"))
      val nd = window7.groupBy("wday").agg(count(lit(1)).as("nd"))
      val exact = ev.distinct()
        .select(explode(sequence(col("day"), col("day") + 6)).as("wday"), col("user_id"))
        .join(days, Seq("wday"), "left_semi")
        .groupBy("wday")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      nd.join(kth, Seq("wday"), "left")
        .join(exact, Seq("wday"))
        .withColumnRenamed("wday", "day")
        .select(
          col("day"),
          when(col("hk").isNotNull, expr(s"$KmvNum div hk"))
            .otherwise(col("nd")).as("est_users"),
          col("exact_users"))
        .orderBy("day")
    },
    Some(
      "WITH ev AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day, user_id " +
        "FROM events WHERE user_id IS NOT NULL), " +
        s"h AS (SELECT DISTINCT day, ${duckHash48.format("'u|' || CAST(user_id AS VARCHAR)")} AS h48 FROM ev), " +
        "st AS (SELECT day AS sday, h48, row_number() OVER (PARTITION BY day ORDER BY h48) AS rn FROM h " +
        s"QUALIFY rn <= $KmvK), " +
        "days AS (SELECT DISTINCT day FROM h), " +
        "w7 AS (SELECT DISTINCT days.day, st.h48 FROM days JOIN st ON st.sday BETWEEN days.day - 6 AND days.day), " +
        "r AS (SELECT day, h48, row_number() OVER (PARTITION BY day ORDER BY h48) AS rn FROM w7), " +
        s"kth AS (SELECT day, h48 AS hk FROM r WHERE rn = $KmvK), " +
        "nd AS (SELECT day, count(*) AS nd FROM w7 GROUP BY 1), " +
        "ex AS (SELECT days.day, count(DISTINCT e.user_id) AS exact_users " +
        "FROM (SELECT DISTINCT day, user_id FROM ev) e JOIN days ON e.day BETWEEN days.day - 6 AND days.day GROUP BY 1) " +
        s"SELECT nd.day, CASE WHEN kth.hk IS NOT NULL THEN $KmvNum // kth.hk ELSE nd.nd END AS est_users, ex.exact_users " +
        "FROM nd LEFT JOIN kth USING (day) JOIN ex ON nd.day = ex.day ORDER BY 1"),
  )

  val all: Seq[QuerySpec] = Seq(q119, q181, q196, q209)
}
