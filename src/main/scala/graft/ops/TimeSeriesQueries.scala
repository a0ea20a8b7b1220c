package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** q118: time-series repair — the gap-fill + linear-interpolation
  * operator every daily-rollup consumer eventually needs (a missing
  * day in a fact rollup is NOT zero; it is "no observation", and
  * downstream models want a dense series).
  */
object TimeSeriesQueries {
  import Tables._

  // ---------------------------------------------------------------------
  // q118 — per-supplier daily shipped revenue over one year, with
  // missing days inside each supplier's observed span filled by
  // linear interpolation between the neighboring observed days.
  //
  // Determinism: revenue aggregates in DECIMAL; the lerp is written
  // with the SAME association in both engines — py + (ny − py) ·
  // (Δprev / Δspan) — single IEEE ops on identical inputs. The output
  // lands as FLOOR(value · 10⁴) integer units, not round(…,4):
  // library round on a half-way decimal repr (…3725 whose binary
  // value sits a hair below .5) differs between engines — measured,
  // one row in 35k — while floor of the identical double cannot.
  // Gap rows always have both neighbors (the span runs min..max
  // observed day), so the division never sees Δspan = 0.
  //
  // Scale: the calendar explode is executor-local and bounded by
  // keys × span-days (the calendar, not the fact count); both fill
  // windows ride ONE supplier partitioning — running last/first over
  // presorted frames, no per-gap scans, no driver loop; the whole
  // plan shuffles the daily AGGREGATE, never raw lineitems twice.
  val q118: QuerySpec = QuerySpec(
    "q118_gap_fill_interpolate",
    (s, d) => {
      val dec = DecimalType(18, 2)
      val daily = lineitem(s, d)
        .where(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("d"))
        .agg(sum(col("l_extendedprice").cast(dec)).as("rev"))
      val span = daily.groupBy("l_suppkey").agg(min("d").as("d0"), max("d").as("d1"))
      val cal = span.select(col("l_suppkey"), explode(sequence(col("d0"), col("d1"))).as("d"))
      val w0 = Window.partitionBy("l_suppkey").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w1 = Window.partitionBy("l_suppkey").orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      cal.join(daily, Seq("l_suppkey", "d"), "left")
        .withColumn("py", last(col("rev"), ignoreNulls = true).over(w0))
        .withColumn("pd", last(when(col("rev").isNotNull, col("d")), ignoreNulls = true).over(w0))
        .withColumn("ny", first(col("rev"), ignoreNulls = true).over(w1))
        .withColumn("nd", first(when(col("rev").isNotNull, col("d")), ignoreNulls = true).over(w1))
        .select(
          col("l_suppkey"),
          col("d"),
          floor(
            when(col("rev").isNotNull, col("rev").cast("double"))
              .otherwise(
                col("py").cast("double") +
                  (col("ny").cast("double") - col("py").cast("double")) *
                  (datediff(col("d"), col("pd")).cast("double") /
                    datediff(col("nd"), col("pd")).cast("double"))) * 10000d)
            .cast("long").as("revenue_e4"),
          col("rev").isNull.cast("int").as("filled"))
        .orderBy("l_suppkey", "d")
    },
    Some(
      "WITH s AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d, " +
        "sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' " +
        "GROUP BY 1, 2), " +
        "b AS (SELECT l_suppkey, min(d) AS d0, max(d) AS d1 FROM s GROUP BY 1), " +
        "cal AS (SELECT l_suppkey, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d FROM b), " +
        "j AS (SELECT cal.l_suppkey, cal.d, s.rev FROM cal LEFT JOIN s USING (l_suppkey, d)), " +
        "f AS (SELECT *, last_value(rev IGNORE NULLS) OVER w0 AS py, " +
        "last_value(CASE WHEN rev IS NOT NULL THEN d END IGNORE NULLS) OVER w0 AS pd, " +
        "first_value(rev IGNORE NULLS) OVER w1 AS ny, " +
        "first_value(CASE WHEN rev IS NOT NULL THEN d END IGNORE NULLS) OVER w1 AS nd FROM j " +
        "WINDOW w0 AS (PARTITION BY l_suppkey ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "w1 AS (PARTITION BY l_suppkey ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT l_suppkey, d, " +
        "CAST(floor((CASE WHEN rev IS NOT NULL THEN CAST(rev AS DOUBLE) " +
        "ELSE CAST(py AS DOUBLE) + (CAST(ny AS DOUBLE) - CAST(py AS DOUBLE)) * " +
        "(CAST(date_diff('day', pd, d) AS DOUBLE) / CAST(date_diff('day', pd, nd) AS DOUBLE)) END) * 10000) AS BIGINT) AS revenue_e4, " +
        "CAST(CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS INT) AS filled " +
        "FROM f ORDER BY l_suppkey, d"
    ),
  )

  // ---------------------------------------------------------------------
  // q135 — rolling z-score anomaly detection: per return flag, the
  // days whose revenue sits more than 2 sample standard deviations
  // from the mean of the PRIOR 6 observed days (the trailing window
  // excludes the current day — a spike must not dilute the baseline
  // it is judged against). The alerting primitive every daily-rollup
  // consumer bolts on first.
  //
  // Determinism: |x−μ| > 2σ never computes μ or σ. With n, S = Σx,
  // Q = Σx² over the window, the inequality multiplies out to
  // (n−1)·(nx−S)² > 4·n·(nQ−S²) — pure integer arithmetic on exact
  // micro-unit revenues, evaluated identically in any engine. A
  // float-σ threshold would flake at rounding boundaries (the q79
  // rule); an integer inequality cannot. DECIMAL(38,0)/HUGEINT hold
  // the squares exactly in both engines; micro-unit resolution is the
  // knob to drop (cents, then whole units) as corpus volume grows —
  // the q122 scale-S rule.
  //
  // Scale: the fact collapses to per-(flag, day) aggregates before
  // any window; the rolling frame is ROWS-bounded (6) over a
  // partitioned sort — no global sort, no self-join, state per
  // partition is one 6-row buffer.
  val q135: QuerySpec = QuerySpec(
    "q135_anomaly_days",
    (s, d) => {
      val dec = DecimalType(38, 0)
      val daily = lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"), col("l_shipdate").cast("date").as("day"))
        .agg((Exact.revenueDecimal * 1000000).cast(dec).as("x"))
      val win = Window.partitionBy("flag").orderBy("day").rowsBetween(-6, -1)
      daily
        .withColumn("n", count(lit(1)).over(win))
        .withColumn("s", sum(col("x")).over(win))
        .withColumn("q", sum((col("x") * col("x")).cast(dec)).over(win))
        .where(col("n") === 6 &&
          lit(5) * (lit(6) * col("x") - col("s")) * (lit(6) * col("x") - col("s")) >
            lit(24) * (lit(6) * col("q") - col("s") * col("s")))
        .select(
          col("flag"), col("day"),
          col("x").cast("long").as("rev_micro"),
          when(lit(6) * col("x") > col("s"), "above").otherwise("below").as("direction"))
        .orderBy("flag", "day")
    },
    Some(
      "WITH d AS (SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS day, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) * 1000000 AS HUGEINT) AS x " +
        "FROM lineitem GROUP BY 1, 2), " +
        "w AS (SELECT flag, day, x, count(*) OVER win AS n, sum(x) OVER win AS s, sum(x*x) OVER win AS q " +
        "FROM d WINDOW win AS (PARTITION BY flag ORDER BY day ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)) " +
        "SELECT flag, day, CAST(x AS BIGINT) AS rev_micro, " +
        "CASE WHEN 6*x > s THEN 'above' ELSE 'below' END AS direction " +
        "FROM w WHERE n = 6 AND 5 * (6*x - s) * (6*x - s) > 24 * (6*q - s*s) " +
        "ORDER BY flag, day"
    ),
  )

  // ---------------------------------------------------------------------
  // q136 — CUSUM changepoint detection: per event type, the day where
  // the cumulative count series deviates most from a uniform rate —
  // argmax over days of |D·cum_i − i·N| (D observed days, N total
  // events, i the day's index), the Kolmogorov-Smirnov-style
  // rescaling of the classic CUSUM statistic that clears
  // denominators: T_i = D·N·|cum_i/N − i/D| stays in exact integers.
  // The "did the rate shift, and when" primitive for pipeline-health
  // monitoring (a partition landing half-empty bends the cumulative
  // curve exactly here).
  //
  // Determinism: the statistic is integer arithmetic end-to-end; the
  // argmax breaks ties to the EARLIEST day via a (T desc, day)
  // row_number — a total order, so both engines pick the same row.
  //
  // Scale: events collapse to per-(type, day) counts first; the
  // cumulative sum, totals, and argmax all ride ONE per-type
  // partitioning, each partition D rows. Day count and totals come
  // from windows over that same partitioning — no second scan, no
  // driver collect.
  val q136: QuerySpec = QuerySpec(
    "q136_cusum_changepoint",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val byDay = Window.partitionBy("event_type").orderBy("day")
      val whole = Window.partitionBy("event_type")
      val t = daily
        .withColumn("cum", sum(col("c")).over(byDay))
        .withColumn("i", row_number().over(byDay))
        .withColumn("n", sum(col("c")).over(whole))
        .withColumn("nd", count(lit(1)).over(whole))
        .withColumn("t_stat", abs(col("nd") * col("cum") - col("i") * col("n")))
      t.withColumn("rn",
          row_number().over(Window.partitionBy("event_type").orderBy(desc("t_stat"), col("day"))))
        .where(col("rn") === 1)
        .select(col("event_type"), col("day").as("cp_day"), col("t_stat"))
        .orderBy("event_type")
    },
    Some(
      "WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY 1, 2), " +
        "cs AS (SELECT event_type, day, c, " +
        "sum(c) OVER (PARTITION BY event_type ORDER BY day) AS cum, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY day) AS i, " +
        "sum(c) OVER (PARTITION BY event_type) AS n, " +
        "count(*) OVER (PARTITION BY event_type) AS nd FROM d), " +
        "t AS (SELECT event_type, day, abs(nd*cum - i*n) AS t_stat, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY abs(nd*cum - i*n) DESC, day) AS rn FROM cs) " +
        "SELECT event_type, day AS cp_day, CAST(t_stat AS BIGINT) AS t_stat FROM t WHERE rn = 1 " +
        "ORDER BY event_type"
    ),
  )

  // ---------------------------------------------------------------------
  // q141 — exponential time-decay engagement scoring (half-life = one
  // week): each user's recency-weighted value total, weight 2^(4−w)
  // for an event w whole weeks before the corpus's latest day, events
  // older than 4 weeks dropped. The feature-store primitive behind
  // "active user" scores — recent activity dominates, stale activity
  // fades on a fixed schedule.
  //
  // Determinism: the decay base is 2 and ages quantize to WHOLE weeks,
  // so every weight is a small exact power of two (power(2, k) on an
  // integer k is exact IEEE in any engine — general e^{−λt} is the
  // cross-libm hazard the q79 rule forbids); value converts to exact
  // integer cents BEFORE weighting, so the score is a pure integer
  // sum — no float accumulation anywhere. The anchor day rides a
  // 1-row cross join (the q79 rule).
  //
  // Scale: one per-user aggregate over the age-gated scan (the 4-week
  // cutoff prunes the fact BEFORE the shuffle — with date-partitioned
  // storage it prunes partitions); top-20 compiles to
  // TakeOrderedAndProject, never a global sort.
  val q141: QuerySpec = QuerySpec(
    "q141_decay_score",
    (s, d) => {
      val dec = DecimalType(18, 2)
      val mx = events(s, d).agg(max(col("ts").cast("date")).as("anchor"))
      events(s, d)
        .crossJoin(mx) // 1-row anchor
        .withColumn("agew", expr("datediff(anchor, CAST(ts AS DATE)) div 7"))
        .where(col("agew") <= 4)
        .withColumn("wt", pow(lit(2), lit(4) - col("agew")).cast("long"))
        .groupBy("user_id")
        .agg(
          sum(col("value").cast(dec) * 100 * col("wt")).cast("long").as("score_cents"),
          count(lit(1)).as("n_events"))
        .orderBy(desc("score_cents"), col("user_id"))
        .limit(20)
    },
    Some(
      "WITH mx AS (SELECT CAST(max(ts) AS DATE) AS anchor FROM events), " +
        "e AS (SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v, " +
        "date_diff('day', CAST(ts AS DATE), anchor) // 7 AS agew FROM events, mx), " +
        "w AS (SELECT user_id, v, CAST(power(2, 4 - agew) AS BIGINT) AS wt FROM e WHERE agew <= 4) " +
        "SELECT user_id, CAST(sum(v * 100 * wt) AS BIGINT) AS score_cents, count(*) AS n_events " +
        "FROM w GROUP BY 1 ORDER BY score_cents DESC, user_id LIMIT 20"
    ),
  )

  val all: Seq[QuerySpec] = Seq(q118, q135, q136, q141)
}
