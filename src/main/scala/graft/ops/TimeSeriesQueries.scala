package graft.ops

import graft.ops.Pin.PinOps
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

  // ---------------------------------------------------------------------
  // q143 — peak concurrency by sweep-line: per order priority, the
  // maximum number of orders simultaneously "open" (order date through
  // the last shipment of any of their lines, inclusive) and the first
  // day that peak is reached. The capacity-planning primitive — peak
  // open orders sizes fulfillment staffing the way peak concurrent
  // sessions sizes servers — and the interval operator windows cannot
  // express (an order contributes to EVERY day it spans, not a frame
  // anchored at one row).
  //
  // Determinism: the sweep aggregates the ±1 deltas PER DAY before
  // cumulating, so the running count is evaluated only at day
  // granularity — no within-day delta-order ambiguity can touch the
  // max; days are epoch integers; first-peak ties break by min(day).
  //
  // Scale: the naive plan (interval × calendar range join, or a
  // per-day COUNT over an exploded span) is O(orders × span-days);
  // the sweep is O(orders) plus a cumulative window whose input is
  // the (priority × active-day) grid — CALENDAR-bounded, not
  // row-bounded, so the per-priority window task holds a few
  // thousand rows at any corpus size. The interval build is one
  // per-order aggregate on the join key (no extra shuffle: lineitem
  // arrives keyed by l_orderkey).
  val q143: QuerySpec = QuerySpec(
    "q143_peak_concurrency",
    (s, d) => {
      val iv = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(
          col("o_orderkey"),
          col("o_orderpriority").as("pri"),
          col("o_orderdate").cast("date").as("sd"))
        .agg(max(col("l_shipdate").cast("date")).as("ed"))
      // both deltas in ONE executor-local explode — a union of two
      // selects would recompute the whole interval subtree per branch
      val open = iv
        .select(col("pri"), explode(array(
          struct(unix_date(col("sd")).cast("long").as("day"), lit(1L).as("delta")),
          struct((unix_date(col("ed")) + 1).cast("long").as("day"), lit(-1L).as("delta"))))
          .as("e"))
        .groupBy(col("pri"), col("e.day").as("day"))
        .agg(sum(col("e.delta")).as("dd"))
        .withColumn("open", sum(col("dd")).over(Window.partitionBy("pri").orderBy("day")))
      // peak + earliest peak day as ONE struct-argmax aggregate (max
      // open, then max(−day) = min day) — not a max-then-self-join,
      // which would run the sweep twice
      open
        .groupBy("pri")
        .agg(max(struct(col("open"), (-col("day")).as("negday"))).as("m"))
        .select(col("pri"), col("m.open").as("peak"), (-col("m.negday")).as("first_peak_day"))
        .orderBy("pri")
    },
    Some(
      "WITH iv AS (SELECT o.o_orderpriority AS pri, CAST(o.o_orderdate AS DATE) AS s, " +
        "CAST(max(l.l_shipdate) AS DATE) AS e FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "GROUP BY o.o_orderkey, 1, 2), " +
        "d AS (SELECT pri, datediff('day', DATE '1970-01-01', s) AS day, 1 AS delta FROM iv " +
        "UNION ALL SELECT pri, datediff('day', DATE '1970-01-01', e) + 1, -1 FROM iv), " +
        "g AS (SELECT pri, day, CAST(sum(delta) AS BIGINT) AS dd FROM d GROUP BY 1,2), " +
        "c AS (SELECT pri, day, sum(dd) OVER (PARTITION BY pri ORDER BY day) AS open FROM g), " +
        "p AS (SELECT pri AS ppri, max(open) AS peak FROM c GROUP BY 1) " +
        "SELECT c.pri, CAST(p.peak AS BIGINT) AS peak, min(c.day) AS first_peak_day " +
        "FROM c JOIN p ON c.pri = p.ppri AND c.open = p.peak GROUP BY 1, 2 ORDER BY pri"
    ),
  )

  // ---------------------------------------------------------------------
  // q145 — exact least-squares revenue trend per supplier: the OLS
  // slope of shipment revenue against ship day, in integer micro-units
  // per day. The "is this series rising or falling" primitive behind
  // every trend monitor — here with the regression arithmetic kept
  // EXACT so two engines (or two row orders) cannot disagree on a
  // slope, its sign, or the top-20 ranking.
  //
  // Determinism: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) evaluates
  // entirely in DECIMAL(38,0) over integer inputs (x = days since the
  // supplier's own first shipment — centering bounds magnitudes and is
  // slope-invariant; y = exact cents). The only division is the final
  // one, written as sign(num) · (10⁶·|num| div den) so both engines
  // perform the same truncating division on non-negative operands
  // (SQL integer-div rounds toward zero — floor and trunc diverge on
  // negatives, so the sign is factored out first).
  //
  // Scale: one per-supplier min window + one per-supplier aggregate,
  // both on the same key — Catalyst reuses the partitioning, so the
  // whole regression costs ONE shuffle of the fact at supplier
  // granularity; top-20 is TakeOrderedAndProject. At 100 TB the
  // DECIMAL(38,0) moment sums hold: x ≤ span-days (~10⁴), y ≤ 10¹¹
  // cents, Σxy per supplier ≤ rows·10¹⁵ — overflow needs 10²³ rows
  // per supplier.
  val q145: QuerySpec = QuerySpec(
    "q145_trend_slope",
    (s, d) => {
      val big = DecimalType(38, 0)
      val r = lineitem(s, d).select(
        col("l_suppkey").as("sk"),
        unix_date(col("l_shipdate").cast("date")).cast("long").as("day"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      r.withColumn("x", (col("day") - min("day").over(Window.partitionBy("sk"))).cast(big))
        .withColumn("y", col("cents").cast(big))
        .groupBy("sk")
        .agg(
          count(lit(1)).cast(big).as("n"),
          sum("x").as("sx"),
          sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .where(col("n") >= 3)
        .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
        .where(col("den") > 0)
        .select(
          col("sk"),
          col("n").cast("long").as("n"),
          when(col("num") >= 0, expr("CAST((1000000 * num) div den AS BIGINT)"))
            .otherwise(-expr("CAST((1000000 * (-num)) div den AS BIGINT)"))
            .as("slope_micro"))
        .orderBy(desc("slope_micro"), col("sk"))
        .limit(20)
    },
    Some(
      "WITH r AS (SELECT l_suppkey AS sk, " +
        "datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day, " +
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM lineitem), " +
        "c AS (SELECT sk, CAST(day - min(day) OVER (PARTITION BY sk) AS DECIMAL(38,0)) AS x, " +
        "CAST(cents AS DECIMAL(38,0)) AS y FROM r), " +
        "s AS (SELECT sk, count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy " +
        "FROM c GROUP BY 1 HAVING count(*) >= 3), " +
        "sl AS (SELECT sk, n, n*sxy - sx*sy AS num, n*sxx - sx*sx AS den FROM s WHERE n*sxx - sx*sx > 0) " +
        "SELECT sk, CAST(n AS BIGINT) AS n, " +
        "CAST(CASE WHEN num >= 0 THEN (1000000*CAST(num AS HUGEINT)) // CAST(den AS HUGEINT) " +
        "ELSE -((1000000*CAST(-num AS HUGEINT)) // CAST(den AS HUGEINT)) END AS BIGINT) AS slope_micro " +
        "FROM sl ORDER BY slope_micro DESC, sk LIMIT 20"
    ),
  )

  // ---------------------------------------------------------------------
  // q146 — inter-arrival burstiness per user: the squared coefficient
  // of variation of the gaps between a user's consecutive events, in
  // exact integer milli-units. CV² ≈ 1 is Poisson (memoryless), ≫ 1 is
  // bursty, ≪ 1 is periodic — the traffic-shape classifier behind bot
  // detection and session-model choice, and a SECOND-moment statistic
  // computed without ever forming a float mean or variance.
  //
  // Determinism: gaps are whole seconds (integer µs difference,
  // truncating div by 10⁶ — non-negative, so trunc is unambiguous);
  // CV² = n(nΣg² − (Σg)²) / ((n−1)(Σg)²) clears every denominator —
  // numerator is ≥ 0 by Cauchy–Schwarz, so the single floored
  // division has non-negative operands in both engines.
  //
  // Scale: the lag window and the moment aggregate share the user_id
  // partitioning — one fact shuffle total; per-user state is three
  // integers. DECIMAL(38,0): g ≤ 10⁸ s, Σg² ≤ rows·10¹⁶, ×n² still
  // ≤ 10³⁸ for any plausible per-user event count.
  val q146: QuerySpec = QuerySpec(
    "q146_burstiness",
    (s, d) => {
      val big = DecimalType(38, 0)
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      events(s, d)
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
        .withColumn("prev", lag("us", 1).over(w))
        .where(col("prev").isNotNull)
        .select(col("user_id"), expr("(us - prev) div 1000000").cast(big).as("gs"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).cast(big).as("n"),
          sum("gs").as("sg"),
          sum(col("gs") * col("gs")).as("sgg"))
        .where(col("n") >= 5 && col("sg") > 0)
        .select(
          col("user_id"),
          col("n").cast("long").as("n_gaps"),
          expr("CAST((1000 * n * (n*sgg - sg*sg)) div ((n-1) * sg * sg) AS BIGINT)")
            .as("cv2_milli"))
        .orderBy(desc("cv2_milli"), col("user_id"))
        .limit(20)
    },
    Some(
      "WITH e AS (SELECT user_id, epoch_us(ts) AS us, " +
        "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev FROM events), " +
        "g AS (SELECT user_id, CAST((us - prev) // 1000000 AS DECIMAL(38,0)) AS gs FROM e WHERE prev IS NOT NULL), " +
        "s AS (SELECT user_id, count(*) AS n, sum(gs) AS sg, sum(gs*gs) AS sgg FROM g GROUP BY 1 HAVING count(*) >= 5) " +
        "SELECT user_id, CAST(n AS BIGINT) AS n_gaps, " +
        "CAST(CAST(1000 * n * (n*sgg - sg*sg) AS HUGEINT) // CAST((n-1) * sg * sg AS HUGEINT) AS BIGINT) AS cv2_milli " +
        "FROM s WHERE sg > 0 ORDER BY cv2_milli DESC, user_id LIMIT 20"
    ),
  )

  // ---------------------------------------------------------------------
  // q151 — interval coalescing (gaps-and-islands over SPANS): merge
  // each supplier's overlapping per-order shipment episodes
  // [min ship, max ship] into maximal islands; report episode count,
  // covered days, longest episode. The interval dual of q58's
  // point-streaks and q143's concurrency count — "how many distinct
  // busy periods, how long" is the utilization question interval data
  // always gets asked.
  //
  // Determinism: islands derive from a prefix-max over the interval
  // order — rows with identical (start, end) are interchangeable
  // under both the prefix-max and the island cumsum, so ties are
  // value-safe IN THEORY; the window nevertheless orders by the
  // fully-unique (s, e, orderkey) so NO engine's tie handling is ever
  // exercised (a one-off DuckDB full-gate run once returned a
  // +3-day covered_days under load — unreproducible in 30 isolated
  // and 2 full re-runs, but a total order removes the only legal
  // degree of freedom). Days are epoch integers, inclusive spans.
  //
  // Scale: every window (prefix-max, island cumsum) and BOTH
  // aggregations ride ONE supplier hash partitioning — sk ⊆ every
  // later grouping key, so Catalyst plans a single exchange for the
  // whole query; per-supplier window state is one running max.
  val q151: QuerySpec = QuerySpec(
    "q151_interval_merge",
    (s, d) => {
      val byStart = Window.partitionBy("sk").orderBy("s", "e", "l_orderkey")
      lineitem(s, d)
        .groupBy(col("l_suppkey").as("sk"), col("l_orderkey"))
        .agg(
          unix_date(min(col("l_shipdate")).cast("date")).cast("long").as("s"),
          unix_date(max(col("l_shipdate")).cast("date")).cast("long").as("e"))
        .withColumn("prev_max",
          max("e").over(byStart.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          when(col("prev_max").isNull || col("s") > col("prev_max"), 1L).otherwise(0L))
        .withColumn("island",
          sum("new_island").over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("sk", "island")
        .agg(min("s").as("is_"), max("e").as("ie"))
        .groupBy("sk")
        .agg(
          count(lit(1)).as("n_episodes"),
          sum(col("ie") - col("is_") + 1).as("covered_days"),
          max(col("ie") - col("is_") + 1).as("longest_days"))
        .orderBy("sk")
    },
    Some(
      "WITH iv AS (SELECT l_suppkey AS sk, l_orderkey AS okey, " +
        "datediff('day', DATE '1970-01-01', CAST(min(l_shipdate) AS DATE)) AS s, " +
        "datediff('day', DATE '1970-01-01', CAST(max(l_shipdate) AS DATE)) AS e " +
        "FROM lineitem GROUP BY l_suppkey, l_orderkey), " +
        "o AS (SELECT sk, s, e, okey, max(e) OVER (PARTITION BY sk ORDER BY s, e, okey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM iv), " +
        "f AS (SELECT sk, s, e, okey, CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS new_island FROM o), " +
        "g AS (SELECT sk, s, e, sum(new_island) OVER (PARTITION BY sk ORDER BY s, e, okey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM f), " +
        "m AS (SELECT sk, island, min(s) AS is_, max(e) AS ie FROM g GROUP BY 1, 2) " +
        "SELECT sk, count(*) AS n_episodes, CAST(sum(ie - is_ + 1) AS BIGINT) AS covered_days, " +
        "CAST(max(ie - is_ + 1) AS BIGINT) AS longest_days " +
        "FROM m GROUP BY 1 ORDER BY sk"
    ),
  )

  // ---------------------------------------------------------------------
  // q152 — temporal association: directed event-type pairs (a → b)
  // where b follows a for the same user within 5 minutes, counted per
  // type pair. q144's association mining on the TIME axis (baskets →
  // windows), and q107's transition matrix without the
  // adjacent-only restriction — every in-window successor counts, so
  // "click → error within 5 min" surfaces even with chatter between.
  //
  // Scale: the naive plan is a per-user time band self-join Spark
  // executes as a nested loop; this rides RangeJoin.bucketedRangeJoin
  // (the q48 machinery) — windows explode into ≤2 five-minute
  // buckets, the join is an EQUIJOIN on (user, bucket), and exact
  // band bounds filter inside. Strictness (b after a, ≤ 300s) maps to
  // the half-open [a+1, a+300s+1) interval; the rollup key space is
  // |types|².
  val q152: QuerySpec = QuerySpec(
    "q152_temporal_pairs",
    (s, d) => {
      val fiveMinUs = 300L * 1000000L
      val ev = events(s, d)
      val points = ev.select(
        col("user_id"), col("event_type").as("type_b"), unix_micros(col("ts").cast("timestamp")).as("us_b"))
      val windows = ev.select(
        col("user_id"), col("event_type").as("type_a"),
        (unix_micros(col("ts").cast("timestamp")) + 1).as("start_us"),
        (unix_micros(col("ts").cast("timestamp")) + fiveMinUs + 1).as("end_us"))
      RangeJoin.bucketedRangeJoin(
        points, windows, keys = Seq("user_id"),
        pointCol = "us_b", startCol = "start_us", endCol = "end_us",
        bucketWidth = fiveMinUs)
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("type_a", "type_b")
    },
    Some(
      "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events) " +
        "SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_pairs " +
        "FROM e a JOIN e b ON a.user_id = b.user_id " +
        "AND b.us > a.us AND b.us <= a.us + 300000000 " +
        "GROUP BY 1, 2 ORDER BY type_a, type_b"
    ),
  )

  // ---------------------------------------------------------------------
  // q203 — EWMA smoothing of the per-flag daily revenue series: the
  // trend-following smoother every monitoring stack runs next to
  // q135's z-score detector (EWMA reacts to level shifts the
  // fixed-window mean dilutes). Weights are EXACT RATIONALS — decay
  // 7/8 over a 16-observation memory, scaled to the integer family
  // wᵢ = 7^i·8^(15−i) so the weighted sum is pure integer arithmetic
  // (the q135/q145 discipline: no float pow, no rounding drift, two
  // engines cannot disagree). The recursion is unrolled into 16
  // lag() terms sharing ONE window pass; series edges normalize by
  // the PRESENT weights (T sums only materialized lags), so the
  // smoother is well-defined from the first observation.
  //
  // Scale: the fact collapses to per-(flag, day) aggregates before
  // the window; 16 lags ride one partitioned sort with a 16-row
  // buffer per partition — same cost class as a ROWS-16 frame.
  private val ewmaWeights: Seq[Long] =
    (0 until 16).map(i => (0 until i).foldLeft(1L)((a, _) => a * 7) *
      (0 until (15 - i)).foldLeft(1L)((a, _) => a * 8))

  val q203: QuerySpec = QuerySpec(
    "q203_ewma_smoothing",
    (s, d) => {
      val dec = DecimalType(18, 2)
      val big = DecimalType(38, 0)
      val daily = lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"), col("l_shipdate").cast("date").as("day"))
        .agg((sum(col("l_extendedprice").cast(dec)) * 100).cast("long").as("cents"))
      val w = Window.partitionBy("flag").orderBy("day")
      val sTerms = ewmaWeights.zipWithIndex.map { case (wt, i) =>
        coalesce(lag(col("cents"), i).over(w).cast(big) * lit(wt), lit(0).cast(big))
      }
      val tTerms = ewmaWeights.zipWithIndex.map { case (wt, i) =>
        when(lag(col("cents"), i).over(w).isNotNull, lit(wt).cast(big))
          .otherwise(lit(0).cast(big))
      }
      daily
        .withColumn("s", sTerms.reduce(_ + _))
        .withColumn("t", tTerms.reduce(_ + _))
        .select(
          col("flag"),
          unix_date(col("day")).cast("long").as("day"),
          col("cents"),
          expr("CAST(s div t AS BIGINT)").as("ewma_cents"))
        .withColumn("dev_bp",
          expr("CAST(abs(cents - ewma_cents) * 10000 div ewma_cents AS BIGINT)"))
        .orderBy("flag", "day")
    },
    Some {
      val sSum = ewmaWeights.zipWithIndex.map { case (wt, i) =>
        s"coalesce(CAST(lag(cents, $i) OVER w AS HUGEINT) * $wt, 0)"
      }.mkString(" + ")
      val tSum = ewmaWeights.zipWithIndex.map { case (wt, i) =>
        s"CASE WHEN lag(cents, $i) OVER w IS NOT NULL THEN CAST($wt AS HUGEINT) ELSE 0 END"
      }.mkString(" + ")
      "WITH daily AS (SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS day, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents " +
        "FROM lineitem GROUP BY 1, 2), " +
        s"e AS (SELECT flag, day, cents, ($sSum) AS s, ($tSum) AS t FROM daily " +
        "WINDOW w AS (PARTITION BY flag ORDER BY day)) " +
        "SELECT flag, datediff('day', DATE '1970-01-01', day) AS day, cents, " +
        "CAST(s // t AS BIGINT) AS ewma_cents, " +
        "CAST(abs(cents - CAST(s // t AS BIGINT)) * 10000 // CAST(s // t AS BIGINT) AS BIGINT) AS dev_bp " +
        "FROM e ORDER BY flag, day"
    },
  )

  // ---------------------------------------------------------------------
  // q225 — forecast BACKTEST under two naive baselines: score every
  // day's revenue against (a) the seasonal-naive forecast (same
  // weekday, 7 calendar days earlier) and (b) persistence (the
  // previous calendar day), reporting per-series MAE in exact cents
  // and which baseline wins. The diagnostics queries (q145 slope,
  // q165 seasonality, q166 autocorr) describe the series; this is the
  // EVALUATION loop a forecasting pipeline runs before anything
  // fancier ships — no model beats deployment without beating these
  // two numbers. Calendar joins (day = day − 7), NOT lag(7): a ROWS
  // lag silently slides across gaps and scores the wrong pair; the
  // equijoin evaluates exactly the days whose reference day exists.
  //
  // Determinism: daily revenue in exact decimal → integer cents;
  // MAE by integer division (both engines floor on non-negatives).
  //
  // Scale: one fact aggregation to the (series, day) grain; both
  // reference joins are self-equijoins ON that calendar-sized frame
  // sharing its (flag) partitioning — at 100 TB the backtest costs
  // two |series|·|days| joins, never a fact rescan.
  val q225: QuerySpec = QuerySpec(
    "q225_forecast_backtest",
    (s, d) => {
      val daily = lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"),
          col("l_shipdate").cast("date").as("day"))
        .agg((Exact.revenueDecimal * 100).cast("long").as("cents"))
      def ref(back: Int, tag: String) = daily.select(
        col("flag"), date_add(col("day"), back).as("day"),
        col("cents").as(s"${tag}_cents"))
      daily
        .join(ref(7, "s7"), Seq("flag", "day"), "left")
        .join(ref(1, "p1"), Seq("flag", "day"), "left")
        .groupBy("flag")
        .agg(
          count(col("s7_cents")).as("n_seasonal"),
          // integer division (Spark `/` on longs is DOUBLE division —
          // `div` keeps the MAE exact and floor-matched to DuckDB `//`)
          expr("sum(abs(cents - s7_cents)) div greatest(count(s7_cents), 1)").as("mae_seasonal_cents"),
          count(col("p1_cents")).as("n_persist"),
          expr("sum(abs(cents - p1_cents)) div greatest(count(p1_cents), 1)").as("mae_persist_cents"))
        .withColumn("seasonal_wins",
          col("mae_seasonal_cents") < col("mae_persist_cents"))
        .orderBy("flag")
    },
    Some(
      // trunc() before the BIGINT cast: revenueDecimal has scale 6, so
      // ~every daily cell carries fractional cents — Spark's decimal→
      // long cast TRUNCATES while DuckDB's CAST rounds, and without
      // trunc the two engines would build different cents series (the
      // r6 oracle matched only because the MAE division absorbed the
      // drift — a latent flake, ADVICE r6 item 2). Every other cents
      // query multiplies a scale-2 decimal by 100 (exact), where the
      // cast semantics can't diverge.
      "WITH daily AS (SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS day, " +
        s"CAST(trunc(${Exact.revenueDecimalSql} * 100) AS BIGINT) AS cents FROM lineitem GROUP BY 1, 2) " +
        "SELECT d.flag AS flag, " +
        "count(s7.cents) AS n_seasonal, " +
        "CAST(sum(abs(d.cents - s7.cents)) // greatest(count(s7.cents), 1) AS BIGINT) AS mae_seasonal_cents, " +
        "count(p1.cents) AS n_persist, " +
        "CAST(sum(abs(d.cents - p1.cents)) // greatest(count(p1.cents), 1) AS BIGINT) AS mae_persist_cents, " +
        "CAST(sum(abs(d.cents - s7.cents)) // greatest(count(s7.cents), 1) AS BIGINT) < " +
        "CAST(sum(abs(d.cents - p1.cents)) // greatest(count(p1.cents), 1) AS BIGINT) AS seasonal_wins " +
        "FROM daily d " +
        "LEFT JOIN daily s7 ON d.flag = s7.flag AND d.day = s7.day + 7 " +
        "LEFT JOIN daily p1 ON d.flag = p1.flag AND d.day = p1.day + 1 " +
        "GROUP BY 1 ORDER BY flag"
    ),
  )

  // ---------------------------------------------------------------------
  // q231 — Theil–Sen robust trend (r7): per return flag, the MEDIAN of
  // all pairwise day-slopes of the daily revenue series, with the
  // quartile band. The outlier-resistant complement of q145's OLS
  // slope: a single anomalous day moves the OLS line but not the
  // pairwise-slope median (breakdown point 29%), so disagreement
  // between q145 and this IS the outlier signal.
  //
  // Determinism: cents truncate (the q225 rule — revenueDecimal has
  // scale 6); each pairwise slope is milli-cents/day by
  // TOWARD-ZERO integer division with an explicit sign split (Spark
  // `div` truncates, DuckDB `//` floors — they agree only on
  // non-negatives, and down-trending pairs are negative); quartile /
  // median elements are picked at fixed rank positions k = ⌈n/4⌉,
  // ⌈n/2⌉... precisely (n+3) div 4, (n+1) div 2, (3n+1) div 4 — the
  // value at a rank is well-defined under ties regardless of tie
  // order, so row_number suffices.
  //
  // Scale: the pair frame is CALENDAR-bounded, not fact-bounded — the
  // daily aggregate is the only fact-sized pass (the q225 discipline),
  // and days²/2 pairs stay ~7M even over a decade, per group. One
  // sort per flag over that bounded frame.
  val q231: QuerySpec = QuerySpec(
    "q231_theil_sen",
    (s, d) => {
      // Pin the calendar-sized daily frame: it re-enters the plan five
      // ways (wide streamed side ×2 passes, broadcast build, counts,
      // sizes), and the repartition/broadcast split below BREAKS the
      // exchange reuse that used to share one lineitem aggregation
      // between the two join aliases — measured at 64×: three full
      // fact-table aggregations instead of one, +29 s. Pinned, the
      // fact table is aggregated exactly ONCE per run regardless of
      // how many consumers the selection machinery adds (fewer scans
      // than the r9 form, which reused the exchange but still re-ran
      // it once per pair pass).
      val daily = lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"),
          col("l_shipdate").cast("date").as("day"))
        .agg((Exact.revenueDecimal * 100).cast("long").as("cents"))
        .pinLineage()
      // Pair generation rides a BROADCAST hash join on the bare flag
      // key: the calendar-sized build side broadcasts, so parallelism
      // comes from the STREAMED side's partitions — the key count is
      // irrelevant, and a measured salting attempt (replicate the
      // build side ×32) only doubled the cost. Low-cardinality keys
      // hurt a SHUFFLED join, not a broadcast probe.
      //
      // The streamed side is the CALENDAR-sized daily frame (~7.5k
      // rows): AQE coalesces that post-aggregate shuffle to ONE
      // partition by input bytes, so the ~9M-pair expansion and both
      // full-pair passes (histogram + in-bucket re-filter) ran on a
      // single task (stage-traced r10: the three 1-task stages owned
      // ~4 of the query's 7.7 s). Rows are a uselessly small proxy for
      // the work BEHIND a generate-like expansion — force the streamed
      // side wide before the probe (REPARTITION_BY_NUM is exempt from
      // AQE coalescing; sized by the session's shuffle parallelism,
      // not a constant).
      val dailyWide = daily
        .repartition(s.sessionState.conf.numShufflePartitions)
      val pairs = dailyWide.as("a")
        .join(broadcast(daily.as("b")),
          col("a.flag") === col("b.flag") && col("a.day") < col("b.day"))
        .select(col("a.flag").as("flag"),
          ((col("b.cents") - col("a.cents")) * 1000).as("num"),
          // a.day < b.day makes dd ≥ 1 on every SURVIVING pair; the
          // greatest() guard exists because codegen can evaluate this
          // projection speculatively on rows the join condition is
          // about to reject, and under ANSI that div-by-zero THROWS
          // (observed) — the guard value never reaches output.
          greatest(datediff(col("b.day"), col("a.day")).cast("long"), lit(1L)).as("dd"))
        .select(col("flag"),
          when(col("num") >= 0, expr("num div dd"))
            .otherwise(-expr("(-num) div dd")).as("slope"))
      // DISTRIBUTED EXACT SELECTION (single-recursion quickselect):
      // ranking the full pair frame with a per-flag window costs ~12 s
      // in BOTH engines (measured — few giant partitions serialize the
      // sort however the join is parallelized). Instead: (1) one
      // map-side-combined HISTOGRAM over monotone slope buckets
      // (exact floor-division bucketing, so bucket order ≡ value
      // order and equal slopes share a bucket); (2) the tiny
      // cumulative-histogram frame locates WHICH bucket holds each
      // target rank and the count below it; (3) only those ≤3 buckets
      // per flag re-filter from the pair stream (broadcast) and get a
      // window — the sort touches one bucket's pairs, not 3M rows.
      // The pair stream is evaluated twice (histogram + re-filter);
      // both passes are streamed aggregates/filters, never a big sort.
      val W = 1L << 22
      val bpairs = pairs.withColumn("bk",
        expr(s"CASE WHEN slope >= 0 THEN slope div ${W}L ELSE -(((-slope) + ${W - 1}L) div ${W}L) END"))
      // The histogram is the ONLY full pair-stream aggregate, and four
      // consumers read it (cumulative frame, totals, bucket picks, the
      // final totals join) — two of them through broadcast subtrees
      // that would silently re-run the pair join per read. Pin the
      // (flag, bucket) frame (hundreds of rows): the pair stream then
      // evaluates exactly twice — once here, once for the in-bucket
      // re-filter.
      val hist = bpairs.groupBy("flag", "bk").agg(count(lit(1)).as("c"))
        .pinLineage()
      val cum = hist.withColumn("cmprev",
        coalesce(sum("c").over(
          Window.partitionBy("flag").orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val counts = hist.groupBy("flag").agg(sum("c").as("n_pairs"))
      def kOf(which: Int) = which match {
        case 1 => expr("(n_pairs + 3) div 4")
        case 2 => expr("(n_pairs + 1) div 2")
        case 3 => expr("(3 * n_pairs + 1) div 4")
      }
      val withK = cum.join(broadcast(counts), Seq("flag"))
      val selBuckets = withK
        .where((1 to 3).map(i =>
          col("cmprev") < kOf(i) && col("cmprev") + col("c") >= kOf(i)).reduce(_ || _))
        .select(col("flag"), col("bk"), col("cmprev"))
      val inBucket = bpairs
        .join(broadcast(selBuckets), Seq("flag", "bk"))
        .withColumn("rn",
          col("cmprev") + row_number().over(
            Window.partitionBy("flag", "bk").orderBy("slope")))
      val sizes = daily.groupBy("flag").agg(count(lit(1)).as("n_days"))
      inBucket
        .join(broadcast(counts), Seq("flag"))
        .where((1 to 3).map(i => col("rn") === kOf(i)).reduce(_ || _))
        .groupBy("flag", "n_pairs")
        .agg(
          max(when(col("rn") === kOf(1), col("slope"))).as("slope_q1_milli"),
          max(when(col("rn") === kOf(2), col("slope"))).as("slope_med_milli"),
          max(when(col("rn") === kOf(3), col("slope"))).as("slope_q3_milli"))
        .join(broadcast(sizes), Seq("flag"))
        .select(col("flag"), col("n_days"), col("n_pairs"),
          col("slope_q1_milli"), col("slope_med_milli"), col("slope_q3_milli"))
        .orderBy("flag")
    },
    Some(
      "WITH daily AS (SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS day, " +
        s"CAST(trunc(${Exact.revenueDecimalSql} * 100) AS BIGINT) AS cents FROM lineitem GROUP BY 1, 2), " +
        "pairs AS (SELECT a.flag AS flag, " +
        "CASE WHEN b.cents - a.cents >= 0 THEN ((b.cents - a.cents) * 1000) // (b.day - a.day) " +
        "ELSE -(((a.cents - b.cents) * 1000) // (b.day - a.day)) END AS slope " +
        "FROM daily a JOIN daily b ON a.flag = b.flag AND a.day < b.day), " +
        "ranked AS (SELECT flag, slope, row_number() OVER (PARTITION BY flag ORDER BY slope) AS rn FROM pairs), " +
        "cnts AS (SELECT flag, count(*) AS np FROM pairs GROUP BY 1), " +
        "sizes AS (SELECT flag, count(*) AS n_days FROM daily GROUP BY 1), " +
        "sel AS (SELECT r.flag AS flag, c.np AS np, " +
        "max(CASE WHEN rn = (np + 3) // 4 THEN slope END) AS slope_q1_milli, " +
        "max(CASE WHEN rn = (np + 1) // 2 THEN slope END) AS slope_med_milli, " +
        "max(CASE WHEN rn = (3 * np + 1) // 4 THEN slope END) AS slope_q3_milli " +
        "FROM ranked r JOIN cnts c ON r.flag = c.flag GROUP BY 1, 2) " +
        "SELECT s.flag AS flag, CAST(n_days AS BIGINT) AS n_days, CAST(np AS BIGINT) AS n_pairs, " +
        "slope_q1_milli, slope_med_milli, slope_q3_milli " +
        "FROM sel s JOIN sizes z ON s.flag = z.flag ORDER BY flag"
    ),
  )

  // ---------------------------------------------------------------------
  // q243 — split-conformal forecast band + coverage audit (Vovk's
  // conformal prediction, the split/inductive form of Papadopoulos et
  // al. 2002): per return flag, the seasonal-naive forecast's (q225's
  // baseline) 90% prediction band calibrated on pre-2001 residuals
  // and AUDITED on the 2001 holdout. Conformal is the
  // distribution-free way to put a guarantee on ANY forecaster: if
  // residuals are exchangeable, a band at the ⌈0.9(n+1)⌉-th smallest
  // calibration residual covers ≥ 90% of future days — the audit
  // column checks that promise on data the calibration never saw.
  // Completes the uncertainty axis: q234 bootstraps a METRIC, this
  // bands a FORECAST.
  //
  // Determinism: fully integer — residuals are exact cent deltas of
  // decimal sums, the band is value-at-rank k = (9(n+1)+9) div 10
  // (row_number over the (r, day) total order; day unique per flag),
  // coverage is an exact bp div. No float anywhere.
  //
  // Scale: ONE fact pass to the (flag × day) calendar-bounded daily
  // table; the lag-7 pairing is a self-EQUIJOIN on day−7 (the q166
  // rule — lag() over the full series would be one task); the
  // per-flag rank window runs on ≤ |calendar| rows (q78 exception);
  // the 3-row band frame broadcasts back onto the holdout.
  val q243: QuerySpec = QuerySpec(
    "q243_conformal_band",
    (s, d) => {
      val big = DecimalType(38, 0)
      val daily = lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"),
          col("l_shipdate").cast("date").as("day"))
        .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2))) * 100)
          .cast(big).as("y"))
      val prev = daily.select(col("flag").as("pflag"),
        col("day").as("pday"), col("y").as("yhat"))
      val resid = daily
        .join(prev, col("pflag") === col("flag") &&
          col("pday") === date_sub(col("day"), 7))
        .select(col("flag"), col("day"),
          abs(col("y") - col("yhat")).cast(big).as("r"))
      val cal = resid.where(col("day") < lit("2001-01-01").cast("date"))
      val hold = resid.where(col("day") >= lit("2001-01-01").cast("date"))
      val ranked = cal.withColumn("rn",
        row_number().over(Window.partitionBy("flag").orderBy(col("r"), col("day"))))
      val counts = cal.groupBy("flag").agg(count(lit(1)).as("n_cal"))
        .withColumn("k", expr("(9 * (n_cal + 1) + 9) div 10"))
      val band = ranked.join(broadcast(counts), Seq("flag"))
        .where(col("rn") === col("k"))
        .select(col("flag"), col("n_cal"), col("r").as("band"))
      val cover = hold.join(broadcast(band), Seq("flag"))
        .groupBy("flag")
        .agg(count(lit(1)).as("n_hold"),
          sum(when(col("r") <= col("band"), 1L).otherwise(0L)).as("n_in"))
      band.join(cover, Seq("flag"))
        .select(col("flag"), col("n_cal"),
          col("band").cast("long").as("band_cents"), col("n_hold"),
          expr("CAST((10000 * n_in) div n_hold AS BIGINT)").as("cover_bp"))
        .orderBy("flag")
    },
    Some(
      "WITH daily AS (SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS day, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS HUGEINT) AS y FROM lineitem GROUP BY 1, 2), " +
        "resid AS (SELECT d.flag, d.day, abs(d.y - p.y) AS r FROM daily d " +
        "JOIN daily p ON p.flag = d.flag AND p.day = d.day - 7), " +
        "cal AS (SELECT * FROM resid WHERE day < DATE '2001-01-01'), " +
        "hold AS (SELECT * FROM resid WHERE day >= DATE '2001-01-01'), " +
        "ranked AS (SELECT flag, r, row_number() OVER (PARTITION BY flag ORDER BY r, day) AS rn FROM cal), " +
        "cnt AS (SELECT flag, count(*) AS n_cal, (9 * (count(*) + 1) + 9) // 10 AS k FROM cal GROUP BY 1), " +
        "band AS (SELECT c.flag, c.n_cal, rk.r AS band FROM cnt c " +
        "JOIN ranked rk ON rk.flag = c.flag AND rk.rn = c.k), " +
        "cover AS (SELECT h.flag, count(*) AS n_hold, " +
        "sum(CASE WHEN h.r <= b.band THEN 1 ELSE 0 END) AS n_in " +
        "FROM hold h JOIN band b ON b.flag = h.flag GROUP BY 1) " +
        "SELECT b.flag AS flag, b.n_cal, CAST(b.band AS BIGINT) AS band_cents, c.n_hold, " +
        "CAST((10000 * n_in) // n_hold AS BIGINT) AS cover_bp " +
        "FROM band b JOIN cover c ON c.flag = b.flag ORDER BY b.flag"
    ),
  )

  val all: Seq[QuerySpec] =
    Seq(q118, q135, q136, q141, q143, q145, q146, q151, q152, q203, q225, q231,
      q243)
}
