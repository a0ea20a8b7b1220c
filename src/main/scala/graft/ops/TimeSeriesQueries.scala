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

  val all: Seq[QuerySpec] = Seq(q118)
}
