package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of batch rolling z-score anomaly detection
  * (`graft.ops.TimeSeriesQueries` q135): per key, flag each day whose
  * total sits more than 2 sample standard deviations from the mean of
  * the PRIOR 6 observed days — over an unbounded, out-of-order stream,
  * each day decided exactly once, when the watermark passes its end.
  *
  * The decision is the batch query's integer inequality verbatim —
  * (n−1)·(nx−S)² > 4·n·(nQ−S²) with n = 6 — evaluated in BigInt, so
  * stream and batch can never disagree on a boundary (the q135
  * determinism note; BigInt plays the role DECIMAL(38,0) plays in the
  * batch plan). Input totals are integer units; the unit resolution is
  * the caller's knob, and the inequality is scale-invariant (both
  * sides scale by c²), so any consistent unit gives identical flags.
  *
  * State per key is bounded on an unbounded stream: the in-horizon
  * OPEN days (partial sums still admitting late events — span bounded
  * by the watermark lateness) plus the trailing SIX closed days the
  * next decision needs. Nothing else survives a day's finalization —
  * the same 6-row window the batch ROWS frame holds.
  *
  * Late data lands correctly before finalization: an in-horizon late
  * event merges into its open day's sum. An event whose day already
  * closed (its end < current watermark) is dropped — the admissibility
  * bound every watermarked operator shares; pick the lateness to cover
  * the real arrival skew.
  */
object StreamingAnomaly {

  /** One input observation: key, event time, integer-unit amount. */
  final case class RevEvent(flag: String, ts: java.sql.Timestamp, cents: Long)

  /** One day's running total (epoch day, exact integer units). */
  final case class DayAgg(day: Long, x: Long)

  /** Open = in-horizon partial sums; closed = trailing ≤6 finalized
    * days, ascending (the next decisions' baseline window).
    */
  final case class AnomState(open: Seq[DayAgg], closed: Seq[DayAgg])

  /** `day` is the UTC epoch day — an integer, so the output is
    * timezone-fixture-proof (a java.sql.Date would render through the
    * JVM default zone).
    */
  final case class AnomalyDay(flag: String, day: Long, x: Long, direction: String)

  private val MsPerDay = 86400000L

  /** The q135 inequality on a 6-day baseline, exact. */
  private[streaming] def decide(baseline: Seq[Long], x: Long): Option[String] = {
    if (baseline.length != 6) None
    else {
      val bx = BigInt(x)
      val s = baseline.map(BigInt(_)).sum
      val q = baseline.map(v => BigInt(v) * v).sum
      val d6 = bx * 6 - s
      if (BigInt(5) * d6 * d6 > BigInt(24) * (q * 6 - s * s))
        Some(if (d6 > 0) "above" else "below")
      else None
    }
  }

  /** Finalize every open day whose end the watermark passed, ascending
    * — each decides against the trailing 6 closed days at its moment,
    * then joins the baseline. Mirrors the batch ROWS BETWEEN 6
    * PRECEDING AND 1 PRECEDING frame over observed days exactly.
    */
  private[streaming] def drain(
      st: AnomState,
      wmMs: Long,
  ): (List[(Long, Long, String)], AnomState) = {
    val (ready, open) = st.open.partition(d => (d.day + 1) * MsPerDay < wmMs)
    val out = List.newBuilder[(Long, Long, String)]
    var closed = st.closed
    ready.sortBy(_.day).foreach { d =>
      decide(closed.takeRight(6).map(_.x), d.x).foreach(dir => out += ((d.day, d.x, dir)))
      closed = (closed :+ d).takeRight(6)
    }
    (out.result(), AnomState(open, closed))
  }

  /** @param events   streaming (flag, ts, cents) observations; `cents`
    *                 is any consistent integer unit
    * @param lateness watermark delay bounding out-of-orderness and the
    *                 open-day state span
    * @return append-mode stream of one exactly-once `AnomalyDay` per
    *         flagged (key, day)
    */
  def anomalyStream(
      events: Dataset[RevEvent],
      lateness: String = "1 day",
  ): Dataset[AnomalyDay] = {
    implicit val ae: org.apache.spark.sql.Encoder[AnomalyDay] = Encoders.product[AnomalyDay]
    implicit val ke: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val se: org.apache.spark.sql.Encoder[AnomState] = Encoders.product[AnomState]

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.flag)
      .flatMapGroupsWithState[AnomState, AnomalyDay](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout(),
      ) { (flag: String, it: Iterator[RevEvent], state: GroupState[AnomState]) =>
        val wmMs = state.getCurrentWatermarkMs()
        val empty = AnomState(Vector.empty, Vector.empty)
        val merged =
          if (state.hasTimedOut) state.getOption.getOrElse(empty)
          else {
            val prior = state.getOption.getOrElse(empty)
            // fold arrivals into open-day sums; drop already-closed days
            val sums = scala.collection.mutable.Map.empty[Long, Long]
            prior.open.foreach(d => sums(d.day) = d.x)
            it.foreach { e =>
              val day = StreamTime.micros(e.ts) / (MsPerDay * 1000L)
              if ((day + 1) * MsPerDay >= wmMs)
                sums(day) = sums.getOrElse(day, 0L) + e.cents
            }
            prior.copy(open = sums.toVector.sortBy(_._1).map { case (d, x) => DayAgg(d, x) })
          }
        val (emits, rest) = drain(merged, wmMs)
        state.update(rest)
        if (rest.open.nonEmpty)
          state.setTimeoutTimestamp(
            math.max(rest.open.iterator.map(d => (d.day + 1) * MsPerDay).min, wmMs + 1L))
        emits.iterator.map { case (day, x, dir) => AnomalyDay(flag, day, x, dir) }
      }
  }
}
