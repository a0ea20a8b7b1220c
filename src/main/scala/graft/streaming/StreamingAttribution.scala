package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of batch last-touch attribution
  * (`graft.ops.ScaleQueries` q94): each purchase is credited to the
  * user's most recent PRECEDING non-purchase event — "preceding" in
  * the (event-time µs, event_id) total order, over the user's entire
  * history (UNBOUNDED PRECEDING, exactly the batch window frame) —
  * computed over an unbounded, out-of-order stream.
  *
  * Contract: one `Attribution` row per purchase, emitted exactly once,
  * when the watermark passes the purchase's event time — the point
  * where its credit can no longer change (every still-admissible event
  * carries ts ≥ watermark > purchase ts, so it sorts AFTER the
  * purchase and cannot be a preceding touch).
  *
  * State stays bounded on an unbounded stream even though the
  * attribution frame is unbounded: once the watermark passes a touch,
  * every future purchase sorts after it, so only the LATEST finalized
  * touch can ever be "most recent preceding" again — older ones fold
  * away. Per-user state is therefore one compacted touch plus only the
  * in-horizon buffer (events within the lateness window), NOT the
  * user's history. The compacted touch itself must persist for the
  * stream's lifetime (a purchase years later still credits it — that
  * is what UNBOUNDED PRECEDING means); that is one small record per
  * user, the same cardinality the batch groupBy shuffles.
  *
  * In-horizon late data lands correctly before finalization: the
  * buffer is re-sorted on every drain, so a late-but-in-horizon touch
  * slots between an earlier touch and a not-yet-final purchase and
  * takes the credit, exactly as the batch window would order it.
  *
  * Purchases are NOT touches (the batch query skips them via
  * `when(event_type =!= 'purchase')` + ignoreNulls): two purchases
  * after one touch both credit that touch, and a purchase with no
  * prior touch credits "none".
  */
object StreamingAttribution {

  final case class TouchEvent(
      user_id: Long, event_id: Long, event_type: String, ts: java.sql.Timestamp)

  /** One buffered in-horizon event. */
  final case class Ev(tsUs: Long, eventId: Long, eventType: String)

  /** Per-user state: in-horizon buffer + the compacted latest
    * finalized touch (`hasLast` guards the sentinel zeros — Spark
    * state encoders want no Option[case class] at the top level).
    */
  final case class AttrState(
      buf: Seq[Ev], lastTsUs: Long, lastEid: Long, lastChannel: String, hasLast: Boolean)

  final case class Attribution(
      user_id: Long, event_id: Long, purchase_ts_us: Long, channel: String)

  private val ordering: Ordering[Ev] = Ordering.by(e => (e.tsUs, e.eventId))

  /** Finalize every buffered event whose event time the watermark has
    * passed: purchases emit with the running latest touch's credit,
    * touches fold into the compacted record. One walk in (ts µs,
    * event_id) order — the watermark cut is on ts, so the finalized
    * region is a prefix of the sort order and the running touch never
    * sees an unfinalized event.
    *
    * Strict `tsMs < wm` mirrors Spark's event-time timeout condition
    * (`timeoutTimestamp < watermark`), so the inline data-branch drain
    * and the timeout branch finalize at the same watermark.
    */
  private[streaming] def drain(
      st: AttrState,
      wmMs: Long,
  ): (List[(Long, Long, String)], AttrState) = {
    val out = List.newBuilder[(Long, Long, String)]
    val keep = Seq.newBuilder[Ev]
    var (lTs, lEid, lCh, lHas) = (st.lastTsUs, st.lastEid, st.lastChannel, st.hasLast)
    st.buf.sorted(ordering).foreach { e =>
      if (e.tsUs / 1000L < wmMs) {
        if (e.eventType == "purchase")
          out += ((e.eventId, e.tsUs, if (lHas) lCh else "none"))
        else { lTs = e.tsUs; lEid = e.eventId; lCh = e.eventType; lHas = true }
      } else keep += e
    }
    (out.result(), AttrState(keep.result(), lTs, lEid, lCh, lHas))
  }

  /** @param events   streaming (user_id, event_id, event_type, ts)
    *                 frame; `event_id` must be unique (it breaks ts
    *                 ties, making "most recent preceding" total — the
    *                 batch query's determinism rule)
    * @param lateness watermark delay bounding both admissible
    *                 out-of-orderness and the per-user buffer span
    * @return append-mode stream of one exactly-once `Attribution` row
    *         per purchase
    */
  def attributeStream(
      events: Dataset[TouchEvent],
      lateness: String = "10 minutes",
  ): Dataset[Attribution] = {
    implicit val ae: org.apache.spark.sql.Encoder[Attribution] = Encoders.product[Attribution]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val se: org.apache.spark.sql.Encoder[AttrState] = Encoders.product[AttrState]

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, Attribution](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout(),
      ) { (userId: Long, it: Iterator[TouchEvent], state: GroupState[AttrState]) =>
        val wmMs = state.getCurrentWatermarkMs()
        val empty = AttrState(Vector.empty, 0L, 0L, "", hasLast = false)
        val merged =
          if (state.hasTimedOut) state.getOption.getOrElse(empty)
          else {
            val prior = state.getOption.getOrElse(empty)
            val add = it.map(e => Ev(StreamTime.micros(e.ts), e.event_id, e.event_type)).toVector
            prior.copy(buf = prior.buf ++ add)
          }
        val (emits, rest) = drain(merged, wmMs)
        state.update(rest)
        if (rest.buf.nonEmpty)
          // fire once the watermark passes the oldest buffered event;
          // clamp above the current watermark (Spark rejects a timeout
          // at or before it).
          state.setTimeoutTimestamp(
            math.max(rest.buf.iterator.map(_.tsUs / 1000L).min, wmMs + 1L))
        // else: no timeout re-armed — the compacted touch (if any)
        // rides in state without a wakeup; nothing left to emit until
        // new data arrives for this key.
        emits.iterator.map { case (eid, tsUs, ch) => Attribution(userId, eid, tsUs, ch) }
      }
  }
}
