package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch SCD2 interval build (q73,
  * `graft.ops.AnalyticQueries.q73`): per-user event-type change rows
  * with [valid_from, valid_to) validity, over an unbounded out-of-order
  * stream.
  *
  * Contract: emits CLOSED intervals only (append mode cannot retract
  * an open-ended row once a late event splits it); the currently-open
  * interval lives in state until a type change closes it. An interval
  * [t1, t2) is only immutable once the watermark passes t2 — an
  * admissible late event inside (t1, t2) with a different type would
  * SPLIT it — so events buffer in state until the watermark passes
  * them, then fold in (ts, event_id) order through the same
  * change-detection walk the batch operator runs. Parity: the emitted
  * rows equal exactly q73's non-null-valid_to rows for the same input.
  *
  * State per user = the open interval (O(1)) + the pending buffer,
  * which the watermark bounds to the lateness horizon — the same
  * bound as [[StatefulSessionizer]], so executor state stays bounded
  * on an unbounded stream regardless of user count.
  *
  * One drain path serves both branches: the timeout branch is just a
  * data batch with zero incoming events (EventTimeTimeout fires only
  * for quiet keys; active keys drain inline, the
  * [[StreamingFunnel]] lesson).
  */
object StreamingScd2 {

  final case class TypedEvent(
      user_id: Long, event_id: Long, event_type: String, ts: java.sql.Timestamp)
  final case class PendEvent(tsUs: Long, eventId: Long, eventType: String)
  final case class OpenInterval(eventType: String, fromUs: Long, eventId: Long)
  final case class Scd2Buf(pending: Seq[PendEvent], open: Option[OpenInterval])
  final case class Interval(
      user_id: Long, event_id: Long, event_type: String,
      valid_from_us: Long, valid_to_us: Long)

  /** The change-detection walk both twins share: fold time-ordered
    * events into closed intervals, carrying the open interval through.
    * Same-type runs collapse (SCD2 records CHANGES, not events).
    */
  private def foldChanges(
      userId: Long,
      sorted: Seq[PendEvent],
      start: Option[OpenInterval],
  ): (Vector[Interval], Option[OpenInterval]) = {
    var open = start
    val out = Vector.newBuilder[Interval]
    sorted.foreach { p =>
      open match {
        case None =>
          open = Some(OpenInterval(p.eventType, p.tsUs, p.eventId))
        case Some(o) if o.eventType != p.eventType =>
          out += Interval(userId, o.eventId, o.eventType, o.fromUs, p.tsUs)
          open = Some(OpenInterval(p.eventType, p.tsUs, p.eventId))
        case Some(_) => () // same type: SCD2 collapses the run
      }
    }
    (out.result(), open)
  }

  def scd2Stream(
      events: Dataset[TypedEvent],
      lateness: String = "2 days",
  ): Dataset[Interval] = {
    implicit val ie: org.apache.spark.sql.Encoder[Interval] = Encoders.product[Interval]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val be: org.apache.spark.sql.Encoder[Scd2Buf] = Encoders.product[Scd2Buf]

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2Buf, Interval](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout(),
      ) { (userId: Long, it: Iterator[TypedEvent], state: GroupState[Scd2Buf]) =>
        val wmMs = state.getCurrentWatermarkMs()
        val prev = state.getOption.getOrElse(Scd2Buf(Vector.empty, None))
        val incoming = it
          .map(e => PendEvent(StreamTime.micros(e.ts), e.event_id, e.event_type)).toVector
        val all = (prev.pending ++ incoming).sortBy(p => (p.tsUs, p.eventId))
        // Finalized prefix: strictly below the watermark — an event AT
        // the watermark could still gain same-µs siblings (admissible
        // events have ts ≥ watermark), so it stays pending.
        val (fin, rest) = all.span(_.tsUs / 1000L < wmMs)
        val (closed, open) = foldChanges(userId, fin, prev.open)
        if (rest.isEmpty && open.isEmpty) state.remove()
        else {
          state.update(Scd2Buf(rest, open))
          // Re-arm for the earliest pending event; clamp above the
          // current watermark (Spark rejects timeouts at/below it).
          // No pending ⇒ no timeout: the open interval can only close
          // on a future event, so there is nothing to wake up for.
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(rest.head.tsUs / 1000L + 1L, wmMs + 1L))
        }
        closed.iterator
      }
  }

  /** Batch-mode twin over already-final events: the same fold with no
    * watermark (batch has a defined end of input), emitting closed
    * intervals only — the exact rows [[scd2Stream]] would emit given a
    * watermark past every event. Parity with both is spec'd.
    */
  def scd2Batch(events: Dataset[TypedEvent]): Dataset[Interval] = {
    implicit val ie: org.apache.spark.sql.Encoder[Interval] = Encoders.product[Interval]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, it: Iterator[TypedEvent]) =>
        val sorted = it
          .map(e => PendEvent(StreamTime.micros(e.ts), e.event_id, e.event_type)).toVector
          .sortBy(p => (p.tsUs, p.eventId))
        foldChanges(userId, sorted, None)._1.iterator
      }
  }
}
