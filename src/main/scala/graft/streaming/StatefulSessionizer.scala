package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * hand-rolled counterpart of `session_window` in [[StreamingOps]],
  * for session semantics the built-in can't express (here: emitting
  * event counts AND enforcing a max session length).
  *
  * State per user is O(1) (one open session), evicted by event-time
  * timeout when the watermark passes sessionStart+gap — so executor
  * state stays bounded on an unbounded stream regardless of user
  * count, the requirement for a 100 TB/day event feed.
  *
  * Works identically on batch Datasets (flatMapGroupsWithState runs as
  * a regular group-by) — parity with graft.ops.Sessionize is tested.
  */
object StatefulSessionizer {

  final case class Event(user_id: Long, event_id: Long, ts_us: Long)

  /** Streaming input row: event time as a real timestamp column so the
    * watermark (and therefore the event-time timeout) applies.
    */
  final case class TsEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  private def micros(t: java.sql.Timestamp): Long = StreamTime.micros(t)

  /** Streaming sessionization: close sessions separated by > gapUs, cap
    * any session at maxSessionUs. Uses EventTimeTimeout so a user who
    * goes quiet still EMITS their final session (and frees their state)
    * once the watermark passes lastEvent+gap — without this, state
    * would grow with every user ever seen and last sessions would never
    * appear.
    */
  def sessionize(
      events: Dataset[TsEvent],
      gapUs: Long,
      lateness: String = "2 days",
      maxSessionUs: Long = Long.MaxValue,
  ): Dataset[Session] = {
    implicit val se: org.apache.spark.sql.Encoder[Session] = Encoders.product[Session]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val oe: org.apache.spark.sql.Encoder[OpenSession] = Encoders.product[OpenSession]

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout(),
      ) { (userId: Long, it: Iterator[TsEvent], state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          // watermark passed lastUs+gap: no in-horizon event can extend
          // this session — emit and evict.
          val o = state.get
          state.remove()
          Iterator.single(Session(userId, o.startUs, o.lastUs, o.n))
        } else {
          val sorted = it.toSeq.map(e => (micros(e.ts), e.event_id)).sorted
          var open = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer[Session]()
          sorted.foreach { case (tsUs, _) =>
            open match {
              case None =>
                open = Some(OpenSession(tsUs, tsUs, 1))
              case Some(o) =>
                if (tsUs - o.lastUs > gapUs || tsUs - o.startUs > maxSessionUs) {
                  closed += Session(userId, o.startUs, o.lastUs, o.n)
                  open = Some(OpenSession(tsUs, tsUs, 1))
                } else {
                  // min/max merge: an in-watermark out-of-order event
                  // arriving in a LATER micro-batch (tsUs < lastUs)
                  // must extend, not regress, the session bounds — a
                  // plain lastUs = tsUs would move the event-time
                  // timeout earlier and truncate end_us.
                  open = Some(OpenSession(
                    math.min(o.startUs, tsUs), math.max(o.lastUs, tsUs), o.n + 1))
                }
            }
          }
          open.foreach { o =>
            state.update(o)
            state.setTimeoutTimestamp(o.lastUs / 1000L + gapUs / 1000L)
          }
          closed.iterator
        }
      }
  }

  /** Batch-mode convenience: run the same logic and flush still-open
    * sessions (batch has a defined end-of-input; a stream doesn't).
    */
  def sessionizeBatch(events: Dataset[Event], gapUs: Long, maxSessionUs: Long = Long.MaxValue): Dataset[Session] = {
    implicit val se: org.apache.spark.sql.Encoder[Session] = Encoders.product[Session]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, it: Iterator[Event]) =>
        val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
        val out = scala.collection.mutable.ArrayBuffer[Session]()
        var open: Option[OpenSession] = None
        sorted.foreach { e =>
          open match {
            case None => open = Some(OpenSession(e.ts_us, e.ts_us, 1))
            case Some(o) =>
              if (e.ts_us - o.lastUs > gapUs || e.ts_us - o.startUs > maxSessionUs) {
                out += Session(userId, o.startUs, o.lastUs, o.n)
                open = Some(OpenSession(e.ts_us, e.ts_us, 1))
              } else open = Some(o.copy(lastUs = e.ts_us, n = o.n + 1))
          }
        }
        open.foreach(o => out += Session(userId, o.startUs, o.lastUs, o.n))
        out.iterator
      }
  }
}
