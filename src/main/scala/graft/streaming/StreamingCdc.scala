package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch CDC apply (q194,
  * `graft.ops.AnalyticQueries.q194`): maintain the last-op-wins +
  * tombstone snapshot over an unbounded change stream.
  *
  * The structural point this twin proves: UNLIKE the SCD2 twin (which
  * must buffer events until the watermark passes them, because an
  * interval split depends on event ORDER), the CDC fold is
  * ORDER-INSENSITIVE — "last op" is an associative, commutative max
  * over (ts, event_id), and the replay counters are plain sums — so
  * state per key is O(1) with NO pending buffer and no watermark
  * gating: any arrival order of the same events converges to the same
  * snapshot (spec-pinned by scrambling batches). This is the q194
  * scaladoc claim ("folds incrementally batch-by-batch without
  * replaying history") executed literally.
  *
  * Emission: Update mode — each key emits its refreshed snapshot row
  * whenever a batch touches it; `deleted = true` rows are the
  * retraction signal a downstream sink uses to drop the key (the
  * streaming rendering of the batch operator's absent row).
  */
object StreamingCdc {

  final case class CdcEvent(
      user_id: Long, event_id: Long, event_type: String,
      ts: java.sql.Timestamp, value: Double)

  final case class CdcState(
      lastTsUs: Long, lastEventId: Long, lastOp: String, lastValue: Double,
      nOps: Long, nDeletes: Long)

  final case class CdcRow(
      user_id: Long, last_op: String, last_ts_us: Long, last_value: Double,
      n_ops: Long, n_deletes_replayed: Long, deleted: Boolean)

  /** The op mapping both twins share. */
  def opOf(eventType: String): String = eventType match {
    case "signup" => "I"
    case "error" => "D"
    case _ => "U"
  }

  private def round2(v: Double): Double =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fold a batch of events into the running state — associative and
    * commutative in the events, the property that makes the O(1)
    * bufferless state sound.
    */
  private[streaming] def fold(state: Option[CdcState], events: Iterator[CdcEvent]): CdcState = {
    var s = state.getOrElse(CdcState(Long.MinValue, Long.MinValue, "", 0.0, 0L, 0L))
    events.foreach { e =>
      val tsUs = e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000
      val op = opOf(e.event_type)
      s = s.copy(
        nOps = s.nOps + 1,
        nDeletes = s.nDeletes + (if (op == "D") 1L else 0L))
      if (tsUs > s.lastTsUs || (tsUs == s.lastTsUs && e.event_id > s.lastEventId)) {
        s = s.copy(lastTsUs = tsUs, lastEventId = e.event_id,
          lastOp = op, lastValue = round2(e.value))
      }
    }
    s
  }

  def cdcStream(events: Dataset[CdcEvent]): Dataset[CdcRow] = {
    implicit val se: org.apache.spark.sql.Encoder[CdcState] = Encoders.product[CdcState]
    implicit val re: org.apache.spark.sql.Encoder[CdcRow] = Encoders.product[CdcRow]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcRow](GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[CdcEvent], state: GroupState[CdcState]) =>
          val next = fold(state.getOption, it)
          state.update(next)
          CdcRow(userId, next.lastOp, next.lastTsUs, next.lastValue,
            next.nOps, next.nDeletes, deleted = next.lastOp == "D")
      }
  }

  /** Output mode the maintained snapshot needs (each touched key
    * re-emits its current row).
    */
  val outputMode: OutputMode = OutputMode.Update()
}
