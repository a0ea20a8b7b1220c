package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch funnel (`graft.ops.AnalyticQueries.
  * funnelDepths`, q56): per-user conversion depth through an ordered
  * step sequence, each step gated to `windowUs` after the user's
  * earliest completion of the prior step — computed over an unbounded,
  * out-of-order stream.
  *
  * Semantics identical to the batch form (earliest-anchor greedy:
  * anchors are min-ts and only ever move earlier as late events
  * arrive), restricted to users with at least one step event (a stream
  * has no "all users" universe to left-join against).
  *
  * Finalization: a user's depth is emitted ONCE, when the event-time
  * timeout fires at lastSeen + steps·window. At that point the
  * watermark exceeds every open stage deadline (t_i ≤ lastSeen +
  * i·window), so no admissible late event can deepen the funnel or
  * move an anchor earlier — the emission is final, and state is
  * evicted. State per user is the buffered step-event timestamps
  * inside the watermark horizon (the same bound class as
  * `dropDuplicatesWithinWatermark`), distinct-ts pruned.
  */
object StreamingFunnel {

  final case class StepEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)

  /** Per-step sorted distinct buffered timestamps + max ts seen. */
  final case class FunnelBuf(stepTs: Seq[Seq[Long]], maxSeenUs: Long)

  final case class Conversion(user_id: Long, depth: Int, last_anchor_us: Long)

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Greedy earliest-anchor depth over the buffered step timestamps —
    * the same decision function as the batch funnelDepths aggregation.
    * Returns (depth, anchor of the deepest completed stage; the first
    * step's min ts for depth ≥ 1, 0 if no step-0 event buffered).
    */
  private[streaming] def resolve(stepTs: Seq[Seq[Long]], windowUs: Long): (Int, Long) = {
    var depth = 0
    var anchor = 0L
    var i = 0
    var open = true
    while (open && i < stepTs.length) {
      val candidates =
        if (i == 0) stepTs(i).headOption
        else stepTs(i).find(ts => ts > anchor && ts <= anchor + windowUs)
      candidates match {
        case Some(ts) => depth += 1; anchor = ts; i += 1
        case None => open = false
      }
    }
    (depth, anchor)
  }

  def funnelStream(
      events: Dataset[StepEvent],
      steps: Seq[String],
      windowUs: Long,
      lateness: String = "2 days",
  ): Dataset[Conversion] = {
    require(steps.nonEmpty, "funnelStream needs at least one step")
    implicit val ce: org.apache.spark.sql.Encoder[Conversion] = Encoders.product[Conversion]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val be: org.apache.spark.sql.Encoder[FunnelBuf] = Encoders.product[FunnelBuf]
    val stepIdx = steps.zipWithIndex.toMap
    val spanUs = steps.length * windowUs

    events
      .withWatermark("ts", lateness)
      .filter((e: StepEvent) => stepIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, Conversion](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout(),
      ) { (userId: Long, it: Iterator[StepEvent], state: GroupState[FunnelBuf]) =>
        if (state.hasTimedOut) {
          // watermark > lastSeen + span: every open stage deadline has
          // passed and anchors can no longer move — final.
          val buf = state.get
          state.remove()
          val (depth, anchor) = resolve(buf.stepTs, windowUs)
          Iterator.single(Conversion(userId, depth, anchor))
        } else {
          val prev = state.getOption.getOrElse(
            FunnelBuf(Seq.fill(steps.length)(Vector.empty[Long]), 0L))
          val incoming = it.toSeq.map(e => (stepIdx(e.event_type), micros(e.ts)))
          val merged = prev.stepTs.zipWithIndex.map { case (old, i) =>
            val add = incoming.collect { case (s, ts) if s == i => ts }
            if (add.isEmpty) old else (old ++ add).distinct.sorted
          }
          val maxSeen =
            if (incoming.isEmpty) prev.maxSeenUs
            else math.max(prev.maxSeenUs, incoming.map(_._2).max)
          state.update(FunnelBuf(merged, maxSeen))
          state.setTimeoutTimestamp((maxSeen + spanUs) / 1000L)
          Iterator.empty
        }
      }
  }
}
