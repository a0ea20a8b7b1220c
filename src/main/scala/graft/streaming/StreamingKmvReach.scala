package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.functions.MinHash

/** Streaming twin of batch q119 (`graft.ops.SketchQueries.q119`):
  * per-group distinct-user reach with the KMV (k-minimum-values)
  * bottom-k sketch AS STATE-STORE STATE — the 17th streaming twin, and
  * the one where stream-equals-batch is EXACT rather than approximate.
  *
  * The KMV state for a group is the k smallest distinct 48-bit hashes
  * seen so far. Folding a micro-batch is `bottom-k(state ∪ arrivals)`,
  * and the KMV merge identity (bottom-k of a union ≡ bottom-k of
  * concatenated bottom-k's — the same identity SketchQueriesSpec pins
  * for the batch query) makes the fold ORDER- and SLICING-INSENSITIVE:
  * after any interleaving of arrivals across any micro-batches, the
  * state — and therefore the estimate — equals what batch q119
  * computes over the same rows, bit for bit. The spec pins exactly
  * that, under scrambled orders and both state-store providers.
  *
  * State story at 100 TB: k longs per group (KB — the reaggregation
  * partial, not the user-id set an exact streaming distinct would
  * hoard); arrivals shuffle once on the group key; the hash projection
  * is executor-local. Estimate = (k−1)·2⁴⁸ div h₍ₖ₎ (exact distinct
  * count below k) — the same integer arithmetic as the batch form, so
  * a dashboard served from this stream and a backfill served from the
  * batch query can never disagree. A rolling variant (q209's trailing
  * window) keys on (group, day) and merges the 7 daily states
  * downstream — same identity, same state size.
  */
object StreamingKmvReach {

  /** One hashed arrival: the group key and the 48-bit user hash. */
  final case class HashedEvent(event_type: String, h48: Long)

  /** Per-group KMV state: the ≤k smallest distinct hashes, ascending. */
  final case class KmvState(ks: List[Long])

  /** Per-trigger emission: the group's current estimate and the state
    * occupancy (k-bounded — observable back-pressure evidence).
    */
  final case class Reach(event_type: String, est_users: Long, state_size: Int)

  /** Fold a micro-batch of hashes into the bottom-k state. Dedupe then
    * keep the k smallest — the KMV merge, O((|state|+|batch|)·log) per
    * trigger and independent of history length.
    */
  private[streaming] def fold(state: Option[KmvState], hs: Iterator[Long], k: Int): KmvState =
    KmvState((state.map(_.ks).getOrElse(Nil).iterator ++ hs)
      .toSeq.distinct.sorted.take(k).toList)

  /** The KMV estimate over a sorted bottom-k list: exact count below
    * k, (k−1)·2⁴⁸ div h₍ₖ₎ at k — identical to the batch q119
    * expression (one integer division, no floats).
    */
  private[streaming] def estimate(ks: List[Long], k: Int): Long =
    if (ks.sizeIs < k) ks.size.toLong else ((k - 1).toLong << 48) / ks.last

  /** The stateful reach query over a (event_type, user_id) stream:
    * Update-mode per-group estimates, refreshed every trigger. `k`
    * must match the batch query's (256) for the parity contract.
    */
  def reachStream(events: DataFrame, k: Int = 256): Dataset[Reach] = {
    implicit val ke: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val he: org.apache.spark.sql.Encoder[HashedEvent] = Encoders.product[HashedEvent]
    implicit val ss: org.apache.spark.sql.Encoder[KmvState] = Encoders.product[KmvState]
    implicit val re: org.apache.spark.sql.Encoder[Reach] = Encoders.product[Reach]
    events
      .where(col("user_id").isNotNull)
      .select(
        col("event_type"),
        MinHash.portableHash48(concat(lit("u|"), col("user_id").cast("string"))).as("h48"))
      .as[HashedEvent]
      .groupByKey(_.event_type)
      .mapGroupsWithState[KmvState, Reach](GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[HashedEvent], state: org.apache.spark.sql.streaming.GroupState[KmvState]) =>
          val next = fold(state.getOption, it.map(_.h48), k)
          state.update(next)
          Reach(key, estimate(next.ks, k), next.ks.size)
      }
  }
}
