package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{TextFunctions => TF}

/** Streaming twin of batch q88 with the band-signature LEDGER AS
  * STATE-STORE STATE — the operational form the q88 scaladoc names
  * ("signatures are append-only state, not recompute") executed
  * literally inside a Structured Streaming query.
  *
  * [[StreamingIncrementalDedup.crossDupStream]] is the stream-STATIC
  * form: the base corpus is frozen, arrivals only probe it. This twin
  * is the stream-STATEFUL form: ALL documents (base and incoming,
  * interleaved in any order, sliced into any micro-batches) arrive on
  * ONE stream, and the accumulated band ledger lives in the state
  * store — so a base doc that arrives AFTER an incoming doc it matches
  * still produces the pair. Convergence is order-insensitive
  * (spec-pinned by scrambling arrival orders and batch slicings under
  * both state-store providers): the emitted pair set equals batch
  * q88's exactly.
  *
  * Exactly-once pair emission WITHOUT a second stateful operator
  * (Spark cannot chain a dedup after flatMapGroupsWithState — no event
  * time propagates through a user function): each bucket's state holds
  * every member's FULL band-key vector, so when two docs meet in the
  * bucket of band b, the pair is emitted iff b is the FIRST band where
  * their keys collide — every other shared bucket sees a smaller
  * colliding index and stays silent. One winner per pair, decided from
  * state each side already carries, no cross-bucket coordination.
  *
  * State story at 100 TB: per bucket the members list IS the LSH
  * bucket occupancy (uniform by construction — the q41 geometry), and
  * each member carries its signature-derived band keys plus its
  * shingle set for the exact verify. Shingle sets dominate; the
  * production swap is a ledger POINTER per member with the exact
  * verify as a candidate-table join against the persisted shingle
  * store (the BaseState.fromTables pattern) — same plan shape, state
  * shrinks to keys+signatures. Kept inline here so the twin is
  * self-contained and the verify exact.
  */
object StreamingNearDupLedger {

  /** One (doc, band) arrival: the band-bucket routing key (band,
    * bkey), the doc's side, its full band-key vector (for the
    * first-colliding-band rule) and its shingle set (for the exact
    * verify).
    */
  final case class BandArrival(
      band: Int, bkey: Long, doc_id: Long, incoming: Boolean,
      bkeys: Seq[Long], shingles: Seq[String])

  final case class Member(
      doc_id: Long, incoming: Boolean, bkeys: Seq[Long], shingles: Seq[String])

  final case class BucketState(members: List[Member])

  final case class CrossPair(incoming_doc: Long, base_doc: Long, jac: Double)

  private[streaming] def exactJaccard(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    val common = (sa intersect sb).size
    val union = sa.size + sb.size - common
    if (union == 0) 0.0 else common.toDouble / union
  }

  /** First band index where the two key vectors agree — the unique
    * bucket allowed to emit the pair.
    */
  private[streaming] def firstCollision(a: Seq[Long], b: Seq[Long]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      if (a(i) == b(i)) return i
      i += 1
    }
    -1
  }

  /** Fold one bucket's new arrivals into its ledger state, emitting
    * each qualifying cross-side pair iff THIS band is the pair's first
    * collision. Processing is sequential over the iterator, so two
    * docs landing in the same micro-batch pair exactly once (when the
    * second is processed) — the same argument that makes any
    * cross-batch order converge.
    */
  private[streaming] def foldBucket(
      band: Int,
      state: Option[BucketState],
      arrivals: Iterator[BandArrival],
      threshold: Double,
  ): (BucketState, List[CrossPair]) = {
    var members = state.map(_.members).getOrElse(Nil)
    val out = List.newBuilder[CrossPair]
    arrivals.foreach { a =>
      if (!members.exists(_.doc_id == a.doc_id)) { // replay-idempotent
        members.foreach { m =>
          if (m.incoming != a.incoming && firstCollision(m.bkeys, a.bkeys) == band) {
            val jac = exactJaccard(m.shingles, a.shingles)
            if (jac >= threshold) {
              val (inc, base) = if (a.incoming) (a.doc_id, m.doc_id) else (m.doc_id, a.doc_id)
              out += CrossPair(inc, base, jac)
            }
          }
        }
        members = Member(a.doc_id, a.incoming, a.bkeys, a.shingles) :: members
      }
    }
    (BucketState(members), out.result())
  }

  /** Band-explode a (doc_id, text) stream with an `incoming` side
    * column into [[BandArrival]] rows — the same per-row signature/band
    * composition as [[StreamingIncrementalDedup.rowSignature]]/
    * [[StreamingIncrementalDedup.rowBandStructs]] (parity with the
    * batch cascade is pinned there).
    */
  def bandArrivals(
      docs: DataFrame,
      shingleK: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      rowsPerBand: Int = 4,
  ): Dataset[BandArrival] = {
    require(bands * rowsPerBand <= k)
    implicit val e: org.apache.spark.sql.Encoder[BandArrival] = Encoders.product[BandArrival]
    docs
      .withColumn("shing", array_distinct(TF.wordShingles(col("text"), shingleK)))
      .where(size(col("shing")) > 0)
      .withColumn("sig", StreamingIncrementalDedup.rowSignature(col("shing"), k))
      .withColumn("bks",
        StreamingIncrementalDedup.rowBandStructs(col("sig"), bands, rowsPerBand))
      .select(
        col("doc_id"), col("incoming"), col("shing").as("shingles"),
        transform(col("bks"), s => s.getField("bkey")).as("bkeys"),
        explode(col("bks")).as("bk"))
      .select(
        col("bk.band").as("band"), col("bk.bkey").as("bkey"),
        col("doc_id"), col("incoming"), col("bkeys"), col("shingles"))
      .as[BandArrival]
  }

  /** The stateful ledger query over a unified (doc_id, text, incoming)
    * stream: append-mode cross-side near-dup pairs at exact Jaccard ≥
    * `threshold`, each pair exactly once regardless of arrival order,
    * batch slicing, or how many bands the pair collides in.
    */
  def nearDupLedgerStream(
      docs: DataFrame,
      shingleK: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
  ): Dataset[CrossPair] = {
    implicit val ks: org.apache.spark.sql.Encoder[(Int, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    implicit val ss: org.apache.spark.sql.Encoder[BucketState] = Encoders.product[BucketState]
    implicit val ps: org.apache.spark.sql.Encoder[CrossPair] = Encoders.product[CrossPair]
    bandArrivals(docs, shingleK, k, bands, rowsPerBand)
      .groupByKey(a => (a.band, a.bkey))
      .flatMapGroupsWithState[BucketState, CrossPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), it: Iterator[BandArrival], state: GroupState[BucketState]) =>
          val (next, pairs) = foldBucket(key._1, state.getOption, it, threshold)
          state.update(next)
          pairs.iterator
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
