package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.VectorFunctions

/** Streaming twin of batch q259/q261 with the SEMANTIC dedup ledger as
  * state-store state — the operational form of SemDeDup a production
  * ingest runs: the clustering is FROZEN (production reclusters
  * periodically and assigns continuously — the IVF index serving
  * retrieval doubles as the dedup blocker, q263's observation), every
  * arriving vector is quantized and assigned STATELESSLY through the
  * frozen quantizer, and only the per-cell ledger of seen members is
  * state. [[StreamingNearDupLedger]] is this twin's lexical sibling;
  * this one is structurally simpler FOR A REASON the batch operators
  * already exploit: cell membership is UNIQUE (a vector has exactly one
  * cell, where banded LSH gives one doc 16 buckets), so an unordered
  * pair meets in exactly one place exactly once — no first-collision
  * rule, no cross-bucket coordination, exactly-once emission is free.
  *
  * Emission is the PAIR LEDGER (va < vb, cell, cos2_bp at cos ≥
  * tNum/tDen — batch `semanticDupDrops`' dup frame before its
  * min-witness window): pairs are order-insensitive and append-only
  * where keep/drop DECISIONS are not (a later, lower-id arrival can
  * retroactively become an earlier vector's keeper — no append-only
  * stream can emit that decision early and be right). The min-witness
  * reduction is a stateless `groupBy(vb).min(va)` any consumer runs on
  * the ledger; parity with q259's drop manifest under frozen centroids
  * is spec-pinned, scrambled arrival orders included.
  *
  * Every decision is the batch operators' exact integer arithmetic:
  * `vec_quantize_fp` quantization, int64 dots with overflow checks
  * (the LongVecDot contract), argmax assignment at (dot DESC, cell
  * ASC) — [[graft.llm.SimilarityPipeline.assignCellsFp]]'s tie-break —
  * and the cross-multiplied threshold with the zero-vector guard.
  *
  * State story at 100 TB: per cell the ledger holds ~targetCell
  * quantized vectors (d·8 B each) under the q261 sizing — cells ∝ n
  * keeps every ledger CONSTANT-sized, so state scales linearly with
  * the corpus and no cell ever concentrates arrivals. The production
  * swap is the same as the lexical twin's: member pointers + a
  * persisted vector store once d·8 B dominates.
  */
object StreamingSemanticDedup {

  final case class VecArrival(vec_id: Long, cell: Int, q: Seq[Long], nq: Long)
  final case class QuantRow(vec_id: Long, q: Seq[Long], nq: Long)
  final case class Member(vec_id: Long, q: Seq[Long], nq: Long)
  final case class CellState(members: List[Member])
  final case class DupPair(va: Long, vb: Long, cell: Long, cos2_bp: Long)

  /** Exact int64 dot — the LongVecDot contract (equal lengths required,
    * overflow throws) executed on the ledger path. */
  private[streaming] def dot(a: Seq[Long], b: Seq[Long]): Long = {
    require(a.length == b.length, s"vector length mismatch: ${a.length} vs ${b.length}")
    var s = 0L
    var i = 0
    while (i < a.length) {
      s = Math.addExact(s, Math.multiplyExact(a(i), b(i)))
      i += 1
    }
    s
  }

  /** The frozen assignment function: argmax centroid at (dot DESC,
    * cell ASC) — `assignCellsFp`'s struct-max replayed per row. With
    * `coarse` given, the q261 probe executes against the frozen index:
    * fine centroids pick their coarse cell ONCE (same argmax, computed
    * at construction), a point argmaxes over the LIVE coarse cells
    * (one that lost all fine members never ranks — ivfAssignCellsFp's
    * rail), then only over that coarse cell's fine members. Per-row
    * work is 2·√cells dots instead of cells — the same multiplier the
    * batch probe buys, with zero stream-side joins.
    */
  final class FrozenQuantizer(
      fine: Seq[(Int, Seq[Long])],
      coarse: Option[Seq[(Int, Seq[Long])]] = None,
  ) extends Serializable {
    require(fine.nonEmpty, "frozen quantizer needs at least one centroid")

    private def argmax(q: Seq[Long], cands: Seq[(Int, Seq[Long])]): Int = {
      var bestCell = Int.MaxValue
      var bestDot = Long.MinValue
      cands.foreach { case (c, cent) =>
        val d = dot(q, cent)
        if (d > bestDot || (d == bestDot && c < bestCell)) { bestDot = d; bestCell = c }
      }
      bestCell
    }

    private val fineByCoarse: Option[Map[Int, Seq[(Int, Seq[Long])]]] =
      coarse.map(g => fine.groupBy { case (_, cent) => argmax(cent, g) })

    private val liveCoarse: Option[Seq[(Int, Seq[Long])]] =
      fineByCoarse.map(m => coarse.get.filter { case (gc, _) => m.contains(gc) })

    def cellOf(q: Seq[Long]): Int = fineByCoarse match {
      case None    => argmax(q, fine)
      case Some(m) => argmax(q, m(argmax(q, liveCoarse.get)))
    }
  }

  /** Fold one cell's arrivals into its ledger, emitting every
    * threshold pair against the members already seen. Sequential over
    * the iterator, so two arrivals in one micro-batch pair exactly
    * once (when the second is processed) — and membership uniqueness
    * makes that argument global across any batch slicing.
    */
  private[streaming] def foldCell(
      cell: Int,
      state: Option[CellState],
      arrivals: Iterator[VecArrival],
      tNum: Int, tDen: Int,
  ): (CellState, List[DupPair]) = {
    val tn2 = BigInt(tNum.toLong * tNum)
    val td2 = BigInt(tDen.toLong * tDen)
    var members = state.map(_.members).getOrElse(Nil)
    val out = List.newBuilder[DupPair]
    arrivals.foreach { a =>
      if (!members.exists(_.vec_id == a.vec_id)) { // replay-idempotent
        members.foreach { m =>
          val d = dot(a.q, m.q)
          // the batch dup filter verbatim: d ≥ 0, the zero-vector
          // guard, and the cross-multiplied cosine threshold
          if (d >= 0 && a.nq > 0 && m.nq > 0 &&
            BigInt(d) * BigInt(d) * td2 >= BigInt(a.nq) * BigInt(m.nq) * tn2) {
            val (va, vb) =
              if (a.vec_id < m.vec_id) (a.vec_id, m.vec_id) else (m.vec_id, a.vec_id)
            val bp = (BigInt(d) * BigInt(d) * 10000 / (BigInt(a.nq) * BigInt(m.nq))).toLong
            out += DupPair(va, vb, cell.toLong, bp)
          }
        }
        members = Member(a.vec_id, a.q, a.nq) :: members
      }
    }
    (CellState(members), out.result())
  }

  /** Quantize + assign a (vec_id, embedding) stream through the frozen
    * quantizer — entirely stateless (quantization and norm are the
    * codegen'd column expressions; assignment is a per-row pure
    * function of the broadcast-by-closure index).
    */
  def vecArrivals(
      vecs: DataFrame,
      quantizer: FrozenQuantizer,
      scale: Long = 10000000L,
  ): Dataset[VecArrival] = {
    implicit val te: org.apache.spark.sql.Encoder[QuantRow] = Encoders.product[QuantRow]
    implicit val ve: org.apache.spark.sql.Encoder[VecArrival] = Encoders.product[VecArrival]
    vecs
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), scale).as("q"))
      .select(col("vec_id"), col("q"), VectorFunctions.dotLong(col("q"), col("q")).as("nq"))
      .as[QuantRow]
      .map(r => VecArrival(r.vec_id, quantizer.cellOf(r.q), r.q, r.nq))
  }

  /** The stateful dedup-ledger query over a (vec_id, embedding)
    * stream: append-mode intra-cell threshold pairs (va < vb, cell,
    * cos2_bp), each exactly once regardless of arrival order or batch
    * slicing.
    */
  def semanticDedupStream(
      vecs: DataFrame,
      quantizer: FrozenQuantizer,
      tNum: Int, tDen: Int,
      scale: Long = 10000000L,
  ): Dataset[DupPair] = {
    require(tNum > 0 && tDen > 0 && tNum < tDen, "threshold must be in (0,1)")
    implicit val ke: org.apache.spark.sql.Encoder[Int] = Encoders.scalaInt
    implicit val se: org.apache.spark.sql.Encoder[CellState] = Encoders.product[CellState]
    implicit val pe: org.apache.spark.sql.Encoder[DupPair] = Encoders.product[DupPair]
    vecArrivals(vecs, quantizer, scale)
      .groupByKey(_.cell)
      .flatMapGroupsWithState[CellState, DupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (cell: Int, it: Iterator[VecArrival], state: GroupState[CellState]) =>
          val (next, pairs) = foldCell(cell, state.getOption, it, tNum, tDen)
          state.update(next)
          pairs.iterator
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
