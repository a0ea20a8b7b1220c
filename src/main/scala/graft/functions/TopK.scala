package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate: keeps the k best (score, id) pairs per
  * group in an O(k) buffer with map-side partial aggregation.
  *
  * Why this exists when `Window.orderBy + row_number <= k` works: the
  * window form shuffles EVERY row of every group and sorts each group
  * in full. This aggregate ships at most k rows per group per map task
  * into the shuffle — at 100 TB, top-10-per-key over a billion-row
  * group is a k-row buffer instead of a billion-row sort. Same
  * reasoning as Spark's own TakeOrderedAndProject, applied per group.
  *
  * Ordering: score descending, id ascending tie-break — fully
  * deterministic, so the result is oracle-checkable (q39).
  */
object TopK {

  final case class ScoredId(score: Double, id: Long)

  final class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    private def better(a: ScoredId, b: ScoredId): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Seq[ScoredId] = Seq.empty

    override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
      if (buf.sizeIs < k) (in +: buf).sortWith(better)
      else if (better(in, buf.last)) (in +: buf.init).sortWith(better)
      else buf

    override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
      (a ++ b).sortWith(better).take(k)

    override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r.sortWith(better)

    override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  }

  /** DataFrame-facing aggregate column: top `k` (score, id) pairs,
    * returned as an array of structs sorted best-first. Usage:
    * `df.groupBy("g").agg(TopK.topK(3, col("value"), col("event_id")))`.
    */
  def topK(k: Int, score: Column, id: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId]).apply(score, id)

  final case class KeyedId(h: String, id: Long)

  /** The k SMALLEST (h, id) pairs per group, lexicographic on (h, id)
    * — the bounded-buffer form of `ORDER BY h, id LIMIT k` per group,
    * for md5-keyed deterministic sampling (q258's candidate cap):
    * however many rows a group generates, each map task ships at most
    * k of them into the shuffle. Same O(k)-buffer discipline as
    * [[TopKAggregator]], inverted order, string keys.
    */
  final class BottomKAggregator(k: Int) extends Aggregator[KeyedId, Seq[KeyedId], Seq[KeyedId]] {
    private def better(a: KeyedId, b: KeyedId): Boolean = {
      val c = a.h.compareTo(b.h)
      c < 0 || (c == 0 && a.id < b.id)
    }

    override def zero: Seq[KeyedId] = Seq.empty

    override def reduce(buf: Seq[KeyedId], in: KeyedId): Seq[KeyedId] =
      if (buf.sizeIs < k) (in +: buf).sortWith(better)
      else if (better(in, buf.last)) (in +: buf.init).sortWith(better)
      else buf

    override def merge(a: Seq[KeyedId], b: Seq[KeyedId]): Seq[KeyedId] =
      (a ++ b).sortWith(better).take(k)

    override def finish(r: Seq[KeyedId]): Seq[KeyedId] = r.sortWith(better)

    override def bufferEncoder: Encoder[Seq[KeyedId]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[KeyedId]] = ExpressionEncoder()
  }

  /** Aggregate column for [[BottomKAggregator]]: smallest `k` (h, id)
    * pairs as an array of structs, best (smallest) first.
    */
  def bottomK(k: Int, h: Column, id: Column): Column =
    udaf(new BottomKAggregator(k), Encoders.product[KeyedId]).apply(h, id)
}
