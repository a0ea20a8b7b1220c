package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (event-time lookup) join — for each left row, the LATEST right
  * row with `right.ts <= left.ts` (or `<` in strict mode) within the
  * same key group; `forward = true` flips the direction to the
  * EARLIEST right row with `right.ts >= left.ts` (next-event lookup). Spark has no native as-of join; the naive encodings
  * are a range join (O(left × right-in-range) row explosion) or a
  * per-left-row subquery. This implementation is the scale-correct
  * union-tag form:
  *
  *  1. union the tagged sides (right rows carry the value columns,
  *     left rows carry nulls there);
  *  2. ONE window pass per key ordered by (ts, side): running
  *     `last(value, ignoreNulls)` — each row sees the latest right
  *     values at-or-before its timestamp;
  *  3. keep the left rows.
  *
  * Cost: a single shuffle on `keys` + one sort — no range explosion,
  * no skew beyond the key distribution itself, state O(value columns)
  * per row during the scan. This is the plan you want at 100 TB; pair
  * with [[Skew.saltedInnerJoin]]-style pre-splitting only if a single
  * key dominates (as-of semantics then need per-salt boundary rows, so
  * prefer AQE skew handling here).
  *
  * Tie rule: at equal timestamps the right row is visible to the left
  * row (inclusive) unless `strict = true`. Within equal (ts, side),
  * `rightTieBreak` orders right rows in the column's own native order
  * (numeric, lexicographic for strings, …) and the maximum wins —
  * pass the right side's unique id, any orderable type.
  */
object AsOf {

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightValueCols: Seq[String],
      rightTieBreak: Option[String] = None,
      strict: Boolean = false,
      forward: Boolean = false,
  ): DataFrame = {
    require(rightValueCols.nonEmpty, "need at least one right value column")
    require(rightValueCols.forall(right.columns.contains), "right value cols must exist")
    require(!rightValueCols.exists(left.columns.contains),
      s"right value columns ${rightValueCols.mkString(",")} must not clash with left columns")

    // side order at equal ts: inclusive ⇒ right sorts BEFORE left (its
    // values are visible); strict ⇒ right sorts AFTER left.
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    // SQL join-key semantics: a right row with a null key or null
    // timestamp can never satisfy `l.key = r.key AND l.ts >= r.ts` —
    // drop it up front. (Without this, the window's partitionBy would
    // group null keys together, and asc-nulls-first ordering would make
    // a null-ts right row the "earliest" match for everything.) Left
    // rows always pass through with null fills, as in a left join.
    val rightUsable = right.where(
      (keys :+ tsCol).map(col(_).isNotNull).reduce(_ && _))
    // All right values travel in ONE struct: a single last(ignoreNulls)
    // then cannot tear a match across columns when an individual right
    // value is legitimately null (per-column fills could pair one
    // row's timestamp with an older row's value). Also keeps the plan
    // at exactly one window expression regardless of value-col count.
    // The tie-break keeps the RIGHT column's own type and ordering (a
    // cast to long would null out e.g. string run ids, silently voiding
    // the deterministic-winner guarantee). Left rows never compete on
    // __rtb — at equal ts the __side key already separates the sides —
    // so the left side only needs a type-compatible null for the union.
    val rtb: org.apache.spark.sql.Column = rightTieBreak.map(col).getOrElse(lit(0L))
    val rtbType = rightTieBreak
      .map(c => rightUsable.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val r = rightUsable.select(
      (keys :+ tsCol).map(col) :+
        struct(rightValueCols.map(col): _*).as("__rv") :+
        lit(rightSide).as("__side") :+
        rtb.as("__rtb"): _*)
    val l = left.withColumn("__side", lit(leftSide))
      .withColumn("__rtb", lit(null).cast(rtbType))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // Forward mode scans DESCENDING timestamps, so the running
    // last(ignoreNulls) each left row sees is the EARLIEST right row
    // at-or-after it — the symmetric dual, same single shuffle + sort.
    // The side convention is unchanged (inclusive ⇒ right first in
    // traversal order); the tie-break stays "max rtb wins" because
    // within equal (ts, side) the traversal still ends on the largest
    // __rtb. NULLS FIRST in BOTH modes: a left row with a NULL
    // timestamp must traverse before any (non-null-ts) right row so it
    // gets a null fill — backward's ASC is nulls-first by default, but
    // DESC defaults to nulls-LAST, which would hand a null-ts left row
    // the smallest-ts right row as a spurious "next" match.
    val tsOrder = if (forward) col(tsCol).desc_nulls_first else col(tsCol).asc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc, col("__rtb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    val unpacked = rightValueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("__rv").getField(c))
    }
    unpacked
      .where(col("__side") === leftSide)
      .drop("__side", "__rtb", "__rv")
  }
}
