package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native expressions completing Spark's CountMin surface: Spark 4
  * ships the `count_min_sketch(col, eps, conf, seed)` AGGREGATE (binary
  * partials, map-side combined) but no SQL-level merge or point-query —
  * without these, estimating a count from a stored sketch means driver
  * code. `cms_merge_all` folds an array of same-shape sketches into
  * one (counter arrays add, so the merge is EXACT: merging per-shard
  * sketches yields bit-identical counters to one sketch over the union
  * — the mergeability identity the spec pins); `cms_estimate` answers
  * a point query against a sketch binary.
  *
  * Both are CodegenFallback BY DESIGN: they operate on sketch TABLES
  * (per-group KB binaries — a few rows per grain), never on raw data,
  * so each eval deserializes a sketch whose size is independent of
  * corpus scale. The raw-data pass is the codegen'd builtin aggregate;
  * these only ever run downstream of it.
  */
object SketchExpressions {

  /** Fold array<binary> of CountMin sketches (same eps/conf/seed) into one. */
  def cmsMergeAll(sketches: Column): Column =
    ColumnShim.column(CmsMergeAll(ColumnShim.expression(sketches)))

  /** Point-estimate the count of `item` (integral) in a sketch binary. */
  def cmsEstimate(sketch: Column, item: Column): Column =
    ColumnShim.column(CmsEstimate(ColumnShim.expression(sketch), ColumnShim.expression(item)))
}

case class CmsMergeAll(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<binary>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_merge_all"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc: CountMinSketch = null
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val sk = CountMinSketch.readFrom(arr.getBinary(i))
        if (acc == null) acc = sk else acc.mergeInPlace(sk)
      }
      i += 1
    }
    if (acc == null) null else acc.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): CmsMergeAll =
    copy(child = newChild)
}

case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, bigint), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CountMinSketch.readFrom(sketch.asInstanceOf[Array[Byte]])
      .estimateCount(item.asInstanceOf[java.lang.Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
