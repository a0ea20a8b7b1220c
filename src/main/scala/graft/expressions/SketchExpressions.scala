package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
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

  // Mirror the item types Spark's count_min_sketch AGGREGATE accepts:
  // all integrals hash through addLong (so we widen and query the long
  // path), strings hash their UTF-8 bytes (identical to the binary
  // path), binaries hash raw. A sketch built by the builtin on any of
  // these columns is point-queryable here without driver code or casts.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ByteType | ShortType | IntegerType | LongType |
            StringType | BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, integral|string|binary), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketch: Any, item: Any): Any = {
    val cms = CountMinSketch.readFrom(sketch.asInstanceOf[Array[Byte]])
    right.dataType match {
      case ByteType => cms.estimateCount(java.lang.Long.valueOf(item.asInstanceOf[Byte].toLong))
      case ShortType => cms.estimateCount(java.lang.Long.valueOf(item.asInstanceOf[Short].toLong))
      case IntegerType => cms.estimateCount(java.lang.Long.valueOf(item.asInstanceOf[Int].toLong))
      case LongType => cms.estimateCount(item.asInstanceOf[java.lang.Long])
      // UTF8String → raw bytes: exactly what the aggregate feeds addBinary
      case StringType => cms.estimateCount(
        item.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      case BinaryType => cms.estimateCount(item.asInstanceOf[Array[Byte]])
      case other => throw new IllegalStateException(s"unreachable item type $other")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
