package graft.expressions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MathUtils}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, LongType}

/** Imperative vector AGGREGATES for the fixed-point PCA family.
  *
  * The r9 scatter matrix ran as a double `posexplode` → `groupBy(i, j)`
  * → DECIMAL sum: N·d² generated rows through a hash aggregate — at a
  * 64× replica that is 13·10⁹ tuples hashed into 4 096 groups before
  * the d²-row result is even collected, and it was the dominant term of
  * both q202 and q224 (SCALE_NOTES r10). These aggregates compute the
  * SAME integers in one pass over the N input rows: a flat per-partition
  * accumulator array updated with raw index arithmetic (d² exact
  * multiply-adds per row), partial states merged once per partition.
  * The shape difference IS the 100 TB story: the exchange carries one
  * d²-sized state per partition, never N·d² element rows.
  *
  * Exactness: products of centered fixed-point components are ≤ 4·10¹⁴,
  * so an int64 accumulator could wrap after ~23 000 adversarial rows —
  * each cell therefore accumulates in TWO'S-COMPLEMENT INT128 (hi/lo
  * long pairs, carry-propagated), emitted as DECIMAL(38,0) — bit-equal
  * to the `sum(CAST(xi·xj AS DECIMAL(38,0)))` it replaces for every
  * input within the callers' documented |c| ≤ 2·scale envelope, and
  * overflow-proof far beyond it (2¹²⁷/4·10¹⁴ ≈ 4·10²³ rows).
  */
object VectorAggregates {

  /** Element-wise exact Σ over `array<long>` rows, as one aggregate
    * state of d longs — replaces the `posexplode` → `groupBy(i)` mean
    * pass (N·d shuffled element rows → d-long states). Null elements
    * throw (dense fixed-point contract); length drift throws; empty
    * input yields an empty array.
    */
  def vecSumLong(v: Column): Column =
    ColumnShim.column(LongVecSumAgg(ColumnShim.expression(v)).toAggregateExpression())

  /** Row-major d² scatter matrix Σ cᵢ·cⱼ over `array<long>` rows as
    * DECIMAL(38,0) — the one-pass form of the fixed-point PCA scatter.
    */
  def scatterMatrix(v: Column): Column =
    ColumnShim.column(ScatterMatrixAgg(ColumnShim.expression(v)).toAggregateExpression())

  private[expressions] def checkLongVec(child: Expression, name: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$name expects array<bigint>, got $t")
    }

  private[expressions] def serializeLongs(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  private[expressions] def deserializeLongs(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  private[expressions] def checkSameLength(a: Int, b: Int, name: String): Unit =
    if (a != b)
      throw new IllegalArgumentException(
        s"$name: array length changed mid-aggregation ($a vs $b) — vectors must share a dimension")
}

case class LongVecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorAggregates.checkLongVec(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum_long"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buffer.isEmpty) new Array[Long](d) else buffer
    VectorAggregates.checkSameLength(b.length, d, prettyName)
    var i = 0
    while (i < d) {
      VectorExpressions.checkNoNullElement(arr.isNullAt(i), prettyName, i)
      b(i) = MathUtils.addExact(b(i), arr.getLong(i))
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    VectorAggregates.checkSameLength(a.length, b.length, prettyName)
    var i = 0
    while (i < a.length) { a(i) = MathUtils.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    VectorAggregates.serializeLongs(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    VectorAggregates.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongVecSumAgg =
    copy(child = newChild)
}

/** Int128 scatter-matrix accumulator. Buffer layout: interleaved
  * (hi, lo) pairs, row-major over (i, j) — `buf(2k)` = hi, `buf(2k+1)`
  * = lo (lo read as unsigned). Each per-row product enters through a
  * sign-extending 128-bit add; partials merge with one carry-propagated
  * 128-bit add per cell.
  */
case class ScatterMatrixAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorAggregates.checkLongVec(child, prettyName)
  override def dataType: DataType = ArrayType(DecimalType(38, 0), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "scatter_matrix"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buffer.isEmpty) new Array[Long](2 * d * d) else buffer
    VectorAggregates.checkSameLength(b.length, 2 * d * d, prettyName)
    val x = new Array[Long](d)
    var i = 0
    while (i < d) {
      VectorExpressions.checkNoNullElement(arr.isNullAt(i), prettyName, i)
      x(i) = arr.getLong(i)
      i += 1
    }
    i = 0
    var k = 0
    while (i < d) {
      val xi = x(i)
      var j = 0
      while (j < d) {
        val p = MathUtils.multiplyExact(xi, x(j))
        // 128-bit += sign-extended 64-bit: unsigned carry out of lo,
        // then hi picks up the carry plus p's sign extension
        val lo = b(k + 1)
        val sum = lo + p
        b(k) += (p >> 63) + (((lo & p) | ((lo | p) & ~sum)) >>> 63)
        b(k + 1) = sum
        j += 1
        k += 2
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    VectorAggregates.checkSameLength(a.length, b.length, prettyName)
    var k = 0
    while (k < a.length) {
      val lo1 = a(k + 1)
      val lo2 = b(k + 1)
      val sum = lo1 + lo2
      a(k) += b(k) + (((lo1 & lo2) | ((lo1 | lo2) & ~sum)) >>> 63)
      a(k + 1) = sum
      k += 2
    }
    a
  }

  override def eval(buffer: Array[Long]): Any = {
    val d2 = buffer.length / 2
    val out = new Array[Any](d2)
    val bytes = new Array[Byte](16)
    var k = 0
    while (k < d2) {
      val hi = buffer(2 * k)
      val lo = buffer(2 * k + 1)
      var b = 0
      while (b < 8) {
        bytes(b) = (hi >>> (56 - 8 * b)).toByte
        bytes(b + 8) = (lo >>> (56 - 8 * b)).toByte
        b += 1
      }
      // big-endian two's-complement — exactly the int128 value
      out(k) = Decimal(new java.math.BigDecimal(new BigInteger(bytes)), 38, 0)
      k += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] =
    VectorAggregates.serializeLongs(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    VectorAggregates.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ScatterMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScatterMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ScatterMatrixAgg =
    copy(child = newChild)
}
