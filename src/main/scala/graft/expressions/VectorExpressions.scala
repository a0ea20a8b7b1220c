package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MathUtils}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for dense float-vector math.
  *
  * The higher-order-function formulations (`zip_with` + `aggregate`)
  * are CodegenFallback: each element evaluation is an interpreted
  * virtual call, and cosine needs three of them (dot, |a|, |b|) — nine
  * interpreted passes worth of lambda dispatch per row. These
  * expressions instead emit a single fused Java loop via `doGenCode`,
  * participating in whole-stage codegen like any built-in, with an
  * interpreted `nullSafeEval` fallback that matches bit-for-bit
  * (parity-tested against the HOF forms).
  *
  * This is the preference order SURVEY.md §7.2 prescribes: compose
  * built-ins first (done — the HOF forms), drop to a custom Expression
  * only where the bench demands it (q29/q37 similarity scans).
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ over float arrays, accumulated in double. */
  def vecDot(a: Column, b: Column): Column =
    ColumnShim.column(FloatVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Cosine similarity in one fused pass (dot + both norms); 0.0 when
    * either norm is zero.
    */
  def vecCosine(a: Column, b: Column): Column =
    ColumnShim.column(FloatVecCosine(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Exact fixed-point dot product: Σ q(aᵢ)·q(bᵢ) with
    * q(x) = round(double(x)·scale) half-away-from-zero — an exact int64
    * (the q92 centroid idiom applied to the dot product). Because every
    * term is an integer, the sum is shuffle/order-proof and reproducible
    * verbatim in any engine — the property that lets similarity RANKINGS
    * be hash-pinned cross-engine (q29) instead of float-ordered.
    * `vecDotFp(a, a)` is the fixed-point squared norm.
    */
  def vecDotFp(a: Column, b: Column, scale: Long): Column =
    ColumnShim.column(FloatVecDotFp(ColumnShim.expression(a), ColumnShim.expression(b), scale))

  /** Exact Σ aᵢ·bᵢ over two PRE-QUANTIZED `array<long>` columns — the
    * codegen'd inner loop of every operator that materializes fixed-point
    * vectors once and reuses them across stages (k-means assignment's
    * n·cells dots, the PCA scatter projections, intra-cell dedup pairs).
    * Overflow throws through Spark's ANSI arithmetic, identical to the
    * HOF `aggregate(zip_with(a,b,_*_))` it replaces — callers own the
    * no-overflow argument exactly as before, loud-failure-guarded
    * exactly as before.
    */
  def vecDotLong(a: Column, b: Column): Column =
    ColumnShim.column(LongVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  private[expressions] def checkVecTypes(left: Expression, right: Expression, name: String): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name expects (array<float>, array<float>), got ($l, $r)")
    }

  private[expressions] def checkLongVecTypes(left: Expression, right: Expression, name: String): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
}

case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVecTypes(left, right, prettyName)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  // Locals come from ctx.freshName: when both children are
  // non-nullable, nullSafeCodeGen splices this snippet without an
  // enclosing block, so two vec_dot instances in one projection would
  // otherwise declare duplicate Java locals and break janino
  // compilation (silent interpreted fallback).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fixed-point dot product over float arrays (exact int64).
  *
  * Quantization is round-half-away-from-zero on the BINARY double value
  * of `element·scale` — the semantics of C `round()`/DuckDB `round()`,
  * implemented as `floor(|p|) + (frac ≥ 0.5)` (the frac subtraction is
  * exact for any double, so this is bit-equal to libm round without a
  * libm call). The multiply `double(float)·double(long)` is one
  * correctly-rounded IEEE op — identical in every engine — so the whole
  * expression is integer-exact and cross-engine reproducible.
  */
case class FloatVecDotFp(left: Expression, right: Expression, scale: Long)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVecTypes(left, right, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_fp"

  @inline private def q(x: Float): Long = {
    val p = x.toDouble * scale.toDouble
    val ap = math.abs(p)
    val f = math.floor(ap)
    val m = f.toLong + (if (ap - f >= 0.5d) 1L else 0L)
    if (p < 0) -m else m
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += q(x.getFloat(i)) * q(y.getFloat(i))
      i += 1
    }
    s
  }

  // freshName'd locals — see FloatVecDot.doGenCode for why.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val px = ctx.freshName("px")
      val py = ctx.freshName("py")
      val ap = ctx.freshName("ap")
      val f = ctx.freshName("f")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $px = (double) $a.getFloat($i) * ${scale}.0D;
         |    double $ap = Math.abs($px); double $f = Math.floor($ap);
         |    long $qx = (long) $f + (($ap - $f >= 0.5D) ? 1L : 0L);
         |    if ($px < 0) $qx = -$qx;
         |    double $py = (double) $b.getFloat($i) * ${scale}.0D;
         |    $ap = Math.abs($py); $f = Math.floor($ap);
         |    long $qy = (long) $f + (($ap - $f >= 0.5D) ? 1L : 0L);
         |    if ($py < 0) $qy = -$qy;
         |    $s += $qx * $qy;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact int64 dot over two `array<long>` columns (one fused codegen'd
  * loop). Mismatched lengths THROW (the fixed-point pipelines quantize
  * both sides from same-dimension embeddings, so a length mismatch is
  * always caller corruption — a silent min-length truncation would
  * return a wrong partial sum where the HOF's `zip_with` returned
  * nulls that poisoned the aggregate; loud beats either). Null
  * elements are skipped (contribute 0) — the same convention as
  * [[FloatVecDot]]; the quantized arrays never carry null elements,
  * where this is indistinguishable from the HOF form, and the skip-
  * vs-HOF-NULL divergence on synthetic null elements is pinned
  * explicitly in spec. Overflow THROWS through Spark's own ANSI
  * arithmetic (`MathUtils.multiplyExact/addExact` — the exact code
  * path the HOF's `x * y` takes), never wraps silently: the callers'
  * no-overflow bounds stay loud-failure-guarded exactly as they were
  * under the HOF form.
  */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkLongVecTypes(left, right, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = LongVecDot.checkedLength(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s = MathUtils.addExact(s, MathUtils.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    s
  }

  // freshName'd locals — see FloatVecDot.doGenCode for why.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // the object's static forwarders — the same call Spark's ANSI
      // Multiply/Add codegen emits
      val mu = MathUtils.getClass.getName.stripSuffix("$")
      val lvd = LongVecDot.getClass.getName.stripSuffix("$")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = $lvd.checkedLength($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s = $mu.addExact($s, $mu.multiplyExact($a.getLong($i), $b.getLong($i)));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongVecDot {
  /** Loud length gate, shared by eval and generated code (the codegen
    * calls the static forwarder). Returns the common length.
    */
  def checkedLength(nx: Int, ny: Int): Int = {
    if (nx != ny)
      throw new IllegalArgumentException(
        s"vec_dot_long: array length mismatch ($nx vs $ny) — quantized vectors must share a dimension")
    nx
  }
}

case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVecTypes(left, right, prettyName)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = x.getFloat(i).toDouble
        val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
      }
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0.0) dot / denom else 0.0
  }

  // freshName'd locals — see FloatVecDot.doGenCode for why.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |}
         |double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |${ev.value} = $denom > 0.0 ? $dot / $denom : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
