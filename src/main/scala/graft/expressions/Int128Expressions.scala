package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Exact signed 128/192-bit integer arithmetic over primitive longs —
  * allocation-free, so the codegen'd callers below stay GC-silent on
  * the candidate-verify hot paths.
  *
  * Why this exists: the fixed-point similarity family expresses its
  * cosine thresholds as cross-multiplied integer tests
  * (`dot²·tDen² ≥ na·nb·tNum²`) and its ranking keys as integer
  * quotients (`(dot²·10⁴) div n`). The DECIMAL(38,0) SQL forms of
  * those tests are exact but allocation-heavy: profiled at a 64×
  * replica, the threshold filter alone cost 8.3 s over 57 M pinned
  * candidate rows with GC at ~30% of session wall-clock (SCALE_NOTES
  * r10). Every operation here is a handful of long multiplies and
  * compares instead, and the [[Int128]] methods are plain static
  * calls, so whole-stage codegen keeps the verify loop fused and
  * garbage-free. The DuckDB oracles keep their decimal SQL — these
  * forms are exact, so the values are bit-identical (pinned against
  * the decimal expressions in Int128Spec).
  */
object Int128 {

  /** Unsigned high 64 bits of x·y — Java 17 has no
    * Math.unsignedMultiplyHigh (arrives in 18); the classic
    * signed→unsigned fix-up adds back the borrow each negative
    * operand's sign bit introduced.
    */
  def umulHi(x: Long, y: Long): Long =
    Math.multiplyHigh(x, y) + ((x >> 63) & y) + ((y >> 63) & x)

  /** sign(a·b·k1 − c·d·k2) with k1, k2 ≥ 0 — exact for every int64
    * input (the three-factor products run to 192 bits; nothing
    * truncates). The cross-multiplied cosine-threshold test
    * `dot²·tDen² ≥ na·nb·tNum²` is `cmpProd3(dot, dot, tDen², na, nb,
    * tNum²) >= 0`.
    */
  def cmpProd3(a: Long, b: Long, k1: Long, c: Long, d: Long, k2: Long): Int = {
    if (k1 < 0 || k2 < 0)
      throw new IllegalArgumentException(s"cmpProd3 needs k1, k2 >= 0 (got $k1, $k2)")
    val ph = Math.multiplyHigh(a, b); val pl = a * b
    val qh = Math.multiplyHigh(c, d); val ql = c * d
    val ps = if (k1 == 0 || (ph == 0 && pl == 0)) 0 else if (ph < 0) -1 else 1
    val qs = if (k2 == 0 || (qh == 0 && ql == 0)) 0 else if (qh < 0) -1 else 1
    if (ps != qs) return Integer.signum(ps - qs)
    if (ps == 0) return 0
    // same nonzero sign: compare magnitudes |a·b|·k1 vs |c·d|·k2 as
    // unsigned 192-bit (3 limbs); |a·b| ≤ 2¹²⁶ so the negated high
    // word stays in [0, 2⁶²] and signed multiplies are safe on it
    var pLo = pl; var pHi = ph
    if (ps < 0) { pHi = if (pl == 0L) -ph else ~ph; pLo = -pl }
    var qLo = ql; var qHi = qh
    if (ps < 0) { qHi = if (ql == 0L) -qh else ~qh; qLo = -ql }
    val x0 = pLo * k1
    val xc = umulHi(pLo, k1)
    val xm = pHi * k1
    val x1 = xm + xc
    val x2 = Math.multiplyHigh(pHi, k1) +
      (if (java.lang.Long.compareUnsigned(x1, xm) < 0) 1L else 0L)
    val y0 = qLo * k2
    val yc = umulHi(qLo, k2)
    val ym = qHi * k2
    val y1 = ym + yc
    val y2 = Math.multiplyHigh(qHi, k2) +
      (if (java.lang.Long.compareUnsigned(y1, ym) < 0) 1L else 0L)
    var r = java.lang.Long.compareUnsigned(x2, y2)
    if (r == 0) r = java.lang.Long.compareUnsigned(x1, y1)
    if (r == 0) r = java.lang.Long.compareUnsigned(x0, y0)
    Integer.signum(if (ps < 0) -r else r)
  }

  /** Unsigned 128/64 division (Hacker's Delight fig. 9-3 "divlu"):
    * floor((hi·2⁶⁴ + lo) / d) REQUIRING compareUnsigned(hi, d) < 0 so
    * the quotient fits one word, and d != 0. Callers chain it limb by
    * limb (the running remainder is always < d, satisfying the
    * precondition).
    */
  private def divlu(hi: Long, lo: Long, dIn: Long): Long = {
    val s = java.lang.Long.numberOfLeadingZeros(dIn)
    val d = dIn << s
    val dh = d >>> 32
    val dl = d & 0xFFFFFFFFL
    // (x >>> 64) is x in Java/Scala shift-mod-64 semantics — branch s == 0
    val un64 = if (s == 0) hi else (hi << s) | (lo >>> (64 - s))
    val un10 = lo << s
    val un1 = un10 >>> 32
    val un0 = un10 & 0xFFFFFFFFL
    var q1 = java.lang.Long.divideUnsigned(un64, dh)
    var rhat = java.lang.Long.remainderUnsigned(un64, dh)
    var fix = true
    while (fix && (java.lang.Long.compareUnsigned(q1, 0x100000000L) >= 0 ||
        java.lang.Long.compareUnsigned(q1 * dl, (rhat << 32) | un1) > 0)) {
      q1 -= 1; rhat += dh
      if (java.lang.Long.compareUnsigned(rhat, 0x100000000L) >= 0) fix = false
    }
    val un21 = (un64 << 32) + un1 - q1 * d
    var q0 = java.lang.Long.divideUnsigned(un21, dh)
    rhat = java.lang.Long.remainderUnsigned(un21, dh)
    fix = true
    while (fix && (java.lang.Long.compareUnsigned(q0, 0x100000000L) >= 0 ||
        java.lang.Long.compareUnsigned(q0 * dl, (rhat << 32) | un0) > 0)) {
      q0 -= 1; rhat += dh
      if (java.lang.Long.compareUnsigned(rhat, 0x100000000L) >= 0) fix = false
    }
    (q1 << 32) | q0
  }

  /** (dot²·10⁴) div n for n > 0 — the q29 integer ranking key, exact.
    * dot² is a nonnegative 128-bit value, ·10⁴ reaches 192 bits; the
    * quotient must fit a signed long or this THROWS (the callers'
    * documented envelope — near-unit fixed-point norms — keeps it
    * ≤ ~1.01e18; anything past 2⁶³ is caller corruption and a silent
    * wrap would scramble the ranking).
    */
  def rankFp(dot: Long, n: Long): Long = {
    if (n <= 0) throw new ArithmeticException(s"rank_fp needs a positive norm (got $n)")
    // num = dot²·10⁴ as 3 unsigned limbs (n2, n1, n0)
    val pl = dot * dot
    val ph = Math.multiplyHigh(dot, dot) // ≥ 0: a square
    val n0 = pl * 10000L
    val c1 = umulHi(pl, 10000L)
    val m = ph * 10000L
    val n1 = m + c1
    val n2 = Math.multiplyHigh(ph, 10000L) +
      (if (java.lang.Long.compareUnsigned(n1, m) < 0) 1L else 0L)
    // chained division by the single positive limb n
    val q2 = java.lang.Long.divideUnsigned(n2, n)
    val r2 = java.lang.Long.remainderUnsigned(n2, n)
    val q1 = divlu(r2, n1, n)
    val r1 = n1 - q1 * n // ≡ remainder mod 2⁶⁴, and the remainder < n ≤ 2⁶³
    val q0 = divlu(r1, n0, n)
    if (q2 != 0L || q1 != 0L || q0 < 0L)
      throw new ArithmeticException(s"rank_fp overflows int64 (dot=$dot, n=$n)")
    q0
  }

  /** (dot²·10⁴) div (na·nb) for na, nb > 0 — basis-point squared
    * cosine, exact. Cauchy–Schwarz over the integers (dot = x·y,
    * na = x·x, nb = y·y) bounds the quotient by 10⁴; inputs that are
    * not a dot/norm triple of the same two vectors can violate it and
    * THROW. 14-step binary search, each step one [[cmpProd3]].
    */
  def cos2Bp(dot: Long, na: Long, nb: Long): Long = {
    if (na <= 0 || nb <= 0)
      throw new ArithmeticException(s"cos2_bp needs positive norms (got na=$na, nb=$nb)")
    if (cmpProd3(dot, dot, 10000L, na, nb, 10000L) > 0)
      throw new ArithmeticException(
        s"cos²·10⁴ > 10⁴ — (dot=$dot, na=$na, nb=$nb) is not a dot/norm triple")
    var lo = 0L; var hi = 10000L
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (cmpProd3(na, nb, mid, dot, dot, 10000L) <= 0) lo = mid else hi = mid - 1
    }
    lo
  }
}

/** sign(a·b·k1 − c·d·k2) as int — the codegen'd cross-multiplied
  * threshold comparator ([[Int128.cmpProd3]]). k1/k2 are plan-time
  * constants (threshold numerator/denominator squares), so they embed
  * in the generated code rather than widening the row.
  */
case class ProdCmp3(a: Expression, b: Expression, c: Expression, d: Expression,
    k1: Long, k2: Long) extends QuaternaryExpression {
  require(k1 >= 0 && k2 >= 0, s"prod_cmp3 needs k1, k2 >= 0 (got $k1, $k2)")

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = c
  override def fourth: Expression = d
  override def dataType: DataType = IntegerType
  override def prettyName: String = "prod_cmp3"
  override def checkInputDataTypes() =
    VectorExpressions.checkAllLong(Seq(a, b, c, d), prettyName)

  override protected def nullSafeEval(av: Any, bv: Any, cv: Any, dv: Any): Any =
    Int128.cmpProd3(av.asInstanceOf[Long], bv.asInstanceOf[Long], k1,
      cv.asInstanceOf[Long], dv.asInstanceOf[Long], k2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv, cv, dv) =>
      s"${ev.value} = graft.expressions.Int128.cmpProd3($av, $bv, ${k1}L, $cv, $dv, ${k2}L);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(a = newFirst, b = newSecond, c = newThird, d = newFourth)
}

/** (dot²·10⁴) div n as long — the codegen'd integer ranking key
  * ([[Int128.rankFp]]); throws on n ≤ 0 or an int64-overflowing
  * quotient, never wraps.
  */
case class RankFp(dot: Expression, n: Expression) extends BinaryExpression {
  override def left: Expression = dot
  override def right: Expression = n
  override def dataType: DataType = LongType
  override def prettyName: String = "rank_fp"
  override def checkInputDataTypes() =
    VectorExpressions.checkAllLong(Seq(dot, n), prettyName)

  override protected def nullSafeEval(dv: Any, nv: Any): Any =
    Int128.rankFp(dv.asInstanceOf[Long], nv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (dv, nv) => s"graft.expressions.Int128.rankFp($dv, $nv)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(dot = newLeft, n = newRight)
}

/** (dot²·10⁴) div (na·nb) as long — the codegen'd basis-point squared
  * cosine ([[Int128.cos2Bp]]); throws on non-positive norms (the r9
  * ADVICE zero-vector rule stays loud) or a non-Cauchy–Schwarz triple.
  */
case class Cos2Bp(dot: Expression, na: Expression, nb: Expression)
    extends TernaryExpression {
  override def first: Expression = dot
  override def second: Expression = na
  override def third: Expression = nb
  override def dataType: DataType = LongType
  override def prettyName: String = "cos2_bp"
  override def checkInputDataTypes() =
    VectorExpressions.checkAllLong(Seq(dot, na, nb), prettyName)

  override protected def nullSafeEval(dv: Any, av: Any, bv: Any): Any =
    Int128.cos2Bp(dv.asInstanceOf[Long], av.asInstanceOf[Long], bv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (dv, av, bv) => s"graft.expressions.Int128.cos2Bp($dv, $av, $bv)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(dot = newFirst, na = newSecond, nb = newThird)
}
