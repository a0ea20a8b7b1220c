package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen'd expression — the
  * name-matching comparator record linkage wants next to levenshtein
  * (Winkler's prefix boost models the empirical fact that human name
  * typos cluster at the END of the string). Spark ships no built-in;
  * a Scala UDF would break codegen in the q200-class scoring loops.
  *
  * Semantics are pinned to the TEXTBOOK definition — matched
  * empirically against DuckDB's independent `jaro_winkler_similarity`
  * (the q206 oracle hash-crosses the two implementations cell by
  * cell): match window ⌊max(|a|,|b|)/2⌋−1 (positional-only when it
  * is ≤ 0), transpositions = half the out-of-order matches, prefix
  * scale p = 0.1 capped at 4 chars, boost applied only when
  * jaro > 0.7, either-empty ⇒ 0. Operates on UTF-16 code units
  * (ASCII-identical to DuckDB's byte-wise view; documented
  * divergence outside the BMP-ASCII overlap).
  *
  * Codegen calls the static [[JaroWinkler.compute]] — the
  * Levenshtein pattern (one static call inside WholeStageCodegen, no
  * interpreted fallback, no per-row boxing beyond the two strings).
  */
object JaroWinkler {

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinkler(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** The full Jaro–Winkler algorithm; public static for codegen. */
  def compute(s1: String, s2: String): Double = {
    val (a, b) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    val (la, lb) = (a.length, b.length)
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(lb / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the matched chars of both strings in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, la) && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinkler.compute($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
