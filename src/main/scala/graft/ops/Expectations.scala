package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (Deequ-shaped): rules are
  * VALUES, evaluation is one conditional-aggregation scan plus one
  * anti-join per referential rule, and results are a DataFrame —
  * `(rule, n_checked, n_violations, pass)` — so "block the publish"
  * is a filter, not code. This is the reference's A6 validate stage
  * (record-count recount, gads-etl `pipeline.py:186-204`) generalized
  * to arbitrary predicates; `q226_quality_expectations` serves it as
  * an oracle-checked query and [[graft.tools.EndToEnd]] runs it inside
  * stage 2's gate.
  *
  * Scale: all [[Expectations.Predicate]]/[[Expectations.NotNull]]/
  * [[Expectations.InSet]] rules share ONE scan (each is a
  * `count(CASE …)` column — map-side combined; adding a rule adds a
  * column, never a pass). [[Expectations.Unique]] rides the same scan
  * via `count(*) − count(DISTINCT keys)`. [[Expectations.RefIntegrity]]
  * pays one LEFT ANTI join against the dimension's key set —
  * broadcastable while the dimension fits, the E4 bloom shape beyond.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Column must be non-null. */
  final case class NotNull(name: String, column: String) extends Rule

  /** Key set must be row-unique. Rows with a NULL in any key column
    * are EXCLUDED from the uniqueness count — a duplicate cannot be
    * asserted on an unknown key (pair the rule with [[NotNull]] on the
    * same columns to reject the NULLs themselves).
    */
  final case class Unique(name: String, columns: Seq[String]) extends Rule

  /** Column value must be a member of the (small, literal) set. */
  final case class InSet(name: String, column: String, values: Seq[String]) extends Rule

  /** Arbitrary row predicate that must HOLD (violation = !holds).
    * NULL evaluates as a violation — an expectation that cannot be
    * established is not met.
    */
  final case class Predicate(name: String, holds: Column) extends Rule

  /** Every value of `column` must exist in `dim`'s `dimColumn`. */
  final case class RefIntegrity(
      name: String, column: String, dim: DataFrame, dimColumn: String) extends Rule

  /** Evaluate all rules over `df` → (rule, n_checked, n_violations,
    * pass), one row per rule, alphabetical by rule name.
    */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectations declared")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    // Names are spliced into generated column ids and a stack() expr —
    // restrict to identifier-safe characters rather than escaping.
    val badNames = rules.map(_.name).filterNot(_.matches("[A-Za-z][A-Za-z0-9_]*"))
    require(badNames.isEmpty,
      s"rule names must match [A-Za-z][A-Za-z0-9_]*: ${badNames.mkString(", ")}")

    def violationCol(r: Rule): Option[Column] = r match {
      case NotNull(n, c) => Some(count(when(col(c).isNull, 1)).as(s"v_$n"))
      case Unique(n, cs) =>
        // countDistinct skips NULL keys, so the minuend must too —
        // count(*) here would report every NULL-keyed row as a
        // phantom duplicate.
        val allKeysPresent = cs.map(col(_).isNotNull).reduce(_ && _)
        Some((count(when(allKeysPresent, 1)) -
          countDistinct(col(cs.head), cs.tail.map(col): _*)).as(s"v_$n"))
      case InSet(n, c, vs) =>
        // NULL is a domain violation too: it is not a member.
        Some(count(when(!coalesce(col(c).isInCollection(vs), lit(false)), 1)).as(s"v_$n"))
      case Predicate(n, p) => Some(count(when(!coalesce(p, lit(false)), 1)).as(s"v_$n"))
      case _: RefIntegrity => None
    }

    val rowLocal = rules.flatMap(r => violationCol(r).map(r.name -> _))
    val base = df.agg(count(lit(1)).as("n_checked"),
      rowLocal.map(_._2): _*)

    val refs = rules.collect { case r: RefIntegrity =>
      r.name -> df
        .join(r.dim.select(col(r.dimColumn).as(r.column)), Seq(r.column), "left_anti")
        .agg(count(lit(1)).as(s"v_${r.name}"))
    }
    val joined = refs.foldLeft(base) { case (acc, (_, v)) => acc.join(v) }

    val stackArgs = rules
      .map(r => s"'${r.name}', n_checked, v_${r.name}")
      .mkString(", ")
    joined
      .select(expr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_checked, n_violations)"))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule")
  }
}
