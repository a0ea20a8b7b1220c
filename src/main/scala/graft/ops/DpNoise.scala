package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ε = 1 two-sided-geometric (discrete Laplace) noise shared by the
  * batch DP release (q241) and its streaming twin: noise = G₁ − G₂ with
  * Gᵢ = ⌊−ln(1 − uᵢ)⌋ and uᵢ = (hᵢ + ½)/2³² read from two 32-bit chunks
  * of md5(key) (the q234 multi-draw idiom). u is a dyadic rational
  * strictly inside (0, 1) — the exact-ratio-into-ln class every µnat
  * query trusts cross-engine — so batch Spark, DuckDB, and the
  * streaming twin all derive BIT-IDENTICAL noise for the same key.
  *
  * Seeding from the released cell's OWN key makes re-publication
  * idempotent: a retry, a backfill, or a micro-batch replay re-derives
  * the same draw instead of spending privacy budget twice. Production
  * swaps the public hash for a keyed PRF of the same shape — that
  * changes secrecy, not this plan.
  */
object DpNoise {

  private def geom(h: Column, off: Int): Column =
    floor(-log(lit(1.0) -
      ((conv(substring(h, off, 8), 16, 10).cast("double") + lit(0.5)) /
        lit(4294967296.0)))).cast("long")

  /** Discrete-Laplace noise at ε = 1, a pure function of `key`. */
  def twoSidedGeometric(key: Column): Column = {
    val h = md5(key)
    geom(h, 1) - geom(h, 9)
  }
}
