package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The "pin the constants" contract, verified: every fixed literal a
  * query embeds (q234's Poisson CDF thresholds, q238's Benford ppm,
  * q239's z-sum, DpNoise's geometric construction) is recomputed here
  * from its mathematical definition. A wrong literal would silently
  * produce a cross-engine-consistent but WRONG statistic — the one
  * failure mode the DuckDB oracle cannot catch, so it gets its own
  * gate.
  */
class PinnedConstantsSpec extends AnyFunSuite {

  test("q234 Poisson(1) CDF thresholds at the 2^32 scale match the exact pmf") {
    // cum_k = sum_{j<=k} e^-1 / j!  computed in BigDecimal (exp(1)
    // via its series to 40 terms — error << 2^-32)
    val mc = new java.math.MathContext(60)
    val one = BigDecimal(1, mc)
    val eInv = {
      // e^-1 = Σ (−1)^j / j!  — term_j = −term_{j−1} / j
      var term = one; var sum = one
      for (j <- 1 to 45) { term = -term / j; sum += term }
      sum
    }
    var fact = BigDecimal(1)
    var cum = BigDecimal(0)
    val two32 = BigDecimal(4294967296L)
    val expected = (0 to 5).map { k =>
      if (k > 0) fact = fact * k
      cum += eInv / fact
      (cum * two32).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }
    assert(expected == Seq(1580030168L, 3160060337L, 3950075421L,
      4213413783L, 4279248373L, 4292415291L))
  }

  test("q238 Benford expected ppm match floor(log10(1 + 1/d) * 1e6)") {
    val lits = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L,
      57991L, 51152L, 45757L)
    val computed = (1 to 9).map(d =>
      math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
    assert(computed == lits)
    // the nine probabilities must account for all mass (floor loss < 9 ppm)
    assert(lits.sum > 999990L && lits.sum <= 1000000L)
  }

  test("q239 z-constant 2.801585 = z(0.975) + z(0.8) via Acklam's inverse normal") {
    // Acklam's rational approximation, |relative error| < 1.15e-9
    def invNorm(p: Double): Double = {
      val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
        -2.759285104469687e+02, 1.383577518672690e+02,
        -3.066479806614716e+01, 2.506628277459239e+00)
      val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
        -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
      val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
        -2.400758277161838e+00, -2.549732539343734e+00,
        4.374664141464968e+00, 2.938163982698783e+00)
      val dd = Seq(7.784695709041462e-03, 3.224671290700398e-01,
        2.445134137142996e+00, 3.754408661907416e+00)
      val pl = 0.02425
      if (p < pl) {
        val q = math.sqrt(-2 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
      } else if (p <= 1 - pl) {
        val q = p - 0.5; val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
      } else -invNorm(1 - p)
    }
    val z = invNorm(0.975) + invNorm(0.8)
    assert(math.abs(z - 2.801585) < 5e-6,
      s"z(0.975)+z(0.8) = $z must match the pinned 2.801585")
  }

  test("DpNoise is the ε = 1 discrete Laplace: empirical pmf over 40k keys matches (1−α)/(1+α)·α^|k|") {
    def noiseOf(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def g(off: Int): Long = {
        val h = java.lang.Long.parseLong(hex.slice(off, off + 8), 16)
        math.floor(-math.log(1.0 - ((h.toDouble + 0.5) / 4294967296.0))).toLong
      }
      g(0) - g(8)
    }
    val n = 40000
    val draws = (0 until n).map(i => noiseOf(s"pmf-probe:$i"))
    val alpha = math.exp(-1.0)
    def pmf(k: Int): Double =
      (1 - alpha) / (1 + alpha) * math.pow(alpha, math.abs(k))
    for (k <- -2 to 2) {
      val emp = draws.count(_ == k).toDouble / n
      assert(math.abs(emp - pmf(k)) < 0.006,
        s"P(X=$k): empirical $emp vs exact ${pmf(k)}")
    }
    val mean = draws.sum.toDouble / n
    assert(math.abs(mean) < 0.02, s"two-sided noise must be centered, mean=$mean")
  }
}
