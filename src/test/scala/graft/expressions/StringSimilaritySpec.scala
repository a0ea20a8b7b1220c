package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Jaro–Winkler semantics to the textbook cases (the same
  * ones DuckDB was probed with — the q206 oracle then hash-crosses
  * the two implementations over 1,500 real pairs).
  */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double = JaroWinkler.compute(a, b)

  test("textbook values, symmetry, and edge semantics") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    // boost threshold: jaro ≤ 0.7 gets NO prefix bonus
    assert(math.abs(jw("ab", "ax") - 0.6666666666666666) < 1e-12)
    // jaro > 0.7 with common prefix gets it (capped at 4 chars)
    assert(math.abs(jw("abcd", "acbd") - 0.925) < 1e-12)
    // window ⌊max/2⌋−1 ≤ 0 ⇒ positional-only matching
    assert(jw("ab", "ba") == 0.0)
    assert(jw("a", "b") == 0.0)
    // either-empty ⇒ 0 (the DuckDB convention, NOT 1.0 for both-empty)
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    // case-sensitive
    assert(jw("martha", "MARTHA") == 0.0)
    // symmetric in its arguments
    for ((a, b) <- Seq(("DIXON", "DICKSONX"), ("JELLYFISH", "SMELLYFISH"), ("CRATE", "TRACE")))
      assert(jw(a, b) == jw(b, a), s"asymmetric on ($a, $b)")
  }

  test("expression is codegen-capable, null-safe, and matches compute() through the engine") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val e = JaroWinkler(
      org.apache.spark.sql.graftshim.ColumnShim.expression(col("a")),
      org.apache.spark.sql.graftshim.ColumnShim.expression(col("b")))
    assert(!e.isInstanceOf[CodegenFallback], "jaro_winkler must emit real codegen")
    val rows = Seq(
      ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""), ("abc", "abc"),
    ).toDF("a", "b")
      .select(col("a"), col("b"), JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    }
    val withNull = Seq((Some("abc"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw")).collect()
    assert(withNull.head.isNullAt(0), "null input must yield null")
  }
}
