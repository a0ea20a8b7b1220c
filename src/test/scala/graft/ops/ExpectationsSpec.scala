package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def table = Seq(
    (1L, Option("a"), Option(10.0)),
    (1L, Option("b"), Option(-1.0)), // dup key, negative
    (2L, None, Option(5.0)), // null tag
    (3L, Option("z"), None), // out-of-domain tag, null value
  ).toDF("k", "tag", "v")

  test("each rule counts its own violations; NULL fails predicate and domain rules") {
    val got = Expectations.evaluate(table, Seq(
      Expectations.NotNull("tag_present", "tag"),
      Expectations.Unique("k_unique", Seq("k")),
      Expectations.Predicate("v_positive", col("v") > 0),
      Expectations.InSet("tag_domain", "tag", Seq("a", "b")),
    )).collect().map(r => r.getAs[String]("rule") ->
      (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass"))).toMap
    assert(got("tag_present") == ((4L, 1L, false)))
    assert(got("k_unique") == ((4L, 1L, false)))
    // v_positive: -1 violates, NULL violates (cannot be established)
    assert(got("v_positive") == ((4L, 2L, false)))
    // tag_domain: 'z' violates, NULL violates
    assert(got("tag_domain") == ((4L, 2L, false)))
  }

  test("Unique: NULL-keyed rows are not phantom duplicates; real dups among them still count") {
    val withNulls = Seq(
      (Option(1L), "a"), (Option(1L), "b"), // one real duplicate
      (Option.empty[Long], "c"), (Option.empty[Long], "d"), // two null keys — excluded
    ).toDF("k", "tag")
    val got = Expectations.evaluate(withNulls, Seq(
      Expectations.Unique("k_unique", Seq("k")))).collect().head
    assert(got.getAs[Long]("n_violations") == 1L,
      "exactly the 1-vs-1 duplicate; NULL keys must not inflate the count")
  }

  test("identifier-unsafe rule names are rejected before any plan is built") {
    intercept[IllegalArgumentException] {
      Expectations.evaluate(table, Seq(Expectations.NotNull("tag present", "tag")))
    }
    intercept[IllegalArgumentException] {
      Expectations.evaluate(table, Seq(Expectations.NotNull("o'key", "tag")))
    }
  }

  test("RefIntegrity counts orphan ROWS against the dimension key set") {
    val dim = Seq((1L, "x")).toDF("dk", "name")
    val got = Expectations.evaluate(table, Seq(
      Expectations.RefIntegrity("k_in_dim", "k", dim, "dk"),
    )).collect().head
    // keys 2 and 3 are orphans: two rows
    assert(got.getAs[Long]("n_violations") == 2L && !got.getAs[Boolean]("pass"))
  }

  test("a fully clean frame passes every rule") {
    val clean = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "tag", "v")
    val got = Expectations.evaluate(clean, Seq(
      Expectations.NotNull("tag_present", "tag"),
      Expectations.Unique("k_unique", Seq("k")),
      Expectations.Predicate("v_positive", col("v") > 0),
    )).collect()
    assert(got.forall(_.getAs[Boolean]("pass")))
  }

  test("duplicate rule names are rejected loudly") {
    intercept[IllegalArgumentException] {
      Expectations.evaluate(table, Seq(
        Expectations.NotNull("r", "tag"), Expectations.Unique("r", Seq("k"))))
    }
  }
}
