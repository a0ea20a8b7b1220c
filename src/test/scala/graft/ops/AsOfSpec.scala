package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 300L, "l3"),
    (2L, 150L, "l4"), // user with no matching right rows before 150
    (3L, 50L, "l5"), // user with no right rows at all
  ).toDF("user_id", "ts", "tag")

  private val right = Seq(
    (1L, 100L, 10.0, 1000L), // equal-ts: visible to l1 inclusively
    (1L, 250L, 20.0, 1001L),
    (2L, 400L, 30.0, 1002L), // after l4 — never visible to it
  ).toDF("user_id", "ts", "price", "rid")

  test("inclusive as-of: latest right row at-or-before each left ts; nulls when none") {
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("rid"))
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "l1" -> Some(10.0), // equal ts matches
      "l2" -> Some(10.0),
      "l3" -> Some(20.0),
      "l4" -> None,
      "l5" -> None,
    ))
  }

  test("strict as-of: equal-ts right row is NOT visible") {
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("rid"), strict = true)
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(out("l1").isEmpty) // ts=100 right row excluded under <
    assert(out("l2") == Some(10.0))
  }

  test("right-side ties at one ts resolve deterministically to the max tiebreak") {
    val tied = Seq((1L, 100L, 1.0, 7L), (1L, 100L, 2.0, 9L), (1L, 100L, 3.0, 8L))
      .toDF("user_id", "ts", "price", "rid")
    val probe = Seq((1L, 100L, "p")).toDF("user_id", "ts", "tag")
    val out = AsOf.asOfJoin(probe, tied, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("rid"))
      .select("price").as[Double].collect().toSeq
    assert(out == Seq(2.0)) // rid 9 wins
  }

  test("a STRING tie-break keeps its native ordering (no silent cast-to-null)") {
    // regression: __rtb was cast("long"), so string run ids became null
    // for every row and the "deterministic winner" was arbitrary.
    val tied = Seq((1L, 100L, 1.0, "run-a"), (1L, 100L, 2.0, "run-c"), (1L, 100L, 3.0, "run-b"))
      .toDF("user_id", "ts", "price", "run_id")
    val probe = Seq((1L, 100L, "p")).toDF("user_id", "ts", "tag")
    val out = AsOf.asOfJoin(probe, tied, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("run_id"))
      .select("price").as[Double].collect().toSeq
    assert(out == Seq(2.0), s"lexicographic max run-c must win, got $out")
  }

  test("a null right value must not tear the match across columns") {
    // right row at ts=200 has a NULL price but a valid note: the probe
    // at 250 must see (null, "n2") — NOT price 5.0 from ts=100 paired
    // with note "n2" from ts=200.
    val r = Seq(
      (1L, 100L, Some(5.0), "n1", 1L),
      (1L, 200L, None: Option[Double], "n2", 2L),
    ).toDF("user_id", "ts", "price", "note", "rid")
    val probe = Seq((1L, 250L, "p")).toDF("user_id", "ts", "tag")
    val out = AsOf.asOfJoin(probe, r, Seq("user_id"), "ts",
      rightValueCols = Seq("price", "note"), rightTieBreak = Some("rid"))
      .select("price", "note").as[(Option[Double], String)].collect().toSeq
    assert(out == Seq((None, "n2")), s"torn match: $out")
  }

  test("null right keys / timestamps never match (SQL join-key semantics)") {
    val r = Seq(
      (Some(1L), Some(100L), 5.0, 1L),
      (None: Option[Long], Some(50L), 6.0, 2L), // null key: matches nothing
      (Some(1L), None: Option[Long], 7.0, 3L), // null ts: matches nothing
    ).toDF("user_id", "ts", "price", "rid")
    val l = Seq((Some(1L), 200L, "a"), (None: Option[Long], 200L, "b"))
      .toDF("user_id", "ts", "tag")
    val out = AsOf.asOfJoin(l, r, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("rid"))
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> Some(5.0), // only the non-null (1, 100) row matches
      "b" -> None, // null left key never pairs with the null right key
    ))
  }

  test("plans as one shuffle on the key (no range join, no cartesian)") {
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("rid"))
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a product join:\n$plan")
    val shuffles = out.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }
    assert(shuffles.size <= 2, s"expected union+window shuffle shape, got ${shuffles.size}")
  }

  test("forward as-of: earliest right row at-or-after each left ts; inclusive at equal ts") {
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("rid"), forward = true)
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "l1" -> Some(10.0), // equal ts visible forward too
      "l2" -> Some(20.0), // next purchase at 250
      "l3" -> None, // nothing after 300
      "l4" -> Some(30.0), // right row at 400 IS ahead of 150
      "l5" -> None,
    ))
  }

  test("forward + strict: equal-ts right row excluded; forward ties pick max tiebreak") {
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("rid"),
      strict = true, forward = true)
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(out("l1") == Some(20.0), "equal-ts row must be skipped under strict forward")
    val dupRight = Seq((1L, 250L, 20.0, 1001L), (1L, 250L, 25.0, 1005L))
      .toDF("user_id", "ts", "price", "rid")
    val tied = AsOf.asOfJoin(left, dupRight, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("rid"), forward = true)
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(tied("l2") == Some(25.0), "max rid must win forward ties too")
  }

  test("forward: a NULL left timestamp gets a null fill, not the smallest-ts right row") {
    // regression: DESC defaults to NULLS LAST, so a null-ts left row
    // traversed after every right row and picked up the min-ts match.
    val l = Seq((Some(1L), None: Option[Long], "a"), (Some(1L), Some(90L), "b"))
      .toDF("user_id", "ts", "tag")
    val out = AsOf.asOfJoin(l, right, Seq("user_id"), "ts",
      rightValueCols = Seq("price"), rightTieBreak = Some("rid"), forward = true)
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> None, // null ts matches nothing in either direction
      "b" -> Some(10.0), // next right row at-or-after 90 is ts=100
    ))
  }
}
