package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopK aggregator matches window row_number top-k exactly") {
    val ev = graft.ops.Tables.events(spark, sfDir)
    val viaAgg = ev.groupBy("user_id")
      .agg(TopK.topK(5, col("value"), col("event_id")).as("top"))
      .select(col("user_id"), explode(col("top")).as("t"))
      .select(col("user_id"), col("t.score"), col("t.id"))
      .as[(Long, Double, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    val viaWindow = ev.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select(col("user_id"), col("value"), col("event_id"))
      .as[(Long, Double, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("TopK handles ties and fewer-than-k groups deterministically") {
    val df = Seq(
      ("a", 1.0, 1L), ("a", 1.0, 2L), ("a", 1.0, 3L), ("a", 2.0, 9L),
      ("b", 5.0, 7L),
    ).toDF("g", "value", "id")
    val got = df.groupBy("g").agg(TopK.topK(3, col("value"), col("id")).as("top"))
      .select(col("g"), col("top"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(got("a") == Seq((2.0, 9L), (1.0, 1L), (1.0, 2L))) // ties: lower id first
    assert(got("b") == Seq((5.0, 7L)))
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin equals plain join on skewed data") {
    // 10k rows of one hot key + a tail
    val left = ((1 to 10000).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val right = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "payload", "name")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val salted = graft.ops.Skew.saltedInnerJoin(left, right, Seq("k"), salts = 8)
      .select("k", "payload", "name")
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("salt actually spreads the hot key across partitions") {
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "payload")
    val salts = left.withColumn(
      "__salt", pmod(xxhash64(struct(left.columns.map(col): _*)), lit(8)).cast("int"))
    assert(salts.select("__salt").distinct().count() == 8)
  }
}

class GraftExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("vec_dot / vec_cosine register via SparkSessionExtensions and run in SQL") {
    // getOrCreate reuses an active session and would skip extensions —
    // detach the shared one first, build a fresh session (same
    // SparkContext) with extensions, restore after.
    val shared = graft.SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b").createOrReplaceTempView("v")
      val row = spark.sql("SELECT vec_dot(a, b) AS d, vec_cosine(a, a) AS c FROM v").head()
      assert(row.getDouble(0) == 32.0)
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
      val err = intercept[Exception](spark.sql("SELECT vec_dot(a) FROM v").collect())
      assert(err.getMessage.toLowerCase.contains("two arguments") ||
        err.getMessage.toLowerCase.contains("vec_dot"))
      // composed text functions reach SQL with the same trees as the
      // Column API
      Seq(Tuple1("the cat sat on the mat and it was happy"))
        .toDF("text").createOrReplaceTempView("t")
      val tr = spark.sql(
        "SELECT graft_token_count(text) AS n, graft_lang_id(text) AS l, " +
          "graft_quality_score(text) AS q, graft_doc_fingerprint(text) AS fp FROM t").head()
      assert(tr.getLong(0) == 10L)
      assert(tr.getString(1) == "en")
      assert(tr.getDouble(2) >= 0.0 && tr.getDouble(2) <= 1.0)
      assert(tr.getString(3).length == 32) // md5 hex
      // 2-arg form: caller-supplied stopword array
      val q2 = spark.sql(
        "SELECT graft_quality_score(text, array('cat', 'mat')) AS q FROM t").head().getDouble(0)
      assert(q2 >= 0.0 && q2 <= 1.0)
      val errQ = intercept[Exception](
        spark.sql("SELECT graft_quality_score(text, text) FROM t").collect())
      assert(errQ.getMessage.toLowerCase.contains("literal") ||
        errQ.getMessage.toLowerCase.contains("stopwords"))
      // CMS merge + point query reach SQL (q196's expressions)
      Seq((1L, 7L), (1L, 7L), (2L, 7L), (2L, 9L)).toDF("g", "u")
        .createOrReplaceTempView("cms_t")
      val cmsRow = spark.sql(
        """SELECT cms_estimate(cms_merge_all(sks), 7L) AS e7,
          |       cms_estimate(cms_merge_all(sks), 9L) AS e9 FROM (
          |  SELECT collect_list(cms) AS sks FROM (
          |    SELECT count_min_sketch(u, 0.001d, 0.99d, 42) AS cms
          |    FROM cms_t GROUP BY g))""".stripMargin).head()
      assert(cmsRow.getLong(0) >= 3L && cmsRow.getLong(1) >= 1L,
        s"CMS SQL path must be one-sided: $cmsRow")
    } finally {
      spark.catalog.dropTempView("v")
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
