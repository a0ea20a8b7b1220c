package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] =
    Components
      .connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("labels every vertex with its component's minimum id") {
    // {1,2,3,4} chained + {10,11} + self-contained {20}
    val got = cc(Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (20L, 20L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("converges on a long path (diameter >> 1) and on cycles") {
    val path = (1L until 12L).map(i => (i, i + 1)) // diameter 11
    val gotPath = cc(path)
    assert(gotPath.values.toSet == Set(1L), s"one component expected: $gotPath")
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 9L), (9L, 7L))
    val gotCycle = cc(cycle)
    assert(gotCycle == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("direction of the input edge list is irrelevant (undirected semantics)") {
    assert(cc(Seq((5L, 1L))) == cc(Seq((1L, 5L))))
  }

  test("non-convergence within maxIter is an explicit error, not a wrong answer") {
    val path = (1L until 30L).map(i => (i, i + 1))
    intercept[IllegalArgumentException](cc(path, maxIter = 2))
  }

  test("reliable-checkpoint mode (Pin.Flag) gives identical answers and writes to the dir") {
    val dir = java.nio.file.Files.createTempDirectory("relckpt").toString
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (7L, 7L))
    val want = cc(edges)
    spark.conf.set(Pin.Flag, "true")
    try {
      // flag without a checkpoint dir: loud refusal, not a silent fallback
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        intercept[IllegalArgumentException](cc(edges))
      sc.setCheckpointDir(dir)
      assert(cc(edges) == want)
      assert(Components
        .connectedComponentsStar(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap == want)
      val ranked = Ranks.withGlobalRank(
        (1L to 100L).toDF("x"), Seq(col("x").desc), "rk")
        .as[(Long, Long)].collect().toMap
      assert(ranked(100L) == 1L && ranked(1L) == 100L)
      // the loops really checkpointed into the reliable dir
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids ++ kids.flatMap(files)
      }
      assert(files(new java.io.File(dir)).exists(_.isFile),
        s"expected checkpoint files under $dir")
    } finally {
      spark.conf.unset(Pin.Flag)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  private def ccStar(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] =
    Components
      .connectedComponentsStar(edges.toDF("a", "b"), "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("star contraction matches min-label propagation on the fixture graphs") {
    val fixtures = Seq(
      Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (20L, 20L)),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 9L), (9L, 7L)),
      Seq((5L, 1L)),
    )
    fixtures.foreach(f => assert(ccStar(f) == cc(f), s"fixture $f"))
  }

  test("star contraction matches propagation on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
      assert(ccStar(edges) == cc(edges, maxIter = 40), s"edges $edges")
    }
  }

  test("star contraction converges on a 300-chain in O(log^2 n) rounds where propagation needs 300") {
    // min-label walks one hop per round: a 300-diameter path needs ~300
    // rounds (maxIter=20 default hard-fails). Star contraction collapses
    // it within a 12-round budget.
    val path = (1L until 301L).map(i => (i, i + 1))
    intercept[IllegalArgumentException](cc(path)) // default maxIter=20 cannot
    val got = ccStar(path, maxIter = 12)
    assert(got.size == 301 && got.values.toSet == Set(1L), s"one component expected")
  }

  test("q76: clusters cover exactly the paired docs; keep_doc IS each cluster's minimum member") {
    val pairs = graft.llm.TextPipeline
      .exactJaccardPairs(
        Tables.documents(spark, sfDir).select("doc_id", "text"), 3, 0.5)
      .select("da", "db")
    val inPairs = pairs.select(explode(array(col("da"), col("db"))).as("d"))
      .distinct().count()
    // ground truth from the label frame itself: per component, the
    // true min member (not a tautology over q76's own aggregates)
    val labels = Components.connectedComponents(pairs, "da", "db")
    val truth = labels.groupBy("comp")
      .agg(min("v").as("true_min"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
      .map { case (comp, tmin, n) => comp -> (tmin, n) }.toMap
    truth.foreach { case (comp, (tmin, _)) =>
      assert(comp == tmin, s"component label $comp must equal its minimum member $tmin")
    }
    val clusters = graft.llm.TrainingDataQueries.q76.run(spark, sfDir).collect()
    assert(clusters.map(_.getAs[Long]("n_docs")).sum == inPairs,
      "every paired doc lands in exactly one cluster")
    clusters.foreach { r =>
      val (keep, n) = (r.getAs[Long]("keep_doc"), r.getAs[Long]("n_docs"))
      assert(truth.get(keep).exists(_._2 == n),
        s"cluster $keep/$n must match the label frame's component ${truth.get(keep)}")
      assert(n >= 2, "pair-derived components have at least two members")
    }
    assert(clusters.length == truth.size, "one output row per component")
  }
}
