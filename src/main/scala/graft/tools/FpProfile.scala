package graft.tools

import graft.ops.Pin.PinOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.llm.SimilarityPipeline

/** Stage profiler for the fixed-point PCA family (q202/q224): which
  * pass dominates — quantize, centering, scatter, power rounds,
  * projection, normalization, grid decision?
  * runMain graft.tools.FpProfile [sfDir]
  */
object FpProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[fp-profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val emb = graft.ops.Tables.embeddings(spark, sfDir)
    time("emb.count")(emb.count())
    val fp = emb
      .select(col("vec_id"), VectorFunctions.quantizeFp(col("embedding"), 10000000L).as("q"))
    time("quantizeFp (HOF)")(fp.count())
    val fpP = fp.pinLineage()
    time("pin fp")(fpP.count())

    // q202 stages
    val el = fpP.select(col("vec_id"), posexplode(col("q")).as(Seq("i", "x")))
    val mean = el.groupBy("i")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .select(col("i"),
        when(col("s") < 0, -expr("(-s) div n")).otherwise(expr("s div n")).as("m"))
    val marr = mean.agg(
      expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)").as("marr"))
    time("means")(marr.count())
    val cfp = fpP.crossJoin(broadcast(marr))
      .select(col("vec_id"), zip_with(col("q"), col("marr"), (x, mm) => x - mm).as("c"))
    time("centering (zip_with)")(cfp.count())
    val cfpP = cfp.pinLineage()
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val a0 = cfpP
      .select(col("c"), posexplode(col("c")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("c")).as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg(sum((col("xi") * col("xj")).cast(dec38)).as("a0"))
    time("scatter (double posexplode)")(a0.count())
    time("topTwoAxesFp full")(SimilarityPipeline.topTwoAxesFp(fpP, 8).count())
    val axes = SimilarityPipeline.topTwoAxesFp(fpP, 8).pinLineage()
    time("projectFpOnAxes")(SimilarityPipeline.projectFpOnAxes(fpP, axes).count())
    time("q202 full")(graft.llm.LlmQueries.q202.run(spark, sfDir).count())

    // q224 stages
    val fpNorm = SimilarityPipeline.l2NormalizeFp(fpP, 10000000L)
    time("l2NormalizeFp (explode+join)")(fpNorm.count())
    val fpNormP = fpNorm.pinLineage()
    val axesN = SimilarityPipeline.topTwoAxesFp(fpNormP, 6).pinLineage()
    time("axes on normalized (6 iters)")(axesN.count())
    val cells = SimilarityPipeline.gridCellsFp(fpNormP, axesN, 4, 5)
    time("gridCellsFp")(cells.count())
    val cellsP = cells.pinLineage()
    time("gridImpliedCandidatesFp")(SimilarityPipeline.gridImpliedCandidatesFp(cellsP))
    time("q224 full")(graft.llm.LlmQueries.q224.run(spark, sfDir).count())

    // q224 ANN-fallback anatomy — the branch every 64×+ replica takes
    // (the grid histogram implies >> budget·N candidates there). Which
    // stage owns the time: the banded candidate join, the distinct, the
    // codegen'd verify dots, or the decimal(38) threshold filter?
    val n = emb.count()
    val bits = SimilarityPipeline.cellBits(n)
    val cellsPort = SimilarityPipeline.withCellsPortable(emb, bits)
      .select(col("vec_id"), col("cell"))
    time("fallback: cells")(cellsPort.count())
    val banded = cellsPort.select(
      col("vec_id"),
      explode(array((0 until bits).map(b =>
        struct(lit(b).as("m"), col("cell").bitwiseAND(lit(~(1L << b))).as("key"))): _*)).as("bk"))
      .select(col("vec_id"), col("bk.m").as("m"), col("bk.key").as("key"))
    val candRaw = banded.as("a")
      .join(banded.as("b"),
        col("a.m") === col("b.m") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
    time("fallback: banded collisions")(candRaw.count())
    time("fallback: distinct candidates")(candRaw.distinct().count())
    val pv = SimilarityPipeline.portableVerifiedPairs(emb, bits, 64, lit(true))
    time("fallback: verified pairs")(pv.count())
    val pvP = pv.pinLineage()
    pvP.count() // pin before timing the filter alone
    time("fallback: decimal filter (pinned)")(
      pvP.where(col("dot_fp") >= 0 &&
        expr("cast(dot_fp as decimal(38,0)) * dot_fp * 25 >= " +
          "cast(na as decimal(38,0)) * nb * 16")).count())
    time("fallback: int128 filter (pinned)")(
      pvP.where(col("dot_fp") >= 0 &&
        VectorFunctions.prodCmp3(col("dot_fp"), col("dot_fp"), 25L,
          col("na"), col("nb"), 16L) >= 0).count())

    spark.stop()
  }
}
