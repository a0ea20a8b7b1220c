package graft.tools

import graft.ops.Pin.PinOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Ad-hoc stage profiler for the heavy extension queries.
  * runMain graft.tools.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val docs = graft.ops.Tables.documents(spark, sfDir).select("doc_id", "text")
    time("docs.count")(docs.count())
    val shHof = docs.select(col("doc_id"), explode(TF.wordShingles(col("text"), 3)).as("s"))
    time("shingles (HOF, interp)")(shHof.count())
    val sh = graft.llm.TextPipeline.docShingles(docs)
    time("shingles (relational)")(sh.count())
    val sig = graft.llm.TextPipeline.minHashSignatures(sh, 64)
    time("minhash signatures")(sig.count())
    val banded = graft.llm.TextPipeline.bandKeys(sig, 16, 4)
    time("band keys")(banded.count())
    time("lsh candidates")(
      graft.llm.TextPipeline.lshCandidates(docs, 3, 64, 16, 4).count())
    // prefix-filter (q192) stage anatomy: where do rows/time go, and
    // how does candidate volume compare with the full inverted index
    val shN = graft.llm.TextPipeline.withDocCounts(sh)
    time("exact pair-base (shared-shingle rows)")(
      shN.as("a").join(shN.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")).count())
    time("prefix candidates t=0.8")(
      graft.llm.TextPipeline.prefixCandidates(sh, 0.8).count())
    time("prefix candidates t=0.5")(
      graft.llm.TextPipeline.prefixCandidates(sh, 0.5).count())
    time("q192 full (t=0.8)")(graft.llm.TextPipeline.prefixFilterPairs(docs, 3, 0.8).count())
    // q202 stage anatomy
    val embP = graft.ops.Tables.embeddings(spark, sfDir)
    val covP = graft.llm.SimilarityPipeline.covariance(embP)
    time("pca covariance")(covP.count())
    val covPinned = covP.pinLineage()
    time("pca power iteration x15")(
      graft.llm.SimilarityPipeline.powerIteration(covPinned, 15).count())
    time("pca full (q202)")(graft.llm.SimilarityPipeline.pcaProject(embP, 15).count())
    time("q30 full")(graft.llm.LlmQueries.q30.run(spark, sfDir).count())
    time("q31 full")(graft.llm.LlmQueries.q31.run(spark, sfDir).count())
    time("q32 full")(graft.llm.LlmQueries.q32.run(spark, sfDir).count())
    time("q36 full")(graft.llm.LlmQueries.q36.run(spark, sfDir).count())
    // cascade → components → keep-best chain (q41/q76/q86 cost anatomy);
    // everything ×2 so one-time init (JIT, codegen, ICU) is separable
    // from steady-state cost.
    for (r <- 1 to 2) {
      val pairs = graft.llm.TextPipeline.dedupCascade(docs).select(col("da"), col("db"))
      time(s"dedup cascade (q41 core) #$r")(pairs.count())
      val cached = pairs.pinLineage()
      time(s"components (over cached) #$r")(
        graft.ops.Components.connectedComponents(cached, "da", "db").count())
      time(s"q76 full #$r")(graft.llm.TrainingDataQueries.q76.run(spark, sfDir).count())
      time(s"q86 full #$r")(graft.llm.TrainingDataQueries.q86.run(spark, sfDir).count())
      time(s"q88 full #$r")(graft.llm.CorpusQueries.q88.run(spark, sfDir).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
