package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileQ36 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[p36] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val docs = graft.ops.Tables.documents(spark, sfDir).select("doc_id", "text")
    time("docs.count")(docs.count())
    time("docs.count again")(docs.count())
    val tok = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
    time("tokenize")(tok.count())
    import graft.functions.TextFunctions.langProfiles
    val wordLangs = Seq("en", "de", "fr", "es")
    val sums = wordLangs.map { l =>
      sum(when(col("w").isInCollection(langProfiles(l)), 1).otherwise(0)).as(s"s_$l")
    }
    val wordScores = tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    time("wordScores")(wordScores.count())
    val zh = langProfiles("zh").map(c => when(col("text").contains(c), 1).otherwise(0)).reduce(_ + _)
    val zhScored = docs.select(col("doc_id"), zh.cast("long").as("s_zh"))
    time("zhScored")(zhScored.count())
    val scored = zhScored.join(wordScores, Seq("doc_id"), "left_outer").na.fill(0L, wordLangs.map(l => s"s_$l"))
    time("joined")(scored.count())
    time("langIdDf full")(graft.llm.TextPipeline.langIdDf(docs).count())
    time("langIdDf again")(graft.llm.TextPipeline.langIdDf(docs).count())
    time("q36 full")(graft.llm.LlmQueries.q36.run(spark, sfDir).count())
    time("q36 again")(graft.llm.LlmQueries.q36.run(spark, sfDir).count())
    spark.stop()
  }
}
