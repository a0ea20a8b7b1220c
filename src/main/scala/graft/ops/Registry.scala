package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single registry of every verifiable query the engine ships.
  * `SparkEntry` (the driver contract) is a thin view over this.
  */
object Registry {
  val all: Seq[QuerySpec] =
    RelationalQueries.all ++ graft.llm.LlmQueries.all ++ AnalyticQueries.all ++
      graft.llm.TrainingDataQueries.all ++ InteropQueries.all ++
      ScaleQueries.all ++ graft.llm.CorpusQueries.all ++ SubqueryQueries.all ++
      TimeSeriesQueries.all ++ SketchQueries.all ++ GraphQueries.all ++
      graft.llm.RetrievalQueries.all ++ StatQueries.all ++
      graft.warehouse.CatalogQueries.all ++ graft.llm.TokenizerQueries.all

  val byName: Map[String, QuerySpec] = ListMap(all.map(q => q.name -> q): _*)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(all.map(q => q.name -> q.run): _*)

  def oracleSql: Map[String, String] =
    ListMap(all.flatMap(q => q.oracle.map(q.name -> _)): _*)
}
