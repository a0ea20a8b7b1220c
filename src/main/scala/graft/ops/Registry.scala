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

  /** Registered names NOT declared in SURVEY §2.3 (the binding t2
    * list — every query must appear there as a literal `qNN_name`
    * backtick token). Round 6 landed a query in a snapshot commit with
    * no declaration, no spec, and a broken oracle; both `Verify`'s
    * preflight and `RegistryIntegritySpec` call this so an undeclared
    * registration now fails loudly before it can ship. Only an actual
    * §2.3 TABLE ROW (a line starting `| `qNN_name``) counts as a
    * declaration — a narrative backtick mention elsewhere in SURVEY.md
    * does not satisfy the gate.
    */
  def undeclaredIn(surveyText: String): Seq[String] = {
    val declared = surveyText.linesIterator
      .filter(_.startsWith("| `q"))
      .flatMap(l => "`(q[0-9]+_[a-z0-9_]+)`".r.findFirstMatchIn(l).map(_.group(1)))
      .toSet
    all.map(_.name).filterNot(declared)
  }
}
