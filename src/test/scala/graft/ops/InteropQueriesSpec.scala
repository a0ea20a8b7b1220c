package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InteropQueriesSpec extends SparkSpec {

  /** The parquet-direct digest both round-trips must reproduce. */
  private lazy val direct = Tables.orders(spark, sfDir)
    .groupBy("o_orderstatus")
    .agg(
      count(lit(1)).as("n"),
      Exact.dsum("o_totalprice").as("total"),
      max(col("o_orderdate").cast("date")).as("last_date"),
    )
    .orderBy("o_orderstatus")
    .collect().toSeq

  test("q71: CSV round-trip preserves counts, decimal-exact totals, and dates") {
    assert(InteropQueries.q71.run(spark, sfDir).collect().toSeq == direct)
  }

  test("q72: ORC round-trip preserves counts, decimal-exact totals, and dates") {
    assert(InteropQueries.q72.run(spark, sfDir).collect().toSeq == direct)
  }

  test("ORC reads keep column pruning (the property CSV structurally lacks)") {
    val src = Tables.orders(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_prune").toString
    src.write.mode("overwrite").orc(dir)
    val plan = spark.read.schema(src.schema).orc(dir)
      .select("o_orderstatus").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_orderstatus:string>"),
      s"ORC scan must prune to the projected column:\n$plan")
  }
}
