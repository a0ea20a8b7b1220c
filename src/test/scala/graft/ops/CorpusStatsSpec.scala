package graft.ops

import graft.SparkSpec

/** The footer-derived row count must equal the scan count EXACTLY —
  * it sizes the ANN cell grid (q37/q38/q42/q217/q258/q259/q260), and
  * the DuckDB oracle re-derives the same number with COUNT(*); any
  * divergence desynchronizes the cell geometry between the two sides
  * and the hash-match fails on every intra-cell decision downstream.
  */
class CorpusStatsSpec extends SparkSpec {

  test("footer count equals scan count on every testdata table") {
    for (t <- Seq("embeddings", "documents", "lineitem", "nation")) {
      val scan = Tables.table(spark, sfDir, t).count()
      val footer = CorpusStats.tableRows(spark, sfDir, t)
      assert(footer == scan, s"$t: footer=$footer scan=$scan")
    }
  }

  test("cache serves repeats and a rewrite invalidates (fingerprint key)") {
    val dir = java.nio.file.Files.createTempDirectory("corpus-stats").toString
    val p = s"$dir/t.parquet"
    spark.range(100).write.parquet(p)
    assert(CorpusStats.parquetRows(spark, p) == 100L)
    assert(CorpusStats.parquetRows(spark, p) == 100L) // cached path
    // overwrite with different contents — the (path, len, mtime)
    // fingerprint changes, so the stale 100 must not be served
    Thread.sleep(5) // ensure a distinct mtime granule even on coarse filesystems
    spark.range(37).write.mode("overwrite").parquet(p)
    assert(CorpusStats.parquetRows(spark, p) == 37L)
  }

  test("multi-file tables sum per-file footers") {
    val dir = java.nio.file.Files.createTempDirectory("corpus-stats-mf").toString
    val p = s"$dir/mf.parquet"
    spark.range(1000).repartition(7).write.parquet(p)
    assert(CorpusStats.parquetRows(spark, p) == 1000L)
  }
}
