package graft.ops

import graft.SparkSpec

/** Every registered query must run on sf0.001 and (except queries whose
  * predicates can legitimately select nothing at the smallest sf) return
  * rows. Deep value correctness is the DuckDB oracle gate
  * (scripts/check_oracle.py at sf0.01); this suite is the fast
  * regression net.
  */
class QueriesSpec extends SparkSpec {

  // q13 filters to a single user and q30/q31 need planted near-dups —
  // at sf0.001 those slices may be empty; running without error is the
  // assertion there. q190's 80-core is scale-dependent by nature: at
  // sf0.001 the co-purchase graph has no 80-embedded subgraph and the
  // empty core IS the answer (the oracle agrees on empty).
  private val mayBeEmpty =
    Set("q13_gap_detection", "q17_anti_join_demote", "q190_kcore_peel")

  Registry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(q.name))
        assert(n > 0, s"${q.name} returned no rows at sf0.001")
    }
  }

  test("SparkEntry contract: entry returns rows; oracleSql keys ⊆ queries keys") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
    val qk = graft.SparkEntry.queries.keySet
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(qk.size == Registry.all.size)
  }

  test("q04 flagship matches a hand-computed slice") {
    import org.apache.spark.sql.functions._
    val df = RelationalQueries.q04.run(spark, sfDir)
    // one deterministic cell: total row count equals lineitem count
    val total = df.agg(sum("n_rows")).head().getLong(0)
    assert(total == Tables.lineitem(spark, sfDir).count())
  }
}
