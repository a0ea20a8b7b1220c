package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{QueryDefinition, Schemas}

/** Payload format support mirroring the reference contract:
  *
  *  - the reference's raw payload is JSONL (raw_sink_contract.md:30,
  *    S4 `iter_payload_rows`); [[readJsonl]] reads it with the
  *    config-declared schema in FAILFAST mode, reproducing the
  *    reference's crash-on-missing-field semantics (spec.md:42 — a
  *    missing declared field fails the run rather than null-filling);
  *  - parquet is this engine's native format (columnar, pruned,
  *    pushdown) — the RawSink writes it; JSONL remains for interop
  *    with reference-produced partitions.
  */
object PayloadReader {

  /** S4: schema-enforced JSONL read. FAILFAST surfaces *malformed*
    * records as a task failure — but Spark's JSON reader silently
    * null-fills a well-formed record that simply lacks a declared
    * field (`nullable = false` is not enforced on file reads), which
    * would diverge from the reference's crash-on-missing-field
    * semantics. So a per-declared-column `assert_true` FILTER is
    * appended: a filter predicate must be evaluated for every row
    * (unlike a projection wrapper, it survives column pruning under
    * `count()`-style queries), stays lazy/distributed/codegen'd, and
    * costs no extra pass over the data. `assert_true` yields null when
    * the condition holds, so `coalesce(_, true)` keeps every valid row.
    */
  def readJsonl(spark: SparkSession, q: QueryDefinition, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{assert_true, coalesce, col, lit}
    val schema = Schemas.payloadSchema(q)
    val raw = spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)
    schema.fields.filterNot(_.nullable).foldLeft(raw) { (df, f) =>
      df.filter(coalesce(
        assert_true(col(f.name).isNotNull,
          lit(s"FAILFAST: declared field '${f.name}' is missing/null in payload at $path")),
        lit(true)))
    }
  }

  /** K6 — sink factory (raw_sink_factory.py:13-33): backend choice is
    * config, not code. In Spark the backend IS the path scheme
    * (file:// vs s3a:// vs hdfs://) — one code path, scheme-specific
    * Hadoop FileSystem underneath; `RAW_SINK_ROOT` plays the role of
    * the reference's `RAW_SINK` + bucket settings.
    */
  def sinkFor(spark: SparkSession, env: Map[String, String] = sys.env): RawSink = {
    val root = env.getOrElse("RAW_SINK_ROOT",
      throw new IllegalArgumentException("RAW_SINK_ROOT is required (file:///… or s3a://…)"))
    new RawSink(spark, root)
  }
}
