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

  /** S4: schema-enforced JSONL read. FAILFAST surfaces any row not
    * matching the declared field list as a task failure.
    */
  def readJsonl(spark: SparkSession, q: QueryDefinition, path: String): DataFrame =
    spark.read
      .schema(Schemas.payloadSchema(q))
      .option("mode", "FAILFAST")
      .json(path)

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
