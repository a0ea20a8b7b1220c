package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Pin.PinOps
import graft.ops.{QuerySpec, Tables}

/** q189: distributed BPE tokenizer induction — learn byte-pair-encoding
  * merges from the corpus and report the compression curve. The one
  * training-data operator the inventory still lacked: every LLM
  * pipeline INDUCES its tokenizer from (a sample of) the corpus before
  * it can count tokens, pack sequences, or budget mixtures (q33/q70/
  * q173 all assume a tokenizer exists; q189 is where one comes from).
  * Algorithm per Sennrich, Haddow & Birch 2016 ("Neural Machine
  * Translation of Rare Words with Subword Units"): start from
  * characters, repeatedly merge the most frequent adjacent symbol
  * pair.
  *
  * The classic learner runs on the WORD-COUNT table, not the corpus —
  * and that is the whole scale story: the only corpus-sized pass is
  * the word count (map-side combined); every merge round runs on the
  * distinct-word frame, which is Heaps-bounded (the q78 rule — |V| ≈
  * K·N^β, β≈0.5, so the loop's working set grows like √corpus).
  *
  * Determinism: pair statistics are exact integer counts; the best
  * pair is a total order (count DESC, left ASC, right ASC); merge
  * application is ONE builtin left-to-right `replace` per round — no
  * floats anywhere, so a DuckDB oracle hash-pins every round of an
  * iterative algorithm (the q122 fixed-point rule applied to text).
  *
  * The symbol encoding that makes `replace` BE the BPE merge: a word's
  * symbols are single-space-padded and DOUBLE-space separated
  * (" l  o  w "), built by one regexp_replace("(.)", " $1 "). The
  * pattern " x  y " → " xy " then (a) cannot match across a symbol
  * boundary (inner chars of a multi-char symbol are not space-
  * adjacent), and (b) consumes only ONE of the two boundary spaces on
  * each side, so consecutive occurrences " x  y  x  y " both merge in
  * a single left-to-right pass while overlapping runs " a  a  a "
  * merge greedily to [aa, a] — exactly the BPE merge semantics, in
  * one codegen'd string primitive with identical behavior in Spark
  * (UTF8String.replace) and DuckDB (replace): no parity windows, no
  * per-symbol explode in the merge step.
  */
object TokenizerQueries {
  import Tables._

  /** Merge rounds learned/reported. Fixed (the q122 rule) so the
    * output is a pure function of the corpus; production learners run
    * the same loop to a vocab-size budget.
    */
  val Rounds = 5

  private def roundSql(r: Int): String = {
    val prev = if (r == 1) "v0" else s"v${r - 1}"
    // MATERIALIZED: tk/v are each read by multiple consumers per round
    // and the rounds chain — inlined CTEs would re-execute the whole
    // prefix exponentially (the q190 lesson).
    s"tk$r AS MATERIALIZED (SELECT w, cnt, sp, string_split(trim(sp), '  ') AS toks FROM $prev), " +
      s"pc$r AS MATERIALIZED (SELECT toks[i] AS x, toks[i+1] AS y, sum(cnt) AS pc FROM tk$r, " +
      s"(SELECT unnest(generate_series(1, len(toks)-1)) AS i) GROUP BY 1, 2), " +
      s"b$r AS MATERIALIZED (SELECT x, y, pc FROM pc$r ORDER BY pc DESC, x, y LIMIT 1), " +
      s"v$r AS MATERIALIZED (SELECT w, cnt, CASE WHEN x IS NULL THEN sp ELSE " +
      s"replace(sp, ' ' || x || '  ' || y || ' ', ' ' || x || y || ' ') END AS sp " +
      s"FROM tk$r LEFT JOIN b$r ON TRUE), " +
      s"s$r AS (SELECT CAST($r AS BIGINT) AS round, x AS left_sym, y AS right_sym, " +
      s"x || y AS merged, CAST(pc AS BIGINT) AS pair_count, " +
      s"CAST((SELECT sum(cnt * len(string_split(trim(sp), '  '))) FROM v$r) AS BIGINT) " +
      s"AS corpus_tokens_after FROM b$r)"
  }

  /** The learn loop: (final vocab frame (w, cnt, sp), per-round stat
    * rows). Shared by q189 (the curve) and q191 (the applied-symbol
    * inventory).
    */
  private def learn(s: org.apache.spark.sql.SparkSession, d: String)
      : (DataFrame, Seq[DataFrame]) = {
    var vocab = documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("sp", regexp_replace(col("w"), "(.)", " $1 "))
      .pinLineage(eager = true) // the ONLY corpus-sized pass; |V| rows out
    val stats = Seq.newBuilder[DataFrame]
    for (r <- 1 to Rounds) {
      val toks = vocab.withColumn("toks", split(trim(col("sp")), "  "))
      val pairs = toks.where(size(col("toks")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS x, toks[i+1] AS y))"))
          .as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("cnt")).as("pc"))
      // 1-row frame read twice (merge anchor + stat row): pin it so the
      // pairs aggregation runs once per round, not once per consumer.
      val best = pairs.orderBy(desc("pc"), asc("x"), asc("y")).limit(1)
        .pinLineage(eager = true)
      // LEFT join on the 0-or-1-row rule, not a crossJoin: on a fully
      // merged corpus a round learns NOTHING (best is EMPTY) and a
      // cross join would destroy the vocab — the apply surface (q191)
      // must still see the final vocabulary. No merge → sp unchanged,
      // and the round contributes no stats row (below).
      vocab = vocab.join(broadcast(best), lit(true), "left")
        .withColumn("sp", when(col("x").isNull, col("sp")).otherwise(
          expr("replace(sp, ' ' || x || '  ' || y || ' ', ' ' || x || y || ' ')")))
        .select("w", "cnt", "sp")
        .pinLineage(eager = true) // loop hygiene + feeds stats AND next round
      stats += vocab
        .agg(sum(col("cnt") * size(split(trim(col("sp")), "  ")))
          .as("corpus_tokens_after"))
        .crossJoin(best) // 1-row × 1-row
        .select(lit(r.toLong).as("round"), col("x").as("left_sym"),
          col("y").as("right_sym"), concat(col("x"), col("y")).as("merged"),
          col("pc").as("pair_count"), col("corpus_tokens_after"))
    }
    (vocab, stats.result())
  }

  /** The round CTE chain shared by both oracles. */
  private def learnSql: String =
    "WITH w0 AS (SELECT w, count(*) AS cnt FROM " +
      "(SELECT unnest(string_split(text, ' ')) AS w FROM documents) " +
      "WHERE w <> '' GROUP BY 1), " +
      "v0 AS MATERIALIZED (SELECT w, cnt, " +
      "regexp_replace(w, '(.)', ' \\1 ', 'g') AS sp FROM w0), " +
      (1 to Rounds).map(roundSql).mkString(", ")

  // ---------------------------------------------------------------------
  // q189 — one row per merge round: the learned pair, its (weighted,
  // adjacency-counted) frequency when chosen, and the corpus token
  // count after applying it — the compression curve a tokenizer run
  // reports. Note pair_count counts ADJACENCIES (the statistic that
  // ranks candidates, standard BPE) while the token drop reflects
  // APPLIED merges (non-overlapping greedy), so on run-heavy corpora
  // tokens_after falls by less than pair_count — both facts are exact
  // in both engines because both derive from the same strings.
  val q189: QuerySpec = QuerySpec(
    "q189_bpe_merges",
    (s, d) => learn(s, d)._2.reduce(_ unionByName _).orderBy("round"),
    Some(
      learnSql + " " +
        (1 to Rounds).map(r => s"SELECT * FROM s$r").mkString(" UNION ALL ") +
        " ORDER BY round"
    ),
  )

  // ---------------------------------------------------------------------
  // q191 — the APPLY surface: the symbol inventory after the learned
  // merges, with corpus frequencies — the "vocabulary usage" report a
  // tokenizer run prints, and the frequency table a token-budgeting
  // pass (q173) would consume. Tokenizing the corpus with a learned
  // BPE never re-touches documents: a document's tokens are the
  // concatenation of its WORDS' tokenizations, so frequencies come
  // from one explode of the merged vocab frame weighted by word count
  // (at 100 TB the apply path is a broadcast join of the vocab's
  // word→tokens map against the corpus — the learner's output IS the
  // lookup table; here the inventory aggregates on the vocab side
  // alone).
  val q191: QuerySpec = QuerySpec(
    "q191_bpe_token_freq",
    (s, d) =>
      learn(s, d)._1
        .select(col("cnt"), explode(split(trim(col("sp")), "  ")).as("sym"))
        .groupBy("sym").agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), asc("sym")),
    Some(
      learnSql + " " +
        s"SELECT sym, CAST(sum(cnt) AS BIGINT) AS freq FROM " +
        s"(SELECT cnt, unnest(string_split(trim(sp), '  ')) AS sym FROM v$Rounds) " +
        "GROUP BY 1 ORDER BY freq DESC, sym"
    ),
  )

  /** The corpus-side apply path: tokenize `docs` (doc_id, text) with a
    * learned vocab frame — [[learn]]'s (w, sp) output, or any frame
    * with a word column and its double-space-encoded tokenization.
    * BPE tokenization is word-local, so this is ONE broadcast join of
    * the Heaps-bounded word→tokens map against the exploded corpus —
    * the corpus never shuffles; per-doc reassembly orders by word
    * position (deterministic, no window).
    *
    * Out-of-vocabulary words (the reason an apply path exists at all —
    * tokenizing NEW documents with a frozen tokenizer) fall back to
    * character symbols, the same base encoding the learner starts
    * from; production BPE appliers additionally replay the merge list
    * on OOV words, which is a per-word map-side loop over the (tiny,
    * broadcast) merge table.
    *
    * @return (doc_id, tokens array<string>, n_tokens)
    */
  def tokenize(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .where(col("w") =!= "")
    words
      .join(broadcast(vocab.select(col("w"), col("sp"))), Seq("w"), "left")
      .withColumn("sp",
        coalesce(col("sp"), regexp_replace(col("w"), "(.)", " $1 ")))
      .select(col("doc_id"), col("pos"), split(trim(col("sp")), "  ").as("wt"))
      .groupBy("doc_id")
      .agg(flatten(expr("transform(sort_array(collect_list(struct(pos, wt))), x -> x.wt)"))
        .as("tokens"))
      .select(col("doc_id"), col("tokens"), size(col("tokens")).cast("long").as("n_tokens"))
  }

  val all: Seq[QuerySpec] = Seq(q189, q191)
}
