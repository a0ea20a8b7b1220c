package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Pin.PinOps
import graft.ops.QuerySpec
import graft.ops.Tables._

/** q88/q89: corpus-maintenance operators — incremental (new-batch vs
  * base-corpus) near-dup detection, and intra-document repetition
  * metrics (the Gopher-style boilerplate/keyword-spam signal).
  *
  * q88 is the OPERATIONAL form of dedup at 100 TB: a corpus is never
  * deduped once — batches arrive, and each batch must be checked
  * against the accumulated base without re-pairing the base against
  * itself. q89 is the quality gate that runs BEFORE any corpus-level
  * dedup: a document that repeats itself is spam/boilerplate
  * regardless of whether anything else in the corpus matches it.
  */
object CorpusQueries {

  /** Deterministic batch assignment (the q65 hash-split discipline):
    * ~75% of docs are the accumulated "base" corpus, ~25% the
    * "incoming" batch ('c0' = 192/256). A pure function of doc_id so
    * both engines and every re-run agree.
    */
  private def incomingCol = // true ⇒ the doc is in the incoming batch
    substring(md5(concat(lit("graft-batch:"), col("doc_id").cast("string"))), 1, 2) >= "c0"

  private val incomingSql =
    "substring(md5('graft-batch:' || CAST(doc_id AS VARCHAR)), 1, 2) >= 'c0'"

  // ---------------------------------------------------------------------
  // q88 — incremental near-dup: which INCOMING docs are ≥0.5-Jaccard
  // similar to some BASE doc. The cascade's geometry (64 minhashes,
  // 16×4 banding — the q41/q76 lesson) but with the band join keyed
  // new×old instead of self: candidates are (incoming, base) pairs
  // only — base×base pairs, the quadratic bulk every batch run must
  // NOT pay for again, never materialize. Exact shingle-Jaccard then
  // verifies candidates, so the output is exact modulo banding recall
  // (measured 100% on the test corpora — dups here sit at j ≥ 0.8
  // where 16×4 recall is 0.9998; the oracle pins it).
  //
  // Scale: the base side's shingles/signatures are O(base) to build —
  // in production they are the PERSISTED output of the last run (the
  // ledger pattern: signatures are append-only state, not recompute),
  // so a batch run costs O(batch · bands) shuffle + the candidate
  // verifies. Nothing here is all-pairs; the join fans out only where
  // band buckets collide across the split.
  val q88: QuerySpec = QuerySpec(
    "q88_incremental_dedup",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      TextPipeline
        .incrementalCascade(docs.where(!incomingCol), docs.where(incomingCol))
        .select(col("incoming_doc"), col("base_doc"), round(col("jac"), 4).as("jaccard"))
        .orderBy("incoming_doc", "base_doc")
    },
    Some(
      s"WITH w AS (SELECT doc_id, $incomingSql AS incoming, string_split(text, ' ') AS ws FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, incoming, s FROM (" +
        "SELECT doc_id, incoming, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s " +
        "FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t) WHERE s IS NOT NULL), " +
        "cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
        "pairs AS (SELECT b.doc_id AS incoming_doc, a.doc_id AS base_doc, count(*) AS common " +
        "FROM sh a JOIN sh b ON a.s = b.s WHERE NOT a.incoming AND b.incoming GROUP BY 1, 2) " +
        "SELECT incoming_doc, base_doc, " +
        "round(common * 1.0 / (ca.n + cb.n - common), 4) AS jaccard " +
        "FROM pairs JOIN cnt ca ON ca.doc_id = base_doc JOIN cnt cb ON cb.doc_id = incoming_doc " +
        "WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5 " +
        "ORDER BY incoming_doc, base_doc"
    ),
  )

  // ---------------------------------------------------------------------
  // q89 — repetition metrics (Gopher-rule shape): per source, how many
  // docs exceed the top-2-gram-share gate (most frequent bigram > 8%
  // of the doc's bigrams — keyword-stuffing) or the duplicate-3-gram
  // gate (> 30% of trigram occurrences are repeats — template/
  // boilerplate), plus the corpus-level ratios.
  //
  // Determinism rules: BOTH gates evaluate in pure 64-bit integer
  // arithmetic (100·top2 > 8·n2; 10·dup3 > 3·total3) — no float
  // threshold can flake at a rounding boundary, in either engine. The
  // corpus ratios are single divisions of exact integer sums, rounded
  // once (the q79 lesson).
  //
  // Scale: grams explode executor-local (q69's rule); both gram
  // aggregations key on (doc_id, gram) — uniform, map-side combined —
  // then collapse to one row per doc before the per-source rollup.
  // Memory is bounded by one doc's grams; nothing is all-pairs,
  // nothing leaves the doc's partition until counts are per-doc rows.
  val q89: QuerySpec = QuerySpec(
    "q89_repetition_metrics",
    (s, d) => {
      val toks = documents(s, d)
        .where(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      val g2 = toks
        .select(col("doc_id"), explode(sequence(lit(1), size(col("ws")) - 1)).as("i"), col("ws"))
        .select(col("doc_id"),
          concat_ws(" ", element_at(col("ws"), col("i")), element_at(col("ws"), col("i") + 1)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("top2"), sum(col("c")).as("n2"))
      val g3 = toks
        .select(col("doc_id"), explode(sequence(lit(1), size(col("ws")) - 2)).as("i"), col("ws"))
        .select(col("doc_id"),
          concat_ws(" ", element_at(col("ws"), col("i")), element_at(col("ws"), col("i") + 1),
            element_at(col("ws"), col("i") + 2)).as("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("total3"), countDistinct(col("g")).as("distinct3"))
      toks.select("doc_id", "source")
        .join(g2, Seq("doc_id"))
        .join(g3, Seq("doc_id"))
        .withColumn("dup3", col("total3") - col("distinct3"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(lit(100) * col("top2") > lit(8) * col("n2"), 1L).otherwise(0L)).as("n_top2_flagged"),
          sum(when(lit(10) * col("dup3") > lit(3) * col("total3"), 1L).otherwise(0L)).as("n_dup3_flagged"),
          round(sum(col("top2")).cast("double") / sum(col("n2")), 6).as("corpus_top2_share"),
          round(sum(col("dup3")).cast("double") / sum(col("total3")), 6).as("corpus_dup3_frac"),
        )
        .orderBy("source")
    },
    Some(
      "WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 3), " +
        "g2 AS (SELECT doc_id, max(c) AS top2, CAST(sum(c) AS BIGINT) AS n2 FROM (" +
        "SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g, count(*) AS c FROM toks, " +
        "LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) t GROUP BY 1, 2) GROUP BY 1), " +
        "g3 AS (SELECT doc_id, count(*) AS total3, count(DISTINCT g) AS distinct3 FROM (" +
        "SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g FROM toks, " +
        "LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t) GROUP BY 1) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN 100 * top2 > 8 * n2 THEN 1 ELSE 0 END) AS BIGINT) AS n_top2_flagged, " +
        "CAST(sum(CASE WHEN 10 * (total3 - distinct3) > 3 * total3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup3_flagged, " +
        "round(CAST(sum(top2) AS DOUBLE) / sum(n2), 6) AS corpus_top2_share, " +
        "round(CAST(sum(total3 - distinct3) AS DOUBLE) / sum(total3), 6) AS corpus_dup3_frac " +
        "FROM toks JOIN g2 USING (doc_id) JOIN g3 USING (doc_id) " +
        "GROUP BY 1 ORDER BY source"
    ),
  )

  // ---------------------------------------------------------------------
  // q91 — distinctive-term extraction: each document's rarest token
  // (minimum corpus document-frequency; ties to the lexicographically
  // smallest token). The deterministic analog of max-tf-idf keyword
  // extraction: idf is monotone-decreasing in df, so argmax(idf) ≡
  // argmin(df) — WITHOUT computing a logarithm, which is exactly the
  // term the q79 lift lesson forbids in an oracle-checked result
  // (libm vs JVM differ in the last ulp; an argmax over floats flakes
  // at ties the integer argmin cannot).
  //
  // Scale: distinct (doc, token) explode; one token-keyed count
  // (uniform keys, map-side combined); the df join back is token-keyed
  // equijoin; the per-doc argmin is a row_number window partitioned by
  // doc — bounded by tokens-per-doc, never global.
  val q91: QuerySpec = QuerySpec(
    "q91_distinctive_terms",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tok = documents(s, d)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
        .where(col("w") =!= "")
        .distinct()
      val dfreq = tok.groupBy("w").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(col("df"), col("w"))
      tok.join(dfreq, Seq("w"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("w").as("term"), col("df"))
        .orderBy("doc_id")
    },
    Some(
      "WITH tok AS (SELECT DISTINCT doc_id, w FROM (" +
        "SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents) WHERE w <> ''), " +
        "dfreq AS (SELECT w, count(*) AS df FROM tok GROUP BY 1), " +
        "r AS (SELECT doc_id, w, df, row_number() OVER (PARTITION BY doc_id ORDER BY df, w) AS rn " +
        "FROM tok JOIN dfreq USING (w)) " +
        "SELECT doc_id, w AS term, df FROM r WHERE rn = 1 ORDER BY doc_id"
    ),
  )

  // ---------------------------------------------------------------------
  // q92 — per-label embedding centroids: mean vector per label, one
  // row per (label, dim). The class-prototype computation behind
  // centroid classifiers, cluster drift monitoring, and the k-means
  // seeding the q42 quantizer uses.
  //
  // Determinism (§7.0): float sums are order-dependent, so elements
  // are fixed-pointed FIRST — round(val·10⁷) as int64 — and the
  // centroid is one exact integer sum divided once. float→double is
  // exact, the ·10⁷ product is the same IEEE double in both engines,
  // both round half-away-from-zero ⇒ identical integers everywhere.
  // ~7 significant digits is also all a float HAD: nothing real is
  // lost, and in exchange the aggregation is shuffle-order-proof.
  //
  // Scale: posexplode is executor-local; the groupBy key space is
  // labels × dims (640 here) regardless of corpus size — partials
  // map-side combine to a constant-size shuffle. This is the rare
  // aggregation whose shuffle volume does NOT grow with data.
  val CentroidScale = 10000000L // 1e7: full float precision, no more
  val q92: QuerySpec = QuerySpec(
    "q92_embedding_centroids",
    (s, d) =>
      embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim0", "v")))
        .select(
          col("label"), (col("dim0") + 1).cast("long").as("dim"),
          round(col("v").cast("double") * CentroidScale).cast("long").as("si"))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), sum(col("si")).as("ssum"))
        .select(
          col("label"), col("dim"), col("n"),
          round(col("ssum").cast("double") / (col("n") * CentroidScale), 6).as("centroid"))
        .orderBy("label", "dim"),
    Some(
      "SELECT label, CAST(i AS BIGINT) AS dim, count(*) AS n, " +
        s"round(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * $CentroidScale) AS BIGINT)) " +
        s"* 1.0 / (count(*) * $CentroidScale), 6) AS centroid " +
        "FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t " +
        "GROUP BY 1, 2 ORDER BY label, dim"
    ),
  )

  // ---------------------------------------------------------------------
  // q98 — end-to-end survivorship: raw corpus → q44's clean gates
  // (exact dedup keep-first, length, stopword mass) → near-dup
  // clustering over the SURVIVORS (cascade + connected components) →
  // keep-best (q86's rule). One row per source with the funnel counts
  // — the "what did the pipeline actually keep" report every
  // training-data run publishes, composed from the same single-source
  // building blocks the stage queries use ([[LlmQueries.cleanDocs]] /
  // `cleanCteSql`, [[TextPipeline.dedupCascade]],
  // [[graft.ops.Components]]).
  //
  // Scale: the gates drop data before the cascade pays for it (the
  // q44 rule); the cascade/components path is the q41/q76 shape over
  // the smaller clean set; the three per-source counts are tiny
  // grouped aggregates left-joined (sources with zero survivors keep
  // a row via coalesce, not a silent drop).
  val q98: QuerySpec = QuerySpec(
    "q98_corpus_survivorship",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
      // reused by the cascade, keep-best join, and two counts
      val clean = LlmQueries.cleanDocs(s, d)
        .select("doc_id", "text", "source", "n_chars")
        .pinLineage()
      val edges = TextPipeline.dedupCascade(clean.select("doc_id", "text"))
        .select(col("da"), col("db"))
      val comp = graft.ops.Components.connectedComponents(edges, "da", "db")
      val w = Window.partitionBy("comp").orderBy(col("n_chars").desc, col("v"))
      val drops = comp
        .join(clean.select(col("doc_id").as("v"), col("n_chars")), Seq("v"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") > 1)
        .select(col("v").as("doc_id"))
      val fin = clean.join(drops, Seq("doc_id"), "left_anti")
      docs.groupBy("source").agg(count(lit(1)).as("n_raw"))
        .join(clean.groupBy("source").agg(count(lit(1)).as("n_clean")), Seq("source"), "left_outer")
        .join(fin.groupBy("source").agg(count(lit(1)).as("n_final")), Seq("source"), "left_outer")
        .select(
          col("source"), col("n_raw"),
          coalesce(col("n_clean"), lit(0L)).as("n_clean"),
          coalesce(col("n_final"), lit(0L)).as("n_final"))
        .orderBy("source")
    },
    Some(
      s"WITH RECURSIVE ${LlmQueries.cleanCteSql}, " +
        "cw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM clean), " +
        "csh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, " +
        "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM cw, " +
        "LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t) WHERE s IS NOT NULL), " +
        "ccnt AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY 1), " +
        "cpairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common FROM csh a " +
        "JOIN csh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "cp AS (SELECT da, db FROM cpairs JOIN ccnt ca ON ca.doc_id = da " +
        "JOIN ccnt cb ON cb.doc_id = db WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5), " +
        "ce AS (SELECT da AS a, db AS b FROM cp UNION ALL SELECT db, da FROM cp), " +
        "creach(v, u) AS (SELECT a, a FROM ce UNION SELECT ce.b, r.u FROM ce JOIN creach r ON ce.a = r.v), " +
        "ccomp AS (SELECT v, min(u) AS comp FROM creach GROUP BY 1), " +
        "ranked AS (SELECT comp, v, row_number() OVER (PARTITION BY comp " +
        "ORDER BY n_chars DESC, v) AS rk FROM ccomp JOIN clean ON doc_id = v), " +
        "drops AS (SELECT v AS doc_id FROM ranked WHERE rk > 1), " +
        "fin AS (SELECT * FROM clean WHERE doc_id NOT IN (SELECT doc_id FROM drops)), " +
        "raw AS (SELECT source, count(*) AS n_raw FROM documents GROUP BY 1), " +
        "ncl AS (SELECT source, count(*) AS n_clean FROM clean GROUP BY 1), " +
        "nfin AS (SELECT source, count(*) AS n_final FROM fin GROUP BY 1) " +
        "SELECT r.source, n_raw, CAST(coalesce(n_clean, 0) AS BIGINT) AS n_clean, " +
        "CAST(coalesce(n_final, 0) AS BIGINT) AS n_final " +
        "FROM raw r LEFT JOIN ncl USING (source) LEFT JOIN nfin USING (source) ORDER BY r.source"
    ),
  )

  // ---------------------------------------------------------------------
  // q99 — containment pairs: |A∩B|/|A| over shingle sets, both
  // directions, pairs clearing 0.8 either way. Jaccard (q30) misses
  // subset duplication — a paragraph quoted inside a much larger doc
  // scores low Jaccard but containment ≈ 1 — and training corpora are
  // full of exactly that. Completes the dedup family's measure set:
  // exact hash (q25), Jaccard (q30), estimated Jaccard (q31), SimHash
  // (q32), embedding cosine (q38), edit distance (q55), containment.
  //
  // Thresholds compare UNROUNDED ratios in both engines (the q79
  // rule); reported values round to 4. Scale: the q30 inverted-index
  // caveat applies verbatim — at corpus scale run it over LSH
  // candidates (a contained doc shares ALL its shingles, so banding
  // recovers containment pairs even better than borderline-Jaccard
  // ones).
  val q99: QuerySpec = QuerySpec(
    "q99_containment_pairs",
    (s, d) =>
      TextPipeline
        .containmentPairs(documents(s, d).select("doc_id", "text"), 3, 0.8)
        .select(
          col("da"), col("db"),
          round(col("cont_a_in_b"), 4).as("cont_a_in_b"),
          round(col("cont_b_in_a"), 4).as("cont_b_in_a"))
        .orderBy("da", "db"),
    Some(
      s"WITH ${LlmQueries.shinglePairsCteSql} " +
        "SELECT da, db, round(common * 1.0 / ca.n, 4) AS cont_a_in_b, " +
        "round(common * 1.0 / cb.n, 4) AS cont_b_in_a " +
        "FROM pairs JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db " +
        "WHERE common * 1.0 / ca.n >= 0.8 OR common * 1.0 / cb.n >= 0.8 " +
        "ORDER BY da, db"
    ),
  )

  // ---------------------------------------------------------------------
  // q111 — containment pairs, the SCALE plan: identical semantics and
  // oracle to q99, but candidates come from rare-shingle blocking
  // ([[TextPipeline.containmentBlocked]], maxDf = 5) instead of the
  // exact inverted-index self-join. q99 is the verify-stage anchor
  // (O(Σ df²) by design — the hot boilerplate shingles flood its
  // join); this is the form a user runs at corpus scale: candidate
  // volume is capped at maxDf · |rare shingles| no matter how hot the
  // corpus's common shingles get, and the exact containment verify on
  // candidates reproduces q99's answer bit-for-bit (the q30→q41
  // precedent — the oracle hash IS the parity proof).
  //
  // Recall: a pair at containment ≥ 0.8 shares ≥ 80% of the smaller
  // doc's shingles; missing it requires EVERY shared shingle to have
  // df > 5 — boilerplate-only overlap, which q89's repetition gates
  // kill upstream. Parity is additionally spec-pinned on fixtures
  // engineered to stress the cap.
  val q111: QuerySpec = QuerySpec(
    "q111_containment_blocked",
    (s, d) =>
      TextPipeline
        .containmentBlocked(documents(s, d).select("doc_id", "text"), 3, 0.8, maxDf = 5)
        .select(
          col("da"), col("db"),
          round(col("cont_a_in_b"), 4).as("cont_a_in_b"),
          round(col("cont_b_in_a"), 4).as("cont_b_in_a"))
        .orderBy("da", "db"),
    Some(
      s"WITH ${LlmQueries.shinglePairsCteSql} " +
        "SELECT da, db, round(common * 1.0 / ca.n, 4) AS cont_a_in_b, " +
        "round(common * 1.0 / cb.n, 4) AS cont_b_in_a " +
        "FROM pairs JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db " +
        "WHERE common * 1.0 / ca.n >= 0.8 OR common * 1.0 / cb.n >= 0.8 " +
        "ORDER BY da, db"
    ),
  )

  // ---------------------------------------------------------------------
  // q192 — near-dup pairs at the high-precision threshold (0.8), the
  // LOSSLESS scale plan: same semantics as q30's exact operator run
  // at 0.8, but candidates come from prefix-filtering
  // ([[TextPipeline.prefixFilterPairs]], the AllPairs/PPJoin family)
  // instead of the full inverted-index self-join. Where q41's LSH
  // banding trades recall geometry for candidate economy (0.9998 at
  // j = 0.8 — probable, not guaranteed), the prefix filter's recall
  // is 1.0 BY CONSTRUCTION at every j ≥ t — the rare-first prefixes
  // of any ≥t pair must share their smallest common shingle — so
  // this is the form to run when pairs AT the threshold are
  // must-keeps and no banding geometry suffices. The hash match
  // against the exact-family SQL is simultaneously the correctness
  // proof and the recall proof.
  //
  // Scale: prefixes are |A| − ⌈0.8·|A|⌉ + 1 ≈ a fifth of each doc,
  // and the rare-first order fills them with the LOW-df end of the
  // vocabulary — hot boilerplate shingles land in suffixes and never
  // generate a candidate (candidate volume is Σ df² over prefix
  // shingles; spec-pinned on a planted-boilerplate corpus where the
  // inverted index floods and the prefix join doesn't). Verify ships
  // each doc's hashed shingle set once per candidate and intersects
  // executor-locally — no per-candidate fanout through the shingle
  // table.
  val q192: QuerySpec = QuerySpec(
    "q192_prefix_filter_pairs",
    (s, d) =>
      TextPipeline
        .prefixFilterPairs(documents(s, d).select("doc_id", "text"), 3, 0.8)
        .select(col("da"), col("db"), round(col("jac"), 4).as("jaccard"))
        .orderBy("da", "db"),
    Some(
      s"WITH ${LlmQueries.shinglePairsCteSql} " +
        "SELECT da, db, round(common * 1.0 / (ca.n + cb.n - common), 4) AS jaccard " +
        "FROM pairs JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db " +
        "WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8 ORDER BY da, db"
    ),
  )

  // ---------------------------------------------------------------------
  // q195 — Gopher-style quality rule table (Rae et al. 2021 §A1.1):
  // the composed document-quality GATE, distinct from q34's raw
  // signals — each named rule is a boolean a filtering pipeline
  // thresholds on, and the per-doc flag vector (not just the final
  // verdict) is what a corpus audit needs to see to know WHY a doc
  // was dropped. Rules (bounds adapted to this corpus's scale):
  // r_len (word count in [20, 1000]), r_mwl (mean word length in
  // [3, 10]), r_stop (≥ 2 distinct common stopwords — the Gopher
  // "stop word" gibberish guard), r_rep (top-word frequency ≤ 1/8 —
  // the repetition guard, q89's signal as a gate). All integer/
  // boolean arithmetic except mean word length, which is one
  // int-by-int IEEE division — bit-identical across engines.
  //
  // Scale: one (doc_id, word) count (uniform keys, map-side
  // combined), one per-doc fold — the q103 shape; booleans compute
  // codegen'd from the fold's integers. No joins, no windows.
  /** Per-doc Gopher rule table: (doc_id, n_words, r_len, r_mwl,
    * r_stop, r_rep, pass). The SINGLE implementation of the quality
    * gate — q195 serves it directly, q211 calibrates against its
    * `pass` column, so a threshold edit can never silently diverge
    * between the gate and its calibration.
    */
  private def gopherRuleTable(s: SparkSession, d: String): DataFrame = {
    val stops = Seq("the", "a", "of", "and", "to")
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum(col("c")).as("n_words"),
        max(col("c")).as("top_c"),
        (sum(length(col("w")) * col("c")).cast("double") / sum(col("c"))).as("mwl"),
        count(when(col("w").isInCollection(stops), 1)).as("n_stop"),
      )
      .select(
        col("doc_id"),
        col("n_words"),
        (col("n_words") >= 20 && col("n_words") <= 1000).as("r_len"),
        (col("mwl") >= 3.0 && col("mwl") <= 10.0).as("r_mwl"),
        (col("n_stop") >= 2).as("r_stop"),
        (col("top_c").cast("double") / col("n_words") <= 0.125).as("r_rep"),
      )
      .withColumn("pass", col("r_len") && col("r_mwl") && col("r_stop") && col("r_rep"))
  }

  /** Shared token-stream CTE both gate and classifier SQL build on. */
  private val docTokCteSql: String =
    "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)"

  /** DuckDB CTEs mirroring [[gopherRuleTable]]: defines `gop(doc_id,
    * n_words, r_len, r_mwl, r_stop, r_rep, pass)`. Requires
    * [[docTokCteSql]] earlier in the WITH list. Kept beside the Spark
    * builder for the same single-source reason.
    */
  private val gopherRuleCteSql: String =
    "cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2), " +
      "gd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS top_c, " +
      "sum(length(w) * c) * 1.0 / sum(c) AS mwl, " +
      "count(CASE WHEN w IN ('the', 'a', 'of', 'and', 'to') THEN 1 END) AS n_stop " +
      "FROM cnt GROUP BY 1), " +
      "gop AS (SELECT doc_id, n_words, n_words >= 20 AND n_words <= 1000 AS r_len, " +
      "mwl >= 3.0 AND mwl <= 10.0 AS r_mwl, n_stop >= 2 AS r_stop, " +
      "top_c * 1.0 / n_words <= 0.125 AS r_rep, " +
      "(n_words >= 20 AND n_words <= 1000) AND (mwl >= 3.0 AND mwl <= 10.0) " +
      "AND n_stop >= 2 AND top_c * 1.0 / n_words <= 0.125 AS pass FROM gd)"

  val q195: QuerySpec = QuerySpec(
    "q195_gopher_rules",
    (s, d) => gopherRuleTable(s, d).orderBy("doc_id"),
    Some(
      s"WITH $docTokCteSql, $gopherRuleCteSql " +
        "SELECT doc_id, n_words, r_len, r_mwl, r_stop, r_rep, pass FROM gop ORDER BY doc_id"
    ),
  )

  // ---------------------------------------------------------------------
  // q197 — quality-classifier APPLY: score every document with a
  // trained linear text classifier (the fastText-style bag-of-words
  // shape every corpus pipeline runs after its heuristic gates). The
  // model — (token, µ-weight) rows plus a bias — is a TABLE, not
  // code: scoring is one broadcast left-join of the exploded token
  // stream against the model and a per-doc sum. Weights are integer
  // MICRO-units so the logit is exact integer arithmetic
  // (order-independent, hash-stable — the X8 micros discipline
  // applied to model inference); the label is a threshold on the
  // logit. Missing tokens contribute 0 (the left join's coalesce),
  // so out-of-vocabulary text scores bias-only.
  //
  // Scale: the corpus NEVER shuffles by token — the model broadcasts
  // (a real vocabulary is ~10⁵ rows, KBs–MBs), the token stream
  // joins map-side, and the only exchange is the per-doc sum, keyed
  // by doc_id and map-side combined. Swapping the model = swapping
  // one small table; the plan is identical for any vocabulary size
  // that fits a broadcast.
  private val clfModel: Seq[(String, Long)] = Seq(
    "spark" -> 400000L, "fast" -> 250000L, "merge" -> 150000L,
    "vector" -> 200000L, "query" -> 100000L, "window" -> 50000L,
    "slow" -> -300000L, "batch" -> -100000L, "line" -> -150000L,
    "row" -> -50000L, "scan" -> -75000L)
  private val clfBiasMicro = -500000L

  /** Per-doc classifier logits: (doc_id, logit_micro). The SINGLE
    * scoring implementation — q197 serves it, q211 calibrates it.
    */
  private def classifierLogits(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val model = clfModel.toDF("w", "wt_micro")
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(model), Seq("w"), "left")
      .groupBy("doc_id")
      .agg((coalesce(sum(col("wt_micro")), lit(0L)) + clfBiasMicro).as("logit_micro"))
  }

  /** DuckDB CTEs mirroring [[classifierLogits]]: defines `lg(doc_id,
    * logit_micro)` (plus `model`). Requires [[docTokCteSql]] earlier
    * in the WITH list.
    */
  private val classifierLogitCteSql: String = {
    val values = clfModel.map { case (w, m) => s"('$w', $m)" }.mkString(", ")
    s"model(w, wt_micro) AS (VALUES $values), " +
      "lg AS (SELECT doc_id, CAST(coalesce(sum(m.wt_micro), 0) + " +
      s"($clfBiasMicro) AS BIGINT) AS logit_micro FROM tok LEFT JOIN model m USING (w) GROUP BY doc_id)"
  }

  val q197: QuerySpec = QuerySpec(
    "q197_classifier_score",
    (s, d) =>
      classifierLogits(s, d)
        .withColumn("label", col("logit_micro") >= 0L)
        .orderBy("doc_id"),
    Some(
      s"WITH $docTokCteSql, $classifierLogitCteSql " +
        "SELECT doc_id, logit_micro, logit_micro >= 0 AS label FROM lg ORDER BY doc_id"
    ),
  )

  // ---------------------------------------------------------------------
  // q208 — HELD-OUT perplexity: score the validation split under a
  // unigram LM trained ONLY on the training split (add-1 smoothing)
  // — the LM-eval loop itself, where q131 scores a corpus under its
  // own statistics. The split is q65's rule
  // ([[TrainingDataQueries.splitCol]] — the single source, so the
  // eval can never see a different split than the pipeline ships);
  // smoothing p(w) = (c(w)+1)/(N+V+1) handles OOV tokens (c = 0) in
  // the same formula. Determinism is q131's trick: each token's
  // surprisal is one integer division + one ln, floored to µnats
  // BEFORE summation — per-doc sums are pure integer arithmetic.
  //
  // Scale: the train pass builds the Heaps-bounded freq table; the
  // eval side left-joins it on token (broadcastable until vocab
  // outgrows executors); per-doc sums partial-aggregate. Nothing
  // joins corpus×corpus.
  val q208: QuerySpec = QuerySpec(
    "q208_heldout_perplexity",
    (s, d) => {
      val split = TrainingDataQueries.splitCol(col("doc_id"))
      def tok(which: String) = documents(s, d)
        .where(split === which)
        .select(col("doc_id"), explode(split_part_tokens).as("t"))
      val freq = tok("train").groupBy("t").agg(count(lit(1)).as("f"))
      val anchor = freq.agg(
        sum("f").as("n"), count(lit(1)).as("v")) // 1-row (N, V) anchor
      tok("val")
        .join(freq, Seq("t"), "left")
        .crossJoin(anchor)
        .select(
          col("doc_id"),
          floor(log((col("n").cast("double") + col("v") + 1) /
            (coalesce(col("f"), lit(0L)) + 1)) * 1e6).cast("long").as("s"),
          col("f").isNull.cast("long").as("oov"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum("oov").as("n_oov"),
          sum("s").as("ssum"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          expr("ssum div n_tokens").as("mean_surprisal_micro"))
        .orderBy("doc_id")
    },
    Some {
      val sc = TrainingDataQueries.splitCaseSql("doc_id")
      s"WITH tr AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents WHERE ($sc) = 'train'), " +
        "freq AS (SELECT t, count(*) AS f FROM tr GROUP BY 1), " +
        "a AS (SELECT sum(f) AS n, count(*) AS v FROM freq), " +
        s"ev AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents WHERE ($sc) = 'val'), " +
        "sc AS (SELECT doc_id, CAST(floor(ln((CAST(n AS DOUBLE) + v + 1) / (coalesce(f, 0) + 1)) * 1e6) AS BIGINT) AS s, " +
        "CASE WHEN f IS NULL THEN 1 ELSE 0 END AS oov " +
        "FROM ev LEFT JOIN freq USING (t) CROSS JOIN a) " +
        "SELECT doc_id, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov, " +
        "CAST(CAST(sum(s) AS HUGEINT) // CAST(count(*) AS HUGEINT) AS BIGINT) AS mean_surprisal_micro " +
        "FROM sc GROUP BY 1 ORDER BY doc_id"
    },
  )

  /** Whitespace token array — named so q208's two token streams can't
    * drift from each other.
    */
  private def split_part_tokens = split(col("text"), " ")

  // ---------------------------------------------------------------------
  // q211 — score calibration: q197's classifier logits cut into
  // ANSI-ntile deciles (DESC), each decile reporting its logit range
  // and the rate at which its documents pass q195's quality gate —
  // the precision-by-score-band table every scoring pipeline emits
  // before picking a threshold (a well-calibrated score shows pass
  // rate falling monotonically down the deciles; this one does, and
  // the oracle pins the exact numbers). Deciles come from
  // [[graft.ops.Ranks]] (range-repartition + offset broadcast — the
  // q183 machinery, no single-task sort); everything else is exact
  // integer arithmetic.
  //
  // Scale: both input frames are per-doc folds (q195/q197 plans);
  // the rank range-partitions the corpus; output is 10 rows.
  val q211: QuerySpec = QuerySpec(
    "q211_score_calibration",
    (s, d) => {
      val logits = classifierLogits(s, d)
      val pass = gopherRuleTable(s, d).select("doc_id", "pass")
      val scored = logits.join(pass, Seq("doc_id"))
      val ranked = graft.ops.Ranks.withGlobalRank(
        scored, Seq(col("logit_micro").desc, col("doc_id").asc), "rk")
      val tot = scored.agg(count(lit(1)).as("n_all"))
      ranked.crossJoin(tot) // 1-row total anchor
        .select(
          graft.ops.Ranks.ntileFromRank(col("rk"), col("n_all"), 10).as("decile"),
          col("logit_micro"), col("pass"))
        .groupBy("decile")
        .agg(
          count(lit(1)).as("n_docs"),
          max(col("logit_micro")).as("logit_hi"),
          min(col("logit_micro")).as("logit_lo"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"))
        .withColumn("pass_bp", expr("10000 * n_pass div n_docs"))
        .orderBy("decile")
    },
    Some {
      s"WITH $docTokCteSql, $classifierLogitCteSql, $gopherRuleCteSql, " +
        "sc AS (SELECT lg.doc_id, logit_micro, pass FROM lg JOIN gop ON lg.doc_id = gop.doc_id), " +
        "dec AS (SELECT ntile(10) OVER (ORDER BY logit_micro DESC, doc_id) AS decile, logit_micro, pass FROM sc) " +
        "SELECT decile, count(*) AS n_docs, " +
        "CAST(max(logit_micro) AS BIGINT) AS logit_hi, CAST(min(logit_micro) AS BIGINT) AS logit_lo, " +
        "CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass, " +
        "CAST(10000 * sum(CASE WHEN pass THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS pass_bp " +
        "FROM dec GROUP BY 1 ORDER BY decile"
    },
  )

  // ---------------------------------------------------------------------
  // q103 — lexical diversity (Simpson): per source, 1 − Σnᵢ(nᵢ−1) /
  // (N(N−1)) over its token counts — the probability two tokens drawn
  // without replacement differ. The diversity gate that needs NO
  // logarithm: Shannon entropy's ln is the exact cross-engine ulp
  // hazard q79/q91 exist to avoid, while Simpson is integer sums and
  // one division — bit-identical everywhere, same monotone signal
  // (repetitive/spammy sources score low).
  //
  // Scale: one (source, token) count (uniform keys, map-side
  // combined), then a per-source fold over its vocabulary.
  val q103: QuerySpec = QuerySpec(
    "q103_lexical_diversity",
    (s, d) => {
      val counts = documents(s, d)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
        .where(col("w") =!= "")
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      // products in DECIMAL(38,0) (the q85 overflow rule): long
      // arithmetic wraps silently past ~3e9 tokens per source, which a
      // 100 TB corpus reaches; the DuckDB side is exact (HUGEINT)
      // already, so a wrapped Spark value would diverge, not error
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val cD = col("c").cast(dec)
      val nD = sum(col("c")).cast(dec)
      counts
        .groupBy("source")
        .agg(
          sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          round(lit(1.0) -
            sum(cD * (cD - 1)).cast("double") /
            (nD * (nD - 1)).cast("double"), 6).as("simpson_diversity"),
        )
        .orderBy("source")
    },
    Some(
      "WITH t AS (SELECT source, w, count(*) AS c FROM " +
        "(SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents) " +
        "WHERE w <> '' GROUP BY 1, 2) " +
        "SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types, " +
        "round(1.0 - CAST(sum(c*(c-1)) AS DOUBLE) / (sum(c) * (sum(c) - 1)), 6) AS simpson_diversity " +
        "FROM t GROUP BY 1 ORDER BY source"
    ),
  )

  // ---------------------------------------------------------------------
  // q104 — cross-source contamination: for each source pair, how many
  // distinct boilerplate-prefix fingerprints (md5 of the first 16
  // lowercased words — q75's prefix rule, same expression both
  // engines) appear in BOTH. The "is source B scraping source A"
  // matrix; exact-hash overlap is its stricter variant (zero on this
  // corpus — prefix catches what md5(text) can't).
  //
  // Scale: distinct (fingerprint, source) pairs, then a self-join on
  // fingerprint — the join fans out only where a fingerprint spans
  // sources, which is exactly the signal; a fingerprint in k sources
  // yields k(k−1)/2 pairs, bounded by sources², not docs².
  val q104: QuerySpec = QuerySpec(
    "q104_cross_source_overlap",
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      val hs = documents(s, d)
        .select(TF.prefixFingerprint(col("text"), 16).as("h"), col("source"))
        .distinct()
      hs.as("a")
        .join(hs.as("b"), col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("source_a", "source_b")
    },
    Some(
      "WITH hs AS (SELECT DISTINCT " +
        "md5(array_to_string(list_slice(string_split(lower(text), ' '), 1, 16), ' ')) AS h, " +
        "source FROM documents) " +
        "SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared " +
        "FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source " +
        "GROUP BY 1, 2 ORDER BY source_a, source_b"
    ),
  )

  // ---------------------------------------------------------------------
  // q117 — benchmark decontamination by exact 13-gram overlap (the
  // GPT-3/PaLM protocol): treating one source as the held-out
  // benchmark, what fraction of each training doc's DISTINCT word
  // 13-grams appears verbatim in the benchmark — reported per source
  // as doc counts, flagged count (majority overlap), and the max
  // overlap ratio. q75 removes exact-prefix matches; this is the
  // industry-standard n-gram membership form that catches contaminated
  // docs whose prefixes differ.
  //
  // Determinism: the flag compare is integer (2·hits > grams, never a
  // float threshold on a boundary); the reported ratio is one integer
  // division, bit-identical cross-engine; grams tokenize on the same
  // single-space split in both engines.
  //
  // Scale: grams come from the q41 shingle machinery (index-explode,
  // executor-local, one distinct exchange). The benchmark side is
  // BENCHMARK-sized — fixed as the corpus grows — so its distinct
  // grams broadcast and the training side never shuffles on the wide
  // gram strings; per-doc hit counting is a map-side-combined
  // aggregate. (At petabyte corpora one would join on xxhash64(gram)
  // and verify — kept exact-string here because the oracle IS the
  // exactness proof.)
  val q117: QuerySpec = QuerySpec(
    "q117_benchmark_decontaminate",
    (s, d) => {
      val docs = documents(s, d)
      val grams = TextPipeline.docShingles(docs.select("doc_id", "text"), 13)
        .join(docs.select("doc_id", "source"), "doc_id")
      val bench = grams.where(col("source") === "src0")
        .select(col("s")).distinct()
        .withColumn("hit", lit(1))
      grams.where(col("source") =!= "src0")
        .join(broadcast(bench), Seq("s"), "left")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hits"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_hits") * 2 > col("n_grams"), 1L).otherwise(0L)).as("n_contaminated"),
          round(max(col("n_hits").cast("double") / col("n_grams")), 4).as("max_overlap"))
        .orderBy("source")
    },
    Some(
      "WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents), " +
        "g AS (SELECT DISTINCT doc_id, source, array_to_string(ws[i:i+12], ' ') AS gram " +
        "FROM w, UNNEST(generate_series(1, len(ws) - 12)) t(i) WHERE len(ws) >= 13), " +
        "b AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'), " +
        "c AS (SELECT g.doc_id, g.source, count(*) AS n_grams, count(b.gram) AS n_hits " +
        "FROM g LEFT JOIN b USING (gram) WHERE g.source <> 'src0' GROUP BY 1, 2) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN n_hits * 2 > n_grams THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated, " +
        "round(max(n_hits * 1.0 / n_grams), 4) AS max_overlap " +
        "FROM c GROUP BY 1 ORDER BY source"
    ),
  )

  // ---------------------------------------------------------------------
  // q131 — per-document mean unigram surprisal (micro-nats): the
  // information-theoretic quality signal (a perplexity proxy under a
  // unigram LM trained on the corpus itself) that ranks boilerplate
  // low and rare-content documents high. The float-determinism trick
  // that makes an oracle possible: each TOKEN's surprisal
  // ln(total/freq) is one division of two exact integers and one ln —
  // identical IEEE doubles in both engines — floored to integer
  // micro-nats BEFORE any summation, so the per-doc sum is exact
  // integer arithmetic with no float accumulation order anywhere.
  //
  // Scale: the token explode is linear in corpus size and feeds (a)
  // the Heaps-bounded vocabulary frequency table and (b) the scoring
  // join — two passes over the documents scan (columnar re-scan beats
  // materializing the exploded frame, the q123 two-pass rule); total
  // mass derives from the freq table (Σf), not a third pass; the
  // scoring join keys on token (vocabulary-sized build side —
  // broadcastable until vocab outgrows executors, hash-join after);
  // per-doc sums partial-aggregate before the doc_id exchange.
  /** Per-doc mean unigram surprisal in micro-nats — q131's body,
    * shared with q140's curriculum binning so the two surfaces can
    * never disagree on what "the quality score" means. Columns:
    * (doc_id, n_tokens, surprisal_micro).
    */
  private def surprisalPerDoc(s: org.apache.spark.sql.SparkSession, d: String) = {
    def tok = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("f"))
    val tot = freq.agg(sum("f").as("n")) // 1-row anchor, from freq — no third corpus pass
    val sur = freq.crossJoin(tot)
      .select(col("t"),
        floor(log(col("n").cast("double") / col("f")) * 1e6).cast("long").as("s"))
    tok.join(sur, "t")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("s").as("ssum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("ssum div n_tokens").as("surprisal_micro"))
  }

  /** q131's whole-pipeline SQL as a CTE chain ending in `per` —
    * shared verbatim by q131 and q140's oracles.
    */
  private val surprisalCteSql: String =
    "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents), " +
      "freq AS (SELECT t, count(*) AS f FROM tok GROUP BY 1), " +
      "tot AS (SELECT sum(f) AS n FROM freq), " +
      "sur AS (SELECT t, CAST(floor(ln(CAST(n AS DOUBLE)/f) * 1e6) AS BIGINT) AS s FROM freq, tot), " +
      "per AS (SELECT doc_id, count(*) AS n_tokens, sum(s) AS ssum FROM tok JOIN sur USING (t) GROUP BY 1)"

  val q131: QuerySpec = QuerySpec(
    "q131_unigram_surprisal",
    (s, d) => surprisalPerDoc(s, d).orderBy("doc_id"),
    Some(
      s"WITH $surprisalCteSql " +
        "SELECT doc_id, n_tokens, CAST(ssum // n_tokens AS BIGINT) AS surprisal_micro FROM per ORDER BY doc_id"
    ),
  )

  // ---------------------------------------------------------------------
  // q140 — curriculum binning: split the corpus into 4 equal-count
  // phases by ascending surprisal (easy → hard under the q131 unigram
  // score — curriculum learning's canonical ordering) and report each
  // phase's source mix. The step that turns a quality SCORE into a
  // training SCHEDULE; the per-phase source histogram is what a
  // curriculum designer actually reviews (does phase 1 over-sample
  // one boilerplate source?).
  //
  // Determinism: surprisal_micro is q131's exact integer; the bin
  // boundary is ntile(4) under the TOTAL order (score, doc_id) —
  // reproduced without any single-task sort via the q109 machinery:
  // a range-partitioned global rank ([[graft.ops.Ranks]]) + pure
  // rank arithmetic ([[graft.ops.Ranks.ntileFromRank]]). The oracle
  // runs plain SQL ntile — the hash match proves the distributed
  // form IS the ANSI bucketing.
  //
  // Scale: docs ≫ phases, and the rank pass is the scalable global
  // sort (sampled range boundaries, parallel per-partition ranks,
  // P-row offset frame); everything after is a (phase, source)
  // aggregate — bounded key space, map-side combined.
  val q140: QuerySpec = QuerySpec(
    "q140_curriculum_bins",
    (s, d) => {
      val scored = documents(s, d).select("doc_id", "source")
        .join(surprisalPerDoc(s, d).select("doc_id", "surprisal_micro"), "doc_id")
      val n = scored.agg(count(lit(1)).as("__n")) // 1-row doc count
      graft.ops.Ranks
        .withGlobalRank(scored, Seq(col("surprisal_micro"), col("doc_id")), "grank")
        .crossJoin(n)
        .withColumn("phase", graft.ops.Ranks.ntileFromRank(col("grank"), col("__n"), 4))
        .groupBy("phase", "source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("phase", "source")
    },
    Some(
      s"WITH $surprisalCteSql, " +
        "scored AS (SELECT d.doc_id, d.source, p.ssum // p.n_tokens AS surprisal_micro " +
        "FROM documents d JOIN per p ON p.doc_id = d.doc_id), " +
        "binned AS (SELECT source, ntile(4) OVER (ORDER BY surprisal_micro, doc_id) AS phase FROM scored) " +
        "SELECT phase, source, count(*) AS n_docs FROM binned GROUP BY 1, 2 ORDER BY phase, source"
    ),
  )

  // ---------------------------------------------------------------------
  // q137 — cross-document duplicate n-gram coverage: per source, how
  // much of its text is made of word-8-grams that ALSO appear in at
  // least one other document, plus the count of majority-duplicated
  // docs (> 50% shared grams). The corpus-level repetition axis the
  // family is missing: q89 measures repetition WITHIN a doc, q117
  // overlap against a fixed benchmark side, q104 shared prefixes —
  // this measures pairwise-agnostic cross-doc boilerplate (the Lee et
  // al. "Deduplicating Training Data" signal) without materializing
  // any pair: a gram's document frequency alone decides, so cost is
  // corpus-linear where q99-style pair mining is quadratic.
  //
  // Determinism: the per-doc gate is the integer inequality
  // 2·dup > grams (the q89 rule); the single corpus-level division
  // rounds once at the end.
  //
  // Scale: distinct (doc, gram) explodes executor-local (q69's rule);
  // the df count keys on gram — uniform, map-side combined; the join
  // back is gram-keyed equijoin whose build side is the df table
  // (Heaps-sublinear in corpus size); nothing is all-pairs. At 100 TB
  // hash the grams (xxhash64) before the df aggregation so the
  // exchange carries 8-byte keys, not 8-word strings — the q117 note.
  val q137: QuerySpec = QuerySpec(
    "q137_dup_ngram_coverage",
    (s, d) => {
      val toks = documents(s, d)
        .where(size(split(col("text"), " ")) >= 8)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      val g = toks
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(0), size(col("ws")) - 8)).as("i"), col("ws"))
        .select(col("doc_id"), col("source"),
          concat_ws(" ", slice(col("ws"), col("i") + 1, lit(8))).as("gram"))
        .distinct()
      val df = g.groupBy("gram").agg(count(lit(1)).as("df"))
      g.join(df, Seq("gram"))
        .groupBy("doc_id", "source")
        .agg(
          count(lit(1)).as("n_grams"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("dup_grams"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(lit(2) * col("dup_grams") > col("n_grams"), 1L).otherwise(0L)).as("n_flagged"),
          round(sum(col("dup_grams")).cast("double") / sum(col("n_grams")), 6).as("dup_coverage"))
        .orderBy("source")
    },
    Some(
      "WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 8), " +
        "g AS (SELECT DISTINCT doc_id, source, " +
        "ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7] AS gram " +
        "FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws) - 7)) AS i) t), " +
        "df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1), " +
        "pd AS (SELECT doc_id, source, count(*) AS n_grams, " +
        "CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams " +
        "FROM g JOIN df USING (gram) GROUP BY 1, 2) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN 2*dup_grams > n_grams THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged, " +
        "round(CAST(sum(dup_grams) AS DOUBLE) / sum(n_grams), 6) AS dup_coverage " +
        "FROM pd GROUP BY 1 ORDER BY source"
    ),
  )

  // ---------------------------------------------------------------------
  // q177 — sorted-neighborhood dedup (SNM): the third classic blocking
  // strategy alongside LSH banding (q31) and rare-shingle blocking
  // (q111). Sort the corpus by a cheap blocking key (here: character
  // length — near-dups have near-equal lengths), compare only rows
  // within a rank window w = 10, verify candidates with the exact
  // 3-shingle Jaccard (the q30 verify stage — the cascade discipline:
  // candidates-then-verify, never all-pairs).
  //
  // Scale: candidates = N·w by construction (linear, tunable), found
  // by a rank-bucket equijoin — the global sort is
  // [[graft.ops.Ranks.withGlobalRank]] (range-partitioned, no
  // single-task window); the verify join is keyed on (doc, shingle).
  // SNM's trade vs LSH: deterministic candidate volume and no
  // signature computation, but recall depends on the key ordering —
  // which the spec measures against q30's exact pairs.
  val SnmWindow = 10
  val q177: QuerySpec = QuerySpec(
    "q177_sorted_neighborhood",
    (s, d) => {
      val ranked = graft.ops.Ranks
        .withGlobalRank(
          documents(s, d).select("doc_id", "n_chars"),
          Seq(col("n_chars").asc, col("doc_id").asc), "rn")
        .withColumn("bkt", expr(s"(rn - 1) div $SnmWindow"))
      val a = ranked.select(col("doc_id").as("da"), col("rn").as("ra"), col("bkt"))
      val b = ranked.select(col("doc_id").as("db"), col("rn").as("rb"),
        col("bkt").as("bktb"))
      val cand = a.join(b, col("bkt") === col("bktb"))
        .unionByName(a.join(b, col("bkt") + 1 === col("bktb")))
        .where(col("rb") > col("ra") && col("rb") <= col("ra") + SnmWindow)
        .select(col("da"), col("db"), (col("rb") - col("ra")).as("rank_dist"))
      val sh = TextPipeline.docShingles(documents(s, d).select("doc_id", "text"))
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val common = cand
        .join(sh.select(col("doc_id").as("da"), col("s")), Seq("da"))
        .join(sh.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
        .groupBy("da", "db", "rank_dist")
        .agg(count(lit(1)).as("common"))
      val jac = col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double")
      common
        .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
        .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
        // threshold the UNROUNDED value in both engines (the q79 rule)
        .where(jac >= 0.5)
        .select(col("da"), col("db"), col("rank_dist"), round(jac, 4).as("jaccard"))
        .orderBy("da", "db")
    },
    Some(
      s"WITH ${LlmQueries.shinglePairsCteSql}, " +
        "r AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) AS rn " +
        "FROM documents), " +
        "cand AS (SELECT a.doc_id AS da, b.doc_id AS db, b.rn - a.rn AS rank_dist " +
        s"FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + $SnmWindow), " +
        "com AS (SELECT c.da, c.db, c.rank_dist, count(*) AS common FROM cand c " +
        "JOIN sh x ON x.doc_id = c.da JOIN sh y ON y.doc_id = c.db AND y.s = x.s " +
        "GROUP BY 1, 2, 3) " +
        "SELECT da, db, rank_dist, " +
        "round(common * 1.0 / (ca.n + cb.n - common), 4) AS jaccard " +
        "FROM com JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db " +
        "WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5 ORDER BY da, db"
    ),
  )

  // ---------------------------------------------------------------------
  // q178 — per-document mean BIGRAM surprisal (add-1 smoothed): the
  // sequence-aware upgrade of q131's unigram score — a proper
  // perplexity-proxy under a bigram LM trained on the corpus itself,
  // the filter that separates fluent text from bag-of-frequent-words
  // spam (which unigram surprisal scores as "easy").
  //
  // s(a,b) = ⌊ln((c(a) + V) / (c(a,b) + 1)) · 10⁶⌋ — each conditional
  // surprisal floors to an exact integer BEFORE the per-doc sum (the
  // q131 trick that makes an oracle possible for a float-valued
  // score); the per-doc mean is integer division.
  //
  // Scale: bigram explode is executor-local (q79's rule); the scoring
  // join is keyed on the bigram (uniform-ish keys, q63 flags the
  // heavy hitters if a corpus needs salting); V rides a 1-row anchor.
  val q178: QuerySpec = QuerySpec(
    "q178_bigram_surprisal",
    (s, d) => {
      val toks = documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= 2)
      val big = toks
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("ws")) - 1)).as("i"), col("ws"))
        .select(col("doc_id"),
          element_at(col("ws"), col("i")).as("a"),
          element_at(col("ws"), col("i") + 1).as("b"))
      val bcnt = big.groupBy("a", "b").agg(count(lit(1)).as("nab"))
      val ucnt = documents(s, d)
        .select(explode(split(col("text"), " ")).as("a"))
        .groupBy("a").agg(count(lit(1)).as("na"))
      val vocab = ucnt.agg(count(lit(1)).as("v")) // 1-row anchor
      val sur = bcnt
        .join(ucnt, Seq("a"))
        .crossJoin(vocab)
        .select(col("a"), col("b"),
          floor(log((col("na") + col("v")).cast("double") /
            (col("nab") + 1).cast("double")) * 1e6).cast("long").as("sb"))
      big.join(sur, Seq("a", "b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("sb").as("ssum"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("ssum div n_bigrams").as("bigram_surprisal_micro"))
        .orderBy("doc_id")
    },
    Some(
      "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
        "big AS (SELECT doc_id, ws[i] AS a, ws[i+1] AS b FROM toks, " +
        "LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) t WHERE len(ws) >= 2), " +
        "bcnt AS (SELECT a, b, count(*) AS nab FROM big GROUP BY 1, 2), " +
        "ucnt AS (SELECT unnest(string_split(text, ' ')) AS a FROM documents), " +
        "uc AS (SELECT a, count(*) AS na FROM ucnt GROUP BY 1), " +
        "voc AS (SELECT count(*) AS v FROM uc), " +
        "sur AS (SELECT a, b, CAST(floor(ln(CAST(na + v AS DOUBLE) / (nab + 1)) * 1e6) AS BIGINT) AS sb " +
        "FROM bcnt JOIN uc USING (a), voc) " +
        "SELECT doc_id, count(*) AS n_bigrams, CAST(sum(sb) // count(*) AS BIGINT) AS bigram_surprisal_micro " +
        "FROM big JOIN sur USING (a, b) GROUP BY 1 ORDER BY doc_id"
    ),
  )

  // ---------------------------------------------------------------------
  // q188 — exact-substring duplication profile: for every document,
  // how many of its k-token windows (k = 8) appear verbatim in at
  // least one OTHER document, and the floored-bp duplicated fraction —
  // the per-document signal behind exact-substring dedup (Lee et al.
  // 2022, "Deduplicating Training Data Makes Language Models Better":
  // remove verbatim spans shared across documents, the complement of
  // q41's whole-document near-dup and q99's set containment). A
  // pipeline thresholds dup_bp to route documents to span-removal.
  //
  // Determinism: windows are exact strings on the §7.0 total order;
  // all outputs are integer counts and a floored basis-point ratio.
  //
  // Scale: the window stream is tokens-sized (n−k+1 windows per doc —
  // the q178 explode idiom, no HOFs); the share test is one groupBy on
  // the window key + a semi-join back — candidates ∝ corpus, never
  // doc-pairs. The group key here is the k-token STRING (oracle
  // exactness); production swaps it for xxhash64(gram) and shuffles
  // 8-byte keys instead — counts identical short of 2⁻⁶⁴ collisions.
  val q188: QuerySpec = QuerySpec(
    "q188_exact_substring_dup",
    (s, d) => {
      val k = 8
      val toks = documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= k)
      // wins (the tokens-sized window stream, the largest frame here)
      // feeds THREE consumers with different exchange shapes (shared,
      // per, sh) — pin it once or the corpus re-scans and re-explodes
      // per consumer (the q190 multi-consumer rule).
      val wins = toks
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("ws")) - (k - 1))).as("i"), col("ws"))
        .select(col("doc_id"), expr(s"array_join(slice(ws, i, $k), ' ')").as("g"))
        .pinLineage(eager = true)
      val shared = wins.groupBy("g")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") >= 2).select("g")
      val per = wins.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
      val sh = wins.join(shared, Seq("g"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      per.join(sh, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_windows"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .withColumn("dup_bp", expr("(10000 * n_shared) div n_windows"))
        .orderBy("doc_id")
    },
    Some(
      "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 8), " +
        "wins AS MATERIALIZED (SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS g FROM toks, " +
        "LATERAL (SELECT unnest(generate_series(1, len(ws) - 7)) AS i) t), " +
        "shared AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd " +
        "FROM wins GROUP BY 1) WHERE nd >= 2), " +
        "per AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY 1), " +
        "sh AS (SELECT doc_id, count(*) AS n_shared FROM wins " +
        "WHERE g IN (SELECT g FROM shared) GROUP BY 1) " +
        "SELECT p.doc_id, p.n_windows, " +
        "CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared, " +
        "CAST((10000 * COALESCE(sh.n_shared, 0)) // p.n_windows AS BIGINT) AS dup_bp " +
        "FROM per p LEFT JOIN sh USING (doc_id) ORDER BY doc_id"
    ),
  )

  // ---------------------------------------------------------------------
  // q213 — TF-IDF top terms per document: the keyword-extraction table
  // (what is this document ABOUT) that q43's corpus-level vocabulary
  // and q103's diversity don't answer. Classic tf·idf (Spärck Jones
  // 1972) with the repo's integer determinism discipline: idf is
  // floored to µnats BEFORE multiplying (the q131/q208 ln trick — the
  // only float op is one ln of a ratio of exact integers, pinned at
  // µ-precision), so scores are exact longs and the top-3 with the
  // (score desc, term asc) tie-break is a pure function of the corpus.
  //
  // Scale: (doc, term) tf counts map-side combine; df is one
  // vocabulary-sized aggregate (Heaps-bounded); the tf⋈df join keys on
  // term (vocabulary-keyed, broadcastable until vocab outgrows
  // executors); the top-3 window partitions by doc_id — corpus-sized
  // but per-group state is 3 rows. Nothing joins corpus×corpus.
  val q213: QuerySpec = QuerySpec(
    "q213_tfidf_top_terms",
    (s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
      val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val nDocs = documents(s, d).agg(countDistinct(col("doc_id")).as("nd"))
      val scored = tf.join(df, "w").crossJoin(nDocs) // 1-row anchor
        .select(col("doc_id"), col("w").as("term"), col("tf"), col("df"),
          (col("tf") *
            floor(log(col("nd").cast("double") / col("df")) * 1e6).cast("long"))
            .as("score_micro"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")
        .orderBy(col("score_micro").desc, col("term").asc)
      scored
        .withColumn("rk", row_number().over(win))
        .where(col("rk") <= 3)
        .select("doc_id", "rk", "term", "tf", "df", "score_micro")
        .orderBy("doc_id", "rk")
    },
    Some(
      "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents), " +
        "tf AS (SELECT doc_id, w, count(*) AS tf FROM tok WHERE w <> '' GROUP BY 1, 2), " +
        "df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1), " +
        "nd AS (SELECT count(DISTINCT doc_id) AS nd FROM documents), " +
        "sc AS (SELECT doc_id, tf.w AS term, tf, df, " +
        "tf * CAST(floor(ln(CAST(nd AS DOUBLE) / df) * 1e6) AS BIGINT) AS score_micro " +
        "FROM tf JOIN df USING (w) CROSS JOIN nd), " +
        "rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY score_micro DESC, term) AS rk FROM sc) " +
        "SELECT doc_id, rk, term, tf, df, score_micro FROM rk WHERE rk <= 3 " +
        "ORDER BY doc_id, rk"
    ),
  )

  // ---------------------------------------------------------------------
  // q214 — corpus-frequency n-gram boilerplate coverage (the C4/
  // RefinedWeb scrub rule "drop spans occurring in many documents",
  // as its audit table): per doc, how many token positions are
  // covered by a 3-gram shingle whose DOCUMENT frequency ≥ 5. The
  // corpus-frequency axis q89 (intra-doc repetition) and q188
  // (pairwise spans) don't cover: template/boilerplate text is rare
  // WITHIN a doc and across a PAIR, but frequent across the corpus.
  //
  // All integer arithmetic: shingles by lead() over token positions,
  // df = count(distinct doc) per shingle, coverage = distinct
  // positions in the union of flagged [pos, pos+2] spans (explode 3
  // offsets, distinct — overlap handled by the distinct, no interval
  // algebra needed at fixed n).
  //
  // Scale: the shingle frame is tokens-sized (one row per position,
  // the q188 discipline); df map-side combines; only FLAGGED shingles
  // (rare by definition of boilerplate... but high-df: the flagged
  // SET is small even when its occurrences aren't) re-join the
  // position frame, keyed on the shingle string — swap the string for
  // xxhash64(shingle) at 100 TB to keep the exchange narrow (the
  // documented q188 swap).
  /** Flagged boilerplate POSITIONS per doc — (doc_id, p) distinct rows
    * covered by a 3-gram with corpus document-frequency ≥ 5. The single
    * source for the q214 audit and the q219 scrub transform: a
    * df-threshold or shingle-width change re-scrubs and re-audits
    * together.
    */
  private def boilerplatePositions(s: SparkSession, d: String): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val tok = documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val sh = tok
      .withColumn("w1", lead("w", 1).over(win))
      .withColumn("w2", lead("w", 2).over(win))
      .where(col("w1").isNotNull && col("w2").isNotNull)
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("w"), col("w1"), col("w2")).as("sh"))
    val hot = sh.groupBy("sh").agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= 5)
      .select("sh")
    sh.join(hot, "sh")
      .select(col("doc_id"),
        explode(array(col("pos"), col("pos") + 1, col("pos") + 2)).as("p"))
      .distinct()
  }

  /** DuckDB CTEs mirroring [[boilerplatePositions]]: defines
    * `flagged(doc_id, p)` (plus tok2/shg/sh/hot). Kept beside the Spark
    * builder for the same single-source reason as the gate/logit CTEs.
    */
  private val boilerplatePositionsCteSql: String =
    "tok2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w, " +
      "unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS pos FROM documents), " +
      "shg AS (SELECT doc_id, pos, w || ' ' || lead(w, 1) OVER dw || ' ' || lead(w, 2) OVER dw AS g " +
      "FROM tok2 WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)), " +
      "sh AS (SELECT doc_id, pos, g FROM shg WHERE g IS NOT NULL), " +
      "hot AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM sh GROUP BY 1) WHERE df >= 5), " +
      "flagged AS (SELECT DISTINCT doc_id, p FROM " +
      "(SELECT doc_id, unnest([pos, pos + 1, pos + 2]) AS p FROM sh JOIN hot USING (g)))"

  val q214: QuerySpec = QuerySpec(
    "q214_boilerplate_coverage",
    (s, d) => {
      val covered = boilerplatePositions(s, d)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_flagged"))
      documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(covered, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_flagged"), lit(0L)).as("n_flagged"))
        .withColumn("boilerplate_bp", expr("10000 * n_flagged div n_tokens"))
        .orderBy("doc_id")
    },
    Some(
      // zip-unnest gives token positions (DuckDB zips parallel unnests)
      s"WITH $boilerplatePositionsCteSql, " +
        "cov AS (SELECT doc_id, count(*) AS n_flagged FROM flagged GROUP BY 1), " +
        "base AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents) " +
        "SELECT base.doc_id AS doc_id, n_tokens, CAST(coalesce(n_flagged, 0) AS BIGINT) AS n_flagged, " +
        "CAST(10000 * coalesce(n_flagged, 0) // n_tokens AS BIGINT) AS boilerplate_bp " +
        "FROM base LEFT JOIN cov ON base.doc_id = cov.doc_id ORDER BY 1"
    ),
  )

  // ---------------------------------------------------------------------
  // q219 — corpus-frequency boilerplate SCRUB (the transform q214
  // audits): drop every token position covered by a hot 3-gram and
  // emit the RETAINED document — reconstructed in order — plus the
  // removal accounting. This is the C4/RefinedWeb scrub rule as the
  // shipping artifact rather than the report; the flagged-position
  // frame is the SAME [[boilerplatePositions]] builder q214 reads, so
  // audit and transform can never disagree about what was removed.
  //
  // Reconstruction is order-exact without any per-doc sort pass in the
  // aggregate: collect (pos, token) structs, array_sort (pos leads the
  // struct), project the token, join with spaces — per-doc state is
  // the doc's own kept tokens (documents are KB-sized; the corpus
  // never materializes as one frame). The anti-join keeps only
  // unflagged positions; docs scrubbed to nothing surface with
  // text_out = '' via the left join (the honest empty, not a dropped
  // row — downstream length gates expect to see them).
  val q219: QuerySpec = QuerySpec(
    "q219_boilerplate_scrub",
    (s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val kept = tok.join(
        boilerplatePositions(s, d).withColumnRenamed("p", "pos"),
        Seq("doc_id", "pos"), "left_anti")
      val rebuilt = kept.groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_kept"),
          array_join(
            expr("transform(array_sort(collect_list(struct(pos, w))), s -> s.w)"),
            " ").as("text_out"))
      documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("n_tokens"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
          coalesce(col("text_out"), lit("")).as("text_out"))
        .orderBy("doc_id")
    },
    Some(
      s"WITH $boilerplatePositionsCteSql, " +
        "kept AS (SELECT t.doc_id, t.pos, t.w FROM tok2 t LEFT JOIN flagged f " +
        "ON t.doc_id = f.doc_id AND t.pos = f.p WHERE f.doc_id IS NULL), " +
        "rebuilt AS (SELECT doc_id, count(*) AS n_kept, " +
        "string_agg(w, ' ' ORDER BY pos) AS text_out FROM kept GROUP BY 1), " +
        "base AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents) " +
        "SELECT base.doc_id AS doc_id, n_tokens, " +
        "CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept, " +
        "CAST(n_tokens - coalesce(n_kept, 0) AS BIGINT) AS n_removed, " +
        "coalesce(text_out, '') AS text_out " +
        "FROM base LEFT JOIN rebuilt ON base.doc_id = rebuilt.doc_id ORDER BY 1"
    ),
  )

  // ---------------------------------------------------------------------
  // q216 — quality-ranked token-budget selection (top-p data curation):
  // per source, rank documents by the q197 classifier logit and keep
  // the best docs until 80% of the source's token mass is spent — the
  // doc-level selection step that composes with q173's source-level
  // budget split (q173 decides how many tokens each source GETS, this
  // decides WHICH documents spend them). The keep rule is pure integer
  // arithmetic (10·cumsum ≤ 8·total), the ranking key
  // (logit_micro desc, doc_id) is total, and the scorer is the SAME
  // [[classifierLogits]] builder q197/q211 serve — a scoring change
  // re-selects the corpus everywhere at once.
  //
  // Scale: one corpus scan for (tokens, logit); the cumulative sum is
  // a window partitioned by source — per-source sorted exchange, no
  // global sort, no driver state; the output is |sources| rows. The
  // served artifact at 100 TB is the `keep` column written back
  // partition-aligned, so the selection is a pushdown-able filter for
  // every downstream trainer.
  val q216: QuerySpec = QuerySpec(
    "q216_quality_budget_selection",
    (s, d) => {
      val base = documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(classifierLogits(s, d), "doc_id")
      val rankW = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("logit_micro").desc, col("doc_id").asc)
      val totW = org.apache.spark.sql.expressions.Window.partitionBy("source")
      val sel = base
        .withColumn("cum", sum(col("n_tokens")).over(rankW))
        .withColumn("total", sum(col("n_tokens")).over(totW))
        .withColumn("keep", col("cum") * 10 <= col("total") * 8)
      sel.groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("keep"), 1)).as("n_kept"),
          max(col("total")).as("tokens_total"),
          coalesce(sum(when(col("keep"), col("n_tokens"))), lit(0L)).as("tokens_kept"),
          min(when(col("keep"), col("logit_micro"))).as("cutoff_logit"))
        .orderBy("source")
    },
    Some(
      s"WITH $docTokCteSql, $classifierLogitCteSql, " +
        "base AS (SELECT d.doc_id, d.source, " +
        "CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens, lg.logit_micro " +
        "FROM documents d JOIN lg ON d.doc_id = lg.doc_id), " +
        "sel AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source " +
        "ORDER BY logit_micro DESC, doc_id) AS cum, " +
        "sum(n_tokens) OVER (PARTITION BY source) AS total FROM base) " +
        "SELECT source, count(*) AS n_docs, " +
        "count(CASE WHEN cum * 10 <= total * 8 THEN 1 END) AS n_kept, " +
        "CAST(max(total) AS BIGINT) AS tokens_total, " +
        "CAST(coalesce(sum(CASE WHEN cum * 10 <= total * 8 THEN n_tokens END), 0) AS BIGINT) AS tokens_kept, " +
        "CAST(min(CASE WHEN cum * 10 <= total * 8 THEN logit_micro END) AS BIGINT) AS cutoff_logit " +
        "FROM sel GROUP BY 1 ORDER BY source"
    ),
  )

  val all: Seq[QuerySpec] =
    Seq(q88, q89, q91, q92, q98, q99, q103, q104, q111, q117, q131, q137, q140,
      q177, q178, q188, q192, q195, q197, q208, q211, q213, q214, q216, q219)
}
