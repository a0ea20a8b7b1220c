package graft.llm

import graft.SparkSpec

/** Semantic pins for q189 BPE induction (the DuckDB oracle pins exact
  * values at sf0.01; these pin the merge semantics on hand-traced
  * fixtures, including the overlapping-run greedy edge).
  */
class TokenizerQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(dir: String) =
    TokenizerQueries.q189.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"), r.getAs[Long]("corpus_tokens_after")))

  test("q189: hand-traced merges on banana/bandana, ties break to the smaller pair") {
    val dir = java.nio.file.Files.createTempDirectory("q189fix").toString
    // vocab: banana ×2, bandana ×1.
    // round 1 adjacencies: (a,n)=6 (n,a)=5 (b,a)=3 (n,d)=1 (d,a)=1 → merge (a,n);
    //   banana → [b,an,an,a] (4 tok ×2), bandana → [b,an,d,an,a] (5) → 13 after.
    // round 2: (b,an)=3 (an,a)=3 (an,an)=2 (an,d)=1 (d,an)=1 — tie 3=3
    //   breaks on left asc: "an" < "b" → merge (an,a);
    //   banana → [b,an,ana] (3 ×2), bandana → [b,an,d,ana] (4) → 10 after.
    Seq((1L, "banana bandana"), (2L, "banana"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = run(dir)
    assert(rows(0) == ((1L, "a", "n", "an", 6L, 13L)))
    assert(rows(1) == ((1L + 1L, "an", "a", "ana", 3L, 10L)))
    // compression curve never goes up
    assert(rows.map(_._6).sliding(2).forall(w => w(1) <= w(0)))
  }

  test("q189: overlapping runs merge greedily left-to-right, counts stay adjacency") {
    val dir = java.nio.file.Files.createTempDirectory("q189run").toString
    // vocab: aaa ×2, aaaa ×1. round 1: adjacency (a,a) = 2·2 + 3 = 7,
    // but greedy application gives aaa → [aa,a], aaaa → [aa,aa]:
    // corpus tokens 2·2 + 2 = 6 (an overlap-blind merge would claim 5).
    // round 2: (aa,a)=2 beats (aa,aa)=1 → aaa → [aaa], aaaa stays [aa,aa]
    // → tokens 1·2 + 2 = 4.
    Seq((1L, "aaa aaa aaaa")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = run(dir)
    assert(rows(0) == ((1L, "a", "a", "aa", 7L, 6L)))
    assert(rows(1) == ((2L, "aa", "a", "aaa", 2L, 4L)))
  }

  test("q189: merged symbols never match across symbol boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("q189bound").toString
    // vocab: xy ×3, axb ×2, ayb ×2. round 1 merges (x,y) → "xy" (count 3).
    // round 2 candidates come from axb/ayb only: (a,x)=(x,b)=(a,y)=(y,b)=2 —
    // the single-symbol word [xy] must contribute NO pairs, and the 'y'
    // inside merged "xy" must not pair with 'b' anywhere. Tie breaks to
    // (a,x) → axb → [ax,b].
    Seq((1L, "xy xy xy axb axb ayb ayb")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = run(dir)
    assert(rows(0) == ((1L, "x", "y", "xy", 3L, 15L)))
    assert(rows(1)._2 == "a" && rows(1)._3 == "x" && rows(1)._5 == 2L)
  }

  /** Reference BPE (Sennrich et al. 2016): adjacency-counted pair
    * statistics, total-order argmax (count desc, left asc, right asc),
    * greedy left-to-right non-overlapping merge. Returns the per-round
    * stats and the final symbol inventory.
    */
  private def bpeBrute(words: Seq[String], rounds: Int)
      : (Seq[(Long, String, String, String, Long, Long)], Map[String, Long]) = {
    var vocab: Seq[(Vector[String], Long)] = words.groupBy(identity).toSeq
      .map { case (w, o) => w.map(_.toString).toVector -> o.size.toLong }
    val stats = Seq.newBuilder[(Long, String, String, String, Long, Long)]
    for (r <- 1 to rounds) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- vocab; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      if (pc.nonEmpty) {
        val ((x, y), c) = pc.minBy { case ((x, y), c) => (-c, x, y) }
        vocab = vocab.map { case (syms, cnt) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) { out += x + y; i += 2 }
            else { out += syms(i); i += 1 }
          }
          out.result() -> cnt
        }
        stats += ((r.toLong, x, y, x + y, c, vocab.map { case (s, n) => s.length * n }.sum))
      }
    }
    val inv = vocab.flatMap { case (s, n) => s.map(_ -> n) }
      .groupBy(_._1).map { case (sym, o) => sym -> o.map(_._2).sum }
    (stats.result(), inv)
  }

  test("q189/q191 match the reference BPE on seeded random two-letter corpora") {
    // {a,b} alphabet maximizes runs and count ties — the edges where
    // greedy overlap handling and the total-order tie-break matter.
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(3 + rnd.nextInt(6)) {
        val w = Seq.fill(1 + rnd.nextInt(6))(if (rnd.nextBoolean()) "a" else "b").mkString
        Seq.fill(1 + rnd.nextInt(4))(w)
      }.flatten
      val dir = java.nio.file.Files.createTempDirectory(s"q189p$seed").toString
      Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
        .write.parquet(s"$dir/documents.parquet")
      val (wantStats, wantInv) = bpeBrute(words, TokenizerQueries.Rounds)
      assert(run(dir).toSeq == wantStats, s"seed=$seed stats")
      val inv = TokenizerQueries.q191.run(spark, dir).collect()
        .map(r => r.getAs[String]("sym") -> r.getAs[Long]("freq")).toMap
      assert(inv == wantInv, s"seed=$seed inventory")
    }
  }

  test("q189/q191: a fully merged corpus stops learning but keeps its vocabulary") {
    val dir = java.nio.file.Files.createTempDirectory("q189stop").toString
    // 'ab' x3 merges to one symbol in round 1; rounds 2-5 have no pairs.
    // The learner must emit ONE stats row and q191 must still see the
    // final single-symbol vocabulary (the empty-best left-join guard).
    Seq((1L, "ab ab ab")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = run(dir)
    assert(rows.toSeq == Seq((1L, "a", "b", "ab", 3L, 3L)))
    val inv = TokenizerQueries.q191.run(spark, dir).collect()
      .map(r => r.getAs[String]("sym") -> r.getAs[Long]("freq")).toMap
    assert(inv == Map("ab" -> 3L))
  }

  test("tokenize: applies the learned vocab per word-position, chars for OOV") {
    val dir = java.nio.file.Files.createTempDirectory("q189tok").toString
    Seq((1L, "banana bandana banana")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    // learned vocab after 5 rounds on this corpus; apply to a NEW doc
    // mixing known words (their learned tokenizations, in order) and
    // an OOV word (character fallback)
    val vocab = {
      // private learn() isn't exposed; rebuild the final vocab the
      // public way — q191's underlying frame is (sym,freq), so derive
      // (w, sp) from a learn-equivalent: run q189 for merges, then
      // apply them to words by the same replace chain
      import org.apache.spark.sql.functions._
      val merges = TokenizerQueries.q189.run(spark, dir)
        .select("left_sym", "right_sym").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val base = spark.createDataFrame(Seq(Tuple1("banana"), Tuple1("bandana")))
        .toDF("w")
        .withColumn("sp", regexp_replace(col("w"), "(.)", " $1 "))
      merges.foldLeft(base) { case (df, (x, y)) =>
        df.withColumn("sp",
          regexp_replace(col("sp"),
            java.util.regex.Pattern.quote(s" $x  $y "), s" ${x}${y} "))
      }
    }
    val docs = Seq((9L, "banana zebra bandana")).toDF("doc_id", "text")
    val out = TokenizerQueries.tokenize(docs, vocab).collect().head
    val toks = out.getAs[scala.collection.Seq[String]]("tokens").toSeq
    // word order preserved; zebra (OOV) → chars; known words use vocab
    assert(toks.mkString("") == "bananazebrabandana")
    assert(toks.containsSlice(Seq("z", "e", "b", "r", "a")))
    assert(out.getAs[Long]("n_tokens") == toks.length.toLong)
    // the known words' spans match their vocab tokenizations
    val vmap = vocab.collect().map(r =>
      r.getString(0) -> r.getString(1).trim.split("  ").toSeq).toMap
    assert(toks.startsWith(vmap("banana")) && toks.endsWith(vmap("bandana")))
  }

  test("q191: inventory conserves token and character mass against q189") {
    val dir = java.nio.file.Files.createTempDirectory("q191fix").toString
    Seq((1L, "banana bandana split split splits"), (2L, "banana split"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val inv = TokenizerQueries.q191.run(spark, dir).collect()
      .map(r => r.getAs[String]("sym") -> r.getAs[Long]("freq"))
    // ordered by freq desc then sym asc
    assert(inv.sortBy { case (s, f) => (-f, s) }.toSeq == inv.toSeq)
    // token mass: Σ freq == corpus tokens after the final learned merge
    val lastTokens = run(dir).last._6
    assert(inv.map(_._2).sum == lastTokens)
    // character mass: Σ freq·len(sym) == Σ chars over the corpus words
    val chars = Seq("banana", "bandana", "split", "split", "splits", "banana", "split")
      .map(_.length).sum
    assert(inv.map { case (s, f) => s.length * f }.sum == chars)
  }
}
