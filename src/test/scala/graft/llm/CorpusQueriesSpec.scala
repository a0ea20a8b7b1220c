package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("incrementalCascade finds exactly the cross near-dup pairs on a fixture") {
    // A≈C (one word changed in 12 → high jaccard), B and D unrelated
    val a = "the quick brown fox jumps over the lazy dog near the river"
    val c = "the quick brown fox jumps over the lazy cat near the river"
    val base = Seq((1L, a), (2L, "completely different words about spark shuffles and joins every day")).toDF("doc_id", "text")
    val inc = Seq((10L, c), (11L, "unrelated incoming text mentioning parquet scans and bloom filters only")).toDF("doc_id", "text")
    val got = TextPipeline.incrementalCascade(base, inc).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("incoming_doc") == 10L)
    assert(got.head.getAs[Long]("base_doc") == 1L)
    assert(got.head.getAs[Double]("jac") >= 0.5)
  }

  test("incrementalCascade never pairs base with base or incoming with incoming") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // two identical docs on the SAME side must not appear in output
    val base = Seq((1L, dup), (2L, dup)).toDF("doc_id", "text")
    val inc = Seq((10L, "totally different tokens with zero overlap whatsoever in any shingle xyz")).toDF("doc_id", "text")
    assert(TextPipeline.incrementalCascade(base, inc).isEmpty)
  }

  test("incrementalCascade agrees with exactJaccardPairs restricted to cross pairs") {
    val docs = graft.ops.Tables.documents(spark, sfDir).select("doc_id", "text")
    val isInc = substring(md5(concat(lit("graft-batch:"), col("doc_id").cast("string"))), 1, 2) >= "c0"
    val base = docs.where(!isInc)
    val inc = docs.where(isInc)
    val got = TextPipeline.incrementalCascade(base, inc)
      .select(col("incoming_doc"), col("base_doc"))
      .as[(Long, Long)].collect().toSet
    // ground truth: the full exact operator over everything, filtered
    // to pairs that straddle the split (da < db in exactJaccardPairs,
    // so normalize to (incoming, base))
    val incIds = inc.select("doc_id").as[Long].collect().toSet
    val want = TextPipeline.exactJaccardPairs(docs, 3, 0.5)
      .select(col("da"), col("db")).as[(Long, Long)].collect()
      .flatMap { case (da, db) =>
        (incIds(da), incIds(db)) match {
          case (true, false) => Some((da, db))
          case (false, true) => Some((db, da))
          case _             => None
        }
      }.toSet
    assert(got == want)
  }

  test("q91 picks the rarest token, lexicographic on df ties") {
    val df = Seq(
      (1L, "common rare common", "en", "s", 0L),
      (2L, "common zebra aardvark", "en", "s", 0L), // zebra/aardvark both df=1 → aardvark
      (3L, "common common common", "en", "s", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("rarefix").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CorpusQueries.q91.run(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> (x.getAs[String]("term"), x.getAs[Long]("df"))).toMap
    assert(r(1L) == ("rare", 1L))
    assert(r(2L) == ("aardvark", 1L))
    assert(r(3L) == ("common", 3L))
  }

  test("q92 centroid is the exact fixed-point mean per (label, dim)") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f), 7),
      (2L, Seq(2.0f, 3.0f), 7),
      (3L, Seq(10.0f, 10.0f), 8),
    ).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("centfix").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = CorpusQueries.q92.run(spark, dir).collect()
      .map(x => (x.getAs[Int]("label"), x.getAs[Long]("dim")) -> x.getAs[Double]("centroid")).toMap
    assert(r((7, 1L)) == 1.5)
    assert(r((7, 2L)) == 0.5)
    assert(r((8, 1L)) == 10.0)
  }

  test("containmentPairs catches a quoted subset that Jaccard misses") {
    val para = "the quick brown fox jumps over the lazy dog by the quiet river bank today"
    val big = para + " " + (1 to 60).map(i => s"filler$i").mkString(" ")
    val docs = Seq((1L, para), (2L, big)).toDF("doc_id", "text")
    val cont = TextPipeline.containmentPairs(docs, 3, 0.8).collect()
    assert(cont.length == 1)
    val row = cont.head
    assert(row.getAs[Long]("da") == 1L && row.getAs[Long]("db") == 2L)
    assert(row.getAs[Double]("cont_a_in_b") == 1.0) // para fully inside big
    assert(row.getAs[Double]("cont_b_in_a") < 0.5)
    // and the Jaccard operator does NOT pair them at its 0.5 threshold
    assert(TextPipeline.exactJaccardPairs(docs, 3, 0.5).isEmpty)
  }

  test("containmentBlocked equals the exact operator on the corpus and the quoted-subset fixture") {
    val docs = graft.ops.Tables.documents(spark, sfDir).select("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("da", "db").as[(Long, Long)].collect().toSet
    assert(pairs(TextPipeline.containmentBlocked(docs, 3, 0.8, maxDf = 5)) ==
      pairs(TextPipeline.containmentPairs(docs, 3, 0.8)))
    val para = "the quick brown fox jumps over the lazy dog by the quiet river bank today"
    val big = para + " " + (1 to 60).map(i => s"filler$i").mkString(" ")
    val fix = Seq((1L, para), (2L, big)).toDF("doc_id", "text")
    assert(pairs(TextPipeline.containmentBlocked(fix, 3, 0.8, maxDf = 5)) == Set((1L, 2L)))
  }

  test("q89 flags repetitive docs and passes diverse ones") {
    val spam = (1 to 30).map(_ => "buy cheap pills").mkString(" ") // one bigram dominates
    val diverse = (1 to 90).map(i => s"w$i").mkString(" ") // all trigrams distinct
    val df = Seq(
      (1L, spam, "en", "spamsrc", spam.length.toLong),
      (2L, diverse, "en", "cleansrc", diverse.length.toLong),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("repfix").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CorpusQueries.q89.run(spark, dir).collect().map(x => x.getAs[String]("source") -> x).toMap
    assert(r("spamsrc").getAs[Long]("n_top2_flagged") == 1L)
    assert(r("spamsrc").getAs[Long]("n_dup3_flagged") == 1L)
    assert(r("cleansrc").getAs[Long]("n_top2_flagged") == 0L)
    assert(r("cleansrc").getAs[Long]("n_dup3_flagged") == 0L)
    assert(r("cleansrc").getAs[Double]("corpus_dup3_frac") == 0.0)
  }

  test("q137 counts a gram as duplicated only when another DOC carries it") {
    // docs 1 and 2 share exactly one 8-gram; doc 3 is disjoint; a doc
    // repeating its own gram twice must NOT self-duplicate (distinct
    // (doc, gram) before the df count)
    val shared = "a b c d e f g h"
    val df = Seq(
      (1L, s"$shared x1 x2", "src1"),
      (2L, s"$shared y1 y2", "src1"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10", "src2"),
    ).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("dupgramfix").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CorpusQueries.q137.run(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    // each of docs 1/2 has 3 grams, 1 shared → coverage 2/6; neither
    // doc passes the majority gate (2·1 > 3 is false)
    assert(r("src1").getAs[Long]("n_docs") == 2L)
    assert(r("src1").getAs[Long]("n_flagged") == 0L)
    assert(r("src1").getAs[Double]("dup_coverage") == 0.333333)
    assert(r("src2").getAs[Double]("dup_coverage") == 0.0)
  }

  test("q140 phases are equal-count (ANSI ntile) and conserve the corpus") {
    val rows = CorpusQueries.q140.run(spark, sfDir).collect()
    val perPhase = rows.groupBy(_.getAs[Long]("phase"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val total = perPhase.values.sum
    assert(total == graft.ops.Tables.documents(spark, sfDir).count())
    assert(perPhase.keySet == Set(1L, 2L, 3L, 4L))
    // ANSI ntile: sizes differ by at most 1, big buckets first
    val sizes = (1L to 4L).map(perPhase)
    assert(sizes.max - sizes.min <= 1, sizes.toString)
    assert(sizes == sizes.sortBy(-_), s"larger buckets must come first: $sizes")
  }

  test("q177: SNM candidates recover nearly all exact near-dup pairs on the corpus") {
    // SNM is a blocking strategy: its pairs must be a SUBSET of q30's
    // exact pairs (same verify threshold), and on this corpus the
    // length ordering should recover almost all of them.
    // q177 orients pairs by LENGTH RANK (da = shorter-ranked side);
    // normalize to id order for comparison with q30's canonical pairs
    val snm = CorpusQueries.q177.run(spark, sfDir).collect()
      .map { r =>
        val (x, y) = (r.getAs[Long]("da"), r.getAs[Long]("db"))
        (math.min(x, y), math.max(x, y))
      }.toSet
    val exact = LlmQueries.q30.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(snm.subsetOf(exact), s"SNM found non-near-dup pairs: ${snm -- exact}")
    assert(snm.size.toDouble >= 0.85 * exact.size,
      s"SNM recall ${snm.size}/${exact.size} below 85% — window or key regressed")
  }

  test("q177: adjacent-length duplicates are found; far-rank duplicates are the known miss") {
    val dir = java.nio.file.Files.createTempDirectory("q177fix").toString
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    // two identical docs, adjacent under the length order (ranked
    // behind 12 mutually-DISTINCT shorter spacer docs) — inside the
    // w=10 neighborhood
    val spacers = (10L to 21L).map(i =>
      (i, (1 to i.toInt).map(j => s"s${i}x$j").mkString(" "), 2 * i))
    val rows = Seq((1L, text, 100L), (2L, text, 100L)) ++ spacers
    rows.toDF("doc_id", "text", "n_chars").write.parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q177.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"), r.getAs[Double]("jaccard")))
    assert(got.toSeq == Seq((1L, 2L, 1.0)),
      "identical adjacent-rank docs must pair with Jaccard 1.0")
  }

  test("q178: hand bigram LM — repetitive doc scores below the rarer-sequence doc") {
    val dir = java.nio.file.Files.createTempDirectory("q178fix").toString
    import spark.implicits._
    // corpus: d1 = "x x x" (bigrams (x,x)*2), d2 = "x y". unigrams:
    // x:4 y:1 V=2. s(x,x) = floor(ln((4+2)/(2+1))*1e6) = 693147;
    // s(x,y) = floor(ln((4+2)/(1+1))*1e6) = 1098612.
    Seq((1L, "x x x"), (2L, "x y"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q178.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("bigram_surprisal_micro"))).toMap
    assert(got == Map(1L -> ((2L, 693147L)), 2L -> ((1L, 1098612L))))
  }

  test("q188: planted verbatim span is counted window-exactly; intra-doc repeats don't count") {
    val dir = java.nio.file.Files.createTempDirectory("q188fix").toString
    import spark.implicits._
    val span = (1 to 9).map(i => s"s$i").mkString(" ") // 9 shared tokens = 2 shared 8-windows
    // d1: span + 3 unique tokens (12 tokens, 5 windows, 2 shared)
    // d2: 2 unique + span (11 tokens, 4 windows, 2 shared)
    // d3: the same 8-token window TWICE within itself, nowhere else
    //     (17 tokens, 10 windows, 0 shared — intra-doc only)
    // d4: 8 tokens, all unique (1 window, 0 shared)
    Seq(
      (1L, s"$span u1 u2 u3"),
      (2L, s"v1 v2 $span"),
      (3L, ((1 to 8).map(i => s"r$i") ++ Seq("m") ++ (1 to 8).map(i => s"r$i")).mkString(" ")),
      (4L, (1 to 8).map(i => s"w$i").mkString(" ")),
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q188.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_shared"), r.getAs[Long]("dup_bp")))
      .toMap
    assert(got(1L) == ((5L, 2L, 4000L)))
    assert(got(2L) == ((4L, 2L, 5000L)))
    assert(got(3L) == ((10L, 0L, 0L)), "a window repeated only WITHIN one doc is not a dup")
    assert(got(4L) == ((1L, 0L, 0L)))
  }

  test("q219: scrub removes exactly what q214 flags, reconstruction is order-exact") {
    // audit/transform single-source contract on the corpus: per doc,
    // n_removed(q219) == n_flagged(q214), and kept text re-splits to
    // n_kept tokens in original order (verified on a planted fixture).
    val audit = CorpusQueries.q214.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_flagged")).toMap
    val scrub = CorpusQueries.q219.run(spark, sfDir).collect()
    assert(scrub.nonEmpty)
    scrub.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_removed") == audit(id),
        s"doc $id: scrub removed ${r.getAs[Long]("n_removed")} but audit flagged ${audit(id)}")
      val rebuilt = r.getAs[String]("text_out")
      val n = if (rebuilt.isEmpty) 0 else rebuilt.split(" ").length
      assert(n == r.getAs[Long]("n_kept"), s"doc $id: text_out token count mismatch")
    }
    // planted fixture: 5 docs share the boilerplate trigram run
    // "b1 b2 b3 b4" (df ≥ 5 ⇒ both trigrams hot ⇒ positions 0..3 all
    // covered); unique tails survive in order.
    val dir = java.nio.file.Files.createTempDirectory("q219fix").toString
    val rows = (1 to 5).map(i => (i.toLong, s"b1 b2 b3 b4 u${i}a u${i}b u${i}c"))
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q219.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("text_out"))).toMap
    (1 to 5).foreach { i =>
      assert(got(i.toLong) == ((4L, s"u${i}a u${i}b u${i}c")),
        s"doc $i scrub wrong: ${got(i.toLong)}")
    }
  }

  test("q216: keeps exactly the optimal quality-ranked prefix of the token budget") {
    val dir = java.nio.file.Files.createTempDirectory("q216fix").toString
    // 10 docs × 10 tokens in one source; doc i carries (10−i) 'spark'
    // tokens (+400000µ each) and i out-of-vocab fillers ⇒ logits
    // strictly decrease in i. Budget = 80% of 100 tokens ⇒ exactly the
    // 8 best docs fit; the 9th would cross the boundary.
    val rows = (0 until 10).map { i =>
      val text = (Seq.fill(10 - i)("spark") ++ (1 to i).map(j => s"zz$j")).mkString(" ")
      (i.toLong, text, "srcA")
    }
    rows.toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q216.run(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_docs") == 10L)
    assert(r.getAs[Long]("n_kept") == 8L, "budget boundary: exactly the 8 best docs fit in 80%")
    assert(r.getAs[Long]("tokens_total") == 100L)
    assert(r.getAs[Long]("tokens_kept") == 80L)
    // doc 7 (the worst kept) has 3 'spark' tokens: 3·400000 − 500000
    assert(r.getAs[Long]("cutoff_logit") == 700000L)
  }
}
