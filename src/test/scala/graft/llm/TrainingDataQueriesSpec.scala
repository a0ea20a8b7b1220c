package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import graft.ops.Tables

/** Semantic invariants for the dataset-assembly operators q65–q70 (the
  * DuckDB oracle pins exact values; these pin the meaning).
  */
class TrainingDataQueriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nDocs = Tables.documents(spark, sfDir).count()

  test("q65: splits partition the corpus, shares near 80/10/10, assignment deterministic") {
    val rows = TrainingDataQueries.q65.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    assert(rows.values.sum == nDocs, "splits must partition the corpus exactly")
    val train = rows("train").toDouble / nDocs
    // binomial(500, .801) → σ ≈ 0.018; ±5σ keeps this deterministic-data safe
    assert(train > 0.71 && train < 0.89, s"train share $train far from 80.1%")
    // same id ⇒ same split on a re-run (no RNG state anywhere)
    val again = TrainingDataQueries.q65.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(again == rows)
  }

  test("q66: full-rate sources keep everything, downsampled sources keep a real subset") {
    val perSource = Tables.documents(spark, sfDir)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val kept = TrainingDataQueries.q66.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    val full = perSource.keySet -- TrainingDataQueries.low -- TrainingDataQueries.mid
    full.foreach(src =>
      assert(kept.get(src).contains(perSource(src)), s"full-rate $src must keep all docs"))
    val lowKept = TrainingDataQueries.low.map(kept.getOrElse(_, 0L)).sum.toDouble
    val lowTotal = TrainingDataQueries.low.map(perSource(_)).sum.toDouble
    val midKept = TrainingDataQueries.mid.map(kept.getOrElse(_, 0L)).sum.toDouble
    val midTotal = TrainingDataQueries.mid.map(perSource(_)).sum.toDouble
    assert(lowKept / lowTotal < midKept / midTotal,
      s"10% tier (${lowKept / lowTotal}) must keep less than 50% tier (${midKept / midTotal})")
    assert(lowKept > 0 || lowTotal < 20, "a ~10% draw over ≥20 docs should keep something")
  }

  test("q68: digit counts agree with a direct recomputation; redacted ⊆ events") {
    val rows = TrainingDataQueries.q68.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_redacted") <= r.getAs[Long]("n_events"))
    }
    val total = rows.map(_.getAs[Long]("n_digit_chars")).sum
    val direct = Tables.events(spark, sfDir)
      .select(sum(length(col("props")) -
        length(regexp_replace(col("props"), "[0-9]", ""))).cast("long"))
      .as[Long].head()
    assert(total == direct && total > 0L, s"digit chars $total vs direct $direct")
  }

  test("q69: chunks tile every document — strides anchored, sizes capped, tail exact") {
    val chunks = TrainingDataQueries.q69.run(spark, sfDir)
    val perDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("start") + col("chunk_tokens") - 1L).as("covered"),
      max("chunk_tokens").as("max_ct"),
      min("start").as("first_start"),
    )
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TF.tokenCountWs(col("text")).as("n_tok"))
    val joined = perDoc.join(toks, "doc_id").collect()
    assert(joined.length == nDocs, "every document must produce chunks")
    joined.foreach { r =>
      val (n, covered, maxCt, first, nTok) = (
        r.getAs[Long]("n_chunks"), r.getAs[Long]("covered"),
        r.getAs[Long]("max_ct"), r.getAs[Long]("first_start"), r.getAs[Long]("n_tok"))
      assert(first == 1L, "chunking must anchor at token 1")
      assert(maxCt <= TrainingDataQueries.ChunkTokens)
      assert(covered == nTok, s"last chunk must end exactly at the last token: $r")
      val expected = (nTok - 1) / TrainingDataQueries.ChunkStride + 1
      assert(n == expected, s"⌈n/stride⌉ chunk count: got $n want $expected for $nTok tokens")
    }
    // content pin: recompute one doc's first chunk by hand
    val doc = Tables.documents(spark, sfDir).orderBy("doc_id")
      .select("doc_id", "text").as[(Long, String)].head()
    val hand = java.security.MessageDigest.getInstance("MD5")
      .digest(doc._2.split(" ", -1).take(TrainingDataQueries.ChunkTokens).mkString(" ")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = chunks.where(col("doc_id") === doc._1 && col("start") === 1)
      .select("chunk_md5").as[String].head()
    assert(got == hand, "first chunk content must be the first 64 tokens verbatim")
  }

  test("q75: exact contamination implies prefix contamination; counts bounded by split size") {
    val rows = TrainingDataQueries.q75.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("split")).sorted.toSeq == Seq("test", "val"))
    rows.foreach { r =>
      val (n, ex, pf) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_exact_contam"), r.getAs[Long]("n_prefix_contam"))
      assert(ex <= pf, "identical text ⇒ identical prefix, so exact ⊆ prefix")
      assert(pf <= n && ex >= 0)
    }
    // the splits seen here must be q65's partition of the corpus
    val n65 = TrainingDataQueries.q65.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_docs") == n65(r.getAs[String]("split")),
        "q75 must evaluate the same split assignment as q65"))
  }

  test("q77: at most K per source, deterministic selection, ranks contiguous") {
    val rows = TrainingDataQueries.q77.run(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val totals = Tables.documents(spark, sfDir)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    totals.foreach { case (src, n) =>
      val kept = bySource.get(src).map(_.length).getOrElse(0)
      assert(kept == math.min(n, TrainingDataQueries.DomainCap.toLong),
        s"$src: cap must bind exactly")
    }
    bySource.foreach { case (src, rs) =>
      val ranks = rs.map(_.getAs[Long]("rn")).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq, s"$src ranks not contiguous: $ranks")
    }
    val again = TrainingDataQueries.q77.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(again == rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet,
      "selection must be identical across runs (hash rank, no RNG)")
  }

  test("q78: coverage thresholds are monotone and bounded by the vocabulary") {
    val r = TrainingDataQueries.q78.run(spark, sfDir).head()
    val (t50, t90, t95, t99, nTypes, nTokens) = (
      r.getAs[Long]("types_50"), r.getAs[Long]("types_90"), r.getAs[Long]("types_95"),
      r.getAs[Long]("types_99"), r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"))
    assert(t50 >= 1 && t50 <= t90 && t90 <= t95 && t95 <= t99 && t99 <= nTypes,
      s"coverage curve must be monotone: $t50 $t90 $t95 $t99 $nTypes")
    assert(nTokens >= nTypes, "token stream at least as large as its vocabulary")
    // cross-check totals against a direct count
    val direct = Tables.documents(spark, sfDir)
      .select(explode(TF.words(lower(col("text")))).as("w")).where(col("w") =!= "")
    assert(direct.count() == nTokens)
    assert(direct.distinct().count() == nTypes)
  }

  test("q79: lift agrees with a direct recomputation for every reported pair") {
    val rows = TrainingDataQueries.q79.run(spark, sfDir).collect()
    assert(rows.nonEmpty, "the word-salad corpus repeats phrases; expected collocations")
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (_, t) => t.toLowerCase.split(" ", -1).toSeq }
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTok = toks.map(_.size.toLong).sum
    val bi = toks.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val (a, b, nab, lift) = (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("nab"), r.getAs[Double]("lift"))
      assert(bi((a, b)) == nab, s"pair count for ($a,$b)")
      val expect = nab.toDouble * nTok / (uni(a) * uni(b))
      assert(math.abs(lift - expect) < 1e-5, s"lift for ($a,$b): $lift vs $expect")
      assert(lift > 1.5 && nab >= TrainingDataQueries.MinPairCount)
    }
  }

  test("q86: keep_doc really is each cluster's longest member; sizes agree with q76") {
    val kept = TrainingDataQueries.q86.run(spark, sfDir).collect()
    val clusters = TrainingDataQueries.q76.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("keep_doc") -> r.getAs[Long]("n_docs")).toMap
    assert(kept.map(_.getAs[Long]("cluster")).toSet == clusters.keySet,
      "q86 must cover exactly q76's clusters")
    val chars = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    kept.foreach { r =>
      assert(r.getAs[Long]("n_docs") == clusters(r.getAs[Long]("cluster")), "size parity with q76")
      assert(chars(r.getAs[Long]("keep_doc")) == r.getAs[Long]("keep_chars"))
    }
    // the winner is maximal: no cluster member is longer (recompute membership)
    val pairs = TextPipeline.exactJaccardPairs(
      Tables.documents(spark, sfDir).select("doc_id", "text"), 3, 0.5).select("da", "db")
    val members = graft.ops.Components.connectedComponents(pairs, "da", "db")
      .as[(Long, Long)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    kept.foreach { r =>
      val best = members(r.getAs[Long]("cluster"))
        .map(v => (chars(v), -v)).max // (n_chars desc, id asc) winner
      assert((chars(r.getAs[Long]("keep_doc")), -r.getAs[Long]("keep_doc")) == best,
        s"keep_doc must be the (longest, smallest-id) member for ${r}")
    }
  }

  test("q70: packs conserve tokens and docs; pack ids are contiguous from 0") {
    val packs = TrainingDataQueries.q70.run(spark, sfDir).collect()
    val bySource = packs.groupBy(_.getAs[String]("source"))
    val truth = Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(TF.tokenCountWs(col("text"))).as("tok"))
      .collect().map(r =>
        r.getAs[String]("source") -> (r.getAs[Long]("n"), r.getAs[Long]("tok"))).toMap
    bySource.foreach { case (src, rows) =>
      val ids = rows.map(_.getAs[Long]("pack_id")).sorted.toSeq
      assert(ids == (0L until ids.length).toSeq, s"$src pack ids not contiguous: $ids")
      assert(rows.map(_.getAs[Long]("n_docs")).sum == truth(src)._1, s"$src doc conservation")
      assert(rows.map(_.getAs[Long]("pack_tokens")).sum == truth(src)._2, s"$src token conservation")
      // every pack but the last must reach the budget before cutting
      // (a doc is assigned where it STARTS, so a pack only closes once
      // its cumulative stream passed the boundary)
      rows.sortBy(_.getAs[Long]("pack_id")).dropRight(1).zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("pack_tokens") > 0L, s"$src pack $i empty")
      }
    }
  }

  test("q134: weights are floored sqrt micro-units; probabilities sum to 1 within floor slack") {
    val rows = TrainingDataQueries.q134.run(spark, sfDir).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_chars")
      assert(r.getAs[Long]("weight_micro") ==
        math.floor(math.sqrt(n.toDouble) * 1e6).toLong)
    }
    // Σ floor-divided probabilities loses < 1 micro-unit per source
    val pSum = rows.map(_.getAs[Long]("p_micro")).sum
    assert(pSum <= 1000000L && pSum > 1000000L - rows.length, s"p_micro sum $pSum")
    // temperature flattening: the largest source's probability share
    // must not exceed its raw char share (α < 1 shrinks heavy sources)
    val tot = rows.map(_.getAs[Long]("n_chars")).sum
    val big = rows.maxBy(_.getAs[Long]("n_chars"))
    assert(big.getAs[Long]("p_micro").toDouble / 1e6 <=
      big.getAs[Long]("n_chars").toDouble / tot + 1e-9)
  }

  test("q149 counts only dup pairs that STRADDLE a split boundary, keyed by the canonical pair") {
    val dir = java.nio.file.Files.createTempDirectory("q149fix").toString
    // split assignments are a pure function of doc_id (q65 rule):
    // 1 → val, 2 → train, 3 → train, 22 → test, 8/9 → train.
    // dup family A straddles train/val (2,1); family B straddles
    // train/test (3,22); family C (8,9) is train-train — NOT a leak.
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "one two three four five six seven"
    val c = "red orange yellow green blue indigo"
    Seq(
      (1L, a, "val-dup"), (2L, a, "train-dup"),
      (3L, b, "train-dup"), (22L, b, "test-dup"),
      (8L, c, "same-split"), (9L, c, "same-split"),
      (30L, "totally unrelated text about nothing shared here", "filler"),
    ).toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val r = TrainingDataQueries.q149.run(spark, dir).collect()
      .map(x => (x.getAs[String]("split_a"), x.getAs[String]("split_b")) ->
        x.getAs[Long]("n_leaks")).toMap
    assert(r == Map(("test", "train") -> 1L, ("train", "val") -> 1L))
  }

  test("q164: padding waste is ceil-to-512 capacity minus tokens, per source") {
    val dir = java.nio.file.Files.createTempDirectory("q164fix").toString
    def doc(n: Int): String = Seq.fill(n)("a").mkString(" ")
    // s1: 100 tokens (cap 512, waste 412) + 512 tokens (cap 512, waste 0)
    // s2: 513 tokens (cap 1024, waste 511)
    Seq((1L, doc(100), "s1"), (2L, doc(512), "s1"), (3L, doc(513), "s2"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val r = TrainingDataQueries.q164.run(spark, dir).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"),
          x.getAs[Long]("n_padding"), x.getAs[Long]("capacity"),
          x.getAs[Long]("waste_bp"))).toMap
    assert(r == Map(
      "s1" -> ((2L, 612L, 412L, 1024L, 4023L)),
      "s2" -> ((1L, 513L, 511L, 1024L, 4990L))))
  }

  test("q173: hand water-fill level; brute force confirms the cap is maximal at sf") {
    val dir = java.nio.file.Files.createTempDirectory("q173fix").toString
    def doc(n: Int): String = Seq.fill(n)("a").mkString(" ")
    // counts 1/5/10, budget ⌊0.6·16⌋ = 9 → τ = 4: alloc 1+4+4 = 9
    Seq((1L, doc(1), "s1"), (2L, doc(5), "s2"), (3L, doc(10), "s3"))
      .toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")
    val r = TrainingDataQueries.q173.run(spark, dir).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("alloc_tokens"), x.getAs[Boolean]("capped"))).toMap
    assert(r == Map("s1" -> ((1L, false)), "s2" -> ((4L, true)), "s3" -> ((4L, true))))

    // optimality on real data: capacity(τ) ≤ B < capacity(τ+1)
    val rows = TrainingDataQueries.q173.run(spark, sfDir).collect()
      .map(x => (x.getAs[Long]("n_tokens"), x.getAs[Long]("alloc_tokens"),
        x.getAs[Boolean]("capped")))
    val budget = (6L * rows.map(_._1).sum) / 10L
    assert(rows.map(_._2).sum <= budget, "allocation must fit the budget")
    val capped = rows.filter(_._3)
    assert(capped.nonEmpty, "a 60% budget must cap the largest sources")
    val tau = capped.map(_._2).max
    assert(capped.forall(_._2 == tau), "all capped sources sit at the water level")
    val capacityUp = rows.map(r => math.min(r._1, tau + 1)).sum
    assert(capacityUp > budget, s"cap $tau must be maximal (τ+1 capacity $capacityUp ≤ $budget)")
  }

  test("q174: P05/P95 bounds and clip mass on a 1..20 length ladder") {
    val dir = java.nio.file.Files.createTempDirectory("q174fix").toString
    // lengths 1..20: lo = rank ⌈0.05·20⌉ = 1 → 1; hi = rank 19 → 19;
    // clipped: the length-20 doc, mass 20 − 19 = 1
    (1 to 20).map(i => (i.toLong, s"d$i", "s1", i.toLong))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = TrainingDataQueries.q174.run(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") == 20L)
    assert(row.getAs[Long]("p05_chars") == 1L && row.getAs[Long]("p95_chars") == 19L)
    assert(row.getAs[Long]("n_clipped") == 1L && row.getAs[Long]("clipped_char_mass") == 1L)
  }

  test("q193: sequential scrub — each PII class counted once, nothing leaks through") {
    val rows = TrainingDataQueries.q193.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (key, scrubbed) = (r.getAs[Long]("c_custkey"), r.getAs[String]("scrubbed"))
      // counts follow the deterministic fixture arithmetic exactly
      assert(r.getAs[Long]("n_emails") == (if (key % 3 > 0) 1L else 0L), s"key=$key")
      assert(r.getAs[Long]("n_phones") == (if (key % 2 == 0) 1L else 0L), s"key=$key")
      // the ref id is ALWAYS present and must be the only id counted —
      // an email's 9-digit run redacts as part of <EMAIL>, never as <ID>
      assert(r.getAs[Long]("n_ids") == 1L, s"key=$key")
      // nothing PII-shaped survives the scrub
      assert(!scrubbed.contains("@"), s"email leaked: $scrubbed")
      assert(!scrubbed.matches(".*[0-9]{5,}.*"), s"id leaked: $scrubbed")
      assert(scrubbed.contains("<ID>"))
      if (key % 3 > 0) assert(scrubbed.contains("<EMAIL>"))
      if (key % 2 == 0) assert(scrubbed.contains("<PHONE>"))
    }
  }

  test("q245 A-ES weighted sample: picks match hand-computed keys; heavy docs dominate") {
    val dir = java.nio.file.Files.createTempDirectory("q245fix").toString
    // 60 docs, weights: doc 1..50 have n_chars=10, docs 51..60 have
    // n_chars=100000 -> the ten heavy docs must all be inside a top-50
    // whose exact membership the in-JVM key recompute pins.
    val docs = (1L to 60L).map(i => (i, "s", if (i > 50) 100000L else 10L))
    docs.toDF("doc_id", "source", "n_chars").write.parquet(s"$dir/documents.parquet")

    def keyOf(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graft-wsample:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      math.log((h.toDouble + 0.5) / 4294967296.0) / w.toDouble
    }
    val expected = docs.map { case (i, _, w) => (i, keyOf(i, w)) }
      .sortBy { case (i, k) => (-k, i) }.take(50).map(_._1).sorted
    val got = graft.llm.TrainingDataQueries.q245.run(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got == expected)
    assert((51L to 60L).forall(got.contains), "all heavy docs must be selected")
  }

  test("q246 group k-fold: docs inherit their source's fold; the leakage audit is zero") {
    val dir = java.nio.file.Files.createTempDirectory("q246fix").toString
    val docs = (1L to 30L).map(i => (i, s"src${i % 3}", 100L))
    docs.toDF("doc_id", "source", "n_chars").write.parquet(s"$dir/documents.parquet")

    def foldOf(src: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graft-fold:$src".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 5
    }
    val expected = Seq("src0", "src1", "src2").groupBy(foldOf)
      .map { case (f, srcs) => f -> ((srcs.size.toLong, 10L * srcs.size, 1000L * srcs.size)) }
    val rows = graft.llm.TrainingDataQueries.q246.run(spark, dir).collect()
    val got = rows.map(r => r.getAs[Long]("fold") ->
      ((r.getAs[Long]("n_sources"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars")))).toMap
    assert(got == expected)
    assert(rows.forall(_.getAs[Long]("sources_multi_fold") == 0L),
      "no source may span folds")
  }

  test("q249 capture-recapture: Chapman arithmetic against an in-JVM recompute") {
    val dir = java.nio.file.Files.createTempDirectory("q249fix").toString
    val docs = (1L to 400L).map(i => (i, "s", 10L))
    docs.toDF("doc_id", "source", "n_chars").write.parquet(s"$dir/documents.parquet")

    def draw(salt: String, id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$salt$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.substring(0, 2) < "40"
    }
    val a = (1L to 400L).filter(draw("graft-capA:", _)).toSet
    val b = (1L to 400L).filter(draw("graft-capB:", _)).toSet
    val (n1, n2, m) = (a.size.toLong, b.size.toLong, (a intersect b).size.toLong)
    val est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val r = graft.llm.TrainingDataQueries.q249.run(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_capture1") == n1 && r.getAs[Long]("n_capture2") == n2)
    assert(r.getAs[Long]("n_overlap") == m)
    assert(r.getAs[Long]("n_estimated") == est)
    assert(r.getAs[Long]("n_true") == 400L)
    assert(r.getAs[Long]("err_bp") == 10000 * math.abs(est - 400) / 400)
    assert(m > 0, "fixture must produce an overlap for Chapman to be informative")
  }
}
