package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the classic BPE walkthrough corpus (Sennrich et al. 2016 §3.2
  // frequencies): low x5, lower x2, newest x6, widest x3
  private def corpus = Seq(
    1L -> (("low " * 5) + ("lower " * 2)).trim,
    2L -> (("newest " * 6) + ("widest " * 3)).trim
  ).toDF("doc_id", "text")

  test("wordTable compresses the corpus and splits to chars + sentinel") {
    val w = Bpe.wordTable(corpus, "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2))))
      .toMap
    assert(w.keySet === Set("low", "lower", "newest", "widest"))
    assert(w("low") === ((5L, Seq("l", "o", "w", "</w>"))))
    assert(w("newest")._1 === 6L)
  }

  test("pairCounts weights pairs by word frequency") {
    val p = Bpe.pairCounts(Bpe.wordTable(corpus, "text")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (e,s): newest x6 + widest x3 = 9; (l,o): low x5 + lower x2 = 7
    assert(p(("e", "s")) === 9L)
    assert(p(("s", "t")) === 9L)
    assert(p(("l", "o")) === 7L)
    assert(p(("w", "e")) === 8L) // lower x2 + newest x6
  }

  test("fit learns the textbook merge sequence deterministically") {
    val (merges, words) = Bpe.fit(corpus, "text", nMerges = 5)
    assert(merges.map(m => (m.rank, m.left, m.right, m.count)) === Seq(
      // count-9 three-way tie (e,s)/(s,t)/(t,</w>) breaks to (e,s)
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      // count-7 tie (l,o)/(o,w) breaks to (l,o)
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)))
    val seg = words.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg("low") === Seq("low", "</w>"))
    assert(seg("newest") === Seq("n", "e", "w", "est</w>"))
    assert(seg("widest") === Seq("w", "i", "d", "est</w>"))
    assert(seg("lower") === Seq("low", "e", "r", "</w>"))
  }

  test("mergeOnce is greedy left-to-right: no same-pass re-merge") {
    val df = Seq(Seq("a", "a", "a", "</w>")).toDF("sym")
    val got = df.select(Bpe.mergeOnce($"sym", "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(got === Seq("aa", "a", "</w>"),
      "merged symbol must not swallow the following 'a' in the same pass")
  }

  test("fit stops early when no pair reaches minCount") {
    val tiny = Seq(1L -> "ab cd").toDF("doc_id", "text")
    val (merges, _) = Bpe.fit(tiny, "text", nMerges = 10, minCount = 2L)
    assert(merges.isEmpty, "all pairs are singletons at minCount=2")
  }

  test("merge table round-trips through parquet in training order") {
    val (merges, _) = Bpe.fit(corpus, "text", nMerges = 5)
    val dir = java.nio.file.Files
      .createTempDirectory("bpe_store").toString + "/merges"
    Bpe.writeMerges(spark, merges, dir)
    assert(Bpe.readMerges(spark, dir) === merges)
  }

  test("stored merges reproduce the training segmentation exactly") {
    val (merges, trained) = Bpe.fit(corpus, "text", nMerges = 5)
    val replayed = Bpe.segmentCorpus(corpus, "text", merges)
    val t = trained.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val g = replayed.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(g === t, "greedy re-apply must equal the training fold")
  }

  test("decodeSym inverts segmentation for every corpus word and unseen text") {
    import org.apache.spark.sql.functions.col
    val (merges, trained) = Bpe.fit(corpus, "text", nMerges = 5)
    // fitted words: decode(sym) == word for the whole training table
    val bad = trained
      .withColumn("decoded", Bpe.decodeSym(col("sym")))
      .filter(col("decoded") =!= col("word")).count()
    assert(bad === 0L)
    // unseen words through the open-vocab encode path
    val unseen = Seq(9L -> "lowest zz widestest").toDF("doc_id", "text")
    val segs = Bpe.segmentCorpus(unseen, "text", merges)
    val badUnseen = segs.withColumn("decoded", Bpe.decodeSym(col("sym")))
      .filter(col("decoded") =!= col("word")).count()
    assert(badUnseen === 0L)
  }

  test("decodeStream reproduces the space-joined token text across words") {
    import org.apache.spark.sql.functions.{col, flatten, collect_list}
    val (merges, _) = Bpe.fit(corpus, "text", nMerges = 5)
    val stream = Seq("low", "lowest", "zz").map(w =>
      Bpe.segmentWord(w, merges)).reduce(_ ++ _)
    val out = Seq(Tuple1(stream)).toDF("syms")
      .select(Bpe.decodeStream(col("syms")).as("txt"))
      .as[String].collect()(0)
    assert(out === "low lowest zz")
  }

  test("segmentWord on UNSEEN text composes learned merges (\"lowest\")") {
    val (merges, _) = Bpe.fit(corpus, "text", nMerges = 5)
    // the textbook generalization: 'lowest' never occurs in training,
    // yet the low + est</w> merges compose
    assert(Bpe.segmentWord("lowest", merges) === Seq("low", "est</w>"))
    assert(Bpe.segmentWord("zz", merges) === Seq("z", "z", "</w>"))
  }

  test("rank-indexed MergeTable == linear segmentWord on fitted AND " +
    "unseen words (textbook fixture)") {
    val (merges, trained) = Bpe.fit(corpus, "text", nMerges = 5)
    val table = new Bpe.MergeTable(merges)
    val fitted = trained.collect().map(_.getString(0))
    val probes = fitted ++ Seq("lowest", "zz", "widestest", "a", "",
      "newestnewest", "wwwww", "loloest")
    for (w <- probes)
      assert(table.segment(w) === Bpe.segmentWord(w, merges), s"word=$w")
  }

  test("rank-indexed MergeTable == linear segmentWord under ARBITRARY " +
    "(even non-training-order) merge tables and random words") {
    // the floored min-rank kernel claims unconditional equivalence to
    // the in-order scan — so the pin uses adversarial tables a trainer
    // would never emit: pairs over a tiny alphabet in random order,
    // duplicate pairs at different ranks, merges whose inputs only
    // exist mid-segmentation
    val rnd = new scala.util.Random(1337L)
    val alpha = Seq("a", "b", "c", "</w>")
    for (trial <- 1 to 20) {
      val syms = scala.collection.mutable.ArrayBuffer[String](alpha: _*)
      val merges = (1 to 30).map { r =>
        val l = syms(rnd.nextInt(syms.length))
        val x = syms(rnd.nextInt(syms.length))
        syms += (l + x)
        Bpe.Merge(r, l, x, l + x, 1L)
      }
      val table = new Bpe.MergeTable(merges)
      for (_ <- 1 to 50) {
        val w = Seq.fill(1 + rnd.nextInt(12))(
          ('a' + rnd.nextInt(3)).toChar).mkString
        assert(table.segment(w) === Bpe.segmentWord(w, merges),
          s"trial=$trial word=$w merges=$merges")
      }
    }
  }

  test("vocab and encodeCounts reconcile; OOV falls back to chars") {
    val (_, words) = Bpe.fit(corpus, "text", nMerges = 5)
    val v = Bpe.vocab(words).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // 'low' symbol occurs in low(5) + lower(2)
    assert(v("low") === 7L)
    assert(v("est</w>") === 9L)
    val enc = Bpe.encodeCounts(
      Seq(10L -> "low lower zzz").toDF("doc_id", "text"),
      "doc_id", "text", words).head()
    // low: [low,</w>]=2, lower: [low,e,r,</w>]=4, zzz OOV: 3 chars+1=4
    assert((enc.getLong(1), enc.getLong(2)) === ((3L, 10L)))
  }

  test("fertilityBySource: integer centi-arithmetic on summed counts, " +
    "OOV-heavy sources read worse") {
    val (_, words) = Bpe.fit(corpus, "text", nMerges = 5)
    val probes = Seq(
      // seen vocab: low=2, lower=4 subwords over 2 words → 300
      (1L, "low lower", "seen"),
      // OOV chars+sentinel: zzz=4, qq=3 over 2 words → 350
      (2L, "zzz qq", "oov"),
      // empty source: fertility undefined (NULL), counts zero
      (3L, "   ", "blank"))
      .toDF("doc_id", "text", "source")
    val got = Bpe.fertilityBySource(probes, "doc_id", "text", "source",
        words)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got("seen") === ((1L, 2L, 6L, 300L)))
    assert(got("oov") === ((1L, 2L, 7L, 350L)))
    assert(got("blank") === ((1L, 0L, 0L, -1L)))
  }

  test("encodeCounts gives every doc a row, zero-token docs included") {
    val (_, words) = Bpe.fit(corpus, "text", nMerges = 2)
    val got = Bpe.encodeCounts(
      Seq(1L -> "low", 2L -> "", 3L -> "   ").toDF("doc_id", "text"),
      "doc_id", "text", words).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(2L) === ((0L, 0L)))
    assert(got(3L) === ((0L, 0L)))
  }

  private def finalSeg(words: org.apache.spark.sql.DataFrame) =
    words.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap

  test("strict fitBatched == fit on the textbook fixture at every " +
    "batch size") {
    val (seqMerges, seqWords) = Bpe.fit(corpus, "text", nMerges = 5)
    for (m <- Seq(1, 2, 3, 64)) {
      val (batMerges, batWords) = Bpe.fitBatched(corpus, "text",
        nMerges = 5, batchTopM = m, strict = true)
      assert(batMerges === seqMerges, s"batchTopM=$m merge list diverged")
      assert(finalSeg(batWords) === finalSeg(seqWords),
        s"batchTopM=$m final segmentation diverged")
    }
  }

  test("strict fitBatched == fit on randomized corpora (the " +
    "safety-bound pin)") {
    // deterministic pseudo-random corpora over a small alphabet: lots
    // of count ties, truncation-floor hits and overlapping candidates
    // — the cases where an unguarded batch diverges from sequential
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val docs = Seq.tabulate(40) { i =>
        val w = Seq.fill(3 + rnd.nextInt(5))(
          Seq.fill(2 + rnd.nextInt(4))(
            ('a' + rnd.nextInt(4)).toChar).mkString).mkString(" ")
        (i.toLong, w)
      }.toDF("doc_id", "text")
      val (seqMerges, seqWords) = Bpe.fit(docs, "text", nMerges = 12)
      val (batMerges, batWords) = Bpe.fitBatched(docs, "text",
        nMerges = 12, batchTopM = 8, strict = true)
      assert(batMerges === seqMerges, s"trial $trial merge list diverged")
      assert(finalSeg(batWords) === finalSeg(seqWords),
        s"trial $trial final segmentation diverged")
    }
  }

  test("greedy fitBatched round 1 on the textbook fixture is the " +
    "hand-computed symbol-disjoint prefix") {
    // sorted candidates: (e,s,9),(s,t,9),(t,</w>,9),(w,e,8),(l,o,7),
    // (o,w,7),(e,w,6),(n,e,6),(w,</w>,5),(d,e,3),(i,d,3),(w,i,3),...
    // greedy symbol-disjoint: (e,s) keep; (s,t) skip [s]; (t,</w>)
    // keep; (w,e) skip [e]; (l,o) keep; (o,w)/(e,w)/(n,e)/(w,</w>)
    // skip; (d,e) skip [e]; (i,d) keep — the chain successor (es,t)
    // does not exist yet, so the round takes the disjoint pairs at
    // their exact sequential-given counts
    val (merges, _) = Bpe.fitBatched(corpus, "text", nMerges = 4)
    assert(merges.map(m => (m.rank, m.left, m.right, m.count)) === Seq(
      (1, "e", "s", 9L),
      (2, "t", "</w>", 9L),
      (3, "l", "o", 7L),
      (4, "i", "d", 3L)))
  }

  test("greedy fitBatched cuts aggregate rounds >= 4x on the documents " +
    "corpus; chains still resolve") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
    val n = 64
    val (merges, words, rounds) =
      Bpe.fitBatchedCounted(docs, "text", nMerges = n, batchTopM = 64)
    assert(merges.length === n)
    assert(merges.map(_.rank) === (1 to n))
    // sequential runs n aggregate rounds; the batch must do <= n/4
    assert(rounds * 4 <= n,
      s"expected <= ${n / 4} rounds for $n merges, got $rounds")
    // the trained table segments every word into learned symbols
    val vocabSyms = Bpe.vocab(words).collect().map(_.getString(0)).toSet
    assert(vocabSyms.nonEmpty)
  }
}
