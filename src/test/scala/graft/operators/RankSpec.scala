package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // N = 4, dl = (3, 4, 1, 4), total = 12
  private def fixture = Seq(
    (1L, "cat dog dog"),
    (2L, "cat cat cat fish"),
    (3L, "bird"),
    (4L, "dog fish fish fish")
  ).toDF("doc_id", "text")

  /** The spec's own arithmetic: same exact-rational tf part
    * (22·total·tf / (10·total·tf + 3·total + 9·dl·N)) and idf family,
    * assembled with plain Scala doubles. */
  private def handScore(idf: Double => Double,
                        tfs: Seq[(Long, Long)], // (tf, df) per term
                        dl: Long, n: Long, total: Long): Long = {
    val s = tfs.map { case (tf, df) =>
      if (tf == 0L) 0.0
      else {
        val r = (2.0 * (n - df) + 1.0) / (2.0 * df + 1.0)
        val num = (22L * total * tf).toDouble
        val den = (10L * total * tf + 3L * total + 9L * dl * n).toDouble
        idf(r) * (num / den)
      }
    }.reduceLeft(_ + _)
    math.floor(s * 10000.0).toLong
  }

  test("ln tier matches hand-computed Lucene-variant BM25") {
    val rows = Rank.bm25(fixture, "doc_id", "text", Seq("dog", "fish"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ln = (r: Double) => math.log1p(r)
    // df_dog = 2, df_fish = 2
    val exp = Seq(
      (4L, 2L, handScore(ln, Seq((1L, 2L), (3L, 2L)), 4L, 4L, 12L)),
      (1L, 1L, handScore(ln, Seq((2L, 2L), (0L, 2L)), 3L, 4L, 12L)),
      (2L, 1L, handScore(ln, Seq((0L, 2L), (1L, 2L)), 4L, 4L, 12L)))
    assert(rows.toSeq === exp.sortBy(e => (-e._3, e._1)))
  }

  test("sqrt tier matches the same arithmetic under sqrt idf") {
    val rows = Rank.bm25(fixture, "doc_id", "text", Seq("dog", "fish"),
        idfMode = "sqrt")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val sq = (r: Double) => math.sqrt(r)
    assert(rows(4L) === handScore(sq, Seq((1L, 2L), (3L, 2L)), 4L, 4L, 12L))
    assert(rows(1L) === handScore(sq, Seq((2L, 2L), (0L, 2L)), 3L, 4L, 12L))
  }

  test("zero-hit docs are excluded and ranking is (score desc, id)") {
    val rows = Rank.bm25(fixture, "doc_id", "text", Seq("dog", "fish"))
      .select("id").as[Long].collect()
    assert(!rows.contains(3L), "no-hit doc must not appear")
    // doc 4 hits both terms incl. rare-ish fish 3x -> ranks first
    assert(rows.head === 4L)
  }

  test("topK caps the ranking") {
    assert(Rank.bm25(fixture, "doc_id", "text", Seq("dog", "fish"),
      topK = 1).count() === 1L)
  }

  test("rare terms outweigh common ones at equal tf and dl") {
    // 9 docs with "common", 1 with "rare"; probe doc has both once
    val docs = ((1L to 9L).map(i => (i, "common x y")) :+
      (10L, "rare x y") :+ (11L, "common rare y")).toDF("doc_id", "text")
    val byId = Rank.bm25(docs, "doc_id", "text", Seq("common", "rare"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // within doc 11 the rare term contributes more than the common one:
    // score(11) > 2 * score-of-common-only contribution at same dl
    val commonOnly = byId(1L)
    assert(byId(11L) > 2 * commonOnly,
      s"rare-term contribution should dominate: ${byId(11L)} vs $commonOnly")
  }

  test("plan has no generator and only the broadcast join") {
    val plan = Rank.bm25(fixture, "doc_id", "text", Seq("dog"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "tf must not explode tokens")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the only join is the 1-row broadcast stats")
  }

  private def withIndex[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("rank_spec")
    Rank.buildBm25Index(fixture, "doc_id", "text", dir.toString,
      nBuckets = 8)
    f(dir.toString)
  }

  test("stored-index serving is bit-identical to the corpus scan, " +
    "both idf tiers, unseen terms included") {
    withIndex { dir =>
      for (mode <- Seq("ln", "sqrt")) {
        val scan = Rank.bm25(fixture, "doc_id", "text",
          Seq("dog", "fish", "unseen"), idfMode = mode).collect().toSeq
        val served = Rank.bm25FromIndex(spark, dir,
          Seq("dog", "fish", "unseen"), idfMode = mode).collect().toSeq
        assert(served === scan, s"idfMode=$mode")
      }
    }
  }

  test("index probe prunes postings partitions on the term bucket") {
    withIndex { dir =>
      val plan = Rank.bm25FromIndex(spark, dir, Seq("dog"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("tb"),
        s"postings scan must carry a tb partition filter:\n$plan")
    }
  }

  test("appended index serves bit-identically to a from-scratch build " +
    "over the union") {
    val a = fixture.filter($"doc_id" <= 2L)
    val b = fixture.filter($"doc_id" > 2L)
    val incDir = java.nio.file.Files.createTempDirectory("rank_inc")
      .toString
    val fullDir = java.nio.file.Files.createTempDirectory("rank_full")
      .toString
    Rank.buildBm25Index(a, "doc_id", "text", incDir, nBuckets = 8)
    Rank.appendBm25Index(b, "doc_id", "text", incDir)
    Rank.buildBm25Index(fixture, "doc_id", "text", fullDir, nBuckets = 8)
    for (mode <- Seq("ln", "sqrt")) {
      val inc = Rank.bm25FromIndex(spark, incDir,
        Seq("dog", "fish"), idfMode = mode).collect().toSeq
      val full = Rank.bm25FromIndex(spark, fullDir,
        Seq("dog", "fish"), idfMode = mode).collect().toSeq
      assert(inc === full, s"idfMode=$mode")
    }
    // stats merged exactly: N = 4, total = 12
    val st = spark.read.parquet(s"$incDir/stats").head()
    assert(st.getAs[Long]("n_docs") === 4L)
    assert(st.getAs[Long]("total") === 12L)
  }

  test("removeFromBm25Index is the exact inverse of append: " +
    "remove(append(build(A), B), B) == build(A) on stores and probes") {
    val a = fixture.filter($"doc_id" <= 2L)
    val b = fixture.filter($"doc_id" > 2L)
    val rmDir = java.nio.file.Files.createTempDirectory("rank_rm").toString
    val aDir = java.nio.file.Files.createTempDirectory("rank_a").toString
    Rank.buildBm25Index(a, "doc_id", "text", rmDir, nBuckets = 8)
    Rank.appendBm25Index(b, "doc_id", "text", rmDir)
    Rank.removeFromBm25Index(b, "doc_id", "text", rmDir)
    Rank.buildBm25Index(a, "doc_id", "text", aDir, nBuckets = 8)
    // stats subtract exactly: N = 2, total = 7
    val st = spark.read.parquet(s"$rmDir/stats").head()
    assert(st.getAs[Long]("n_docs") === 2L &&
      st.getAs[Long]("total") === 7L)
    // store frames equal row-for-row
    assert(spark.read.parquet(s"$rmDir/doclen").collect().toSet ===
      spark.read.parquet(s"$aDir/doclen").collect().toSet)
    assert(spark.read.parquet(s"$rmDir/postings")
        .select($"term", $"id", $"tf", $"tb").collect().toSet ===
      spark.read.parquet(s"$aDir/postings")
        .select($"term", $"id", $"tf", $"tb").collect().toSet)
    // probes bit-identical, removed docs' terms included (df of "dog"
    // dropped from 2 to 1; "bird" — only carried by a removed doc —
    // now scores nothing)
    for (mode <- Seq("ln", "sqrt")) {
      val got = Rank.bm25FromIndex(spark, rmDir,
        Seq("dog", "fish", "bird", "cat"), idfMode = mode).collect().toSeq
      val want = Rank.bm25FromIndex(spark, aDir,
        Seq("dog", "fish", "bird", "cat"), idfMode = mode).collect().toSeq
      assert(got === want, s"idfMode=$mode")
    }
  }

  test("removeFromBm25Index validation: duplicate ids, unknown ids and " +
    "drifted text all refuse before anything mutates") {
    withIndex { dir =>
      val stBefore = spark.read.parquet(s"$dir/stats").collect().toSeq
      val e1 = intercept[IllegalArgumentException] {
        Rank.removeFromBm25Index(
          fixture.filter($"doc_id" === 1L).unionByName(
            fixture.filter($"doc_id" === 1L)), "doc_id", "text", dir)
      }
      assert(e1.getMessage.contains("duplicate ids"))
      val e2 = intercept[IllegalArgumentException] {
        Rank.removeFromBm25Index(
          Seq((99L, "cat dog dog")).toDF("doc_id", "text"),
          "doc_id", "text", dir)
      }
      assert(e2.getMessage.contains("not in the index"))
      val e3 = intercept[IllegalArgumentException] {
        Rank.removeFromBm25Index(
          Seq((1L, "cat dog dog EXTRA")).toDF("doc_id", "text"),
          "doc_id", "text", dir)
      }
      assert(e3.getMessage.contains("differ from the indexed doclen"))
      assert(spark.read.parquet(s"$dir/stats").collect().toSeq ===
        stBefore, "failed removals must not touch the store")
    }
  }

  test("removeFromBm25Index refuses an EQUAL-LENGTH term substitution " +
    "via the stored term-multiset hash (dl alone is blind to it)") {
    withIndex { dir =>
      val stBefore = spark.read.parquet(s"$dir/stats").collect().toSeq
      // doc 1 was indexed as "cat dog dog": same 3-token length,
      // different multiset — must refuse, not orphan dog's postings
      val e = intercept[IllegalArgumentException] {
        Rank.removeFromBm25Index(
          Seq((1L, "cat cat dog")).toDF("doc_id", "text"),
          "doc_id", "text", dir)
      }
      assert(e.getMessage.contains("differ from the indexed doclen"))
      // permutations of the SAME multiset are the same indexed text
      // as far as bag-of-words postings go — they must pass
      Rank.removeFromBm25Index(
        Seq((1L, "dog cat dog")).toDF("doc_id", "text"),
        "doc_id", "text", dir)
      assert(spark.read.parquet(s"$dir/stats").head()
        .getAs[Long]("n_docs") === 3L)
      assert(stBefore.nonEmpty)
    }
  }

  test("removeFromBm25Index resume refuses a stats_next stranded by a " +
    "DIFFERENT operation instead of promoting unrelated stats") {
    withIndex { dir =>
      val bird = fixture.filter($"doc_id" === 3L)
      Rank.removeFromBm25Index(bird, "doc_id", "text", dir)
      // plant a bogus successor (wrong n_docs/total): the all-ids-
      // absent re-run must validate it against doclen truth and refuse
      Seq((999L, 999L, 8L)).toDF("n_docs", "total", "n_buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats_next")
      val stBefore = spark.read.parquet(s"$dir/stats").collect().toSeq
      val e = intercept[IllegalArgumentException] {
        Rank.removeFromBm25Index(bird, "doc_id", "text", dir)
      }
      assert(e.getMessage.contains("stranded by a different"))
      assert(spark.read.parquet(s"$dir/stats").collect().toSeq ===
        stBefore, "a refused resume must not touch the live stats")
    }
  }

  test("removeFromBm25Index drops a bucket emptied by the removal and " +
    "a re-run after the doclen promote resumes the stats swap") {
    withIndex { dir =>
      // doc 3 is the only carrier of "bird": its bucket must empty
      val bird = fixture.filter($"doc_id" === 3L)
      Rank.removeFromBm25Index(bird, "doc_id", "text", dir)
      assert(Rank.bm25FromIndex(spark, dir, Seq("bird")).count() === 0L)
      val st = spark.read.parquet(s"$dir/stats").head()
      assert(st.getAs[Long]("n_docs") === 3L &&
        st.getAs[Long]("total") === 11L)
      // simulate the crash window: ids already gone from doclen, a
      // successor stats table landed but never promoted — the re-run
      // must detect and finish the swap instead of refusing
      spark.read.parquet(s"$dir/stats")
        .write.mode("overwrite").parquet(s"$dir/stats_next")
      Rank.removeFromBm25Index(bird, "doc_id", "text", dir)
      assert(spark.read.parquet(s"$dir/stats").head()
        .getAs[Long]("n_docs") === 3L)
      // with no landed successor, the same re-run refuses loudly
      intercept[IllegalArgumentException] {
        Rank.removeFromBm25Index(bird, "doc_id", "text", dir)
      }
    }
  }

  test("compactBm25Postings: churned buckets fold to one file each, " +
    "probes serve bit-identically, appends continue against the " +
    "compacted store") {
    val a = fixture.filter($"doc_id" <= 2L)
    val b = fixture.filter($"doc_id" === 3L)
    val c = fixture.filter($"doc_id" === 4L)
    val dir = java.nio.file.Files.createTempDirectory("rank_cmp").toString
    Rank.buildBm25Index(a, "doc_id", "text", dir, nBuckets = 4)
    Rank.appendBm25Index(b, "doc_id", "text", dir)
    Rank.appendBm25Index(c, "doc_id", "text", dir)
    def probe(mode: String) = Rank.bm25FromIndex(spark, dir,
      Seq("cat", "dog", "fish", "bird"), idfMode = mode).collect().toSeq
    val before = (probe("ln"), probe("sqrt"))
    val (fBefore, fAfter, nb) = Rank.compactBm25Postings(spark, dir)
    assert(nb > 0L && fAfter < fBefore,
      s"expected fewer files, got $fBefore -> $fAfter over $nb buckets")
    // one file per surviving bucket partition
    val root = new java.io.File(s"$dir/postings")
    root.listFiles().filter(_.getName.startsWith("tb=")).foreach { d =>
      val parts = d.listFiles().filter(f =>
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(parts.length === 1, s"${d.getName}: ${parts.length} files")
    }
    // doclen folded too (tiny fixture → one file)
    val dlParts = new java.io.File(s"$dir/doclen").listFiles()
      .filter(f => !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(dlParts.length === 1, s"doclen: ${dlParts.length} files")
    assert((probe("ln"), probe("sqrt")) === before,
      "compaction must not change a single probe bit")
    // the append contract continues against the compacted layout
    Rank.appendBm25Index(
      Seq((9L, "cat owl")).toDF("doc_id", "text"), "doc_id", "text", dir)
    assert(Rank.bm25FromIndex(spark, dir, Seq("owl")).count() === 1L)
  }

  test("bm25ScoreDocs scores new docs against stored corpus stats and " +
    "agrees with bm25FromIndex on indexed docs") {
    withIndex { dir =>
      // every input doc gets a row; zero-hit docs score 0
      val newDocs = Seq((10L, "dog dog fish"), (11L, "bird song"))
        .toDF("doc_id", "text")
      val scored = Rank.bm25ScoreDocs(newDocs, "doc_id", "text", dir,
        Seq("dog", "fish")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(scored(11L) === ((0L, 0L)))
      assert(scored(10L)._1 === 2L && scored(10L)._2 > 0L)
      // path consistency: scoring the INDEXED docs reproduces the
      // retrieval tier exactly (same df/N/total, same tf from text)
      val viaScore = Rank.bm25ScoreDocs(fixture, "doc_id", "text", dir,
          Seq("dog", "fish"))
        .filter(org.apache.spark.sql.functions.col("score_e4") > 0)
        .orderBy(org.apache.spark.sql.functions.col("score_e4").desc,
          org.apache.spark.sql.functions.col("id"))
        .collect().toSeq
      val viaIndex = Rank.bm25FromIndex(spark, dir, Seq("dog", "fish"))
        .collect().toSeq
      assert(viaScore === viaIndex)
    }
  }

  test("append to a non-index store refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("rank_inc_bad")
    fixture.limit(1)
      .select(org.apache.spark.sql.functions.col("doc_id").as("n_docs"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    val e = intercept[IllegalArgumentException] {
      Rank.appendBm25Index(fixture, "doc_id", "text", dir.toString)
    }
    assert(e.getMessage.contains("not a bm25 index store"))
  }

  test("a non-index store refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("rank_spec_bad")
    // stats table without the n_buckets build param
    fixture.limit(1)
      .select(org.apache.spark.sql.functions.col("doc_id").as("n_docs"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    val e = intercept[IllegalArgumentException] {
      Rank.bm25FromIndex(spark, dir.toString, Seq("dog"))
    }
    assert(e.getMessage.contains("not a bm25 index store"))
  }

  test("scores are partition-invariant (exact integer inputs, " +
    "correctly-rounded ops)") {
    val base = Rank.bm25(fixture, "doc_id", "text", Seq("dog", "fish"))
      .collect().toSeq
    for (parts <- Seq(1, 3, 7)) {
      val re = Rank.bm25(fixture.repartition(parts), "doc_id", "text",
        Seq("dog", "fish")).collect().toSeq
      assert(re === base, s"parts=$parts")
    }
  }

  test("input validation") {
    intercept[IllegalArgumentException] {
      Rank.bm25(fixture, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Rank.bm25(fixture, "doc_id", "text", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Rank.bm25(fixture, "doc_id", "text", Seq("a"), idfMode = "exp")
    }
  }

  test("rrfFuse: exact integer contributions, multi-leg sum, " +
    "(rrf desc, id) order with id tie-break") {
    val legA = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val legB = Seq((3L, 1L), (4L, 2L)).toDF("id", "rank")
    val got = Rank.rrfFuse(Seq(legA, legB)).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rrf_e6"),
        r.getAs[Long]("n_legs"), r.getAs[Long]("best_rank"))).toSeq
    def c(rank: Long): Long = 1000000L / (60L + rank) // exact floor div
    assert(got === Seq(
      (3L, c(3) + c(1), 2L, 1L),   // both legs: 15873 + 16393
      (1L, c(1), 1L, 1L),          // 16393
      (2L, c(2), 1L, 2L),          // 16129 — ties 4L, id asc wins
      (4L, c(2), 1L, 2L)))
  }

  test("hybrid fusion surfaces the relevant-but-lexically-disguised " +
    "doc neither leg ranks first") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.cosineNative
    // L (1): lexical specialist — tops BM25, semantically unrelated
    // T (2): the relevant doc — SECOND in both legs
    // D (3): dense specialist — no query terms at all, tops cosine
    val docs = Seq(
      (1L, "retrieval retrieval engine engine retrieval"),
      (2L, "retrieval engine overview"),
      (3L, "fast search library")).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),   // cos 0 vs query
      (2L, Seq(0.9, 0.3, 0.0, 0.0)),   // cos ≈ 0.95
      (3L, Seq(0.99, 0.1, 0.0, 0.0))   // cos ≈ 0.995
    ).toDF("id", "vec")
    val lex = Rank.bm25(docs, "doc_id", "text",
      Seq("retrieval", "engine"), idfMode = "sqrt", topK = 2)
    val dense = vecs
      .select($"id", round(cosineNative($"vec",
        typedLit(Seq(1.0, 0.0, 0.0, 0.0))), 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"id").limit(2)
    val lexTop = lex.collect().head.getLong(0)
    val denseTop = dense.orderBy($"cos_sim".desc, $"id")
      .collect().head.getAs[Long]("id")
    val fusedTop = Rank.hybrid(lex, dense).collect().head
      .getAs[Long]("id")
    assert(lexTop === 1L, "lexical leg must top the keyword stuffer")
    assert(denseTop === 3L, "dense leg must top the paraphrase")
    assert(fusedTop === 2L,
      "fusion must surface the doc ranked second in BOTH legs")
  }

  test("rrfFuse input validation and topK cap") {
    intercept[IllegalArgumentException] { Rank.rrfFuse(Seq.empty) }
    intercept[IllegalArgumentException] {
      Rank.rrfFuse(Seq(Seq((1L, 1L)).toDF("id", "rank")), k0 = -1)
    }
    val legs = Seq(Seq((1L, 1L), (2L, 2L)).toDF("id", "rank"))
    assert(Rank.rrfFuse(legs, topK = 1).count() === 1L)
  }

  test("rrfFuseBatch: per-qid slices equal the single-query fusion; " +
    "per-query topK") {
    val legA = Seq((0L, 1L, 1L), (0L, 2L, 2L), (1L, 5L, 1L))
      .toDF("qid", "id", "rank")
    val legB = Seq((0L, 2L, 1L), (1L, 6L, 1L), (1L, 5L, 2L))
      .toDF("qid", "id", "rank")
    val batch = Rank.rrfFuseBatch(Seq(legA, legB)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    for (q <- Seq(0L, 1L)) {
      val slice = batch.filter(_._1 == q)
        .map(t => (t._2, t._3, t._4, t._5)).toSeq
      val single = Rank.rrfFuse(Seq(
          legA.filter($"qid" === q).drop("qid"),
          legB.filter($"qid" === q).drop("qid")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(slice === single, s"qid=$q")
    }
    val capped = Rank.rrfFuseBatch(Seq(legA, legB), topK = 1).collect()
    assert(capped.length === 2 &&
      capped.map(_.getLong(0)).toSet === Set(0L, 1L))
  }

  test("shortlistRanks assigns 1-based ranks in the given total order") {
    import org.apache.spark.sql.functions.col
    val sl = Seq((7L, 10L), (9L, 30L), (8L, 30L)).toDF("id", "score_e4")
    val got = Rank.shortlistRanks(sl, "id",
        Seq(col("score_e4").desc, col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(8L -> 1L, 9L -> 2L, 7L -> 3L))
  }

  test("batch serving: each query's slice is bit-identical to its " +
    "single-query serving; topK caps per query") {
    withIndex { dir =>
      val queries = Seq(7L -> Seq("dog", "fish"), 9L -> Seq("cat"))
      for (mode <- Seq("ln", "sqrt")) {
        val batch = Rank.bm25FromIndexBatch(spark, dir, queries,
          idfMode = mode).collect()
        queries.foreach { case (qid, terms) =>
          val slice = batch.filter(_.getLong(0) == qid)
            .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
          val single = Rank.bm25FromIndex(spark, dir, terms,
              idfMode = mode).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
          assert(slice === single, s"qid=$qid mode=$mode")
        }
      }
      val capped = Rank.bm25FromIndexBatch(spark, dir,
        Seq(7L -> Seq("dog", "fish"), 9L -> Seq("cat")), topK = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(capped.length === 2 && capped.map(_._1).toSet === Set(7L, 9L))
    }
  }

  test("batch serving input validation") {
    withIndex { dir =>
      intercept[IllegalArgumentException] {
        Rank.bm25FromIndexBatch(spark, dir, Seq.empty)
      }
      intercept[IllegalArgumentException] {
        Rank.bm25FromIndexBatch(spark, dir,
          Seq(1L -> Seq("a"), 1L -> Seq("b")))
      }
      intercept[IllegalArgumentException] {
        Rank.bm25FromIndexBatch(spark, dir, Seq(1L -> Seq("a", "a")))
      }
    }
  }

  test("bucket balance: a corpus-frequent term flags its bucket hot; " +
    "a uniform vocabulary reports ok") {
    val n = 200
    val hotDocs = (1 to n).map(i => (i.toLong, s"the w$i"))
      .toDF("doc_id", "text")
    val hotDir = java.nio.file.Files.createTempDirectory("rank_hot")
      .toString
    Rank.buildBm25Index(hotDocs, "doc_id", "text", hotDir, nBuckets = 16)
    val (nb, nonEmpty, mx, meanE2, verdict) =
      Rank.bm25BucketBalance(spark, hotDir, ratio = 4.0)
    assert(nb === 16L && nonEmpty > 0L)
    // "the" alone puts n postings in one bucket; mean is ~2n/16
    assert(mx >= n.toLong)
    assert(verdict.startsWith("skewed"),
      s"hot bucket must flag: max=$mx meanE2=$meanE2 verdict=$verdict")

    val flatDocs = (1 to n).map(i => (i.toLong, s"w$i x$i"))
      .toDF("doc_id", "text")
    val flatDir = java.nio.file.Files.createTempDirectory("rank_flat")
      .toString
    Rank.buildBm25Index(flatDocs, "doc_id", "text", flatDir,
      nBuckets = 16)
    val (_, _, _, _, flatVerdict) =
      Rank.bm25BucketBalance(spark, flatDir, ratio = 4.0)
    assert(flatVerdict === "ok", s"uniform vocab must be ok: $flatVerdict")
  }
}
