package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact-substring (repeated-passage) removal: planted shared spans are
  * cut from every carrier, unique text survives verbatim, under-n docs
  * are structurally untouchable, and the production fingerprint path
  * agrees with the oracle-certified string path.
  */
class SubstrDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val license =
    "this work is licensed under the creative commons attribution license"
  // 10 tokens — any n=8 window of it occurs in every carrier

  private def run(rows: Seq[(Long, String)], n: Int = 8, minDocs: Int = 2,
                  fingerprint: Boolean = false) =
    Dedup.exactSubstrRemove(rows.toDF("doc_id", "text"),
        "doc_id", "text", n, minDocs, fingerprint)
      .orderBy($"id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("a passage shared by two docs is removed from both, rest kept") {
    val a = s"unique alpha prose one two three $license tail alpha"
    val b = s"different beta words $license closing beta remark here"
    val c = "a fully unique document with no shared passage at all ok"
    val got = run(Seq((1L, a), (2L, b), (3L, c)))
    // every token of the 10-token license is covered by some shared
    // 8-gram; surrounding unique words survive in order
    assert(got(0)._2 === "unique alpha prose one two three tail alpha")
    assert(got(0)._4 === 10L)
    assert(got(1)._2 === "different beta words closing beta remark here")
    assert(got(1)._4 === 10L)
    assert(got(2) === ((3L, c, 11L, 0L)))
  }

  test("minDocs raises the bar: a 2-doc passage survives minDocs=3") {
    val a = s"one two three four $license"
    val b = s"five six seven eight $license"
    val got = run(Seq((1L, a), (2L, b)), minDocs = 3)
    assert(got.forall(_._4 == 0L), got.mkString("; "))
    assert(got(0)._2 === a && got(1)._2 === b)
  }

  test("docs shorter than n tokens produce no grams and lose nothing") {
    val tiny = "seven tokens is less than eight yes"
    val got = run(Seq((1L, tiny), (2L, tiny), (3L, "")))
    assert(got(0) === ((1L, tiny, 7L, 0L)))
    assert(got(1) === ((2L, tiny, 7L, 0L)))
    assert(got(2) === ((3L, "", 0L, 0L)))
  }

  test("overlapping duplicate spans remove the union of their cover") {
    // doc 1 and 2 share tokens 1..9 (two overlapping 8-grams: starts 1
    // and 2) — coverage is 1..9, not 1..8 twice
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    val a = s"$shared xa xb xc"
    val b = s"$shared ya yb yc"
    val got = run(Seq((1L, a), (2L, b)))
    assert(got(0) === ((1L, "xa xb xc", 12L, 9L)))
    assert(got(1) === ((2L, "ya yb yc", 12L, 9L)))
  }

  test("a doc that is pure boilerplate keeps an empty clean_text") {
    val got = run(Seq((1L, license), (2L, license)))
    assert(got(0)._2 === "" && got(0)._4 === 10L)
    assert(got(1)._2 === "" && got(1)._4 === 10L)
  }

  test("fingerprint path = string path on a mixed corpus") {
    val rnd = new java.util.Random(31L)
    val vocab = "spark scan merge join filter agg sort hash key value".split(" ")
    def prose(n: Int) =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val rows = (0 until 30).map { i =>
      val body =
        if (i % 3 == 0) s"${prose(5)} $license ${prose(4)}"
        else prose(20)
      (i.toLong, body)
    }
    val s = run(rows, fingerprint = false).toSeq
    val f = run(rows, fingerprint = true).toSeq
    assert(s === f)
  }

  test("cascade: every doc explained by the tier that caught it") {
    val pass = "p1 p2 p3 p4 p5 p6 p7 p8"   // the shared 8-token passage
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),        // exact copy of 1
      (3L, "delta gamma beta alpha"),        // shuffled copy of 1 (canonical)
      (4L, s"unique lead $pass"),            // carries the passage
      (5L, s"other intro here $pass tail"),  // carries the passage
      (6L, "solitary text nothing shared")   // untouched
    ).toDF("doc_id", "text")
    val out = Dedup.cascade(docs, "doc_id", "text", n = 8, minDocs = 2)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "kept", 1L, 0L),
      (2L, "dropped_exact", 1L, 0L),
      (3L, "dropped_canonical", 1L, 0L),
      (4L, "cleaned_substr", 4L, 8L),
      (5L, "cleaned_substr", 5L, 8L),
      (6L, "kept", 6L, 0L)))
  }

  test("cascade ordering: canonical tier only sees exact survivors") {
    // two exact copies of a SHUFFLED variant: the exact tier keeps one,
    // the canonical tier then folds it into the original's group
    val docs = Seq(
      (10L, "w x y z"),
      (11L, "z y x w"),
      (12L, "z y x w")
    ).toDF("doc_id", "text")
    val out = Dedup.cascade(docs, "doc_id", "text", n = 8, minDocs = 2)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (10L, "kept", 10L),
      (11L, "dropped_canonical", 10L),
      (12L, "dropped_exact", 11L)))
  }

  test("cascade explains null-text docs instead of dropping them") {
    val docs = Seq(
      (1L, Some("real content here")),
      (2L, None: Option[String]),
      (3L, None: Option[String])
    ).toDF("doc_id", "text")
    val out = Dedup.cascade(docs, "doc_id", "text", n = 8, minDocs = 2)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // null texts coalesce to '' and dedup as an exact group
    assert(out.toSeq == Seq(
      (1L, "kept", 1L),
      (2L, "kept", 2L),
      (3L, "dropped_exact", 2L)))
  }

  test("cascade and substr tier reject non-numeric id columns loudly") {
    // a string id would cast to NULL and null-false every tier filter,
    // silently emitting an empty audit — the gate fails up front
    val docs = Seq(("doc-a", "some text"), ("doc-b", "some text"))
      .toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.cascade(docs, "doc_id", "text")
    }
    assert(e1.getMessage.contains("must be numeric"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.exactSubstrRemove(docs, "doc_id", "text")
    }
    assert(e2.getMessage.contains("must be numeric"))
  }

  // ---- suffix-array-class maximal-span tier (Lee et al. 2022) ----

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("longMatchSpans reconstructs the maximal span and exempts the " +
    "first carrier; seam windows never flag") {
    // doc 2 copies a 16-token run of doc 1 between unique flanks: the
    // duplicated 8-windows are starts 4..12, one maximal span
    // (start 4, len 16); doc 1 is the corpus-wide first carrier of
    // every window, so it reports nothing
    val a = words("a", 30)
    val doc1 = (1L, a.mkString(" "))
    val doc2 = (2L, (words("x", 3) ++ a.slice(4, 20) ++ words("y", 2))
      .mkString(" "))
    val got = Dedup.longMatchSpans(Seq(doc1, doc2).toDF("doc_id", "text"),
        "doc_id", "text", minLen = 8, keepFirst = true, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set((2L, 4L, 16L)), s"got $got")
  }

  test("keepFirst=false flags every occurrence, including the original") {
    val a = words("a", 30)
    val doc1 = (1L, a.mkString(" "))
    val doc2 = (2L, (words("x", 3) ++ a.slice(4, 20) ++ words("y", 2))
      .mkString(" "))
    val got = Dedup.longMatchSpans(Seq(doc1, doc2).toDF("doc_id", "text"),
        "doc_id", "text", minLen = 8, keepFirst = false, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // doc 1's copied run occupies tokens 5..20 → windows 5..13
    assert(got === Set((1L, 5L, 16L), (2L, 4L, 16L)), s"got $got")
  }

  test("an intra-doc repeat flags its second occurrence only") {
    val r = words("r", 12)
    val doc = (7L, (r ++ words("z", 3) ++ r).mkString(" "))
    val got = Dedup.longMatchSpans(Seq(doc).toDF("doc_id", "text"),
        "doc_id", "text", minLen = 12, keepFirst = true, maxDf = 100)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2)))
      .toSet
    assert(got === Set((7L, 16L, 12L)), s"got $got")
  }

  test("longMatchRemove cuts the copy, keeps the first carrier intact") {
    val a = words("a", 30)
    val doc1 = (1L, a.mkString(" "))
    val doc2 = (2L, (words("x", 3) ++ a.slice(4, 20) ++ words("y", 2))
      .mkString(" "))
    val got = Dedup.longMatchRemove(Seq(doc1, doc2).toDF("doc_id", "text"),
        "doc_id", "text", minLen = 8, maxDf = 100)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(got(0) === ((1L, doc1._2, 0L)),
      s"first carrier must survive verbatim, got ${got(0)}")
    assert(got(1)._3 === 16L, s"doc 2 must lose its 16 copied tokens")
    assert(got(1)._2 ===
      (words("x", 3) ++ words("y", 2)).mkString(" "))
  }

  test("incremental long-match screen: settled content flags as " +
    "maximal spans, novel content passes, viral index keys skip, " +
    "mismatched stores refuse") {
    val r = words("r", 14)
    val settled = Seq(
      (1L, (words("p", 4) ++ r ++ words("q", 3)).mkString(" ")),
      (2L, words("s", 20).mkString(" ")))
      .toDF("doc_id", "text")
    val idx = Dedup.longMatchIndex(settled, "doc_id", "text", minLen = 10)
    val batch = Seq(
      (100L, (words("x", 2) ++ r ++ words("y", 2)).mkString(" ")),
      (101L, words("z", 20).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalLongMatchSpans(batch, "doc_id", "text",
        idx, minLen = 10)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2)))
      .toSet
    // the copied 14-token run sits at batch positions 3..16 → windows
    // 3..7 → one maximal span (3, 14); doc 101 is clean
    assert(got === Set((100L, 3L, 14L)), s"got $got")

    // store round trip preserves the probe contract
    val dir = java.nio.file.Files.createTempDirectory("lm_idx").toString
    idx.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val got2 = Dedup.incrementalLongMatchSpans(batch, "doc_id", "text",
        back, minLen = 10)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2)))
      .toSet
    assert(got2 === got, "stored index must probe identically")

    // a viral window (df over the cap) skips the tier
    val viral = Dedup.longMatchIndex(
      (0L until 50L).map(i => (i, r.mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", minLen = 10)
    val gotViral = Dedup.incrementalLongMatchSpans(batch, "doc_id",
        "text", viral, minLen = 10, maxDf = 10)
      .collect()
    assert(gotViral.isEmpty,
      "windows above the index df cap must skip the tier")

    // parameter mismatch refuses loudly
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalLongMatchSpans(batch, "doc_id", "text", idx,
        minLen = 12)
    }
    assert(e.getMessage.contains("min_len"))
  }

  test("appendLongMatchIndex merge law: append(build(A), B) == " +
    "build(A ∪ B) bit-for-bit; appended store probes identically; " +
    "contract enforced") {
    val r = words("r", 14)
    val a = Seq(
      (1L, (words("p", 4) ++ r ++ words("q", 3)).mkString(" ")),
      (2L, words("s", 20).mkString(" ")))
    // B shares the r-run with A (cross-batch df accumulation) and
    // repeats one window INSIDE a doc (occurrence-count semantics)
    val b = Seq(
      (10L, (words("x", 2) ++ r ++ words("y", 2) ++ r).mkString(" ")),
      (11L, words("t", 15).mkString(" ")))
    val dir = java.nio.file.Files
      .createTempDirectory("lm_append").toString + "/idx"
    Dedup.longMatchIndex(a.toDF("doc_id", "text"), "doc_id", "text",
        minLen = 10)
      .write.mode("overwrite").parquet(dir)
    Dedup.appendLongMatchIndex(b.toDF("doc_id", "text"), "doc_id",
      "text", dir)

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val appended = spark.read.parquet(dir)
    val scratch = Dedup.longMatchIndex((a ++ b).toDF("doc_id", "text"),
      "doc_id", "text", minLen = 10)
    assert(rows(appended) === rows(scratch),
      "appended index must equal the from-scratch build bit-for-bit")
    // metadata carried through the append (the store stays probeable)
    val md = appended.schema("gk").metadata
    assert(md.getLong("min_len") === 10L &&
      md.getString("key_mode") === "xx")

    // probe equality: a batch screens identically against either store
    val probe = Seq((100L, (words("w", 3) ++ r).mkString(" ")))
      .toDF("doc_id", "text")
    def spans(idx: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalLongMatchSpans(probe, "doc_id", "text", idx,
          minLen = 10)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .toSet
    val viaAppended = spans(spark.read.parquet(dir))
    assert(viaAppended === spans(scratch) && viaAppended.nonEmpty)

    // a second append keeps accumulating exactly (three-way law)
    val c = Seq((20L, (r ++ words("u", 5)).mkString(" ")))
    Dedup.appendLongMatchIndex(c.toDF("doc_id", "text"), "doc_id",
      "text", dir)
    assert(rows(spark.read.parquet(dir)) ===
      rows(Dedup.longMatchIndex((a ++ b ++ c).toDF("doc_id", "text"),
        "doc_id", "text", minLen = 10)))

    // contract: a store without build metadata refuses the append
    // (fresh read — the swap invalidated earlier frames' file listings)
    val bare = java.nio.file.Files
      .createTempDirectory("lm_bare").toString + "/idx"
    spark.read.parquet(dir)
      .select($"gk".as("gk", new org.apache.spark.sql.types
        .MetadataBuilder().build()), $"df")
      .write.mode("overwrite").parquet(bare)
    val e = intercept[IllegalArgumentException] {
      Dedup.appendLongMatchIndex(c.toDF("doc_id", "text"), "doc_id",
        "text", bare)
    }
    assert(e.getMessage.contains("build metadata"), e.getMessage)
  }

  test("removeFromLongMatchIndex inverse law: remove(append(build(A), " +
    "B), B) == build(A); uncontained batches refuse") {
    val r = words("r", 14)
    val a = Seq(
      (1L, (words("p", 4) ++ r ++ words("q", 3)).mkString(" ")),
      (2L, words("s", 20).mkString(" ")))
    val b = Seq(
      (10L, (words("x", 2) ++ r ++ words("y", 2) ++ r).mkString(" ")),
      (11L, words("t", 15).mkString(" ")))
    val dir = java.nio.file.Files
      .createTempDirectory("lm_remove").toString + "/idx"
    Dedup.longMatchIndex(a.toDF("doc_id", "text"), "doc_id", "text",
        minLen = 10)
      .write.mode("overwrite").parquet(dir)
    Dedup.appendLongMatchIndex(b.toDF("doc_id", "text"), "doc_id",
      "text", dir)
    Dedup.removeFromLongMatchIndex(b.toDF("doc_id", "text"), "doc_id",
      "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val after = spark.read.parquet(dir)
    val ref = Dedup.longMatchIndex(a.toDF("doc_id", "text"), "doc_id",
      "text", minLen = 10)
    assert(rows(after) === rows(ref),
      "retracted index must equal the A-only build bit-for-bit")
    // b's own windows (the t-run) fell to zero and are GONE as rows
    assert(after.count() === ref.count())
    // metadata carried through the swap
    val md = after.schema("gk").metadata
    assert(md.getLong("min_len") === 10L &&
      md.getString("key_mode") === "xx")
    // probe equality on the shared r-run: A still carries it
    val probe = Seq((100L, (words("w", 3) ++ r).mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.incrementalLongMatchSpans(probe, "doc_id", "text",
      spark.read.parquet(dir), minLen = 10).count() > 0L)
    // retracting B AGAIN would drive the shared r-run windows negative
    val before = rows(spark.read.parquet(dir))
    val e = intercept[IllegalArgumentException] {
      Dedup.removeFromLongMatchIndex(b.toDF("doc_id", "text"), "doc_id",
        "text", dir)
    }
    assert(e.getMessage.contains("negative"), e.getMessage)
    assert(rows(spark.read.parquet(dir)) === before,
      "a refused retraction must not touch the store")
  }

  test("long-match plan shape: the only Window partitions on the doc " +
    "id (adjacency merge), never on the window key — viral keys " +
    "reduce map-side in the first-carrier aggregate") {
    val a = words("a", 30)
    val docs = Seq((1L, a.mkString(" ")),
      (2L, (words("x", 3) ++ a.slice(4, 20)).mkString(" ")))
      .toDF("doc_id", "text")
    val plan = Dedup.longMatchSpans(docs, "doc_id", "text", minLen = 8)
      .queryExecution.executedPlan.toString
    // every Window node must partition by id — a gk-partitioned window
    // would buffer a viral key's whole occurrence group in one task
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(_.contains("id#")) &&
      !windows.exists(_.contains("gk#")),
      s"windows must partition on the doc id only:\n$plan")
    assert(plan.contains("HashAggregate") ||
      plan.contains("ObjectHashAggregate"),
      s"first-carrier/df-gate must run as aggregates:\n$plan")
  }

  test("longMatchSpans is partition-invariant") {
    val a = words("a", 30)
    val docs = Seq((1L, a.mkString(" ")),
      (2L, (words("x", 3) ++ a.slice(4, 20) ++ words("y", 2))
        .mkString(" ")),
      (3L, words("z", 25).mkString(" ")))
      .toDF("doc_id", "text")
    val base = Dedup.longMatchSpans(docs, "doc_id", "text", minLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    for (parts <- Seq(1, 3, 7)) {
      val re = Dedup.longMatchSpans(docs.repartition(parts), "doc_id",
          "text", minLen = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(re === base, s"parts=$parts")
    }
  }

  test("xx and md5 key modes produce identical spans on a planted " +
    "overlap corpus") {
    val docs = (0L until 20L).map { i =>
      i -> ((1 to 25).map(j => s"w${i}_$j").mkString(" "))
    }
    val planted = docs.sliding(2).zipWithIndex.collect {
      case (Seq((i1, t1), (_, t2)), pi) if i1 % 3 == 0 =>
        (100L + pi, s"$t1 $t2")
    }.toSeq
    val corpus = (docs ++ planted).toDF("doc_id", "text")
    def spans(mode: String) =
      Dedup.longMatchSpans(corpus, "doc_id", "text", minLen = 10,
          keepFirst = true, maxDf = 100, keyMode = mode)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val xx = spans("xx")
    assert(xx === spans("md5"),
      "production xxhash64 keys must flag the same spans as the " +
        "certified md5 keys")
    assert(xx.nonEmpty, "the planted corpus must produce spans")
  }

  test("CoverRemove kernel == staged pure-Column form: randomized " +
    "starts and a many-span pathological doc") {
    // randomized corpus: arbitrary (id, s) flag rows, including
    // duplicates, starts at the boundaries, and starts whose window
    // runs past the end of the document
    val rnd = new scala.util.Random(20260815L)
    val docs = (1L to 30L).map { i =>
      val n = 20 + rnd.nextInt(60)
      (i, (1 to n).map(j => s"t$j").mkString(" "))
    }
    // the pathological doc the staged form pays O(tokens × spans) on:
    // 4000 tokens, a flagged span at EVERY odd position
    val pathological = (999L,
      (1 to 4000).map(j => s"p$j").mkString(" "))
    val corpus = (docs :+ pathological).toDF("doc_id", "text")
    val dupRows =
      docs.flatMap { case (i, t) =>
        val n = t.split(" ").length
        val m = rnd.nextInt(8)
        Seq.fill(m)((i, 1 + rnd.nextInt(n)))
      } ++ (1 to 3999 by 2).map(s => (999L, s)) ++
        Seq((1L, 1), (2L, 1), (2L, 1)) // boundary + duplicate rows
    val dup = dupRows.toDF("id", "s")
    for (w <- Seq(1, 5, 8)) {
      val kernel = Dedup.removeFromStarts(corpus, "doc_id", "text",
          dup, w).orderBy($"id").collect().map(_.toSeq)
      val staged = Dedup.removeFromStartsStaged(corpus, "doc_id", "text",
          dup, w).orderBy($"id").collect().map(_.toSeq)
      assert(kernel.toSeq === staged.toSeq, s"width=$w")
    }
    // sanity on the pathological doc at width 5: odd starts cover
    // every position (1..4000 ⊂ ∪[s, s+5)), so everything is cut
    val cut = Dedup.removeFromStarts(corpus, "doc_id", "text", dup, 5)
      .filter($"id" === 999L).head()
    assert(cut.getAs[String]("clean_text") === "" &&
      cut.getAs[Long]("n_removed") === 4000L)
  }
}
