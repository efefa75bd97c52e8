package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // eval doc 100 shares its whole text with train doc 1; doc 2 shares
  // nothing; doc 3 shares a 4-gram window with eval doc 101
  private def train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "totally disjoint training content here now"),
    (3L, "one two three four prefix of something else entirely longer")
  ).toDF("doc_id", "text")
  private def eval_ = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"),
    (101L, "one two three four")
  ).toDF("doc_id", "text")

  test("exact tier flags overlapping docs with their gram-hit counts") {
    val hits = Decontaminate.ngramHits(train, eval_, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 1: windows of 4 over 6 tokens = 3 shared grams; doc 3: the
    // "one two three four" window only; doc 2 absent
    assert(hits === Map(1L -> 3L, 3L -> 1L))
  }

  test("bloom tier: superset of exact, equal at tiny fpp on this fixture") {
    val exact = Decontaminate.ngramHits(train, eval_, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bloom = Decontaminate.ngramHitsBloom(train, eval_, "doc_id", "text",
        n = 4, fpp = 1e-6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // NO false negatives: every exact-flagged doc appears with >= count
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id) && bloom(id) >= n, s"doc $id: $bloom")
    }
    // at fpp 1e-6 over a handful of grams the FP probability is ~1e-5:
    // the tiers agree exactly on this hand-made fixture
    assert(bloom === exact)
  }

  test("bloom tier on the driver fixture: never misses an exact hit") {
    val docs = graft.core.Tables.documents(spark, graft.TestSpark.sf)
    val trainD = docs.filter($"doc_id" % 10 =!= 0)
    val evalD = docs.filter($"doc_id" % 10 === 0)
    val exact = Decontaminate.ngramHits(trainD, evalD, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bloom = Decontaminate.ngramHitsBloom(trainD, evalD, "doc_id", "text",
        n = 8, fpp = 1e-6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id) && bloom(id) >= n,
        s"bloom tier lost exact hit for doc $id")
    }
    // inflation bound (loose): total bloom hits can exceed exact only
    // by the FP budget, which at fpp 1e-6 on this corpus is ~0
    assert(bloom.values.sum - exact.values.sum <= 2,
      s"unexpected FP inflation: bloom=${bloom.values.sum} exact=${exact.values.sum}")
  }

  test("md5 bloom twin: superset of exact always; equal to exact at " +
    "generous bits; false positives possible when bits starve") {
    val exact = Decontaminate.ngramHits(train, eval_, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // generous sizing: 2^20 bits for ~5 eval grams — FP chance ~0
    val roomy = Decontaminate.ngramHitsBloomMd5(train, eval_, "doc_id",
        "text", n = 4, numBits = 1 << 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(roomy === exact)
    // starved sizing: 2 bits saturate instantly — every gram of every
    // doc "hits", the Bloom-at-capacity degeneracy (still NO false
    // negatives, which is the tier's one guarantee)
    val starved = Decontaminate.ngramHitsBloomMd5(train, eval_, "doc_id",
        "text", n = 4, numBits = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    exact.foreach { case (id, n) =>
      assert(starved.contains(id) && starved(id) >= n)
    }
    assert(starved.contains(2L),
      "a saturated filter must false-positive the disjoint doc")
  }

  test("md5 bloom twin on the driver fixture: superset of exact at the " +
    "registered parameters") {
    val docs = graft.core.Tables.documents(spark, graft.TestSpark.sf)
    val trainD = docs.filter($"doc_id" % 10 =!= 0)
    val evalD = docs.filter($"doc_id" % 10 === 0)
    val exact = Decontaminate.ngramHits(trainD, evalD, "doc_id", "text",
        n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bloom = Decontaminate.ngramHitsBloomMd5(trainD, evalD, "doc_id",
        "text", n = 8, numBits = 16384, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id) && bloom(id) >= n,
        s"md5 bloom twin lost exact hit for doc $id")
    }
  }

  test("ngramHitSpans: overlapping hits merge, distant hits split") {
    val eval_ = Seq(1L -> "a b c d e f g h i").toDF("doc_id", "text")
    val train = Seq(
      // hits at s=3 ('a..h') and s=4 ('b..i') -> one merged span [3,11]
      10L -> "z z a b c d e f g h i z z z",
      // hits at s=1 and s=17, gap > n -> two spans [1,8], [17,24]
      11L -> "a b c d e f g h q q q q q q q q a b c d e f g h",
      // no eval grams -> no rows
      12L -> "totally unrelated content with plenty of words here"
    ).toDF("doc_id", "text")
    val got = Decontaminate.ngramHitSpans(train, eval_, "doc_id", "text",
        n = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (10L, 3L, 11L, 2L),
      (11L, 1L, 8L, 1L),
      (11L, 17L, 24L, 1L)))
  }

  test("redactEvalNgrams cuts exactly the spanned tokens, keeps the rest") {
    val eval_ = Seq(1L -> "a b c d e f g h i").toDF("doc_id", "text")
    val train = Seq(
      10L -> "z z a b c d e f g h i z z z",
      12L -> "totally unrelated content with plenty of words here"
    ).toDF("doc_id", "text")
    val got = Decontaminate.redactEvalNgrams(train, eval_,
        "doc_id", "text", n = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // span [3,11] cut: tokens z z (1,2) and z z z (12..14) survive
    assert(got(10L) === (("z z z z z", 14L, 9L)))
    // untouched doc passes through byte-identical
    assert(got(12L) ===
      (("totally unrelated content with plenty of words here", 8L, 0L)))
  }

  test("fuzzy tier flags verbatim AND near-copies of eval items; " +
    "disjoint text never survives the exact verify") {
    // 40-token eval item; the near-copy changes ONE interior token ->
    // 3 of 38 shingles differ, jaccard 35/41 = 0.85 >= 4/5
    val evalText = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearCopy = (1 to 40).map(i =>
      if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val farCopy = (1 to 40).map(i =>
      if (i % 3 == 0) s"alt$i" else s"tok$i").mkString(" ")
    val tr = Seq(
      (1L, evalText),                    // verbatim leak
      (2L, nearCopy),                    // paraphrase-grade leak
      (3L, farCopy),                     // jaccard far below threshold
      (4L, "completely unrelated words about other things entirely"))
      .toDF("doc_id", "text")
    val ev = Seq((900L, evalText)).toDF("doc_id", "text")
    val hits = Decontaminate.fuzzyHits(tr, ev, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits === Set((1L, 900L), (2L, 900L)), s"got $hits")
    // the verbatim pair is exact: inter == uni in the verify columns
    val exact = Decontaminate.fuzzyHits(tr, ev, "doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("train_id") === 1L)
      .collect()(0)
    assert(exact.getAs[Long]("inter") === exact.getAs[Long]("uni"))
  }

  test("stored eval-gram index: probe == exact tier under every keyMode; " +
    "store round-trips through parquet with its metadata") {
    val exact = Decontaminate.ngramHits(train, eval_, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (km <- Seq("string", "md5", "xxhash64")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_deconidx_$km").toString
      Decontaminate.evalGramIndex(eval_, "text", n = 4, keyMode = km)
        .write.mode("overwrite").parquet(dir)
      val got = Decontaminate.ngramHitsFromIndex(train, "doc_id", "text",
          spark.read.parquet(dir), n = 4, keyMode = km)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === exact, s"keyMode=$km: $got vs $exact")
    }
  }

  test("suite lifecycle: sign two suites == one build over the union; " +
    "re-signing is idempotent; retiring a suite removes exactly its " +
    "grams; probes dedup cross-suite keys") {
    val a = eval_.filter($"doc_id" === 100L)
    val b = eval_.filter($"doc_id" === 101L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_deconidx_suites").toString + "/idx"
    Decontaminate.writeEvalIndex(a, "text", dir, n = 4,
      keyMode = "md5", suite = "mmlu")
    Decontaminate.appendEvalIndex(b, "text", dir, suite = "gsm8k")
    def probe(index: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Decontaminate.ngramHitsFromIndex(train, "doc_id", "text", index,
          n = 4, keyMode = "md5")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Decontaminate.evalGramIndex(eval_, "text", n = 4,
      keyMode = "md5")
    // merge law at the probe (the contract a partitioned layout owes)
    assert(probe(spark.read.parquet(dir)) === probe(full))
    // metadata carried through the partitioned write
    val md = spark.read.parquet(dir).schema("gk").metadata
    assert(md.getLong("shingle_n") === 4L &&
      md.getString("key_mode") === "md5")
    // re-signing the same suite is idempotent (dynamic overwrite)
    Decontaminate.appendEvalIndex(b, "text", dir, suite = "gsm8k")
    assert(probe(spark.read.parquet(dir)) === probe(full))
    // a gram in BOTH suites still counts once per doc (probe dedups)
    Decontaminate.appendEvalIndex(a, "text", dir, suite = "mmlu_v2")
    assert(probe(spark.read.parquet(dir)) === probe(full))
    // retiring removes exactly that suite's contribution
    Decontaminate.retireEvalSuite(spark, dir, "mmlu_v2")
    Decontaminate.retireEvalSuite(spark, dir, "gsm8k")
    assert(probe(spark.read.parquet(dir)) ===
      probe(Decontaminate.evalGramIndex(a, "text", n = 4,
        keyMode = "md5")))
    // unknown suite and hostile names refuse
    intercept[IllegalArgumentException] {
      Decontaminate.retireEvalSuite(spark, dir, "gsm8k")
    }
    intercept[IllegalArgumentException] {
      Decontaminate.retireEvalSuite(spark, dir, "../evil")
    }
  }

  test("eval-gram index mutations take the writer lease: a held lease " +
    "refuses sign and retire loudly; release restores both") {
    val a = eval_.filter($"doc_id" === 100L)
    val b = eval_.filter($"doc_id" === 101L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_deconidx_lease").toString + "/idx"
    Decontaminate.writeEvalIndex(a, "text", dir, n = 4,
      keyMode = "md5", suite = "mmlu")
    val lease = new org.apache.hadoop.fs.Path(
      graft.core.Stores.leasePath(dir))
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a concurrent signer's lease: both mutation surfaces refuse with
    // the fsck recipe instead of interleaving the partition overwrite
    fs.create(lease, false).close()
    val e1 = intercept[IllegalStateException] {
      Decontaminate.appendEvalIndex(b, "text", dir, suite = "gsm8k")
    }
    assert(e1.getMessage.contains("writer lease") &&
      e1.getMessage.contains("store --fsck"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      Decontaminate.retireEvalSuite(spark, dir, "mmlu")
    }
    assert(e2.getMessage.contains("writer lease"), e2.getMessage)
    // nothing mutated while refused
    assert(spark.read.parquet(dir).select("suite").distinct()
      .collect().map(_.getString(0)).toSet === Set("mmlu"))
    fs.delete(lease, false)
    // released: the mutation proceeds and releases its own lease
    Decontaminate.appendEvalIndex(b, "text", dir, suite = "gsm8k")
    assert(!fs.exists(lease))
    assert(spark.read.parquet(dir).select("suite").distinct()
      .collect().map(_.getString(0)).toSet === Set("mmlu", "gsm8k"))
  }

  test("an ALL-suites-retired store stays readable (zero rows, " +
    "metadata intact) and re-signable without a rebuild") {
    val a = eval_.filter($"doc_id" === 100L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_deconidx_empty").toString + "/idx"
    Decontaminate.writeEvalIndex(a, "text", dir, n = 4,
      keyMode = "md5", suite = "only")
    Decontaminate.retireEvalSuite(spark, dir, "only")
    // plain parquet read now fails schema inference; the store
    // contract read falls back to the _schema marker
    intercept[Exception] { spark.read.parquet(dir).count() }
    val empty = graft.core.Stores.readOrEmpty(spark, dir)
    assert(empty.count() === 0L)
    assert(empty.schema("gk").metadata.getLong("shingle_n") === 4L)
    // probing an emptied store hits nothing instead of erroring
    assert(Decontaminate.ngramHitsFromIndex(train, "doc_id", "text",
      empty, n = 4, keyMode = "md5").count() === 0L)
    // re-signing works against the emptied store (build params come
    // from the marker's metadata), no writeEvalIndex rebuild needed
    Decontaminate.appendEvalIndex(a, "text", dir, suite = "only_v2")
    assert(Decontaminate.ngramHitsFromIndex(train, "doc_id", "text",
        spark.read.parquet(dir), n = 4, keyMode = "md5")
      .collect().toSet ===
      Decontaminate.ngramHitsFromIndex(train, "doc_id", "text",
        Decontaminate.evalGramIndex(a, "text", n = 4, keyMode = "md5"),
        n = 4, keyMode = "md5").collect().toSet)
  }

  test("stored-index redaction equals the exact redact tier under " +
    "every keyMode") {
    val exact = Decontaminate.redactEvalNgrams(train, eval_, "doc_id",
        "text", n = 4)
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    for (km <- Seq("string", "md5", "xxhash64")) {
      val idx = Decontaminate.evalGramIndex(eval_, "text", n = 4,
        keyMode = km)
      val got = Decontaminate.redactEvalNgramsFromIndex(train, "doc_id",
          "text", idx, n = 4, keyMode = km)
        .collect().map(r => (r.getLong(0),
          (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got === exact, s"keyMode=$km")
    }
    // the leaked doc was actually cut; the clean doc was not
    assert(exact(1L)._3 > 0L && exact(2L)._3 === 0L)
  }

  test("stored eval-gram index refuses mismatched parameters and " +
    "metadata-less stores") {
    val idx = Decontaminate.evalGramIndex(eval_, "text", n = 4,
      keyMode = "md5")
    // wrong n
    val e1 = intercept[IllegalArgumentException] {
      Decontaminate.ngramHitsFromIndex(train, "doc_id", "text", idx,
        n = 8, keyMode = "md5")
    }
    assert(e1.getMessage.contains("built with n=4"))
    // wrong keyMode
    intercept[IllegalArgumentException] {
      Decontaminate.ngramHitsFromIndex(train, "doc_id", "text", idx,
        n = 4, keyMode = "xxhash64")
    }
    // a frame with a gk column but no build metadata is not a store
    val bare = idx.select(org.apache.spark.sql.functions.col("gk")
      .cast("long").as("gk"))
    val e2 = intercept[IllegalArgumentException] {
      Decontaminate.ngramHitsFromIndex(train, "doc_id", "text", bare,
        n = 4, keyMode = "md5")
    }
    assert(e2.getMessage.contains("no build metadata"))
  }
}
