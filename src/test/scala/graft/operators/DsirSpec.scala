package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val target = Seq(
    1L -> "spark scala spark scala",
    2L -> "spark catalyst scala").toDF("doc_id", "text")
  private val raw = Seq(
    10L -> "cobol fortran cobol",
    11L -> "fortran basic cobol basic",
    12L -> "spark cobol fortran").toDF("doc_id", "text")

  test("target-vocabulary docs outscore raw-vocabulary docs") {
    val w = Dsir.bucketWeights(target, raw, "text", buckets = 64)
    val probes = Seq(
      100L -> "spark scala catalyst spark",   // pure target vocab
      101L -> "cobol fortran basic fortran",  // pure raw vocab
      102L -> "spark cobol").toDF("doc_id", "text")
    val got = Dsir.score(probes, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(100L) > got(102L))
    assert(got(102L) > got(101L))
    assert(got(100L) > 0, "target-looking doc must be positive (target-like)")
    assert(got(101L) < 0, "raw-looking doc must be negative")
  }

  test("hand-computed weights: counts, smoothing, all-bucket spine") {
    // one-token corpora so the gram sets are a single unigram each
    val t1 = Seq(1L -> "aa").toDF("doc_id", "text")
    val r1 = Seq(2L -> "bb").toDF("doc_id", "text")
    val w = Dsir.bucketWeights(t1, r1, "text", buckets = 8)
    val rows = w.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.size === 8, "every bucket carries a row")
    assert(rows.values.map(_._1).sum === 1L)
    assert(rows.values.map(_._2).sum === 1L)
    // Nt = Nr = 1, B = 8: empty-bucket weight = (bits(1)-bits(9)) -
    // (bits(1)-bits(9)) = 0; the aa bucket = (bits(2)-bits(9)) -
    // (bits(1)-bits(9)) = 1 unless bb hashes to the same bucket
    val (aaB, bbB) = {
      val aa = rows.find(_._2._1 == 1L).get._1
      val bb = rows.find(_._2._2 == 1L).get._1
      (aa, bb)
    }
    if (aaB != bbB) {
      assert(rows(aaB)._3 === 1L)
      assert(rows(bbB)._3 === -1L)
      assert(rows.filterKeys(k => k != aaB && k != bbB).values
        .forall(_._3 == 0L))
    }
  }

  test("mergeWeights: merge(fit(A), fit(B)) == fit(A ∪ B) exactly, " +
    "and mismatched params refuse") {
    import org.apache.spark.sql.functions.col
    val (t1, t2) = (target.filter(col("doc_id") === 1L),
      target.filter(col("doc_id") =!= 1L))
    val (r1, r2) = (raw.filter(col("doc_id") <= 10L),
      raw.filter(col("doc_id") > 10L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val whole = Dsir.bucketWeights(target, raw, "text", buckets = 64)
    val merged = Dsir.mergeWeights(
      Dsir.bucketWeights(t1, r1, "text", buckets = 64),
      Dsir.bucketWeights(t2, r2, "text", buckets = 64))
    assert(rows(merged) === rows(whole))
    val e = intercept[IllegalArgumentException] {
      Dsir.mergeWeights(whole,
        Dsir.bucketWeights(t1, r1, "text", buckets = 32))
    }
    assert(e.getMessage.contains("different params"))
  }

  test("scoreSelf == score over bucketWeightsSplit, row for row") {
    import org.apache.spark.sql.functions.{col, lit}
    val pool = (target.withColumn("k", lit("t")))
      .unionByName(raw.withColumn("k", lit("r")))
    val twoPass = Dsir.score(pool, "doc_id", "text",
        Dsir.bucketWeightsSplit(pool, col("k") === "t", "text",
          buckets = 64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val onePass = Dsir.scoreSelf(pool, col("k") === "t", "doc_id",
        "text", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(onePass === twoPass)
  }

  test("one-pass split fit equals the two-frame fit on the same pool") {
    import org.apache.spark.sql.functions.{col, lit}
    val pool = (target.withColumn("k", lit("t")))
      .unionByName(raw.withColumn("k", lit("r")))
    val two = Dsir.bucketWeights(target, raw, "text", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val one = Dsir.bucketWeightsSplit(pool, col("k") === "t", "text",
        buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(one === two)
  }

  test("bigram occurrences count: repeated bigram scores twice") {
    // "x y x y" unigrams (x,y,x,y) + bigrams (x y, y x, x y) = 7 grams
    val w = Dsir.bucketWeights(target, raw, "text", buckets = 64)
    val got = Dsir.score(Seq(1L -> "x y x y").toDF("doc_id", "text"),
        "doc_id", "text", w)
      .collect().head
    assert(got.getLong(1) === 7L)
  }

  test("zero-token docs survive with all-zero stats") {
    val w = Dsir.bucketWeights(target, raw, "text", buckets = 64)
    val got = Dsir.score(
        Seq(1L -> "   ", 2L -> "spark").toDF("doc_id", "text"),
        "doc_id", "text", w)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((0L, 0L, 0L)))
    assert(got(2L)._1 === 1L)
  }

  test("both key tiers separate target from raw identically in sign") {
    for (km <- Seq("xxhash64", "md5")) {
      val w = Dsir.bucketWeights(target, raw, "text", buckets = 64,
        keyMode = km)
      val got = Dsir.score(Seq(
          100L -> "spark scala catalyst",
          101L -> "cobol fortran basic").toDF("doc_id", "text"),
          "doc_id", "text", w)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got(100L) > 0 && got(101L) < 0,
        s"keyMode=$km must separate, got $got")
    }
  }

  test("score refuses a weights table without build metadata") {
    val bogus = Seq((0L, 1L, 1L, 0L)).toDF("bucket", "ct", "cr", "w_bits")
    val e = intercept[IllegalArgumentException] {
      Dsir.score(target, "doc_id", "text", bogus)
    }
    assert(e.getMessage.contains("buckets"))
  }

  test("weights round-trip parquet with their build metadata") {
    val dir = java.nio.file.Files.createTempDirectory("dsirw").toString
    Dsir.bucketWeights(target, raw, "text", buckets = 32)
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val direct = Dsir.score(raw, "doc_id", "text", back)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(direct.nonEmpty)
  }

  test("partition invariance: score is identical at 1 and 13 partitions") {
    val docs = (1L to 40L).map(i =>
      i -> s"spark w$i scala cobol w${i % 7}").toDF("doc_id", "text")
    val w = Dsir.bucketWeights(target, raw, "text", buckets = 64)
    val a = Dsir.score(docs.coalesce(1), "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = Dsir.score(docs.repartition(13), "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a === b)
  }

  test("selection shifts the mix toward the target: composing with " +
    "weightedSample keeps more target-like docs") {
    val pool = ((1L to 30L).map(i => (i, s"spark scala catalyst s$i", "t")) ++
      (31L to 60L).map(i => (i, s"cobol fortran basic r$i", "r")))
      .toDF("doc_id", "text", "kind")
    val w = Dsir.bucketWeights(target, raw, "text", buckets = 64)
    val scored = Dsir.score(pool, "doc_id", "text", w)
      .join(pool.select($"doc_id".as("id"), $"kind"), Seq("id"))
    // shift scores to non-negative weights: weight = dsir_cb - min + 1
    val minCb = scored.agg(org.apache.spark.sql.functions.min($"dsir_cb"))
      .head.getLong(0)
    val weighted = scored.withColumn("w",
      $"dsir_cb" - org.apache.spark.sql.functions.lit(minCb) + 1L)
    val kept = graft.etl.Preprocess.weightedSample(
        weighted, "id", "w", targetBp = 4000)
      .groupBy($"kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("t", 0L) > kept.getOrElse("r", 0L),
      s"target-like docs must dominate the kept set, got $kept")
  }
}
