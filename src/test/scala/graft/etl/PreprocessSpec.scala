package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PreprocessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedupColumnNames keeps the first occurrence of each name") {
    val df = Seq((1, 2, 3, 4)).toDF("a", "b", "a", "c")
    val out = Preprocess.dedupColumnNames(df)
    assert(out.columns.toSeq === Seq("a", "b", "c"))
    assert(out.head === org.apache.spark.sql.Row(1, 2, 4))
    // no-op on unique names
    val uniq = Seq((1, 2)).toDF("x", "y")
    assert(Preprocess.dedupColumnNames(uniq) eq uniq)
  }

  test("dropColumnsResolved matches case/underscore-insensitively") {
    val df = Seq((1, 2.0, "x")).toDF("Flow_Duration", "Active_Std", "Label")
    val out = Preprocess.dropColumnsResolved(df, Seq("Active_STD", "FLOWDURATION", "missing"))
    assert(out.columns.toSeq === Seq("Label"))
  }

  test("coerceWithFallback coalesces candidates in order then casts") {
    val df = Seq(
      (Some("1"), Some("9")),
      (None, Some("7")),
      (None, None))
      .toDF("primary", "fallback")
    val out = Preprocess.coerceWithFallback(df, "v", Seq("primary", "fallback"), "int")
    assert(out.select("v").collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
      === Seq(1, 7, -1))
    assertThrows[IllegalArgumentException] {
      Preprocess.coerceWithFallback(df, "v", Seq("nope"), "int")
    }
  }

  test("seededSplit is deterministic, disjoint, and complete") {
    val df = spark.range(1000).toDF("id")
    val Array(a1, b1) = Preprocess.seededSplit(df, Array(0.8, 0.2), 42L)
    val Array(a2, b2) = Preprocess.seededSplit(df, Array(0.8, 0.2), 42L)
    assert(a1.count() === a2.count())
    assert(a1.count() + b1.count() === 1000L)
    assert(a1.join(b1, "id", "inner").count() === 0L)
    // same seed, same rows
    assert(a1.exceptAll(a2).count() === 0L)
  }

  test("bernoulliSample is seeded and in a plausible fraction band") {
    val df = spark.range(10000).toDF("id")
    val s1 = Preprocess.bernoulliSample(df, 0.1, 42L)
    val s2 = Preprocess.bernoulliSample(df, 0.1, 42L)
    val n = s1.count()
    assert(n === s2.count())
    assert(n > 700 && n < 1300, s"sample count $n far from 10% of 10000")
  }

  test("stratifiedSample keeps minorities, downsamples the majority") {
    val df = spark.range(10000)
      .selectExpr("id", "CASE WHEN id % 100 = 0 THEN 'rare' ELSE 'common' END AS cls")
    val out = Preprocess.stratifiedSample(df, "cls",
      Map("rare" -> 1.0, "common" -> 0.1), 42L)
    val byCls = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCls("rare") === 100L, "fraction 1.0 must keep every rare row")
    assert(byCls("common") > 700L && byCls("common") < 1300L)
    // seeded: repeatable
    val again = Preprocess.stratifiedSample(df, "cls",
      Map("rare" -> 1.0, "common" -> 0.1), 42L)
    assert(out.exceptAll(again).count() === 0L)
  }

  test("withEventMeta adds uuid + ISO timestamp envelope columns") {
    val out = Preprocess.withEventMeta(Seq(1, 2, 3).toDF("x"))
    val rows = out.collect()
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    val isoRe = "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{6}$".r
    assert(rows.forall(r => uuidRe.matches(r.getAs[String]("event_id"))))
    assert(rows.forall(r => isoRe.matches(r.getAs[String]("created_at"))))
    assert(rows.map(_.getAs[String]("event_id")).distinct.length === 3)
  }

  /** 80-row raw fixture with messy headers, 2 exact duplicates, 2 rows
    * poisoned with Infinity/null, 70 BENIGN / 6 attack clean rows —
    * the reference's example-data accounting shape (80 raw → 76 clean →
    * train/stream split; preprocessing.pkl `rows`). */
  private def rawFixture = {
    val base = (1 to 76).map { i =>
      val label =
        if (i <= 70) "BENIGN"
        else Seq("DoS Hulk", "DDoS", "PortScan", "Bot",
          "FTP-Patator", "Web Attack XSS")(i - 71)
      (i.toDouble, (i * 2).toDouble.toString, label)
    }
    val poisoned = Seq(
      (79.0, "Infinity", "BENIGN"),
      (80.0, null.asInstanceOf[String], "BENIGN"))
    val dups = Seq(base.head, base(1)) // 2 exact duplicates
    spark.createDataFrame(
      spark.sparkContext.parallelize(base ++ poisoned ++ dups, 4)
    ).toDF(" Flow Duration", "Flow Bytes/s", "Label")
  }

  test("run: full chain row accounting and schema") {
    val prep = Preprocess.run(rawFixture, "Label",
      dropCols = Seq("nonexistent col"), seed = 42L)
    assert(prep.counts("raw") === 80L)    // 78 distinct + 2 dup rows
    assert(prep.counts("dedup") === 78L)
    assert(prep.counts("clean") === 76L)  // Infinity + null rows dropped
    assert(prep.counts("benign") === 70L)
    assert(prep.counts("attacks") === 6L)
    assert(prep.counts("train") + prep.counts("stream") === 76L)
    // train has no label columns; stream keeps both
    assert(!prep.train.columns.contains("Label"))
    assert(!prep.train.columns.contains("label_class"))
    assert(prep.stream.columns.contains("label_class"))
    // sanitized names
    assert(prep.train.columns.contains("Flow_Duration"))
    assert(prep.train.columns.contains("Flow_Bytes_s"))
    // scaled train columns have ~zero mean
    val m = prep.train.agg(avg(col("Flow_Duration"))).head.getDouble(0)
    assert(math.abs(m) < 1e-9)
    // deterministic across runs (same seed)
    val prep2 = Preprocess.run(rawFixture, "Label",
      dropCols = Seq("nonexistent col"), seed = 42L)
    assert(prep2.counts === prep.counts)
  }

  test("hashSplit: partition-independent, near-target, loud bounds") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val out = Preprocess.hashSplit(df, "id", trainBp = 8000, salt = "s")
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val trainFrac = byId.values.count(_ == "train").toDouble / 2000
    assert(math.abs(trainFrac - 0.8) < 0.03,
      s"hash split drifted from 80%: $trainFrac")
    // assignment is a pure function of (salt, id): any partitioning,
    // any subset, same answer
    val re = Preprocess.hashSplit(df.repartition(13), "id", 8000, "s")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(re === byId)
    val subset = Preprocess.hashSplit(
        df.filter($"id" % 3 === 0), "id", 8000, "s")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    subset.foreach { case (id, split) => assert(split === byId(id)) }
    // a different salt reassigns
    val resalted = Preprocess.hashSplit(df, "id", 8000, "t")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(resalted.exists { case (id, sp) => sp != byId(id) })
    intercept[IllegalArgumentException] {
      Preprocess.hashSplit(df, "id", trainBp = 0)
    }
    intercept[IllegalArgumentException] {
      Preprocess.hashSplit(df, "id", trainBp = 10000)
    }
  }

  test("weightedSample: PPS rates, determinism, loud type gate") {
    import spark.implicits._
    // weights 1 and 9, equally many of each: at target 50% the keep
    // probabilities are p(w=1) = 0.1 and p(w=9) = 0.9 (mean weight 5)
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) 1 else 9))
      .toDF("id", "w")
    val kept = Preprocess.weightedSample(df, "id", "w", targetBp = 5000)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val light = kept.count(_._2 == 1) / 1000.0
    val heavy = kept.count(_._2 == 9) / 1000.0
    assert(math.abs(light - 0.1) < 0.04, s"w=1 keep rate drifted: $light")
    assert(math.abs(heavy - 0.9) < 0.04, s"w=9 keep rate drifted: $heavy")
    // pure function of (salt, id, weights): repartitioned = identical
    val re = Preprocess.weightedSample(df.repartition(7), "id", "w", 5000)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(re.sorted.toSeq === kept.sorted.toSeq)
    // the clamp: one giant weight is always kept
    val clamp = Seq((1L, 1000000), (2L, 1), (3L, 1)).toDF("id", "w")
    assert(Preprocess.weightedSample(clamp, "id", "w", 5000)
      .collect().map(_.getLong(0)).contains(1L))
    // float weights reject loudly
    intercept[IllegalArgumentException] {
      Preprocess.weightedSample(
        Seq((1L, 0.5)).toDF("id", "w"), "id", "w", 5000)
    }
  }

  test("splitLeakage: only straddling canonical groups, exemplar min ids") {
    // discover the split verdicts the hash assigns to ids 1..60, then
    // construct a corpus with a known straddling pair, a same-split
    // duplicate pair, and singletons
    val ids = (1L to 60L).map(i => (i, s"probe")).toDF("doc_id", "text")
    val split = Preprocess.hashSplit(ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val trainIds = (1L to 60L).filter(split(_) == "train")
    val valIds = (1L to 60L).filter(split(_) == "val")
    assert(trainIds.size >= 3 && valIds.size >= 2, "need both sides")
    val (t1, t2, v1) = (trainIds(0), trainIds(1), valIds(0))
    val docs = Seq(
      // straddling group: same token SET, different order/repeats
      t1 -> "alpha beta gamma",
      v1 -> "gamma beta alpha alpha",
      // same-split duplicate pair: must NOT be flagged
      t2 -> "delta epsilon",
      trainIds(2) -> "epsilon delta",
      // singletons
      valIds(1) -> "zeta only here"
    ).toDF("doc_id", "text")
    val got = Preprocess.splitLeakage(docs, "doc_id", "text").collect()
    assert(got.length === 1, "exactly the straddling group")
    val r = got(0)
    assert((r.getLong(1), r.getLong(2)) === ((1L, 1L)))
    assert((r.getLong(3), r.getLong(4)) === ((t1, v1)))
  }
}
