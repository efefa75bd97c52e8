package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** CorpusStats contract: snapshot rows are EXACTLY mergeable on the
  * decimal accumulators (any slicing of the corpus merges to the same
  * totals bit-for-bit), the HLL distinct-docs sketch unions across
  * snapshots (deduplicating across batches — the thing a naive
  * per-batch distinct count cannot do), and mismatched sketch
  * parameters fail loudly rather than merging garbage.
  */
class CorpusStatsSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  // 120 docs; ids 1..40 duplicated three times (401.., 801..) so
  // distinct fingerprints = 40 while n_docs = 120; two blanks.
  private def corpus: DataFrame = (
    (1 to 40).map(i => (i.toLong, s"alpha beta doc $i " + ("w " * (i % 7)))) ++
    (1 to 40).map(i => (400L + i, s"alpha beta doc $i " + ("w " * (i % 7)))) ++
    (1 to 38).map(i => (800L + i, s"alpha beta doc $i " + ("w " * (i % 7)))) ++
    Seq((900L, ""), (901L, "   "))
  ).toDF("doc_id", "text")

  private def exactCols(df: DataFrame): Seq[Any] = {
    val r = df.select("n_docs", "sum_tokens", "sum_tokens_sq", "n_blank",
      "tok_hist").head()
    (0 until 4).map(r.get) :+ r.getSeq[Long](4).toList
  }

  test("slice merge equals single-pass snapshot bit-for-bit") {
    val whole = CorpusStats.snapshot(corpus, "text")
    for (k <- Seq(2, 5, 7)) {
      val slices = (0 until k).map(i =>
        CorpusStats.snapshot(
          corpus.filter(pmod($"doc_id", lit(k)) === i), "text"))
      val merged = CorpusStats.merge(slices.reduce(_ unionByName _))
      assert(exactCols(merged) === exactCols(whole), s"k=$k")
    }
  }

  test("merge of merges equals merge of all (hierarchical compaction)") {
    val snaps = (0 until 6).map(i =>
      CorpusStats.snapshot(
        corpus.filter(pmod($"doc_id", lit(6)) === i), "text"))
    val flat = CorpusStats.merge(snaps.reduce(_ unionByName _))
    val tiered = CorpusStats.merge(
      CorpusStats.merge(snaps.take(3).reduce(_ unionByName _))
        .unionByName(CorpusStats.merge(snaps.drop(3).reduce(_ unionByName _))))
    assert(exactCols(tiered) === exactCols(flat))
    // the sketch survives re-merging too: same estimate either way
    val estFlat = CorpusStats.report(flat)
      .select("approx_distinct_docs").head().getLong(0)
    val estTiered = CorpusStats.report(tiered)
      .select("approx_distinct_docs").head().getLong(0)
    assert(estFlat === estTiered)
  }

  test("report derives mean/std/distinct from the accumulators") {
    val rep = CorpusStats.report(CorpusStats.snapshot(corpus, "text")).head()
    val nDocs = rep.getAs[Long]("n_docs")
    assert(nDocs === 120L)
    assert(rep.getAs[Long]("n_blank") === 2L)
    // direct recompute of the moments from per-doc token counts
    val counts = corpus.select(
      TextFunctions.tokenCount($"text").cast("double").as("n"))
      .collect().map(_.getDouble(0))
    val mean = counts.sum / counts.length
    val std = math.sqrt(counts.map(c => (c - mean) * (c - mean)).sum
      / counts.length)
    assert(math.abs(rep.getAs[Double]("token_mean") - mean) < 1e-9)
    assert(math.abs(rep.getAs[Double]("token_std") - std) < 1e-9)
    // 40 distinct fingerprints (dups + the two blanks collapse);
    // lgK=12 keeps exact counts exact at this cardinality
    val distinct = corpus
      .select(TextFunctions.fingerprint($"text").as("fp"))
      .distinct().count()
    assert(distinct === 41L) // 40 texts + the blank fingerprint
    assert(rep.getAs[Long]("approx_distinct_docs") === distinct)
  }

  test("histogram buckets by integer bit-length; median bounds hold") {
    val rep = CorpusStats.report(CorpusStats.snapshot(corpus, "text")).head()
    // recompute buckets + median rule directly from per-doc counts
    val counts = corpus.select(
      TextFunctions.tokenCount($"text").cast("long").as("n"))
      .collect().map(_.getLong(0))
    val hist = Array.fill(CorpusStats.HistBuckets)(0L)
    counts.foreach(n => hist(63 - java.lang.Long.numberOfLeadingZeros(n + 1)) += 1)
    val snap = CorpusStats.snapshot(corpus, "text")
      .select("tok_hist").head().getSeq[Long](0)
    assert(snap.toList === hist.toList)
    val nDocsAll = counts.length
    val medB = hist.scanLeft(0L)(_ + _).tail.indexWhere(_ * 2 >= nDocsAll)
    assert(rep.getAs[Long]("median_bucket") === medB.toLong)
    assert(rep.getAs[Long]("median_tokens_lo") === (1L << medB) - 1)
    assert(rep.getAs[Long]("median_tokens_hi") === (1L << (medB + 1)) - 2)
    // the true median token count lies inside the reported bounds
    val sorted = counts.sorted
    val med = sorted((counts.length - 1) / 2)
    assert(med >= rep.getAs[Long]("median_tokens_lo") &&
      med <= rep.getAs[Long]("median_tokens_hi"))
  }

  test("sketch dedups across batches — per-batch counting cannot") {
    // slices 0/1/2 each contain one full copy of docs 1..40: a naive
    // sum of per-batch distincts triple-counts; the union must not.
    val batches = Seq(
      corpus.filter($"doc_id" <= 40),
      corpus.filter($"doc_id".between(401, 440)),
      corpus.filter($"doc_id" >= 800))
    val snaps = batches.map(CorpusStats.snapshot(_, "text"))
    val est = CorpusStats.report(CorpusStats.merge(
        snaps.reduce(_ unionByName _)))
      .select("approx_distinct_docs").head().getLong(0)
    assert(est === 41L)
  }

  test("mismatched sketch lgK fails the union loudly") {
    val ok = CorpusStats.snapshot(corpus, "text")
    val alien = corpus.agg(
      count(lit(1)).cast("decimal(38,0)").as("n_docs"),
      lit(0).cast("decimal(38,0)").as("sum_tokens"),
      lit(0).cast("decimal(38,0)").as("sum_tokens_sq"),
      lit(0).cast("decimal(38,0)").as("n_blank"),
      array(Seq.fill(CorpusStats.HistBuckets)(lit(0L)): _*).as("tok_hist"),
      hll_sketch_agg(TextFunctions.fingerprint($"text"),
        lit(CorpusStats.SketchLgK + 1)).as("fp_sketch"))
    val ex = intercept[Exception] {
      CorpusStats.merge(ok.unionByName(alien)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("lgconfigk") ||
      ex.getMessage.toLowerCase.contains("union"))
  }

  test("parquet lifecycle: appendSnapshot x3 then readReport, O(#batches) IO") {
    val dir = Files.createTempDirectory("corpus_stats").toString + "/stats"
    val batches = Seq(
      corpus.filter($"doc_id" <= 300),
      corpus.filter($"doc_id".between(301, 850)),
      corpus.filter($"doc_id" > 850))
    batches.foreach(CorpusStats.appendSnapshot(_, "text", dir))
    // the stats table holds one slim row per batch
    assert(spark.read.parquet(dir).count() === 3L)
    val got = CorpusStats.readReport(spark, dir)
    val want = CorpusStats.report(CorpusStats.snapshot(corpus, "text"))
    assert(got.select("n_docs", "sum_tokens", "n_blank", "token_mean",
        "token_std", "approx_distinct_docs").head() ===
      want.select("n_docs", "sum_tokens", "n_blank", "token_mean",
        "token_std", "approx_distinct_docs").head())
  }

  test("empty input yields a zero report, not nulls") {
    val empty = corpus.filter($"doc_id" < 0)
    val rep = CorpusStats.report(CorpusStats.snapshot(empty, "text")).head()
    assert(rep.getAs[Long]("n_docs") === 0L)
    assert(rep.getAs[Long]("sum_tokens") === 0L)
    assert(rep.getAs[Double]("token_mean") === 0.0)
    assert(rep.getAs[Long]("median_bucket") === -1L)
    assert(rep.getAs[Long]("median_tokens_hi") === 0L)
    assert(rep.getAs[Long]("approx_distinct_docs") === 0L)
  }

  test("idempotent snapshots refuse a plain-append stats directory") {
    val dir = java.nio.file.Files.createTempDirectory("stats_mixed").toString + "/stats"
    val b = Seq((1L, "alpha")).toDF("doc_id", "text")
    CorpusStats.appendSnapshot(b, "text", dir)           // root-level files
    val e = intercept[IllegalArgumentException] {
      CorpusStats.appendSnapshotIdempotent(b, "text", dir, batchId = 0L)
    }
    assert(e.getMessage.contains("cannot share the directory"))
  }

  test("plain append refuses a batch_id-partitioned stats directory") {
    // the guard is BIDIRECTIONAL: a plain appendSnapshot into an
    // idempotent-layout table would write root-level files next to the
    // batch_id=*/ dirs and produce the exact mixed-structure failure
    // the idempotent-side guard exists to prevent
    val dir = java.nio.file.Files.createTempDirectory("stats_mixed2").toString + "/stats"
    val b = Seq((1L, "alpha")).toDF("doc_id", "text")
    CorpusStats.appendSnapshotIdempotent(b, "text", dir, batchId = 0L)
    val e = intercept[IllegalArgumentException] {
      CorpusStats.appendSnapshot(b, "text", dir)
    }
    assert(e.getMessage.contains("cannot share the directory"))
  }
}
