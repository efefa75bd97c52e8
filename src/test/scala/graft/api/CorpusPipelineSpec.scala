package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("staged funnel: one planted kill per tier, counts audit the " +
    "whole path") {
    val body = "a long enough document body with plenty of words to " +
      "pass the quality gate without any trouble at all today"
    val docs = Seq(
      (1L, s"$body survivor one", "wiki"),
      (2L, "too short", "wiki"),                    // quality kill
      (3L, s"$body but spamword inside", "wiki"),   // blocklist kill
      (4L, s"$body survivor one", "web"),           // exact dup of 1
      (5L, s"$body survivor five", "web"))
      .toDF("doc_id", "text", "source")
    val out = CorpusPipeline(docs)
      .quality(minWords = 5)
      .blocklist(Seq("spamword"))
      .dedupExact()
      .run()
    assert(out.funnel === Seq(
      "input" -> 5L, "quality" -> 4L, "blocklist" -> 3L,
      "dedup_exact" -> 2L))
    val ids = out.corpus.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 5L))
    assert(out.corpus.columns.toSeq ===
      Seq("doc_id", "text", "source"), "original schema survives")
  }

  test("dedupChunk stage rewrites intra-doc repeats in place, drops " +
    "no documents") {
    val docs = Seq(
      (1L, "a b c d a b e f", "wiki"),   // [a b] repeats in-doc (k=2)
      (2L, "a b x y", "web"))            // cross-doc repeat untouched
      .toDF("doc_id", "text", "source")
    val out = CorpusPipeline(docs).dedupChunk(chunkTokens = 2).run()
    assert(out.funnel === Seq("input" -> 2L, "dedup_chunk" -> 2L))
    val m = out.corpus.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "a b c d e f")
    assert(m(2L) === "a b x y")
    assert(out.corpus.columns.toSeq === Seq("doc_id", "text", "source"))
    out.release()
  }

  test("dedupLongMatch stage cuts the copied run everywhere but its " +
    "first carrier, drops no documents") {
    val run = (1 to 14).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"open1 open2 $run close1 close2", "wiki"),
      (2L, s"other1 other2 other3 $run tail1", "web"))
      .toDF("doc_id", "text", "source")
    val out = CorpusPipeline(docs).dedupLongMatch(minLen = 10).run()
    assert(out.funnel === Seq("input" -> 2L, "dedup_longmatch" -> 2L))
    val m = out.corpus.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === s"open1 open2 $run close1 close2")
    assert(m(2L) === "other1 other2 other3 tail1")
    assert(out.corpus.columns.toSeq === Seq("doc_id", "text", "source"))
    out.release()
  }

  test("repetition stage kills the repeated-paragraph doc the basic " +
    "quality gate passes") {
    // doc 2 passes every basic Gopher rule (30 words, 3.9 mean len, 3
    // stopword kinds, max token share 2/30) but repeats its 12-token
    // opening paragraph -> dup_para_bp 6666 > 3000
    val p = "the quick brown fox jumped over a lazy dog near big river"
    val docs = Seq(
      (1L, "the a " + (1 to 35).map(i => f"w$i%02dab").mkString(" "), "wiki"),
      (2L, s"$p $p and some more words after all", "web"))
      .toDF("doc_id", "text", "source")
    val out = CorpusPipeline(docs)
      .quality(minWords = 5)
      .repetition()
      .run()
    assert(out.funnel === Seq(
      "input" -> 2L, "quality" -> 2L, "repetition" -> 1L))
    assert(out.corpus.select($"doc_id").collect()
      .map(_.getLong(0)).toSet === Set(1L))
    out.release()
  }

  test("paragraph-dedup stage strips boilerplate, rewrites text in " +
    "place and drops emptied docs") {
    val docs = Seq(
      (1L, "unique alpha\n\nBOILER FOOTER", "wiki"),
      (2L, "BOILER FOOTER\n\nunique beta", "web"),
      (3L, "BOILER FOOTER", "web"))                 // boilerplate-only
      .toDF("doc_id", "text", "source")
    val out = CorpusPipeline(docs).dedupParagraph().run()
    assert(out.funnel === Seq("input" -> 3L, "dedup_paragraph" -> 2L))
    val byId = out.corpus.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(byId === Map(
      1L -> "unique alpha\nBOILER FOOTER",
      2L -> "unique beta"))
    assert(out.corpus.columns.toSeq === Seq("doc_id", "text", "source"),
      "original schema survives the text rewrite")
  }

  test("paragraph-dedup stage re-curates a settle-shaped corpus whose " +
    "text column is itself clean_text") {
    val docs = Seq((1L, "unique alpha\n\nBOILER"), (2L, "BOILER\n\nbeta"))
      .toDF("id", "clean_text")
    val out = CorpusPipeline(docs, "id", "clean_text")
      .dedupParagraph().run()
    val byId = out.corpus.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("clean_text")).toMap
    assert(byId === Map(1L -> "unique alpha\nBOILER", 2L -> "beta"))
  }

  test("buckets stage keeps the head+middle terciles per source") {
    val docs = ((1L to 6L).map(i => (i, "common words common words", "s")) :+
      (7L, "zyx qwv unique rare", "s") :+
      (8L, "common words common words", "s") :+
      (9L, "common rare words common", "s"))
      .toDF("doc_id", "text", "source")
    val out = CorpusPipeline(docs).keepBuckets("source").run()
    // n = 9: head 2 + middle 4 survive, tail 3 drop (floor quotas)
    assert(out.funnel === Seq("input" -> 9L, "buckets" -> 6L))
    val ids = out.corpus.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(!ids.contains(7L), "the all-rare tail doc must drop")
    intercept[IllegalArgumentException] {
      CorpusPipeline(docs).keepBuckets("source", Set("giant"))
    }
  }

  test("relevance stage keeps docs scoring against the probe terms") {
    val docs = (Seq(
      (1L, "spark catalyst shuffle exchange plan"),
      (2L, "spark tungsten codegen stage")) ++
      (10L to 20L).map(i => (i, "cobol fortran pascal basic algol")))
      .toDF("doc_id", "text")
    val out = CorpusPipeline(docs)
      .relevance(Seq("spark", "catalyst"), minScoreE4 = 1L).run()
    val ids = out.corpus.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L), s"only on-topic docs survive, got $ids")
    assert(out.funnel === Seq("input" -> 13L, "relevance" -> 2L))
  }

  test("near-dup stage collapses clusters to their root") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "the quick brown fox jumps over the lazy dog by the shore"),
      (3L, "a completely different document with its own token stream"))
      .toDF("doc_id", "text")
    val out = CorpusPipeline(docs).dedupNear(threshold = 0.5).run()
    val ids = out.corpus.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L), s"cluster {1,2} keeps its root: $ids")
  }

  test("select stage leans the mix toward the target slice") {
    val docs = ((1L to 15L).map(i => (i, s"spark scala catalyst t$i", "t")) ++
      (16L to 60L).map(i => (i, s"cobol fortran basic r$i", "r")))
      .toDF("doc_id", "text", "kind")
    val out = CorpusPipeline(docs)
      .select(col("kind") === "t", keepBp = 4000, buckets = 64)
      .run()
    val kept = out.corpus.groupBy($"kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("t", 0L).toDouble / 15 >
      kept.getOrElse("r", 0L).toDouble / 45,
      s"target slice must be over-represented, got $kept")
    assert(out.funnel.last._1 === "select")
  }

  test("facade refuses a frame without the declared columns, and " +
    "string ids loudly (they would null-cast and empty every join)") {
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline(Seq((1L, "x")).toDF("id", "body"))
    }
    assert(e.getMessage.contains("doc_id"))
    val e2 = intercept[IllegalArgumentException] {
      CorpusPipeline(Seq(("d1", "x")).toDF("doc_id", "text"))
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("a stage that empties the pool does not break later stages") {
    val docs = Seq((1L, "short", "a")).toDF("doc_id", "text", "source")
    val out = CorpusPipeline(docs)
      .quality(minWords = 50)           // kills the only doc
      .select(col("source") === "a", keepBp = 5000)
      .run()
    assert(out.funnel === Seq("input" -> 1L, "quality" -> 0L,
      "select" -> 0L))
    assert(out.corpus.count() === 0L)
    out.release()
  }
}
