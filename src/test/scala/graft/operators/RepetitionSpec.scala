package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full Gopher repetition family (QualityRules.repetitionReport):
  * hand-computed fixtures plus a randomized brute-force equivalence
  * sweep for every metric, and the staging pin that keeps computed
  * subtrees out of HOF lambdas (the optimized plan must never evaluate
  * an array_sort inside a lambdafunction).
  */
class RepetitionSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private def report(docs: Seq[(Long, String)]): Map[Long, Row] = {
    val df = docs.toDF("doc_id", "text")
    QualityRules.repetitionReport(df, "doc_id", "text")
      .collect().map(r => r.getLong(r.fieldIndex("id")) -> r).toMap
  }

  private def bp(r: Row, c: String): Long = r.getLong(r.fieldIndex(c))

  test("alternating bigram doc: top-gram coverage saturates, no dup 5-grams") {
    val r = report(Seq((1L, "x y x y x y")))(1L)
    // 2-grams: "x y"x3 (chars 2) best 6 of 6 chars -> 10000
    assert(bp(r, "top_2gram_bp") === 10000L)
    // 3-grams: "x y x"x2 (chars 3) best 6 of 6 -> 10000
    assert(bp(r, "top_3gram_bp") === 10000L)
    // 4-grams: "x y x y"x2 (chars 4) best 8 capped at 6 -> 10000
    assert(bp(r, "top_4gram_bp") === 10000L)
    // 5-grams "x y x y x"/"y x y x y" distinct; 6-gram unique; m < 7
    (5 to 10).foreach(n => assert(bp(r, s"dup_${n}gram_bp") === 0L, s"n=$n"))
    // line chunks (k=4): "x y x y", "x y" distinct; single paragraph
    assert(bp(r, "dup_line_bp") === 0L)
    assert(bp(r, "dup_line_char_bp") === 0L)
    assert(bp(r, "dup_para_bp") === 0L)
    assert(bp(r, "dup_para_char_bp") === 0L)
  }

  test("degenerate single-token run: dup n-grams saturate below m, lines 2/3 dup") {
    val r = report(Seq((1L, "a a a a a a a a a a")))(1L) // 10 tokens
    assert(bp(r, "top_2gram_bp") === 10000L) // 9*2 capped to 10
    // n=5..9: >= 2 equal grams, every position covered -> 10000
    (5 to 9).foreach(n => assert(bp(r, s"dup_${n}gram_bp") === 10000L, s"n=$n"))
    // n=10: exactly one gram, no duplicate
    assert(bp(r, "dup_10gram_bp") === 0L)
    // lines k=4: "a a a a","a a a a","a a" -> 2 of 3 dup occurrences
    assert(bp(r, "dup_line_bp") === 6666L)
    // dup chars = 2 chunks * 4 tokens * 1 char = 8 of 10
    assert(bp(r, "dup_line_char_bp") === 8000L)
    assert(!r.getBoolean(r.fieldIndex("pass")))
    assert(!r.getBoolean(r.fieldIndex("r_dup_5gram")))
  }

  test("repeated paragraph: para fractions and overlap-aware 5-gram coverage") {
    val p = "aa bb cc dd ee ff gg hh ii jj kk ll" // 12 tokens, 24 chars
    val doc = s"$p $p mm nn oo pp"                // 28 tokens, 56 chars
    val r = report(Seq((1L, doc)))(1L)
    // paragraph chunks (k=12): p, p, tail -> 2 of 3 occurrences dup
    assert(bp(r, "dup_para_bp") === 6666L)
    // dup chars 48 of 56 -> floor(8571.42)
    assert(bp(r, "dup_para_char_bp") === 8571L)
    // 5-grams: grams 1..8 == grams 13..20; covered tokens 1..24 (48 chars)
    assert(bp(r, "dup_5gram_bp") === 8571L)
    assert(!r.getBoolean(r.fieldIndex("r_dup_para_char")))
  }

  test("empty, blank and sub-n docs are all-zero and pass") {
    val rs = report(Seq((1L, ""), (2L, "   "), (3L, "lone")))
    Seq(1L, 2L, 3L).foreach { id =>
      val r = rs(id)
      val metricCols = Seq("dup_line_bp", "dup_line_char_bp", "dup_para_bp",
        "dup_para_char_bp") ++ (2 to 4).map(n => s"top_${n}gram_bp") ++
        (5 to 10).map(n => s"dup_${n}gram_bp")
      metricCols.foreach(c => assert(bp(r, c) === 0L, s"id=$id col=$c"))
      assert(r.getBoolean(r.fieldIndex("pass")), s"id=$id")
    }
    // documented artifact: a 2-token doc's single 2-gram covers ALL its
    // chars -> 10000 (Gopher applies the word-count floor first, so
    // real pipelines never score such docs)
    val two = report(Seq((9L, "hello world")))(9L)
    assert(bp(two, "top_2gram_bp") === 10000L)
  }

  // ---- randomized brute-force equivalence ---------------------------

  private def bruteTop(toks: Vector[String], n: Int): Long = {
    val total = toks.map(_.length.toLong).sum
    if (toks.size < n || total == 0L) return 0L
    val grams = toks.sliding(n).map(_.mkString(" ")).toVector
    val best = grams.groupBy(identity).map { case (g, occ) =>
      occ.size.toLong * (g.length - (n - 1))
    }.max
    math.min(best, total) * 10000L / total
  }

  private def bruteDup(toks: Vector[String], n: Int): Long = {
    val total = toks.map(_.length.toLong).sum
    if (toks.size < n || total == 0L) return 0L
    val grams = toks.sliding(n).map(_.mkString(" ")).toVector
    val counts = grams.groupBy(identity).map { case (g, o) => g -> o.size }
    val dupStarts = grams.zipWithIndex.collect {
      case (g, i) if counts(g) >= 2 => i
    }.toSet
    val coveredChars = toks.indices.collect {
      case j if dupStarts.exists(i => i <= j && j <= i + n - 1) =>
        toks(j).length.toLong
    }.sum
    coveredChars * 10000L / total
  }

  private def bruteChunks(toks: Vector[String], k: Int): Vector[String] =
    toks.grouped(k).map(_.mkString(" ")).toVector

  private def bruteChunkBp(toks: Vector[String], k: Int): Long = {
    if (toks.isEmpty) return 0L
    val ch = bruteChunks(toks, k)
    val counts = ch.groupBy(identity).map { case (g, o) => g -> o.size }
    ch.count(c => counts(c) >= 2).toLong * 10000L / ch.size
  }

  private def bruteChunkCharBp(toks: Vector[String], k: Int): Long = {
    val total = toks.map(_.length.toLong).sum
    if (toks.isEmpty || total == 0L) return 0L
    val ch = bruteChunks(toks, k)
    val counts = ch.groupBy(identity).map { case (g, o) => g -> o.size }
    val dupChars = ch.zipWithIndex.collect {
      case (c, j) if counts(c) >= 2 =>
        c.length.toLong - (math.min(k, toks.size - j * k) - 1)
    }.sum
    dupChars * 10000L / total
  }

  test("randomized brute-force equivalence across all metrics") {
    val rnd = new scala.util.Random(421)
    val alphabet = Vector("ax", "by", "c", "dd", "eeee", "f")
    val docs = (1L to 60L).map { id =>
      val m = rnd.nextInt(31) // 0..30 tokens
      id -> Vector.fill(m)(alphabet(rnd.nextInt(alphabet.size)))
    }
    val rs = report(docs.map { case (id, t) => (id, t.mkString(" ")) })
    docs.foreach { case (id, toks) =>
      val r = rs(id)
      (2 to 4).foreach(n => assert(bp(r, s"top_${n}gram_bp") ===
        bruteTop(toks, n), s"top n=$n id=$id toks=$toks"))
      (5 to 10).foreach(n => assert(bp(r, s"dup_${n}gram_bp") ===
        bruteDup(toks, n), s"dup n=$n id=$id toks=$toks"))
      assert(bp(r, "dup_line_bp") === bruteChunkBp(toks, 4), s"id=$id")
      assert(bp(r, "dup_line_char_bp") === bruteChunkCharBp(toks, 4), s"id=$id")
      assert(bp(r, "dup_para_bp") === bruteChunkBp(toks, 12), s"id=$id")
      assert(bp(r, "dup_para_char_bp") === bruteChunkCharBp(toks, 12), s"id=$id")
    }
  }

  test("keepRepetition drops exactly the failing docs; kill report attributes") {
    // passing docs need enough chars that a single n-gram stays under
    // the top-gram thresholds (Gopher's word-count floor shields short
    // docs in a real pipeline): 35 unique 5-char tokens -> top-4-gram
    // = 20/175 chars = 1142 bp < 1600
    val docs = Seq(
      (1L, (1 to 35).map(i => f"w$i%02dab").mkString(" ")),
      (2L, ("spam ham " * 20).trim), // degenerate
      (3L, (1 to 35).map(i => f"v$i%02dcd").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val kept = QualityRules.keepRepetition(df, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
    val rep = QualityRules.repetitionReport(df, "doc_id", "text")
    val kill = QualityRules.repetitionKillReport(rep).collect()(0)
    assert(kill.getLong(kill.fieldIndex("n_docs")) === 3L)
    assert(kill.getLong(kill.fieldIndex("n_killed")) === 1L)
    assert(kill.getLong(kill.fieldIndex("kill_top_2gram")) === 1L)
  }

  test("kernel == staged column pipeline on the randomized corpus") {
    val rnd = new scala.util.Random(1213)
    val alphabet = Vector("ax", "by", "c", "dd", "eeee", "f", "ax")
    val docs = (1L to 80L).map { id =>
      (id, Vector.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    } :+ (99L, "") :+ (100L, "  ")
    val df = docs.toDF("doc_id", "text")
    val kernel = QualityRules.repetitionReport(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val staged = QualityRules.repetitionReportStaged(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(kernel.keySet === staged.keySet)
    kernel.keySet.foreach { id =>
      assert(kernel(id) === staged(id), s"id=$id")
    }
  }

  test("staging pin: no array_sort inside any lambda in the optimized plan") {
    val df = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val plan = QualityRules.repetitionReportStaged(df, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    // a lambdafunction whose body re-evaluates array_sort would mean
    // CollapseProject re-inlined a staged sorted column -> O(G^2 log G)
    // per row; same for the dup-set and flags stages
    val lambdas = "lambdafunction\\([^)]*array_sort".r
      .findAllIn(plan).toList
    assert(lambdas.isEmpty, s"staged sort re-inlined into a lambda:\n$plan")
  }
}
