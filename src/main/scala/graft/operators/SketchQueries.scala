package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sketch-tier queries: approximate summaries driving EXACT, oracle-
  * checkable answers (see Sketches). The DuckDB mirrors compute the
  * same answers the expensive way (full aggregation / full join) — the
  * hash compare certifies that sketch-candidates + exact-verify loses
  * nothing.
  */
object SketchQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Count-Min heavy hitters at phi = 0.05% of all token occurrences:
    // sketch pass (map-side, fixed memory) -> candidate-row filter ->
    // exact count verify. The full-token groupBy the oracle runs is
    // exactly what this avoids at scale.
    "q65_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      Sketches.heavyHitterTokensByShare(
          Tables.documents(s, d), "text", phi = 0.0005)
        .orderBy($"tok")
    }),

    // Bloom-pruned join: lineitem rows are prefiltered by a Bloom
    // sketch of the qualifying orders' keys BEFORE any shuffle (the
    // manual form of runtime filter pushdown); the join removes the
    // sketch's false positives, so the aggregate equals the plain
    // join's exactly.
    "q66_bloom_join" -> ((s, d) => {
      import s.implicits._
      val big = Tables.orders(s, d).filter($"o_totalprice" > 400000.0)
      Sketches.bloomJoin(Tables.lineitem(s, d), big,
          "l_orderkey", "o_orderkey", expectedKeys = 200000L)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(floor($"l_extendedprice" * 100)).as("rev_c"))
        .orderBy($"l_returnflag")
    }),

    // HLL distinct-count certification: exact count(distinct) next to
    // approx_count_distinct at rsd 1%, emitting whether the estimate
    // landed inside the 5% envelope. The oracle pins the exact counts
    // AND (as a literal TRUE column) the claim that the sketch held its
    // bound — at 100 TB only the approx column survives, and this query
    // is the evidence for trusting it.
    // Exact and approx are computed as SEPARATE aggregates joined on
    // the group key, never one mixed agg: Spark's rewrite of a mixed
    // distinct+non-distinct aggregate routes the non-distinct function
    // through the per-(key, user_id) partial — i.e. one 1639-word HLL
    // buffer PER DISTINCT USER materialized and shuffled (~13 KB/user,
    // measured 2.5 s at sf0.1 vs 0.4 s split; at 100 TB it is the
    // whole query). Split, the approx branch carries one sketch per
    // (task × event_type) and the exact branch shuffles slim
    // (event_type, user_id) pairs. n_approx is identical either way:
    // HLL registers are order-independent maxes over the same hashed
    // id set. (Guide §2.3 — shuffle fewer bytes.)
    "q67_approx_distinct" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val exact = ev.groupBy($"event_type")
        .agg(count_distinct($"user_id").as("n_users"))
      val approx = ev.groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.01).as("n_approx"))
      exact.join(approx, Seq("event_type"))
        .select($"event_type", $"n_users",
          (abs($"n_approx" - $"n_users") <= $"n_users" * 0.05)
            .as("approx_ok"))
        .orderBy($"event_type")
    }),

    // Incremental corpus stats (CorpusStats): the corpus is cut into 5
    // slices, each slice contributes ONE mergeable snapshot row, and the
    // merged accumulators must equal DuckDB's single-pass full-corpus
    // totals bit-for-bit (decimal integer sums are order-independent).
    // The HLL distinct-docs sketch rides the same merge; sketch_ok pins
    // that the unioned estimate stays inside 5% of the exact distinct
    // fingerprint count (same certification pattern as q67).
    "q75_stats_merge" -> ((s, d) => {
      import s.implicits._
      val doc = Tables.documents(s, d)
      val slices = (0 until 5).map(i =>
        CorpusStats.snapshot(doc.filter(pmod($"doc_id", lit(5)) === i), "text"))
      val merged = CorpusStats.merge(slices.reduce(_ unionByName _))
      val exact = doc.agg(count_distinct(
        graft.functions.TextFunctions.fingerprint($"text")).as("nd"))
      merged.crossJoin(exact).select(
        $"n_docs".cast("long").as("n_docs"),
        $"sum_tokens".cast("long").as("sum_tokens"),
        $"sum_tokens_sq".cast("long").as("sum_tokens_sq"),
        $"n_blank".cast("long").as("n_blank"),
        (abs(hll_sketch_estimate($"fp_sketch") - $"nd") <= $"nd" * 0.05)
          .as("sketch_ok"))
    }),

    // Mergeable token-count histogram: the same 5-slice merge, but
    // pinning the log2-bucket counts (integer bit-length buckets, so
    // the oracle can't flake on float log2 at power-of-two edges)
    // against DuckDB's direct full-corpus bucketing.
    "q76_stats_hist" -> ((s, d) => {
      import s.implicits._
      val doc = Tables.documents(s, d)
      val slices = (0 until 5).map(i =>
        CorpusStats.snapshot(doc.filter(pmod($"doc_id", lit(5)) === i), "text"))
      CorpusStats.merge(slices.reduce(_ unionByName _))
        .select(posexplode($"tok_hist").as(Seq("bucket", "n_docs")))
        .filter($"n_docs" > 0)
        .select($"bucket".cast("long").as("bucket"), $"n_docs")
        .orderBy($"bucket")
    })
  )

  // DuckDB mirror of TextFunctions.tokens (same convention as Corpus)
  private val toks =
    "(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) " +
      "ELSE string_split_regex(trim(text), '\\s+') END)"
  private val nTok = s"len($toks)"

  def oracleSql: Map[String, String] = Map(
    "q65_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest($toks) AS tok FROM documents),
         |tot AS (SELECT count(*) AS c FROM t)
         |SELECT tok, count(*) AS n FROM t GROUP BY tok
         |HAVING count(*) >= ceil(0.0005 * (SELECT c FROM tot))
         |ORDER BY tok""".stripMargin,
    "q66_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(SUM(FLOOR(l_extendedprice * 100)) AS BIGINT) AS rev_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q67_approx_distinct" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS n_users,
        | TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q75_stats_merge" ->
      s"""SELECT COUNT(*) AS n_docs,
         | CAST(SUM($nTok) AS BIGINT) AS sum_tokens,
         | CAST(SUM(CAST($nTok AS BIGINT) * $nTok) AS BIGINT)
         |   AS sum_tokens_sq,
         | CAST(SUM(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_blank,
         | TRUE AS sketch_ok
         |FROM documents""".stripMargin,
    "q76_stats_hist" ->
      s"""SELECT CAST(length(ltrim(bin($nTok + 1), '0')) - 1 AS BIGINT)
         |   AS bucket,
         | COUNT(*) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
