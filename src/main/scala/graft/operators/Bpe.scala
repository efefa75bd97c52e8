package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.
  * 2016, ACL — public standard practice): learn the `nMerges` most
  * frequent symbol merges from the corpus, producing the merge table a
  * subword tokenizer runs on. The corpus-side half of "train a
  * tokenizer on your data" — the piece of an LLM data pipeline that
  * has to see ALL the data and therefore has to be distributed.
  *
  * Scale shape (why this works at 100 TB): the corpus is read ONCE,
  * collapsing to the word-frequency table — vocabulary-sized, orders
  * of magnitude smaller than the corpus (Heaps' law), with each word
  * carrying its character segmentation. Every merge iteration then
  * runs on that compressed table only: one adjacent-pair count
  * aggregate (map-side combinable, weighted by word frequency — a
  * word appearing 10⁹ times costs one row, not 10⁹), one top-1
  * `orderBy(...).limit(1)` (planned as a bounded per-partition top-k
  * merge, not a global sort), and one map-only re-segmentation pass.
  * Driver state is the merge list itself (nMerges rows). Ties break
  * by (count desc, left asc, right asc) so training is deterministic
  * across engines, partitionings and runs.
  *
  * Segmentation uses the standard end-of-word sentinel `</w>` so a
  * word-final merge differs from a word-internal one. Merge
  * application inside one pass is the standard greedy left-to-right
  * scan: after merging at position i, scanning resumes at i+2 — which
  * is exactly the single-pass array fold below (a freshly merged
  * symbol never re-merges with the NEXT symbol in the same pass, but
  * can in the next iteration).
  */
object Bpe {

  /** One learned merge: rank is 1-based training order. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, count: Long)

  private val EndOfWord = "</w>"

  /** Character segmentation + sentinel: "low" → [l, o, w, </w>]. */
  private def charSym(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))),
      array(lit(EndOfWord)))

  /** The compressed training table: (word, freq, sym) — one row per
    * distinct word, segmentation initialized to characters. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("sym", charSym(col("word")))

  /** Adjacent symbol pairs of the current segmentation, weighted by
    * word frequency: (a, b, cnt). One aggregate over the word table. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"),
        explode(
          zip_with(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Apply ONE merge (a,b)→ab across a segmentation array: greedy
    * left-to-right single pass as an array fold. The fold re-reads
    * only its accumulator — no O(len²) re-evaluation (the staged-
    * projection lesson); `size(acc) > 0` short-circuits the
    * element_at so the empty accumulator never indexes. */
  def mergeOnce(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `nMerges` merges. Returns the ordered merge list and the
    * word table under the FINAL segmentation (the trained subword
    * vocabulary: distinct symbols of `sym` + their corpus stats).
    * Stops early when no pair reaches `minCount`. */
  def fit(docs: DataFrame, textCol: String, nMerges: Int,
          minCount: Long = 2L): (Seq[Merge], DataFrame) = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    var words = graft.core.Caching.persistTracked(wordTable(docs, textCol))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (a, b, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, a, b, a + b, c)
        // eager localCheckpoint: materializes the new segmentation
        // BEFORE dropping the old one AND truncates the logical plan —
        // without the cut, rank-deep nesting of mergeOnce expression
        // trees makes analysis itself blow up long before 32k merges
        // (the standard iterative-algorithm checkpoint pattern)
        val next = words.withColumn("sym", mergeOnce(col("sym"), a, b))
          .localCheckpoint()
        words.unpersist()
        words = next
        rank += 1
      }
    }
    (merges.result(), words)
  }

  /** `fit` with BATCHED merge rounds: one pair-count aggregate + one
    * re-segmentation pass learns up to `batchTopM` merges instead of
    * one, cutting the jobs-per-merge cost (the 32k-vocab problem:
    * `fit` is one Spark job pair PER merge) by the mean batch size.
    *
    * Default mode (`strict = false`) is the standard batched-BPE
    * practice: scan the collected top-M candidates in (count desc,
    * left, right) order — the same total order sequential's `limit(1)`
    * uses — and greedily accept every candidate that shares NO symbol
    * with an already-accepted merge of this round. Merging (a,b) only
    * changes counts of pairs touching a or b and only creates pairs
    * touching the new symbol ab, so each accepted candidate's count is
    * exactly its sequential value given the earlier accepted merges.
    * The KNOWN approximation (inherent to every batched trainer): a
    * merge CHAIN — (e,s) → (es,t) → (est,</w>), where each successor
    * pair only exists after the previous merge applies — serializes
    * across rounds, so when a chain successor would have outranked a
    * disjoint candidate, the batched merge ORDER (and at a fixed
    * nMerges budget, the tail of the vocabulary) can differ from
    * sequential. Quality is on par; chains still resolve, one round
    * per link.
    *
    * `strict = true` additionally requires each accepted candidate's
    * count to be STRICTLY above (a) the count of every collected
    * candidate — behind or ahead of the scan cursor — that overlaps an
    * accepted merge (any pair created or shrunk by an accepted merge
    * is bounded by one of those counts; strictness keeps the lexical
    * tie-break from ever being consulted against a changed pair, and
    * the forward scan matters because an overlapping pair TYING the
    * count can sort after it), and (b) the truncation floor (the M-th
    * collected count) when the list was cut at M. The first failure
    * ends the round, so acceptance stays a provable prefix of
    * sequential's picks: strict mode returns the EXACT sequential
    * merge list (BpeSpec pins this on the textbook fixture and on
    * randomized corpora) at the price of degenerating to one merge
    * per round on chain-heavy natural text.
    */
  def fitBatched(docs: DataFrame, textCol: String, nMerges: Int,
                 minCount: Long = 2L, batchTopM: Int = 64,
                 strict: Boolean = false): (Seq[Merge], DataFrame) = {
    val (m, w, _) = fitBatchedCounted(docs, textCol, nMerges, minCount,
      batchTopM, strict)
    (m, w)
  }

  /** `fitBatched` + the number of aggregate rounds it ran — the job
    * count divided by jobs-per-round; the spec's ≤ sequential/4 pin. */
  def fitBatchedCounted(docs: DataFrame, textCol: String, nMerges: Int,
                        minCount: Long = 2L, batchTopM: Int = 64,
                        strict: Boolean = false)
      : (Seq[Merge], DataFrame, Int) = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    require(batchTopM >= 1, s"batchTopM must be >= 1, got $batchTopM")
    var words = graft.core.Caching.persistTracked(wordTable(docs, textCol))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var rounds = 0
    var done = false
    while (rank <= nMerges && !done) {
      val rows = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(batchTopM).collect()
      rounds += 1
      if (rows.isEmpty || rows(0).getLong(2) < minCount) done = true
      else {
        val floor =
          if (rows.length == batchTopM) rows.last.getLong(2)
          else Long.MinValue
        // rows below minCount can neither be picked by sequential nor
        // outrank a candidate (counts only ever decrease)
        val cand = rows.iterator
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .takeWhile(_._3 >= minCount).toArray
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[Merge]
        val remaining = nMerges - rank + 1
        var i = 0
        var stop = false
        while (i < cand.length && !stop && accepted.length < remaining) {
          val (a, b, c) = cand(i)
          if (used(a) || used(b)) i += 1 // changed by an accepted merge
          else {
            // strict only — the whole LIST, not just rows behind the
            // cursor: an overlapping pair TYING the candidate's count
            // can sit after it in (a, b) order, and its post-merge
            // derivative can win sequential's lexical tie-break (the
            // (c,o) → (co,lu) case), so the bound scan looks forward
            val maxOverlap =
              if (!strict) Long.MinValue
              else cand.iterator
                .filter(t => used(t._1) || used(t._2)).map(_._3)
                .maxOption.getOrElse(Long.MinValue)
            if (strict && accepted.nonEmpty &&
                (c <= maxOverlap || c <= floor))
              stop = true
            else {
              accepted += Merge(rank + accepted.length, a, b, a + b, c)
              used += a; used += b
              i += 1
            }
          }
        }
        merges ++= accepted
        rank += accepted.length
        val batch = accepted.toSeq
        val applySeg = udf((sym: Seq[String]) =>
          applyMergesArr(sym.toArray, batch).toSeq)
        // eager localCheckpoint: materialize before dropping the old
        // segmentation + truncate the plan (the `fit` lineage lesson)
        val next = words.withColumn("sym", applySeg(col("sym")))
          .localCheckpoint()
        words.unpersist()
        words = next
      }
    }
    (merges.result(), words, rounds)
  }

  /** Subword vocabulary of a fitted word table: every distinct symbol
    * with the number of words carrying it and its total corpus
    * occurrences. */
  def vocab(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(col("sym")).as("symbol"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_words"), sum(col("freq")).as("n_occurrences"))

  /** Persist a learned merge table (rank-ordered parquet — the
    * tokenizer-build artifact, ModelRegistry-style). */
  def writeMerges(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[Merge], dir: String): Unit = {
    require(merges.nonEmpty, "refusing to persist an empty merge table")
    import spark.implicits._
    merges.toDF().write.mode("overwrite").parquet(dir)
  }

  /** Load a merge table back in training order. */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Seq[Merge] = {
    import spark.implicits._
    val m = spark.read.parquet(dir).as[Merge]
      .collect().sortBy(_.rank).toSeq
    require(m.nonEmpty, s"no merges found at $dir")
    require(m.map(_.rank) == (1 to m.length),
      s"merge table at $dir has gaps/duplicates in rank order")
    m
  }

  /** Segment ARBITRARY words under a stored merge list: chars +
    * sentinel, then every merge applied in training order with the
    * exact greedy left-to-right scan `fit` used — so a training-corpus
    * word reproduces its training segmentation bit-for-bit
    * (BpeSpec pins that round trip). A Scala function rather than a
    * Column expression by necessity: the column form would nest
    * `mergeOnce` nMerges deep (a rank-64 expression tree per row);
    * the per-element loop here is the vector-kernel trade the UDF
    * policy reserves for exactly this case.
    *
    * This linear O(nMerges·len) form is the CERTIFICATION TWIN; the
    * production serving path is [[MergeTable]]'s rank-indexed greedy
    * (O(applied·len), independent of vocab size — at a 32k-merge vocab
    * the linear form is 32k array passes per distinct word). BpeSpec
    * pins table(...) == segmentWord(...) on fitted and unseen words. */
  private[operators] def segmentWord(word: String,
                                     merges: Seq[Merge]): Seq[String] =
    applyMergesArr((word.map(_.toString) :+ EndOfWord).toArray, merges)
      .toSeq

  /** Rank-indexed merge table — the production encode kernel. Built
    * ONCE per merge list (pair → its merges in rank order) and shipped
    * in the UDF closure; `apply` segments one word.
    *
    * Algorithm: floored min-rank greedy. Repeatedly find the adjacent
    * pair whose table rank is minimal AMONG RANKS ABOVE THE LAST
    * APPLIED ONE, and merge all its occurrences in the same greedy
    * left-to-right single pass `mergeOnce`/`applyMergesArr` use; stop
    * when no such pair exists. The monotone floor makes this provably
    * bit-equal to the linear in-order scan for ANY merge table: by
    * induction, the linear scan's next applied merge is exactly the
    * smallest present rank above the last applied one (the array only
    * changes when a merge applies, so "present at its turn" = present
    * now). For tables produced by training the floor never bites — a
    * merge involving a symbol created at rank r always has rank > r —
    * so this is also the standard min-rank BPE encode. Cost:
    * O(applied·len) with applied ≤ len−1, INDEPENDENT of vocab size;
    * the per-round rescan beats a heap at word lengths. */
  final class MergeTable(merges: Seq[Merge]) extends Serializable {
    require(merges.nonEmpty, "need a non-empty merge table")
    private val byPair: Map[(String, String), Array[Merge]] =
      merges.groupBy(m => (m.left, m.right))
        .map { case (k, ms) => k -> ms.sortBy(_.rank).toArray }

    /** Smallest-rank merge for (a,b) with rank > floor, if any. */
    private def lookup(a: String, b: String, floor: Int): Merge = {
      val arr = byPair.getOrElse((a, b), null)
      if (arr == null) return null
      var i = 0
      while (i < arr.length) {
        if (arr(i).rank > floor) return arr(i)
        i += 1
      }
      null
    }

    def segment(word: String): Seq[String] =
      apply((word.map(_.toString) :+ EndOfWord).toArray).toSeq

    def apply(sym0: Array[String]): Array[String] = {
      var sym = sym0
      var floor = 0
      var go = sym.length > 1
      while (go) {
        var best: Merge = null
        var i = 0
        while (i + 1 < sym.length) {
          val m = lookup(sym(i), sym(i + 1), floor)
          if (m != null && (best == null || m.rank < best.rank)) best = m
          i += 1
        }
        if (best == null) go = false
        else {
          // the same greedy left-to-right pass applyMergesArr runs
          val out =
            new scala.collection.mutable.ArrayBuffer[String](sym.length)
          var j = 0
          while (j < sym.length) {
            if (j + 1 < sym.length &&
                sym(j) == best.left && sym(j + 1) == best.right) {
              out += best.merged; j += 2
            } else { out += sym(j); j += 1 }
          }
          sym = out.toArray
          floor = best.rank
          go = sym.length > 1
        }
      }
      sym
    }
  }

  /** Apply a rank-ordered merge list across a segmentation array:
    * each merge is the same greedy left-to-right single pass
    * `mergeOnce` encodes (resume at i+2 after a merge), applied in
    * training order — so k merges cost ONE traversal each, never a
    * k-deep column expression stack. */
  private[operators] def applyMergesArr(sym0: Array[String],
                                        merges: Seq[Merge]): Array[String] = {
    var sym = sym0
    merges.foreach { m =>
      if (sym.length > 1) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == m.left && sym(i + 1) == m.right) {
            out += m.merged; i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.toArray
      }
    }
    sym
  }

  /** Decode one word's segmentation back to the word: concatenate the
    * subword symbols and drop the end-of-word sentinel (which a merge
    * may have fused into the last symbol). Exact inverse of
    * [[segmentWord]] / [[segmentCorpus]] for any word that does not
    * itself contain the sentinel string — the standard BPE assumption;
    * BpeSpec pins the round-trip law over fitted AND unseen words.
    * Pure column expression (one concat + one literal replace). */
  def decodeSym(sym: Column): Column =
    replace(array_join(sym, ""), lit(EndOfWord), lit(""))

  /** Decode a cross-word subword STREAM (the training-loader shape:
    * one flat array of subwords spanning many words): word boundaries
    * are exactly the sentinel occurrences, so sentinel → space +
    * whitespace trim reproduces the space-joined token text. */
  def decodeStream(syms: Column): Column =
    trim(replace(array_join(syms, ""), lit(EndOfWord), lit(" ")))

  /** (word, sym) segmentation of the DISTINCT words of a corpus under
    * stored merges — the open-vocabulary encode path for text the
    * trainer never saw. The rank-indexed [[MergeTable]] is built once
    * on the driver (nMerges rows) and ships in the closure; the UDF
    * runs once per distinct word (Heaps' law), never per occurrence,
    * and costs O(applied·len) per word regardless of vocab size. */
  def segmentCorpus(docs: DataFrame, textCol: String,
                    merges: Seq[Merge]): DataFrame = {
    require(merges.nonEmpty, "need a non-empty merge table")
    val table = new MergeTable(merges)
    val seg = udf((w: String) => table.segment(w))
    docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("sym", seg(col("word")))
  }

  /** Per-document subword token count under a fitted segmentation:
    * each document's words join the (broadcast-sized at sane vocab
    * budgets, else shuffled) word table; words unseen in training fall
    * back to character-level (chars + sentinel) — the standard
    * open-vocabulary guarantee. */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
                   words: DataFrame): DataFrame = {
    val seg = words.select(col("word"),
      size(col("sym")).cast("long").as("__len"))
    val per = docs
      .select(col(idCol).cast("long").as("id"),
        explode(tokens(col(textCol))).as("word"))
      .join(seg, Seq("word"), "left")
      .withColumn("__n",
        coalesce(col("__len"), (length(col("word")) + 1).cast("long")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_subwords"))
    // every input doc gets a row: zero-token docs fall out of the
    // explode, so join them back with zero counts (the gramNovelty
    // row-per-doc contract)
    docs.select(col(idCol).cast("long").as("id"))
      .join(per, Seq("id"), "left")
      .na.fill(0L, Seq("n_words", "n_subwords"))
  }

  /** Tokenizer-fertility report: subword tokens per word (in
    * centi-units — 125 = 1.25 subwords/word) for each corpus slice
    * under a fitted segmentation. Fertility is THE cross-lingual /
    * cross-domain tokenizer health metric: a slice far above the
    * corpus mean pays proportionally more sequence length for the same
    * text, so it flags where the merge budget under-serves a source
    * before a training run locks the tokenizer in. Integer arithmetic
    * on the summed counts (never a mean of per-doc floats). */
  def fertilityBySource(docs: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, words: DataFrame): DataFrame =
    encodeCounts(docs, idCol, textCol, words)
      .join(docs.select(col(idCol).cast("long").as("id"),
        col(sourceCol).as("source")), Seq("id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"))
      .withColumn("fertility_c",
        when(col("n_words") > 0,
          expr("n_subwords * 100 DIV n_words")))
}
