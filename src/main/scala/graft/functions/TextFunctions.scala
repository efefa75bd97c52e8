package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a large-scale corpus pipeline: token
  * stats, quality scoring, language-ID heuristic, canonical document
  * fingerprinting, n-gram shingles. All pure Column expressions (ANSI
  * SQL-mirrorable, codegen-friendly, no UDFs) — at 100 TB these run
  * inside the scan projection with zero extra passes.
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text. Blank input yields an
    * EMPTY array (split alone would yield [""]), matching the JVM kernel
    * Hashing.tokens so the Column and mapPartitions dedup paths agree on
    * empty documents — and making the langId tokenCount==0 branch
    * reachable. */
  def tokens(c: Column): Column = {
    val t = trim(c)
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Token count via the native codegen'd expression (graft.sql
    * .TokenCount): one zero-copy byte scan, no regex, no token-array
    * allocation. Bit-equal to `size(tokens(c))` for every input —
    * including the leading-tab split quirk — pinned by TokenCountSpec's
    * equivalence sweep. */
  def tokenCount(c: Column): Column =
    // cast-to-string restores the split form's implicit input cast
    // (TokenCount itself declares no inputTypes); for string columns
    // the optimizer folds the cast away
    org.apache.spark.sql.GraftSqlBridge.toColumn(graft.sql.TokenCount(
      org.apache.spark.sql.GraftSqlBridge.toExpression(c.cast("string"))))

  def distinctTokenCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** Type-token ratio: distinct / total tokens. */
  def uniqRatio(c: Column): Column =
    distinctTokenCount(c).cast("double") / tokenCount(c)

  /** Mean token length = non-whitespace chars / token count. */
  def avgTokenLen(c: Column): Column =
    length(regexp_replace(trim(c), "\\s+", "")).cast("double") / tokenCount(c)

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "that", "it")

  def stopwordCount(c: Column, words: Seq[String] = EnglishStopwords): Column =
    size(filter(tokens(c), t => t.isin(words.map(x => x: Any): _*)))

  def stopwordRatio(c: Column, words: Seq[String] = EnglishStopwords): Column =
    stopwordCount(c, words).cast("double") / tokenCount(c)

  /** Composite quality score in [0,1]: length adequacy + lexical
    * diversity + stopword naturalness (the shape of the usual LLM-corpus
    * heuristics: length/punct/stopword ratios). Blank/empty documents
    * score 0.0 (the ratio terms would otherwise divide by zero). */
  def qualityScore(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0)).otherwise(
      round(
        least(tokenCount(c).cast("double") / 100.0, lit(1.0)) * 0.4 +
        uniqRatio(c) * 0.3 +
        least(stopwordRatio(c) * 5.0, lit(1.0)) * 0.3, 4))

  /** N-gram (word-shingle) heuristic language ID: stopword-profile
    * scoring. The fixture corpus is English-vocabulary synthetic text, so
    * the useful output split is en vs unknown. */
  def langId(c: Column): Column =
    when(tokenCount(c) === 0, lit("unknown"))
      .when(stopwordRatio(c) >= 0.05, lit("en"))
      .otherwise(lit("unknown"))

  /** BPE-ish subword token-count estimate: counts matches of a GPT-2
    * style pre-tokenizer pattern (contraction suffixes, space-prefixed
    * letter runs, digit runs, punctuation runs). Not a real merged-BPE
    * count — it is the regex PRE-tokenization that upper-bounds one and
    * tracks it closely on natural text, which is what corpus token
    * budgeting needs. Pure Column expression (regexp_count), no UDF. */
  val BpeishPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9']+"

  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpeishPattern))

  /** The EXACT-INTEGER form of qualityScore: quality × 10⁴ as integer
    * basis points with an integer numerator — the hash-stable form the
    * oracle-checked queries share (q27, q41, q60). Callers must guard
    * tokenCount > 0 (blank docs divide by zero). */
  def qualityBp(c: Column): Column = qualityBpTokens(tokens(c))

  /** qualityBp over a PRE-TOKENIZED array column — the tokenize-once
    * form for pipelines that already carry the token array (q60 computes
    * tokens a single time and derives every downstream stat from the
    * array instead of re-splitting the text per metric). */
  def qualityBpTokens(toks: Column): Column = {
    // Long arithmetic throughout: the int form overflows once a document
    // reaches ~214k tokens (100*nt*4*10 > Int.MaxValue), silently
    // wrapping negative under non-ANSI Spark while DuckDB promotes to
    // BIGINT — the engines would disagree exactly on the huge documents
    // a corpus quality gate exists to catch.
    val nt = size(toks).cast("long")
    val nu = size(array_distinct(toks)).cast("long")
    val ns = size(filter(toks,
      t => t.isin(EnglishStopwords.map(x => x: Any): _*))).cast("long")
    floor((least(nt, lit(100L)) * nt * 4 + nu * 300 +
      least(ns * 5, nt) * 300) * 10 / nt)
  }

  /** Most-repeated-token share in basis points (the q64 metric as one
    * per-row expression — no explode, no shuffle): max per-token count
    * over the distinct tokens, O(unique·n) per row. 0 for empty docs. */
  def repetitionBpTokens(toks: Column): Column = {
    val maxTok = aggregate(array_distinct(toks), lit(0L),
      (a, u) => greatest(a, size(filter(toks, x => x === u)).cast("long")))
    when(size(toks) === 0, lit(0L))
      .otherwise(floor(maxTok * 10000 / size(toks).cast("long")))
  }

  /** Canonical text normalization — the cleaning pass before dedup /
    * fingerprinting: lowercase, punctuation → space, whitespace
    * collapsed, trimmed. ASCII-safe by design (accent folding needs a
    * JVM Normalizer UDF; deliberately excluded to stay codegen + SQL-
    * mirrorable).
    *
    * Single regex pass: every maximal run of non-alphanumeric chars
    * (punctuation, whitespace, or both interleaved) becomes exactly one
    * space — provably the same output as the two-pass punct→space +
    * \s+-collapse chain the q57/q60 DuckDB oracles still spell out
    * (the hash compare certifies the equivalence), at half the regex
    * scan cost on the corpus hot path. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** PII-style scrubbing: replace email addresses, URLs, and long
    * digit runs with typed placeholder tokens — the redaction pass of
    * corpus prep. Pure regexp_replace chain (order matters: URLs
    * before bare digit runs, emails before URLs so user@host does not
    * half-match). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val LongDigitsRe = "[0-9]{6,}"

  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      LongDigitsRe, "<NUM>")

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set. Token-order-insensitive, so shuffled near-copies collapse to
    * one fingerprint — the cheap first tier of near-dedup. */
  def fingerprint(c: Column): Column = fingerprintTokens(tokens(c))

  /** fingerprint over a pre-tokenized array column (tokenize-once form). */
  def fingerprintTokens(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Word n-gram shingles (distinct). Documents shorter than n collapse
    * to a single whole-text shingle.
    *
    * PERF: this inline form embeds `tokens(c)` — a regex split — as a
    * subtree referenced from INSIDE the transform lambda, and
    * higher-order functions evaluate interpreted with no CSE, so the
    * split re-runs once per shingle: O(len) regex splits per row
    * (measured 3-4 s of pure shingle generation at sf0.1). Hot paths
    * must stage the token array in a projection first and call
    * [[shinglesTokens]] on the staged column — the lambda then reads a
    * materialized row field per element. Kept for call sites where the
    * input is cheap or tiny. */
  def shingles(c: Column, n: Int): Column =
    shinglesTokens(tokens(c), n)

  /** shingles over a pre-tokenized array column (tokenize-once form —
    * see the perf note on [[shingles]]). */
  def shinglesTokens(t: Column, n: Int): Column =
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", t)))

  /** Exact Jaccard similarity of two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  // ------------------------------------------------------------------
  // Gopher repetition family primitives (Rae et al. 2021, A1.1).
  //
  // STAGING CONTRACT: several of these run lambdas that capture their
  // argument columns. Higher-order functions evaluate interpreted with
  // no CSE (see the [[shingles]] perf note), so a captured COMPUTED
  // subtree re-runs once per element. Callers must pass STAGED columns
  // (materialized in a prior projection) for every argument documented
  // as "staged" — QualityRules.repetitionReport is the canonical
  // staged pipeline. Each function deliberately references its staged
  // lambda-captured inputs at least twice so CollapseProject keeps the
  // producing projection apart (the Ivf.quantizeCells rule: non-cheap
  // expression used more than once is never inlined).
  // ------------------------------------------------------------------

  /** Sum of token character lengths (whitespace excluded) — the shared
    * character denominator of the repetition fractions. 0 when empty.
    * Safe inline: the lambda only captures `toks` itself. */
  def tokenCharsTokens(toks: Column): Column =
    aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))

  /** Positional word n-grams (NON-distinct, order-preserving): entry i
    * covers tokens [i, i+n). Empty for docs shorter than n tokens.
    * Space-joined, so a gram's token chars = length(gram) - (n-1).
    * Safe inline: the lambda only captures `toks`. */
  def gramsTokensPos(toks: Column, n: Int): Column = {
    val m = size(toks)
    when(m < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), m - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Disjoint k-token chunks — the derived line/paragraph view of a
    * flat-token corpus (the q115 paragraph convention): chunk j covers
    * tokens [j·k+1, j·k+k], the last chunk possibly shorter.
    * Safe inline: the lambda only captures `toks`. */
  def chunksTokens(toks: Column, k: Int): Column = {
    val m = size(toks)
    when(m === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), floor((m - 1) / lit(k)).cast("int")),
        j => concat_ws(" ", slice(toks, j * k + 1, lit(k)))))
  }

  /** Distinct values occurring ≥ 2 times in `sorted` (a pre-sorted
    * array — STAGED), via one adjacent-equality scan: O(G) after the
    * sort instead of the O(G²) nested count. Equal strings group
    * adjacently under ANY total order, so the result is engine-
    * independent even where engine sort orders differ. */
  def dupValuesSorted(sorted: Column): Column = {
    val g = size(sorted)
    when(g < 2, array().cast("array<string>"))
      .otherwise(array_distinct(filter(
        transform(sequence(lit(1), g - 1),
          i => when(element_at(sorted, i) === element_at(sorted, i + 1),
            element_at(sorted, i))),
        x => x.isNotNull)))
  }

  /** 1-based run-start positions of `sorted` (STAGED): position i
    * starts a run iff i = 1 or sorted[i] ≠ sorted[i-1]. Run k spans
    * [starts[k], starts[k+1]) — the per-value count machinery without
    * a per-value rescan. */
  def runStartsSorted(sorted: Column): Column = {
    val g = size(sorted)
    when(g === 0, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(1), g),
        i => i === 1 || element_at(sorted, i) =!= element_at(sorted, i - 1)))
  }

  /** Max character coverage (count · token chars) over the runs of
    * `sorted` grams (both STAGED: `sorted` the sorted positional grams,
    * `starts` its run starts), as basis points of `totalChars`, capped
    * at 10000 (overlapping occurrences each count — the published
    * definition's artifact). `sepPerGram` = n-1 space separators to
    * subtract from each gram's string length. 0 for gram-less docs. */
  def topCoverageBp(sorted: Column, starts: Column, sepPerGram: Int,
                    totalChars: Column): Column = {
    val g = size(sorted)
    val s = size(starts)
    val best = array_max(transform(sequence(lit(1), s), k => {
      val st = element_at(starts, k)
      val en = when(k === s, g + 1).otherwise(element_at(starts, k + 1))
      (en - st).cast("long") *
        (length(element_at(sorted, st)).cast("long") - lit(sepPerGram.toLong))
    }))
    // cap BEFORE scaling: best can exceed totalChars (overlapping
    // occurrences each count), and best·10⁴ on a 10⁷-char document
    // would leave double-exact range — least() first keeps the
    // dividend ≤ totalChars·10⁴ (exact) and still yields exactly
    // 10000 for any capped value
    when(s === 0 || totalChars === 0, lit(0L))
      .otherwise(floor(least(best, totalChars) * 10000 / totalChars)
        .cast("long"))
  }

  /** Per-position duplicate flags: flags[i] = grams[i] occurs ≥ 2
    * times. `grams` and `dups` STAGED (dups from [[dupValuesSorted]]). */
  def dupFlagsGrams(grams: Column, dups: Column): Column =
    when(size(dups) === 0,
      transform(grams, _ => lit(false)))
      .otherwise(transform(grams, gr => array_contains(dups, gr)))

  /** Overlap-aware duplicated-n-gram character coverage in basis
    * points: a token position counts iff ANY n-gram covering it is a
    * duplicate (each character counted once — the Gopher "taking care
    * not to count characters more than once" rule). `toks` and `flags`
    * STAGED (flags from [[dupFlagsGrams]] over the positional grams). */
  def dupCoverageBp(toks: Column, flags: Column, n: Int,
                    totalChars: Column): Column = {
    val m = size(toks)
    val g = size(flags)
    val covered = aggregate(sequence(lit(1), m), lit(0L), (acc, j) => {
      val lo = greatest(lit(1), j - (n - 1))
      val len = least(j, g) - lo + 1
      acc + when(exists(slice(flags, lo, len), b => b),
        length(element_at(toks, j)).cast("long")).otherwise(0L)
    })
    when(size(flags) === 0 || totalChars === 0, lit(0L))
      .otherwise(floor(covered * 10000 / totalChars).cast("long"))
  }

  /** Fraction (bp) of chunks that are occurrences of a duplicated
    * chunk value. `chunks` and `dups` STAGED. */
  def dupChunkBp(chunks: Column, dups: Column): Column = {
    val nc = size(chunks)
    val nDup = when(size(dups) === 0, lit(0L))
      .otherwise(size(filter(chunks, c => array_contains(dups, c)))
        .cast("long"))
    when(nc === 0, lit(0L))
      .otherwise(floor(nDup * 10000 / nc).cast("long"))
  }

  /** Character-weighted duplicated-chunk fraction in bp: token chars
    * inside duplicated chunks over `totalChars`. The final chunk may be
    * short, so its token count derives from position (k tokens per
    * chunk except least(k, m - j·k) for the last). `toks`, `chunks`,
    * `dups` STAGED. */
  def dupChunkCharBp(toks: Column, chunks: Column, dups: Column, k: Int,
                     totalChars: Column): Column = {
    val m = size(toks)
    val nc = size(chunks)
    val dupChars = when(size(dups) === 0, lit(0L))
      .otherwise(aggregate(sequence(lit(0), nc - 1), lit(0L), (acc, j) => {
        val c = element_at(chunks, j + 1)
        val tokInChunk = least(lit(k), m - j * k).cast("long")
        acc + when(array_contains(dups, c),
          length(c).cast("long") - (tokInChunk - 1L)).otherwise(0L)
      }))
    when(nc === 0 || totalChars === 0, lit(0L))
      .otherwise(floor(dupChars * 10000 / totalChars).cast("long"))
  }
}
