package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Per-document n-gram novelty against everything that came before it
  * in corpus order — "how much of this document's content has the
  * corpus already seen?". The per-doc complement of the substring-dedup
  * tier (Dedup.exactSubstrRemove cuts shared passages; this REPORTS
  * repeat pressure without mutating anything): a curation pipeline
  * ranks crawl batches by novelty to decide which are worth keeping,
  * and a memorization audit flags documents whose content is almost
  * entirely re-spun from earlier ones. Reference scope: extends the
  * corpus-analysis tier (SURVEY §2 text analysis) as the prompt
  * directs; no reference counterpart.
  *
  * Semantics: a document's gram TYPES are its distinct n-token
  * shingles (TextFunctions.shingles — documents shorter than n tokens
  * collapse to one whole-text shingle, so every document has >= 1 gram
  * and an exact re-crawl of a short doc still reads as fully seen).
  * A gram is "seen" for document d iff some document with a smaller id
  * carries it — first carrier = min(id) per gram, the same
  * keep-lowest-id convention as the exact-dedup tiers. novelty_bp =
  * floor((n_grams - n_seen) · 10000 / n_grams) integer basis points.
  *
  * Scale shape: one generator-in-scan explode + distinct gives the
  * (id, gram-key) type table; ONE gram-keyed aggregate finds first
  * carriers; the join back re-uses the same key partitioning, and the
  * final per-id aggregate is map-side combinable. With a hashed
  * `keyMode` the gram text never leaves the scan — all shuffled keys
  * are 8 bytes (the Overlap/substr-dedup trade). Nothing is quadratic:
  * a gram shared by k documents costs k join rows, not k².
  */
object Novelty {

  /** Gram key under a named mode — same contract as Overlap:
    *  - "xxhash64": 8-byte fingerprint, production default;
    *  - "md5": first 15 hex chars of md5 as a 60-bit long — the same
    *    8-byte shuffle shape, but bit-for-bit replayable by the DuckDB
    *    oracle (q95 certifies this tier directly);
    *  - "string": the raw gram text, the certification baseline. */
  private def gramKey(s: Column, keyMode: String): Column = keyMode match {
    case "xxhash64" => xxhash64(s)
    case "md5"      => conv(substring(md5(s), 1, 15), 16, 10).cast("long")
    case "string"   => s
    case other => throw new IllegalArgumentException(
      s"unknown keyMode '$other' (xxhash64 | md5 | string)")
  }

  /** Stored gram index for incremental novelty: the settled corpus's
    * distinct gram keys with their first carriers, build parameters
    * riding as field metadata (the minhashSignatures self-describing
    * contract — a mismatched index fails loudly, never silently). */
  def gramIndex(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 3, keyMode: String = "xxhash64"): DataFrame = {
    require(n > 0, s"shingle length n must be positive, got $n")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("shingle_n", n.toLong)
      .putString("key_mode", keyMode)
      .build()
    gramTypes(docs, idCol, textCol, n, keyMode)
      .groupBy(col("gk")).agg(min(col("id")).as("first_id"))
      .withColumn("gk", col("gk").as("gk", meta))
  }

  /** Batch novelty against a settled corpus's stored [[gramIndex]]:
    * same output contract as [[gramNovelty]], but "seen" means carried
    * by the CORPUS or by an earlier batch document — the per-crawl
    * report an ingest pipeline runs to decide whether a batch is worth
    * keeping, WITHOUT re-reading settled text (O(batch + probed index),
    * the q73/q74 ingest-family shape).
    *
    * Same join-free identity, shifted one level: a batch gram is novel
    * iff its first BATCH carrier is this doc AND the index does not
    * carry it — one gk aggregate over the batch, one anti-join of that
    * (batch-type-sized) frame against the index, then per-id
    * arithmetic. The index never joins the full batch type table. */
  def incrementalNovelty(batch: DataFrame, idCol: String, textCol: String,
                         index: DataFrame, n: Int = 3,
                         keyMode: String = "xxhash64"): DataFrame = {
    require(n > 0, s"shingle length n must be positive, got $n")
    require(index.schema.fieldNames.contains("gk"),
      "gram index has no 'gk' column; build it with Novelty.gramIndex")
    val md = index.schema("gk").metadata
    require(md.contains("shingle_n") && md.contains("key_mode"),
      "gram index carries no build metadata; rebuild with " +
        "Novelty.gramIndex (stored indexes predating the parameter " +
        "contract are not probeable)")
    require(md.getLong("shingle_n") == n.toLong &&
        md.getString("key_mode") == keyMode,
      s"gram index was built with n=${md.getLong("shingle_n")}/" +
        s"key_mode=${md.getString("key_mode")} but the probe asks " +
        s"n=$n/key_mode=$keyMode — candidates would silently miss; " +
        "rebuild or re-probe with matching parameters")
    // NOT cached despite two consumers: same row-per-gram trade as
    // gramNovelty below — the generator stays in the scan stage and
    // re-running it measured cheaper than materializing the exploded
    // frame (re-measured in the r19 optimization round: eager persist
    // here was 1.67 s vs 1.62 s reference at sf0.1 — no win).
    val g = gramTypes(batch, idCol, textCol, n, keyMode)
    val perDoc = g.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val novel = g.groupBy(col("gk")).agg(min(col("id")).as("id"))
      .join(index.select(col("gk")), Seq("gk"), "left_anti")
      .groupBy(col("id")).agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("id"), "left")
      .withColumn("__nn", coalesce(col("n_novel"), lit(0L)))
      .select(col("id"), col("n_grams"),
        (col("n_grams") - col("__nn")).as("n_seen"),
        floor(col("__nn") * 10000 / col("n_grams")).as("novelty_bp"))
  }

  /** The (id, gram-key) type table both tiers build on. */
  private def gramTypes(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, keyMode: String): DataFrame = docs
    .select(col(idCol).cast("long").as("id"),
      TextFunctions.tokens(col(textCol)).as("__tk"))
    .select(col("id"),
      explode(TextFunctions.shinglesTokens(col("__tk"), n)).as("__s"))
    .select(col("id"), gramKey(col("__s"), keyMode).as("gk"))
    .distinct()

  /** (id, n_grams, n_seen, novelty_bp) for every input document.
    * Deterministic pure function of the corpus — no seeds, no floats
    * beyond one IEEE division per row.
    *
    * Join-free identity: a gram is novel for document d iff d IS its
    * first carrier, so n_novel(d) = |{gk : min carrier(gk) = d}| —
    * countable straight off the first-carrier aggregate. The (gram →
    * every carrier) join back that a naive formulation pays — the
    * full type table rejoined on its high-cardinality key — never
    * happens; after the shared distinct, everything is per-id
    * aggregates of at most |docs| rows. */
  def gramNovelty(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, keyMode: String = "xxhash64"): DataFrame = {
    require(n > 0, s"shingle length n must be positive, got $n")
    // distinct gram types per document; every doc yields >= 1 row
    // (shingles() collapses under-n docs to one whole-text shingle).
    // Shape notes from benching at sf0.1: explode-then-key keeps the
    // md5 fingerprint inside whole-stage codegen (keying inside a
    // higher-order transform() lambda ran ~3× slower, interpreted per
    // element), and the frame is NOT cached despite two consumers —
    // the generator stays in the scan stage and re-running it is
    // cheaper than materializing a row-per-gram intermediate (the
    // substr-dedup trade).
    val g = gramTypes(docs, idCol, textCol, n, keyMode)
    val perDoc = g.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val novel = g.groupBy(col("gk")).agg(min(col("id")).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("id"), "left")
      .withColumn("__nn", coalesce(col("n_novel"), lit(0L)))
      .select(col("id"), col("n_grams"),
        (col("n_grams") - col("__nn")).as("n_seen"),
        floor(col("__nn") * 10000 / col("n_grams")).as("novelty_bp"))
  }
}
