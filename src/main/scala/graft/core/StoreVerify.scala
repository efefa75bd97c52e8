package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-level cross-leg invariant audit for the graft stores —
  * `store --verify <dir>`.
  *
  * [[StoreFsck]] proves a store is STRUCTURALLY sound (no half-finished
  * promote/swap, no stale lease); nothing there proves the store's legs
  * are mutually CONSISTENT — a BM25 index whose stats drifted from its
  * doclen truth, postings rows orphaned by a removal that was re-run
  * against drifted text, an IVF sidecar that lost a cells row. Those
  * are exactly the states fsck's own `bm25_stats_inconsistent` verdict
  * ends at ("re-run the original removal") without telling the operator
  * WHAT is inconsistent. This audit names each violated invariant, so
  * the recovery recipe (README "Store verify") is per-finding instead
  * of per-guess. It is the reference's registry/MLflow health poll
  * (manage_model_registry.py:58-90 polls READY) generalized to every
  * store family.
  *
  * Read-only by construction: every check is a Spark read + aggregate;
  * nothing is written, renamed, or deleted. Run it after fsck (a
  * half-promoted store reads wrong), any time, while serving.
  *
  * Scale shape: each invariant is one distributed aggregate over the
  * slim legs (ids, tf, dl — never text or vectors except the th
  * recompute, which reads postings terms once); verdict rows collected
  * are O(1) counts. The th recompute is the one term-volume pass —
  * it IS the audit's purpose (recomputing the per-doc term multiset
  * from the postings leg and matching it against the doclen leg's
  * stored hash is the only check that catches orphan/forged postings
  * content, not just counts).
  */
object StoreVerify {

  /** One invariant verdict. `ok = true` means the invariant HELD.
    * Details routinely embed exception messages (multi-line on Spark
    * errors), so quoting goes through [[Jsons.str]] — control chars
    * included — or the audit JSON would be malformed exactly when a
    * store is damaged. */
  final case class Check(invariant: String, ok: Boolean, detail: String) {
    def json: String =
      s"""{"invariant":${Jsons.str(invariant)},"ok":$ok,""" +
        s""""detail":${Jsons.str(detail)}}"""
  }

  /** Detect the store family under `dir` by its layout and run that
    * family's invariants. `sigPath` (optional) enables the kept-store ↔
    * signature-store agreement checks; `idCol` names the kept store's
    * id column. Returns (family, checks).
    *
    * `sample = Some((mod, rem))` audits only the id slice
    * `pmod(id, mod) == rem` of the id-keyed families (bm25 / ivf /
    * sig / kept) — the 100 TB posture: a full audit reads O(postings),
    * so a fleet runs slice `rem` of `mod` per night and covers the
    * store in `mod` nights, every check still EXACT over its slice
    * (both legs of every cross-leg check are cut by the same id rule,
    * so agreement within the slice is agreement, not an estimate).
    * Whole-store invariants that cannot be sliced (the BM25 stats
    * totals) are SKIPPED under sampling rather than reported as a
    * weaker pass. Non-id-keyed families (lm / longmatch / evalgram /
    * model / registry — all metadata-sized) ignore the sample. */
  def verify(spark: SparkSession, dir: String,
             sigPath: Option[String] = None,
             idCol: String = "doc_id",
             sample: Option[(Long, Long)] = None): (String, Seq[Check]) = {
    sample.foreach { case (m, r) =>
      require(m > 0 && r >= 0 && r < m,
        s"verify: sample slice must satisfy 0 <= rem < mod, got " +
          s"(mod=$m, rem=$r)")
    }
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"verify: $dir does not exist")
    detect(spark, dir, idCol) match {
      case Some("bm25") => ("bm25", verifyBm25(spark, dir, sample))
      case Some("ivf") => ("ivf", verifyIvf(spark, dir, sample))
      case Some("evalgram") => ("evalgram", verifyEvalGrams(spark, dir))
      case Some("longmatch") => ("longmatch", verifyLongMatch(spark, dir))
      case Some("sig") => ("sig", verifySig(spark, dir, sample))
      case Some("vocab") => ("vocab", verifyVocab(spark, dir))
      case Some("lm") => ("lm", verifyLm(spark, dir))
      case Some("dsir") => ("dsir", verifyDsir(spark, dir))
      case Some("stats") => ("stats", verifyStats(spark, dir))
      case Some("funnel") => ("funnel", verifyFunnel(spark, dir))
      case Some("model") => ("model", verifyModel(spark, dir))
      case Some("registry") => ("registry", verifyRegistry(spark, dir))
      case Some("kept") =>
        ("kept", verifyKept(spark, dir, sigPath, idCol, sample))
      case _ =>
        // detect() swallows read errors — re-read here so a genuinely
        // corrupt dir surfaces ITS error, not the family menu
        Stores.readOrEmpty(spark, dir)
        throw new IllegalArgumentException(
          s"verify: $dir matches no known store family (bm25 needs " +
            "postings/doclen/stats, ivf needs cells/, eval-gram needs " +
            "gk+suite columns, long-match gk+df, signature sh+bh, " +
            "vocab/LM token+cnt, DSIR bucket+ct+cr+w_bits, corpus " +
            "stats n_docs+…+fp_sketch, funnel n_in+n_kept+batch_id, " +
            "model weights layer+row_idx+w+bias, registry " +
            s"model+version+stage, kept batch_id+$idCol " +
            "— pass --id if the kept id column differs)")
    }
  }

  private def check(invariant: String, ok: Boolean,
                    detail: String): Check = Check(invariant, ok, detail)

  /** The SINGLE shared definition of the BM25 audit's per-doc
    * reconstruction — used by both [[verifyBm25]] and the
    * cross-engine certificate query (q133_store_audit), so the
    * certified expressions ARE the audit expressions and cannot
    * drift apart: per id, the postings tf sum, the sorted term
    * MULTISET rebuilt from postings rows hashed exactly as the build
    * hashed raw text (xxhash64 ∘ array_sort), and the count of rows
    * outside their term's derived bucket. One postings scan. */
  private[graft] def bm25PerDocRebuild(postings: DataFrame,
                                       nBuckets: Long): DataFrame =
    postings.groupBy("id").agg(
      sum(col("tf")).as("tf_sum"),
      xxhash64(array_sort(flatten(collect_list(
        array_repeat(col("term"), col("tf").cast("int"))))))
        .as("th_rec"),
      sum(when(col("tb").cast("long") =!=
        pmod(xxhash64(col("term")), lit(nBuckets)), 1L).otherwise(0L))
        .as("n_misrouted"))

  /** The th of a ZERO-token doc (dl = 0 → no postings rows): the hash
    * of the empty token array, the build's own value for it. */
  private[graft] def emptyThHash(spark: SparkSession): Long =
    spark.range(1)
      .select(xxhash64(array_sort(array().cast("array<string>"))))
      .head().getLong(0)

  /** The id slice an audit pass owns: `pmod(id, mod) == rem`, or the
    * whole frame when no sample is set. */
  private def slice(df: DataFrame, idCol: String,
                    sample: Option[(Long, Long)]): DataFrame =
    sample.fold(df) { case (m, r) =>
      df.filter(pmod(col(idCol).cast("long"), lit(m)) === r)
    }

  /** Non-throwing family probe — the tree sweep's filter. Layout
    * families (bm25/ivf) by child dirs; single-dir families by schema;
    * anything unreadable or unrecognized is None (not a store). */
  def detect(spark: SparkSession, dir: String,
             idCol: String = "doc_id"): Option[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def has(child: String) = fs.exists(new Path(dir, child))
    if (has("postings") && has("doclen") && has("stats")) Some("bm25")
    else if (has("cells")) Some("ivf")
    else try {
      val df = Stores.readOrEmpty(spark, dir)
      val cols = df.columns.toSet
      if (cols.contains("gk") && cols.contains("suite")) Some("evalgram")
      else if (cols.contains("gk") && cols.contains("df"))
        Some("longmatch")
      else if (cols.contains("sh") && cols.contains("bh")) Some("sig")
      else if (cols.contains("token") && cols.contains("cnt"))
        // vocab and LM stores share the (token, cnt) schema — the
        // build-params metadata is the discriminator (writeVocab stamps
        // top_k; writeLm stamps total_tokens). A metadata-stripped
        // store of either kind reports as lm with a failing lm_params,
        // which is the right verdict: rebuild it
        Some(if (df.schema("token").metadata.contains("top_k")) "vocab"
             else "lm")
      else if (cols.contains("bucket") && cols.contains("ct") &&
          cols.contains("cr") && cols.contains("w_bits")) Some("dsir")
      else if (cols.contains("n_docs") && cols.contains("sum_tokens") &&
          cols.contains("sum_tokens_sq") && cols.contains("tok_hist") &&
          cols.contains("fp_sketch")) Some("stats")
      else if (cols.contains("n_in") && cols.contains("n_kept") &&
          cols.contains("batch_id")) Some("funnel")
      else if (cols.contains("layer") && cols.contains("row_idx") &&
          cols.contains("w") && cols.contains("bias")) Some("model")
      else if (cols.contains("model") && cols.contains("version") &&
          cols.contains("stage")) Some("registry")
      else if (cols.contains("batch_id") && cols.contains(idCol))
        Some("kept")
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Sweep a TREE for stores and audit each — the whole-lake health
    * check (`store --verify-tree`): every dir where [[detect]] names a
    * family is verified and not descended into (its legs/partitions are
    * that family's internals); unrecognized dirs are walked further.
    * Store-lifecycle artifacts (`_next`/`_old`/`_rm_next` siblings,
    * hidden names) are fsck's domain and skipped here. Kept stores run
    * WITHOUT the signature pairing in tree mode (pairing is per-store
    * knowledge — run the targeted `--verify <kept> --sig <sig>` for
    * the agreement checks). Returns (path, family, checks) per store
    * in path order. */
  def verifyTree(spark: SparkSession, root: String,
                 idCol: String = "doc_id",
                 sample: Option[(Long, Long)] = None)
      : Seq[(String, String, Seq[Check])] = {
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(rp), s"verify-tree: $root does not exist")
    val out = Seq.newBuilder[(String, String, Seq[Check])]
    def walk(p: Path, isRoot: Boolean): Unit = {
      val name = p.getName
      // lifecycle artifacts are fsck's domain — but only among
      // CHILDREN: the user-supplied root must never be silently
      // skipped by its own name (a lake legitimately called `…_old`
      // would otherwise "verify" zero stores)
      if (!isRoot && (name.startsWith("_") || name.startsWith(".") ||
          name.endsWith("_next") || name.endsWith("_old") ||
          name.endsWith("_rm_next") || name.endsWith("_lease"))) ()
      else detect(spark, p.toString, idCol) match {
        case Some(family) =>
          // per-store isolation: one damaged store must not abort the
          // lake sweep — its audit error IS its verdict
          val checks =
            try verify(spark, p.toString, sigPath = None,
              idCol = idCol, sample = sample)._2
            catch {
              case scala.util.control.NonFatal(e) =>
                Seq(Check("audit_completed", ok = false,
                  s"audit itself failed — a leg is missing or " +
                    s"unreadable: ${e.getMessage}".take(300)))
            }
          out += ((p.toString, family, checks))
        case None =>
          // unreadable PARQUET data is a finding, not a silent skip: a
          // dir of .parquet files that cannot be read is the worst
          // corruption state — exactly what a health sweep must
          // surface. Non-parquet assets (CSVs, logs) pass through
          // silently; dirs of only subdirs are layout levels — descend
          val children = fs.listStatus(p)
          val parquetFiles = children.exists(st => !st.isDirectory &&
            st.getPath.getName.endsWith(".parquet"))
          if (parquetFiles && !readable(spark, p.toString))
            out += ((p.toString, "unreadable",
              Seq(Check("store_readable", ok = false,
                "directory holds .parquet files that cannot be read — " +
                  "corrupt store/table; inspect before trusting any " +
                  "store beneath it"))))
          else
            children.filter(_.isDirectory)
              .sortBy(_.getPath.getName)
              .foreach(st => walk(st.getPath, isRoot = false))
      }
    }
    walk(rp, isRoot = true)
    out.result()
  }

  /** Can this dir be read as parquet at all? (schema-only probe) */
  private def readable(spark: SparkSession, dir: String): Boolean =
    try { Stores.readOrEmpty(spark, dir).schema; true }
    catch { case scala.util.control.NonFatal(_) => false }

  // ----- BM25 ------------------------------------------------------

  /** The BM25 store's cross-leg truths. Legs: `postings/` (term, id,
    * tf; partitioned by term-hash bucket tb), `doclen/` (id, dl [, th]),
    * `stats/` (1 row: n_docs, total, n_buckets).
    *
    *  - `bm25_stats_doclen`: stats (n_docs, total) == (count, Σ dl) of
    *    doclen — the mergeable-sums contract every append/removal keeps.
    *  - `bm25_postings_doclen_ids`: postings carry EXACTLY the ids
    *    doclen says have tokens (dl > 0) — an orphan postings id
    *    corrupts df for every term it shares; a missing one serves
    *    zero hits for a doc the stats still count.
    *  - `bm25_tf_sum_dl`: per id, Σ tf over postings == dl — the two
    *    legs count the same tokens.
    *  - `bm25_bucket_routing`: every postings row lives in the bucket
    *    pmod(xxhash64(term), n_buckets) — a misrouted row is invisible
    *    to every probe (probes prune to the derived bucket).
    *  - `bm25_th_multiset`: on th-carrying stores, the per-doc term
    *    MULTISET rebuilt from postings hashes to doclen.th — content
    *    agreement, not just counts (catches equal-count term swaps).
    */
  def verifyBm25(spark: SparkSession, dir: String,
                 sample: Option[(Long, Long)] = None): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val stats = spark.read.parquet(s"$dir/stats").head()
    val doclen = slice(spark.read.parquet(s"$dir/doclen"), "id", sample)
    val postings = slice(spark.read.parquet(s"$dir/postings"), "id",
      sample)
    val nBuckets = stats.getAs[Long]("n_buckets")

    if (sample.isEmpty) {
      // whole-store totals cannot be checked against a slice — skipped
      // (not weakened) under sampling
      val truth = doclen.agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("t")).head()
      val statsOk = stats.getAs[Long]("n_docs") == truth.getAs[Long]("n") &&
        stats.getAs[Long]("total") == truth.getAs[Long]("t")
      out += check("bm25_stats_doclen", statsOk,
        s"stats (n_docs=${stats.getAs[Long]("n_docs")}, " +
          s"total=${stats.getAs[Long]("total")}) vs doclen truth " +
          s"(${truth.getAs[Long]("n")}, ${truth.getAs[Long]("t")})")
    }

    // ONE postings pass feeds the id-set, tf-sum, routing, AND th
    // checks: tf sums, the rebuilt multiset hash, and the per-row
    // misrouted flag all fold into the same groupBy (at 100 TB the
    // postings leg is the audit's dominant cost — scan it once)
    val perDoc = bm25PerDocRebuild(postings, nBuckets)
    val joined = doclen.select(col("id"), col("dl"),
        (if (doclen.columns.contains("th")) col("th")
         else lit(null).cast("long")).as("th"))
      .join(perDoc, Seq("id"), "full_outer")
    val emptyTh = emptyThHash(spark)
    val verdict = joined.agg(
      sum(when(col("dl").isNull, 1L).otherwise(0L)).as("orphan_postings"),
      sum(when(col("tf_sum").isNull && col("dl") > 0L, 1L).otherwise(0L))
        .as("missing_postings"),
      sum(when(col("tf_sum").isNotNull && col("dl").isNotNull &&
        col("tf_sum") =!= col("dl"), 1L).otherwise(0L)).as("tf_mismatch"),
      coalesce(sum(col("n_misrouted")), lit(0L)).as("misrouted"),
      sum(when(col("th").isNotNull &&
        coalesce(col("th_rec"), lit(emptyTh)) =!= col("th"), 1L)
        .otherwise(0L)).as("th_mismatch"),
      sum(when(col("th").isNotNull, 1L).otherwise(0L)).as("th_covered")
    ).head()
    val orphans = verdict.getAs[Long]("orphan_postings")
    val missing = verdict.getAs[Long]("missing_postings")
    val tfBad = verdict.getAs[Long]("tf_mismatch")
    out += check("bm25_postings_doclen_ids", orphans == 0L && missing == 0L,
      s"$orphans postings ids unknown to doclen (orphaned by a bad " +
        s"removal), $missing doclen ids with dl>0 but no postings")
    out += check("bm25_tf_sum_dl", tfBad == 0L,
      s"$tfBad ids whose postings tf sum differs from doclen dl")

    val misrouted = verdict.getAs[Long]("misrouted")
    out += check("bm25_bucket_routing", misrouted == 0L,
      s"$misrouted postings rows outside their term's derived bucket " +
        s"(n_buckets=$nBuckets)")

    if (doclen.columns.contains("th")) {
      val thBad = verdict.getAs[Long]("th_mismatch")
      val thCovered = verdict.getAs[Long]("th_covered")
      out += check("bm25_th_multiset", thBad == 0L,
        s"$thBad of $thCovered th-carrying docs whose postings term " +
          "multiset no longer hashes to the stored th")
    } else
      out += check("bm25_th_multiset", ok = true,
        "store predates the th contract (doclen has no th column) — " +
          "content-level agreement not checkable; counts verified above")
    out.result()
  }

  // ----- IVF / PQ vector stores ------------------------------------

  /** The vector store's cross-leg truths. Legs: `cells/` (id, vec|codes,
    * cell|cluster), optional `by_id/` sidecar (id, vec, idb) with its
    * `_id_buckets` meta, two-level adds `centroids/` + `router/`.
    *
    *  - `ivf_id_unique`: no id indexed twice in cells (a double append
    *    serves duplicate hits and breaks removal's exactly-once check).
    *  - `ivf_cells_by_id`: cells and by_id carry the SAME id set, each
    *    id once — a divergent sidecar serves vectors for erased docs
    *    (the right-to-erase window) or misses lookups.
    *  - `ivf_idb_routing`: by_id rows sit in pmod(id, _id_buckets) — a
    *    misrouted row is invisible to the partition-pruned lookup.
    *  - `ivf_cells_centroids` (two-level): every populated cluster has
    *    its centroid row — a probe routed to a centroid-less cluster
    *    reads nothing.
    */
  def verifyIvf(spark: SparkSession, dir: String,
                sample: Option[(Long, Long)] = None): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cells = slice(spark.read.parquet(s"$dir/cells"), "id", sample)
    val dupCells = cells.groupBy("id").count()
      .filter(col("count") > 1L).count()
    out += check("ivf_id_unique", dupCells == 0L,
      s"$dupCells ids indexed more than once in cells/")

    if (fs.exists(new Path(s"$dir/by_id"))) {
      val byId = slice(spark.read.parquet(s"$dir/by_id"), "id", sample)
      val dupSide = byId.groupBy("id").count()
        .filter(col("count") > 1L).count()
      val cellsOnly = cells.select("id")
        .join(byId.select("id"), Seq("id"), "left_anti").count()
      val sideOnly = byId.select("id")
        .join(cells.select("id"), Seq("id"), "left_anti").count()
      out += check("ivf_cells_by_id",
        dupSide == 0L && cellsOnly == 0L && sideOnly == 0L,
        s"$cellsOnly ids only in cells/, $sideOnly only in by_id/ " +
          s"(erased-but-still-lookupable), $dupSide duplicated in by_id/")
      val buckets = graft.operators.Ivf
        .idLookupBuckets(spark, s"$dir/by_id").toLong
      val misrouted = byId
        .filter(col("idb").cast("long") =!= pmod(col("id"), lit(buckets)))
        .count()
      out += check("ivf_idb_routing", misrouted == 0L,
        s"$misrouted by_id rows outside pmod(id, $buckets)")
    } else
      out += check("ivf_cells_by_id", ok = true,
        "no by_id/ sidecar — cells-only store, nothing to cross-check")

    if (fs.exists(new Path(s"$dir/centroids"))) {
      val pcol = if (cells.columns.contains("cluster")) "cluster" else "cell"
      val orphanClusters = cells.select(col(pcol).cast("long").as("c"))
        .distinct()
        .join(spark.read.parquet(s"$dir/centroids")
          .select(col("cluster").cast("long").as("c")).distinct(),
          Seq("c"), "left_anti")
        .count()
      out += check("ivf_cells_centroids", orphanClusters == 0L,
        s"$orphanClusters populated clusters without a centroid row " +
          "(unreachable by any probe)")
    }

    // PQ stores: code integrity against the codebooks leg — a code
    // row of the wrong byte width or a code pointing past its
    // subspace's book decodes GARBAGE in the ADC probe without erroring
    if (fs.exists(new Path(s"$dir/codebooks")) &&
        cells.columns.contains("codes")) {
      val books = spark.read.parquet(s"$dir/codebooks")
      // per-subspace book shape (m is small — this is driver-sized)
      val bookStats = books.groupBy("subspace").agg(
          count(lit(1)).as("rows"),
          countDistinct(col("code")).as("k"),
          min(col("code").cast("long")).as("cmin"),
          max(col("code").cast("long")).as("cmax"))
        .collect()
        .map(r => r.getAs[Number]("subspace").longValue ->
          (r.getAs[Long]("rows"), r.getAs[Long]("k"),
            r.getAs[Long]("cmin"), r.getAs[Long]("cmax"))).toMap
      val m = bookStats.size
      require(m > 0, s"$dir/codebooks is empty — not a PQ store")
      // LAYOUT first: the bounds arithmetic below keys book sizes by
      // subspace POSITION and derives k from distinct codes, which is
      // only sound when subspace ids are dense 0..m-1 and each book's
      // codes are dense 0..k-1 (the writeIndexQuantized contract). An
      // offset/sparse layout must surface as ITS OWN finding — mapping
      // a missing subspace id to book size 0 would turn a layout
      // mismatch into false out-of-bounds verdicts
      val subspacesDense =
        bookStats.keySet == (0L until m.toLong).toSet
      val codesDense = bookStats.values.forall { case (rows, k, lo, hi) =>
        rows == k && lo == 0L && hi == k - 1L
      }
      out += check("pq_codebook_layout", subspacesDense && codesDense,
        if (subspacesDense && codesDense)
          s"$m subspaces 0..${m - 1}, each book's codes dense 0..k-1"
        else s"codebook layout violates the PQ contract (subspace ids " +
          s"${bookStats.keySet.toSeq.sorted.mkString(",")} must be " +
          s"0..${m - 1}; per-book codes must be duplicate-free and " +
          "dense 0..k-1) — not a writeIndexQuantized store; code-vs-" +
          "book checks skipped as undecidable against this layout")
      if (subspacesDense && codesDense) {
        val ks = bookStats.map { case (s, (_, k, _, _)) => s -> k }
        val badShape = cells
          .filter(length(col("codes")) =!= lit(m)).count()
        out += check("pq_codes_shape", badShape == 0L,
          s"$badShape code rows whose byte width differs from the $m " +
            "codebook subspaces")
        // codes are an m-byte BINARY: read byte j as its unsigned value
        // via hex (codes are unsigned 0..ksub-1; toByte storage makes
        // ≥128 read negative anywhere signed — hex sidesteps that)
        val perPos = (0 until m).map(j =>
          max(conv(hex(substring(col("codes"), j + 1, 1)), 16, 10)
            .cast("long")).as(s"p$j"))
        val maxRow =
          cells.filter(length(col("codes")) === lit(m))
            .agg(perPos.head, perPos.tail: _*).head()
        val outOfBounds = (0 until m).count { j =>
          !maxRow.isNullAt(j) && maxRow.getLong(j) >= ks(j.toLong)
        }
        out += check("pq_codes_bounds", outOfBounds == 0L,
          s"$outOfBounds of $m subspaces whose used codes point past " +
            "their codebook (ADC would decode garbage)")
      }
    }
    out.result()
  }

  // ----- signature store (minhash base [+ settled sidecar]) --------

  /** Signature-store truths: ids unique; the settled sidecar (if any)
    * was signed with the SAME parameters as the base (the compactSettled
    * precondition, checked here read-only before it bites a fold). */
  def verifySig(spark: SparkSession, dir: String,
                sample: Option[(Long, Long)] = None): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val base = Stores.readOrEmpty(spark, dir)
    val dup = slice(base, "id", sample).groupBy("id").count()
      .filter(col("count") > 1L).count()
    out += check("sig_id_unique", dup == 0L,
      s"$dup ids signed more than once in the base store")
    val sigKeys = Seq("shingle_n", "minhash_k", "bands")
    val baseMd = base.schema("bh").metadata
    val baseParams = sigKeys.map(k =>
      if (baseMd.contains(k)) Some(baseMd.getLong(k)) else None)
    out += check("sig_params", baseParams.forall(_.isDefined),
      s"base signature params ${sigKeys.zip(baseParams)}")
    val settledP = dir.stripSuffix("/") + "_settled"
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(settledP))) {
      val settled = spark.read.parquet(settledP)
      val sMd = settled.schema("bh").metadata
      val sParams = sigKeys.map(k =>
        if (sMd.contains(k)) Some(sMd.getLong(k)) else None)
      out += check("sig_settled_params", sParams == baseParams,
        s"settled sidecar params ${sigKeys.zip(sParams)} vs base " +
          s"${sigKeys.zip(baseParams)}")
    }
    out.result()
  }

  // ----- kept corpus store ------------------------------------------

  /** Kept-store truths, with the signature store when `sigPath` is
    * given:
    *  - `kept_id_unique`: a doc kept twice means an exactly-once sink
    *    violation.
    *  - `kept_settled_batches`: for every batch the settled sidecar
    *    carries, the kept partition holds EXACTLY the settled ids —
    *    fullIngest settles precisely what it keeps, per batch.
    *  - `kept_sig_coverage`: every kept id is signed (base ∪ settled) —
    *    an unsigned kept doc escapes all future dedup screens.
    */
  def verifyKept(spark: SparkSession, keptPath: String,
                 sigPath: Option[String],
                 idCol: String,
                 sample: Option[(Long, Long)] = None): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val kept = slice(Stores.readOrEmpty(spark, keptPath)
      .select(col(idCol).cast("long").as("id"),
        col("batch_id").cast("long").as("batch_id")), "id", sample)
    val dup = kept.groupBy("id").count().filter(col("count") > 1L).count()
    out += check("kept_id_unique", dup == 0L,
      s"$dup ids kept more than once (exactly-once sink violation)")
    sigPath.foreach { sp =>
      val fs = new Path(sp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val settledP = sp.stripSuffix("/") + "_settled"
      if (fs.exists(new Path(settledP))) {
        // both sides of the per-batch agreement cut by the SAME id
        // rule, so slice agreement is exact agreement
        val settled = slice(spark.read.parquet(settledP)
          .select(col("id"), col("batch_id").cast("long").as("batch_id")),
          "id", sample)
        // per settled batch: kept ids == settled ids exactly
        val settledBatches = settled.select("batch_id").distinct()
        val keptInBatches = kept.join(settledBatches, Seq("batch_id"),
          "leftsemi")
        val onlySettled = settled.join(keptInBatches, Seq("id", "batch_id"),
          "left_anti").count()
        val onlyKept = keptInBatches.join(settled, Seq("id", "batch_id"),
          "left_anti").count()
        out += check("kept_settled_batches",
          onlySettled == 0L && onlyKept == 0L,
          s"$onlySettled settled ids missing from kept, $onlyKept kept " +
            "ids unsettled, across the settled batches")
      }
      // signature ids outside the slice cannot match sliced kept ids —
      // cutting them is free IO off the audit, not an approximation
      val baseIds = slice(Stores.readOrEmpty(spark, sp).select("id"),
        "id", sample)
      val settledIds =
        if (fs.exists(new Path(settledP)))
          slice(spark.read.parquet(settledP).select("id"), "id", sample)
        else baseIds.limit(0)
      val unsigned = kept.select("id")
        .join(baseIds.union(settledIds).distinct(), Seq("id"), "left_anti")
        .count()
      out += check("kept_sig_coverage", unsigned == 0L,
        s"$unsigned kept ids carry no signature in base ∪ settled — " +
          "they would escape every future dedup screen")
    }
    out.result()
  }

  // ----- stored LM (token, cnt) -------------------------------------

  /** LM-store truths: the metadata `total_tokens` every surprisal probe
    * divides by must equal Σ cnt of the rows (append/removal both
    * maintain it — drift means every stored-LM law serves wrong
    * centibits); tokens unique (appends FOLD counts, never append
    * rows); counts positive (a removal that drove one ≤ 0 should have
    * deleted the row). */
  def verifyLm(spark: SparkSession, dir: String): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val df = Stores.readOrEmpty(spark, dir)
    val md = df.schema("token").metadata
    val hasParams = md.contains("total_tokens") && md.contains("smoothing")
    out += check("lm_params", hasParams,
      if (hasParams) "build metadata present"
      else "token column carries no total_tokens/smoothing metadata — " +
        "not a writeLm store (or a schema-split append)")
    if (hasParams) {
      val truth = df.agg(coalesce(sum(col("cnt")), lit(0L))).head()
        .getLong(0)
      out += check("lm_total_tokens",
        md.getLong("total_tokens") == truth,
        s"metadata total_tokens=${md.getLong("total_tokens")} vs " +
          s"Σ cnt=$truth")
    }
    val dup = df.groupBy("token").count().filter(col("count") > 1L)
      .count()
    out += check("lm_token_unique", dup == 0L,
      s"$dup tokens with more than one row (appends must FOLD)")
    val nonPos = df.filter(col("cnt") <= 0L).count()
    out += check("lm_counts_positive", nonPos == 0L,
      s"$nonPos rows with cnt ≤ 0 (removals must delete emptied rows)")
    out.result()
  }

  // ----- stored vocabulary (token, cnt + top_k metadata) -------------

  /** Vocab-store truths (Vocab.writeVocab): the build-params metadata
    * every drift probe reads (top_k, the build corpus's own
    * baseline_oov_bp); at most top_k rows (a store that outgrew its
    * declared k was appended to by hand — vocabDrift would then
    * under-report OOV against a vocabulary wider than its baseline
    * measured); tokens unique; counts positive; baseline a legal
    * basis-point value. */
  def verifyVocab(spark: SparkSession, dir: String): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val df = Stores.readOrEmpty(spark, dir)
    val md = df.schema("token").metadata
    val hasParams = md.contains("top_k") && md.contains("baseline_oov_bp")
    out += check("vocab_params", hasParams,
      if (hasParams) s"top_k=${md.getLong("top_k")} " +
        s"baseline_oov_bp=${md.getLong("baseline_oov_bp")}"
      else "token column carries no top_k/baseline_oov_bp metadata — " +
        "not a writeVocab store; rebuild it")
    val agg = df.agg(count(lit(1)).as("n"),
      countDistinct(col("token")).as("d"),
      sum(when(col("cnt") <= 0L || col("cnt").isNull, 1L).otherwise(0L))
        .as("bad")).head()
    val n = agg.getAs[Long]("n")
    if (hasParams) {
      val k = md.getLong("top_k")
      out += check("vocab_topk_size", n <= k,
        s"$n rows vs declared top_k=$k (more rows than the declared k " +
          "means a by-hand append widened the vocabulary past its " +
          "measured baseline)")
      val bp = md.getLong("baseline_oov_bp")
      out += check("vocab_baseline_range", bp >= 0L && bp <= 10000L,
        s"baseline_oov_bp=$bp (legal range 0..10000)")
    }
    out += check("vocab_token_unique", agg.getAs[Long]("d") == n,
      s"${n - agg.getAs[Long]("d")} duplicated tokens (a duplicate " +
        "double-counts membership in every OOV probe)")
    out += check("vocab_counts_positive",
      agg.getAs[Long]("bad") == 0L,
      s"${agg.getAs[Long]("bad")} rows with cnt ≤ 0 or null")
    out.result()
  }

  // ----- DSIR importance-weight table (bucket, ct, cr, w_bits) -------

  /** DSIR weight-table truths (Dsir.bucketWeights / finishWeights):
    *  - `dsir_params`: bucket metadata (buckets, key_mode) present —
    *    score() refuses without it, so a stripped table serves nobody.
    *  - `dsir_spine_complete`: exactly `buckets` rows with bucket ids
    *    dense 0..buckets-1 — the all-buckets spine contract; a lost or
    *    duplicated row silently skews every score join.
    *  - `dsir_counts_sane`: ct/cr non-null and ≥ 0.
    *  - `dsir_weights_law`: every w_bits equals the integer-bits law
    *    recomputed from the STORED counts and their totals,
    *    w = [bits(ct+1) − bits(Nt+B)] − [bits(cr+1) − bits(Nr+B)] —
    *    exact integer arithmetic, so one drifted weight (a bad hand
    *    merge, a partial rewrite) is caught, not averaged away. */
  def verifyDsir(spark: SparkSession, dir: String): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val df = Stores.readOrEmpty(spark, dir)
    val md = df.schema("bucket").metadata
    val hasParams = md.contains("buckets") && md.contains("key_mode")
    out += check("dsir_params", hasParams,
      if (hasParams) s"buckets=${md.getLong("buckets")} " +
        s"key_mode=${md.getString("key_mode")}"
      else "bucket column carries no buckets/key_mode metadata — not a " +
        "Dsir.bucketWeights table; refit it")
    def bits(c: org.apache.spark.sql.Column) =
      length(conv(c, 10, 2)).cast("long")
    val totals = df.agg(
      coalesce(sum(col("ct")), lit(0L)).as("nt"),
      coalesce(sum(col("cr")), lit(0L)).as("nr")).head()
    val nt = totals.getAs[Long]("nt")
    val nr = totals.getAs[Long]("nr")
    val b = if (hasParams) md.getLong("buckets") else -1L
    val agg = df.agg(
      count(lit(1)).as("n"),
      countDistinct(col("bucket")).as("d"),
      coalesce(min(col("bucket")), lit(-1L)).as("lo"),
      coalesce(max(col("bucket")), lit(-1L)).as("hi"),
      sum(when(col("ct").isNull || col("cr").isNull ||
        col("ct") < 0L || col("cr") < 0L, 1L).otherwise(0L)).as("badc"),
      sum(when(col("w_bits").isNull ||
        col("w_bits") =!= ((bits(col("ct") + 1) - bits(lit(nt + b))) -
          (bits(col("cr") + 1) - bits(lit(nr + b)))), 1L).otherwise(0L))
        .as("badw")).head()
    if (hasParams) {
      val n = agg.getAs[Long]("n")
      out += check("dsir_spine_complete",
        n == b && agg.getAs[Long]("d") == b &&
          agg.getAs[Long]("lo") == 0L && agg.getAs[Long]("hi") == b - 1L,
        s"$n rows, ${agg.getAs[Long]("d")} distinct buckets in " +
          s"[${agg.getAs[Long]("lo")}, ${agg.getAs[Long]("hi")}] vs " +
          s"declared buckets=$b (the spine must be dense 0..${b - 1})")
      out += check("dsir_weights_law", agg.getAs[Long]("badw") == 0L,
        s"${agg.getAs[Long]("badw")} rows whose stored w_bits differs " +
          s"from the integer-bits law recomputed over the stored " +
          s"counts (Nt=$nt, Nr=$nr, B=$b)")
    }
    out += check("dsir_counts_sane", agg.getAs[Long]("badc") == 0L,
      s"${agg.getAs[Long]("badc")} rows with null/negative ct or cr")
    out.result()
  }

  // ----- ingest funnel (live per-batch store or folded _hist) --------

  /** Funnel-store truths (the per-batch ingest report rows of
    * quality/relevance/full ingest, and their compactFunnel `_hist`
    * fold — both read through `readFunnel`):
    *  - `funnel_batch_unique`: one row per batch_id in THIS dir (a
    *    second row means a replay appended instead of replacing; the
    *    live-wins shadowing across live∪hist is by design and not a
    *    violation — each dir individually must still be exactly-once).
    *  - `funnel_counts_sane`: n_in/n_kept non-null and ≥ 0, every
    *    kill-tier ≥ 0, n_kept ≤ n_in.
    *  - `funnel_tier_law` (when any `n_*_killed` tier column exists —
    *    the tiered ingest forms): per row, Σ tiers + n_kept == n_in —
    *    the telescoping attribution law every tier subtraction
    *    maintains; absent tiers (pre-upgrade rows in a merged read)
    *    count as zero, which is exact because the old pipeline cut
    *    nothing at the tier it did not have.
    *  - `funnel_kept_bp` (when kept_bp exists): the stored basis-point
    *    rate equals floor(n_kept·10⁴/n_in) (0 for an empty batch).
    */
  def verifyFunnel(spark: SparkSession, dir: String): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val df = Stores.readOrEmpty(spark, dir)
    val tiers = df.columns.filter(c =>
      c.startsWith("n_") && c.endsWith("_killed")).toSeq
    val dup = df.groupBy("batch_id").count()
      .filter(col("count") > 1L).count()
    out += check("funnel_batch_unique", dup == 0L,
      s"$dup batch_ids with more than one row in this dir (a replay " +
        "must REPLACE its row)")
    val tierSum = tiers.foldLeft(lit(0L)) { (acc, c) =>
      acc + coalesce(col(c).cast("long"), lit(0L))
    }
    val agg = df.agg(
      sum(when(col("n_in").isNull || col("n_in") < 0 ||
        col("n_kept").isNull || col("n_kept") < 0 ||
        col("n_kept") > col("n_in") ||
        tiers.map(c => coalesce(col(c).cast("long"), lit(0L)) < 0L)
          .foldLeft(lit(false))(_ || _), 1L).otherwise(0L)).as("insane"),
      sum(when(tierSum + col("n_kept") =!= col("n_in"), 1L).otherwise(0L))
        .as("lawbad"),
      (if (df.columns.contains("kept_bp"))
        sum(when(col("kept_bp") =!=
          when(col("n_in") > 0, floor(col("n_kept") * 10000 / col("n_in")))
            .otherwise(0L), 1L).otherwise(0L))
      else sum(lit(0L))).as("bpbad")).head()
    def g(n: String): Long =
      if (agg.isNullAt(agg.fieldIndex(n))) 0L else agg.getAs[Long](n)
    out += check("funnel_counts_sane", g("insane") == 0L,
      s"${g("insane")} rows with null/negative counts, negative " +
        "tiers, or n_kept > n_in")
    if (tiers.nonEmpty)
      out += check("funnel_tier_law", g("lawbad") == 0L,
        s"${g("lawbad")} rows where Σ(${tiers.mkString(",")}) + n_kept " +
          "≠ n_in (the telescoping attribution law)")
    if (df.columns.contains("kept_bp"))
      out += check("funnel_kept_bp", g("bpbad") == 0L,
        s"${g("bpbad")} rows whose kept_bp differs from " +
          "floor(n_kept*10000/n_in)")
    out.result()
  }

  // ----- corpus stats snapshot table ---------------------------------

  /** Corpus-stats-store truths (CorpusStats.appendSnapshot[Idempotent]):
    * every row is one batch's mergeable accumulator, so per-ROW laws
    * hold exactly:
    *  - `stats_nonneg`: all counts/sums ≥ 0 and non-null.
    *  - `stats_blank_bound`: n_blank ≤ n_docs.
    *  - `stats_hist_bound`: Σ tok_hist ≤ n_docs (each doc lands in at
    *    most one bucket; docs beyond the histogram's range land in
    *    none, so ≤ is the law, not ==).
    *  - `stats_moments_feasible`: n_docs·sum_tokens_sq ≥ sum_tokens²
    *    (Cauchy–Schwarz — violated only by a corrupted moment column;
    *    exact DECIMAL arithmetic, no float slack).
    *  - `stats_batch_unique` (idempotent layout): ONE snapshot row per
    *    batch_id — a second row means a replay double-counted instead
    *    of replacing.
    *  - `stats_sketch_mergeable`: the HLL sketches union (the pinned-
    *    lgK contract every readReport depends on) and estimate finite.
    */
  def verifyStats(spark: SparkSession, dir: String): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val df = Stores.readOrEmpty(spark, dir)
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(when(col("n_docs").isNull || col("n_docs") < 0 ||
        col("sum_tokens").isNull || col("sum_tokens") < 0 ||
        col("sum_tokens_sq").isNull || col("sum_tokens_sq") < 0 ||
        col("n_blank").isNull || col("n_blank") < 0, 1L).otherwise(0L))
        .as("neg"),
      sum(when(col("n_blank") > col("n_docs"), 1L).otherwise(0L))
        .as("blankover"),
      sum(when(aggregate(col("tok_hist"), lit(0L), (a, x) => a + x)
        > col("n_docs").cast("long"), 1L).otherwise(0L)).as("histover"),
      sum(when(col("n_docs") * col("sum_tokens_sq") <
        col("sum_tokens") * col("sum_tokens"), 1L).otherwise(0L))
        .as("infeasible")).head()
    out += check("stats_nonneg", agg.getAs[Long]("neg") == 0L,
      s"${agg.getAs[Long]("neg")} rows with null/negative counts")
    out += check("stats_blank_bound", agg.getAs[Long]("blankover") == 0L,
      s"${agg.getAs[Long]("blankover")} rows where n_blank > n_docs")
    out += check("stats_hist_bound", agg.getAs[Long]("histover") == 0L,
      s"${agg.getAs[Long]("histover")} rows whose histogram counts " +
        "more docs than n_docs")
    out += check("stats_moments_feasible",
      agg.getAs[Long]("infeasible") == 0L,
      s"${agg.getAs[Long]("infeasible")} rows violating " +
        "n_docs·sum_tokens_sq ≥ sum_tokens² (Cauchy–Schwarz — a " +
        "corrupted moment column)")
    if (df.columns.contains("batch_id")) {
      val dup = df.groupBy("batch_id").count()
        .filter(col("count") > 1L).count()
      out += check("stats_batch_unique", dup == 0L,
        s"$dup batch_id partitions holding more than one snapshot row " +
          "(a replay must REPLACE its row, never append)")
    }
    // the merge law every readReport runs: sketches only union at one
    // lgConfigK — a snapshot appended at a different precision breaks
    // every future report, so surface it here as a finding
    val mergeable =
      try {
        val est = df.agg(hll_sketch_estimate(
          hll_union_agg(col("fp_sketch"))).as("e")).head()
        !est.isNullAt(0) && est.getLong(0) >= 0L
      } catch { case scala.util.control.NonFatal(_) => false }
    out += check("stats_sketch_mergeable", mergeable,
      if (mergeable) "fp sketches union cleanly (one lgConfigK)"
      else "fp_sketch rows do NOT union — a snapshot was written at a " +
        "different lgConfigK (or a sketch is corrupt); readReport " +
        "would fail; rebuild the offending snapshot rows")
    out.result()
  }

  // ----- stored long-match window index (gk, df) ---------------------

  /** Long-match-index truths: build params present (a probe keyed
    * differently silently misses every match); gram keys unique
    * (appends fold occurrence counts); df positive. */
  def verifyLongMatch(spark: SparkSession, dir: String): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val df = Stores.readOrEmpty(spark, dir)
    val md = df.schema("gk").metadata
    val hasParams = md.contains("min_len") && md.contains("key_mode")
    out += check("longmatch_params", hasParams,
      if (hasParams) s"min_len=${md.getLong("min_len")} " +
        s"key_mode=${md.getString("key_mode")}"
      else "gk column carries no min_len/key_mode metadata — not a " +
        "longMatchIndex store")
    val dup = df.groupBy("gk").count().filter(col("count") > 1L).count()
    out += check("longmatch_gk_unique", dup == 0L,
      s"$dup gram keys with more than one row (appends must FOLD)")
    val nonPos = df.filter(col("df") <= 0L).count()
    out += check("longmatch_df_positive", nonPos == 0L,
      s"$nonPos rows with df ≤ 0 (removals must delete emptied rows)")
    out.result()
  }

  // ----- autoencoder weight store (layer, row_idx, w, bias) ----------

  /** Weight-store truths — the states `Autoencoder.load` would
    * SILENTLY mis-assemble into a wrong-but-running model (the worst
    * failure class for a scorer):
    *  - `model_rows_unique`: one row per (layer, row_idx) — a
    *    duplicated row widens a matrix without erroring.
    *  - `model_layers_contiguous` / `model_rows_contiguous`: indexes
    *    are 0..n-1 with no gaps — load assembles positionally, so a
    *    gap silently SHIFTS every later layer/row.
    *  - `model_rect_chain`: within a layer every weight vector has one
    *    width, and layer l+1's width equals layer l's row count — the
    *    matmul chain the forward pass runs.
    *  - `model_finite`: no null/NaN weights or biases.
    */
  def verifyModel(spark: SparkSession, dir: String): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val df = spark.read.parquet(dir)
    val dup = df.groupBy("layer", "row_idx").count()
      .filter(col("count") > 1L).count()
    out += check("model_rows_unique", dup == 0L,
      s"$dup duplicated (layer, row_idx) rows (load would widen the " +
        "matrix silently)")
    // per-layer shape: rows, distinct widths, index bounds
    val shapes = df.groupBy("layer").agg(
        count(lit(1)).as("rows"),
        min(col("row_idx")).as("rmin"), max(col("row_idx")).as("rmax"),
        countDistinct(size(col("w"))).as("widths"),
        first(size(col("w"))).as("width"))
      .orderBy(col("layer"))
      .collect()
    val layers = shapes.map(r => r.getAs[Int]("layer"))
    val layersOk = layers.toSeq == layers.indices.toSeq
    out += check("model_layers_contiguous", layersOk,
      s"layers ${layers.mkString(",")} (must be 0..${layers.length - 1})")
    val rowsOk = shapes.forall(r => r.getAs[Int]("rmin") == 0 &&
      r.getAs[Int]("rmax").toLong == r.getAs[Long]("rows") - 1L)
    out += check("model_rows_contiguous", rowsOk,
      shapes.map(r => s"layer ${r.getAs[Int]("layer")}: rows " +
        s"${r.getAs[Long]("rows")} idx [${r.getAs[Int]("rmin")}," +
        s"${r.getAs[Int]("rmax")}]").mkString("; "))
    val rectOk = shapes.forall(_.getAs[Long]("widths") == 1L)
    val chainOk = layersOk && shapes.sliding(2).forall {
      case Array(a, b) =>
        b.getAs[Int]("width").toLong == a.getAs[Long]("rows")
      case _ => true
    }
    out += check("model_rect_chain", rectOk && chainOk,
      shapes.map(r => s"layer ${r.getAs[Int]("layer")}: " +
        s"${r.getAs[Long]("rows")}x${r.getAs[Int]("width")}")
        .mkString(" -> "))
    // NOTE exists(null, …) is null, not false — a row whose whole w
    // array is NULL must fail via the explicit isNull disjunct, and
    // ±Infinity slips past isnan, so bound the magnitude too
    def bad1(c: org.apache.spark.sql.Column) =
      c.isNull || isnan(c) || abs(c) > lit(Double.MaxValue)
    val bad = df.filter(bad1(col("bias")) || col("w").isNull ||
        exists(col("w"), x => bad1(x)))
      .count()
    out += check("model_finite", bad == 0L,
      s"$bad rows with null/NaN/±Inf weights or bias")
    out.result()
  }

  // ----- model registry (model, version, stage, …) --------------------

  /** Registry truths:
    *  - `registry_version_unique`: one row per (model, version) — a
    *    duplicate makes `latest` nondeterministic between two rows
    *    claiming the same version.
    *  - `registry_production_single`: at most one Production holder
    *    per model — the archive-existing law `transition` maintains;
    *    two holders mean a by-hand write bypassed it.
    */
  def verifyRegistry(spark: SparkSession, dir: String): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val df = spark.read.parquet(dir)
    val dup = df.groupBy("model", "version").count()
      .filter(col("count") > 1L).count()
    out += check("registry_version_unique", dup == 0L,
      s"$dup duplicated (model, version) rows")
    val multiProd = df.filter(col("stage") === "Production")
      .groupBy("model").count().filter(col("count") > 1L).count()
    out += check("registry_production_single", multiProd == 0L,
      s"$multiProd models with more than one Production version " +
        "(the transition archive-existing law was bypassed)")
    out.result()
  }

  // ----- eval-gram decontamination index ----------------------------

  /** Eval-gram store truths:
    *  - `evalgram_schema_marker`: the `_schema` marker exists and
    *    carries the build params (shingle_n, key_mode) — without it an
    *    all-retired store can never be re-signed.
    *  - `evalgram_params_agree`: the live data's gk metadata matches
    *    the marker's — a drifted marker re-signs future suites with
    *    the WRONG key mode, silently zeroing all their probe hits.
    *  - `evalgram_suite_names`: every suite partition name is in the
    *    portable alphabet the writer enforces.
    */
  def verifyEvalGrams(spark: SparkSession, dir: String): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markerP = new Path(s"$dir/_schema")
    val hasMarker = fs.exists(markerP)
    out += check("evalgram_schema_marker", hasMarker,
      if (hasMarker) "_schema marker present"
      else "_schema marker MISSING — an all-retired store cannot be " +
        "re-signed; rebuild with writeEvalIndex")
    def params(df: DataFrame): Option[(Long, String)] = {
      val md = df.schema("gk").metadata
      if (md.contains("shingle_n") && md.contains("key_mode"))
        Some((md.getLong("shingle_n"), md.getString("key_mode")))
      else None
    }
    val markerParams =
      if (hasMarker) params(spark.read.parquet(s"$dir/_schema")) else None
    if (hasMarker)
      out += check("evalgram_marker_params", markerParams.isDefined,
        s"marker build params: $markerParams")
    val liveSuites = fs.listStatus(new Path(dir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("suite="))
      .map(_.getPath.getName.stripPrefix("suite="))
    if (liveSuites.nonEmpty) {
      val liveParams = params(spark.read.parquet(dir))
      out += check("evalgram_params_agree",
        liveParams.isDefined && (!hasMarker || liveParams == markerParams),
        s"live data params $liveParams vs marker $markerParams")
      val bad = liveSuites.filterNot(_.matches("[0-9A-Za-z_.-]+"))
      out += check("evalgram_suite_names", bad.isEmpty,
        if (bad.isEmpty) s"${liveSuites.length} suites, all well-named"
        else s"ill-named suite partitions: ${bad.mkString(",")}")
    }
    out.result()
  }
}
