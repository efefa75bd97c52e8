package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 4 well-separated clusters of 16-dim vectors; ids encode the
    * cluster (cluster c = ids c*100 .. c*100+24). */
  private def clustered = {
    val rnd = new java.util.Random(9L)
    val centers = Array.tabulate(4, 16)((c, i) =>
      if (i % 4 == c) 10.0 else 0.0)
    val rows = for {
      c <- 0 until 4
      j <- 0 until 25
    } yield ((c * 100 + j).toLong,
      centers(c).map(v => (v + rnd.nextGaussian() * 0.2).toFloat))
    rows.toDF("vec_id", "embedding")
  }

  test("probed cells recover the query's own cluster (full recall there)") {
    val df = clustered
    val (model, assigned) = Ivf.index(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val got = Ivf.topK(model, assigned, queryId = 0L, k = 10, nProbe = 1)
      .collect().map(_.getLong(0))
    assert(got.length === 10)
    // with one probe on well-separated clusters, every hit is a
    // same-cluster neighbor
    assert(got.forall(id => id < 100L), s"got ${got.toSeq}")
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.count(brute.contains) >= 8,
      "IVF top-10 should nearly match brute force on clustered data")
    assigned.unpersist()
  }

  test("stored index probes with partition pruning and identical results") {
    val df = clustered
    val (model, assigned) = Ivf.index(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val inMem = Ivf.topK(model, assigned, queryId = 0L, k = 10, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Ivf.writeIndex(assigned, dir)
    assigned.unpersist()
    val stored = Ivf.readIndex(spark, dir)
    val probed = Ivf.topK(model, stored, queryId = 0L, k = 10, nProbe = 1)
    assert(probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      === inMem, "stored-index probe must match the in-memory probe")
    // the scale contract: the cell filter reaches the parquet scan as a
    // PARTITION filter — only the probed cell directories are read
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      """PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).isDefined,
      s"cell probe must partition-prune the stored index scan:\n${plan.take(1200)}")
  }

  test("quantized stored index: 4x smaller cells, near-identical probes") {
    import graft.functions.VectorFunctions.{dequantInt8, int8Codes, int8Scale}
    val df = clustered
    val (model, assigned) = Ivf.index(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val dir = java.nio.file.Files.createTempDirectory("ivf_q").toString
    Ivf.writeIndex(assigned, s"$dir/plain")
    Ivf.writeIndexQuantized(assigned, s"$dir/quant")
    assigned.unpersist()

    // readIndex self-detects the layout: same (id, vec, cell) surface
    val plain = Ivf.readIndex(spark, s"$dir/plain")
    val quant = Ivf.readIndex(spark, s"$dir/quant")
    assert(quant.columns.sorted.toSeq === plain.columns.sorted.toSeq)

    // probes agree on the neighbor SET (quantization perturbs sims by
    // ≤ ~scale/2 per element; on separated clusters ranks barely move)
    val p = Ivf.topK(model, plain, queryId = 0L, k = 10, nProbe = 1)
      .collect().map(_.getLong(0)).toSet
    val q = Ivf.topK(model, quant, queryId = 0L, k = 10, nProbe = 1)
      .collect().map(_.getLong(0)).toSet
    assert((p & q).size >= 8, s"quantized probe diverged: $p vs $q")

    // roundtrip error bound: every element within scale/2 (+ margin)
    val vec = graft.functions.VectorFunctions.asDouble($"embedding")
    val scale = int8Scale(vec)
    val bad = df.select(
        org.apache.spark.sql.functions.zip_with(
          vec, dequantInt8(int8Codes(vec, scale), scale),
          (x, y) => org.apache.spark.sql.functions.abs(x - y)).as("errs"),
        (scale * 0.5000001).as("bound"))
      .filter(org.apache.spark.sql.functions.exists($"errs",
        e => e > $"bound"))
      .count()
    assert(bad === 0L, "reconstruction error must stay within scale/2")

    // the stored quantized cells are materially smaller on disk —
    // measured at 128 dims so vector data dominates parquet per-file
    // overhead (at the 16-dim probe fixture, footers/dictionaries
    // drown the payload and the ratio reads artificially low)
    def dirSize(p: String): Long = {
      val root = new java.io.File(p)
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(root)
    }
    val rnd = new java.util.Random(11L)
    val wide = (0 until 400).map(i =>
      (i.toLong, Array.fill(128)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val (_, wideAssigned) = Ivf.index(wide, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    Ivf.writeIndex(wideAssigned, s"$dir/wplain")
    Ivf.writeIndexQuantized(wideAssigned, s"$dir/wquant")
    wideAssigned.unpersist()
    val ratio = dirSize(s"$dir/wplain").toDouble / dirSize(s"$dir/wquant")
    assert(ratio > 2.5, f"expected >2.5x smaller, got $ratio%.2f")
  }

  test("semDedup-written index serves cosine ANN probes (one shared artifact)") {
    // One corpus settle = one quantizer fit + one assignment scan: the
    // (id, cell, vec) frame semDedupIndex builds IS a cosine IVF index.
    // Written via Ivf.writeIndex, the stored table must (a) probe
    // identically to the in-memory frame, (b) equal what a fresh
    // Ivf.indexCosine with the same k/seed would build, and (c) keep
    // the partition-pruning contract of the stored-index path.
    val df = clustered
    val (model, assigned) = Similarity.semDedupIndex(
      df, "vec_id", "embedding", targetClusterSize = 25,
      maxCentroids = 16, seed = 7L)
    val inMem = Ivf.topK(model, assigned, queryId = 0L, k = 10,
        nProbe = 1, metric = "cosine")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("semdedup_idx").toString
    Ivf.writeIndex(assigned, dir)
    val stored = Ivf.readIndex(spark, dir)
    val probed = Ivf.topK(model, stored, queryId = 0L, k = 10,
      nProbe = 1, metric = "cosine")
    assert(probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      === inMem, "stored semDedup index must probe like the in-memory frame")
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      """PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).isDefined,
      s"cosine probe must partition-prune the stored index:\n${plan.take(1200)}")
    // a fresh cosine index at the same k/seed is the same artifact
    val (m2, a2) = Ivf.indexCosine(df, "vec_id", "embedding",
      nCells = model.getK, seed = 7L)
    val fresh = Ivf.topK(m2, a2, queryId = 0L, k = 10,
        nProbe = 1, metric = "cosine")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fresh === inMem,
      "semDedupIndex and Ivf.indexCosine must build the same index")
    graft.core.Caching.releaseAll()
  }

  test("stored two-level index: two-stage probe, both scans partition-pruned") {
    val df = clustered
    val idx = Similarity.semDedupIndexTwoLevelFull(
      df, "vec_id", "embedding", targetClusterSize = 10, coarseCells = 4,
      seed = 7L)
    val dir = java.nio.file.Files.createTempDirectory("twolevel_idx").toString
    Ivf.writeIndexTwoLevel(idx, dir)
    graft.core.Caching.releaseAll()
    val probed = Ivf.topKTwoLevel(spark, dir, queryId = 0L, k = 10,
      nProbeCoarse = 1, nProbeFine = 3)
    val got = probed.collect().map(_.getLong(0))
    assert(got.length === 10)
    // clusters in the fixture are well-separated: probing the query's
    // own coarse cell must recover same-cluster neighbors
    assert(got.forall(id => id < 100L), s"got ${got.toSeq}")
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.count(brute.contains) >= 8,
      "two-level top-10 should nearly match brute force on clustered data")
    // the final candidate scan partition-prunes on the fine cluster
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      """PartitionFilters: \[[^\]]*cluster""".r.findFirstIn(plan).isDefined,
      s"fine-cluster probe must partition-prune the cells scan:\n${plan.take(1200)}")
    // the centroid read partition-prunes on the coarse cell
    val centScan = spark.read.parquet(s"$dir/centroids")
      .filter(org.apache.spark.sql.functions.col("ccell").isin(Seq(0L): _*))
    val centPlan = centScan.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*ccell""".r.findFirstIn(centPlan).isDefined,
      s"centroid read must partition-prune on ccell:\n${centPlan.take(800)}")
    // the by-id query-vector fetch reads the id-bucketed sidecar
    // partition-pruned — NO scan in the whole by-id probe is unpruned
    val lookPlan = Ivf.lookupVecDf(spark, s"$dir/by_id", 0L)
      .queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*idb""".r.findFirstIn(lookPlan).isDefined,
      s"by-id lookup must partition-prune on idb:\n${lookPlan.take(800)}")
    // the serving-path vector overload probes identically
    val viaVec = Ivf.topKTwoLevelVec(spark, dir,
        Ivf.lookupVec(spark, s"$dir/by_id", 0L), k = 10,
        nProbeCoarse = 1, nProbeFine = 3, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaVec ===
      probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "vector-form two-level probe must equal the by-id probe")

    // quantized two-level store: same probe surface, near-identical
    // neighbor set, pruning intact, and appends land in the store's
    // (quantized) layout rather than forking the cells schema
    val dirQ = java.nio.file.Files.createTempDirectory("twolevel_q").toString
    Ivf.writeIndexTwoLevel(idx, dirQ, quantize = true)
    graft.core.Caching.releaseAll()
    val probedQ = Ivf.topKTwoLevel(spark, dirQ, queryId = 0L, k = 10,
      nProbeCoarse = 1, nProbeFine = 3)
    val gotQ = probedQ.collect().map(_.getLong(0)).toSet
    assert((gotQ & got.toSet).size >= 8,
      s"quantized two-level probe diverged: $gotQ vs ${got.toSet}")
    val planQ = probedQ.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cluster""".r.findFirstIn(planQ).isDefined,
      s"quantized probe must keep partition pruning:\n${planQ.take(1200)}")
    val rnd2 = new java.util.Random(31L)
    val novel = (500L, Array.tabulate(16)(i =>
      (if (i % 4 == 0) 10.0 else 0.0) + rnd2.nextGaussian() * 0.2)
      .map(_.toFloat))
    val app = Ivf.appendToIndexTwoLevel(spark, dirQ,
      Seq(novel).toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(app.appended === 1L)
    val cols = spark.read.parquet(s"$dirQ/cells").columns.toSet
    assert(cols.contains("qvec") && !cols.contains("vec"),
      s"append must preserve the quantized layout, got $cols")
    val hitsQ = Ivf.topKTwoLevel(spark, dirQ, queryId = 500L, k = 3,
      nProbeCoarse = 1, nProbeFine = 2).collect().map(_.getLong(0))
    assert(hitsQ.nonEmpty && hitsQ.forall(id => id < 100L || id == 500L),
      s"appended vector must probe within its cluster, got ${hitsQ.toSeq}")
  }

  test("flat index: id-lookup sidecar prunes, vector probe equals by-id probe") {
    val df = clustered
    val (model, assigned) = Ivf.index(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val dir = java.nio.file.Files.createTempDirectory("ivf_byid").toString
    Ivf.writeIndex(assigned, s"$dir/cells")
    Ivf.writeIdLookup(assigned, s"$dir/by_id")
    assigned.unpersist()
    val lplan = Ivf.lookupVecDf(spark, s"$dir/by_id", 205L)
      .queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*idb""".r.findFirstIn(lplan).isDefined,
      s"by-id lookup must partition-prune on idb:\n${lplan.take(800)}")
    val q = Ivf.lookupVec(spark, s"$dir/by_id", 205L)
    val stored = Ivf.readIndex(spark, s"$dir/cells")
    val viaVec = Ivf.topKVec(model, stored, q, k = 10, nProbe = 1,
        excludeId = 205L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaId = Ivf.topK(model, stored, queryId = 205L, k = 10, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaVec === viaId, "vector-form probe must equal the by-id probe")
    // a miss (unknown id) fails loudly, not with an empty-head trace
    val ex = intercept[IllegalArgumentException] {
      Ivf.lookupVec(spark, s"$dir/by_id", 99999L)
    }
    assert(ex.getMessage.contains("not found"))
  }

  test("topKBatch equals the per-id probe loop; pruned, bounded, one plan") {
    val df = clustered
    val (model, assigned) = Ivf.index(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    // 20 queries spread across all 4 clusters
    val qids = (for (c <- 0 until 4; j <- 0 until 5) yield c * 100L + j).toSeq
    val queries = assigned
      .filter(org.apache.spark.sql.functions.col("id").isin(qids: _*))
      .select(org.apache.spark.sql.functions.col("id").as("qid"),
        org.apache.spark.sql.functions.col("vec").as("qvec"))
    val batch = Ivf.topKBatch(model, assigned, queries, "qid", "qvec",
        k = 5, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val loop = qids.flatMap { qid =>
      Ivf.topK(model, assigned, qid, k = 5, nProbe = 2).collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(1)) }
    }.sortBy(x => (x._1, x._2))
    assert(batch === loop,
      "batch probe must equal the per-id loop, rank for rank")
    // stored form: the union of probed cells is a STATIC isin filter,
    // so the scan partition-prunes; the per-query top-k is a bounded
    // (map-side partial) object-hash aggregate, not a sort
    val dir = java.nio.file.Files.createTempDirectory("ivf_batch").toString
    Ivf.writeIndex(assigned, dir)
    val storedPlan = Ivf.topKBatch(model, Ivf.readIndex(spark, dir),
        queries, "qid", "qvec", k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(storedPlan).isDefined,
      s"batch probe must partition-prune the stored index:\n${storedPlan.take(1200)}")
    assert(storedPlan.contains("ObjectHashAggregate"),
      "per-query top-k must be the bounded aggregate")
    assert(storedPlan.contains("BroadcastHashJoin"),
      "probe rows must broadcast, the corpus must stream")
    graft.core.Caching.releaseAll()
  }

  test("euclidean and cosine tiers route apart on asymmetric norms") {
    // q46's oracle depends on `Ivf.index` staying EUCLIDEAN while
    // `indexCosine` is spherical. Candidate re-ranking is always exact
    // cosine, so the metrics can only differ through CELL ROUTING — and
    // on asymmetric norms they must: the query's direction twins sit in
    // the euclidean-FAR cell (norm 10×), while a euclidean-near cluster
    // points 45° off axis. At nProbe=1 the euclidean router probes the
    // near-norm cell and the spherical router the same-direction cell,
    // so a future "unification" of the two tiers cannot silently change
    // q46's ranking.
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),     // the query
      (1L, Array(10.0f, 0.1f)),    // direction twins, 10x the norm
      (2L, Array(10.0f, -0.1f)),
      (3L, Array(9.8f, 0.0f)),
      (4L, Array(0.4f, 0.4f)),     // euclidean-near, 45° off axis
      (5L, Array(0.3f, 0.35f)),
      (6L, Array(0.35f, 0.3f))
    ).toDF("vec_id", "embedding")
    val (em, ea) = Ivf.index(df, "vec_id", "embedding", nCells = 2, seed = 7L)
    val (cm, ca) = Ivf.indexCosine(df, "vec_id", "embedding",
      nCells = 2, seed = 7L)
    try {
      val eTop = Ivf.topK(em, ea, queryId = 0L, k = 1, nProbe = 1)
        .head().getLong(0)
      val cTop = Ivf.topK(cm, ca, queryId = 0L, k = 1, nProbe = 1,
        metric = "cosine").head().getLong(0)
      assert(Set(4L, 5L, 6L).contains(eTop),
        s"euclidean router must probe the near-norm off-axis cell, got $eTop")
      assert(Set(1L, 2L, 3L).contains(cTop),
        s"spherical router must probe the direction-twin cell, got $cTop")
    } finally { ea.unpersist(); ca.unpersist(); () }
  }

  test("ivfTopK is deterministic and ranked descending") {
    val df = clustered
    val a = Ivf.ivfTopK(df, "vec_id", "embedding", 205L, 5, nCells = 4)
      .collect()
    val b = Ivf.ivfTopK(df, "vec_id", "embedding", 205L, 5, nCells = 4)
      .collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    val sims = a.map(_.getDouble(1)).toSeq
    assert(sims === sims.sorted.reverse)
  }

  test("compactIndex: appended store collapses to one file per " +
    "partition, probes and append contract unchanged") {
    val df = clustered
    val idx = Similarity.semDedupIndexTwoLevelFull(
      df, "vec_id", "embedding", targetClusterSize = 10, coarseCells = 4,
      seed = 7L)
    val src = java.nio.file.Files.createTempDirectory("compact_src").toString
    Ivf.writeIndexTwoLevel(idx, src)
    graft.core.Caching.releaseAll()
    // three appends → several small files in the touched partitions
    val rnd = new java.util.Random(41L)
    for (b <- 0 until 3) {
      val batch = (0 until 4).map { j =>
        (900L + b * 10 + j, Array.tabulate(16)(i =>
          (if (i % 4 == 0) 10.0 else 0.0) + rnd.nextGaussian() * 0.2)
          .map(_.toFloat))
      }
      Ivf.appendToIndexTwoLevel(spark, src,
        batch.toDF("vec_id", "embedding"), "vec_id", "embedding")
      graft.core.Caching.releaseAll()
    }
    def parquetFiles(dir: String): Map[String, Int] = {
      val base = java.nio.file.Paths.get(dir)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") ||
          p.getFileName.toString.startsWith("part-"))
        .toSeq
        .groupBy(p => base.relativize(p).toString.split("/").head)
        .map { case (k, v) => k -> v.size }
    }
    val before = parquetFiles(s"$src/cells")
    assert(before.values.exists(_ > 1),
      s"appends should have fragmented at least one partition: $before")
    val dst = src + "_compacted"
    Ivf.compactIndex(spark, src, dst)
    val after = parquetFiles(s"$dst/cells")
    assert(after.values.forall(_ == 1),
      s"every partition must collapse to one file: $after")
    // identical probes, by-id path included (sidecar + meta intact)
    def probe(dir: String, qid: Long) =
      Ivf.topKTwoLevel(spark, dir, queryId = qid, k = 8,
        nProbeCoarse = 2, nProbeFine = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe(dst, 0L) === probe(src, 0L))
    assert(probe(dst, 910L) === probe(src, 910L),
      "appended rows must survive compaction")
    // the append contract continues against the compacted store
    val app = Ivf.appendToIndexTwoLevel(spark, dst,
      Seq((990L, Array.tabulate(16)(i =>
        (if (i % 4 == 0) 10.0 else 0.0).toFloat)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(app.appended === 1L)
    // compaction never runs in place
    intercept[IllegalArgumentException] {
      Ivf.compactIndex(spark, src, dst)
    }
  }

  test("removeFromIndex retracts ids from cells + sidecar, touching " +
    "only their partitions; probes equal a store written without them") {
    import org.apache.spark.sql.functions.col
    val df = clustered
    val (model, assigned) = Ivf.index(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val base = java.nio.file.Files.createTempDirectory("ivf_rm").toString
    val (dir, refDir) = (s"$base/live", s"$base/ref")
    Ivf.writeIndex(assigned, s"$dir/cells")
    Ivf.writeIdLookup(assigned, s"$dir/by_id", idBuckets = 8)
    val removed = Seq(1L, 2L, 105L)
    // reference: the SAME assignment minus the removed rows
    Ivf.writeIndex(assigned.filter(!col("id").isin(removed: _*)),
      s"$refDir/cells")
    val expCells = assigned.filter(col("id").isin(removed: _*))
      .select(col("cell")).distinct().count()

    val rep = Ivf.removeFromIndex(spark, dir, removed.toDF("id"))
    assigned.unpersist()
    assert(rep.removed === 3L)
    assert(rep.cellsTouched === expCells)
    assert(rep.idbTouched === 2L) // idb: 1%8=1, 2%8=2, 105%8=1
    // store rows equal the reference store exactly
    assert(spark.read.parquet(s"$dir/cells")
        .select($"id", $"cell".cast("long")).collect().toSet ===
      spark.read.parquet(s"$refDir/cells")
        .select($"id", $"cell".cast("long")).collect().toSet)
    // exhaustive probe (all cells) equal on both stores
    def probe(d: String) = Ivf.topK(model, Ivf.readIndex(spark, d),
        queryId = 0L, k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe(s"$dir/cells") === probe(s"$refDir/cells"))
    // sidecar: removed id gone (loud miss), kept id still resolves
    intercept[IllegalArgumentException] {
      Ivf.lookupVec(spark, s"$dir/by_id", 105L)
    }
    assert(Ivf.lookupVec(spark, s"$dir/by_id", 0L).length === 16)
    // strictness: already-removed and never-indexed ids refuse
    intercept[IllegalArgumentException] {
      Ivf.removeFromIndex(spark, dir, Seq(1L).toDF("id"))
    }
    intercept[IllegalArgumentException] {
      Ivf.removeFromIndex(spark, dir, Seq(99999L).toDF("id"))
    }
  }

  test("removeFromIndex resumes the sidecar leg when ids are gone from " +
    "cells but still queryable by id (the right-to-erase crash window)") {
    import org.apache.spark.sql.functions.col
    val df = clustered
    val (_, assigned) = Ivf.index(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val dir = java.nio.file.Files.createTempDirectory("ivf_rs").toString
    // construct the post-crash state directly: the cells swap landed
    // (ids gone) but the by_id swap never ran (ids still resolvable)
    Ivf.writeIndex(assigned.filter(!col("id").isin(1L, 106L)),
      s"$dir/cells")
    Ivf.writeIdLookup(assigned, s"$dir/by_id", idBuckets = 8)
    assigned.unpersist()
    assert(Ivf.lookupVec(spark, s"$dir/by_id", 1L).length === 16)
    // the re-run of the same removal must finish the sidecar leg
    // instead of refusing (cells presence check would see 0 matches)
    val rep = Ivf.removeFromIndex(spark, dir, Seq(1L, 106L).toDF("id"))
    assert(rep.removed === 2L && rep.cellsTouched === 0L &&
      rep.idbTouched === 2L) // idb: 1%8=1, 106%8=2
    intercept[IllegalArgumentException] {
      Ivf.lookupVec(spark, s"$dir/by_id", 1L)
    }
    intercept[IllegalArgumentException] {
      Ivf.lookupVec(spark, s"$dir/by_id", 106L)
    }
    // both legs now clean: a further re-run refuses loudly
    intercept[IllegalArgumentException] {
      Ivf.removeFromIndex(spark, dir, Seq(1L, 106L).toDF("id"))
    }
    // PARTIAL sidecar presence is NOT the resume window — refuse
    // (here: one id was never indexed at all)
    intercept[IllegalArgumentException] {
      Ivf.removeFromIndex(spark, dir, Seq(2L, 99999L).toDF("id"))
    }
  }

  test("removeFromIndex preserves a quantized layout and handles the " +
    "two-level cluster partition column") {
    import org.apache.spark.sql.functions.col
    val df = clustered
    val (model, assigned) = Ivf.index(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val base = java.nio.file.Files.createTempDirectory("ivf_rmq").toString
    // quantized store: layout must survive the rewrite (qvec stays)
    Ivf.writeIndexQuantized(assigned, s"$base/q/cells")
    val repQ = Ivf.removeFromIndex(spark, s"$base/q", Seq(1L).toDF("id"))
    assert(repQ.removed === 1L && repQ.idbTouched === 0L)
    val qCols = spark.read.parquet(s"$base/q/cells").columns.toSet
    assert(qCols.contains("qvec") && qCols.contains("qscale"), s"$qCols")
    assert(Ivf.readIndex(spark, s"$base/q/cells")
      .filter(col("id") === 1L).count() === 0L)
    // a cluster-partitioned cells dir (the two-level layout) locates
    // and rewrites through the same path
    graft.sources.Layout.writePartitioned(
      assigned.withColumnRenamed("cell", "cluster")
        .select(col("id"), col("vec"), col("cluster")),
      s"$base/tl/cells", Seq("cluster"))
    val repT = Ivf.removeFromIndex(spark, s"$base/tl", Seq(2L).toDF("id"))
    assert(repT.removed === 1L && repT.cellsTouched === 1L)
    assert(spark.read.parquet(s"$base/tl/cells")
      .filter(col("id") === 2L).count() === 0L)
    assigned.unpersist()
  }
}
