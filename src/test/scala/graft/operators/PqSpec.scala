package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 4 well-separated clusters of 16-dim vectors (the IvfSpec
    * fixture): cluster c = ids c*100 .. c*100+24. */
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

  test("fitHead + encode: codes match the hand computation") {
    // dim 4, m = 2, ksub = 2: codebooks are the subvectors of ids 0,1
    val df = Seq(
      (0L, Array(1f, 0f, 0f, 1f)),   // centroids: j0=[1,0] j1=[0,1]
      (1L, Array(0f, 1f, 1f, 0f)),   //            j0=[0,1] j1=[1,0]
      (2L, Array(0.9f, 0.1f, 0.9f, 0.1f)), // nearest: j0→code0, j1→code1
      (3L, Array(0.1f, 0.9f, 0.1f, 0.9f))  // nearest: j0→code1, j1→code0
    ).toDF("vec_id", "embedding")
    val model = Pq.fitHead(df, "vec_id", "embedding", m = 2, ksub = 2)
    val got = Pq.encode(model, df, "vec_id", "embedding")
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    assert(got.toSeq === Seq(
      (0L, Seq[Byte](0, 0)), (1L, Seq[Byte](1, 1)),
      (2L, Seq[Byte](0, 1)), (3L, Seq[Byte](1, 0))))
  }

  test("codebook members reconstruct exactly; rnorm is the recon norm") {
    val df = clustered
    val model = Pq.fitHead(df, "vec_id", "embedding", m = 4, ksub = 8)
    val codes = Pq.encode(model, df, "vec_id", "embedding")
    val recon = Pq.reconstruct(model, codes)
    // the 8 head rows ARE codebook entries: their reconstruction is
    // bit-identical to the original (distance 0 wins every argmin)
    val orig = df.filter($"vec_id" < 8)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toSeq)).toMap
    recon.filter($"id" < 8).collect().foreach { r =>
      assert(r.getSeq[Double](1).toSeq === orig(r.getLong(0)),
        s"head row ${r.getLong(0)} must reconstruct exactly")
    }
    // rnorm equals the reconstruction's norm for every row
    val normErr = recon.as("r")
      .join(codes.as("c"), $"r.id" === $"c.id")
      .select($"r.vec", $"c.rnorm").collect().map { r =>
        val v = r.getSeq[Double](0)
        math.abs(math.sqrt(v.map(x => x * x).sum) - r.getDouble(1))
      }.max
    assert(normErr < 1e-9, s"rnorm drifted from ‖recon‖ by $normErr")
  }

  test("seeded fit is deterministic and ADC recall tracks brute force") {
    val df = clustered
    val m1 = Pq.fit(df, "embedding", m = 8, ksub = 16, seed = 11L)
    val m2 = Pq.fit(df, "embedding", m = 8, ksub = 16, seed = 11L)
    assert(m1.codebooks.flatten.flatten.toSeq ===
      m2.codebooks.flatten.flatten.toSeq,
      "same seed must reproduce the codebooks bit-for-bit")
    val codes = Pq.encode(m1, df, "vec_id", "embedding")
    val qv = df.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
      .map(_.toDouble).toArray
    val got = Pq.adcTopK(m1, codes, qv, k = 10, excludeId = 0L)
      .collect().map(_.getLong(0))
    assert(got.length === 10)
    // ADC's contract is candidate GENERATION, not final order: the
    // cross-cluster gap survives quantization (every hit is a home-
    // cluster mate), while ordering WITHIN a tight cluster is noise-
    // dominated — that exact order is refine's job (pinned below and
    // in the stored-index test)
    assert(got.forall(_ < 100L),
      s"ADC must keep all hits in the home cluster, got ${got.toSeq}")
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.count(brute.contains) >= 5,
      s"ADC top-10 overlaps brute force weakly, got ${got.toSeq}")
  }

  test("ivfPqTopK with refine matches the exact brute-force top-k") {
    val df = clustered
    val got = Pq.ivfPqTopK(df, "vec_id", "embedding", queryId = 0L,
        k = 10, nCells = 4, nProbe = 1, m = 4, ksub = 16, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // one probed cell holds the whole home cluster; the exact re-rank
    // then reproduces brute force scores AND order
    assert(got === brute)
  }

  test("ivfPqTopKHead: deterministic, and home-cell probe = brute force") {
    // ids INTERLEAVED across clusters (id % 4 = cluster) so the head-4
    // seed centroids are one per cluster — head centroids only separate
    // what the id order puts in front of them
    val rnd = new java.util.Random(9L)
    val centers = Array.tabulate(4, 16)((c, i) =>
      if (i % 4 == c) 10.0 else 0.0)
    val rows = for {
      c <- 0 until 4
      j <- 0 until 25
    } yield ((j * 4 + c).toLong,
      centers(c).map(v => (v + rnd.nextGaussian() * 0.2).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    // nProbe = 1 probes the query's home cluster, which holds every
    // true neighbor; the 40-wide ADC shortlist covers the whole 24-row
    // cell, so the exact re-rank must reproduce brute-force scores AND
    // order — the seeded ivfPqTopK argument with zero stochastic inputs
    val got = Pq.ivfPqTopKHead(df, "vec_id", "embedding", queryId = 0L,
        k = 10, nCells = 4, nProbe = 1, m = 4, ksub = 16, refine = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === brute)
    // replay stability: a second independent run is row-identical
    val again = Pq.ivfPqTopKHead(df, "vec_id", "embedding", queryId = 0L,
        k = 10, nCells = 4, nProbe = 1, m = 4, ksub = 16, refine = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(again === got)
  }

  test("stored IVF-PQ: pruned probes, refined = exact, tiny cells") {
    val df = clustered
    val (model, assigned) = Ivf.indexCosine(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val pq = Pq.fit(df, "embedding", m = 4, ksub = 16, seed = 7L)
    val router = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Pq.writeIndexPq(assigned, pq, router, dir)
    Ivf.writeIndex(assigned, s"$dir/plain")
    assigned.unpersist()
    val qv = df.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
      .map(_.toDouble).toArray

    // ADC-only probe partition-prunes the cells scan
    val adc = Pq.topKVecPq(spark, dir, qv, k = 10, nProbe = 1,
      refine = 0, excludeId = 0L)
    val plan = adc.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      """PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).isDefined,
      s"ADC probe must partition-prune the cells scan:\n${plan.take(1200)}")
    assert(adc.collect().length === 10)

    // refined probe = exact brute force (home cluster fully probed)
    val refined = Pq.topKVecPq(spark, dir, qv, k = 10, nProbe = 1,
      refine = 4, excludeId = 0L)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(refined.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      === brute)
    // the refine fetch partition-prunes the by_id sidecar
    val rplan = refined.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*idb""".r.findFirstIn(rplan).isDefined,
      s"refine fetch must partition-prune the sidecar:\n${rplan.take(1200)}")

    // the PQ cells hold m + 8 bytes a row instead of dim · 8: the
    // stored ratio clears 4× even with parquet overheads
    def dirSize(p: String): Long = {
      val root = new java.io.File(p)
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(root)
    }
    // payload shrinks (dim·8)/(m+8) ≈ 10×; at 100 fixture rows parquet
    // footers/dictionaries eat most of that, so pin the conservative
    // bound the fixture can witness
    val ratio = dirSize(s"$dir/plain").toDouble / dirSize(s"$dir/cells")
    assert(ratio > 2.0, s"PQ cells should be >2x smaller, ratio $ratio")
  }

  test("batch probe equals the per-vector loop and prunes the scan") {
    val df = clustered
    val (model, assigned) = Ivf.indexCosine(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val pq = Pq.fit(df, "embedding", m = 4, ksub = 16, seed = 7L)
    val router = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_b").toString
    Pq.writeIndexPq(assigned, pq, router, dir)
    assigned.unpersist()
    val qids = Seq(0L, 107L, 203L, 311L, 14L)
    val queries = df.filter($"vec_id".isin(qids: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val batch = Pq.topKVecPqBatch(spark, dir, queries, "qid", "qvec",
      k = 5, nProbe = 2, refine = 3)
    val plan = batch.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).isDefined,
      s"batch ADC scan must partition-prune cells:\n${plan.take(1200)}")
    assert("""PartitionFilters: \[[^\]]*idb""".r.findFirstIn(plan).isDefined,
      s"batch refine must partition-prune the sidecar:\n${plan.take(1200)}")
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val loop = qids.sorted.flatMap { qid =>
      val qv = df.filter($"vec_id" === qid)
        .select($"embedding").head().getSeq[Float](0)
        .map(_.toDouble).toArray
      Pq.topKVecPq(spark, dir, qv, k = 5, nProbe = 2, refine = 3,
          excludeId = qid)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(1)) }
    }
    assert(got.toSeq === loop)
    graft.core.Caching.releaseAll()
  }

  test("retraction: Ivf.removeFromIndex erases ids from a PQ store — " +
    "probes equal a store written without them, codebooks untouched") {
    val df = clustered
    val (model, assigned) = Ivf.indexCosine(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val pq = Pq.fit(df, "embedding", m = 4, ksub = 16, seed = 7L)
    val router = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }
    val base = java.nio.file.Files.createTempDirectory("pq_rm").toString
    val (dir, refDir) = (s"$base/live", s"$base/ref")
    Pq.writeIndexPq(assigned, pq, router, dir)
    val removed = Seq(2L, 107L)
    Pq.writeIndexPq(
      assigned.filter(!$"id".isin(removed: _*)), pq, router, refDir)
    assigned.unpersist()
    val cbBefore = spark.read.parquet(s"$dir/codebooks").collect().toSet

    val rep = Ivf.removeFromIndex(spark, dir, removed.toDF("id"))
    assert(rep.removed === 2L)
    // the PQ row layout survived the raw rewrite
    assert(spark.read.parquet(s"$dir/cells").columns.toSet ===
      Set("id", "codes", "rnorm", "cell"))
    assert(spark.read.parquet(s"$dir/codebooks").collect().toSet ===
      cbBefore, "codebooks must not be touched by a retraction")
    // ADC + refined probes bit-equal the without-them store
    val qv = df.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
      .map(_.toDouble).toArray
    def probe(d: String) =
      Pq.topKVecPq(spark, d, qv, k = 10, nProbe = 4, refine = 3,
          excludeId = 0L)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe(dir) === probe(refDir))
    // erased ids are gone from the refine sidecar too (loud miss)
    intercept[IllegalArgumentException] {
      Ivf.lookupVec(spark, s"$dir/by_id", 2L)
    }
    graft.core.Caching.releaseAll()
  }

  test("append: probe finds new vectors; drift axes trip the verdict") {
    val df = clustered
    val (model, assigned) = Ivf.indexCosine(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val pq = Pq.fit(df, "embedding", m = 4, ksub = 16, seed = 7L)
    val router = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_a").toString
    Pq.writeIndexPq(assigned, pq, router, dir)
    assigned.unpersist()
    // a near-copy of id 0 (cluster 0 pattern) arrives after the settle
    val qv0 = df.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val novel = Seq((9000L, qv0.map(v => (v + 0.01).toFloat)))
      .toDF("vec_id", "embedding")
    val res = Pq.appendToIndex(spark, dir, novel, "vec_id", "embedding")
    assert(res.appended === 1L)
    assert(!res.needsRefit,
      s"one in-distribution vector must not trip staleness: $res")
    assert(res.meanReconCos > 0.9,
      s"in-distribution append should reconstruct well: $res")
    // the appended vector is probed like a built one (top-1 for its
    // own pattern) and its raw vector serves the refine from by_id
    val hits = Pq.topKVecPq(spark, dir, qv0, k = 3, nProbe = 1,
      refine = 4, excludeId = 0L).collect().map(_.getLong(0))
    assert(hits.contains(9000L),
      s"appended vector missing from probe: ${hits.toSeq}")
    // width drift rejects loudly
    val wrong = Seq((9100L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.appendToIndex(spark, dir, wrong, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("width"), e.getMessage)
    // an out-of-distribution flood trips the recon-drift axis: vectors
    // with energy in positions the build never used reconstruct poorly
    val rnd = new java.util.Random(5L)
    val alien = (0 until 40).map { i =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat * 0.1f)
      v(3) = 10f; v(7) = -10f // pattern orthogonal to the 4 built clusters
      ((9200 + i).toLong, v)
    }.toDF("vec_id", "embedding")
    val res2 = Pq.appendToIndex(spark, dir, alien, "vec_id", "embedding")
    assert(res2.meanReconCos < 0.8 && res2.needsRefit,
      s"out-of-distribution batch must trip the drift verdict: $res2")
    graft.core.Caching.releaseAll()
  }

  test("params contract: drifted dim and contract-less stores reject") {
    val df = clustered
    val (model, assigned) = Ivf.indexCosine(df, "vec_id", "embedding",
      nCells = 4, seed = 7L)
    val pq = Pq.fit(df, "embedding", m = 4, ksub = 16, seed = 7L)
    val router = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_c").toString
    Pq.writeIndexPq(assigned, pq, router, dir)
    assigned.unpersist()
    val e1 = intercept[IllegalArgumentException] {
      Pq.topKVecPq(spark, dir, new Array[Double](8), k = 5)
    }
    assert(e1.getMessage.contains("dim"), e1.getMessage)
    // strip the metadata (a hand-assembled router) → loud reject
    val bare = spark.read.parquet(s"$dir/router")
      .select($"cid", $"centroid".as("centroid",
        org.apache.spark.sql.types.Metadata.empty))
    bare.write.mode("overwrite").parquet(s"$dir/router2")
    new java.io.File(s"$dir/router").listFiles.foreach(_.delete())
    new java.io.File(s"$dir/router").delete()
    new java.io.File(s"$dir/router2").renameTo(new java.io.File(s"$dir/router"))
    val e2 = intercept[IllegalArgumentException] {
      Pq.topKVecPq(spark, dir, new Array[Double](16), k = 5)
    }
    assert(e2.getMessage.contains("build-params"), e2.getMessage)
  }
}
