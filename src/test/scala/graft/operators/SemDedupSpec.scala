package graft.operators

import org.apache.spark.sql.types.ArrayType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions.cosineKernel

/** SemDeDup certification: the q72 seed-centroid path and the
  * production semDedupKMeans path share one assignment kernel and one
  * within-cluster collapse — this spec pins (a) the assignment
  * semantics against a driver-side recompute, (b) the argmax stability
  * margin the cross-engine oracle relies on, (c) the exact SemDeDup
  * policy on the k-means path (which no SQL oracle can reach), and
  * (d) the plan shape: no crossJoin expansion, no vector column
  * through the cluster-key exchange.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def embeddings = graft.core.Tables.embeddings(spark, sf)

  /** (id, vec) fixture collected once — 500 rows at sf0.001. */
  private lazy val vecs: Map[Long, Array[Double]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    embeddings
      .select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
  }

  test("assignToCentroids matches a driver-side argmax recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val slim = embeddings.select($"vec_id".cast("long").as("id"),
      $"embedding".cast("array<double>").as("vec"))
    val cents = vecs.toSeq.sortBy(_._1).take(8)
      .map { case (id, v) => (id, v) }.toArray
    val got = Similarity.assignToCentroids(slim, cents)
      .select($"id", $"cluster").as[(Long, Long)].collect().toMap
    vecs.foreach { case (id, v) =>
      // ascending-cid scan, strict > — smallest cid wins exact ties
      val expect = cents.foldLeft((Double.NegativeInfinity, -1L)) {
        case ((best, bc), (cid, cv)) =>
          val cos = cosineKernel(v, cv)
          if (cos > best) (cos, cid) else (best, bc)
      }._2
      assert(got(id) == expect, s"vector $id assigned ${got(id)}, expected $expect")
    }
  }

  test("seed-centroid argmax margin stays ≥ 5e-5 (oracle stability)") {
    val cents = vecs.toSeq.sortBy(_._1).take(8)
    var worst = Double.PositiveInfinity
    vecs.foreach { case (_, v) =>
      val sims = cents.map { case (_, cv) => cosineKernel(v, cv) }.sorted
      val margin = sims(sims.length - 1) - sims(sims.length - 2)
      if (margin < worst) worst = margin
    }
    assert(worst >= 5e-5,
      f"best-vs-second cosine margin $worst%.2e is inside float-drift range; " +
        "the cross-engine q72 assignment is no longer safe")
  }

  test("semDedupKMeans enforces the exact SemDeDup policy") {
    import spark.implicits._
    val out = Similarity.semDedupKMeans(embeddings, "vec_id", "embedding",
        threshold = 0.4, targetClusterSize = 64)
      .as[(Long, Long, Boolean)].collect()
    graft.core.Caching.releaseAll()
    assert(out.length == vecs.size, "one row per vector")
    val byCluster = out.groupBy(_._2)
    assert(byCluster.size >= 2, "corpus-scaled k must give ≥ 2 clusters")
    out.foreach { case (id, cluster, kept) =>
      // dropped ⇔ some smaller-id same-cluster mate at rounded cos ≥ thr
      val hasDupMate = byCluster(cluster).exists { case (oid, _, _) =>
        oid < id && BigDecimal(cosineKernel(vecs(oid), vecs(id)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4
      }
      assert(kept == !hasDupMate, s"vector $id kept=$kept but dup-mate=$hasDupMate")
    }
    // min-id member of every cluster is always kept
    byCluster.values.foreach { members =>
      val first = members.minBy(_._1)
      assert(first._3, s"cluster min-id ${first._1} must be kept")
    }
  }

  test("semDedupFromIndex (the stored-index SERVING path) returns " +
    "exactly what the in-query fit form returns on the same assignment") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the settle-time artifact: fit + assign once, store partitioned
    // by the learned cluster
    val (_, assigned) = Similarity.semDedupIndex(embeddings, "vec_id",
      "embedding", targetClusterSize = 64)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_semdedup_spec").toString
    Ivf.writeIndex(assigned.select($"id", $"vec", $"cell"),
      s"$dir/cells")
    val direct = Similarity.semDedupKMeans(embeddings, "vec_id",
        "embedding", threshold = 0.4, targetClusterSize = 64)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    graft.core.Caching.releaseAll()
    // the per-pass production form: collapse over the stored table
    val served = Similarity.semDedupFromIndex(
        Ivf.readIndex(spark, s"$dir/cells")
          .select($"id", $"cell".cast("long").as("cluster"), $"vec"),
        threshold = 0.4)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    graft.core.Caching.releaseAll()
    assert(served === direct,
      "the stored round-trip must not change a single kept decision")
    // and the stored read is partition-pruned by cluster: one cell's
    // members read one partition directory, not the corpus
    val one = Ivf.readIndex(spark, s"$dir/cells")
      .filter($"cell" === 0)
    val scan = one.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.partitionFilters.exists(_.toString.contains("cell")))
  }

  test("semDedupKMeans policy holds with a sampled quantizer fit") {
    // the 100 TB fit path: codebook fit on a Bernoulli sample. The
    // SemDeDup policy is independent of codebook quality — whatever
    // clusters come out, dropped ⇔ smaller-id cluster-mate ≥ threshold
    import spark.implicits._
    val out = Similarity.semDedupKMeans(embeddings, "vec_id", "embedding",
        threshold = 0.4, targetClusterSize = 64, fitFraction = 0.5)
      .as[(Long, Long, Boolean)].collect()
    graft.core.Caching.releaseAll()
    assert(out.length == vecs.size)
    val byCluster = out.groupBy(_._2)
    out.foreach { case (id, cluster, kept) =>
      val hasDupMate = byCluster(cluster).exists { case (oid, _, _) =>
        oid < id && BigDecimal(cosineKernel(vecs(oid), vecs(id)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4
      }
      assert(kept == !hasDupMate)
    }
  }

  test("spherical fit: semDedupKMeans is invariant to per-vector scaling") {
    // The quantizer fit L2-normalizes before k-means (spherical), so a
    // corpus whose vectors carry wildly different norms must cluster —
    // and dedup — EXACTLY like its unit-norm twin. Power-of-two scale
    // factors make the float arithmetic exact (mantissas untouched), so
    // the assertion is bit-equality, not a tolerance. Pre-fix, the
    // euclidean fit clustered the scaled corpus into norm shells that
    // the cosine argmax then scrambled — this test fails decisively on
    // that regression.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val scaled = embeddings.select($"vec_id",
      expr("transform(embedding, x -> x * cast(pow(2.0, vec_id % 4) as float))")
        .as("embedding"))
    def run(df: org.apache.spark.sql.DataFrame) = {
      val r = Similarity.semDedupKMeans(df, "vec_id", "embedding",
          threshold = 0.4, targetClusterSize = 64)
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      graft.core.Caching.releaseAll()
      r
    }
    val onScaled = run(scaled)
    assert(onScaled == run(embeddings),
      "scaling vectors by powers of two must not move any cluster or kept bit")
    // the balance the spherical fit exists to protect: no cluster may
    // degenerate to a large multiple of the target size
    val sizes = onScaled.groupBy(_._2).view.mapValues(_.size)
    val maxSize = sizes.values.max
    assert(maxSize <= 4 * 64,
      s"max cluster $maxSize exceeds 4x targetClusterSize on the " +
        "scaled-norm fixture — quantizer metric is inconsistent with " +
        "the cosine assignment")
  }

  test("semDedupIndex fails loudly past the codebook broadcast ceiling") {
    val ex = intercept[IllegalArgumentException] {
      Similarity.semDedupIndex(embeddings, "vec_id", "embedding",
        targetClusterSize = 1, maxCodebookBytes = 1024L)
    }
    graft.core.Caching.releaseAll()
    assert(ex.getMessage.contains("broadcast ceiling"),
      s"guard message should name the ceiling: ${ex.getMessage}")
    assert(ex.getMessage.contains("two-level"),
      "guard message should point at the two-level codebook escape hatch")
  }

  test("two-level codebook: policy, nesting, and determinism") {
    import spark.implicits._
    // policy: identical contract to the flat path — dropped ⇔ a
    // smaller-id same-cluster mate at rounded cosine ≥ threshold
    val out = Similarity.semDedupTwoLevel(embeddings, "vec_id", "embedding",
        threshold = 0.4, targetClusterSize = 32, coarseCells = 4)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == vecs.size, "one row per vector")
    val byCluster = out.groupBy(_._2)
    out.foreach { case (id, cluster, kept) =>
      val hasDupMate = byCluster(cluster).exists { case (oid, _, _) =>
        oid < id && BigDecimal(cosineKernel(vecs(oid), vecs(id)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4
      }
      assert(kept == !hasDupMate, s"vector $id kept=$kept but dup-mate=$hasDupMate")
    }
    byCluster.values.foreach { members =>
      assert(members.minBy(_._1)._3, "cluster min-id must be kept")
    }
    graft.core.Caching.releaseAll()

    // nesting: every fine cluster lives inside exactly one coarse cell,
    // and the fine tier genuinely refines (more clusters than cells)
    val idx = Similarity.semDedupIndexTwoLevel(embeddings, "vec_id",
        "embedding", targetClusterSize = 32, coarseCells = 4)
      .select($"id", $"ccell", $"cluster").as[(Long, Long, Long)].collect()
    graft.core.Caching.releaseAll()
    val cellsPerCluster = idx.groupBy(_._3).view.mapValues(_.map(_._2).distinct)
    cellsPerCluster.foreach { case (cl, cs) =>
      assert(cs.size == 1, s"fine cluster $cl spans coarse cells $cs")
    }
    assert(cellsPerCluster.size > idx.map(_._2).distinct.size,
      "the fine tier must refine the coarse partition")

    // determinism for a fixed seed
    def run() = {
      val r = Similarity.semDedupTwoLevel(embeddings, "vec_id", "embedding",
          threshold = 0.4, targetClusterSize = 32, coarseCells = 4)
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      graft.core.Caching.releaseAll()
      r
    }
    assert(run() == run())
  }

  test("two-level edges: 1-row corpus and router-skip (coarseCells = 1)") {
    import spark.implicits._
    val one = Seq((7L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val kept1 = Similarity.semDedupTwoLevel(one, "vec_id", "embedding",
        threshold = 0.9).as[(Long, Long, Boolean)].collect()
    graft.core.Caching.releaseAll()
    assert(kept1.toSeq == Seq((7L, 0L, true)),
      "a singleton corpus is its own kept representative")
    // coarseCells = 1 skips the router (KMeans rejects k = 1) but the
    // fine tier still splits and the policy still holds
    val out = Similarity.semDedupTwoLevel(embeddings, "vec_id", "embedding",
        threshold = 0.4, targetClusterSize = 64, coarseCells = 1)
      .as[(Long, Long, Boolean)].collect()
    graft.core.Caching.releaseAll()
    assert(out.length == vecs.size)
    val byCluster = out.groupBy(_._2)
    assert(byCluster.size >= 2, "fine tier must still split under one cell")
    out.foreach { case (id, cluster, kept) =>
      val hasDupMate = byCluster(cluster).exists { case (oid, _, _) =>
        oid < id && BigDecimal(cosineKernel(vecs(oid), vecs(id)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4
      }
      assert(kept == !hasDupMate)
    }
  }

  test("semDedupKMeans is deterministic for a fixed seed") {
    import spark.implicits._
    def run() = {
      val r = Similarity.semDedupKMeans(embeddings, "vec_id", "embedding",
          threshold = 0.4, targetClusterSize = 64)
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      graft.core.Caching.releaseAll()
      r
    }
    assert(run() == run())
  }

  test("q72 plan: no crossJoin expansion, slim cluster-key join") {
    val q = graft.SparkEntry.queries("q72_semdedup")(spark, sf)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the old shape grouped by (id, vec); no aggregate may key on an
    // array column now
    val lp = q.queryExecution.optimizedPlan
    lp.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.foreach { a =>
      assert(!a.groupingExpressions.exists(_.dataType.isInstanceOf[ArrayType]),
        "no aggregate may group on a vector column")
    }
    // every join on the cluster key must have array-free inputs: the
    // embedding joins back by id only, never rides the cluster exchange
    val clusterJoins = lp.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.references.exists(_.name == "cluster")) => j
    }
    assert(clusterJoins.nonEmpty, "expected the within-cluster pair join")
    clusterJoins.foreach { j =>
      val arrayCols = j.children.flatMap(_.output)
        .filter(_.dataType.isInstanceOf[ArrayType]).map(_.name)
      assert(arrayCols.isEmpty,
        s"vector columns $arrayCols must not enter the cluster-key join")
    }
    graft.core.Caching.releaseAll()
  }

  test("semDedupTwoLevel plan keeps the cluster join vector-free") {
    val q = Similarity.semDedupTwoLevel(embeddings, "vec_id", "embedding",
      threshold = 0.4, targetClusterSize = 32, coarseCells = 4)
    val lp = q.queryExecution.optimizedPlan
    val clusterJoins = lp.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.references.exists(_.name == "cluster")) => j
    }
    assert(clusterJoins.nonEmpty)
    clusterJoins.foreach { j =>
      assert(!j.children.flatMap(_.output)
        .exists(_.dataType.isInstanceOf[ArrayType]),
        "vector columns must not enter the cluster-key join")
    }
    graft.core.Caching.releaseAll()
  }

  test("semDedupKMeans plan keeps the cluster join vector-free too") {
    val q = Similarity.semDedupKMeans(embeddings, "vec_id", "embedding",
      threshold = 0.4, targetClusterSize = 64)
    val lp = q.queryExecution.optimizedPlan
    val clusterJoins = lp.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.references.exists(_.name == "cluster")) => j
    }
    assert(clusterJoins.nonEmpty)
    clusterJoins.foreach { j =>
      assert(!j.children.flatMap(_.output)
        .exists(_.dataType.isInstanceOf[ArrayType]),
        "vector columns must not enter the cluster-key join")
    }
    graft.core.Caching.releaseAll()
  }

  test("q72 result is unchanged by the assignment rewrite (policy check)") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q72_semdedup")(spark, sf)
      .as[(Long, Long, Boolean)].collect()
    graft.core.Caching.releaseAll()
    assert(out.length == vecs.size)
    val cents = vecs.toSeq.sortBy(_._1).take(8)
    val byCluster = out.groupBy(_._2)
    out.foreach { case (id, cluster, kept) =>
      val expect = cents.foldLeft((Double.NegativeInfinity, -1L)) {
        case ((best, bc), (cid, cv)) =>
          val cos = cosineKernel(vecs(id), cv)
          if (cos > best) (cos, cid) else (best, bc)
      }._2
      assert(cluster == expect, s"vector $id cluster $cluster != $expect")
      val hasDupMate = byCluster(cluster).exists { case (oid, _, _) =>
        oid < id && BigDecimal(cosineKernel(vecs(oid), vecs(id)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4
      }
      assert(kept == !hasDupMate)
    }
  }
}
