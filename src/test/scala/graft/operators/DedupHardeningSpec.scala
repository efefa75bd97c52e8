package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Hashing

/** Scale-hardening behaviors of the near-dup tier: bucket caps under a
  * planted viral-duplicate cluster, and the SimHash banding recall
  * guarantee (8 bands ⇒ every pair at hamming ≤ 7 collides on ≥1 band,
  * so bucket-join + exact verify is EXACT for maxHamming ≤ 6).
  */
class DedupHardeningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val words =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango"
      .split(" ")

  /** Deterministic pseudo-text of n words from a seeded LCG. */
  private def text(seed: Long, n: Int): String = {
    val rnd = new java.util.Random(seed)
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
  }

  test("minhash bucket cap bounds a planted viral duplicate cluster") {
    val viral = "the exact same viral document body repeated many times over"
    // 40 shared words, one trailing-word edit → jaccard ≈ 37/39 ≈ 0.95,
    // so a band collision is (1 - 0.95^4)^8 ≈ certain for any seed
    val near1 = text(777L, 40) + " dancing"
    val near2 = text(777L, 40) + " singing"
    val cluster = (0L until 3000L).map(i => (i, viral))
    val distinct = (3000L until 3040L).map(i => (i, text(i, 30)))
    val docs = (cluster ++ distinct ++ Seq((9001L, near1), (9002L, near2)))
      .toDF("doc_id", "text")
    val pairs = Dedup
      .minhashNearDup(docs, "doc_id", "text", threshold = 0.5, maxBucket = 100)
      .collect()
    // the capped cluster contributes no pairwise work...
    assert(!pairs.exists(r => r.getLong(0) < 3000L && r.getLong(1) < 3000L),
      "viral-cluster pairs must be excluded by the bucket cap")
    // ...while genuinely-near pairs in small buckets are still found
    assert(pairs.exists(r => r.getLong(0) == 9001L && r.getLong(1) == 9002L),
      "near-dup pair outside the cluster must survive")
    // the cluster itself belongs to the exact tier, which is O(n)
    val exact = Dedup.exact(docs, "doc_id", Seq("text"))
      .filter($"n_dups" === 3000L).collect()
    assert(exact.length === 1 && exact.head.getAs[Long]("keep_id") === 0L)
  }

  test("bucket cap is a no-op when no bucket exceeds it") {
    val docs = (0L until 60L).map(i => (i, text(i % 20, 25))).toDF("doc_id", "text")
    def pairSet(cap: Int) =
      Dedup.minhashNearDup(docs, "doc_id", "text", threshold = 0.8,
          maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(1000) === pairSet(Int.MaxValue))
    assert(pairSet(1000).nonEmpty) // i%20 duplicates collide
  }

  test("simhash 8-band layout is exact for hamming <= 6 (recall guarantee)") {
    val base = text(1L, 40)
    val variant = base.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 3 || i == 17) "zulu" else w }
      .mkString(" ")
    val docs = ((0L until 50L).map(i => (i, text(i * 31L + 7L, 40))) ++
      Seq((100L, base), (101L, variant))).toDF("doc_id", "text")
    // ground truth: all-pairs exact hamming over the JVM kernel
    val sigs = docs.collect().map(r =>
      r.getLong(0) -> Hashing.simhash64(Hashing.tokens(r.getString(1)))).toMap
    val truth = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 6
    } yield (a, b)).toSet
    val found = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === truth)
    assert(truth.nonEmpty, "fixture must contain at least one near pair")
  }

  test("simhash banding guarantee is enforced") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 4, bands = 4)
    }
  }

  test("winnow guarantees a shared fingerprint for long shared substrings") {
    // identical text → identical fingerprints
    val t = text(21L, 60)
    assert(Hashing.winnow(t).toSeq === Hashing.winnow(t).toSeq)
    // a copied passage (≥ w+k-1 chars) inside different documents →
    // at least one shared fingerprint
    val passage = text(99L, 12)
    val a = text(1L, 20) + " " + passage + " " + text(2L, 20)
    val b = text(3L, 20) + " " + passage + " " + text(4L, 20)
    val shared = Hashing.winnow(a).toSet intersect Hashing.winnow(b).toSet
    assert(shared.nonEmpty, "copied passage must share a fingerprint")
    // docs over disjoint alphabets share nothing (same-vocabulary docs
    // DO share fingerprints — every word ≥ w+k-1 chars is a real shared
    // substring, which is the detector working as specified)
    val c = Hashing.winnow(text(5L, 40)).toSet
    val dset = Hashing.winnow(
      text(6L, 40).replaceAll("[a-z]", "7")).toSet
    assert((c intersect dset).isEmpty)
    // blank / tiny inputs
    assert(Hashing.winnow("").isEmpty)
    assert(Hashing.winnow("ab").length === 1)
  }

  test("winnowNearDup finds passage-copy pairs via bucket join") {
    val passage = text(99L, 15)
    val docs = ((0L until 30L).map(i => (i, text(i * 17L + 3L, 40))) ++
      Seq((100L, text(50L, 20) + " " + passage),
          (101L, text(51L, 20) + " " + passage))).toDF("doc_id", "text")
    // the copied passage is ~40% of each doc; background containment of
    // the narrow test vocabulary sits lower, so 0.4 separates the pair
    val pairs = Dedup.winnowNearDup(docs, "doc_id", "text",
        minContainment = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((100L, 101L)))
  }

  test("distributed CC tier matches the local union-find bit for bit") {
    // localEdgeLimit = 0 forces the pointer-jumping tier every test
    // otherwise skips (the 100 TB path). Fixture stresses its moving
    // parts: a 50-deep chain (collapses only via pointer jumping), a
    // triangle (cycle), a star (high-degree root), a self-loop
    // singleton, and two disjoint pairs.
    val edges = ((0L until 49L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L)) ++
      (201L to 210L).map(i => (200L, i)) ++
      Seq((300L, 300L), (400L, 401L), (500L, 501L)))
      .toDF("a", "b")
    def labels(limit: Long) =
      Dedup.connectedComponents(edges, "a", "b", localEdgeLimit = limit)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = labels(0L)
    val local = labels(Long.MaxValue)
    graft.core.Caching.releaseAll()
    assert(dist === local, "distributed labels must equal the local tier")
    // spot semantics: every chain node roots at 0, triangle at 100
    assert((0L until 50L).forall(dist(_) == 0L))
    assert(Seq(100L, 101L, 102L).forall(dist(_) == 100L))
    assert(dist(300L) == 300L && dist(210L) == 200L && dist(401L) == 400L)
  }

  test("q62 clusters are identical through the distributed CC tier") {
    // the real LSH pair set at fixture scale, pushed through BOTH tiers
    val pairs = Dedup.minhashNearDupCounts(
      graft.core.Tables.documents(spark, graft.TestSpark.sf), "doc_id", "text")
    def run(limit: Long) =
      Dedup.connectedComponents(pairs, "id_a", "id_b", localEdgeLimit = limit)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = run(0L)
    val local = run(Long.MaxValue)
    graft.core.Caching.releaseAll()
    assert(dist.nonEmpty, "fixture must yield near-dup clusters")
    assert(dist === local)
  }

  test("incrementalNearDup reproduces exhaustive batch×corpus ground truth") {
    val docs = graft.core.Tables.documents(spark, graft.TestSpark.sf)
    val batch = docs.filter($"doc_id" % 5 === 0)
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val got = Dedup.incrementalNearDup(batch, "doc_id", "text",
        Dedup.minhashSignatures(corpus, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.Caching.releaseAll()
    // exhaustive cross ground truth via the same JVM shingle kernel
    def shingles(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"text").collect()
        .map(r => r.getLong(0) -> Hashing.shingleSet(r.getString(1), 3).toSet)
    val bs = shingles(batch)
    val cs = shingles(corpus)
    val truth = (for {
      (bid, bsh) <- bs; (cid, csh) <- cs
      inter = (bsh & csh).size
      uni = bsh.size + csh.size - inter
      if inter * 5 >= uni * 4
    } yield (bid, cid)).toSet
    assert(truth.nonEmpty, "fixture must contain cross near-dups")
    assert(got === truth,
      s"missed: ${(truth -- got).take(5)}; extra: ${(got -- truth).take(5)}")
  }

  test("incrementalEmbeddingNearDup finds planted cross near-dups exactly") {
    import graft.functions.VectorFunctions.{asDouble, cosineKernel}
    import org.apache.spark.sql.functions.col
    // corpus of 60 random vectors; batch = 10 new vectors of which 5
    // are tiny perturbations of corpus members (cosine ≈ 1)
    val rnd = new java.util.Random(13L)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val corpusRows = (0L until 60L).map(i => (i, vec()))
    val batchRows = (100L until 105L).map { i =>
      val base = corpusRows((i - 100L).toInt)._2
      (i, base.map(x => (x + rnd.nextGaussian() * 0.005).toFloat))
    } ++ (105L until 110L).map(i => (i, vec()))
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val batch = batchRows.toDF("vec_id", "embedding")
    val got = Similarity.incrementalEmbeddingNearDup(
        batch, "vec_id", "embedding",
        Similarity.embeddingSignatures(corpus, "vec_id", "embedding"),
        corpus.select(col("vec_id").cast("long").as("id"),
          asDouble(col("embedding")).as("vec")),
        threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.Caching.releaseAll()
    // exhaustive cross ground truth at the same rounded threshold
    val cv = corpusRows.map { case (i, v) => i -> v.map(_.toDouble) }
    val bv = batchRows.map { case (i, v) => i -> v.map(_.toDouble) }
    val truth = (for {
      (bid, b) <- bv; (cid, c) <- cv
      if BigDecimal(cosineKernel(b, c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.99
    } yield (bid, cid)).toSet
    assert(truth == (100L until 105L).map(i => (i, i - 100L)).toSet,
      s"planting failed: $truth")
    assert(got === truth,
      s"missed: ${truth -- got}; extra: ${got -- truth}")
  }

  test("incremental tiers handle an empty batch and an empty index") {
    val docs = Seq((1L, "alpha bravo charlie delta echo foxtrot"),
      (2L, "golf hotel india juliet kilo lima")).toDF("doc_id", "text")
    val none = docs.filter($"doc_id" < 0)
    // empty batch vs real index → no rows, no crash
    assert(Dedup.incrementalNearDup(none, "doc_id", "text",
      Dedup.minhashSignatures(docs, "doc_id", "text")).count() === 0L)
    // real batch vs empty index → no rows (nothing settled to match)
    assert(Dedup.incrementalNearDup(docs, "doc_id", "text",
      Dedup.minhashSignatures(none, "doc_id", "text")).count() === 0L)
    assert(Dedup.incrementalDedup(none, "doc_id", "text",
      Dedup.fingerprintIndex(docs, "text")).count() === 0L)
    graft.core.Caching.releaseAll()
  }

  test("exactKeepBest keeps the highest-scored row, id tie-break") {
    val df = Seq(
      (1L, "k1", 10L), (2L, "k1", 30L), (3L, "k1", 30L),
      (9L, "k2", 5L))
      .toDF("id", "key", "score")
    val rows = Dedup.exactKeepBest(df, "id", Seq("key"), "score")
      .orderBy($"key").collect()
    assert(rows(0).getAs[Long]("keep_id") === 3L) // max score, then max id
    assert(rows(0).getAs[Long]("n_dups") === 3L)
    assert(rows(0).getAs[Long]("best_score") === 30L)
    assert(rows(1).getAs[Long]("keep_id") === 9L)
  }

  test("qualityScore is 0.0 (not NaN) for blank documents") {
    val rows = Seq("", "   ", "a real document with the tokens here")
      .toDF("text")
      .select(graft.functions.TextFunctions.qualityScore($"text").as("q"))
      .collect().map(_.getDouble(0))
    assert(rows(0) === 0.0)
    assert(rows(1) === 0.0)
    assert(rows(2) > 0.0 && !rows(2).isNaN)
  }

  test("embeddingNearDup infers dim and caps buckets") {
    val rnd = new java.util.Random(5L)
    def vec(shift: Double): Array[Float] =
      Array.tabulate(16)(i => (math.sin(i + shift) + rnd.nextGaussian() * 0.01).toFloat)
    val rows = (0L until 30L).map(i => (i, vec(i * 0.7))) ++
      Seq((100L, vec(0.0)), (101L, vec(0.001)))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Similarity
      .embeddingNearDup(df, "vec_id", "embedding", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((100L, 101L)))
  }

  test("incremental tiers reject a parameter-mismatched signature index") {
    // The index contract: candidates only form when batch and index
    // agree on every signature parameter, so a stale index must fail
    // loudly instead of screening with silent low recall. The
    // parameters ride as field metadata (parquet-persistent — the
    // round trip is exercised e2e in StreamingIngestSpec).
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, text(1L, 30)), (2L, text(2L, 30)))
      .toDF("doc_id", "text")
    // index built with bands=4, screened with default bands=8
    val staleSig = Dedup.minhashSignatures(docs, "doc_id", "text", bands = 4)
    val ex = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDup(docs, "doc_id", "text", staleSig)
    }
    assert(ex.getMessage.contains("parameter mismatch") &&
      ex.getMessage.contains("bands"), ex.getMessage)

    val rnd = new java.util.Random(31L)
    val emb = (0L until 5L)
      .map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val vecs = emb.select(col("vec_id").cast("long").as("id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")).as("vec"))
    // index planes derived from seed 99, screen uses default seed 7
    val staleESig = Similarity.embeddingSignatures(
      emb, "vec_id", "embedding", seed = 99L)
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.incrementalEmbeddingNearDup(
        emb, "vec_id", "embedding", staleESig, vecs, threshold = 0.9)
    }
    assert(ex2.getMessage.contains("parameter mismatch") &&
      ex2.getMessage.contains("seed"), ex2.getMessage)

    // a hand-built frame without the metadata is rejected too
    val bare = staleESig.withColumn("sig",
      col("sig").as("sig", org.apache.spark.sql.types.Metadata.empty))
    val ex3 = intercept[IllegalArgumentException] {
      Similarity.incrementalEmbeddingNearDup(
        emb, "vec_id", "embedding", bare, vecs, threshold = 0.9)
    }
    assert(ex3.getMessage.contains("metadata"), ex3.getMessage)
    graft.core.Caching.releaseAll()
  }

  test("md5-family winnow twin finds the same passage-copy pairs as " +
    "the rolling-hash production tier") {
    // two docs sharing a long verbatim passage + unrelated filler:
    // both tiers guarantee a shared fingerprint for any shared
    // substring of length >= w + k - 1 = 8 chars, and both verify
    // containment exactly, so the planted pair must appear in both
    val passage = "the shared verbatim paragraph that was copied " +
      "between documents without any change at all"
    val docs = Seq(
      (1L, s"${text(21, 30)} $passage ${text(22, 30)}"),
      (2L, s"${text(23, 30)} $passage ${text(24, 30)}"),
      (3L, text(25, 60)),
      (4L, text(26, 60))).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val seeded = pairs(Dedup.winnowNearDup(docs, "doc_id", "text"))
    val md5 = pairs(Dedup.winnowNearDupMd5(docs, "doc_id", "text"))
    assert(seeded.contains((1L, 2L)), s"seeded tier missed the copy: $seeded")
    assert(md5.contains((1L, 2L)), s"md5 twin missed the copy: $md5")
    graft.core.Caching.releaseAll()
  }

  test("md5-family minhash twin finds the same verified pairs as the " +
    "seeded production tier") {
    // 8 base docs + near-copies of docs 0 and 3 (one-word edits over 40
    // words, jaccard ≈ 0.95) — both tiers verify exact jaccard ≥ 4/5,
    // so with near-certain band recall at 0.95 the PAIR SETS must match
    val docs = ((0 until 8).map(i => (i.toLong, text(i + 1, 40))) ++ Seq(
      (100L, text(1, 40) + " edited"),
      (103L, text(4, 40) + " edited"))).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val seeded = pairs(Dedup.minhashNearDupCounts(docs, "doc_id", "text"))
    val md5 = pairs(Dedup.minhashNearDupMd5(docs, "doc_id", "text"))
    assert(md5 === seeded)
    assert(md5.contains((0L, 100L)) && md5.contains((3L, 103L)),
      s"planted near-copies must be found: $md5")
    graft.core.Caching.releaseAll()
  }

  test("md5-family simhash twin: exact duplicates at hamming 0, " +
    "unrelated docs absent — matching the seeded tier's verdicts") {
    val docs = Seq(
      (1L, text(11, 60)), (2L, text(11, 60)), // exact dup pair
      (3L, text(12, 60)), (4L, text(13, 60))
    ).toDF("doc_id", "text")
    val md5 = Dedup.simhashNearDupMd5(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(md5.contains((1L, 2L, 0)),
      s"exact dups must pair at hamming 0: ${md5.toSeq}")
    assert(md5.forall(_._3 <= 5), s"threshold violated: ${md5.toSeq}")
    // the seeded 64-bit tier agrees on the exact-dup verdict (its
    // narrow-vocabulary background pairs differ by family/threshold —
    // both tiers verify hamming exactly, so only the verdict is pinned)
    val seeded = Dedup.simhashNearDup(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(seeded.contains((1L, 2L, 0)), seeded.toSeq.toString)
    graft.core.Caching.releaseAll()
  }
}
