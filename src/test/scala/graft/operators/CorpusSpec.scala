package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Tables
import graft.functions.TextFunctions
import graft.functions.VectorFunctions

class TextFunctionsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("token stats on a known sentence") {
    val df = Seq("the quick the quick fox").toDF("text")
    val r = df.select(
      TextFunctions.tokenCount($"text"),
      TextFunctions.distinctTokenCount($"text"),
      TextFunctions.stopwordCount($"text"),
      TextFunctions.avgTokenLen($"text")).head()
    assert(r.getInt(0) == 5)
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 2) // 'the' twice
    assert(math.abs(r.getDouble(3) - 19.0 / 5) < 1e-12)
  }

  test("scrub redacts emails, urls, and long digit runs in order") {
    val df = Seq(
      "contact bob@example.com or visit https://x.io/a?b=1 ref 1234567",
      "short 12345 stays, 123456 goes").toDF("text")
    val got = df.select(TextFunctions.scrub($"text"))
      .collect().map(_.getString(0))
    assert(got(0) === "contact <EMAIL> or visit <URL> ref <NUM>")
    assert(got(1) === "short 12345 stays, <NUM> goes")
  }

  test("fingerprint is token-order-insensitive, content-sensitive") {
    val df = Seq(
      ("a", "one two three"), ("b", "three two one one"),
      ("c", "one two four")).toDF("id", "text")
    val fps = df.select($"id", TextFunctions.fingerprint($"text").as("fp"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }

  test("shingles: n-grams for long docs, whole text for short ones") {
    val df = Seq("a b c d", "x y").toDF("text")
    val sh = df.select(TextFunctions.shingles($"text", 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq("x y"))
  }

  test("jaccard set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(TextFunctions.jaccard($"x", $"y")).head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
  }
}

class VectorFunctionsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("dot / norm / cosine on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 0.0))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot($"a", $"b"),
      VectorFunctions.l2Norm($"a"),
      VectorFunctions.cosine($"a", $"b")).head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 2.0 / 6.0) < 1e-12)
  }

  test("cosine zero-norm guard") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine($"a", $"b")).head().getDouble(0) == 0.0)
  }
}

class DedupSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "doc_id", Seq("text"))
      .orderBy($"keep_id")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups")))
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash near-dup pairs all verify against exact shingle jaccard") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashNearDup(docs, "doc_id", "text").collect()
    assert(pairs.nonEmpty, "fixture contains planted near-dups")
    // re-verify each pair exactly
    val sh = docs.select($"doc_id".cast("long").as("id"),
      TextFunctions.shingles($"text", 3).as("sh"))
    val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.toSeq
    val shMap = sh.filter($"id".isin(ids: _*)).as[(Long, Seq[String])]
      .collect().toMap
    pairs.foreach { r =>
      val (a, b) = (shMap(r.getLong(0)).toSet, shMap(r.getLong(1)).toSet)
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      assert(math.abs(exact - r.getAs[Double]("jaccard")) < 1e-3)
      assert(exact >= 0.8)
    }
  }

  test("simhash of identical docs collides; near-dup pairs respect radius") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDup(df, "doc_id", "text").collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Int]("hamming") == 0)
    val fixture = Dedup.simhashNearDup(Tables.documents(spark, sf),
      "doc_id", "text").collect()
    assert(fixture.forall(_.getAs[Int]("hamming") <= 6))
  }
}

class SimilaritySpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("bruteForceTopK ranks by cosine desc and excludes the query") {
    val got = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sf), "vec_id", "embedding", 0L, 10).collect()
    assert(got.length == 10)
    assert(!got.map(_.getLong(0)).contains(0L))
    val sims = got.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("lshTopK results are a subset of brute-force cosine ordering") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 499)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("cos_sim")).toMap
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 20).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val id = r.getLong(0)
      assert(math.abs(brute(id) - r.getAs[Double]("cos_sim")) < 1e-9)
    }
  }

  test("embeddingNearDup pairs verify against exact cosine") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = Similarity.embeddingNearDup(
      emb, "vec_id", "embedding", 0.4).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("cos_sim") >= 0.4))
  }

  test("knnJoin neighbors carry exact cosines and rank correctly") {
    val emb = Tables.embeddings(spark, sf)
    val knn = Similarity.knnJoin(emb, "vec_id", "embedding", k = 3)
      .collect()
    assert(knn.nonEmpty)
    // per query: ranks are 1..n ascending with non-increasing cosine,
    // and a neighbor never equals its query
    knn.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq ===
        (1 to sorted.length).toSeq)
      val sims = sorted.map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims === sims.sorted.reverse, s"qid $qid not ranked")
      assert(rows.forall(_.getLong(2) != qid))
    }
    // spot-check: the reported cosine matches the exact brute force
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 499)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("cos_sim")).toMap
    knn.filter(_.getLong(0) == 0L).foreach { r =>
      assert(math.abs(brute(r.getLong(2)) - r.getAs[Double]("cos_sim")) < 1e-9)
    }
  }

  test("approximate near-dup tier ⊆ the exact all-pairs baseline") {
    val emb = Tables.embeddings(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(
      Similarity.bruteForceNearDup(emb, "vec_id", "embedding", 0.4))
    val lsh = pairSet(
      Similarity.embeddingNearDup(emb, "vec_id", "embedding", 0.4))
    assert(lsh.subsetOf(exact), "LSH must have perfect precision")
    // this fixture has no planted high-similarity pairs (max pair
    // cosine ≈ 0.5), so 0.4 sits in the random background where LSH
    // collision probability is ~0.5/band — partial recall is expected
    // by construction (~47% here); assert it doesn't collapse outright
    assert(lsh.size * 5 >= exact.size * 2,
      s"recall collapsed: ${lsh.size}/${exact.size}")
  }

  test("lshTopK recall bound on planted near neighbors (ann_lsh contract)") {
    // the random fixture has no genuine neighbors (background cosine
    // ≈ 0.5), so the honest recall certification PLANTS them: 10 small
    // perturbations of the query vector (cosine ≥ 0.99 — the regime
    // hyperplane LSH exists for) among 200 random distractors. The
    // approximate tier must recover nearly all planted neighbors; its
    // precision is exact by construction (cosines verified vs brute
    // force in the subset test above).
    val rnd = new java.util.Random(3L)
    def randVec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val q = randVec()
    def perturb(eps: Double): Array[Float] =
      q.map(x => (x + rnd.nextGaussian() * eps).toFloat)
    val rows = Seq((0L, q)) ++
      (1L to 10L).map(i => (i, perturb(0.02))) ++
      (100L until 300L).map(i => (i, randVec()))
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact == (1L to 10L).toSet, "planting failed — fixture broken")
    val lsh = Similarity.lshTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    graft.core.Caching.releaseAll()
    val recall = (exact & lsh).size
    assert(recall >= 8, s"recall@10 on planted neighbors is $recall/10 — " +
      "the approximate tier lost genuinely-similar vectors")
    // the md5-family certification twin (the ann_lsh registration)
    // obeys the same recall contract on the same planted fixture
    val md5Lsh = Similarity
      .lshTopKMd5(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    graft.core.Caching.releaseAll()
    val md5Recall = (exact & md5Lsh).size
    assert(md5Recall >= 8,
      s"md5-family recall@10 on planted neighbors is $md5Recall/10")
  }

  test("knnJoin recovers planted neighbor pairs (ann_knn_join contract)") {
    val rnd = new java.util.Random(9L)
    def randVec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    // 5 planted twin-pairs among 100 distractors: each twin must list
    // its sibling as rank-1 neighbor
    val twins = (0L until 5L).flatMap { i =>
      val base = randVec()
      Seq((i * 2, base),
        (i * 2 + 1, base.map(x => (x + rnd.nextGaussian() * 0.01).toFloat)))
    }
    val rows = twins ++ (100L until 200L).map(i => (i, randVec()))
    val knn = Similarity.knnJoin(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    graft.core.Caching.releaseAll()
    val recovered = (0L until 10L).count(id =>
      knn.get(id).contains(if (id % 2 == 0) id + 1 else id - 1))
    assert(recovered >= 9,
      s"only $recovered/10 twins listed their sibling as nearest neighbor")
    // md5-family certification twin: same recall contract
    val knnMd5 = Similarity.knnJoinMd5(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    graft.core.Caching.releaseAll()
    val recoveredMd5 = (0L until 10L).count(id =>
      knnMd5.get(id).contains(if (id % 2 == 0) id + 1 else id - 1))
    assert(recoveredMd5 >= 9,
      s"md5 twin: only $recoveredMd5/10 twins listed their sibling")
  }

  test("centroidDrift: identical, negated and orthogonal groups") {
    def f(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // power-of-two coordinates keep every sqrt/division exact in
    // double, so the floor boundaries below are deterministic
    val a = Seq(
      ("stable", f(1, 0)), ("stable", f(1, 0)),
      ("flipped", f(0, 1)), ("flipped", f(0, 1)),
      ("turned", f(1, 0)),
      ("aOnly", f(1, 1))
    ).toDF("grp", "vec")
    val b = Seq(
      ("stable", f(1, 0)), ("stable", f(1, 0)),
      ("flipped", f(0, -1)),
      ("turned", f(0, 1)),
      ("bOnly", f(1, 1))
    ).toDF("grp", "vec")
    val got = Similarity.centroidDrift(a, b, "grp", "vec").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_ => r.getLong(3)))))
      .toMap
    // one-sided groups are excluded (no drift verdict without both)
    assert(got.keySet === Set("stable", "flipped", "turned"))
    assert(got("stable") === ((2L, 2L, Some(10000L))))
    // exact negation → cosine -1 → floor(-10000.0) = -10000
    assert(got("flipped")._3 === Some(-10000L))
    // orthogonal centroids → cosine 0
    assert(got("turned") === ((1L, 1L, Some(0L))))
  }

  test("centroidDrift: a dimensionality change depresses cosine, not truncates") {
    def f(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // A is 2-dim, B is 3-dim with the extra mass in the new dim: an
    // inner join would drop dim 3 and report cos=1; zero-fill must
    // yield 1/sqrt(2) -> 7071 bp
    val a = Seq(("g", f(1, 0))).toDF("grp", "vec")
    val b = Seq(("g", f(1, 0, 1))).toDF("grp", "vec")
    val r = Similarity.centroidDrift(a, b, "grp", "vec").head()
    assert(r.getLong(3) === 7071L)
  }

  test("centroidDrift: zero-vector side yields a null verdict") {
    def f(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val a = Seq(("g", f(0, 0))).toDF("grp", "vec")
    val b = Seq(("g", f(1, 0))).toDF("grp", "vec")
    val r = Similarity.centroidDrift(a, b, "grp", "vec").head()
    assert(r.isNullAt(3))
  }
}

class NearDupCountsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("minhashNearDupCounts reproduces all-pairs ground truth (recall)") {
    val docs = Tables.documents(spark, sf)
    val lsh = Dedup.minhashNearDupCounts(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exhaustive ground truth: every pair with shingle-jaccard ≥ 4/5,
    // via a cross join on the (small) fixture
    val sh = docs.select($"doc_id".cast("long").as("id"),
      TextFunctions.shingles($"text", 3).as("sh"))
    val truth = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("i"),
        size(array_union(col("a.sh"), col("b.sh"))).as("u"))
      .filter(col("i") * 5 >= col("u") * 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === truth, "LSH pair set must equal exhaustive truth")
  }

  test("connectedComponents merges chains transitively") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),        // chain → one cluster rooted at 1
      (10L, 11L),                // separate pair
      (20L, 21L), (21L, 22L), (20L, 22L)) // triangle
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    graft.core.Caching.releaseAll()
  }

  test("counts form agrees with the float form of the tier") {
    val docs = Tables.documents(spark, sf)
    val counts = Dedup.minhashNearDupCounts(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val floats = Dedup.minhashNearDup(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(counts === floats)
  }
}
