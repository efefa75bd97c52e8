package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.Etl
import graft.operators.Dedup

class MlBridgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("standardScale matches hand-computed sample-std z-scores") {
    val df = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0))
      .toDF("a", "b")
    val out = MlBridge.standardScale(df, Seq("a", "b"))
      .orderBy($"a").collect()
    // mean 2.5, sample std of {1..4} = sqrt(5/3)
    val sd = math.sqrt(5.0 / 3.0)
    val expected = Seq(1.0, 2.0, 3.0, 4.0).map(v => (v - 2.5) / sd)
    out.map(_.getAs[Double]("a")).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-9)
    }
  }

  test("standardScale ~ Etl.fitScaler modulo ddof (pop vs sample std)") {
    val n = 100
    val df = (1 to n).map(i => i.toDouble).toDF("x")
    val mlScaled = MlBridge.standardScale(df, Seq("x"))
      .agg(max(abs(col("x")))).head.getDouble(0)
    val handScaled = Etl.fitScaler(df, Seq("x")).transform(df)
      .agg(max(abs(col("x")))).head.getDouble(0)
    // identical up to the sqrt(n/(n-1)) ddof factor
    val ratio = mlScaled / handScaled
    assert(math.abs(ratio - math.sqrt((n - 1).toDouble / n)) < 1e-9)
  }

  test("standardScale preserves the input column order") {
    val df = Seq((1, 1.0, "x", 2.0), (2, 3.0, "y", 4.0))
      .toDF("id", "a", "tag", "b")
    val out = MlBridge.standardScale(df, Seq("a", "b"))
    assert(out.columns.toSeq === df.columns.toSeq)
  }

  test("MinHashLSH variant finds the same planted near-dup pairs") {
    val words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
      .split(" ")
    def text(seed: Long, n: Int): String = {
      val rnd = new java.util.Random(seed)
      Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    }
    val base = text(7L, 40)
    val near = base.split(" ").dropRight(1).mkString(" ") + " zulu"
    val docs = ((0L until 25L).map(i => (i, text(i * 13L + 1L, 40))) ++
      Seq((100L, base), (101L, near))).toDF("doc_id", "text")
    val mllib = MlBridge.minhashNearDupMllib(docs, "doc_id", "text",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hand = Dedup.minhashNearDup(docs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mllib.contains((100L, 101L)))
    assert(hand.contains((100L, 101L)))
    // both tiers verify with exact jaccard, so agreed candidates agree
    assert((mllib intersect hand).contains((100L, 101L)))
  }

  test("pcaReduce: planar data keeps its variance and its geometry " +
    "in 2 components") {
    // points on a 2-D plane embedded in 8 dims (dims 0 and 3), plus
    // negligible noise elsewhere — the top-2 components must explain
    // ~everything and preserve pairwise distances
    val rnd = new java.util.Random(3L)
    val pts = (0L until 50L).map { i =>
      val a = rnd.nextGaussian() * 5; val b = rnd.nextGaussian() * 2
      val v = Array.fill(8)(rnd.nextGaussian() * 1e-6)
      v(0) = a; v(3) = b
      (i, v)
    }
    val df = pts.toDF("id", "vec")
    val (reduced, variance) = MlBridge.pcaReduce(df, "id", "vec", k = 2)
    assert(variance.length === 2)
    assert(variance.sum > 0.9999, s"plane variance, got ${variance.toSeq}")
    val red = reduced.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(red.values.forall(_.length === 2))
    def d2(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
    val orig = pts.toMap
    for (i <- 0L until 10L; j <- (i + 1) until 10L) {
      assert(math.abs(d2(red(i), red(j)) - d2(orig(i), orig(j))) < 1e-6,
        s"pairwise distance must survive the projection ($i,$j)")
    }
  }

  test("projectBasis onto MLlib PCA's own basis reproduces the MLlib " +
    "transform; writeBasis/readBasis round-trips exactly") {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.sql.functions._
    val rnd = new java.util.Random(11L)
    val pts = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
    val df = pts.toDF("id", "vec")
    val assembled = df.select(col("id"),
      array_to_vector(col("vec")).as("f"))
    val m = new PCA().setInputCol("f").setOutputCol("p").setK(3)
      .fit(assembled)
    // pc is dim×k column-major; component c = column c
    val basis = Array.tabulate(3, 8)((c, j) => m.pc(j, c))

    val dir = java.nio.file.Files.createTempDirectory("pca_store").toString
    MlBridge.writeBasis(spark, basis, dir)
    val back = MlBridge.readBasis(spark, dir)
    assert(back.length === 3 &&
      back.zip(basis).forall { case (a, b) => a.toSeq === b.toSeq },
      "basis store round trip must be bit-exact")

    val want = m.transform(assembled)
      .select(col("id"), vector_to_array(col("p")).as("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = MlBridge.projectBasis(df, "id", "vec", back).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    pts.foreach { case (i, _) =>
      got(i).zip(want(i)).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9,
          s"projectBasis must reproduce the MLlib projection (id $i)")
      }
    }
  }

  test("readBasis fails loudly on an incomplete store") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("pca_bad").toString
    MlBridge.writeBasis(spark, Array(Array(1.0, 2.0)), dir)
    // drop a cell by rewriting without metadata/rows intact
    spark.read.parquet(dir).limit(1)
      .write.mode("overwrite").parquet(s"$dir/partial")
    val e = intercept[IllegalArgumentException] {
      MlBridge.readBasis(spark, s"$dir/partial")
    }
    assert(e.getMessage.contains("metadata") ||
      e.getMessage.contains("rows") || e.getMessage.contains("cells"))
  }
}
