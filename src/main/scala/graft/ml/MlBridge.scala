package graft.ml

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, StandardScaler, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** MLlib-backed variants of the hand-rolled operators (SURVEY.md §2.9
  * U7, §7.2 step 7): the same semantics expressed through
  * `org.apache.spark.ml`, kept alongside the SQL/kernel forms so either
  * surface can serve, and so the two can be cross-checked in tests.
  *
  * Differences to know about:
  *  - `ml.feature.StandardScaler` uses the SAMPLE standard deviation
  *    (ddof=1), while the reference — and Etl.fitScaler — use population
  *    std (ddof=0, reference preprocess_cicids2017.py:279-281). The two
  *    agree as n → ∞ but not exactly; tests compare against the matching
  *    definition.
  *  - `ml.feature.MinHashLSH` hashes a sparse binary term vector (here:
  *    HashingTF over word shingles), not our 64-bit shingle hashes, so
  *    pair SETS are comparable but scores/seeds are not interchangeable
  *    with Dedup.minhashNearDup.
  *  - Scale: Spark's MinHashLSH only OR-amplifies — each hash table is a
  *    single minhash (a 1-row band), so for low-similarity pairs the
  *    any-table collision probability is 1-(1-j)^T (≈34% at j=0.05,
  *    T=8) and the candidate set grows ~quadratically with corpus size.
  *    Dedup.minhashNearDup's multi-row bands (AND-then-OR) keep noise
  *    collisions near zero; prefer it beyond ~10^3 documents.
  */
object MlBridge {

  /** U7 via MLlib: assemble `cols` into a vector, fit StandardScaler
    * (withMean+withStd), return the input columns replaced by their
    * scaled values (same output shape as Etl.ScalerModel.transform). */
  def standardScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    val assembler = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("__features")
    val scaler = new StandardScaler()
      .setInputCol("__features").setOutputCol("__scaled")
      .setWithMean(true).setWithStd(true)
    val model = scaler.fit(assembler.transform(df))
    val scaled = model.transform(assembler.transform(df))
    val fromVec = udf((v: Vector, i: Int) => v(i))
    // preserve the input column order (ScalerModel.transform does the
    // same), substituting each scaled column in place
    val out = df.columns.toSeq.map { c =>
      val i = cols.indexOf(c)
      if (i >= 0) fromVec(col("__scaled"), lit(i)).as(c) else col(c)
    }
    scaled.select(out: _*)
  }

  /** MinHash+LSH near-dup pairs via `ml.feature.MinHashLSH` over binary
    * HashingTF shingle vectors, verified with exact Jaccard like the
    * hand-rolled tier. Deterministic for a fixed seed. */
  def minhashNearDupMllib(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, threshold: Double = 0.8,
                          numHashTables: Int = 5,
                          seed: Long = 42L): DataFrame = {
    val shingled = df.select(
      col(idCol).cast("long").as("id"),
      TextFunctions.shingles(col(textCol), shingleN).as("sh"))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("vec")
      .setBinary(true).setNumFeatures(1 << 16)
    // fit + both sides of the self-join consume this; persist so the
    // shingle HOF projection and TF hashing run once
    val vecs = graft.core.Caching.persistTracked(tf.transform(shingled))
    val lsh = new MinHashLSH().setInputCol("vec").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(vecs)
    // approxSimilarityJoin distance = 1 - jaccard (on the binary vectors)
    model.approxSimilarityJoin(vecs, vecs, 1.0 - threshold, "dist")
      .select(
        col("datasetA.id").as("id_a"),
        col("datasetB.id").as("id_b"),
        col("datasetA.sh").as("sh_a"),
        col("datasetB.sh").as("sh_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }

  /** PCA dimensionality reduction for the vector tiers: project an
    * embedding column onto its top-k principal components before
    * feeding IVF/PQ/LSH — at high dims the reduction shrinks both the
    * stored index and every distance kernel by dim/k while keeping the
    * variance the data actually has (the standard pre-ANN step; PQ's
    * own sub-quantizers compose with it). Returns the projected frame
    * (idCol, vecCol as array<double> of length k) and the explained-
    * variance ratios for the sizing decision ("how many components
    * keep 95%?"). Fit state is O(dim·k) on the driver; the transform
    * is one matrix-vector product per row, no shuffle. */
  def pcaReduce(df: DataFrame, idCol: String, vecCol: String, k: Int)
      : (DataFrame, Array[Double]) = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val assembled = df.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("__features"))
    val model = new PCA().setInputCol("__features").setOutputCol("__pca")
      .setK(k).fit(assembled)
    val out = model.transform(assembled)
      .select(col(idCol),
        vector_to_array(col("__pca")).as(vecCol))
    (out, model.explainedVariance.toArray)
  }

  /** The SERVING half of PCA split out: project vectors onto a FIXED
    * basis (k rows × dim columns) as pure column expressions — the fit
    * is once-per-corpus driver state; the apply is what runs at 100 TB
    * (one staged dot product per component, no UDF, no shuffle). The
    * basis rides into codegen as array literals. Output: (idCol,
    * vecCol as array<double> of length k). */
  def projectBasis(df: DataFrame, idCol: String, vecCol: String,
                   basis: Array[Array[Double]]): DataFrame = {
    require(basis.nonEmpty, "projectBasis: basis must have >= 1 component")
    require(basis.map(_.length).distinct.length == 1,
      "projectBasis: all basis components must share one dim")
    val dim = basis.head.length
    // dim mismatch fails IN-PLAN, loudly: zip_with pads the shorter
    // array with nulls, so a wrong-dimension vector (wrong basis store
    // loaded) would otherwise project to all-null components silently
    val v0 = col(vecCol).cast("array<double>")
    val v = when(size(v0) === dim, v0)
      .otherwise(raise_error(concat(
        lit("projectBasis: vector dim "), size(v0).cast("string"),
        lit(s" does not match basis dim $dim")))
        .cast("array<double>"))
    val comps = basis.map { row =>
      aggregate(zip_with(v, typedlit(row.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    }
    df.select(col(idCol), array(comps: _*).as(vecCol))
  }

  /** Persist a projection basis as a parquet fixture: one row per
    * (comp, idx, w); dims ride as field metadata — the stored-model
    * pattern (fit once, serve the apply forever from the store). */
  def writeBasis(spark: org.apache.spark.sql.SparkSession,
                 basis: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    require(basis.nonEmpty && basis.map(_.length).distinct.length == 1,
      "writeBasis: basis must be a non-empty rectangular matrix")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("k", basis.length.toLong)
      .putLong("dim", basis.head.length.toLong).build()
    basis.zipWithIndex.flatMap { case (row, c) =>
      row.zipWithIndex.map { case (w, j) => (c.toLong, j.toLong, w) }
    }.toSeq.toDF("comp", "idx", "w")
      .withColumn("comp", col("comp").as("comp", meta))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a [[writeBasis]] store back; fails loudly on missing
    * metadata or a ragged/incomplete matrix. */
  def readBasis(spark: org.apache.spark.sql.SparkSession,
                path: String): Array[Array[Double]] = {
    val df = spark.read.parquet(path)
    val md = df.schema("comp").metadata
    require(md.contains("k") && md.contains("dim"),
      s"basis store at $path carries no k/dim metadata; write it with " +
        "MlBridge.writeBasis")
    val (k, dim) = (md.getLong("k").toInt, md.getLong("dim").toInt)
    val rows = df.collect()
    // raw row count first: duplicate (comp, idx) rows (e.g. a second
    // append-mode write into the store dir) would dedup inside toMap
    // and load a NONDETERMINISTIC value while the cell count still
    // looked right
    require(rows.length == k * dim,
      s"basis store at $path has ${rows.length} rows; expected ${k * dim}")
    val cells = rows
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2))
      .toMap
    require(cells.size == k * dim,
      s"basis store at $path has ${cells.size} cells; expected ${k * dim}")
    Array.tabulate(k, dim)((c, j) => cells((c, j)))
  }
}
