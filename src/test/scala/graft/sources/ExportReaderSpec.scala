package graft.sources

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExportReaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def corpus = (1L to 10L).map(i => (i, s"doc body $i"))
    .toDF("doc_id", "text")

  test("round trip: an exported shard tree reads back to the corpus, " +
    "shard column prunes") {
    val base = java.nio.file.Files.createTempDirectory("exp_rt").toString
    corpus.write.parquet(s"$base/in")
    graft.Main.run(spark, "export", Map(
      "in" -> s"$base/in", "out" -> s"$base/out", "shards" -> "4"))
    val back = ExportReader.read(spark, s"$base/out", schema)
    assert(back.columns.contains("shard"))
    assert(back.select("doc_id", "text").collect().toSet ===
      corpus.collect().toSet)
    // partition pruning: one shard reads a quarter of the corpus
    val one = ExportReader.read(spark, s"$base/out", schema)
      .filter($"shard" === 0L)
    assert(one.count() > 0 && one.count() < 10)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"shard filter must prune directories:\n$plan")
  }

  test("--balance tokens: shard token totals end within one max-length " +
    "doc of each other on a skewed corpus") {
    val rnd = new scala.util.Random(3)
    // heavy-tailed lengths: a few giants, many small docs
    val skewed = ((1L to 5L).map(i => (i, ("giant " * 80).trim)) ++
      (6L to 50L).map(i => (i, ("w " * (1 + rnd.nextInt(10))).trim)))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("exp_bal").toString
    skewed.write.parquet(s"$base/in")
    graft.Main.run(spark, "export", Map(
      "in" -> s"$base/in", "out" -> s"$base/out", "shards" -> "4",
      "balance" -> "tokens"))
    val back = ExportReader.read(spark, s"$base/out", schema)
      .withColumn("n_tok",
        graft.functions.TextFunctions.tokenCount($"text").cast("long"))
    val totals = back.groupBy($"shard")
      .agg(org.apache.spark.sql.functions.sum($"n_tok").as("t"))
      .collect().map(_.getAs[Long]("t"))
    assert(totals.length === 4)
    val maxDoc = 80L
    assert(totals.max - totals.min <= maxDoc,
      s"token totals ${totals.toSeq} spread beyond one max doc")
    // round trip intact under the balanced order
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet ===
      (1L to 50L).toSet)
  }

  test("manifest verify: clean export passes; a tampered shard flips " +
    "its row") {
    val base = java.nio.file.Files.createTempDirectory("exp_ver").toString
    corpus.write.parquet(s"$base/in")
    graft.Main.run(spark, "export", Map(
      "in" -> s"$base/in", "out" -> s"$base/out", "shards" -> "3"))
    val clean = ExportReader.verify(spark, s"$base/out", schema).collect()
    assert(clean.length === 3)
    assert(clean.forall(r => r.getAs[Boolean]("checksum_ok") &&
      r.getAs[Boolean]("docs_ok")), clean.mkString("; "))
    // tamper: delete one data file from shard=0
    val shardDir = new java.io.File(s"$base/out/shard=0")
    val victim = shardDir.listFiles()
      .filter(f => f.getName.startsWith("part-")).head
    assert(victim.delete())
    val after = ExportReader.verify(spark, s"$base/out", schema)
      .collect().map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Boolean]("checksum_ok"), r.getAs[Boolean]("docs_ok"))))
      .toMap
    assert(after(0L) === ((false, false)), "torn shard must flip")
    assert(after(1L) === ((true, true)) && after(2L) === ((true, true)),
      "untouched shards stay green")
  }

  test("multi-epoch manifest verify keys per epoch dir") {
    val base = java.nio.file.Files.createTempDirectory("exp_ver2").toString
    corpus.write.parquet(s"$base/in")
    graft.Main.run(spark, "export", Map(
      "in" -> s"$base/in", "out" -> s"$base/out", "shards" -> "2",
      "epochs" -> "2"))
    val v = ExportReader.verify(spark, s"$base/out", schema).collect()
    assert(v.length === 4, v.mkString("; "))
    assert(v.forall(r => r.getAs[Boolean]("checksum_ok") &&
      r.getAs[Boolean]("docs_ok")), v.mkString("; "))
  }

  test("audit: round-robin shards are balanced per epoch") {
    val base = java.nio.file.Files.createTempDirectory("exp_audit")
      .toString
    corpus.write.parquet(s"$base/in")
    graft.Main.run(spark, "export", Map(
      "in" -> s"$base/in", "out" -> s"$base/out", "shards" -> "3",
      "epochs" -> "2"))
    val audit = ExportReader.audit(spark, s"$base/out", schema)
      .collect()
    assert(audit.length === 6, "2 epochs x 3 shards")
    assert(audit.forall(_.getAs[Boolean]("balanced")),
      audit.mkString("; "))
    assert(audit.map(_.getAs[Long]("n_rows")).sum === 20L)
  }
}
