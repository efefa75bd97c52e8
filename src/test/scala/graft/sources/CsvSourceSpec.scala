package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CsvSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = new StructType()
    .add("id", IntegerType)
    .add("name", StringType)
    .add("value", DoubleType)

  private def tmpCsv(name: String, content: String): String = {
    val dir = Files.createTempDirectory("csvspec")
    val f = dir.resolve(name)
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  private val clean =
    "id,name,value\n1,alpha,10.5\n2,beta,20.0\n3,gamma,30.25\n"
  private val dirty =
    "id,name,value\n1,alpha,10.5\n2,beta,oops\nbad,delta,40.0\n5,eps,50.75\n"

  test("readInferred infers types and concatenates multiple files") {
    val a = tmpCsv("a.csv", clean)
    val b = tmpCsv("b.csv", "id,name,value\n9,zeta,90.0\n")
    val df = CsvSource.readInferred(spark, Seq(a, b))
    assert(df.count() === 4)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") === IntegerType)
    assert(types("name") === StringType)
    assert(types("value") === DoubleType)
    assert(df.agg(sum(col("id"))).head.getLong(0) === 15L)
  }

  test("readAllStrings reads every column as string") {
    val p = tmpCsv("s.csv", clean)
    val df = CsvSource.readAllStrings(spark, Seq(p))
    assert(df.schema.fields.forall(_.dataType === StringType))
    assert(df.count() === 3)
    // explicit downstream cast works (the reference's coerce-after-read)
    val s = df.select(sum(col("value").cast("double"))).head.getDouble(0)
    assert(math.abs(s - 60.75) < 1e-9)
  }

  test("readPermissive keeps malformed rows and captures the raw line") {
    val p = tmpCsv("d.csv", dirty)
    val df = CsvSource.readPermissive(spark, schema, Seq(p)).cache()
    assert(df.count() === 4)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record")).collect().map(_.getString(0)).sorted
    assert(corrupt.length === 2)
    assert(corrupt.exists(_.contains("oops")))
    assert(corrupt.exists(_.startsWith("bad,")))
    // malformed fields are nulled, parseable fields of corrupt rows kept
    val row2 = df.filter(col("name") === "beta").head
    assert(row2.isNullAt(row2.fieldIndex("value")))
    df.unpersist()
  }

  test("readDropMalformed drops malformed rows") {
    val p = tmpCsv("d2.csv", dirty)
    val df = CsvSource.readDropMalformed(spark, schema, Seq(p))
    // reference all columns so CSV column pruning can't skip the parse
    val n = df.agg(count(lit(1)), min(col("id")), min(col("name")),
      min(col("value"))).head.getLong(0)
    assert(n === 2)
  }

  test("preview returns at most n rows") {
    val p = tmpCsv("p.csv", clean)
    assert(CsvSource.preview(spark, p, 2).count() === 2)
  }
}
