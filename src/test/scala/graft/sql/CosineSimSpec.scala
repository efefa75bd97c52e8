package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions

class CosineSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomPairs(n: Int, dim: Int) = {
    val rnd = new java.util.Random(13L)
    Seq.fill(n)((
      Array.fill(dim)(rnd.nextGaussian()),
      Array.fill(dim)(rnd.nextGaussian())))
  }

  test("native expression matches the UDF kernel bit-for-bit") {
    val df = randomPairs(200, 32).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.cosineNative($"a", $"b").as("native"),
      VectorFunctions.cosineUdf($"a", $"b").as("viaUdf"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null arrays propagate null; zero norms guard to 0.0") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (Some(Array(0.0, 0.0)), Some(Array(1.0, 1.0))))
      .toDF("a", "b")
    val rows = df.select(VectorFunctions.cosineNative($"a", $"b")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) === 0.0)
  }

  test("registered via SparkSessionExtensions and callable from SQL") {
    val v = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.6d, 0.8d)) AS c")
      .head().getDouble(0)
    assert(math.abs(v - 0.6) < 1e-12)
  }

  test("SQL surface casts int/float arrays to double (no bit reinterpret)") {
    val i = spark.sql("SELECT cosine_sim(array(3, 4), array(3, 4)) AS c")
      .head().getDouble(0)
    assert(math.abs(i - 1.0) < 1e-12)
    val f = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 AS float), cast(0.0 AS float)),
        |                  array(0.6d, 0.8d)) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(f - 0.6) < 1e-12)
  }

  test("SQL surface rejects un-castable argument types at analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim('abc', array(1.0d)) AS c").collect()
    }
  }

  test("stays inside codegen (no ScalaUDF in the plan)") {
    // non-local source so the projection isn't constant-folded away
    val df = spark.range(8)
      .select(
        array($"id" * 1.0, $"id" * 2.0).as("a"),
        array($"id" * 3.0, lit(1.0)).as("b"))
      .select(VectorFunctions.cosineNative($"a", $"b").as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim"), plan)
    assert(!plan.contains("ScalaUDF"), "native expression must not be a UDF")
    // the "*(n)" prefix marks whole-stage-codegen'd operators
    assert(plan.contains("*(1) Project"), plan)
    // and it actually evaluates
    assert(df.collect().length === 8)
  }
}
