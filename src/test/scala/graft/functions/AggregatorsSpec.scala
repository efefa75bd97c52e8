package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.ModelRegistry

class AggregatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("moments aggregator matches built-in avg/var_pop") {
    val xs = (1 to 500).map(i => math.sin(i) * 10 + 5)
    val df = xs.toDF("x").repartition(8)
    val m = df.select(udaf(Aggregators.moments).apply($"x").as("m"))
      .select($"m.n", $"m.mean", $"m.varPop", $"m.stdGuarded").head()
    val ref = df.agg(avg($"x"), var_pop($"x")).head()
    assert(m.getLong(0) === 500L)
    assert(math.abs(m.getDouble(1) - ref.getDouble(0)) < 1e-9)
    assert(math.abs(m.getDouble(2) - ref.getDouble(1)) < 1e-9)
    assert(math.abs(m.getDouble(3) - math.sqrt(ref.getDouble(1))) < 1e-9)
  }

  test("moments aggregator works grouped and guards zero std") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 7.0), ("b", 7.0))
      .toDF("k", "x")
    val rows = df.groupBy($"k")
      .agg(udaf(Aggregators.moments).apply($"x").as("m"))
      .select($"k", $"m.mean", $"m.stdGuarded")
      .orderBy($"k").collect()
    assert(rows(0).getDouble(1) === 2.0)
    assert(rows(0).getDouble(2) === 1.0) // std of {1,3} pop = 1
    assert(rows(1).getDouble(1) === 7.0)
    assert(rows(1).getDouble(2) === 1.0) // zero std -> guard 1.0
  }

  test("registry save/load parquet round trip") {
    val rows = Seq(
      ModelRegistry.ModelVersion("m", 1, "Archived", "2026-01-01", 0.5),
      ModelRegistry.ModelVersion("m", 2, "Production", "2026-02-01", 0.4))
    val reg = ModelRegistry.table(spark, rows)
    val path = java.nio.file.Files.createTempDirectory("graft_regsave")
      .toString + "/registry"
    ModelRegistry.save(reg, path)
    val back = ModelRegistry.load(spark, path)
    assert(back.orderBy($"version").collect().toSeq
      === reg.orderBy($"version").collect().toSeq)
    val latest = ModelRegistry.latest(back, "m", "Production").head()
    assert(latest.getAs[Int]("version") === 2)
  }
}
