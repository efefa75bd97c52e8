package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("perKey equals the window-rank form on the fixture") {
    val o = Tables.orders(spark, TestSpark.sf)
      .select($"o_custkey", $"o_totalprice", $"o_orderkey")
    val viaAgg = TopK.perKey(o, "o_custkey", "o_totalprice",
        "o_orderkey", k = 2)
      .select($"o_custkey", $"rn".cast("long"), $"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = o
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"o_custkey", $"rn".cast("long"), $"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg === viaWindow)
  }

  test("ties break deterministically by id and buffer stays bounded") {
    val df = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 5.0, 12L), (1L, 7.0, 13L))
      .toDF("k", "v", "id")
    val got = TopK.perKey(df, "k", "v", "id", k = 2)
      .orderBy($"rn")
      .collect().map(r => (r.getAs[Int]("rn"), r.getAs[Long]("id")))
    assert(got.toSeq === Seq((1, 13L), (2, 10L)))
  }

  test("aggregates partially before the shuffle (map-side combine)") {
    val o = Tables.orders(spark, TestSpark.sf)
      .select($"o_custkey", $"o_totalprice", $"o_orderkey")
    val plan = TopK.perKey(o, "o_custkey", "o_totalprice", "o_orderkey", 2)
      .queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate, no Window/global sort of data
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }
}
