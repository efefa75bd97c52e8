package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-bucketed tables join without a shuffle on either side") {
    val sf = TestSpark.sf
    Bucketed.writeTable(
      Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity")),
      "bspec_lineitem", "l_orderkey", 8)
    Bucketed.writeTable(
      Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice")),
      "bspec_orders", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.table(spark, "bspec_lineitem")
        .join(Bucketed.table(spark, "bspec_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n${plan.take(800)}")
      // and it computes the same result as the plain parquet join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bspec_lineitem")
      spark.sql("DROP TABLE IF EXISTS bspec_orders")
    }
  }
}
