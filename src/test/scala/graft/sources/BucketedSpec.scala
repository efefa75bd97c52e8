package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Tables
import graft.sources.Bucketed

class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_bucketed_spec")
    d.toFile.deleteOnExit()
    Bucketed.writeBucketed(spark, Tables.orders(spark, TestSpark.sf),
      "spec_b_orders", s"$d/orders", "o_orderkey", buckets = 8)
    Bucketed.writeBucketed(spark,
      Tables.lineitem(spark, TestSpark.sf)
        .select($"l_orderkey", $"l_quantity"),
      "spec_b_lineitem", s"$d/lineitem", "l_orderkey", buckets = 8)
    d
  }

  test("co-located join plans ZERO exchanges of either kind") {
    dir
    val joined = Bucketed.colocatedJoin(spark, "spec_b_orders",
        "spec_b_lineitem", "o_orderkey", "l_orderkey")
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_items"), sum(floor($"l_quantity")).as("qty"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join+agg must be exchange-free, got:\n$plan")
  }

  test("bucketed join equals the plain shuffled join") {
    dir
    val bucketed = Bucketed.colocatedJoin(spark, "spec_b_orders",
        "spec_b_lineitem", "o_orderkey", "l_orderkey")
      .groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
      .orderBy($"o_orderkey").collect().toSeq
    val plain = Tables.orders(spark, TestSpark.sf)
      .join(Tables.lineitem(spark, TestSpark.sf),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
      .orderBy($"o_orderkey").collect().toSeq
    assert(bucketed == plain)
  }

  test("key-point lookup prunes to a single bucket") {
    dir
    // the planner auto-disables bucketed scans when no join/agg needs
    // the distribution, which also drops filter bucket-pruning — force
    // the bucketed read for the point-lookup shape under test
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val anyKey = spark.table("spec_b_orders")
        .select($"o_orderkey").head().getLong(0)
      val q = spark.table("spec_b_orders").filter($"o_orderkey" === anyKey)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket pruning, got:\n$plan")
    } finally spark.conf.set(key, prev)
  }
}
