package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitionBy layout prunes directories at plan time") {
    val dir = Files.createTempDirectory("layout_part").toString
    val ev = Tables.events(spark, TestSpark.sf)
      .select($"event_id", $"event_type", $"value")
    Layout.writePartitioned(ev, dir, Seq("event_type"))
    val back = Layout.read(spark, dir).filter($"event_type" === "click")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(600))
    // the filter landed as a PARTITION filter on the scan (pruned at
    // listing time), not a post-scan data filter
    val scan = back.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")),
      scan.partitionFilters.mkString(","))
    assert(back.count() ===
      ev.filter($"event_type" === "click").count())
  }

  test("range-sorted layout gives disjoint per-file value ranges") {
    val dir = Files.createTempDirectory("layout_range").toString
    val ev = Tables.events(spark, TestSpark.sf)
      .select($"event_id", $"ts", $"value")
    Layout.writeRangeSorted(ev, dir, "event_id", numFiles = 4)
    val files = Layout.read(spark, dir).inputFiles.sorted
    assert(files.length === 4)
    // per-file [min,max] of the range column must not overlap — that is
    // exactly the property parquet min/max stats skipping relies on
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"event_id"), max($"event_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.toSeq.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, ranges.mkString(","))
      case _ =>
    }
    // row count survives the rewrite
    assert(Layout.read(spark, dir).count() === ev.count())
  }
}
