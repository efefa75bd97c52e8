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

  test("compact collapses a small-files directory, preserving rows") {
    val src = Files.createTempDirectory("layout_small").toString
    val dst = Files.createTempDirectory("layout_compact").toString
    // simulate micro-batch litter: 32 one-row-ish files
    spark.range(3200).toDF("id").repartition(32)
      .write.mode("overwrite").parquet(src)
    assert(Layout.read(spark, src).inputFiles.length === 32)
    Layout.compact(spark, src, dst, targetFileBytes = 64L * 1024 * 1024)
    val back = Layout.read(spark, dst)
    assert(back.inputFiles.length < 32)
    assert(back.count() === 3200L)
    assert(back.agg(sum($"id")).head.getLong(0) === 3200L * 3199 / 2)
  }

  test("mergeSchema read unions evolved batch schemas with typed nulls") {
    val dir = Files.createTempDirectory("layout_evolve").toString
    Seq((1L, "a")).toDF("id", "v1")
      .write.mode("append").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2")
      .write.mode("append").parquet(dir)
    val merged = Layout.readMerged(spark, dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "v1", "v2"))
    val r1 = merged.filter($"id" === 1L).head()
    assert(r1.isNullAt(r1.fieldIndex("v2")), "old batch gets typed null")
    assert(merged.filter($"id" === 2L).head()
      .getAs[Double]("v2") === 9.5)
  }

  test("approximate count-distinct tracks exact within its error bound") {
    val li = graft.core.Tables.lineitem(spark, TestSpark.sf)
    val exact = li.select(countDistinct($"l_orderkey")).head().getLong(0)
    val approx = li.select(approx_count_distinct($"l_orderkey", 0.05))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx $approx vs exact $exact")
  }

  test("z-order layout concentrates rectangle predicates on both columns") {
    val zdir = Files.createTempDirectory("layout_z").toString
    val ldir = Files.createTempDirectory("layout_lin").toString
    val ev = Tables.events(spark, TestSpark.sf)
      .select($"event_id", $"user_id", $"value")

    Layout.writeZOrdered(ev, zdir, "user_id", "value", numFiles = 16)
    Layout.writeRangeSorted(ev, ldir, "user_id", numFiles = 16)

    // bounds for a ~1/4 x 1/4 rectangle in (user_id, value) space
    val b = ev.agg(
      min($"user_id"), max($"user_id"), min($"value"), max($"value")).head()
    val (uLo, uHi) = (b.getLong(0), b.getLong(1))
    val (vLo, vHi) = (b.getDouble(2), b.getDouble(3))
    val uCut = uLo + (uHi - uLo) / 4
    val vCut = vLo + (vHi - vLo) / 4
    def rect(df: org.apache.spark.sql.DataFrame) = df
      .filter($"user_id" >= uLo && $"user_id" <= uCut &&
        $"value" >= vLo && $"value" <= vCut)

    // identical answers from both layouts
    val zRows = rect(Layout.read(spark, zdir))
      .orderBy($"event_id").collect().toSeq
    val lRows = rect(Layout.read(spark, ldir))
      .orderBy($"event_id").collect().toSeq
    assert(zRows === lRows && zRows.nonEmpty)

    // file concentration: the rectangle's rows live in a bounded subset
    // of the z-ordered files (a compact z-range), while the
    // user_id-sorted layout concentrates ONLY the user_id half -- the
    // value constraint buys it nothing. Count files actually holding
    // matching rows (= the files whose row-group stats admit the
    // rectangle; the rest are stats-skippable IO).
    def filesHit(dir: String): Long =
      rect(Layout.read(spark, dir))
        .select(input_file_name()).distinct().count()
    val zHit = filesHit(zdir)
    assert(zHit <= 8, s"z-order rectangle touched $zHit of 16 files")
    assert(zHit <= filesHit(ldir),
      s"z-order ($zHit) should touch no more files than single-column sort")
  }
}
