package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class MixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("plan computes the max achievable mixture") {
    // 1000 web, 100 code; targets 0.8/0.2 → T = min(1250, 500) = 500
    // → web samples 400/1000 = 0.4, code samples 100/100 = 1.0
    val fracs = Mix.plan(Map("web" -> 1000L, "code" -> 100L),
      Map("web" -> 0.8, "code" -> 0.2))
    assert(math.abs(fracs("web") - 0.4) < 1e-12)
    assert(math.abs(fracs("code") - 1.0) < 1e-12)
  }

  test("bySource realizes target proportions within binomial noise") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val mixed = Mix.bySource(docs, "source",
      Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), seed = 42L)
    val got = mixed.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal 25-row sources with 0.5/0.25/0.25 targets → T = 50:
    // src0 keeps all 25, src1/src2 sample half
    assert(got("src0") === 25L)
    assert(got.getOrElse("src1", 0L) >= 5L && got("src1") <= 20L)
    assert(got.getOrElse("src2", 0L) >= 5L && got("src2") <= 20L)
    assert(got.keySet === Set("src0", "src1", "src2"),
      "unlisted sources must be dropped")
    // deterministic for a fixed seed
    val again = Mix.bySource(docs, "source",
      Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), seed = 42L)
    assert(mixed.exceptAll(again).count() === 0L)
  }
}
