package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

class RelationalSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("every declared query has an oracle or is explicitly rows-only") {
    // Every oracle key must point at an existing query.
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("all relational queries run non-empty on sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q01 grouping is the 6 flag/status pairs") {
    val rows = Relational.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
  }

  test("q08 top-k is ordered descending") {
    val rows = Relational.queries("q08_topk_orders")(spark, sf).collect()
    val prices = rows.map(_.getDouble(2)).toSeq
    assert(prices == prices.sorted.reverse)
    assert(rows.length == 10)
  }

  test("q16 zscore per type has ~zero mean") {
    val spark2 = spark
    import spark2.implicits._
    val z = Relational.queries("q16_zscore")(spark, sf)
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.avg($"zscore").as("m"))
      .as[(String, Double)].collect()
    z.foreach { case (_, m) => assert(math.abs(m) < 1e-2) }
  }

  test("entry flagship smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
