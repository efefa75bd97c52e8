package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90%-hot-key fact + small dim
  private def fixtures = {
    val fact = ((1 to 900).map(i => (7L, s"hot_$i")) ++
      (1 to 100).map(i => (i.toLong % 5, s"cold_$i")))
      .toDF("k", "payload")
    val dim = Seq((7L, "seven"), (0L, "zero"), (1L, "one"), (99L, "unused"))
      .toDF("dk", "name")
    (fact, dim)
  }

  test("salted inner join equals the plain join") {
    val (fact, dim) = fixtures
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .select($"k", $"payload", $"name")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val plain = fact.join(dim, $"k" === $"dk")
      .select($"k", $"payload", $"name")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted left join keeps unmatched fact rows exactly once") {
    val (fact, dim) = fixtures
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", salts = 4,
      joinType = "left")
    assert(salted.count() === 1000L)
    val unmatched = salted.filter($"name".isNull).count()
    val expected = fact.join(dim, $"k" === $"dk", "left_anti").count()
    assert(unmatched === expected)
  }

  test("hot key spreads across salts") {
    val (fact, _) = fixtures
    val spread = fact.withColumn("__salt",
        floor(rand(42L) * 8).cast("int"))
      .filter($"k" === 7L)
      .select($"__salt").distinct().count()
    assert(spread >= 6, s"hot key should land in most of the 8 salts, got $spread")
  }

  test("unsupported join types are rejected") {
    val (fact, dim) = fixtures
    assertThrows[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", "dk", joinType = "right")
    }
  }
}
