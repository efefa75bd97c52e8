package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantiles.exactGrouped must be BIT-identical to the built-in exact
  * `percentile` — it is the same math routed through a bounded-memory
  * plan, not an approximation. */
class QuantilesSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private val ps = Seq(0.25, 0.5, 0.75, 0.9)
  private val names = Seq("q25", "q50", "q75", "q90")

  private def builtin(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"g").agg(
      percentile($"x", lit(0.25)).as("q25"),
      percentile($"x", lit(0.5)).as("q50"),
      percentile($"x", lit(0.75)).as("q75"),
      percentile($"x", lit(0.9)).as("q90"))
      .orderBy($"g")

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val expect = builtin(df).collect()
    val got = Quantiles.exactGrouped(df, "g", "x", ps, names)
      .orderBy($"g").collect()
    assert(got.length === expect.length)
    expect.zip(got).foreach { case (e, g) =>
      assert(g.getString(0) === e.getString(0))
      (1 to ps.size).foreach { i =>
        assert(!g.isNullAt(i), s"bracket miss at col $i for ${e.getString(0)}")
        // bitwise: the interpolation arithmetic is replicated exactly
        assert(java.lang.Double.doubleToLongBits(g.getDouble(i)) ===
          java.lang.Double.doubleToLongBits(e.getDouble(i)))
      }
    }
  }

  test("bitwise-equal to built-in percentile on mixed distributions") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { i =>
      val g = s"g${i % 3}"
      // continuous, heavy-tail, and lattice values mixed
      val x = (i % 7) match {
        case 0 => rnd.nextDouble() * 1e6
        case 1 => math.pow(10, rnd.nextDouble() * 6)
        case _ => (rnd.nextInt(5000) * 25).toDouble / 100.0
      }
      (g, x)
    }
    check(rows.toDF("g", "x"))
  }

  test("small groups, integral positions, single-element group") {
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 5.0), ("b", 42.0), ("c", 1.0), ("c", 2.0))
    check(rows.toDF("g", "x"))
  }

  test("all-duplicate group (bracket holds the whole group)") {
    val rows = (1 to 500).map(_ => ("dup", 3.14)) ++
      (1 to 500).map(i => ("mix", (i % 10).toDouble))
    check(rows.toDF("g", "x"))
  }
}
