package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class EtlSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("nonFiniteToNull sweeps string sentinels and non-finite doubles") {
    val df = Seq(
      ("Infinity", 1.0), ("-Infinity", 2.0), ("NaN", Double.NaN),
      ("ok", Double.PositiveInfinity), ("fine", 3.5))
      .toDF("s", "x")
    val out = Etl.nonFiniteToNull(df, Seq("s", "x"))
    val rows = out.collect()
    assert(rows.count(_.isNullAt(0)) == 3)
    assert(rows.count(_.isNullAt(1)) == 2)
    assert(out.filter($"s" === "fine").head().getDouble(1) == 3.5)
  }

  test("auditCounts counts nulls and non-finites in one aggregate") {
    val df = Seq(
      (Some(1.0), Some("a")), (None, Some("Infinity")),
      (Some(Double.NaN), None)).toDF("x", "s")
    val row = Etl.auditCounts(df, Seq("x", "s")).head()
    assert(row.getAs[Long]("total_rows") == 3)
    assert(row.getAs[Long]("bad_x") == 2)   // null + NaN
    assert(row.getAs[Long]("bad_s") == 2)   // Infinity + null
  }

  test("fitScaler matches hand-computed mean/std with zero-std guard") {
    val df = Seq((2.0, 5.0), (4.0, 5.0), (6.0, 5.0)).toDF("a", "b")
    val m = Etl.fitScaler(df, Seq("a", "b"))
    val (ma, sa) = m.stats("a")
    val (mb, sb) = m.stats("b")
    assert(math.abs(ma - 4.0) < 1e-12)
    assert(math.abs(sa - math.sqrt(8.0 / 3.0)) < 1e-12)
    assert(mb == 5.0 && sb == 1.0) // zero std -> guard 1.0
  }

  test("fitScalerExact: partitioning-invariant and ~equal to fitScaler") {
    import spark.implicits._
    val df = (1 to 997).map(i => math.sin(i) * 100 + 250).toDF("v")
    val a = Etl.fitScalerExact(df.repartition(1), Seq("v")).stats("v")
    val b = Etl.fitScalerExact(df.repartition(7), Seq("v")).stats("v")
    // bit-identical across partitionings (the whole point)
    assert(java.lang.Double.doubleToLongBits(a._1) ==
      java.lang.Double.doubleToLongBits(b._1))
    assert(java.lang.Double.doubleToLongBits(a._2) ==
      java.lang.Double.doubleToLongBits(b._2))
    // and agrees with the float-aggregate fit to micro-unit precision
    val c = Etl.fitScaler(df, Seq("v")).stats("v")
    assert(math.abs(a._1 - c._1) < 1e-4)
    assert(math.abs(a._2 - c._2) < 1e-4)
  }

  test("scaler transform then inverse is identity; scaled mean ~ 0") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val m = Etl.fitScaler(df, Seq("v"))
    val scaled = m.transform(df)
    val mean = scaled.agg(avg($"v")).head().getDouble(0)
    assert(math.abs(mean) < 1e-12)
    val (mu, sigma) = m.stats("v")
    val back = scaled.select(($"v" * sigma + mu).as("v"))
      .agg(sum($"v")).head().getDouble(0)
    assert(math.abs(back - 5050.0) < 1e-8)
  }

  test("castDoubles is a single projection over mixed columns") {
    val df = Seq(("1", 2), ("3", 4)).toDF("s", "i")
    val out = Etl.castDoubles(df, Seq("s", "i"))
    assert(out.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.DoubleType))
    assert(out.agg(sum($"s")).head().getDouble(0) == 4.0)
  }

  test("hashSplit partitions exactly and deterministically") {
    val df = (0L until 1000L).toDF("id")
    val (a, b) = Etl.hashSplit(df, "id", 4, 5)
    assert(a.count() == 800 && b.count() == 200)
    // disjoint and exhaustive
    assert(a.join(b, "id").count() == 0)
  }

  test("writeSingleCsv produces one stable file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val path = s"$dir/out.csv"
    Etl.writeSingleCsv(Seq((1, "a"), (2, "b")).toDF("k", "v"), path)
    val lines = scala.io.Source.fromFile(path).getLines().toList
    assert(lines.head == "k,v" && lines.size == 3)
  }
}
