package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

/** Batch-ETL stages with the semantics of the reference preprocessing
  * chain (reference scripts/preprocess_cicids2017.py:98-342), re-expressed
  * as composable `DataFrame => DataFrame` transforms that each stay a
  * single Catalyst projection/aggregate:
  *
  *  - the reference's per-column Infinity sweep runs ~79 separate count()
  *    jobs (its :152-162); here the sweep is ONE projection and the audit
  *    is ONE aggregate — at 100 TB that is the difference between 1 scan
  *    and 79 scans;
  *  - the reference fits its scaler by collecting up to 500k rows to the
  *    driver (its :268-281); here the fit is a distributed aggregate and
  *    only the per-column scalars (2 doubles per column) ever reach the
  *    driver, so the fit cost is one scan regardless of table size.
  */
object Etl {

  /** Numeric feature columns discovered from the schema (reference
    * discovers from runtime dtypes, stream_anomaly_detector.py:225). */
  def numericColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq

  /** P4: cast the given columns to double in ONE projection (the
    * reference loops withColumn per column, preprocess_cicids2017.py:258-260,
    * building N nested plans). */
  def castDoubles(df: DataFrame, cols: Seq[String]): DataFrame = {
    val set = cols.toSet
    df.select(df.columns.map { c =>
      if (set(c)) col(c).cast(DoubleType).as(c) else col(c)
    }.toSeq: _*)
  }

  /** P7: replace the string sentinels "Infinity"/"-Infinity" (string
    * columns) and non-finite doubles (numeric columns) with null, in one
    * projection (reference preprocess_cicids2017.py:152-162). */
  def nonFiniteToNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    val set = cols.toSet
    df.select(df.columns.map { c =>
      if (!set(c)) col(c)
      else df.schema(c).dataType match {
        case StringType =>
          when(col(c).isin("Infinity", "-Infinity", "NaN"), lit(null))
            .otherwise(col(c)).as(c)
        case _: NumericType =>
          when(col(c) === Double.PositiveInfinity ||
               col(c) === Double.NegativeInfinity || isnan(col(c)), lit(null))
            .otherwise(col(c)).as(c)
        case _ => col(c)
      }
    }.toSeq: _*)
  }

  /** A3 as a single aggregate: per-column null-or-nonfinite counts in one
    * scan instead of one count() action per column. */
  def auditCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("total_rows"),
      cols.map { c =>
        val bad = df.schema(c).dataType match {
          case StringType =>
            col(c).isNull || col(c).isin("Infinity", "-Infinity", "NaN")
          case _: NumericType =>
            col(c).isNull || isnan(col(c)) ||
              col(c) === Double.PositiveInfinity ||
              col(c) === Double.NegativeInfinity
          case _ => col(c).isNull
        }
        sum(when(bad, 1).otherwise(0)).as(s"bad_$c")
      }: _*)

  /** Fitted standard-scaler parameters: column -> (mean, std). Zero or
    * null std is guarded to 1.0 (reference preprocess_cicids2017.py:281). */
  final case class ScalerModel(stats: Map[String, (Double, Double)]) {
    /** A5: z-score transform as a pure literal projection — SQL-expressible,
      * codegen-friendly, no shuffle. */
    def transform(df: DataFrame): DataFrame =
      df.select(df.columns.map { c =>
        stats.get(c) match {
          case Some((m, s)) => ((col(c) - lit(m)) / lit(s)).as(c)
          case None => col(c)
        }
      }.toSeq: _*)

    def toJson: String = stats.toSeq.sortBy(_._1).map { case (c, (m, s)) =>
      s"""{"column":"$c","mean":$m,"std":$s}"""
    }.mkString("[", ",", "]")
  }

  /** A4: fit mean/std-pop for the given columns in ONE distributed
    * aggregate; only 2 scalars per column reach the driver. */
  def fitScaler(df: DataFrame, cols: Seq[String]): ScalerModel = {
    val aggs = cols.flatMap(c =>
      Seq(avg(col(c)).as(s"m_$c"), stddev_pop(col(c)).as(s"s_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = cols.zipWithIndex.map { case (c, i) =>
      val m = Option(row.get(2 * i)).fold(0.0)(_.toString.toDouble)
      val sRaw = Option(row.get(2 * i + 1)).fold(1.0)(_.toString.toDouble)
      val s = if (sRaw == 0.0 || sRaw.isNaN) 1.0 else sRaw
      c -> (m, s)
    }.toMap
    ScalerModel(stats)
  }

  /** A4 in flake-proof form: mean/std derived from EXACT integer sums.
    * Each value is floored to integer micro-units (deterministic on any
    * engine), then summed as bigint/decimal — both order-independent —
    * and the final mean/std are computed from those two exact scalars
    * with a fixed sequence of double ops. Result: bit-identical stats
    * regardless of partitioning, AQE, or engine, unlike distributed
    * avg/stddev_pop whose float summation order varies (the round-1
    * advisor flagged that as an oracle-flake risk). Precision loss vs
    * the true mean is ≤ 1 micro-unit — irrelevant for scaling. */
  def fitScalerExact(df: DataFrame, cols: Seq[String],
                     scale: Double = 1e6): ScalerModel = {
    import org.apache.spark.sql.types.DecimalType
    val aggs = cols.flatMap { c =>
      val vc = floor(col(c) * scale)
      Seq(
        sum(vc).as(s"s1_$c"),
        sum(vc.cast(DecimalType(38, 0)) * vc).as(s"s2_$c"),
        count(col(c)).as(s"n_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = cols.zipWithIndex.map { case (c, i) =>
      if (row.isNullAt(3 * i) || row.getLong(3 * i + 2) == 0L) c -> (0.0, 1.0)
      else {
        val n = row.getLong(3 * i + 2).toDouble
        val meanC = row.getLong(3 * i).toDouble / n
        val varC = row.getDecimal(3 * i + 1).doubleValue / n - meanC * meanC
        val m = meanC / scale
        val sd = math.sqrt(math.max(varC, 0.0)) / scale
        c -> (m, if (sd == 0.0 || sd.isNaN) 1.0 else sd)
      }
    }.toMap
    ScalerModel(stats)
  }

  /** J2-adjacent deterministic split: stable hash-bucket split that is
    * reproducible across engines and runs (randomSplit is seed-stable in
    * Spark but not oracle-checkable; this variant is). `keyCol % den <
    * num` keeps a num/den fraction in the first side. */
  def hashSplit(df: DataFrame, keyCol: String, num: Int, den: Int)
      : (DataFrame, DataFrame) = {
    val in = pmod(col(keyCol), lit(den)) < num
    (df.filter(in), df.filter(!in))
  }

  /** S6: single-file CSV sink — coalesce(1) write then move the part file
    * to a stable name (reference preprocess_cicids2017.py:23-35). Only for
    * small final outputs; never for data at scale. */
  def writeSingleCsv(df: DataFrame, path: String): Unit = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    def ls(dir: Path): Seq[Path] = {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq finally s.close()
    }
    val tmp = path + "_tmp"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    val part = ls(Paths.get(tmp))
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"No part file found under $tmp after CSV write"))
    Files.move(part, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    ls(Paths.get(tmp)).foreach(Files.delete)
    Files.delete(Paths.get(tmp))
  }

  /** Null fill per type (reference stream_anomaly_detector.py:191,203-210). */
  def fillDefaults(df: DataFrame, numeric: Double = 0.0, text: String = "")
      : DataFrame =
    df.na.fill(numeric).na.fill(text)
}
