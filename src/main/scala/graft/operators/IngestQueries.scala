package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType, StructType}

import graft.core.Tables
import graft.etl.Etl
import graft.sources.CsvSource

/** CSV-ingestion query surface (SURVEY.md §2.1 S1/S2/S3): each query
  * round-trips data through a real CSV file on disk and back through the
  * reader under test, so the oracle checks the full write→parse→type
  * pipeline, not just the plan.
  */
object IngestQueries {

  /** Declared schema for the corrupt-line fixture. */
  private val corruptSchema = new StructType()
    .add("id", IntegerType)
    .add("name", StringType)
    .add("value", DoubleType)

  /** A 5-row CSV with two malformed lines (unparseable int / double) —
    * the corrupt-record shapes the reference tolerates with
    * on_bad_lines='warn' (reference scripts/simulate_network_traffic.py:33-46). */
  private val corruptCsv =
    """id,name,value
      |1,alpha,10.5
      |2,beta,bad_number
      |3,gamma,30.25
      |not_an_int,delta,40.0
      |5,epsilon,50.75
      |""".stripMargin

  /** Delete a fixture directory tree at JVM exit — Bench runs every
    * query twice and Verify once more, so per-invocation temp dirs
    * would otherwise accumulate unbounded /tmp litter. */
  private def cleanupAtExit(dir: java.nio.file.Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
      } catch { case _: Throwable => () }))

  /** The corrupt-CSV fixture, written once per JVM. */
  private lazy val corruptPath: String = {
    val dir = Files.createTempDirectory("graft_csv")
    cleanupAtExit(dir)
    val f = dir.resolve("corrupt.csv")
    Files.write(f, corruptCsv.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  /** q35's two-file CSV fixture, written once per (JVM, sf dir). */
  private val q35Fixture =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+S6 roundtrip: nation → two single-file CSVs (split by key
    // parity) → multi-file header+inferSchema scan → aggregate. The
    // oracle aggregates the parquet table directly, so a lossless
    // write/read/infer roundtrip is exactly what's being checked.
    "q35_csv_roundtrip" -> ((s, d) => {
      import s.implicits._
      val (a, b) = q35Fixture.computeIfAbsent(d, _ => {
        val nation = Tables.nation(s, d)
        val dir = Files.createTempDirectory("graft_q35")
        cleanupAtExit(dir)
        val even = dir.resolve("nation_even.csv").toString
        val odd = dir.resolve("nation_odd.csv").toString
        Etl.writeSingleCsv(nation.filter($"n_nationkey" % 2 === 0), even)
        Etl.writeSingleCsv(nation.filter($"n_nationkey" % 2 === 1), odd)
        (even, odd)
      })
      CsvSource.readInferred(s, Seq(a, b))
        .groupBy($"n_regionkey")
        .agg(
          count(lit(1)).as("n_nations"),
          min($"n_name").as("first_name"),
          max($"n_name").as("last_name"))
        .orderBy($"n_regionkey")
    }),

    // S2+S3 corrupt-line semantics in one row: PERMISSIVE keeps all rows
    // and captures the raw line for malformed ones, DROPMALFORMED drops
    // them, all-strings parses everything as text (nothing malformed).
    // The oracle is the literal expected summary.
    "q38_csv_corrupt" -> ((s, _) => {
      import s.implicits._
      val path = corruptPath
      // Each read is evaluated as its OWN action, for two reasons:
      // (a) CSV column pruning — an aggregate must reference every
      //     schema column or unparsed columns can't flag their rows as
      //     malformed; and
      // (b) combining the three reads into one plan lets Spark dedupe
      //     file scans whose parse *options* differ (scan equality keys
      //     on path+schema, not parse mode), silently replacing the
      //     DROPMALFORMED scan with the PERMISSIVE one.
      val permRow = CsvSource.readPermissive(s, corruptSchema, Seq(path))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("_corrupt_record").isNotNull, 1).otherwise(0)).as("c"),
          sum(when(col("_corrupt_record").isNull, floor(col("value") * 100))
            .otherwise(0)).as("good"),
          min(col("id")), min(col("name")), min(col("value")))
        .head()
      val nDrop = CsvSource.readDropMalformed(s, corruptSchema, Seq(path))
        .agg(count(lit(1)), min(col("id")), min(col("name")),
          min(col("value")))
        .head().getLong(0)
      val nStr = CsvSource.readAllStrings(s, Seq(path)).count()
      Seq((permRow.getLong(0), permRow.getLong(1), nDrop, nStr,
          permRow.getLong(2)))
        .toDF("n_permissive", "n_corrupt", "n_dropmalformed",
          "n_allstrings", "sum_good_c")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q35_csv_roundtrip" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations,
        | MIN(n_name) AS first_name, MAX(n_name) AS last_name
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    "q38_csv_corrupt" ->
      """SELECT CAST(5 AS BIGINT) AS n_permissive,
        | CAST(2 AS BIGINT) AS n_corrupt,
        | CAST(3 AS BIGINT) AS n_dropmalformed,
        | CAST(5 AS BIGINT) AS n_allstrings,
        | CAST(9150 AS BIGINT) AS sum_good_c""".stripMargin
  )
}
