package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Corpus, IngestQueries, PipelineQueries, PreprocessQueries, Relational, Scoring, SketchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names are grouped by module:
  *   q01..q20            relational surface      (operators.Relational)
  *   q21..q24, ae_score  scoring + ETL pipeline  (operators.Scoring)
  *   q25..q31, neardup_*, ann_lsh  corpus ops    (operators.Corpus)
  *   q32..q34, mm_*      multimodal + registry + stream-batch
  *                                         (operators.PipelineQueries)
  * Every oracle-checked query has identical output column names and an
  * identical deterministic ORDER BY on both the Spark and DuckDB side;
  * queries without an oracleSql entry are rows-only checked.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Broadcast-join chain orders→customer→nation→region + grouped agg. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q04_join_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Scoring.queries ++ Corpus.queries ++
      PipelineQueries.queries ++ IngestQueries.queries ++
      PreprocessQueries.queries ++ SketchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Scoring.oracleSql ++ Corpus.oracleSql ++
      PipelineQueries.oracleSql ++ IngestQueries.oracleSql ++
      PreprocessQueries.oracleSql ++ SketchQueries.oracleSql
}
