package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Labels, Tables}
import graft.etl.Preprocess

/** Query surface for the preprocessing chain (SURVEY.md §2.2/§2.3
  * P6/P11/P12, J2/J3, F4/F5): the deterministic stages are oracle-checked
  * over `events`; the seed-dependent and nondeterministic ops are
  * rows-only queries exercised with fixed seeds.
  */
object PreprocessQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P11+P12 drop → J4 dropDuplicates → P7 sweep → P6 na.drop() →
    // F1 label map → grouped audit, mirroring the reference chain
    // preprocess_cicids2017.py:146-191 over the events fixture.
    "q36_preprocess_audit" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .drop("ts", "event_id")                       // P11 multi-drop
        .drop("props")                                // P12 single drop
        .dropDuplicates()                             // J4
        .withColumn("value",
          when($"value" > 450.0 || $"value" < 0.0, lit(null))
            .otherwise($"value"))                     // P7 sweep
        .na.drop()                                    // P6
        .withColumn("label_class", Labels.mapLabel($"event_type")) // F1
        .groupBy($"label_class")
        .agg(
          count(lit(1)).as("n"),
          sum(floor($"value" * 100)).as("value_c"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"label_class")
    }),

    // --- rows-only (seeded / nondeterministic ops) ---

    // J2 randomSplit + J3 Bernoulli sample with fixed seeds: per-side
    // row accounting. Counts depend on seed+partitioning, so this is
    // rows-only; determinism for a fixed config is asserted in
    // PreprocessSpec.
    "preprocess_split" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_id", $"value")
      val Array(a, b) = Preprocess.seededSplit(ev, Array(0.8, 0.2), 42L)
      val sampled = Preprocess.bernoulliSample(ev, 0.1, 42L)
      Seq(
        ("split_train", a.count()),
        ("split_test", b.count()),
        ("sample_10pct", sampled.count()),
        ("total", ev.count()))
        .toDF("side", "n_rows")
        .orderBy($"side")
    }),

    // F4/F5 demo: uuid() + ISO current_timestamp envelope columns
    // (values nondeterministic by nature — rows-only).
    "ids_demo" -> ((s, d) => {
      import s.implicits._
      Preprocess.withEventMeta(
          Tables.documents(s, d).select($"doc_id").limit(5))
        .select(
          $"doc_id",
          length($"event_id").as("uuid_len"),
          $"event_id".rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
            .as("uuid_shape_ok"),
          ($"created_at".rlike(
            "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{6}$"))
            .as("ts_iso_ok"))
        .orderBy($"doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q36_preprocess_audit" ->
      s"""SELECT ${Labels.mapLabelSql("event_type")} AS label_class,
         | COUNT(*) AS n,
         | CAST(SUM(FLOOR(value*100)) AS BIGINT) AS value_c,
         | COUNT(DISTINCT user_id) AS n_users
         |FROM (SELECT DISTINCT user_id, event_type, value FROM events) t
         |WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |  AND value IS NOT NULL AND NOT (value > 450.0 OR value < 0.0)
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
