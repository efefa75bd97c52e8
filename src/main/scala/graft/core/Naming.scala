package graft.core

import org.apache.spark.sql.DataFrame

/** Column-name sanitation, mirroring the behavior of the reference's
  * header cleaner (reference scripts/preprocess_cicids2017.py:66-78 and
  * the rename loop at :117-144): every run of characters outside
  * [0-9A-Za-z_] becomes a single underscore, consecutive underscores
  * collapse, leading/trailing underscores are stripped, a name starting
  * with a digit is prefixed, and collisions are uniquified with _1, _2..
  * suffixes (first occurrence keeps the bare name).
  *
  * Pure driver-side string work — names, not data — so it is plain Scala
  * applied once via a single `toDF(newNames:_*)` projection rather than a
  * fold of N `withColumnRenamed` plans (each of which would rebuild the
  * logical plan; at wide schemas that is O(n^2) analysis work).
  */
object Naming {
  def sanitizeName(raw: String): String = {
    val collapsed = raw
      .replaceAll("[^0-9A-Za-z_]+", "_")
      .replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
    val base = if (collapsed.isEmpty) "col" else collapsed
    if (base.head.isDigit) "c_" + base else base
  }

  /** Sanitize a full header, uniquifying duplicates in order of first
    * appearance: [a, a, b, a] -> [a, a_1, b, a_2]. Every emitted name is
    * tracked in a used-set and the suffix bumped until free, so inputs
    * like [a, a_1, a] (where the naive per-base counter would emit a_1
    * twice) stay collision-free — the reference keeps the same `used`
    * set in its rename loop (preprocess_cicids2017.py:117-144). */
  def sanitizeAll(raw: Seq[String]): Seq[String] = {
    val used = scala.collection.mutable.Set.empty[String]
    raw.map { r =>
      val s = sanitizeName(r)
      val out =
        if (!used.contains(s)) s
        else {
          var n = 1
          while (used.contains(s"${s}_$n")) n += 1
          s"${s}_$n"
        }
      used += out
      out
    }
  }

  /** Apply sanitation to a DataFrame as one projection. */
  def sanitizeColumns(df: DataFrame): DataFrame =
    df.toDF(sanitizeAll(df.columns.toSeq): _*)

  /** Case/underscore-insensitive resolution used when dropping columns by
    * approximate name (reference scripts/preprocess_cicids2017.py:212-219). */
  def resolve(columns: Seq[String], wanted: String): Option[String] = {
    def key(s: String) = s.toLowerCase.replace("_", "")
    columns.find(c => key(c) == key(wanted))
  }
}
