package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Attack-label normalization with the same truth table as the
  * reference's label mapper (reference scripts/preprocess_cicids2017.py:38-63,
  * registered as a Python UDF at :170,188).
  *
  * Expressed as a native `when/contains` Column chain instead of a UDF:
  * the chain stays inside whole-stage codegen (a UDF would force
  * serialization of every row out of Tungsten format), and it remains
  * ANSI-SQL expressible so the DuckDB oracle can check it. Branch order
  * matters and is preserved: ddos before dos, brute before web-attack.
  */
object Labels {
  def mapLabel(c: Column): Column = {
    val s = lower(trim(c))
    when(c.isNull, lit("Other"))
      .when(s === "benign", lit("BENIGN"))
      .when(s.contains("ddos"), lit("DDoS"))
      .when(
        s.contains("dos") || s.contains("hulk") || s.contains("goldeneye") ||
          s.contains("slowloris") || s.contains("slowhttptest") ||
          s.contains("distributed"), lit("DoS"))
      .when(s.contains("portscan") || s.contains("port scan"), lit("PortScan"))
      .when(s.contains("bot"), lit("Bot"))
      .when(
        s.contains("patator") || s.contains("brute"), lit("BruteForce"))
      .when(
        s.contains("web attack") || s.contains("xss") || s.contains("sql") ||
          s.contains("injection"), lit("WebAttack"))
      .otherwise(c)
  }

  /** The same chain as ANSI SQL (for oracle parity checks). `col` must be
    * a column reference or SQL expression string. */
  def mapLabelSql(col: String): String = {
    val s = s"lower(trim($col))"
    s"""CASE
       | WHEN $col IS NULL THEN 'Other'
       | WHEN $s = 'benign' THEN 'BENIGN'
       | WHEN $s LIKE '%ddos%' THEN 'DDoS'
       | WHEN $s LIKE '%dos%' OR $s LIKE '%hulk%' OR $s LIKE '%goldeneye%'
       |   OR $s LIKE '%slowloris%' OR $s LIKE '%slowhttptest%'
       |   OR $s LIKE '%distributed%' THEN 'DoS'
       | WHEN $s LIKE '%portscan%' OR $s LIKE '%port scan%' THEN 'PortScan'
       | WHEN $s LIKE '%bot%' THEN 'Bot'
       | WHEN $s LIKE '%patator%' OR $s LIKE '%brute%' THEN 'BruteForce'
       | WHEN $s LIKE '%web attack%' OR $s LIKE '%xss%' OR $s LIKE '%sql%'
       |   OR $s LIKE '%injection%' THEN 'WebAttack'
       | ELSE $col END""".stripMargin.replaceAll("\\s+", " ").trim
  }
}
