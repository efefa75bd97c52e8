package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class TokenCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The reference semantics the native expression must replicate. */
  private def splitForm(c: org.apache.spark.sql.Column) =
    size(TextFunctions.tokens(c))

  test("equivalence sweep vs the split form, including the " +
    "leading-tab quirk and unicode") {
    val cases = Seq(
      "", " ", "   ", "\t", "\t\t", "\n", " \t ", "a", " a ", "a b",
      "  a  b  ", "a\tb", "\ta b", " \ta b", "a b\t", "a b \t ",
      "\na b\nc", "wörd ünïcode 日本語 emoji🙂 mix", "日本\t語",
      "ab\fc\rd", "\f", "  ", "one", "one two three",
      "tab\tsep\tvals", "trailing ws   \n")
    val df = cases.toDF("t")
    val rows = df.select(col("t"),
      TextFunctions.tokenCount(col("t")).as("native"),
      splitForm(col("t")).as("split")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"mismatch on ${r.getString(0).replace("\t", "\\t")
          .replace("\n", "\\n")}: native=${r.getInt(1)} " +
          s"split=${r.getInt(2)}")
    }
  }

  test("randomized equivalence: 2000 strings over a whitespace-heavy " +
    "alphabet") {
    val rnd = new java.util.Random(7L)
    val alphabet = "ab \t\n\f\r xyzμλ語 "
    val cases = Seq.fill(2000)(
      Seq.fill(rnd.nextInt(24))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = cases.toDF("t").select(
      TextFunctions.tokenCount(col("t")).as("native"),
      splitForm(col("t")).as("split")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("non-string inputs keep the split form's implicit cast") {
    val got = Seq((123, 4.5)).toDF("i", "d")
      .select(TextFunctions.tokenCount(col("i")),
        TextFunctions.tokenCount(col("d"))).head
    assert(got.getInt(0) === 1 && got.getInt(1) === 1)
  }

  test("null propagates null") {
    val rows = Seq(Option.empty[String], Some("a b")).toDF("t")
      .select(TextFunctions.tokenCount(col("t"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getInt(0) === 2)
  }

  test("registered SQL surface: token_count inside whole-stage codegen") {
    val got = spark.sql(
      "SELECT token_count('the quick  brown\tfox') AS n").head.getInt(0)
    assert(got === 4)
  }
}
