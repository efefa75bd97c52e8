package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Deterministic epoch shuffle: pos is a 1..n permutation of the seeded
  * md5 total order, independent of input partitioning, and distinct
  * seeds give distinct orders. */
class ShuffleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("doc_id")

  private def posMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pos is the md5 total order, 1..n exactly once") {
    val out = Shuffle.deterministicShuffle(ids(100), "doc_id", "s1")
    val got = out.select($"doc_id", $"shuffle_key", $"pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq === (1L to 100L))
    val expected = got.sortBy(t => (t._2, t._1))
      .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    got.foreach { case (id, _, pos) =>
      assert(pos === expected(id), s"doc $id out of md5 order")
    }
  }

  test("positions do not depend on input partitioning or parallelism") {
    val base = posMap(Shuffle.deterministicShuffle(ids(257), "doc_id", "e"))
    val rep = posMap(Shuffle.deterministicShuffle(
      ids(257).repartition(7), "doc_id", "e"))
    val one = posMap(Shuffle.deterministicShuffle(
      ids(257).coalesce(1), "doc_id", "e", numPartitions = 3))
    val wide = posMap(Shuffle.deterministicShuffle(
      ids(257), "doc_id", "e", numPartitions = 64))
    assert(rep === base)
    assert(one === base)
    assert(wide === base, "more partitions than fills must not shift pos")
  }

  test("different seeds produce genuinely different orders") {
    val a = posMap(Shuffle.deterministicShuffle(ids(200), "doc_id", "e0"))
    val b = posMap(Shuffle.deterministicShuffle(ids(200), "doc_id", "e1"))
    val moved = a.count { case (id, p) => b(id) != p }
    assert(moved > 150, s"only $moved of 200 moved between seeds")
  }
}
