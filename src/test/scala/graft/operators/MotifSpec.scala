package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MotifSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** n events inside bucket `b` (60-s buckets from epoch 0). */
  private def bucketEvents(b: Long, n: Int): Seq[Timestamp] =
    (0 until n).map(i => new Timestamp((b * 60 + (i % 60)) * 1000L))

  test("a planted spike is the top window, correlation exactly 1") {
    // series over buckets 0..9: 1,1,3,9,3,1,1,1,1,1 — the 1..5 window
    // (1,3,9,3,1) is an exact affine match of pattern (0,2,8,2,0)
    val counts = Seq(1, 1, 3, 9, 3, 1, 1, 1, 1, 1)
    val events = counts.zipWithIndex
      .flatMap { case (n, b) => bucketEvents(b.toLong, n) }
      .toDF("ts")
    val got = Motif.topKWindows(events, "ts", bucketSec = 60,
        pattern = Seq(0L, 2L, 8L, 2L, 0L), k = 3)
      .collect()
    assert(got.head.getTimestamp(0).getTime === 1 * 60 * 1000L,
      s"spike window must rank first: ${got.toSeq}")
    assert(got.head.getLong(1) === 10000L,
      "affine match of the pattern is correlation 1 exactly")
    assert(got.head.getLong(2) === 17L)
    assert(got.tail.forall(_.getLong(1) < 10000L))
  }

  test("gap buckets count zero: a spike beside silence still windows") {
    // only buckets 0 and 3 have events; windows spanning 1, 2 read 0
    val events = (bucketEvents(0L, 2) ++ bucketEvents(3L, 6)).toDF("ts")
    val got = Motif.topKWindows(events, "ts", bucketSec = 60,
        pattern = Seq(0L, 10L), k = 5)
      .collect()
    // pairs: (2,0),(0,0 excluded flat),(0,6): the (0→6) step at bucket
    // 2 matches the rising pattern best
    assert(got.head.getTimestamp(0).getTime === 2 * 60 * 1000L,
      s"got ${got.toSeq}")
    assert(got.head.getLong(1) === 10000L)
  }

  test("flat windows are excluded; constant pattern refused") {
    val events = bucketEvents(0L, 2).toDF("ts")
    assert(Motif.topKWindows(events, "ts", 60, Seq(1L, 5L), 5)
      .count() === 0L, "single flat window cannot correlate")
    intercept[IllegalArgumentException] {
      Motif.topKWindows(events, "ts", 60, Seq(3L, 3L, 3L), 5)
    }
    intercept[IllegalArgumentException] {
      Motif.topKWindows(events, "ts", 60, Seq(1L), 5)
    }
  }

  test("chunked scan == whole-series scan, and the plan has no " +
    "single-partition Window") {
    // 40 buckets of varied counts; chunkBuckets=7 forces 6 chunks with
    // windows straddling every boundary; chunkBuckets=1 degenerates to
    // L=w; the huge setting puts the whole series in one chunk
    val rnd = new scala.util.Random(7)
    val counts = Seq.fill(40)(1 + rnd.nextInt(9))
    val events = counts.zipWithIndex
      .flatMap { case (n, b) => bucketEvents(b.toLong, n) }
      .toDF("ts")
    val pattern = Seq(0L, 3L, 9L, 3L, 0L)
    def run(chunk: Int) = Motif.topKWindows(events, "ts", 60, pattern,
        k = 40, chunkBuckets = chunk)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1),
        r.getLong(2))).toSeq
    val whole = run(1 << 20)
    assert(run(7) === whole, "chunk boundary windows diverged")
    assert(run(1) === whole, "minimum chunk length diverged")
    // plan pin: every Window node partitions by the chunk key (the
    // logical plan — AQE lazily materializes the physical one)
    val plan = Motif.topKWindows(events, "ts", 60, pattern, 5)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"found a single-partition Window:\n$plan")
  }

  test("anti-correlated window ranks last with r = -1") {
    val counts = Seq(5, 1, 5, 9, 5, 9)
    val events = counts.zipWithIndex
      .flatMap { case (n, b) => bucketEvents(b.toLong, n) }
      .toDF("ts")
    val got = Motif.topKWindows(events, "ts", 60,
        pattern = Seq(2L, 8L, 2L), k = 10)
      .collect().map(r => r.getTimestamp(0).getTime / 60000L ->
        r.getLong(1)).toMap
    // window at bucket 1: (1,5,9) monotone ≠ spike; window at 0:
    // (5,1,5) is the exact NEGATIVE of the spike shape → -1
    assert(got(0L) === -10000L, s"got $got")
  }
}
