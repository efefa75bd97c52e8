package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (SURVEY.md §2.9 U5 — reserved in round 1): a
  * Welford/Chan-style streaming mean+variance aggregator. Buffers merge
  * associatively, so Spark can combine partial aggregates map-side like
  * any built-in — the canonical shape for custom distributed statistics
  * (e.g. the scaler fit as a single reusable aggregate instead of two
  * separate avg/stddev expressions).
  */
object Aggregators {

  /** (count, mean, M2) running-moment buffer. */
  final case class MomentBuf(n: Long, mean: Double, m2: Double)

  /** Output: population mean/variance/std with the zero-std guard the
    * scaler applies (reference preprocess_cicids2017.py:281). */
  final case class Moments(n: Long, mean: Double, varPop: Double,
                           stdGuarded: Double)

  /** Chan et al. parallel-merge update — numerically stable and
    * order-insensitive up to float rounding. */
  val moments: Aggregator[Double, MomentBuf, Moments] =
    new Aggregator[Double, MomentBuf, Moments] {
      def zero: MomentBuf = MomentBuf(0L, 0.0, 0.0)
      def reduce(b: MomentBuf, x: Double): MomentBuf = {
        val n = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n
        MomentBuf(n, mean, b.m2 + d * (x - mean))
      }
      def merge(a: MomentBuf, b: MomentBuf): MomentBuf = {
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          MomentBuf(n,
            a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
        }
      }
      def finish(r: MomentBuf): Moments = {
        val v = if (r.n == 0) 0.0 else r.m2 / r.n
        val sd = math.sqrt(v)
        Moments(r.n, r.mean, v, if (sd == 0.0 || sd.isNaN) 1.0 else sd)
      }
      def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
      def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
    }

  /** One (ordering value, id) candidate for the top-k buffer. */
  final case class Ranked(v: Double, id: Long)

  /** Bounded top-k aggregator: keeps the k largest (v desc, id asc)
    * pairs per group. Because it is an associative Aggregator, Spark
    * runs it PARTIALLY before the shuffle (map-side combine): each task
    * ships at most k rows per group key instead of every row — the
    * scale-safe form of "top-k per key" next to the window-rank form
    * (q09), whose sort must see all rows of a key after the shuffle.
    * Buffer is a sorted vector of ≤ k elements; insertion cost k is
    * constant for the small k this is meant for. */
  final case class TopKBuf(items: Seq[Ranked])

  def topK(k: Int): Aggregator[Ranked, TopKBuf, Seq[Ranked]] = {
    require(k > 0, s"topK needs k > 0, got $k")
    new Aggregator[Ranked, TopKBuf, Seq[Ranked]] {
      private def better(a: Ranked, b: Ranked): Boolean =
        a.v > b.v || (a.v == b.v && a.id < b.id)
      private def insert(items: Seq[Ranked], x: Ranked): Seq[Ranked] =
        if (items.length >= k && better(items.last, x)) items
        else {
          val (pre, post) = items.span(better(_, x))
          (pre ++ (x +: post)).take(k)
        }
      def zero: TopKBuf = TopKBuf(Vector.empty)
      def reduce(b: TopKBuf, x: Ranked): TopKBuf =
        TopKBuf(insert(b.items, x))
      def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
        TopKBuf(b.items.foldLeft(a.items)(insert))
      def finish(r: TopKBuf): Seq[Ranked] = r.items
      def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
      def outputEncoder: Encoder[Seq[Ranked]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }
}
