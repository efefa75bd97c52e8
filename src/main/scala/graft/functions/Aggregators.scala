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
    *
    * Buffer is a pair of primitive arrays (v desc, id asc order, `n`
    * filled) mutated IN PLACE: ScalaAggregator keeps the buffer as a
    * live object through ObjectHashAggregateExec and only runs the
    * buffer encoder at the partial→final shuffle boundary, so the
    * per-row reduce path allocates nothing (the round-13→14 bisect
    * measured the previous immutable-Vector span/++/take insert as the
    * dominant per-row cost). Insertion shifts ≤ k elements — constant
    * for the small k this is meant for. */
  final case class TopKBuf(var n: Int, vs: Array[Double], ids: Array[Long])

  def topK(k: Int): Aggregator[Ranked, TopKBuf, Seq[Ranked]] = {
    require(k > 0, s"topK needs k > 0, got $k")
    new Aggregator[Ranked, TopKBuf, Seq[Ranked]] {
      // rank order: v desc, id asc — true when (v, id) outranks slot i
      private def beats(b: TopKBuf, i: Int, v: Double, id: Long): Boolean =
        v > b.vs(i) || (v == b.vs(i) && id < b.ids(i))
      private def insert(b: TopKBuf, v: Double, id: Long): TopKBuf = {
        if (b.n >= k && !beats(b, k - 1, v, id)) b
        else {
          var i = if (b.n < k) b.n else k - 1
          while (i > 0 && beats(b, i - 1, v, id)) {
            b.vs(i) = b.vs(i - 1); b.ids(i) = b.ids(i - 1); i -= 1
          }
          b.vs(i) = v; b.ids(i) = id
          if (b.n < k) b.n += 1
          b
        }
      }
      def zero: TopKBuf = TopKBuf(0, new Array[Double](k), new Array[Long](k))
      def reduce(b: TopKBuf, x: Ranked): TopKBuf = insert(b, x.v, x.id)
      def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
        var i = 0
        var acc = a
        while (i < b.n) { acc = insert(acc, b.vs(i), b.ids(i)); i += 1 }
        acc
      }
      def finish(r: TopKBuf): Seq[Ranked] =
        (0 until r.n).map(i => Ranked(r.vs(i), r.ids(i)))
      def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
      def outputEncoder: Encoder[Seq[Ranked]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }
}
