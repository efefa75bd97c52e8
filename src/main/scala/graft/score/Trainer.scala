package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import Autoencoder.Weights

/** Distributed autoencoder training (U8) — the one reference capability
  * round 1 left as a fixture. The reference trains driver-side with
  * Keras (`model.fit(X, X)`, scripts/train_autoencoder.py:171-196); here
  * the forward/backward pass runs on the EXECUTORS and only the
  * gradient vector (a few hundred KB) is reduced to the driver:
  *
  *   per epoch: broadcast weights → treeAggregate per-partition
  *   accumulated gradients + loss → driver applies one full-batch
  *   gradient step.
  *
  * That is the textbook data-parallel layout: compute scales with
  * executor count, driver traffic is O(model), not O(data) — at 100 TB
  * the reference's toPandas() collapse is impossible, this isn't.
  *
  * Numerics: relu hidden layers, linear output, per-row loss =
  * mean((recon - x)^2) — exactly Autoencoder.forward/mse, verified by a
  * finite-difference gradient check in TrainerSpec. Gradient summation
  * order follows partitioning, so training is deterministic for a fixed
  * partitioning (and approximately so across partitionings).
  */
object Trainer {

  /** Mutable per-partition gradient accumulator (ws/bs shaped like the
    * model, plus summed loss and row count). */
  final class GradAcc(dims: Seq[Int]) extends Serializable {
    val ws: Array[Array[Array[Double]]] =
      dims.sliding(2).map { case Seq(nin, nout) =>
        Array.fill(nout, nin)(0.0)
      }.toArray
    val bs: Array[Array[Double]] =
      dims.sliding(2).map { case Seq(_, nout) => new Array[Double](nout) }
        .toArray
    var loss: Double = 0.0
    var n: Long = 0L

    def merge(o: GradAcc): GradAcc = {
      var l = 0
      while (l < ws.length) {
        var i = 0
        while (i < ws(l).length) {
          val a = ws(l)(i); val b = o.ws(l)(i)
          var j = 0
          while (j < a.length) { a(j) += b(j); j += 1 }
          bs(l)(i) += o.bs(l)(i)
          i += 1
        }
        l += 1
      }
      loss += o.loss
      n += o.n
      this
    }
  }

  /** Accumulate one sample's backprop gradients into `acc`. */
  private[score] def accumulate(w: Weights, x0: Array[Double],
                                acc: GradAcc): Unit = {
    val nLayers = w.ws.length
    val x = Autoencoder.align(x0, w.inputDim)
    // forward, caching activations (a(0)=input, a(l+1)=layer l output)
    val a = new Array[Array[Double]](nLayers + 1)
    a(0) = x
    var l = 0
    while (l < nLayers) {
      val W = w.ws(l); val b = w.bs(l)
      val out = new Array[Double](W.length)
      var i = 0
      while (i < W.length) {
        val row = W(i)
        var s = b(i)
        var j = 0
        while (j < row.length) { s += row(j) * a(l)(j); j += 1 }
        out(i) = if (l < nLayers - 1 && s < 0.0) 0.0 else s
        i += 1
      }
      a(l + 1) = out
      l += 1
    }
    // loss + output delta: L = mean((aL - x)^2), dL/daL = 2(aL - x)/nOut
    val aL = a(nLayers)
    val nOut = aL.length
    var delta = new Array[Double](nOut)
    var sampleLoss = 0.0
    var i = 0
    while (i < nOut) {
      val d = aL(i) - x(i)
      sampleLoss += d * d
      delta(i) = 2.0 * d / nOut
      i += 1
    }
    acc.loss += sampleLoss / nOut
    acc.n += 1
    // backward: dW_l = delta ⊗ a(l), db_l = delta;
    // delta_{l-1} = (W_l^T delta) ⊙ relu'(z_{l-1}) with relu'(z)=1[a>0]
    l = nLayers - 1
    while (l >= 0) {
      val W = w.ws(l)
      val aIn = a(l)
      val gW = acc.ws(l); val gB = acc.bs(l)
      i = 0
      while (i < W.length) {
        val di = delta(i)
        val g = gW(i)
        var j = 0
        while (j < aIn.length) { g(j) += di * aIn(j); j += 1 }
        gB(i) += di
        i += 1
      }
      if (l > 0) {
        val prev = new Array[Double](aIn.length)
        var j = 0
        while (j < aIn.length) {
          if (aIn(j) > 0.0) { // relu gate (a(l) output of a relu layer)
            var s = 0.0
            i = 0
            while (i < W.length) { s += W(i)(j) * delta(i); i += 1 }
            prev(j) = s
          }
          j += 1
        }
        delta = prev
      }
      l -= 1
    }
  }

  /** One full-batch epoch: broadcast weights, reduce gradients, return
    * (updated weights, mean loss). */
  def epoch(df: DataFrame, vecCol: String, w: Weights, lr: Double)
      : (Weights, Double) = {
    val spark = df.sparkSession
    val dims = w.layerSizes
    val bc = spark.sparkContext.broadcast(w)
    val rdd = df.select(col(vecCol).cast("array<double>"))
      .rdd.map(_.getSeq[Double](0).toArray)
    val acc = rdd.treeAggregate(new GradAcc(dims))(
      seqOp = (g, x) => { accumulate(bc.value, x, g); g },
      combOp = (g1, g2) => g1.merge(g2))
    bc.destroy()
    require(acc.n > 0, "cannot train on an empty dataset")
    val inv = lr / acc.n
    val ws = w.ws.zip(acc.ws).map { case (lw, gw) =>
      lw.zip(gw).map { case (row, grow) =>
        val out = new Array[Double](row.length)
        var j = 0
        while (j < row.length) { out(j) = row(j) - inv * grow(j); j += 1 }
        out
      }
    }
    val bs = w.bs.zip(acc.bs).map { case (lb, gb) =>
      val out = new Array[Double](lb.length)
      var i = 0
      while (i < lb.length) { out(i) = lb(i) - inv * gb(i); i += 1 }
      out
    }
    (Weights(ws, bs), acc.loss / acc.n)
  }

  /** Full training run: seeded init (the same fixture initialization as
    * the scorer), `epochs` full-batch steps. Returns the final weights
    * and the per-epoch loss curve (loss BEFORE each step, like Keras's
    * per-epoch training loss). */
  def train(df: DataFrame, vecCol: String,
            dims: Seq[Int] = Seq(64, 64, 16, 64, 64),
            epochs: Int = 10, lr: Double = 0.01,
            seed: Long = 42L): (Weights, Seq[Double]) = {
    var w = Autoencoder.seededWeights(dims, seed)
    val losses = Seq.newBuilder[Double]
    var e = 0
    while (e < epochs) {
      val (w2, loss) = epoch(df, vecCol, w, lr)
      losses += loss
      w = w2
      e += 1
    }
    (w, losses.result())
  }
}
