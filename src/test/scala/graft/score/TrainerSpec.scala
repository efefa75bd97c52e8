package graft.score

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backprop gradients match finite differences") {
    val dims = Seq(3, 3, 2, 3, 3)
    val w = Autoencoder.seededWeights(dims, seed = 5L)
    val xs = Seq(
      Array(0.2, -0.4, 0.7),
      Array(-0.1, 0.3, 0.5),
      Array(0.9, 0.0, -0.6))
    def totalLoss(wt: Autoencoder.Weights): Double =
      xs.map(x => Autoencoder.mse(Autoencoder.forward(wt, x), x)).sum
    val acc = new Trainer.GradAcc(dims)
    xs.foreach(x => Trainer.accumulate(w, x, acc))
    assert(math.abs(acc.loss - totalLoss(w)) < 1e-12)
    assert(acc.n === 3L)
    val eps = 1e-6
    def perturbed(l: Int, i: Int, j: Int, d: Double): Autoencoder.Weights = {
      val ws = w.ws.map(_.map(_.clone()))
      ws(l)(i)(j) += d
      Autoencoder.Weights(ws, w.bs)
    }
    def perturbedB(l: Int, i: Int, d: Double): Autoencoder.Weights = {
      val bs = w.bs.map(_.clone())
      bs(l)(i) += d
      Autoencoder.Weights(w.ws, bs)
    }
    for (l <- w.ws.indices; i <- w.ws(l).indices; j <- w.ws(l)(i).indices) {
      val num = (totalLoss(perturbed(l, i, j, eps)) -
        totalLoss(perturbed(l, i, j, -eps))) / (2 * eps)
      assert(math.abs(num - acc.ws(l)(i)(j)) < 1e-5,
        s"dW($l)($i)($j): numeric $num vs analytic ${acc.ws(l)(i)(j)}")
    }
    for (l <- w.bs.indices; i <- w.bs(l).indices) {
      val num = (totalLoss(perturbedB(l, i, eps)) -
        totalLoss(perturbedB(l, i, -eps))) / (2 * eps)
      assert(math.abs(num - acc.bs(l)(i)) < 1e-5,
        s"db($l)($i): numeric $num vs analytic ${acc.bs(l)(i)}")
    }
  }

  test("distributed training reduces reconstruction loss") {
    // correlated synthetic rows with a positive mean so the relu layers
    // start in their active regime (zero-mean data + zero biases leaves
    // half the units dead at init and full-batch GD plateaus)
    val rnd = new java.util.Random(11L)
    val data = Seq.fill(300) {
      val t = 0.3 * rnd.nextGaussian()
      Array(1.0 + t, 1.0 + 0.5 * t, 1.0 - t, 1.0 + 0.25 * t)
    }
    val df = data.map(Tuple1(_)).toDF("vec").repartition(4)
    val (trained, losses) =
      Trainer.train(df, "vec", dims = Seq(4, 4, 2, 4, 4),
        epochs = 80, lr = 0.5, seed = 3L)
    assert(losses.length === 80)
    assert(losses.last < losses.head * 0.5,
      s"loss should at least halve: ${losses.head} -> ${losses.last}")
    // trained weights reconstruct better than the init
    val init = Autoencoder.seededWeights(Seq(4, 4, 2, 4, 4), 3L)
    val sample = data.take(50)
    def meanMse(w: Autoencoder.Weights) =
      sample.map(x => Autoencoder.mse(Autoencoder.forward(w, x), x)).sum / 50
    assert(meanMse(trained) < meanMse(init))
  }

  test("training is deterministic for a fixed partitioning") {
    val df = (1 to 100).map(i => Tuple1(Array(i * 0.01, -i * 0.01)))
      .toDF("vec").repartition(2)
    val (w1, l1) = Trainer.train(df, "vec", Seq(2, 2, 2), 3, 0.01, 1L)
    val (w2, l2) = Trainer.train(df, "vec", Seq(2, 2, 2), 3, 0.01, 1L)
    assert(l1 === l2)
    assert(w1.ws.flatten.flatten.toSeq === w2.ws.flatten.flatten.toSeq)
  }
}
