package graft.score

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AutoencoderSpec extends AnyFunSuite {

  // Hand-computed 3→2→3 micro-net (SURVEY.md §5.2): relu hidden, linear out.
  val micro = Autoencoder.Weights(
    ws = Array(
      Array(Array(1.0, 0.0, -1.0), Array(0.5, 0.5, 0.5)),     // W1: 2x3
      Array(Array(1.0, 1.0), Array(-1.0, 0.0), Array(0.0, 2.0)) // W2: 3x2
    ),
    bs = Array(Array(0.0, 1.0), Array(0.5, 0.0, 0.0)))

  test("forward matches hand computation (relu hidden, linear output)") {
    // x = [1, 2, 3]: h = relu([1*1+0*2-1*3, 0.5*6+1]) = relu([-2, 4]) = [0, 4]
    // out = [0+4+0.5, -0+0, 0+8] = [4.5, 0, 8]
    val out = Autoencoder.forward(micro, Array(1.0, 2.0, 3.0))
    assert(out.toSeq == Seq(4.5, 0.0, 8.0))
  }

  test("mse matches hand computation") {
    val x = Array(1.0, 2.0, 3.0)
    val r = Autoencoder.forward(micro, x)
    // diffs: 3.5, -2, 5 -> (12.25 + 4 + 25)/3
    assert(math.abs(Autoencoder.mse(r, x) - 41.25 / 3) < 1e-12)
  }

  test("align trims and zero-pads (declared order, no re-sort)") {
    assert(Autoencoder.align(Array(1.0, 2.0, 3.0), 2).toSeq == Seq(1.0, 2.0))
    assert(Autoencoder.align(Array(1.0), 3).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("seeded weights are deterministic and shaped 64→64→16→64→64") {
    val a = Autoencoder.seededWeights()
    val b = Autoencoder.seededWeights()
    assert(a.layerSizes == Seq(64, 64, 16, 64, 64))
    assert(a.ws.flatten.flatten.toSeq == b.ws.flatten.flatten.toSeq)
  }

  test("scoreVectors runs distributed and yields confidence in (0,1]") {
    val spark = TestSpark.spark
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sf)
    val scored = Autoencoder.scoreVectors(
      emb, "vec_id", "embedding", Autoencoder.seededWeights(), 0.05)
    val rows = scored.collect()
    assert(rows.length == emb.count().toInt)
    rows.foreach { r =>
      val conf = r.getAs[Double]("confidence")
      val score = r.getAs[Double]("anomaly_score")
      assert(conf > 0 && conf <= 1)
      assert(score >= 0)
      val pred = r.getAs[String]("prediction")
      assert(if (score > 0.05) pred == "anomaly" else pred == "normal")
    }
  }

  test("scoring is deterministic across runs") {
    val spark = TestSpark.spark
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sf)
    def run() = Autoencoder.scoreVectors(
      emb, "vec_id", "embedding", Autoencoder.seededWeights(), 0.05)
      .orderBy("vec_id").collect().map(_.getAs[Double]("anomaly_score")).toSeq
    assert(run() == run())
  }
}
