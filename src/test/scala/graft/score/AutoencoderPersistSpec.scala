package graft.score

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.ModelRegistry

class AutoencoderPersistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("save/load round-trips weights bit-identically") {
    val w = Autoencoder.seededWeights(Seq(8, 8, 3, 8, 8), seed = 99L)
    val dir = Files.createTempDirectory("graft_weights").toString + "/w"
    Autoencoder.save(spark, w, dir)
    val loaded = Autoencoder.load(spark, dir)
    assert(loaded.layerSizes === w.layerSizes)
    for (l <- w.ws.indices) {
      assert(loaded.bs(l).toSeq === w.bs(l).toSeq)
      for (r <- w.ws(l).indices)
        assert(loaded.ws(l)(r).toSeq === w.ws(l)(r).toSeq,
          s"layer $l row $r differs")
    }
    // bit-identical scores, not just close
    val xs = Seq.tabulate(5)(i => Array.tabulate(8)(j => (i + j) * 0.1))
    xs.foreach { x =>
      val a = Autoencoder.mse(Autoencoder.forward(w, x), x)
      val b = Autoencoder.mse(Autoencoder.forward(loaded, x), x)
      assert(java.lang.Double.doubleToLongBits(a)
        === java.lang.Double.doubleToLongBits(b))
    }
  }

  test("loadForStage resolves the latest artifact through the registry") {
    val base = Files.createTempDirectory("graft_reg").toString
    val w1 = Autoencoder.seededWeights(Seq(4, 4, 2, 4, 4), seed = 1L)
    val w2 = Autoencoder.seededWeights(Seq(4, 4, 2, 4, 4), seed = 2L)
    Autoencoder.save(spark, w1, s"$base/v1")
    Autoencoder.save(spark, w2, s"$base/v2")
    val reg = ModelRegistry.table(spark, Seq(
      ModelRegistry.ModelVersion("m", 1, "Archived", "2026-01-01", 0.5),
      ModelRegistry.ModelVersion("m", 2, "Production", "2026-02-01", 0.4)))
    val art = ModelRegistry.artifactTable(spark, Seq(
      ModelRegistry.Artifact("m", 1, s"$base/v1"),
      ModelRegistry.Artifact("m", 2, s"$base/v2")))
    val loaded = Autoencoder.loadForStage(spark, reg, art, "m", "Production")
    // version 2's weights, not version 1's
    assert(loaded.ws(0)(0).toSeq === w2.ws(0)(0).toSeq)
    assert(loaded.ws(0)(0).toSeq !== w1.ws(0)(0).toSeq)
    assertThrows[IllegalStateException] {
      Autoencoder.loadForStage(spark, reg, art, "m", "Staging")
    }
  }
}
