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

  test("the ae_score_cert fixture's forward pass is EXACT in IEEE " +
    "doubles: the double path equals an arbitrary-precision replay " +
    "bit for bit") {
    // the cert fixture's closed form (operators.Corpus.aeFixtureWeights
    // / aeCertInputSql): 4→4→2→4→4, every parameter a multiple of 1/8,
    // inputs multiples of 1/8 — every intermediate is a dyadic rational
    // with denominator ≤ 2^32 and small magnitude, so double arithmetic
    // is exact and association order cannot matter (the property the
    // unrolled DuckDB oracle relies on)
    val dims = Seq(4, 4, 2, 4, 4)
    val layers = dims.sliding(2).toArray
    val ws = layers.zipWithIndex.map { case (Seq(nin, nout), l) =>
      Array.tabulate(nout, nin)((i, j) =>
        (((l + 2) * (i + 1) + 3 * j + (i + 1) * j) % 9 - 4) / 8.0)
    }
    val bs = layers.zipWithIndex.map { case (Seq(_, nout), l) =>
      Array.tabulate(nout)(i => ((l + 2 * i) % 5 - 2) / 8.0)
    }
    val w = Autoencoder.Weights(ws, bs)

    // exact replay in BigInt dyadic arithmetic: every value is
    // numerator / 2^exp, with weights and inputs at exp 3 (/8), so
    // each layer adds 3 to the exponent and nothing ever rounds
    def wNum(l: Int, i: Int, j: Int): Long =
      ((l + 2) * (i + 1) + 3 * j + (i + 1) * j) % 9 - 4
    def bNum(l: Int, i: Int): Long = (l + 2 * i) % 5 - 2
    def exactMse(xNum: Array[BigInt]): (BigInt, Int) = {
      var cur = xNum // value = cur / 2^e
      var e = 3
      for (l <- ws.indices) {
        cur = Array.tabulate(ws(l).length) { i =>
          val s = cur.indices.map(j => BigInt(wNum(l, i, j)) * cur(j)).sum +
            (BigInt(bNum(l, i)) << e)
          if (l < ws.length - 1 && s < 0) BigInt(0) else s
        }
        e += 3
      }
      val num = cur.zip(xNum.map(_ << (e - 3)))
        .map { case (y, x) => (y - x) * (y - x) }.sum
      (num, 2 * e + 2) // the /4 of the mean
    }

    var reluClipped = false
    for (docId <- 0L until 300L) {
      val xNum = Array.tabulate(4)(j =>
        BigInt((docId * (2 * j + 3) + j) % 17 - 8))
      val x = xNum.map(_.toDouble / 8.0)
      val mse = Autoencoder.mse(Autoencoder.forward(w, x), x)
      val (num, exp) = exactMse(xNum)
      assert(num.isValidLong && num.toLong.toDouble.toLong == num.toLong,
        "exact numerator must be double-representable")
      val exact = num.toDouble / math.pow(2.0, exp.toDouble)
      assert(java.lang.Double.doubleToLongBits(mse) ===
        java.lang.Double.doubleToLongBits(exact),
        s"doc_id=$docId: double $mse != exact $exact (num=$num exp=$exp)")
      // the digest arithmetic of the cert is exact too: exp = 32, so
      // mse * 2^32 IS the integer numerator
      assert(exp === 32 &&
        math.floor(mse * 4294967296.0) === num.toDouble,
        s"doc_id=$docId digest")
      // confirm the relu branch actually clips somewhere in the range
      val h1 = Array.tabulate(4) { i =>
        ws(0)(i).indices.map(j => ws(0)(i)(j) * x(j)).sum + bs(0)(i)
      }
      if (h1.exists(_ < 0)) reluClipped = true
    }
    assert(reluClipped,
      "fixture must exercise the relu clip, or the cert would not " +
        "cover the nonlinearity")
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
