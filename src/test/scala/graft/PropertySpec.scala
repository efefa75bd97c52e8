package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Naming
import graft.score.Autoencoder

/** Property-based invariants (SURVEY.md §5 item 3): driver-side pure
  * functions checked over generated inputs rather than fixtures. Uses
  * scalacheck Gen directly with a fixed seed walk (the scalatestplus
  * bridge isn't on the classpath), so failures are reproducible.
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }


  private val rawName: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '/', '-', '_', '.',
      'é', '#'))).map(_.mkString)

  test("sanitizeName always yields a legal identifier") {
    forAll(rawName) { raw =>
      val s = Naming.sanitizeName(raw)
      assert(s.matches("[A-Za-z_][0-9A-Za-z_]*"), s"'$raw' -> '$s'")
    }
  }

  test("sanitizeAll is always collision-free and order-preserving") {
    forAll(Gen.listOfN(30, rawName)) { names =>
      val out = Naming.sanitizeAll(names)
      assert(out.length === names.length)
      assert(out.distinct.length === out.length, s"collision in $out")
    }
  }

  test("align always returns exactly n elements, prefix-preserving") {
    forAll(Gen.zip(Gen.listOf(Gen.chooseNum(-1e6, 1e6)),
        Gen.chooseNum(1, 128))) { case (xs, n) =>
      val a = Autoencoder.align(xs.toArray, n)
      assert(a.length === n)
      val keep = math.min(xs.length, n)
      assert(a.take(keep).toSeq === xs.take(keep))
      assert(a.drop(keep).forall(_ == 0.0))
    }
  }

  test("mse is non-negative and zero iff vectors equal") {
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1e3, 1e3))) { xs =>
      val v = xs.toArray
      assert(Autoencoder.mse(v, v) === 0.0)
      val shifted = v.map(_ + 1.0)
      assert(Autoencoder.mse(v, shifted) > 0.0)
    }
  }

  test("confidence = 1/(1+mse) lies in (0, 1] for mse >= 0") {
    forAll(Gen.chooseNum(0.0, 1e12)) { mse =>
      val c = 1.0 / (1.0 + mse)
      assert(c > 0.0 && c <= 1.0)
    }
  }

  test("winnow fingerprints are invariant to whitespace normalization") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAll(Gen.nonEmptyListOf(word)) { ws =>
      val a = ws.mkString(" ")
      val b = ws.mkString("  ") + " "
      assert(graft.functions.Hashing.winnow(a).toSeq ===
        graft.functions.Hashing.winnow(b).toSeq)
    }
  }

  test("simhash of a permuted token array is identical (order-free votes)") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAll(Gen.nonEmptyListOf(word)) { ws =>
      val a = graft.functions.Hashing.simhash64(ws.toArray)
      val b = graft.functions.Hashing.simhash64(ws.reverse.toArray)
      assert(a === b)
    }
  }

  // ---- Column-expression invariants, checked over one generated batch
  // (each property is a single Spark job, not one per case) ----

  test("normalize is idempotent, lowercase, and single-spaced") {
    val spark = TestSpark.spark
    import spark.implicits._
    val messy = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', '!', '?', ',', '.',
        ';', '#', '$', '_', '-'))).map(_.mkString)
    val inputs = Seq.newBuilder[String]
    forAll(messy, n = 150)(inputs += _)
    val df = inputs.result().toDF("text")
    val rows = df.select(
      graft.functions.TextFunctions.normalize($"text").as("n1"),
      graft.functions.TextFunctions.normalize(
        graft.functions.TextFunctions.normalize($"text")).as("n2"))
      .collect()
    rows.foreach { r =>
      val n1 = r.getString(0)
      assert(n1 === r.getString(1), "idempotence")
      assert(n1 === n1.toLowerCase)
      assert(!n1.contains("  ") && n1.trim == n1)
    }
  }

  test("chunk grid tiles every document exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val size = 32
    val stride = 24
    val docs = (0 until 120).map { i =>
      val n = i % 101 // token counts 0..100
      (i.toLong, (0 until n).map(t => s"t$t").mkString(" "))
    }.toDF("doc_id", "text")
    val byDoc = graft.operators.Chunk
      .byTokens(docs, "doc_id", "text", size, stride)
      .collect()
      .groupBy(_.getLong(0))
    (0 until 120).foreach { i =>
      val n = i % 101
      val chunks = byDoc.getOrElse(i.toLong, Array.empty)
        .sortBy(_.getAs[Long]("chunk_idx"))
      if (n == 0) assert(chunks.isEmpty, "blank doc yields no chunks")
      else {
        val expect = math.ceil(n.toDouble / stride).toInt
        assert(chunks.length === expect, s"doc of $n tokens")
        assert(chunks.forall { c =>
          val t = c.getAs[Int]("n_tokens"); t >= 1 && t <= size
        })
        // the final chunk reaches exactly the end of the document
        val last = chunks.last
        assert(last.getAs[Long]("chunk_idx").toInt * stride +
          last.getAs[Int]("n_tokens") === n, s"coverage of $n tokens")
      }
    }
  }
}
