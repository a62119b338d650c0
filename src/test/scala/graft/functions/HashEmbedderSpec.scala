package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HashEmbedderSpec extends AnyFunSuite {

  private val samples = Seq("spark", "join data", "the fast filter",
    "spark join data filter the fast", "a b c d e f g")

  test("deterministic: same text → identical vector") {
    samples.foreach { t =>
      assert(HashEmbedder.embed(t).toSeq == HashEmbedder.embed(t).toSeq)
    }
  }

  test("unit L2 norm for non-empty text") {
    samples.foreach { t =>
      val v = HashEmbedder.embed(t)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"norm $n for '$t'")
    }
  }

  test("dimension is fixed") {
    assert(HashEmbedder.embed("anything").length == HashEmbedder.Dim)
    assert(HashEmbedder.embed("x", dim = 16).length == 16)
  }

  test("case and extra whitespace insensitive") {
    assert(HashEmbedder.embed("Spark  Join").toSeq == HashEmbedder.embed("spark join").toSeq)
  }

  test("different texts differ") {
    assert(HashEmbedder.embed("spark").toSeq != HashEmbedder.embed("duck").toSeq)
  }

  test("batch encode matches single encode") {
    val batch = HashEmbedder.embedBatch(samples.iterator).toSeq
    assert(batch.map(_.toSeq) == samples.map(t => HashEmbedder.embed(t).toSeq))
  }
}
