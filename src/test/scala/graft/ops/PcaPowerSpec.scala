package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the exact-integer power iteration behind
  * `embed_pca_power`: on an anisotropic dataset it recovers the
  * dominant principal direction (the oracle certifies cross-engine
  * equality; this certifies the math means what it claims).
  */
class PcaPowerSpec extends AnyFunSuite {

  /** Gram matrix of quantized synthetic vectors stretched along
    * `axis`: x = spread * e_axis * s + small noise on other dims.
    */
  private def gram(dim: Int, axis: Int, n: Int): Map[(Int, Int), Long] = {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(n) {
      val v = Array.fill(dim)((rnd.nextDouble() - 0.5) * 0.2)
      v(axis) += (if (rnd.nextBoolean()) 1.0 else -1.0) * (2.0 + rnd.nextDouble())
      v.map(x => math.floor(x * 10000 + 0.5).toLong)
    }
    (for (i <- 0 until dim; j <- 0 until dim) yield
      (i, j) -> rows.map(r => r(i) * r(j)).sum).toMap
  }

  test("power iteration concentrates on the dominant axis") {
    val dim = 16
    val axis = 5
    val w = QualityQueries.powerIterate(gram(dim, axis, 200), dim, 4)
    val norms = w.map(x => x.toDouble)
    val total = math.sqrt(norms.map(x => x * x).sum)
    val share = math.abs(norms(axis)) / total
    assert(share > 0.95, s"dominant-axis share $share; w=${w.toSeq}")
  }

  test("iteration is invariant to the sign flip of the start direction symmetry") {
    // two different anisotropic axes give orthogonal answers
    val dim = 8
    val w1 = QualityQueries.powerIterate(gram(dim, 2, 150), dim, 4)
    val w2 = QualityQueries.powerIterate(gram(dim, 6, 150), dim, 4)
    def unit(w: Array[BigInt]): Array[Double] = {
      val d = w.map(_.toDouble); val n = math.sqrt(d.map(x => x * x).sum)
      d.map(_ / n)
    }
    val dot = unit(w1).zip(unit(w2)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.2, s"expected near-orthogonal components, dot=$dot")
  }
}
