package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q294's two moment spaces must agree where both are valid. The exact
  * branch sums int64 twice-average-rank products (bit-matched by the
  * driver oracle, overflows past ~1.3e6 rows); the production branch
  * normalizes ranks to (0,1] doubles first. Spearman rho is invariant
  * under positive scaling of the ranks, so in the overlap regime the
  * only divergence is double rounding in the moment sums — pinned here
  * to 1e-12. The registered query picks the branch by row count; this
  * spec forces both on the same input.
  */
class SpearmanBranchSpec extends AnyFunSuite with SparkTestBase {

  test("exact-int64 and normalized-double branches agree to 1e-12") {
    def collectRho(forceNormalized: Boolean): Map[String, (Long, Double)] =
      Relational.spearman(spark, sfDir, forceNormalized = forceNormalized)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap

    val exact = collectRho(forceNormalized = false)
    val norm = collectRho(forceNormalized = true)
    assert(exact.keySet == norm.keySet)
    assert(exact.nonEmpty)
    exact.foreach { case (pair, (n, rhoExact)) =>
      val (nNorm, rhoNorm) = norm(pair)
      assert(n == nNorm, s"$pair row counts diverge")
      assert(math.abs(rhoExact - rhoNorm) < 1e-12,
        s"$pair: exact=$rhoExact normalized=$rhoNorm")
    }
    // the regime sanity the query documents: price vs netprice is the
    // strongly-monotone pair, the generator's independent columns hover
    // near zero
    assert(exact("price_netprice")._2 > 0.9)
    assert(math.abs(exact("quantity_discount")._2) < 0.2)
  }
}
