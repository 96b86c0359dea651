package graft.operators

import graft.SparkSpec

/** Estimator-quality claims the hash gate doesn't cover (it pins the
  * values; these pin that the values are any GOOD). */
class KmvDifferenceSpec extends SparkSpec {

  test("KMV difference estimates land within 5 standard errors of exact") {
    // KMV with K=64 has rsd ~ 1/sqrt(K-2) ~ 0.127 on the union estimate;
    // the difference scales it by the (binomially noisy) sample fraction.
    // A generous 5-sigma envelope still catches estimator bugs (sign
    // errors, off-by-one in the K-th minimum) by orders of magnitude.
    val rows = AdvancedAggs.kmvDifference(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nUnion = r.getLong(2)
      val aExact = r.getLong(3)
      val bExact = r.getLong(4)
      val aEst = r.getLong(5)
      val bEst = r.getLong(6)
      if (nUnion < AdvancedAggs.KmvK) {
        assert(aEst == aExact && bEst == bExact,
          s"sub-K union must be exact: $r")
      } else {
        val se = 0.127 * nUnion
        assert(math.abs(aEst - aExact) <= 5 * se + 1, s"a-only off: $r")
        assert(math.abs(bEst - bExact) <= 5 * se + 1, s"b-only off: $r")
      }
    }
  }

  test("salt advisor: factor covers the hottest key at the target rows-per-task") {
    val rows = Diagnostics.saltAdvisor(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (nRows, nKeys, maxPer) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val skewed = r.getBoolean(5)
      val salt = r.getLong(6)
      assert(skewed == (maxPer * nKeys > 4 * nRows), s"skew flag: $r")
      assert(salt >= 1 && salt <= Diagnostics.SaltMaxFactor)
      if (salt < Diagnostics.SaltMaxFactor)
        assert(salt * Diagnostics.SaltTargetRowsPerTask >= maxPer,
          s"salted hottest key must fit the task budget: $r")
    }
  }
}
