package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure tests for [[Bench.segmentFactors]] — the interleaved-calib
  * normalization that kills the r13 false-alarm class (machine drifts
  * mid-run, endpoint-only calibration misreads the drifted segment's
  * queries as regressions). No Spark session needed: the interpolation
  * and clamping are pure arithmetic.
  */
class BenchCalibSpec extends AnyFunSuite {

  test("flat calib at the reference gives factor 1 everywhere") {
    val f = Bench.segmentFactors(Seq((0, 0.30), (50, 0.30)), 50)
    assert(f.length === 50)
    assert(f.forall(x => math.abs(x - 1.0) < 1e-12))
  }

  test("a deliberately-throttled mid-run segment is normalized, no false breach") {
    // the r13 shape: calib 0.30 at start, 0.45 by query 25, back to 0.30
    // by query 50 — queries in the throttled window ran up to 1.5× slow
    val probes = Seq((0, 0.30), (25, 0.45), (50, 0.30))
    val n = 50
    val factors = Bench.segmentFactors(probes, n)
    val budgets = Array.fill(n)(1.0) // 1 s baseline each, 2× bar
    // simulate honest queries whose true cost equals baseline but ran
    // under the interpolated machine drift (cost × local calib ratio)
    val observed = (0 until n).map { i =>
      val drift = {
        val c = if (i <= 25) 0.30 + (0.45 - 0.30) * i / 25.0
        else 0.45 - (0.45 - 0.30) * (i - 25) / 25.0
        c / 0.30
      }
      budgets(i) * drift * 1.4 // 1.4× of budget raw — breaches a raw 2×? no;
      // use a tight 1.5× bar below to make the un-normalized case breach
    }
    val bar = 1.5
    val rawBreaches = (0 until n).count(i => observed(i) > bar * budgets(i))
    val normBreaches = (0 until n).count(i =>
      observed(i) > bar * budgets(i) * factors(i))
    assert(rawBreaches > 0, "the synthetic drift must breach the raw bar")
    assert(normBreaches === 0,
      s"per-segment normalization must absorb pure machine drift, got $normBreaches")
  }

  test("factors clamp to [1, 3]: fast machines never loosen, degraded hosts cap") {
    val f = Bench.segmentFactors(Seq((0, 0.10), (10, 3.00)), 11)
    assert(f.head === 1.0)
    assert(f.last === 3.0)
    assert(f.forall(x => x >= 1.0 && x <= 3.0))
  }

  test("single-probe series extends constant; empty throws") {
    val f = Bench.segmentFactors(Seq((0, 0.60)), 5)
    assert(f.forall(x => math.abs(x - 2.0) < 1e-12))
    intercept[IllegalArgumentException](Bench.segmentFactors(Nil, 5))
  }
}
