package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{EpochFeatures, Signal}

/** Property-based invariants over the pure signal kernels (SURVEY §2.9):
  * these hold for EVERY input, not just the golden fixtures — the cheap
  * way to catch off-by-one windowing, sign, and scaling slips that a
  * handful of hand-picked arrays can miss. Pure JVM (no Spark session),
  * so hundreds of cases cost milliseconds. */
class SignalPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  // accel-plausible magnitude samples, both the n=125 domain length and
  // degenerate short arrays
  private val sampleArr: Gen[Array[Double]] = for {
    n <- Gen.oneOf(2, 3, 16, 125)
    xs <- Gen.listOfN(n, Gen.chooseNum(-2000.0, 2000.0))
  } yield xs.toArray

  test("Parseval holds for the DFT on arbitrary signals") {
    check("parseval", Prop.forAll(sampleArr) { x =>
      val (re, im) = Signal.dft(x)
      val time = x.map(v => v * v).sum
      val freq = re.indices.map(k => Signal.magnitudeSq(re(k), im(k))).sum / x.length
      math.abs(time - freq) <= 1e-6 * math.max(1.0, math.abs(time))
    })
  }

  test("zNormalize gives mean ~0 and unit std (sigma-0 centres only)") {
    check("znorm", Prop.forAll(sampleArr) { x =>
      val z = Signal.zNormalize(x)
      val m = Signal.mean(z)
      val sd = Signal.std(z)
      val inScale = math.max(1.0, x.map(math.abs).max)
      if (Signal.std(x) == 0.0) math.abs(m) <= 1e-9 * inScale && sd == 0.0
      else math.abs(m) <= 1e-6 && math.abs(sd - 1.0) <= 1e-6
    })
  }

  test("magnitude3D: 0 <= V2 <= V1 pointwise (euclidean under manhattan)") {
    val xyzArr = Gen.listOfN(15, Gen.chooseNum(-1000.0, 1000.0)).map(_.toArray)
    check("mag3d", Prop.forAll(xyzArr) { xyz =>
      val v1 = Signal.magnitude3D(xyz, "V1")
      val v2 = Signal.magnitude3D(xyz, "V2")
      v1.indices.forall(i => v2(i) >= 0.0 && v2(i) <= v1(i) + 1e-9)
    })
  }

  test("band powers and PSD are non-negative on arbitrary signals") {
    check("bandpower", Prop.forAll(sampleArr) { x =>
      val spec = Signal.specPower(x)
      val roi = Signal.roiPower(x)
      val psdOk = Signal.psd(x).forall(_ >= -1e-12)
      spec >= 0.0 && roi >= 0.0 && psdOk
    })
  }

  test("zeroCrossingRate is a rate in [0,1]; meanLineLength is offset-invariant") {
    check("zcr-mll", Prop.forAll(sampleArr, Gen.chooseNum(-500.0, 500.0)) { (x, c) =>
      val z = Signal.zeroCrossingRate(x)
      val shifted = x.map(_ + c)
      val mll = Signal.meanLineLength(x)
      val mllS = Signal.meanLineLength(shifted)
      z >= 0.0 && z <= 1.0 && mll >= 0.0 &&
        math.abs(mll - mllS) <= 1e-7 * math.max(1.0, mll)
    })
  }

  test("interpOnto reproduces anchor values exactly and stays within the hull") {
    val anchored = for {
      nDp <- Gen.chooseNum(1, 6)
      ys <- Gen.listOfN(nDp, Gen.chooseNum(-200.0, 200.0))
    } yield (nDp, ys.toArray)
    check("interp", Prop.forAll(anchored) { case (nDp, ys) =>
      val n = 25 // samples per "datapoint" for the test
      val xs = Array.tabulate(nDp)(i => (i * n + n - 1).toDouble)
      val out = Signal.interpOnto(nDp * n, xs, ys)
      // interior anchors go through y0 + 1.0*(y1-y0), which is ys(i)
      // only up to one rounding — exact equality is a float trap here
      val atAnchors = xs.indices.forall(i =>
        math.abs(out(xs(i).toInt) - ys(i)) <= 1e-12 * math.max(1.0, math.abs(ys(i))))
      val lo = ys.min - 1e-9; val hi = ys.max + 1e-9
      atAnchors && out.forall(v => v >= lo && v <= hi)
    })
  }

  test("zcr quirk telescopes: closed form equals the literal sum of sign diffs") {
    check("zcr-quirk", Prop.forAll(sampleArr) { d =>
      val literal = (1 until d.length)
        .map(i => math.signum(d(i)) - math.signum(d(i - 1))).sum / (2.0 * d.length)
      math.abs(EpochFeatures.zcrQuirk(d) - literal) <= 1e-12
    })
  }

  test("welchPsd integral equals the hann-weighted variance (Parseval identity)") {
    // density scaling means sum(psd)*fRes == sum(((x-m)*w)^2)/sum(w^2)
    // EXACTLY (via Parseval) — the plain variance only matches when the
    // signal's energy is uncorrelated with the window, so the invariant
    // is stated against the weighted form, which holds for EVERY input.
    // n >= 3: hannWin(2) is identically zero (symmetric window, n-1
    // denominator), so the density scale divides by zero — a degenerate
    // length real epochs (>= 125 samples) never reach
    val welchArr = for {
      n <- Gen.oneOf(3, 16, 125)
      xs <- Gen.listOfN(n, Gen.chooseNum(-2000.0, 2000.0))
    } yield xs.toArray
    check("welch", Prop.forAll(welchArr) { x =>
      val (freqs, psd) = EpochFeatures.welchPsd(x, 25.0)
      val fRes = 25.0 / x.length
      val integral = psd.sum * fRes
      val m = Signal.mean(x)
      val w = Signal.hannWin(x.length)
      val num = x.indices.map(i => { val v = (x(i) - m) * w(i); v * v }).sum
      val den = w.map(v => v * v).sum
      val weighted = num / den
      psd.forall(_ >= -1e-12) && freqs.head == 0.0 &&
        math.abs(integral - weighted) <= 1e-6 * math.max(1.0, weighted)
    })
  }
}
