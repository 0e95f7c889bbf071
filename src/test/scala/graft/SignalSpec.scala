package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{EpochFeatures, Filters, Signal}

class SignalSpec extends AnyFunSuite {

  private def sine(freqHz: Double, n: Int = 125, fs: Double = 25.0,
                   amp: Double = 1.0): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * freqHz * i / fs))

  test("dft of an integer-period sine concentrates in one bin with |X|=A*n/2") {
    val a = 100.0
    val x = sine(5.0, amp = a) // bin 25 at n=125, fs=25
    val (re, im) = Signal.dft(x)
    val mag = Array.tabulate(125)(k => math.sqrt(Signal.magnitudeSq(re(k), im(k))))
    assert(math.abs(mag(25) - a * 125 / 2) < 1e-6)
    // all non-signal bins (except the conjugate at n-25) are ~zero
    (1 until 62).filter(_ != 25).foreach(k => assert(mag(k) < 1e-6))
  }

  test("conjugate-symmetry dft equals an independent naive full sum at every length class") {
    // the shipped Signal.dft is a direct O(n²) sum that computes only
    // bins 0..n/2 and MIRRORS the upper half via real-input conjugate
    // symmetry (an FFT was measured slower at n=125 and rejected —
    // Signal.scala's doc). Pin it against an independent naive FULL
    // sum (every bin summed directly, no mirroring) across
    // smooth (125, 50, 250, 64, 60), partially-smooth (35 = 5·7,
    // 126 = 2·3²·7), rough-prime (7, 13), and tiny lengths
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 2, 3, 4, 5, 6, 7, 8, 12, 13, 25, 35, 50, 60, 64,
        125, 126, 250)) {
      val x = Array.fill(n)(rnd.nextDouble() * 2000 - 1000)
      val (re, im) = Signal.dft(x)
      var k = 0
      while (k < n) {
        var sr = 0.0; var si = 0.0
        var t = 0
        while (t < n) {
          val a = -2.0 * math.Pi * (k.toLong * t % n) / n
          sr += x(t) * math.cos(a)
          si += x(t) * math.sin(a)
          t += 1
        }
        // absolute tolerance scaled to the coefficient magnitude floor:
        // inputs are O(1000), n <= 250, so coefficients are O(n*1000)
        assert(math.abs(re(k) - sr) < 1e-6 && math.abs(im(k) - si) < 1e-6,
          s"n=$n k=$k: (${re(k)}, ${im(k)}) vs naive ($sr, $si)")
        k += 1
      }
    }
  }

  test("dft matches Parseval: sum x^2 == (1/n) sum |X|^2") {
    val x = Array.tabulate(125)(i => math.sin(i * 0.7) + 0.3 * math.cos(i * 1.3))
    val (re, im) = Signal.dft(x)
    val lhs = x.map(v => v * v).sum
    val rhs = (0 until 125).map(k => Signal.magnitudeSq(re(k), im(k))).sum / 125
    assert(math.abs(lhs - rhs) < 1e-8 * math.max(1.0, lhs))
  }

  test("roiPower isolates a 5 Hz sine; out-of-band 10 Hz contributes ~0") {
    val in = sine(5.0, amp = 10)   // inside [3,8) Hz ROI
    val out = sine(10.0, amp = 10) // outside
    assert(Signal.roiPower(in) > 1000 * Signal.roiPower(out))
  }

  test("specPower preserves the /nSamp/2 scaling quirk") {
    val a = 8.0
    val x = sine(5.0, amp = a)
    // single bin: |X|^2 = (a*n/2)^2; specPower = that / n / 2
    val expected = math.pow(a * 125 / 2, 2) / 125 / 2
    assert(math.abs(Signal.specPower(x) - expected) < 1e-6 * expected)
  }

  test("spectrumRatio gates on specPower and scales by 10 (library variant)") {
    val x = sine(5.0, amp = 100) // all power inside both spec and roi ranges
    val spec = Signal.specPower(x)
    val roi = Signal.roiPower(x)
    assert(spec > 900)
    val r = Signal.spectrumRatio(x)
    assert(math.abs(r - 10.0 * roi / spec) < 1e-9)
    // below the gate: ratio is exactly 0
    assert(Signal.spectrumRatio(sine(5.0, amp = 0.001)) === 0.0)
  }

  test("meanLineLength of a ramp is the step size") {
    val ramp = Array.tabulate(125)(_.toDouble) // the testAllData fixture shape
    assert(math.abs(Signal.meanLineLength(ramp) - 1.0) < 1e-12)
  }

  test("moments: std/skewness/kurtosis on known data") {
    val x = Array(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    assert(math.abs(Signal.mean(x) - 5.0) < 1e-12)
    assert(math.abs(Signal.std(x) - 2.0) < 1e-12) // classic example, pop std
    val sym = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    assert(math.abs(Signal.skewness(sym)) < 1e-12)
    // uniform-ish has negative excess kurtosis
    assert(Signal.kurtosis(sym) < 0)
  }

  test("zNormalize guards sigma=0") {
    val flat = Array.fill(10)(3.0)
    assert(Signal.zNormalize(flat).forall(_ == 0.0))
    val z = Signal.zNormalize(Array(1.0, 2.0, 3.0))
    assert(math.abs(Signal.mean(z)) < 1e-12 && math.abs(Signal.std(z) - 1.0) < 1e-12)
  }

  test("window generators hit their defining endpoints") {
    val h = Signal.hannWin(125)
    assert(h(0) == 0.0 && h(124) < 1e-12 && math.abs(h(62) - 1.0) < 1e-3)
    val ham = Signal.hammingWin(125)
    assert(math.abs(ham(0) - 0.08) < 1e-12)
    assert(Signal.rectWin(5).forall(_ == 1.0))
    assert(Signal.raisedCosineWin(9).sameElements(Signal.hannWin(9)))
  }

  test("magnitude3D modes: V1 manhattan vs V2 euclidean vs V3 offset") {
    val xyz = Array(3.0, 4.0, 0.0) // one sample
    assert(Signal.magnitude3D(xyz, "V1")(0) === 7.0)
    assert(Signal.magnitude3D(xyz, "V2")(0) === 5.0)
    val v3 = Signal.magnitude3D(xyz, "V3", offset = 1.0)(0)
    assert(math.abs(v3 - math.sqrt(16 + 25 + 1)) < 1e-12)
  }

  test("deinterleave extracts strided axes") {
    val xyz = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    assert(Signal.deinterleave(xyz, 0).sameElements(Array(1.0, 4.0)))
    assert(Signal.deinterleave(xyz, 2).sameElements(Array(3.0, 6.0)))
  }

  test("interpOnto linearly interpolates with flat extension") {
    val out = Signal.interpOnto(10, Array(2.0, 6.0), Array(10.0, 30.0))
    assert(out(0) == 10.0 && out(2) == 10.0)      // flat head
    assert(math.abs(out(4) - 20.0) < 1e-12)       // midpoint
    assert(out(6) == 30.0 && out(9) == 30.0)      // flat tail
  }

  test("filtfilt: high-pass kills DC, low-pass keeps it; zero phase holds") {
    val dc = Array.fill(200)(5.0)
    val hp = Filters.highPass(dc)
    assert(hp.map(math.abs).max < 1e-6)
    val lp = Filters.lowPass(dc, 2.0)
    assert(lp.forall(v => math.abs(v - 5.0) < 1e-6))
    // zero-phase: a slow in-band sine passes the low-pass with no shift
    val slow = Array.tabulate(500)(i => math.sin(2 * math.Pi * 0.2 * i / 25.0))
    val f = Filters.lowPass(slow, 2.0)
    val mid = 250
    assert(math.abs(f(mid) - slow(mid)) < 0.01)
  }

  test("filtfilt high-pass passes in-band frequencies with ~unit gain") {
    val fast = Array.tabulate(500)(i => math.sin(2 * math.Pi * 5.0 * i / 25.0))
    val f = Filters.highPass(fast) // 0.5 Hz cutoff, 5 Hz well inside passband
    val rmsIn = Signal.rms(fast.slice(100, 400))
    val rmsOut = Signal.rms(f.slice(100, 400))
    assert(math.abs(rmsOut / rmsIn - 1.0) < 0.01)
  }

  test("epoch features: zcr quirk telescopes; names sorted; 144 features") {
    val d = Array(1.0, -1.0, 1.0, -1.0) // classic zcr would be 1; quirk sees ends
    assert(EpochFeatures.zcrQuirk(d) === (math.signum(-1.0) - math.signum(1.0)) / 8.0)
    val x = Array.tabulate(125)(i => math.sin(2 * math.Pi * 3.0 * i / 25.0))
    val feats = EpochFeatures.epochFeatures(x, x.map(_ * 0.5), x.map(_ => 0.0))
    assert(feats.size == 4 * (8 + 2 * EpochFeatures.FreqBands.size))
    assert(EpochFeatures.FeatureNames == EpochFeatures.FeatureNames.sorted)
    assert(feats.keySet == EpochFeatures.FeatureNames.toSet)
    // a 3 Hz sine puts seizure_main (1-4 Hz) power far above 8-10 Hz
    assert(feats("total_power_x_seizure_main") > 100 * feats("total_power_x_8-10Hz"))
    // magnitude source is derived from the axes
    assert(feats("mean_magnitude") > 0)
  }

  test("welchPsd integrates to the signal variance (density scaling)") {
    val x = Array.tabulate(250)(i => math.sin(2 * math.Pi * 5.0 * i / 25.0))
    val (freqs, psd) = EpochFeatures.welchPsd(x, 25.0)
    val df = freqs(1) - freqs(0)
    val power = psd.sum * df
    val variance = {
      val m = Signal.mean(x); x.map(v => (v - m) * (v - m)).sum / x.length
    }
    // hann-window variance estimate is within a few % for a full-bin sine
    assert(math.abs(power - variance) / variance < 0.05)
  }
}
