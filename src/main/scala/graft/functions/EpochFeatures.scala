package graft.functions

import scala.collection.immutable.ListMap

/** P12: the per-epoch feature vector (SURVEY §2.9) —
  * ~36 features x 4 sources (x, y, z, magnitude), mirroring
  * nnTraining2/accelFeatures.py:42-106 including its quirks:
  *
  *   - zcr is np.sum(np.diff(np.sign(d)))/(2n) — a *telescoping* sum that
  *     reduces to (sign(d_last)-sign(d_first))/(2n). Preserved verbatim;
  *     the classic rate lives in [[Signal.zeroCrossingRate]].
  *   - "Welch" with nperseg=None collapses to a single hann-windowed,
  *     mean-detrended periodogram with density scaling.
  *   - entropy is log2 with a +1e-12 guard inside the log argument.
  *   - band masks are inclusive on both edges (freq >= lo & freq <= hi).
  */
object EpochFeatures {

  /** The 14 named bands (nnTraining2/extractFeatures.py:162-178). */
  val FreqBands: Seq[(String, (Double, Double))] = Seq(
    "osdRoi" -> (3.0, 8.0),
    "osdSpec" -> (0.5, 12.5),
    "osdFlap" -> (2.0, 4.0),
    "seizure_main" -> (1.0, 4.0),
    "initial_clonus" -> (3.0, 5.0),
    "late_clonus" -> (1.0, 2.0),
    "1-3Hz" -> (1.0, 3.0),
    "2-4Hz" -> (2.0, 4.0),
    "3-5Hz" -> (3.0, 5.0),
    "4-6Hz" -> (4.0, 6.0),
    "5-7Hz" -> (5.0, 7.0),
    "6-8Hz" -> (6.0, 8.0),
    "7-9Hz" -> (7.0, 9.0),
    "8-10Hz" -> (8.0, 10.0))

  val Sources: Seq[String] = Seq("x", "y", "z", "magnitude")

  /** Single-segment Welch PSD, density scaling: mean-detrend, hann
    * window, one-sided |X|^2 / (fs * sum(w^2)) with interior doubling.
    * Returns (freqs, psd). */
  def welchPsd(x: Array[Double], fs: Double): (Array[Double], Array[Double]) = {
    val n = x.length
    if (n == 0) return (Array.empty, Array.empty)
    val m = Signal.mean(x)
    val w = Signal.hannWin(n)
    var wss = 0.0
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = (x(i) - m) * w(i); wss += w(i) * w(i); i += 1 }
    val (re, im) = Signal.dft(v)
    val scale = 1.0 / (fs * wss)
    val half = n / 2
    val psd = new Array[Double](half + 1)
    val freqs = new Array[Double](half + 1)
    var k = 0
    while (k <= half) {
      var p = Signal.magnitudeSq(re(k), im(k)) * scale
      if (k != 0 && !(n % 2 == 0 && k == half)) p *= 2
      psd(k) = p
      freqs(k) = k * fs / n
      k += 1
    }
    (freqs, psd)
  }

  /** The telescoping-sign "zero-crossing rate" quirk. */
  def zcrQuirk(d: Array[Double]): Double = {
    if (d.isEmpty) return 0.0
    (math.signum(d(d.length - 1)) - math.signum(d(0))) / (2.0 * d.length)
  }

  /** Features for one source series; keys carry the `_source` suffix. */
  def sourceFeatures(name: String, d: Array[Double], fs: Double): ListMap[String, Double] = {
    var out = ListMap.newBuilder[String, Double]
    out += s"activity_count_$name" -> Signal.rms(d)
    out += s"mean_$name" -> Signal.mean(d)
    out += s"std_$name" -> Signal.std(d)
    out += s"skewness_$name" -> Signal.skewness(d)
    out += s"kurtosis_$name" -> Signal.kurtosis(d)
    out += s"zcr_$name" -> zcrQuirk(d)
    val (freqs, psd) = welchPsd(d, fs)
    var tot = 0.0
    var k = 0
    while (k < psd.length) { tot += psd(k); k += 1 }
    if (tot > 0) {
      var num = 0.0; var h = 0.0
      k = 0
      while (k < psd.length) {
        num += freqs(k) * psd(k)
        val q = psd(k) / tot
        h -= q * (math.log(q + 1e-12) / math.log(2.0))
        k += 1
      }
      out += s"mean_freq_$name" -> num / tot
      out += s"entropy_$name" -> h
    } else {
      out += s"mean_freq_$name" -> 0.0
      out += s"entropy_$name" -> 0.0
    }
    for ((band, (lo, hi)) <- FreqBands) {
      var total = 0.0; var peak = 0.0; var any = false
      k = 0
      while (k < psd.length) {
        if (freqs(k) >= lo && freqs(k) <= hi) {
          total += psd(k); if (!any || psd(k) > peak) peak = psd(k); any = true
        }
        k += 1
      }
      out += s"total_power_${name}_$band" -> (if (any) total else 0.0)
      out += s"peak_psd_${name}_$band" -> (if (any) peak else 0.0)
    }
    out.result()
  }

  /** Full epoch feature vector from per-axis series. magnitude is
    * sqrt(x^2+y^2+z^2) computed here, as the reference does. */
  def epochFeatures(x: Array[Double], y: Array[Double], z: Array[Double],
                    fs: Double = 25.0): ListMap[String, Double] = {
    val mag = Array.tabulate(x.length)(i =>
      math.sqrt(x(i) * x(i) + y(i) * y(i) + z(i) * z(i)))
    val all = Map("x" -> x, "y" -> y, "z" -> z, "magnitude" -> mag)
    Sources.foldLeft(ListMap.empty[String, Double]) { (acc, s) =>
      acc ++ sourceFeatures(s, all(s), fs)
    }
  }

  /** Stable sorted feature-name list (the feature CSV enforces sorted
    * feature columns — extractFeatures.py:528-534). */
  val FeatureNames: Seq[String] = {
    val perSource = Seq("activity_count", "mean", "std", "skewness",
      "kurtosis", "zcr", "mean_freq", "entropy").map(f => (s: String) => s"${f}_$s") ++
      FreqBands.flatMap { case (b, _) =>
        Seq((s: String) => s"total_power_${s}_$b", (s: String) => s"peak_psd_${s}_$b")
      }
    Sources.flatMap(s => perSource.map(f => f(s))).sorted
  }
}
