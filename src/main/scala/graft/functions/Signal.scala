package graft.functions

/** The OSDB signal-processing library (SURVEY §2.9 P1-P13), pure Scala on
  * Array[Double] so it can back Spark UDFs, typed operators, and the
  * streaming replay algorithms alike.
  *
  * Numeric-fidelity quirks of the reference are deliberately preserved
  * (SURVEY §7.4.3) — golden tests encode them, they must NOT be
  * "corrected":
  *   - getFFT computes a window function but does not apply it
  *     (libosd/osdAlgTools.py:95-105: fft of the *raw* data).
  *   - magnitudeSq returns |z|^2, not |z| (osdAlgTools.py:6-14, kept for
  *     Pebble-watch compatibility).
  *   - specPower divides by nSamp and then by 2 (osdAlgTools.py:107-119).
  *   - spectrumRatio is 10*roi/spec gated on a power threshold, else 0
  *     (osdAlgTools.py:136-144).
  */
object Signal {

  // ------------------------------------------------------------- FFT (P1)

  /** Cache of DFT twiddle tables keyed by length — datapoints are nearly
    * always n=125, so each executor computes the table once. */
  private val twiddleCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Double], Array[Double])]()

  private def twiddles(n: Int): (Array[Double], Array[Double]) =
    twiddleCache.computeIfAbsent(n, { m =>
      val cos = new Array[Double](m)
      val sin = new Array[Double](m)
      var k = 0
      while (k < m) {
        val a = -2.0 * math.Pi * k / m
        cos(k) = math.cos(a); sin(k) = math.sin(a)
        k += 1
      }
      (cos, sin)
    })

  /** Full complex DFT of a real signal; returns (re, im) arrays of
    * length n. Direct strided sum over bins 0..⌊n/2⌋ with the upper
    * half filled by REAL-INPUT conjugate symmetry (X[n−k] = X̄[k]) —
    * the input is real at every call site by construction (the
    * signature admits nothing else), so this halves the O(n²) work
    * with zero extra allocation. The mirrored half is EXACTLY the
    * conjugate (a sign flip on the stored imaginary part), i.e. the
    * result is a bit-consistent DFT whose ~1e-9 rounding sits far
    * inside every oracle's round-grid bridge.
    *
    * Why not an FFT: measured head-to-head at the hot length n=125, a
    * recursive mixed-radix {2,3,5} Cooley–Tukey ran 0.69× the direct
    * sum (allocation + index bookkeeping dominate at this size; the
    * flop advantage only pays above ~n=500, which no call site
    * reaches), while the conjugate-symmetry halving measures 1.55×
    * (28.3 vs 44.0 ms per 2000 calls, warmed JIT, same checksum).
    * numpy's pocketfft wins in C where the working set stays in
    * registers; the JVM direct sum with cached twiddle tables is the
    * faster shape here. */
  def dft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    if (n == 0) return (Array.empty[Double], Array.empty[Double])
    val (cos, sin) = twiddles(n)
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    val half = n / 2
    var k = 0
    while (k <= half) {
      var sr = 0.0; var si = 0.0
      var t = 0
      var idx = 0
      while (t < n) {
        val v = x(t)
        sr += v * cos(idx)
        si += v * sin(idx)
        idx += k
        if (idx >= n) idx -= n
        t += 1
      }
      re(k) = sr; im(k) = si
      val mirror = n - k
      if (k != 0 && mirror != k) { re(mirror) = sr; im(mirror) = -si }
      k += 1
    }
    (re, im)
  }

  /** P3: squared magnitude of FFT bin k (the Pebble-compat quirk). */
  @inline def magnitudeSq(re: Double, im: Double): Double = re * re + im * im

  // -------------------------------------------------- window funcs (P2)

  def rectWin(n: Int): Array[Double] = Array.fill(n)(1.0)

  def hannWin(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.5 * (1 - math.cos(2 * math.Pi * i / (n - 1))))

  /** The reference's raisedCosine is numerically identical to Hann
    * (osdAlgTools.py:34-42). */
  def raisedCosineWin(n: Int): Array[Double] = hannWin(n)

  def hammingWin(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.54 - 0.46 * math.cos(2 * math.Pi * i / (n - 1)))

  def triangleWin(n: Int): Array[Double] =
    Array.tabulate(n)(i => 1 - math.abs((i - n / 2.0) / (n / 2.0)))

  def window(name: String, n: Int): Array[Double] = name match {
    case "rect" => rectWin(n)
    case "hann" => hannWin(n)
    case "raisedCosine" => raisedCosineWin(n)
    case "hamming" => hammingWin(n)
    case "triangle" => triangleWin(n)
    case other => throw new IllegalArgumentException(s"Unrecognised window $other")
  }

  /** Frequency resolution in Hz per bin (osdAlgTools.py:20-23). */
  @inline def freqRes(n: Int, sampleFreq: Double): Double = sampleFreq / n

  @inline def freq2bin(freq: Double, fRes: Double): Int = (freq / fRes).toInt

  // ----------------------------------------------------- band power (P4-P7)

  /** P4 getSpecPower: sum |X_k|^2 over bins 1..freq2bin(freqCutoff),
    * capped at nSamp-1, then / nSamp / 2 (quirk preserved). */
  def specPower(x: Array[Double], sampleFreq: Double = 25.0,
                freqCutoff: Double = 12.5): Double = {
    if (x.length == 0) return 0.0
    val (re, im) = dft(x)
    specPowerFromDft(re, im, sampleFreq, freqCutoff)
  }

  /** [[specPower]] over a precomputed DFT — for consumers deriving
    * several band quantities from ONE transform (the report layer's
    * analysis series compute spec/roi/ratio/alarm/spectrum per
    * datapoint; recomputing the O(n²) DFT per quantity was a measured
    * ~7× CPU tax on that path). */
  def specPowerFromDft(re: Array[Double], im: Array[Double],
                       sampleFreq: Double = 25.0,
                       freqCutoff: Double = 12.5): Double = {
    val n = re.length
    if (n == 0) return 0.0
    val nCut = freq2bin(freqCutoff, freqRes(n, sampleFreq))
    var p = 0.0
    var i = 1
    val hi = math.min(nCut, n - 1)
    while (i <= hi) { p += magnitudeSq(re(i), im(i)); i += 1 }
    p / n / 2
  }

  /** P5 getRoiPower: mean |X_k|^2 over bins [fMin, fMax) in Hz. */
  def roiPower(x: Array[Double], sampleFreq: Double = 25.0,
               fMin: Double = 3.0, fMax: Double = 8.0): Double = {
    if (x.length == 0) return 0.0
    val (re, im) = dft(x)
    roiPowerFromDft(re, im, sampleFreq, fMin, fMax)
  }

  /** [[roiPower]] over a precomputed DFT (see [[specPowerFromDft]]). */
  def roiPowerFromDft(re: Array[Double], im: Array[Double],
                      sampleFreq: Double = 25.0,
                      fMin: Double = 3.0, fMax: Double = 8.0): Double = {
    val n = re.length
    if (n == 0) return 0.0
    val fr = freqRes(n, sampleFreq)
    val nMin = freq2bin(fMin, fr)
    val nMax = freq2bin(fMax, fr)
    if (nMax <= nMin) return 0.0
    var p = 0.0
    var i = nMin
    while (i < nMax) { p += magnitudeSq(re(i), im(i)); i += 1 }
    p / (nMax - nMin)
  }

  /** P6 getSpectrumRatio (library variant, osdAlgTools.py:136-144):
    * 10*roi/spec when specPower > alarmThresh, else 0. */
  def spectrumRatio(x: Array[Double], alarmThresh: Double = 900.0): Double = {
    val spec = specPower(x)
    val roi = roiPower(x)
    if (spec > alarmThresh) 10.0 * roi / spec else 0.0
  }

  /** P7 getAlarmState: binary in-alarm from the ratio threshold. */
  def alarmState(x: Array[Double], alarmThresh: Double = 900.0,
                 alarmRatioThresh: Double = 57.0): Int =
    if (spectrumRatio(x, alarmThresh) <= alarmRatioThresh) 0 else 1

  // ------------------------------------------------- time-domain (C12-C15)

  /** C12 mean line length: sum |x_i - x_{i-1}| / (n-1). */
  def meanLineLength(x: Array[Double]): Double = {
    val n = x.length
    if (n < 2) return 0.0
    var s = 0.0
    var i = 1
    while (i < n) { s += math.abs(x(i) - x(i - 1)); i += 1 }
    s / (n - 1)
  }

  /** C13 zero-crossing rate about the signal mean. */
  def zeroCrossingRate(x: Array[Double]): Double = {
    val n = x.length
    if (n < 2) return 0.0
    val m = mean(x)
    var c = 0
    var i = 1
    while (i < n) {
      if ((x(i) - m) * (x(i - 1) - m) < 0) c += 1
      i += 1
    }
    c.toDouble / (n - 1)
  }

  def mean(x: Array[Double]): Double = {
    if (x.isEmpty) return 0.0
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i); i += 1 }
    s / x.length
  }

  /** Population std (ddof=0, NumPy default used by the reference). */
  def std(x: Array[Double]): Double = {
    if (x.isEmpty) return 0.0
    val m = mean(x)
    var s = 0.0; var i = 0
    while (i < x.length) { val d = x(i) - m; s += d * d; i += 1 }
    math.sqrt(s / x.length)
  }

  /** C14 Fisher-Pearson skewness (biased, scipy default). */
  def skewness(x: Array[Double]): Double = {
    val n = x.length
    if (n == 0) return 0.0
    val m = mean(x); val sd = std(x)
    if (sd == 0.0) return 0.0
    var s = 0.0; var i = 0
    while (i < n) { val d = (x(i) - m) / sd; s += d * d * d; i += 1 }
    s / n
  }

  /** C14 excess kurtosis (biased, Fisher definition, scipy default). */
  def kurtosis(x: Array[Double]): Double = {
    val n = x.length
    if (n == 0) return 0.0
    val m = mean(x); val sd = std(x)
    if (sd == 0.0) return 0.0
    var s = 0.0; var i = 0
    while (i < n) { val d = (x(i) - m) / sd; val d2 = d * d; s += d2 * d2; i += 1 }
    s / n - 3.0
  }

  def rms(x: Array[Double]): Double = {
    if (x.isEmpty) return 0.0
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s / x.length)
  }

  /** C15 z-normalise with sigma=0 guard (cnnModel.py:59-67). */
  def zNormalize(x: Array[Double]): Array[Double] = {
    val m = mean(x); val sd = std(x)
    if (sd == 0.0) x.map(_ - m) else x.map(v => (v - m) / sd)
  }

  // ------------------------------------------------------- spectral (P9-P11)

  /** One-sided periodogram PSD (power per bin, |X_k|^2 / n^2 scaling with
    * doubled interior bins) — backs band features and spectral stats. */
  def psd(x: Array[Double]): Array[Double] = {
    val n = x.length
    if (n == 0) return Array.empty
    val (re, im) = dft(x)
    val half = n / 2
    val out = new Array[Double](half + 1)
    var k = 0
    while (k <= half) {
      var p = magnitudeSq(re(k), im(k)) / (n.toDouble * n)
      if (k != 0 && !(n % 2 == 0 && k == half)) p *= 2
      out(k) = p
      k += 1
    }
    out
  }

  /** [[bandPower]]'s band total computed from an ALREADY-AVAILABLE DFT —
    * the report page's one-DFT-per-datapoint discipline (its five
    * analysis series and this band series share a single transform). */
  def bandTotalFromDft(re: Array[Double], im: Array[Double],
                       sampleFreq: Double, fMin: Double, fMax: Double): Double = {
    val n = re.length
    if (n == 0) return 0.0
    val half = n / 2
    val fr = freqRes(n, sampleFreq)
    var total = 0.0
    var k = 0
    while (k <= half) {
      val f = k * fr
      if (f >= fMin && f <= fMax) {
        var p = magnitudeSq(re(k), im(k)) / (n.toDouble * n)
        if (k != 0 && !(n % 2 == 0 && k == half)) p *= 2
        total += p
      }
      k += 1
    }
    total
  }

  /** P10: total power and peak PSD over a band [fMin, fMax] in Hz. */
  def bandPower(x: Array[Double], sampleFreq: Double,
                fMin: Double, fMax: Double): (Double, Double) = {
    val n = x.length
    if (n == 0) return (0.0, 0.0)
    val p = psd(x)
    val fr = freqRes(n, sampleFreq)
    var total = 0.0; var peak = 0.0
    var k = 0
    while (k < p.length) {
      val f = k * fr
      if (f >= fMin && f <= fMax) {
        total += p(k)
        if (p(k) > peak) peak = p(k)
      }
      k += 1
    }
    (total, peak)
  }

  /** P11 spectral centroid (mean frequency). */
  def spectralCentroid(x: Array[Double], sampleFreq: Double): Double = {
    val p = psd(x)
    if (p.isEmpty) return 0.0
    val fr = freqRes(x.length, sampleFreq)
    var num = 0.0; var den = 0.0
    var k = 0
    while (k < p.length) { num += k * fr * p(k); den += p(k); k += 1 }
    if (den == 0.0) 0.0 else num / den
  }

  /** P11 spectral entropy (Shannon, of the normalised PSD). */
  def spectralEntropy(x: Array[Double]): Double = {
    val p = psd(x)
    var tot = 0.0
    var k = 0
    while (k < p.length) { tot += p(k); k += 1 }
    if (tot == 0.0) return 0.0
    var h = 0.0
    k = 0
    while (k < p.length) {
      val q = p(k) / tot
      if (q > 0) h -= q * math.log(q)
      k += 1
    }
    h
  }

  // ---------------------------------------------- 3D handling (C5-C7)

  /** C7: de-interleave axis k (0=x,1=y,2=z) from a 375-sample array. */
  def deinterleave(xyz: Array[Double], axis: Int): Array[Double] = {
    val n = xyz.length / 3
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = xyz(3 * i + axis); i += 1 }
    out
  }

  /** C5/C6: accel magnitude series from interleaved 3D, by OsdAlg mode:
    * V1 = |x|+|y|+|z| approx, V2 = sqrt(x^2+y^2+z^2), V3 = V2 with a
    * per-axis offset (testRunner/osdAlg.py:92-100). */
  def magnitude3D(xyz: Array[Double], mode: String = "V2",
                  offset: Double = 0.0): Array[Double] = {
    val n = xyz.length / 3
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = xyz(3 * i); val y = xyz(3 * i + 1); val z = xyz(3 * i + 2)
      out(i) = mode match {
        case "V1" => math.abs(x) + math.abs(y) + math.abs(z)
        case "V3" =>
          val xo = x + offset; val yo = y + offset; val zo = z + offset
          math.sqrt(xo * xo + yo * yo + zo * zo)
        case _ => math.sqrt(x * x + y * y + z * z)
      }
      i += 1
    }
    out
  }

  // ------------------------------------------------------ interp (P13)

  /** P13: linearly interpolate sparse per-datapoint values (e.g. HR at
    * 0.2 Hz) onto the 25 Hz sample timebase; endpoints extend flat, like
    * np.interp. xs must be ascending sample indices with known values. */
  def interpOnto(nSamples: Int, xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val out = new Array[Double](nSamples)
    if (xs.isEmpty) return out
    var j = 0
    var i = 0
    while (i < nSamples) {
      val t = i.toDouble
      while (j < xs.length - 1 && xs(j + 1) < t) j += 1
      out(i) =
        if (t <= xs(0)) ys(0)
        else if (t >= xs(xs.length - 1)) ys(ys.length - 1)
        else {
          val x0 = xs(j); val x1 = xs(j + 1)
          val frac = if (x1 == x0) 0.0 else (t - x0) / (x1 - x0)
          ys(j) + frac * (ys(j + 1) - ys(j))
        }
      i += 1
    }
    out
  }
}
