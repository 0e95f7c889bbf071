package graft.functions

/** P8: order-2 Butterworth high/low-pass with zero-phase filtfilt
  * (SURVEY §2.9; reference uses scipy butter+filtfilt with a 0.5 Hz
  * high-pass before feature extraction —
  * nnTraining2/extractFeatures.py:214-261, accelFeatures.py:22-40).
  *
  * Implemented from the textbook bilinear-transform design and the
  * standard odd-extension forward-backward filtering scheme (same scheme
  * scipy documents: pad with 3*max(len(a),len(b)) reflected samples,
  * seed each pass with the steady-state step response).
  */
object Filters {

  /** Normalized (a0=1) biquad coefficients (b0,b1,b2,a1,a2). */
  final case class Biquad(b0: Double, b1: Double, b2: Double, a1: Double, a2: Double)

  /** Order-2 Butterworth low-pass via bilinear transform with
    * pre-warping. cutoffHz in (0, fs/2). */
  def butterLowPass(cutoffHz: Double, fs: Double): Biquad = {
    val wc = math.tan(math.Pi * cutoffHz / fs) // pre-warped analog cutoff
    val k = math.sqrt(2.0)
    val norm = 1.0 / (1.0 + k * wc + wc * wc)
    Biquad(
      b0 = wc * wc * norm,
      b1 = 2.0 * wc * wc * norm,
      b2 = wc * wc * norm,
      a1 = 2.0 * (wc * wc - 1.0) * norm,
      a2 = (1.0 - k * wc + wc * wc) * norm)
  }

  /** Order-2 Butterworth high-pass via bilinear transform. */
  def butterHighPass(cutoffHz: Double, fs: Double): Biquad = {
    val wc = math.tan(math.Pi * cutoffHz / fs)
    val k = math.sqrt(2.0)
    val norm = 1.0 / (1.0 + k * wc + wc * wc)
    Biquad(
      b0 = norm,
      b1 = -2.0 * norm,
      b2 = norm,
      a1 = 2.0 * (wc * wc - 1.0) * norm,
      a2 = (1.0 - k * wc + wc * wc) * norm)
  }

  /** Steady-state initial conditions (lfilter_zi equivalent) for a unit
    * step: solves the 2x2 system (I - A^T) zi = B for transposed DF-II.
    * Package-visible so the p8 oracle builder can embed the exact seed
    * constants as SQL literals. */
  private[graft] def stepZi(c: Biquad): (Double, Double) = {
    // (1+a1) z0 - z1 = b1 - a1 b0 ; a2 z0 + z1 = b2 - a2 b0
    val r0 = c.b1 - c.a1 * c.b0
    val r1 = c.b2 - c.a2 * c.b0
    val det = (1.0 + c.a1) * 1.0 - (-1.0) * c.a2
    val z0 = (r0 * 1.0 - (-1.0) * r1) / det
    val z1 = ((1.0 + c.a1) * r1 - c.a2 * r0) / det
    (z0, z1)
  }

  /** Single-pass IIR (transposed direct-form II) with initial state. */
  private def lfilter(c: Biquad, x: Array[Double], zi0: Double, zi1: Double): Array[Double] = {
    val y = new Array[Double](x.length)
    var z0 = zi0; var z1 = zi1
    var i = 0
    while (i < x.length) {
      val xi = x(i)
      val yi = c.b0 * xi + z0
      z0 = c.b1 * xi - c.a1 * yi + z1
      z1 = c.b2 * xi - c.a2 * yi
      y(i) = yi
      i += 1
    }
    y
  }

  /** Zero-phase forward-backward filter with odd-extension padding. */
  def filtfilt(c: Biquad, x: Array[Double]): Array[Double] = {
    val n = x.length
    if (n == 0) return x
    val padlen = math.min(9, n - 1) // 3 * max(len(a), len(b)) = 9
    if (padlen <= 0) return x.clone()
    // odd extension: 2*x0 - x[padlen..1] ++ x ++ 2*xN - x[n-2..n-1-padlen]
    val ext = new Array[Double](n + 2 * padlen)
    var i = 0
    while (i < padlen) {
      ext(i) = 2.0 * x(0) - x(padlen - i)
      ext(padlen + n + i) = 2.0 * x(n - 1) - x(n - 2 - i)
      i += 1
    }
    System.arraycopy(x, 0, ext, padlen, n)
    val (z0, z1) = stepZi(c)
    // forward pass seeded with steady state at ext(0)
    val fwd = lfilter(c, ext, z0 * ext(0), z1 * ext(0))
    // backward pass on the reversed forward output
    val rev = fwd.reverse
    val bwd = lfilter(c, rev, z0 * rev(0), z1 * rev(0))
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = bwd(bwd.length - 1 - padlen - i); i += 1 }
    out
  }

  /** Convenience: reference default 0.5 Hz order-2 high-pass at 25 Hz. */
  def highPass(x: Array[Double], cutoffHz: Double = 0.5, fs: Double = 25.0): Array[Double] =
    filtfilt(butterHighPass(cutoffHz, fs), x)

  def lowPass(x: Array[Double], cutoffHz: Double, fs: Double = 25.0): Array[Double] =
    filtfilt(butterLowPass(cutoffHz, fs), x)
}
