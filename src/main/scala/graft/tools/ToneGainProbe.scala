package graft.tools

import graft.functions.{Filters, Signal}
import graft.queries.OsdbFixture

/** Numeric-safety probe for the p8/p10/p11 closed-form oracles
  * (`runMain graft.tools.ToneGainProbe`). No Spark — pure kernel math.
  *
  * For every (f1, f2, a1, a2) tuple the tone fixture can realize, it
  * compares the REAL kernel output (filtfilt RMS, bandPower, centroid,
  * entropy) against the closed form the DuckDB oracle states, and prints:
  *   - max |kernel - closedForm| across tuples (must be orders of
  *     magnitude below the rounding unit), and
  *   - min distance of closedForm x scale to the nearest .5 rounding
  *     boundary (the bridge margin — how far the DFT/filter float error
  *     would have to grow to flip a pinned integer).
  *
  * p8 geometry: tones at integer bins of n=1000, filtfilt transient decays
  * at pole radius ~0.915/sample, so by the center window [250, 750) the
  * startup transient is < 1e-9 of the signal; the zero-phase closed form
  * y(i) = A·|H|²·cos(w i) holds to float precision there. (At n=500 /
  * window [125,375) the transient residual was 9.6e-3 x1000-units against
  * a 1.8e-4 worst-case boundary margin — too close; doubling n buys
  * e^(-11) more decay for the same closed form.)
  */
object ToneGainProbe {

  /** |H(e^jw)|^2 for the 0.5 Hz order-2 Butterworth high-pass at fs=25 —
    * the same textbook formula the DuckDB oracle states in SQL. */
  def hpGainSq(w: Double): Double = {
    val wc = math.tan(math.Pi * 0.5 / 25.0)
    val k = math.sqrt(2.0)
    val norm = 1.0 / (1.0 + k * wc + wc * wc)
    val b0 = norm; val b1 = -2.0 * norm; val b2 = norm
    val a1 = 2.0 * (wc * wc - 1.0) * norm
    val a2 = (1.0 - k * wc + wc * wc) * norm
    val nr = b0 + b1 * math.cos(w) + b2 * math.cos(2 * w)
    val ni = b1 * math.sin(w) + b2 * math.sin(2 * w)
    val dr = 1.0 + a1 * math.cos(w) + a2 * math.cos(2 * w)
    val di = a1 * math.sin(w) + a2 * math.sin(2 * w)
    (nr * nr + ni * ni) / (dr * dr + di * di)
  }

  /** Distance of v from the nearest round()-flip boundary (frac = .5). */
  private def boundaryDist(v: Double): Double = {
    val f = v - math.floor(v)
    math.abs(f - 0.5)
  }

  def main(args: Array[String]): Unit = {
    // every tuple the fixture realizes: f1/f2 keyed by (k+d) mod lcm(24,21),
    // a1 by k%3, a2 by d%2 — k to 2016 x d to 8 covers the joint set
    val tuples = (for {
      k <- 0L until 2016L
      d <- 0L until 8L
    } yield (OsdbFixture.toneF1(k, d), OsdbFixture.toneF2(k, d),
             OsdbFixture.toneA1(k), OsdbFixture.toneA2(d))).distinct
    System.err.println(s"[probe] ${tuples.size} distinct (f1,f2,a1,a2) tuples")

    // --------------------------------------------------------- p8 (n=1000)
    var p8MaxErr = 0.0
    var p8MinMargin = Double.MaxValue
    val n8 = 1000
    for ((f1, f2, a1, a2) <- tuples) {
      val x = Array.tabulate(n8)(i =>
        1000.0 + a1 * math.cos(2 * math.Pi * f1 * i / n8)
               + a2 * math.cos(2 * math.Pi * f2 * i / n8))
      val y = Filters.highPass(x)
      var s = 0.0
      var i = 250
      while (i < 750) { s += y(i) * y(i); i += 1 }
      val rms = math.sqrt(s / 500.0)
      val g1 = hpGainSq(2 * math.Pi * f1 / n8)
      val g2 = hpGainSq(2 * math.Pi * f2 / n8)
      var cs = 0.0
      i = 250
      while (i < 750) {
        val yi = a1 * g1 * math.cos(2 * math.Pi * f1 * i / n8) +
                 a2 * g2 * math.cos(2 * math.Pi * f2 * i / n8)
        cs += yi * yi
        i += 1
      }
      val cf = math.sqrt(cs / 500.0)
      p8MaxErr = math.max(p8MaxErr, math.abs(rms - cf) * 1000)
      p8MinMargin = math.min(p8MinMargin, boundaryDist(cf * 1000))
    }
    println(f"p8  hp_rms_x1000 : maxErr(units)=$p8MaxErr%.3e  minBoundaryMargin=$p8MinMargin%.3e")

    // ----------------------------------------------------- p10/p11 (n=125)
    var bandMaxErr = 0.0; var bandMinMargin = Double.MaxValue
    var centMaxErr = 0.0; var centMinMargin = Double.MaxValue
    var entMaxErr = 0.0; var entMinMargin = Double.MaxValue
    val n1 = 125
    for ((f1, f2, a1, a2) <- tuples) {
      val x = Array.tabulate(n1)(i =>
        1000.0 + a1 * math.cos(2 * math.Pi * f1 * i / n1)
               + a2 * math.cos(2 * math.Pi * f2 * i / n1))
      // band [3,8] Hz holds exactly the f1 tone; closed form A1^2/2
      val (tot, peak) = Signal.bandPower(x, 25.0, 3.0, 8.0)
      val cfBand = a1 * a1 / 2.0
      bandMaxErr = math.max(bandMaxErr,
        math.max(math.abs(tot - cfBand), math.abs(peak - cfBand)) * 1000)
      bandMinMargin = math.min(bandMinMargin, boundaryDist(cfBand * 1000))
      // centroid: fr*(f1 p1 + f2 p2) / (p0 + p1 + p2), p0=1e6, p=A^2/2
      val cent = Signal.spectralCentroid(x, 25.0)
      val p0 = 1e6; val p1 = a1 * a1 / 2.0; val p2 = a2 * a2 / 2.0
      val cfCent = 0.2 * (f1 * p1 + f2 * p2) / (p0 + p1 + p2)
      centMaxErr = math.max(centMaxErr, math.abs(cent - cfCent) * 1e7)
      centMinMargin = math.min(centMinMargin, boundaryDist(cfCent * 1e7))
      // entropy: -sum q ln q over the three live bins
      val ent = Signal.spectralEntropy(x)
      val t = p0 + p1 + p2
      val cfEnt = -Seq(p0, p1, p2).map { p =>
        val q = p / t; q * math.log(q)
      }.sum
      entMaxErr = math.max(entMaxErr, math.abs(ent - cfEnt) * 1e7)
      entMinMargin = math.min(entMinMargin, boundaryDist(cfEnt * 1e7))
    }
    println(f"p10 band_x1000   : maxErr(units)=$bandMaxErr%.3e  minBoundaryMargin=$bandMinMargin%.3e")
    println(f"p11 cent_x1e7    : maxErr(units)=$centMaxErr%.3e  minBoundaryMargin=$centMinMargin%.3e")
    println(f"p11 ent_x1e7     : maxErr(units)=$entMaxErr%.3e  minBoundaryMargin=$entMinMargin%.3e")
  }
}
