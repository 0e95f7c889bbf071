package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.functions.Signal
import graft.model.Osdb
import graft.operators.Flatten.FlatDp

/** W6/P15 spectral history ("spectrogram") and the F10 low-motion
  * rejection predicate.
  *
  * Reference: user_tools/dataSummariser/eventAnalyser.py:236-277
  * (generateSpectralHistoryFromAccelLst2) — a windowLen-sample window
  * sliding by stepLen over the event's concatenated magnitude signal;
  * per slice the power spectrum |X_k|^2 of bins 1..windowLen/2-1 (DC
  * dropped), values < zeroTol clipped to zero, optionally normalised by
  * the slice max; slices whose standard deviation (milli-g) is below
  * sdThresh emit all-zero columns so low-movement noise never shows in
  * the image. The reference stacks slices on axis=1 (freq-major image);
  * we keep time-major `Array[slice][bin]` — the natural row layout for a
  * Spark array column — and transposing is the renderer's concern.
  *
  * F10: user_tools/testRunner/nnAlg.py:113-121 — reject a datapoint when
  * its std as a percentage of its mean (100*std/mean) is below sdThresh;
  * mean == 0 yields pct 0, which always rejects (matches the reference's
  * accStdPct = 0.0 fallback).
  *
  * Scale shape: one event = one group = one task (flatMapGroups); the
  * spectrogram of a 100 TB corpus is embarrassingly parallel over events
  * and never shuffles anything but the (eventId, slices) rows out.
  */
object Spectrogram {

  /** F10: std as percent of mean (nnAlg.py:117-118). */
  def stdPct(x: Array[Double]): Double = {
    val m = Signal.mean(x)
    if (m == 0.0) 0.0 else 100.0 * Signal.std(x) / m
  }

  /** F10 predicate: true = reject (low motion). sdThresh <= 0 disables. */
  def rejectLowMotion(x: Array[Double], sdThresh: Double): Boolean =
    sdThresh > 0.0 && stdPct(x) < sdThresh

  case class Config(
      windowLen: Int = Osdb.SamplesPerDatapoint, // 125 = 5 s at 25 Hz
      stepLen: Int = 25,                         // config['spectrogram']['stepSize']
      normalise: Boolean = false,
      zeroTol: Double = 0.001,
      sdThresh: Double = 10.0,                   // absolute milli-g std gate
      magnitudeMode: Boolean = false)            // variant 1 (:193-233): |X_k| not |X_k|^2

  /** The sliding spectral history of one concatenated signal: one row per
    * slice end position (windowLen, windowLen+stepLen, ... < n), each row
    * the windowLen/2 - 1 non-DC bins. */
  def spectralHistory(acc: Array[Double], cfg: Config = Config()): Array[Array[Double]] = {
    val n = acc.length
    val fftLen = cfg.windowLen / 2
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var endPosn = cfg.windowLen
    while (endPosn < n) {
      val slice = java.util.Arrays.copyOfRange(acc, endPosn - cfg.windowLen, endPosn)
      val row =
        if (Signal.std(slice) >= cfg.sdThresh) {
          val (re, im) = Signal.dft(slice)
          val bins = new Array[Double](fftLen - 1)
          var k = 1
          while (k < fftLen) {
            val p =
              if (cfg.magnitudeMode) math.sqrt(Signal.magnitudeSq(re(k), im(k)))
              else Signal.magnitudeSq(re(k), im(k))
            bins(k - 1) = if (math.abs(p) < cfg.zeroTol) 0.0 else p
            k += 1
          }
          if (cfg.normalise) {
            var mx = 0.0
            var i = 0
            while (i < bins.length) { if (bins(i) > mx) mx = bins(i); i += 1 }
            if (mx != 0.0) { i = 0; while (i < bins.length) { bins(i) /= mx; i += 1 } }
          }
          bins
        } else new Array[Double](fftLen - 1) // zero column: low movement
      out += row
      endPosn += cfg.stepLen
    }
    out.toArray
  }

  case class SpecRow(
      eventId: String,
      nSlices: Int,
      nBins: Int,
      spec: Array[Array[Double]])

  /** Per-event spectrogram: sort datapoints, concatenate magnitude, slide. */
  def eventSpectrogram(dps: Dataset[FlatDp], cfg: Config = Config()): Dataset[SpecRow] = {
    val spark = dps.sparkSession
    import spark.implicits._
    val n = Osdb.SamplesPerDatapoint
    dps.groupByKey(_.eventId).mapGroups { (eventId, it) =>
      val sorted = it.toArray.sortBy(d => (d.tsSec, d.seq))
      val acc = new Array[Double](sorted.length * n)
      var d = 0
      while (d < sorted.length) {
        val r = sorted(d).rawData
        if (r != null) Array.copy(r, 0, acc, d * n, math.min(n, r.length))
        d += 1
      }
      val img = spectralHistory(acc, cfg)
      SpecRow(eventId, img.length, if (img.isEmpty) 0 else img(0).length, img)
    }
  }
}
