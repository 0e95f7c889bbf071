package graft.streaming

import graft.functions.Signal

/** The stateful seizure-detection algorithm surface (SURVEY §2.11/2.12):
  * the reference's `SdAlg.processDp` plugin interface
  * (user_tools/testRunner/sdAlg.py:6-51), re-expressed as a pure-Scala
  * state machine that one `mapGroups`/`flatMapGroupsWithState` instance
  * drives per event.
  *
  * The FSM (W10, testRunner/osdAlg.py:264-343): while in-alarm each
  * datapoint adds samplePeriod seconds to alarmCount; count > alarmTime
  * ⇒ state 2 (ALARM), else count > warnTime ⇒ state 1 (WARN). Leaving
  * alarm decays 2→1 (count reset to warnTime, phone-app agreement quirk)
  * and otherwise →0 with count 0.
  */
trait SdAlg extends Serializable {
  /** One datapoint in, (alarmState, extras) out. */
  def processDp(dp: ReplayDp): AlgResult
  def reset(): Unit
  def name: String
  /** Snapshot FSM registers (state, count, history) for streaming
    * checkpoint round-trips. */
  def snapshot: (Int, Double, Seq[Double])
  /** Restore FSM registers from a streaming state snapshot. */
  def restore(alarmState: Int, alarmCount: Double, hist: Seq[Double] = Seq.empty): Unit
}

/** Minimal per-datapoint input for replay: time-ordered within event.
  * `seq` is a deterministic source-order index used ONLY as the sort
  * tiebreak for datapoints sharing a timestamp — case-class hashCode is
  * array-identity-based and run-specific, so it must never order rows. */
case class ReplayDp(
    eventId: String,
    tsSec: Long,
    hr: Double,                    // -1 = missing sentinel
    alarmStateRecorded: Long,      // as recorded by the phone (5 = manual)
    rawData: Array[Double],        // 125 magnitude samples (may be empty)
    rawData3D: Array[Double],      // 375 interleaved samples (may be empty)
    seq: Long)                     // deterministic within-event tiebreak —
                                   // REQUIRED (no default) so producers
                                   // must wire real source order through;
                                   // use FlatDp.seq / the posexplode index

case class AlgResult(
    alarmState: Int,
    alarmCount: Double,
    specPower: Double,
    roiPower: Double,
    specRatio: Double)

/** Shared alarm-count FSM (identical shape in OsdAlg/HrAlg/NnAlg). */
final class AlarmFsm(samplePeriod: Double, warnTime: Double, alarmTime: Double)
    extends Serializable {
  var alarmState: Int = 0
  var alarmCount: Double = 0.0

  def step(inAlarm: Boolean): Int = {
    if (inAlarm) {
      alarmCount += samplePeriod
      if (alarmCount > alarmTime) alarmState = 2
      else if (alarmCount > warnTime) alarmState = 1
    } else {
      if (alarmState == 2) { alarmState = 1; alarmCount = warnTime }
      else { alarmState = 0; alarmCount = 0.0 }
    }
    alarmState
  }

  def reset(): Unit = { alarmState = 0; alarmCount = 0.0 }
}

/** Detector settings mirroring the phone-app defaults
  * (documentation/Data_Structure.md:78-92). */
/** The flap-detection second band (osdAlg.py:41-43,190-233): a
  * low-frequency ROI computed with the SAME spectrum machinery as the
  * main band, OR'd into the alarm decision (osdAlg.py:293 "force an
  * alarm state if we are in a flap alarm state"). Defaults are the
  * shipped testConfig.json's flapSettings. */
case class FlapSettings(
    freqMin: Double = 2.0,
    freqMax: Double = 4.0,
    thresh: Double = 10000.0,
    ratioThresh: Double = 80.0)

case class OsdSettings(
    mode: String = "V2",            // V0 mag-data | V1 |x|+|y|+|z| | V2 sqrt | V3 offset | V4 per-axis
    sampleFreq: Double = 25.0,
    samplePeriod: Double = 5.0,
    warnTime: Double = 5.0,
    alarmTime: Double = 10.0,
    alarmThresh: Double = 100.0,    // gate on roiPower (device semantics)
    alarmRatioThresh: Double = 57.0,
    freqCutoff: Double = 12.0,      // android-app cutoff quirk (not fs/2)
    offset: Double = 0.0,
    accelScaleFactor: Double = 1000.0,
    alarmFreqMin: Double = 3.0,     // main ROI band (osdAlg.py:31-32)
    alarmFreqMax: Double = 8.0,
    flap: Option[FlapSettings] = None, // None == flapSettings disabled
    gateOnSpec: Boolean = false,    // osdAlg_v1 gates the ratio on
                                    // specPower (osdAlg_v1.py:112), the
                                    // device/osdAlg.py variant on roi
    specBinsFullRange: Boolean = false, // osdAlg_v1 sums spec bins over
                                    // range(1, mNSamp) gated by the
                                    // cutoff (osdAlg_v1.py:88-90) — at
                                    // fs/2 cutoff that reaches bins
                                    // 1..62 of 125, one past [1, n/2)
    fallbackOnZeroSum: Boolean = true, // device osdAlg.py:105 replays the
                                    // stored magnitude when the 3D trace
                                    // SUMS to zero (dataSum==0);
                                    // osdAlg_v1.py:63-65 has no sum check
                                    // — an all-zero data3D stays a zero
                                    // signal there (bridge sets false)
    name: Option[String] = None)    // config-injected (testRunner.py:136)

/** Device-faithful OSD algorithm (testRunner/osdAlg.py):
  *   specPower: sum |X_k|^2 over k in [1, nSamp/2) ∩ [1, bin(12 Hz)],
  *     then / nSamp / 2, then / 1000 (ACCEL_SCALE_FACTOR);
  *   roiPower: mean |X_k|^2 over [bin(fMin), bin(fMax)), / 1000;
  *   ratio: 10*roi/spec gated on roiPower > alarmThresh (note: the device
  *     gates on ROI power — the libosd library variant gates on spec);
  *   then the shared FSM.
  */
final class OsdAlg(s: OsdSettings = OsdSettings()) extends SdAlg {
  val name = s.name.getOrElse(s"OsdAlg-${s.mode}")
  private val fsm = new AlarmFsm(s.samplePeriod, s.warnTime, s.alarmTime)
  private var lastSpec = 0.0
  private var lastRoi = 0.0
  private var lastRatio = 0.0

  // spec/roi powers over a PRE-COMPUTED spectrum: the reference
  // recomputes np.fft.fft inside each get*Power call
  // (osdAlg.py:161-206) — up to 4 O(n²) DFTs per datapoint with flap
  // enabled — but nothing in the semantics requires that, so here the
  // DFT runs ONCE per accel buffer and every band power reads the same
  // re/im arrays. The per-band arithmetic below is unchanged, so the
  // emitted values are bit-identical to the recompute form.
  private def devSpecPower(re: Array[Double], im: Array[Double], n: Int): Double = {
    if (n == 0) return 0.0
    val fr = 1.0 / s.samplePeriod
    val nCut = (s.freqCutoff / fr).toInt
    val hi = if (s.specBinsFullRange) n else n / 2
    var p = 0.0
    var i = 1
    while (i < hi) {
      if (i <= nCut) p += Signal.magnitudeSq(re(i), im(i))
      i += 1
    }
    p / n / 2
  }

  private def devRoiPower(re: Array[Double], im: Array[Double], n: Int,
      fMin: Double, fMax: Double): Double = {
    if (n == 0) return 0.0
    val fr = 1.0 / s.samplePeriod
    val nMin = (fMin / fr).toInt
    val nMax = (fMax / fr).toInt
    if (nMax <= nMin) return 0.0
    var p = 0.0
    var i = nMin
    while (i < nMax) { p += Signal.magnitudeSq(re(i), im(i)); i += 1 }
    p / (nMax - nMin)
  }

  private def inAlarm(re: Array[Double], im: Array[Double], n: Int,
      fMin: Double, fMax: Double): Boolean = {
    lastSpec = devSpecPower(re, im, n) / s.accelScaleFactor
    lastRoi = devRoiPower(re, im, n, fMin, fMax) / s.accelScaleFactor
    val gate = if (s.gateOnSpec) lastSpec else lastRoi
    lastRatio =
      if (gate > s.alarmThresh) 10.0 * lastRoi / lastSpec else 0.0
    lastRatio > s.alarmRatioThresh
  }

  /** The flap second-band check (osdAlg.py:190-256): same spectrum
    * machinery, its own thresholds, and — as in the reference — it
    * does NOT clobber the reported main-band spec/roi/ratio (flap
    * values go to extraData there; here they stay local). */
  private def inFlapAlarm(re: Array[Double], im: Array[Double], n: Int,
      f: FlapSettings): Boolean = {
    val spec = devSpecPower(re, im, n) / s.accelScaleFactor
    val roi = devRoiPower(re, im, n, f.freqMin, f.freqMax) / s.accelScaleFactor
    val ratio = if (roi > f.thresh) 10.0 * roi / spec else 0.0
    ratio > f.ratioThresh
  }

  def processDp(dp: ReplayDp): AlgResult = {
    val fMin = s.alarmFreqMin; val fMax = s.alarmFreqMax
    def withFlap(acc: Array[Double]): Boolean = {
      val n = acc.length
      val (re, im) =
        if (n == 0) (Array.empty[Double], Array.empty[Double])
        else Signal.dft(acc)
      val main = inAlarm(re, im, n, fMin, fMax)
      // main-band evaluation FIRST so lastSpec/lastRoi/lastRatio report
      // the main band even when only the flap band alarms
      main || s.flap.exists(f => inFlapAlarm(re, im, n, f))
    }
    val alarm = s.mode match {
      case "V0" =>
        withFlap(dp.rawData)
      case "V4" =>
        if (dp.rawData3D.nonEmpty) {
          // per-axis: any axis alarming alarms the datapoint (the
          // reference ORs main and flap per axis — osdAlg.py:267-279)
          (0 to 2).exists(ax => withFlap(Signal.deinterleave(dp.rawData3D, ax)))
        } else withFlap(dp.rawData)
      case m => // V1 / V2 / V3 magnitude recomputed from 3D when present.
        // Stored-magnitude fallback: the device alg replays 'data' when
        // the 3D trace SUMS to zero (osdAlg.py:105 dataSum==0 — a sum
        // test, so cancelling ±axes also fall back); the v1 library alg
        // never sum-checks (osdAlg_v1.py:63-65 falls back only on an
        // EMPTY data3D — an all-zero trace stays a zero signal).
        val acc =
          if (dp.rawData3D.nonEmpty &&
              (!s.fallbackOnZeroSum || dp.rawData3D.sum != 0.0))
            Signal.magnitude3D(dp.rawData3D, m, s.offset)
          else dp.rawData
        withFlap(acc)
    }
    val st = fsm.step(alarm)
    AlgResult(st, fsm.alarmCount, lastSpec, lastRoi, lastRatio)
  }

  def reset(): Unit = { fsm.reset(); lastSpec = 0.0; lastRoi = 0.0; lastRatio = 0.0 }

  def snapshot: (Int, Double, Seq[Double]) = (fsm.alarmState, fsm.alarmCount, Seq.empty)

  def restore(alarmState: Int, alarmCount: Double, hist: Seq[Double]): Unit = {
    fsm.alarmState = alarmState; fsm.alarmCount = alarmCount
  }
}

case class HrSettings(
    mode: String = "MODE_SIMPLE",   // | MODE_ADAPTIVE_THRESHOLD | MODE_AVERAGE_HR
    name: Option[String] = None,    // config-injected (testRunner.py:136)
    threshHigh: Double = 150.0,
    threshLow: Double = 40.0,
    threshOffsetHigh: Double = 30.0,
    threshOffsetLow: Double = 20.0,
    movingAverageTimeWindowSecs: Double = 60.0,
    samplePeriod: Double = 5.0,
    warnTime: Double = 5.0,
    alarmTime: Double = 10.0)

/** W9 + FSM: heart-rate detector (testRunner/hrAlg.py). Missing HR (-1)
  * forces state -1 and resets the count; history keeps the last
  * window/5 values, averaging over non-missing entries only. */
final class HrAlg(s: HrSettings = HrSettings()) extends SdAlg {
  val name = s.name.getOrElse(s"HrAlg-${s.mode}")
  private val fsm = new AlarmFsm(s.samplePeriod, s.warnTime, s.alarmTime)
  private val histLen = (s.movingAverageTimeWindowSecs / 5.0).toInt
  private val hist = scala.collection.mutable.Queue.empty[Double]
  private var state = 0

  private def avgHr: Double = {
    var sum = 0.0; var n = 0
    hist.foreach { h => if (h != -1.0) { sum += h; n += 1 } }
    if (n > 0) sum / n else -1.0
  }

  def processDp(dp: ReplayDp): AlgResult = {
    val hr = if (dp.hr.isNaN) -1.0 else dp.hr
    hist.enqueue(hr)
    if (hist.size > histLen) hist.dequeue()
    if (hr == -1.0) {
      state = -1
      fsm.alarmCount = 0.0
      AlgResult(state, 0.0, 0.0, 0.0, 0.0)
    } else {
      val inAlarm = s.mode match {
        case "MODE_ADAPTIVE_THRESHOLD" =>
          val av = avgHr
          hr > av + s.threshOffsetHigh || hr < av - s.threshOffsetLow
        case "MODE_AVERAGE_HR" =>
          val av = avgHr
          av > s.threshHigh || av < s.threshLow
        case _ =>
          hr > s.threshHigh || hr < s.threshLow
      }
      // rejoin the shared FSM from the -1 excursion
      if (state == -1) { fsm.alarmState = 0 }
      state = fsm.step(inAlarm)
      AlgResult(state, fsm.alarmCount, 0.0, 0.0, 0.0)
    }
  }

  def reset(): Unit = { fsm.reset(); hist.clear(); state = 0 }

  def snapshot: (Int, Double, Seq[Double]) = (state, fsm.alarmCount, hist.toSeq)

  def restore(alarmState: Int, alarmCount: Double, h: Seq[Double]): Unit = {
    state = alarmState
    fsm.alarmState = if (alarmState == -1) 0 else alarmState
    fsm.alarmCount = alarmCount
    hist.clear(); hist.enqueueAll(h)
  }
}

/** Config-driven dispatch mirror of the reference's dynamic `module.Class`
  * loading (testRunner/testRunner.py:126-143): name → factory. */
object AlgRegistry {
  def create(spec: String): SdAlg = spec match {
    case s if s.startsWith("osd") || s.startsWith("Osd") =>
      val mode = s.split(":").lift(1).getOrElse("V2")
      new OsdAlg(OsdSettings(mode = mode))
    case s if s.toLowerCase.startsWith("hr") =>
      val mode = s.split(":").lift(1).getOrElse("MODE_SIMPLE")
      new HrAlg(HrSettings(mode = mode))
    case s if s.toLowerCase.startsWith("nn") =>
      // "nn[:sdThresh[:probThresh]]" — W8 buffer + F10 gate + stub model
      val parts = s.split(":")
      new NnAlg(NnSettings(
        sdThresh = parts.lift(1).map(_.toDouble).getOrElse(0.0),
        probThresh = parts.lift(2).map(_.toDouble).getOrElse(0.5)))
    case s if s.startsWith("device:loopback:") =>
      // S5 via the in-JVM device simulator wrapping an inner alg spec —
      // full wire protocol (packet serialize, handshake, verdict parse)
      val inner = s.stripPrefix("device:loopback:")
      new DeviceAlg(() => new LoopbackDeviceClient(create(inner)))
    case s if s.startsWith("device:") =>
      // S5 against a real app instance: "device:<addr[:port]>"
      new DeviceAlg(() => new HttpDeviceClient(s.stripPrefix("device:")))
    case other => throw new IllegalArgumentException(s"Unknown algorithm: $other")
  }
}
