package graft.operators

import org.apache.spark.sql.Dataset
import graft.functions.{EpochFeatures, Filters, Signal}
import graft.model.Osdb
import graft.operators.Flatten.FlatDp

/** The feature-extraction stage (SURVEY §3.1 / §2.5 W5 + §2.9 P8/P12/P13,
  * nnTraining2/extractFeatures.py:144-212,265-561):
  *
  *   group by event → sort by time → interpolate HR/O2 onto the 25 Hz
  *   sample timebase (P13) → optional 0.5 Hz order-2 high-pass (P8) →
  *   sliding epochs of `window` samples stepping `step` (W5) → the
  *   P12 feature vector per epoch.
  *
  * Spark shape: flatMapGroups keyed by eventId — the reference's
  * multiprocessing.Pool per-event fan-out becomes tasks-per-group; no
  * file handoffs between stages, one lineage end to end. Features are a
  * map column (select into columns via [[EpochFeatures.FeatureNames]]).
  */
object FeatureExtract {

  case class EpochRow(
      eventId: String,
      userId: String,
      typeStr: String,
      `type`: Int,
      tsSec: Long,              // time of the epoch's last sample's datapoint
      osdAlarmState: Long,
      osdSpecPower: Double,
      osdRoiPower: Double,
      hr: Double,
      o2sat: Double,
      startSample: Int,
      endSample: Int,
      features: Map[String, Double])

  case class Config(
      window: Int = 125,        // nnConfig.json dataProcessing defaults
      step: Int = 125,
      highPassHz: Double = 0.5, // 0 disables
      sampleFreq: Double = 25.0)

  /** `validate = true` runs the P14 continuity pass
    * ([[Flatten.validateGroupSorted]]) inside THIS group iteration —
    * `extract(validateAndFill(dps))` semantics at ONE per-event shuffle
    * instead of two (RunSequenceSpec pins the equality). The composed
    * training pipeline ([[graft.ml.RunSequence]]) always wants both;
    * standalone P14 callers keep [[Flatten.validateAndFill]]. */
  def extract(dps: Dataset[FlatDp], cfg: Config = Config(),
              validate: Boolean = false): Dataset[EpochRow] = {
    val spark = dps.sparkSession
    import spark.implicits._
    val n = Osdb.SamplesPerDatapoint
    dps.groupByKey(_.eventId).flatMapGroups { (eventId, it) =>
      val sorted0 = it.toArray.sortBy(d => (d.tsSec, d.seq))
      val sorted =
        if (validate) Flatten.validateGroupSorted(sorted0) else sorted0
      if (sorted.isEmpty) Iterator.empty
      else {
        val nDp = sorted.length
        val total = nDp * n
        // concatenate axes; absent 3D data contributes zero axes, exactly
        // like the reference's zero-filled X/Y/Z CSV columns
        val x = new Array[Double](total)
        val y = new Array[Double](total)
        val z = new Array[Double](total)
        var d = 0
        while (d < nDp) {
          val a3 = sorted(d).rawData3D
          if (a3 != null && a3.length >= 3) {
            var i = 0
            val m = math.min(n, a3.length / 3)
            while (i < m) {
              x(d * n + i) = a3(3 * i)
              y(d * n + i) = a3(3 * i + 1)
              z(d * n + i) = a3(3 * i + 2)
              i += 1
            }
          }
          d += 1
        }
        // P13: per-datapoint HR/O2 anchored at each datapoint's last
        // sample, linearly interpolated across the sample timebase
        val anchor = Array.tabulate(nDp)(i => (i * n + n - 1).toDouble)
        val hrS = Signal.interpOnto(total, anchor, sorted.map(_.hr))
        val o2S = Signal.interpOnto(total, anchor, sorted.map(_.o2sat))
        // P8 high-pass each axis over the whole event record
        val (fx, fy, fz) =
          if (cfg.highPassHz > 0) {
            val bq = Filters.butterHighPass(cfg.highPassHz, cfg.sampleFreq)
            (Filters.filtfilt(bq, x), Filters.filtfilt(bq, y), Filters.filtfilt(bq, z))
          } else (x, y, z)

        // W5 sliding epochs
        (0 to total - cfg.window by cfg.step).iterator.map { start =>
          val end = start + cfg.window
          val ex = fx.slice(start, end)
          val ey = fy.slice(start, end)
          val ez = fz.slice(start, end)
          val feats = EpochFeatures.epochFeatures(ex, ey, ez, cfg.sampleFreq)
          val lastDp = sorted(math.min((end - 1) / n, nDp - 1))
          EpochRow(eventId, lastDp.userId, lastDp.typeStr, lastDp.`type`,
            lastDp.tsSec, lastDp.osdAlarmState, lastDp.osdSpecPower,
            lastDp.osdRoiPower, hrS(end - 1), o2S(end - 1),
            start, end, feats)
        }
      }
    }
  }
}
