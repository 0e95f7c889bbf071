package graft.streaming

import org.apache.spark.sql.Dataset
import graft.model.Osdb
import graft.operators.Flatten.FlatDp
import graft.operators.Spectrogram

/** W8/M8: the neural-net input path — a cross-datapoint rolling sample
  * buffer emitting fixed-length vectors — plus the NnAlg detector shell
  * that drives it inside the replay FSM.
  *
  * Reference:
  *   - buffer: user_tools/nnTraining2/deepEpiCnnModel_torch.py:249-286 —
  *     append each datapoint's 125 samples, keep the last bufferSamples
  *     (bufferSeconds * sampleFreq = 30 * 25 = 750), return None until
  *     full, then the last 750 samples divided by 1000 (mG → G),
  *     optionally z-normalised (sigma == 0 → mean-centre only);
  *   - per-event reset: user_tools/testRunner/nnAlg.py:193-199
  *     (resetAlg → resetAccBuf);
  *   - datapoint gating: nnAlg.py:100-121 — missing accel rejected, then
  *     the F10 low-motion rejection (std% of mean < sdThresh).
  *
  * The model itself (PyTorch CNN) cannot run in this engine's
  * dependency-free container, so [[NnAlg]] takes a pluggable
  * `score: Array[Double] => Double`; the default [[NnAlg.stubScore]] is a
  * clearly-labelled deterministic stand-in (NOT the reference model) that
  * maps the vector's variance through a logistic — enough to exercise the
  * buffer, gating, thresholding, and FSM end to end.
  */
object NnBuffer {

  /** Ring buffer over datapoint samples (appendToAccBuf/accData2vector). */
  final class AccBuffer(val bufferSamples: Int = 750) extends Serializable {
    private var buf = new Array[Double](0)

    def reset(): Unit = { buf = new Array[Double](0) }

    /** Buffer contents for streaming state snapshots (mG domain). */
    def contents: Seq[Double] = buf.toSeq

    /** Restore from a snapshot taken with [[contents]]. */
    def restore(samples: Seq[Double]): Unit = {
      buf = new Array[Double](0)
      if (samples.nonEmpty) append(samples.toArray)
    }

    def append(accData: Array[Double]): Unit = {
      val merged = new Array[Double](math.min(buf.length + accData.length, bufferSamples))
      val keepOld = merged.length - math.min(accData.length, merged.length)
      val newTail = math.min(accData.length, merged.length)
      Array.copy(buf, buf.length - keepOld, merged, 0, keepOld)
      Array.copy(accData, accData.length - newTail, merged, keepOld, newTail)
      buf = merged
    }

    /** Append then emit the full window in G, or null while filling. */
    def accData2vector(accData: Array[Double], normalise: Boolean): Array[Double] = {
      append(accData)
      if (buf.length < bufferSamples) null
      else {
        val vec = new Array[Double](bufferSamples)
        var i = 0
        while (i < bufferSamples) { vec(i) = buf(i) / 1000.0; i += 1 }
        if (normalise) {
          val m = graft.functions.Signal.mean(vec)
          val sd = graft.functions.Signal.std(vec)
          i = 0
          if (sd != 0.0) while (i < bufferSamples) { vec(i) = (vec(i) - m) / sd; i += 1 }
          else while (i < bufferSamples) { vec(i) = vec(i) - m; i += 1 }
        }
        vec
      }
    }
  }

  case class NnVector(
      eventId: String,
      tsSec: Long,
      seq: Long,
      vec: Array[Double])

  /** M8 dp2vector over a whole dataset: per event, time-sorted datapoints
    * stream through one buffer (reset at the event boundary); datapoints
    * failing the F10 gate or lacking accel data emit nothing but do NOT
    * reset the buffer (nnAlg.py:100-121 returns None, buffer untouched).
    *
    * flatMapGroups: one event per task, no cross-event state — the
    * 1000-executor layout falls out of the grouping. */
  def dp2vectors(dps: Dataset[FlatDp], bufferSamples: Int = 750,
                 normalise: Boolean = false, sdThresh: Double = 0.0): Dataset[NnVector] = {
    val spark = dps.sparkSession
    import spark.implicits._
    dps.groupByKey(_.eventId).flatMapGroups { (eventId, it) =>
      val sorted = it.toArray.sortBy(d => (d.tsSec, d.seq))
      val buf = new AccBuffer(bufferSamples)
      sorted.iterator.flatMap { dp =>
        if (dp.rawData == null || dp.rawData.isEmpty) Iterator.empty
        else if (Spectrogram.rejectLowMotion(dp.rawData, sdThresh)) Iterator.empty
        else {
          val v = buf.accData2vector(dp.rawData, normalise)
          if (v == null) Iterator.empty
          else Iterator(NnVector(eventId, dp.tsSec, dp.seq, v))
        }
      }
    }
  }
}

case class NnSettings(
    bufferSamples: Int = 750,         // 30 s at 25 Hz
    name: Option[String] = None,      // config-injected (testRunner.py:136)
    normalise: Boolean = false,
    sdThresh: Double = 0.0,           // F10 gate; 0 disables
    probThresh: Double = 0.5,
    samplePeriod: Double = 5.0,
    warnTime: Double = 5.0,
    alarmTime: Double = 10.0)

/** The NN detector shell (testRunner/nnAlg.py): dp → buffer vector →
  * model probability → probThresh → shared alarm FSM. `score` stands in
  * for the PyTorch model — see [[NnBuffer]] scaladoc. */
final class NnAlg(s: NnSettings = NnSettings(),
                  score: Array[Double] => Double = NnAlg.stubScore)
    extends SdAlg {
  val name = s.name.getOrElse("NnAlg")
  private val fsm = new AlarmFsm(s.samplePeriod, s.warnTime, s.alarmTime)
  private val buf = new NnBuffer.AccBuffer(s.bufferSamples)
  private var lastP = 0.0

  def processDp(dp: ReplayDp): AlgResult = {
    val acc = dp.rawData
    val vec =
      if (acc == null || acc.isEmpty) null
      else if (Spectrogram.rejectLowMotion(acc, s.sdThresh)) null
      else buf.accData2vector(acc, s.normalise)
    if (vec == null) {
      // invalid / still filling: state unchanged, pSeizure undefined
      AlgResult(fsm.alarmState, fsm.alarmCount, 0.0, 0.0, lastP)
    } else {
      lastP = score(vec)
      val st = fsm.step(lastP >= s.probThresh)
      AlgResult(st, fsm.alarmCount, 0.0, 0.0, lastP)
    }
  }

  def reset(): Unit = { fsm.reset(); buf.reset(); lastP = 0.0 }

  /** The hist slot carries the rolling buffer — without it a streaming
    * state round-trip (Replay.replayStream micro-batch boundary) would
    * restart the 750-sample window empty and the detector would go
    * blind for the next ~5 datapoints. */
  def snapshot: (Int, Double, Seq[Double]) =
    (fsm.alarmState, fsm.alarmCount, buf.contents)

  def restore(alarmState: Int, alarmCount: Double, hist: Seq[Double]): Unit = {
    fsm.alarmState = alarmState; fsm.alarmCount = alarmCount
    buf.restore(hist)
  }
}

object NnAlg {
  /** DETERMINISTIC STUB — not the reference CNN (no torch in-container).
    * Logistic over the vector's std in G: quiet ~0, violent motion ~1. */
  def stubScore(vec: Array[Double]): Double = {
    val sd = graft.functions.Signal.std(vec)
    1.0 / (1.0 + math.exp(-(sd - 0.25) * 20.0))
  }
}
