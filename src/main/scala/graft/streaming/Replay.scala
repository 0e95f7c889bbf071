package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event replay through stateful detection algorithms (SURVEY §2.11,
  * testRunner/alg_runner.py:189-374), Spark-first:
  *
  *   - Batch: one group per event via `groupByKey(eventId).flatMapGroups`,
  *     datapoints sorted in-group by time (O1) — the strict per-event
  *     ordering the FSM requires (SURVEY §7.4.1). Each group runs on one
  *     task; events are independent, so 1000 executors replay 1000
  *     events concurrently with zero cross-talk.
  *   - Streaming: the SAME FSM core under `flatMapGroupsWithState`, keyed
  *     by eventId, with a processing-time timeout evicting finished
  *     events — exact batch/stream parity by construction.
  *
  * Manual-alarm datapoints (alarmState==5) are skipped, mirroring
  * alg_runner.py:296-299 (F11).
  */
object Replay {

  case class ReplayOut(
      eventId: String,
      tsSec: Long,
      alg: String,
      alarmState: Int,
      alarmCount: Double,
      specPower: Double,
      roiPower: Double,
      specRatio: Double)

  /** Batch replay: per-event time-ordered FSM run. algSpecs name
    * algorithms per [[AlgRegistry]] ("osd:V2", "hr:MODE_SIMPLE", ...). */
  def replayBatch(dps: Dataset[ReplayDp], algSpecs: Seq[String]): Dataset[ReplayOut] =
    replayBatchWith(dps, algSpecs.map(s => () => AlgRegistry.create(s)))

  /** Batch replay with EXPLICIT algorithm factories — the deployment
    * seam for algorithms that do not live in the static registry, e.g.
    * a just-trained model scorer ([[graft.ml.Trainer.scorer]]) wrapped
    * in an [[NnAlg]]. The factory closure serializes with the task
    * (model coefficients ride along), which a registry lookup on the
    * executors could not guarantee on a real cluster. Output rows are
    * labelled by each algorithm's own `name`, as ever. */
  def replayBatchWith(dps: Dataset[ReplayDp],
                      algs: Seq[() => SdAlg]): Dataset[ReplayOut] = {
    val spark = dps.sparkSession
    import spark.implicits._
    dps.groupByKey(_.eventId).flatMapGroups { (eventId, it) =>
      val sorted = it.toArray.sortBy(d => (d.tsSec, d.seq))
      algs.iterator.flatMap { factory =>
        val alg = factory()
        alg.reset()
        sorted.iterator
          .filter(_.alarmStateRecorded != 5L) // F11 manual-alarm skip
          .map { dp =>
            val r = alg.processDp(dp)
            ReplayOut(eventId, dp.tsSec, alg.name, r.alarmState, r.alarmCount,
              r.specPower, r.roiPower, r.specRatio)
          }
      }
    }
  }

  /** A5/A6: per-event detection outcome — did the algorithm ever reach
    * full ALARM (state 2)? Plus per-state datapoint counts. */
  def detectionStats(out: Dataset[ReplayOut]): DataFrame = {
    import org.apache.spark.sql.functions._
    out.groupBy("eventId", "alg")
      .agg(
        max(when(col("alarmState") === 2, 1).otherwise(0)).as("detected"),
        sum(when(col("alarmState") === 2, 1L).otherwise(0L)).as("nAlarm"),
        sum(when(col("alarmState") === 1, 1L).otherwise(0L)).as("nWarn"),
        count(lit(1)).as("nDp"))
  }

  /** Streaming state: FSM snapshot persisted between micro-batches. */
  case class FsmState(alarmState: Int, alarmCount: Double, hrHist: Seq[Double])

  /** Structured Streaming replay for a single algorithm spec. The same
    * AlarmFsm core runs inside flatMapGroupsWithState; state is the FSM
    * registers, so a restart resumes mid-event exactly. Within a
    * micro-batch datapoints are ordered by time; cross-batch ordering is
    * the source's responsibility (the reference replays stored events in
    * order — true late data is handled upstream by the P14 validator). */
  def replayStream(dps: Dataset[ReplayDp], algSpec: String): Dataset[ReplayOut] =
    replayStreamWith(dps, () => AlgRegistry.create(algSpec))

  /** [[replayStream]] with an explicit factory — the same deployment
    * seam as [[replayBatchWith]]: a trained-model scorer streams
    * through the identical FSM/state machinery (TrainerSpec pins the
    * stream == batch consistency law for a trained NnAlg). */
  def replayStreamWith(dps: Dataset[ReplayDp],
                       factory: () => SdAlg): Dataset[ReplayOut] = {
    val spark = dps.sparkSession
    import spark.implicits._
    dps.groupByKey(_.eventId)
      .flatMapGroupsWithState[FsmState, ReplayOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (eventId: String, it: Iterator[ReplayDp], state: GroupState[FsmState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val alg = factory()
            state.getOption.foreach(s =>
              alg.restore(s.alarmState, s.alarmCount, s.hrHist))
            val outs = it.toArray.sortBy(d => (d.tsSec, d.seq)).iterator
              .filter(_.alarmStateRecorded != 5L)
              .map { dp =>
                val r = alg.processDp(dp)
                ReplayOut(eventId, dp.tsSec, alg.name, r.alarmState, r.alarmCount,
                  r.specPower, r.roiPower, r.specRatio)
              }.toArray
            val (st, cnt, hist) = alg.snapshot
            state.update(FsmState(st, cnt, hist))
            state.setTimeoutDuration("10 minutes")
            outs.iterator
          }
      }
  }
}
