package graft.config

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.ConfigBridge.{Doc, HrTrace, TestRunnerAlg, TestRunnerConfig}
import graft.ml.RunSequence
import graft.operators.EventFilters
import graft.operators.Flatten.FlatDp
import graft.streaming.{Replay, ReplayDp}

/** The tool COMPOSITIONS the reference's CLI mains execute, as
  * library functions — one per driver entry point, shared verbatim by
  * the oracled gate queries (cfg1/cfg2) and the [[graft.Run]] CLI so
  * the command line and the correctness gate cannot drift:
  *
  *   - [[runseqFrame]] — `runSequence.py:799` run_sequence: parsed
  *     config → event filters + dataProcessing knobs → the k-fold
  *     skeleton with the modelClass dispatch receipt (cfg1's frame).
  *   - [[testrunnerFrame]] — `testRunner.py:37-147` runTest: parsed
  *     testConfig → enabled detector factories → batch replay →
  *     per-(event, algorithm) detection stats (cfg2's frame).
  *
  * Everything here is plan construction + the already-audited
  * skeleton/replay lineages; no new data-plane shapes.
  */
object ConfigTools {

  /** run_sequence's data path (runSequence.py:938-1040: selectData →
    * flatten → extract/augment/history → k-fold split), composed from
    * a PARSED config doc over caller-supplied event/datapoint frames.
    * `k` comes from the caller exactly as the reference takes fold
    * count from the CLI (`runSequence.py:801 args['kfold']`), not the
    * config file. Emits the skeleton's (fold, stage, n_events,
    * n_epochs) frame plus the model-class dispatch receipt row — the
    * importlib-string resolution (fail-loud) recorded as data. */
  def runseqFrame(doc: Doc, events: DataFrame, dps: Dataset[FlatDp],
                  foldOf: Column, k: Int): DataFrame = {
    val efc = ConfigBridge.eventFilters(doc)
    val dp = ConfigBridge.dataProcessing(doc)
    val cfg = ConfigBridge.runSequenceConfig(dp, k)
    // the importlib-string dispatch must RESOLVE (fail-loud wiring);
    // the receipt row pins which family+basis the file selected
    val cand = RunSequence.NestedCandidate.forModelClass(
      ConfigBridge.modelClass(doc), ConfigBridge.subtypeWeights(doc))
    val skel = RunSequence.skeleton(
      events, dps,
      select = EventFilters.compile(efc),
      foldOf = foldOf,
      cfg = cfg)
    val receipt = events.sparkSession.range(1).select(
      lit(-1L).as("fold"),
      lit(s"model_class:${cand.name}:${cand.basis}").as("stage"),
      lit(0L).as("n_events"), lit(0L).as("n_epochs"))
    skel.unionByName(receipt)
  }

  /** The reference's result column naming over [[Replay.detectionStats]]
    * — shared by both farm frames so the CLI outputs cannot drift. */
  private def statsFrame(dps: Dataset[ReplayDp],
                         algs: Seq[() => graft.streaming.SdAlg]): DataFrame =
    Replay.detectionStats(Replay.replayBatchWith(dps, algs))
      .select(col("eventId").as("event_id"), col("alg"),
        col("detected").cast("long").as("detected"),
        col("nAlarm").as("n_alarm"), col("nWarn").as("n_warn"),
        col("nDp").as("n_dp"))

  /** runTest's replay path (testRunner.py:126-150: instantiate each
    * enabled `module.Class(settingsStr)`, run every event through
    * every algorithm, tally results): config-built detector factories
    * → [[Replay.replayBatchWith]] (one fresh detector per (event,
    * alg) group on the executors) → [[Replay.detectionStats]], in the
    * reference's result column naming. */
  def testrunnerFrame(cfg: TestRunnerConfig, dps: Dataset[ReplayDp],
                      modelDir: String = "."): DataFrame =
    statsFrame(dps, ConfigBridge.enabledAlgFactories(cfg, modelDir))

  /** testDeviceHrAlg.py's replay path (runTest:28-58 +
    * makeEventObj:134-161): each `eventHrData` trace becomes a
    * synthetic seizure event — one datapoint per hrVal, the constant
    * dataTime the reference pins ("2023-04-30T00:00:00Z"), a flat
    * 1000 mg 125-sample buffer — replayed through every ENABLED
    * algorithm by the same [[Replay.replayBatchWith]] lineage as
    * [[testrunnerFrame]]. The replay is keyed by the trace's LIST
    * ORDINAL, not its id, so duplicate-id entries stay separate events
    * exactly as the reference's list iteration keeps them; the output
    * carries the trace's real `event_id` and `name`. The trace list is
    * config-sized (driver-side by nature, like the reference's), the
    * replay itself is the audited distributed path. */
  def deviceHrFrame(spark: SparkSession, algs: Seq[TestRunnerAlg],
                    traces: Seq[HrTrace],
                    modelDir: String = "."): DataFrame = {
    import spark.implicits._
    val t0 = 1682812800L // dateStr2secs("2023-04-30T00:00:00Z")
    val dps = spark.createDataset(traces.zipWithIndex.flatMap {
      case (t, ti) =>
        t.hrVals.zipWithIndex.map { case (h, i) =>
          ReplayDp(ti.toString, t0, h, 0L,
            Array.fill(125)(1000.0), Array.emptyDoubleArray, i.toLong)
        }
    })
    val meta = traces.zipWithIndex
      .map { case (t, ti) => (ti.toString, t.id.toString, t.name) }
      .toDF("event_id", "__tid", "name")
    statsFrame(dps, algs.filter(_.enabled)
        .map(a => () => ConfigBridge.buildAlg(a, modelDir)))
      .join(broadcast(meta), "event_id")
      .select(col("__tid").as("event_id"), col("name"), col("alg"),
        col("detected"), col("n_alarm"), col("n_warn"), col("n_dp"))
  }
}
