package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.{Cnn, ConvPipe, RunSequence}
import graft.sources.SimulatedEvents
import graft.sources.SimulatedEvents.{Component, EventSpec}

/** The round-14 verdict's item 4: a FULL cross-basis nested selection
  * with the COMPOSED pipe in the candidate set — the most expensive
  * selection the engine can express (outerK × candidates × innerK
  * trainings, two bases extracted) — timed at probe scale, with the
  * cost-model check the docblock claims: each basis is extracted ONCE
  * per nested run (one lineage each), so extraction stays a one-off
  * additive term while training scales with the candidate grid.
  *
  * `runMain graft.tools.NestedPipeProbe [nEventPairs] [durationSecs]`
  * (defaults 24, 30.0 — 48 events; outer 2 × 3 candidates × inner 2 =
  * 12 inner trainings + 2 winner retrains).
  */
object NestedPipeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(24)
    val dur = args.lift(1).map(_.toDouble).getOrElse(30.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the narrow-band planted corpus from RunSequenceSpec (fold hash
    // decoupled from the physics sweep — the r13 aliasing lesson)
    val specs = (0 until n).flatMap { i =>
      Seq(
        EventSpec(s"SZ$i", "seizure sim", typeStr = "seizure",
          durationSecs = dur,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("tremor", 0, 4.0 + (i % 3) * 0.1, 200.0 + 10.0 * i,
              22.5 * i, 2.0, 28.0))),
        EventSpec(s"OK$i", "normal sim", typeStr = "falseAlarm",
          durationSecs = dur,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("sway", 0, 0.4 + 0.02 * i, 40.0 + 5.0 * i,
              10.0 * i, 0.0, 1e9))))
    }
    val corpus = SimulatedEvents(spark, specs)
    val events = (0 until n).flatMap { i =>
      Seq((s"SZ$i", "Seizure", "other", i % 2, (i / 2) % 2),
        (s"OK$i", "False Alarm", "other", i % 2, (i / 2) % 2))
    }.toDF("id", "type", "subType", "ofold", "ifold")

    // round 16: the THIRD basis joins the grid — all three bases
    // extracted in one nested run, 4 candidates × outer 2 × inner 2
    val specCfg = graft.ml.SpecCnn.Config(channels = Seq(2, 2), maxIter = 60)
    val candidates = Seq(
      RunSequence.NestedCandidate.features("mlp_features")(
        RunSequence.mlpFamily(hidden = Seq(16, 8), maxIter = 60)),
      RunSequence.NestedCandidate.windows("cnn_window")(
        RunSequence.cnnFamily(
          Cnn.Config(nFilters = 3, width = 9, maxIter = 60))),
      RunSequence.NestedCandidate.windows("convpipe_window")(
        ConvPipe.convPipeFamily(ConvPipe.Config(
          blocks = Seq(ConvPipe.BlockSpec(2, 3), ConvPipe.BlockSpec(2, 3)),
          h1 = 2, h2 = 2, head = "mha", nHeads = 2, bidir = true,
          maxIter = 60))),
      RunSequence.NestedCandidate.spectrogram("speccnn_spectrogram")(
        RunSequence.specFamily(specCfg, windowSamples = 125)))

    val t0 = System.nanoTime()
    val results = RunSequence.runNestedBases(
      events, corpus, lit(true), col("ofold"), col("ifold"),
      outerK = 2, RunSequence.Config(k = 2), bufferSamples = 125,
      specCfg = specCfg)(candidates)
    val wall = (System.nanoTime() - t0) / 1e9
    System.err.println(
      f"[nestedpipe] events=${2 * n} outerK=2 innerK=2 " +
        f"candidates=${candidates.size} wall=$wall%8.2f s")
    results.foreach { r =>
      System.err.println(
        f"[nestedpipe] outer=${r.outerFold} chosen=${r.chosen} " +
          f"heldOut=${r.outer.heldOutAuroc}%.4f inner=" +
          r.innerMeanAuroc.toSeq.sortBy(_._1)
            .map { case (k, v) => f"$k=$v%.4f" }.mkString(","))
    }
    spark.stop()
  }
}
