package graft

import org.apache.spark.sql.functions._

import graft.ml.{Forest, ModelIo, RunSequence, Trainer}
import graft.operators.FeatureExtract
import graft.sources.SimulatedEvents
import graft.sources.SimulatedEvents.{Component, EventSpec}

/** The random-forest model family (graft.ml.Forest) — the reference's
  * shipping DEFAULT modelClass (`rfModel.py`, `nnConfig.json:174`):
  * fixed-net JVM-vs-Catalyst scoring parity, node-graph validation,
  * MLlib training through the Trainer seam with the flattened export
  * matching MLlib's own transform, bit-exact ModelIo round-trip,
  * replay-FSM deployment, and the rf candidate winning a nested
  * cross-basis selection. */
class ForestSpec extends SparkSpec {

  // a small fixed forest over a 3-feature basis, every branch reachable
  private val fixedNet: Forest.ForestModel = {
    val t0 = Forest.Tree(
      feature = Array(0, 2, -1, -1, -1),
      threshold = Array(10.0, 5.0, 0, 0, 0),
      left = Array(1, 3, 0, 0, 0),
      right = Array(2, 4, 0, 0, 0),
      vote = Array(0, 0, 1.0, 0.25, 0.75))
    val t1 = Forest.Tree(
      feature = Array(1, -1, -1),
      threshold = Array(-3.0, 0, 0),
      left = Array(1, 0, 0),
      right = Array(2, 0, 0),
      vote = Array(0, 0.5, 0.125))
    Forest.ForestModel(Seq("a", "b", "c"), Array(t0, t1))
  }

  test("fixed net: JVM forward == Catalyst voteSumCol/scoreCol, every branch") {
    import spark.implicits._
    val rows = Seq(
      (1, 5.0, -7.0, 3.0), (2, 5.0, 2.0, 9.0), (3, 20.0, -7.0, 1.0),
      (4, 9.99, -3.0, 5.0), (5, 10.0, -2.99, 5.01), (6, 11.0, 0.0, 0.0))
    val df = rows.toDF("id", "a", "b", "c")
    val feats = Seq(col("a"), col("b"), col("c"))
    val got = df.select(col("id"),
        Forest.voteSumCol(fixedNet, feats).as("s"),
        Forest.scoreCol(fixedNet, feats).as("p"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (id, a, b, c) =>
      val x = Array(a, b, c)
      val s = fixedNet.trees.map(Forest.eval(_, x)).sum
      assert(got(id)._1 == s, s"row $id: voteSum ${got(id)._1} != $s")
      assert(got(id)._2 == Forest.forward(fixedNet, x),
        s"row $id: score ${got(id)._2}")
    }
    // both tree-0 leaves and both tree-1 leaves appear across the rows
    assert(got.values.map(_._1).toSet.size >= 4, "branch coverage too thin")
  }

  test("node-graph validation fails loudly") {
    // child pointing backward
    intercept[IllegalArgumentException](Forest.Tree(
      feature = Array(0, -1, -1), threshold = Array(1.0, 0, 0),
      left = Array(0, 0, 0), right = Array(2, 0, 0),
      vote = Array(0, 1.0, 0.0)))
    // NaN threshold on an internal node
    intercept[IllegalArgumentException](Forest.Tree(
      feature = Array(0, -1, -1), threshold = Array(Double.NaN, 0, 0),
      left = Array(1, 0, 0), right = Array(2, 0, 0),
      vote = Array(0, 1.0, 0.0)))
    // split on a feature beyond the named basis
    intercept[IllegalArgumentException](Forest.ForestModel(Seq("a"),
      Array(Forest.Tree(
        feature = Array(1, -1, -1), threshold = Array(1.0, 0, 0),
        left = Array(1, 0, 0), right = Array(2, 0, 0),
        vote = Array(0, 1.0, 0.0)))))
    // feature-column count must match the basis
    intercept[IllegalArgumentException](
      Forest.voteSumCol(fixedNet, Seq(lit(1.0))))
  }

  /** Planted-separable corpus (the TrainerSpec physics): tremor-band
    * seizures vs slow-sway normals. */
  private lazy val corpus = {
    val specs = (0 until 12).flatMap { i =>
      Seq(
        EventSpec(s"SZ$i", "seizure sim", typeStr = "seizure",
          durationSecs = 30.0,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("tremor", 0, 4.0 + (i % 3) * 0.1, 200.0 + 10.0 * i,
              22.5 * i, 2.0, 28.0))),
        EventSpec(s"OK$i", "normal sim", typeStr = "falseAlarm",
          durationSecs = 30.0,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("sway", 0, 0.4 + 0.02 * i, 40.0 + 5.0 * i,
              10.0 * i, 0.0, 1e9))))
    }
    SimulatedEvents(spark, specs)
  }

  private lazy val epochs = FeatureExtract.extract(corpus,
    FeatureExtract.Config(window = 125, step = 125, highPassHz = 0.0))

  test("train/export/deploy: MLlib forest learns; flattened export matches " +
    "transform; ModelIo round-trips bit-exactly; replay FSM fires on seizures") {
    val assembled = Trainer.assembleFeatures(epochs).cache()
    val trainDf = assembled.filter(expr("CAST(substring(eventId, 3) AS INT) % 2 = 0"))
    val heldOut = assembled.filter(expr("CAST(substring(eventId, 3) AS INT) % 2 = 1"))
    val cfg = Forest.Config(numTrees = 25, maxDepth = 6)
    val mllib = Forest.train(trainDf, cfg)

    // held-out separability through MLlib's own scoring
    val scored = mllib.transform(heldOut)
      .select(col("eventId"), col("label"),
        element_at(org.apache.spark.ml.functions.vector_to_array(
          col("probability")), 2).as("p_seizure"))
    val a = Trainer.auroc(scored)
    assert(a > 0.95, s"held-out AUROC only $a")

    // flattened export: mean-of-leaf-votes == MLlib's normalized votes
    // (probability and features collected in ONE row — eventId repeats
    // across epochs, so separate keyed maps would misalign rows)
    val names = graft.functions.EpochFeatures.FeatureNames
    val flat = Forest.fromMllib(mllib, names)
    assert(flat.nTrees == cfg.numTrees)
    val fv = mllib.transform(heldOut)
      .select(col("eventId"),
        element_at(org.apache.spark.ml.functions.vector_to_array(
          col("probability")), 2).as("p"),
        org.apache.spark.ml.functions.vector_to_array(col("features")).as("f"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    fv.foreach { case (id, mlP, x) =>
      val p = Forest.forward(flat, x)
      assert(math.abs(p - mlP) < 1e-12, s"$id: flattened $p vs MLlib $mlP")
    }

    // Catalyst batch scoring == JVM forward on the same vectors
    import spark.implicits._
    val featDf = fv.toSeq.zipWithIndex
      .map { case ((_, _, x), i) => (i, x.toSeq) }.toDF("rid", "f")
    val feats = names.indices.map(i => element_at(col("f"), i + 1))
    val colP = featDf.select(col("rid"), Forest.scoreCol(flat, feats).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    fv.zipWithIndex.foreach { case ((_, _, x), i) =>
      assert(colP(i) == Forest.forward(flat, x), s"row $i: scoreCol != forward")
    }

    // ModelIo round-trip: identical scores on every held-out vector
    val path = java.nio.file.Files.createTempDirectory("forestio")
      .resolve("rf.json").toString
    ModelIo.saveForest(flat, path)
    val back = ModelIo.loadForest(path)
    assert(back.featureNames == flat.featureNames)
    fv.foreach { case (id, _, x) =>
      assert(Forest.forward(back, x) == Forest.forward(flat, x),
        s"$id: round-trip drift")
    }

    // deploy: the flattened forest inside the replay FSM
    def replayAlarms(eventId: String): Long = {
      val dps = corpus.filter(_.eventId == eventId)
        .map(d => graft.streaming.ReplayDp(d.eventId, d.tsSec, d.hr,
          alarmStateRecorded = 0L, d.rawData, d.rawData3D, d.seq))(
          org.apache.spark.sql.Encoders.product[graft.streaming.ReplayDp])
      graft.streaming.Replay.replayBatchWith(dps,
          Seq(() => Trainer.deployedForest(flat)))
        .filter(col("alarmState") === 2).count()
    }
    assert(replayAlarms("SZ1") > 0, "trained forest never alarmed on a seizure")
    assert(replayAlarms("OK1") == 0, "trained forest false-alarmed on normal")
    assembled.unpersist()
  }

  test("nested selection: the rf candidate competes in the grid and beats a coin flip") {
    import spark.implicits._
    val events = (0 until 12).flatMap { i =>
      Seq((s"SZ$i", "Seizure", "other", i % 2, (i / 2) % 2),
        (s"OK$i", "False Alarm", "other", i % 2, (i / 2) % 2))
    }.toDF("id", "type", "subType", "ofold", "ifold")
    val rf = RunSequence.NestedCandidate.features("rf")(
      RunSequence.rfFamily(Forest.Config(numTrees = 15, maxDepth = 5)))
    val coin = RunSequence.NestedCandidate.features("coin_flip")(
      ((_: org.apache.spark.sql.DataFrame) => (),
       (_: Unit, test: org.apache.spark.sql.DataFrame) =>
         test.select(col("eventId"), col("label"),
           (abs(hash(col("eventId"))) % 1000).cast("double")
             .divide(1000.0).as("p_seizure"))))
    val results = RunSequence.runNestedBases(
      events, corpus, lit(true), col("ofold"), col("ifold"),
      outerK = 2, RunSequence.Config(k = 2))(Seq(rf, coin))
    results.foreach { r =>
      info(s"outer ${r.outerFold}: chosen=${r.chosen} inner=${r.innerMeanAuroc}")
      assert(r.chosen == "rf", s"inner CV chose ${r.chosen}")
      assert(r.outer.heldOutAuroc > 0.9,
        s"outer ${r.outerFold}: AUROC ${r.outer.heldOutAuroc}")
    }
  }

  test("weighted training: the M13 weight column rides MLlib's weightCol") {
    // subType matches the SEIZURE events only — a weight that scaled
    // every row uniformly would leave impurity ratios (and the forest)
    // unchanged by construction
    val assembled = Trainer.assembleFeatures(epochs)
      .withColumn("subType",
        when(col("eventId").startsWith("SZ"), "tonicClonic")
          .otherwise("other"))
    // all-1.0 weights == unweighted, bit-identical forests
    val w1 = assembled.withColumn("w",
      Trainer.subtypeWeightCol(Map("tonicclonic" -> 1.0)))
    val cfg = Forest.Config(numTrees = 10, maxDepth = 4)
    val names = graft.functions.EpochFeatures.FeatureNames
    val m0 = Forest.fromMllib(Forest.train(assembled, cfg), names)
    val m1 = Forest.fromMllib(Forest.train(w1, cfg, Some("w")), names)
    val probe = Array.fill(names.size)(0.5)
    assert(Forest.forward(m0, probe) == Forest.forward(m1, probe),
      "all-1.0 weights changed the forest")
    // a real up-weight changes at least the vote distribution
    val w2 = assembled.withColumn("w",
      Trainer.subtypeWeightCol(Map("tonicclonic" -> 8.0)))
    val m2 = Forest.fromMllib(Forest.train(w2, cfg, Some("w")), names)
    val moved = m0.trees.zip(m2.trees).exists { case (a, b) =>
      !a.vote.sameElements(b.vote) || !a.threshold.sameElements(b.threshold)
    }
    assert(moved, "an 8x class weight left every tree untouched")
  }
}
