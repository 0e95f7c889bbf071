package graft

import org.apache.spark.sql.functions._

import graft.ml.Trainer
import graft.operators.FeatureExtract
import graft.sources.SimulatedEvents
import graft.sources.SimulatedEvents.{Component, EventSpec}
import graft.streaming.{NnAlg, NnSettings, Replay}

/** The in-engine training stage (graft.ml.Trainer): P12 feature
  * assembly → distributed logistic regression → event scoring → the
  * trained model deployed back into the NnAlg replay FSM — the full
  * train/deploy loop the reference runs through nnTrainer.py +
  * testRunner, on a planted-separable simulated corpus. */
class TrainerSpec extends SparkSpec {

  /** 16 seizure events (3-6 Hz tremor bursts over gravity, varying
    * amplitude/freq/phase by index) + 16 normal (gravity with a slow
    * sway) — separable in the ROI bands by construction, exactly the
    * physics the detector exploits. */
  private lazy val corpus = {
    val specs = (0 until 16).flatMap { i =>
      Seq(
        EventSpec(s"SZ$i", "seizure sim", typeStr = "seizure",
          durationSecs = 60.0,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("tremor", 0, 3.0 + (i % 4) * 0.8, 200.0 + 10.0 * i,
              22.5 * i, 5.0, 55.0))),
        EventSpec(s"OK$i", "normal sim", typeStr = "falseAlarm",
          durationSecs = 60.0,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("sway", 0, 0.4 + 0.02 * i, 40.0 + 5.0 * i,
              10.0 * i, 0.0, 1e9))))
    }
    SimulatedEvents(spark, specs)
  }

  private lazy val epochs = FeatureExtract.extract(corpus,
    FeatureExtract.Config(window = 125, step = 125, highPassHz = 0.0))

  test("assembleFeatures: fixed P12 order, binary label, loud on a missing feature") {
    import spark.implicits._
    val a = Trainer.assembleFeatures(epochs)
    assert(a.columns.toSeq == Seq("eventId", "type", "label", "features"))
    val labels = a.select("eventId", "label").distinct().collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(labels.filter(_._1.startsWith("SZ")).values.forall(_ == 1.0))
    assert(labels.filter(_._1.startsWith("OK")).values.forall(_ == 0.0))
    val n = graft.functions.EpochFeatures.FeatureNames.size
    assert(a.select("features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
      .size == n)
    // a hole in the feature map must fail loudly, not train silently
    val holed = epochs.toDF()
      .withColumn("features", map_filter(col("features"),
        (k, _) => k =!= graft.functions.EpochFeatures.FeatureNames.head))
      .as[FeatureExtract.EpochRow](epochs.encoder)
    val e = intercept[Exception](
      Trainer.assembleFeatures(holed).collect())
    assert(e.getMessage != null)
  }

  test("train/score/deploy: separable corpus learns, replay FSM fires on seizures only") {
    val assembled = Trainer.assembleFeatures(epochs).cache()
    // event-disjoint split: train on even-indexed events, hold out odd
    val trainDf = assembled.filter(expr("CAST(substring(eventId, 3) AS INT) % 2 = 0"))
    val heldOut = assembled.filter(expr("CAST(substring(eventId, 3) AS INT) % 2 = 1"))
    val model = Trainer.trainLogistic(trainDf)

    // held-out epoch AUROC: planted separability must be learnable
    val scored = model.transform(heldOut)
      .select(col("eventId"), col("label"),
        element_at(org.apache.spark.ml.functions.vector_to_array(
          col("probability")), 2).as("p_seizure"))
    val a = Trainer.auroc(scored)
    assert(a > 0.97, s"held-out AUROC only $a")

    // event-level rollup: every held-out event classifies correctly at 0.5
    val events = Trainer.scoreEvents(model, heldOut).collect()
    events.foreach { r =>
      val correct = (r.getDouble(1) == 1.0) == (r.getDouble(2) >= 0.5)
      assert(correct, s"event ${r.getString(0)}: label=${r.getDouble(1)} " +
        s"p_max=${r.getDouble(2)}")
    }

    // deploy: the trained scorer inside the SAME alarm FSM the
    // reference replays — seizure events must reach ALARM, normals not.
    // deployedAlg is the contract-safe pairing (bufferSamples pinned to
    // the training window, normalise forced false)
    def replayAlarms(eventId: String): Long = {
      import spark.implicits._
      val dps = corpus.filter(_.eventId == eventId)
        .map(d => graft.streaming.ReplayDp(d.eventId, d.tsSec, d.hr,
          alarmStateRecorded = 0L, d.rawData, d.rawData3D, d.seq))
      Replay.replayBatchWith(dps, Seq(() => Trainer.deployedAlg(model)))
        .filter(col("alarmState") === 2).count()
    }
    assert(replayAlarms("SZ1") > 0, "trained detector never alarmed on a seizure")
    assert(replayAlarms("OK1") == 0, "trained detector false-alarmed on normal")
    assembled.unpersist()
  }

  private lazy val model0 = Trainer.trainLogistic(
    Trainer.assembleFeatures(epochs))

  test("MLP: a real neural network learns the planted corpus through the same seam") {
    val assembled = Trainer.assembleFeatures(epochs).cache()
    val trainDf = assembled.filter(expr("CAST(substring(eventId, 3) AS INT) % 2 = 0"))
    val heldOut = assembled.filter(expr("CAST(substring(eventId, 3) AS INT) % 2 = 1"))
    val mlp = Trainer.trainMlp(trainDf)
    // held-out epoch AUROC through the distributed evaluator
    val scored = mlp.model.transform(
        heldOut.withColumn("features", udf {
          (v: org.apache.spark.ml.linalg.Vector) =>
            val a = v.toArray
            org.apache.spark.ml.linalg.Vectors.dense(Array.tabulate(a.length)(
              i => (a(i) - mlp.mean(i)) / mlp.std(i)))
        }.apply(col("features"))))
      .select(col("eventId"), col("label"),
        element_at(org.apache.spark.ml.functions.vector_to_array(
          col("probability")), 2).as("p_seizure"))
    val a = Trainer.auroc(scored)
    assert(a > 0.97, s"MLP held-out AUROC only $a")
    // serve-time scorer == the model's own probability on the same
    // window basis, and deployment drives the FSM correctly
    def replayAlarms(eventId: String): Long = {
      import spark.implicits._
      val dps = corpus.filter(_.eventId == eventId)
        .map(d => graft.streaming.ReplayDp(d.eventId, d.tsSec, d.hr, 0L,
          d.rawData, d.rawData3D, d.seq))
      Replay.replayBatchWith(dps, Seq(() => Trainer.deployedMlp(mlp)))
        .filter(col("alarmState") === 2).count()
    }
    assert(replayAlarms("SZ3") > 0, "MLP detector never alarmed on a seizure")
    assert(replayAlarms("OK3") == 0, "MLP detector false-alarmed on normal")
    assembled.unpersist()
  }

  test("multiclass: multinomial LR learns a 3-class planted corpus; event vote + confusion") {
    import spark.implicits._
    // three physically distinct classes (the C4 label space: nda -> 0,
    // seizure -> 1, anything else -> 2): ROI-band tremor vs slow sway
    // vs a high-band buzz. Physics sweeps by i%3, fold by i%2 —
    // DECOUPLED (the r13 aliasing lesson), so the held-out fold sees
    // only frequencies inside the trained band.
    val specs = (0 until 12).flatMap { i =>
      Seq(
        EventSpec(s"SZ$i", "seizure sim", typeStr = "seizure",
          durationSecs = 60.0,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("tremor", 0, 4.0 + (i % 3) * 0.1, 200.0 + 10.0 * i,
              22.5 * i, 5.0, 55.0))),
        EventSpec(s"OK$i", "normal sim", typeStr = "nda",
          durationSecs = 60.0,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("sway", 0, 0.4 + 0.02 * (i % 3), 40.0 + 5.0 * i,
              10.0 * i, 0.0, 1e9))),
        EventSpec(s"UN$i", "buzz sim", typeStr = "unknown",
          durationSecs = 60.0,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("buzz", 0, 9.0 + (i % 3) * 0.2, 150.0 + 10.0 * i,
              15.0 * i, 5.0, 55.0))))
    }
    val c3 = SimulatedEvents(spark, specs)
    val ep3 = FeatureExtract.extract(c3,
      FeatureExtract.Config(window = 125, step = 125, highPassHz = 0.0))
    val a = Trainer.assembleFeaturesK(ep3).cache()
    // K-class labels really span {0, 1, 2}
    val lbls = a.select("label").distinct().collect()
      .map(_.getDouble(0)).toSet
    assert(lbls == Set(0.0, 1.0, 2.0), s"labels $lbls")
    def foldOf = expr("CAST(substring(eventId, 3) AS INT) % 2")
    val train = a.filter(foldOf === 0)
    val heldOut = a.filter(foldOf === 1)
    val m = Trainer.trainMulticlass(train, maxIter = 80, regParam = 0.001)
    assert(m.numClasses == 3)
    val ev = Trainer.predictEventsK(m, heldOut).cache()
    val n = ev.count()
    assert(n == 18, s"expected 18 held-out events, got $n")
    val correct = ev.filter(col("pred") === col("label")).count()
    assert(correct >= 16,
      s"held-out 3-class event accuracy only $correct/$n")
    // the A6 tie-in: confusion matrix is diagonal-dominant per class
    val conf = ev.groupBy("label", "pred").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 to 2).foreach { cl =>
      val diag = conf.getOrElse((cl, cl), 0L)
      val offs = conf.filter { case ((l, p), _) => l == cl && p != cl }
        .values.sum
      assert(diag > offs, s"class $cl: diag $diag vs off $offs ($conf)")
    }
    ev.unpersist(); a.unpersist()
  }

  test("auroc: distributed two-phase rank == global-window form, tie-heavy and hand cases") {
    import spark.implicits._
    // hand case: scores (.1,.1,.2), labels (0,1,1) -> ranks (1.5,1.5,3),
    // rankSumPos = 4.5, AUROC = (4.5 - 3)/2 = 0.75
    val tiny = Seq((0.1, 0.0), (0.1, 1.0), (0.2, 1.0))
      .toDF("p_seizure", "label")
    assert(Trainer.auroc(tiny) == 0.75)
    // tie-heavy pseudo-random corpus: 37 distinct scores over 5000 rows,
    // both classes inside most tie groups, scattered across 13 partitions
    val rows = (0 until 5000).map { i =>
      val s = ((i * 2654435761L) % 37).toDouble / 37.0
      val label = if (((i * 40503) % 97 < 40) ^ (s > 0.5)) 1.0 else 0.0
      (s, label)
    }
    val df = rows.toDF("p_seizure", "label").repartition(13)
    val fast = Trainer.auroc(df)
    // the round-10 single-partition Window.orderBy reference form,
    // kept here as the equality baseline the rewrite must match
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
    val slow = df.groupBy(col("p_seizure").as("s"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("npos"))
      .withColumn("cumN", sum("n").over(w))
      .withColumn("avgRank", col("cumN") - (col("n") - 1) / 2.0)
      .agg(sum(col("avgRank") * col("npos")), sum("npos"), sum("n"))
      .head()
    val nPos = slow.getDouble(1)
    val slowA = (slow.getDouble(0) - nPos * (nPos + 1) / 2.0) /
      (nPos * (slow.getLong(2) - nPos))
    assert(fast == slowA,
      s"distributed rank $fast != window-form $slowA on tie-heavy data")
    // all-distinct scores (the cardinality regime that killed the old
    // form at scale): perfect separation must read exactly 1.0
    val sep = (0 until 2000).map(i => (i / 2000.0, if (i >= 1000) 1.0 else 0.0))
      .toDF("p_seizure", "label").repartition(7)
    assert(Trainer.auroc(sep) == 1.0)
    // degenerate guards stay loud
    val e1 = intercept[IllegalArgumentException](
      Trainer.auroc(Seq.empty[(Double, Double)].toDF("p_seizure", "label")))
    assert(e1.getMessage.contains("non-empty"))
    val e2 = intercept[IllegalArgumentException](
      Trainer.auroc(Seq((0.5, 1.0)).toDF("p_seizure", "label")))
    assert(e2.getMessage.contains("both classes"))
  }

  test("trained scorer: FSM snapshot/restore mid-event equals the uninterrupted run") {
    // the state law replayStreamWith relies on at micro-batch
    // boundaries, exercised in-process (the full MemoryStream e2e is
    // the gated test below — fMGWS state commits are 100s+ in this
    // container per ReplaySpec's measurement)
    val fn = Trainer.scorer(model0,
      FeatureExtract.Config(window = 125, step = 125, highPassHz = 0.0))
    val dps = corpus.filter(_.eventId == "SZ7").collect()
      .sortBy(d => (d.tsSec, d.seq))
      .map(d => graft.streaming.ReplayDp(d.eventId, d.tsSec, d.hr, 0L,
        d.rawData, d.rawData3D, d.seq))
    def mkAlg() = new NnAlg(NnSettings(bufferSamples = 125), fn)
    val whole = mkAlg()
    val uninterrupted = dps.map(dp => whole.processDp(dp).alarmState).toSeq
    val a1 = mkAlg()
    val first = dps.take(5).map(dp => a1.processDp(dp).alarmState).toSeq
    val (st, cnt, hist) = a1.snapshot
    val a2 = mkAlg()
    a2.restore(st, cnt, hist)
    val second = dps.drop(5).map(dp => a2.processDp(dp).alarmState).toSeq
    assert(first ++ second == uninterrupted,
      "snapshot/restore diverged from the uninterrupted FSM run")
  }

  // ALWAYS-ON since round 11 (like ReplaySpec's fMGWS e2e): the
  // historical minutes-slow behavior was substantially the
  // processAllAvailable livelock under ProcessingTimeTimeout no-data
  // batches — the poll-drain below completes in ~20 s.
    test("trained scorer streams (replayStreamWith) with batch parity") {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val fn = Trainer.scorer(model0,
        FeatureExtract.Config(window = 125, step = 125, highPassHz = 0.0))
      def factory() = new NnAlg(NnSettings(bufferSamples = 125), fn)
      val dps = corpus.filter(d => d.eventId == "SZ1" || d.eventId == "OK1")
        .collect().sortBy(d => (d.eventId, d.tsSec, d.seq))
        .map(d => graft.streaming.ReplayDp(d.eventId, d.tsSec, d.hr, 0L,
          d.rawData, d.rawData3D, d.seq)).toSeq
      val mem = MemoryStream[graft.streaming.ReplayDp]
      val q = Replay.replayStreamWith(mem.toDS(), () => factory())
        .writeStream.format("memory").queryName("trained_replay")
        .outputMode("append").start()
      try {
        mem.addData(dps.take(8))
        awaitStreamRows(q, spark.table("trained_replay").count(), 8L)
        mem.addData(dps.drop(8))
        awaitStreamRows(q, spark.table("trained_replay").count(), dps.size.toLong)
        val streamed = spark.table("trained_replay").as[Replay.ReplayOut]
          .collect().map(r => (r.eventId, r.tsSec) -> r.alarmState).toMap
        val batch = Replay.replayBatchWith(dps.toDS(), Seq(() => factory()))
          .collect().map(r => (r.eventId, r.tsSec) -> r.alarmState).toMap
        assert(streamed == batch)
      } finally q.stop()
    }

  // Always-on (measured ~25 s — the RocksDB provider avoids the
  // HDFS-backed store's per-task Configuration serialization that makes
  // the OTHER fMGWS e2e minutes-slow here): the TRAINED scorer's
  // verdict stream survives a KILL-AND-RECOVER checkpoint restart — q1
  // consumes half the feed and stops; the rest lands while no query
  // runs; q2 resumes from the checkpoint, restoring each event's FSM
  // registers AND the NnBuffer window (FsmState.hrHist carries it), and
  // the full streamed verdict sequence equals the uninterrupted batch
  // replay.
    test("trained scorer: RocksDB checkpoint restart preserves the verdict stream") {
      import spark.implicits._
      val fn = Trainer.scorer(model0,
        FeatureExtract.Config(window = 125, step = 125, highPassHz = 0.0))
      def factory() = new NnAlg(NnSettings(bufferSamples = 125), fn)
      val dps = corpus.filter(d => d.eventId == "SZ1" || d.eventId == "OK1")
        .collect().sortBy(d => (d.tsSec, d.seq))
        .map(d => graft.streaming.ReplayDp(d.eventId, d.tsSec, d.hr, 0L,
          d.rawData, d.rawData3D, d.seq)).toSeq
      val base = java.nio.file.Files.createTempDirectory("trainedrestart").toFile
      val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
      val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
      val outDir = new java.io.File(base, "out").getAbsolutePath
      val schema = org.apache.spark.sql.Encoders
        .product[graft.streaming.ReplayDp].schema
      val t0 = System.currentTimeMillis() - 3600 * 1000L
      def writeChunk(name: String, rows: Seq[graft.streaming.ReplayDp],
                     mtime: Long): Unit = {
        val json = rows.toDS().toJSON.collect().mkString("\n")
        val f = new java.io.File(srcDir, s"$name.json")
        java.nio.file.Files.write(f.toPath, json.getBytes("UTF-8"))
        f.setLastModified(mtime)
      }
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        def start() = {
          val stream = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(srcDir.getAbsolutePath)
            .as[graft.streaming.ReplayDp]
          Replay.replayStreamWith(stream, () => factory())
            .writeStream.format("parquet")
            .option("path", outDir)
            .option("checkpointLocation", ckpt)
            .outputMode("append").start()
        }
        // drain by polling COMMITTED sink rows (awaitStreamRows — see
        // SparkSpec; processAllAvailable livelocks here, measured at
        // 5,400 empty batch commits with the main thread parked)
        def committed(): Long =
          try spark.read.parquet(outDir).count() catch { case _: Exception => 0L }
        // phase 1: half of each event's datapoints, then the KILL
        val (h1, h2) = dps.partition(_.seq < 6L)
        writeChunk("a", h1, t0)
        val q1 = start()
        try awaitStreamRows(q1, committed(), h1.size.toLong, 300000L)
        finally q1.stop()
        // phase 2 lands while the stream is DOWN; a NEW query recovers
        writeChunk("b", h2, t0 + 10000)
        val q2 = start()
        try awaitStreamRows(q2, committed(), dps.size.toLong, 300000L)
        finally q2.stop()
        val streamed = spark.read.parquet(outDir)
          .select("eventId", "tsSec", "alarmState").collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
        // batch truth over the SAME parsed feed (no JSON-precision skew)
        val batch = Replay.replayBatchWith(
            spark.read.schema(schema).json(srcDir.getAbsolutePath)
              .as[graft.streaming.ReplayDp],
            Seq(() => factory()))
          .collect().map(r => (r.eventId, r.tsSec) -> r.alarmState).toMap
        assert(streamed == batch,
          "restart-recovered trained-scorer stream diverged from batch replay")
        // the restart actually split the work: both phases emitted rows
        assert(streamed.size == dps.size)
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }

  test("scorer basis contract: window mismatch loud; high-pass config respected; model save/load stable") {
    val cfg = FeatureExtract.Config(window = 125, step = 125, highPassHz = 0.5)
    val hpEpochs = FeatureExtract.extract(corpus, cfg)
    val assembled = Trainer.assembleFeatures(hpEpochs).cache()
    val model = Trainer.trainLogistic(assembled)

    // wrong serve window is a loud contract violation, not silent skew
    val fn = Trainer.scorer(model, cfg)
    val e = intercept[IllegalArgumentException](fn(new Array[Double](750)))
    assert(e.getMessage.contains("serve window"))

    // the high-pass-trained scorer still separates the classes through
    // the per-window serve-time filter (seizure window scores above a
    // normal window)
    def window(eventId: String): Array[Double] = {
      val dp = corpus.filter(d => d.eventId == eventId && d.seq == 6L)
        .head()
      dp.rawData.map(_ / 1000.0) // the buffer's G-scale convention
    }
    val pSz = fn(window("SZ3"))
    val pOk = fn(window("OK3"))
    assert(pSz > pOk,
      s"high-pass scorer lost separability: seizure $pSz vs normal $pOk")

    // persistence: MLlib save/load reproduces the scorer bit-for-bit
    val dir = java.nio.file.Files.createTempDirectory("lrmodel").toString + "/m"
    model.save(dir)
    val loaded = org.apache.spark.ml.classification.LogisticRegressionModel
      .load(dir)
    val fn2 = Trainer.scorer(loaded, cfg)
    val w = window("SZ5")
    assert(fn(w) == fn2(w), "reloaded model scores differ")
    assembled.unpersist()
  }

  test("subtype weighting: upweighting a minority subtype flips its decision region") {
    import spark.implicits._
    import org.apache.spark.ml.linalg.Vectors
    // at x = +1: 4 tonic-clonic seizures vs 12 non-seizures — the
    // unweighted loss writes the region off as negative; weight 10 on
    // the TC subtype makes those 4 rows out-vote the 12
    val rows =
      (0 until 4).map(i => (s"tc$i", 1.0, Vectors.dense(1.0), "Tonic-Clonic")) ++
      (0 until 12).map(i => (s"fa$i", 0.0, Vectors.dense(1.0), null: String)) ++
      (0 until 20).map(i => (s"sz$i", 1.0, Vectors.dense(3.0), "other")) ++
      (0 until 20).map(i => (s"ok$i", 0.0, Vectors.dense(-3.0), null: String))
    val df = rows.toSeq.toDF("eventId", "label", "features", "subType")
    def pAtOne(m: org.apache.spark.ml.classification.LogisticRegressionModel) =
      m.transform(Seq(Tuple1(Vectors.dense(1.0))).toDF("features"))
        .select(element_at(
          org.apache.spark.ml.functions.vector_to_array(col("probability")), 2))
        .head().getDouble(0)
    val unweighted = Trainer.trainLogistic(df, maxIter = 50, regParam = 0.001)
    val weighted = Trainer.trainLogisticWeighted(df,
      Map("Tonic-Clonic" -> 10.0), maxIter = 50, regParam = 0.001)
    assert(pAtOne(unweighted) < 0.5,
      s"unweighted already positive at x=1: ${pAtOne(unweighted)}")
    assert(pAtOne(weighted) > 0.5,
      s"weighted still negative at x=1: ${pAtOne(weighted)}")
    // weights are positive-finite-only, and an unknown subtype is 1.0
    intercept[IllegalArgumentException](
      Trainer.trainLogisticWeighted(df, Map("x" -> -1.0)))
    val neutral = Trainer.trainLogisticWeighted(df,
      Map("NoSuchSubtype" -> 10.0), maxIter = 50, regParam = 0.001)
    assert(math.abs(pAtOne(neutral) - pAtOne(unweighted)) < 1e-9,
      "a weight map matching nothing must train identically")
  }

  test("sampler weights: class-frequency base, subtype multiplier on class 1 only") {
    import spark.implicits._
    // 3 seizures (2 TC, 1 other) + 6 non-seizures — one of which SHARES
    // the 'Tonic-Clonic' subType string and must NOT be multiplied
    // (subtype_weighting.py applies multipliers to the seizure mask only)
    val rows = Seq(
      ("s1", 1, "Tonic-Clonic"), ("s2", 1, "tonic-clonic"),
      ("s3", 1, "other"),
      ("n1", 0, "Tonic-Clonic"), ("n2", 0, null: String),
      ("n3", 0, "other"), ("n4", 0, "other"),
      ("n5", 0, null: String), ("n6", 0, "other"))
    val df = rows.toDF("eventId", "label", "subType")
    val w = Trainer.withSamplerWeights(df, Map("Tonic-Clonic" -> 2.0))
      .select(col("eventId"), col("sampler_w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // base: 1/3 per seizure, 1/6 per non-seizure
    assert(w("s1") == 2.0 / 3.0 && w("s2") == 2.0 / 3.0,
      s"TC seizures should weigh (1/3)*2: $w")
    assert(w("s3") == 1.0 / 3.0, s"non-TC seizure should weigh 1/3: $w")
    assert(w("n1") == 1.0 / 6.0,
      s"a NON-seizure sharing the TC subType must NOT be multiplied: $w")
    assert(Seq("n2", "n3", "n4", "n5", "n6").forall(w(_) == 1.0 / 6.0), s"$w")
    // single-class corpus fails loudly
    intercept[IllegalArgumentException](
      Trainer.withSamplerWeights(
        rows.filter(_._2 == 1).toDF("eventId", "label", "subType"),
        Map.empty))
    // a third class fails loudly (binary-label semantics)
    intercept[IllegalArgumentException](
      Trainer.withSamplerWeights(
        (rows :+ (("u1", 2, "x"))).toDF("eventId", "label", "subType"),
        Map.empty))
  }
}
