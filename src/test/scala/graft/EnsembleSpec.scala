package graft

import org.apache.spark.sql.functions._

import graft.ml.Ensemble

/** The k-fold ensemble combiner ([[graft.ml.Ensemble]], the
  * reference's Spahr-methodology tunable-sensitivity predictor):
  * weight correctness, column-vs-driver bit-exactness, the loud
  * wrong-cardinality guard, quantile tunability, and the full
  * scoreEnsemble pass over per-model scoring closures. */
class EnsembleSpec extends SparkSpec {

  test("Harrell-Davis weights: sum to 1, non-negative, median symmetric") {
    for (n <- Seq(3, 5, 10); q <- Seq(0.25, 0.5, 0.6, 0.9)) {
      val w = Ensemble.hdWeights(n, q)
      assert(w.length == n)
      assert(math.abs(w.sum - 1.0) < 1e-12, s"n=$n q=$q sum=${w.sum}")
      assert(w.forall(_ >= 0.0))
    }
    // q = 0.5 weights are symmetric: reversing the order statistics
    // cannot change the median estimate
    val w5 = Ensemble.hdWeights(5, 0.5)
    (0 until 5).foreach(i => assert(math.abs(w5(i) - w5(4 - i)) < 1e-12))
  }

  test("harrellDavisCol == driver fold bit-exactly; quantile is tunable") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val n = 5
    val rows = (0 until 40).map(i => (i, Array.fill(n)(rnd.nextDouble())))
    val df = rows.toDF("i", "scores")
    for (q <- Seq(0.3, 0.6)) {
      val got = df.select(col("i"),
          Ensemble.harrellDavisCol(col("scores"), n, q).as("p"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val w = Ensemble.hdWeights(n, q)
      rows.foreach { case (i, xs) =>
        val s = xs.sorted
        val want = (1 until n).foldLeft(w(0) * s(0))((acc, j) =>
          acc + w(j) * s(j)) // same accumulation order as the column
        assert(got(i) == want, s"row $i q=$q: ${got(i)} != $want")
      }
    }
    // higher quantile → higher (or equal) combined score, every row
    val p30 = df.select(Ensemble.harrellDavisCol(col("scores"), n, 0.3))
      .collect().map(_.getDouble(0))
    val p90 = df.select(Ensemble.harrellDavisCol(col("scores"), n, 0.9))
      .collect().map(_.getDouble(0))
    p30.zip(p90).foreach { case (lo, hi) => assert(hi >= lo) }
  }

  test("wrong model cardinality fails loudly, not silently") {
    import spark.implicits._
    val df = Seq(Array(0.1, 0.2, 0.3)).toDF("scores") // 3 scores, n=5
    val e = intercept[Exception](
      df.select(Ensemble.harrellDavisCol(col("scores"), 5, 0.6)).collect())
    assert(e.getMessage.contains("expected 5 model scores") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("expected 5 model scores"))
  }

  test("e2e: the k runSequence fold models ensemble like ensemblePredictor.py") {
    import graft.sources.SimulatedEvents
    import graft.sources.SimulatedEvents.{Component, EventSpec}
    import graft.ml.{Cnn, RunSequence}
    import spark.implicits._
    val n = 6
    val specs = (0 until n).flatMap { i =>
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
    val corpus = SimulatedEvents(spark, specs)
    val events = (0 until n).flatMap { i =>
      Seq((s"SZ$i", "Seizure", "other", i % 3),
        (s"OK$i", "False Alarm", "other", i % 3))
    }.toDF("id", "type", "subType", "fold0")
    val (fit, score) = RunSequence.cnnFamily(
      Cnn.Config(nFilters = 3, width = 9, maxIter = 60))
    val folds = RunSequence.runWithWindows(
      events, corpus, lit(true), col("fold0"),
      RunSequence.Config(), bufferSamples = 125)(fit, score)
    assert(folds.size == 3)
    // the reference's ensemblePredictor: every fold model scores the
    // same evaluation windows; HD-combine per event
    val evalWindows = graft.streaming.NnBuffer
      .dp2vectors(corpus, bufferSamples = 125).toDF()
      .select(col("eventId"),
        when(col("eventId").startsWith("SZ"), 1.0).otherwise(0.0).as("label"),
        col("vec").as("window"))
    // scoreEnsemble's contract: ONE row per event per model — roll the
    // per-window scores up to the event max first (the A4 reduction)
    val out = Ensemble.scoreEnsemble[Cnn.CnnModel](
      folds.map(_.model),
      (m, df) => Cnn.scoreWindows(m, df)
        .groupBy(col("eventId"))
        .agg(max(col("label")).as("label"),
          max(col("p_seizure")).as("p_seizure")),
      evalWindows, q = 0.6)
    val a = graft.ml.Trainer.auroc(out, probCol = "p_ensemble")
    assert(a > 0.95, s"ensemble AUROC only $a")
    assert(out.filter(col("n_models") =!= 3).count() == 0)
  }

  test("scoreEnsemble: k scoring passes gather per event; HD combine matches") {
    import spark.implicits._
    val data = (0 until 20).map(i => (s"E$i", (i % 2).toDouble)).toDF("eventId", "label")
    // three deterministic "models": model m scores event i as
    // ((i*7 + m*13) % 10) / 10.0
    val models = Seq(0, 1, 2)
    val score = (m: Int, df: org.apache.spark.sql.DataFrame) =>
      df.select(col("eventId"), col("label"),
        ((expr("CAST(substring(eventId, 2) AS INT)") * 7 + m * 13) % 10)
          .cast("double").divide(10.0).as("p_seizure"))
    val out = Ensemble.scoreEnsemble(models, score, data, q = 0.6)
      .collect().map(r => r.getAs[String]("eventId") ->
        (r.getAs[Int]("n_models"), r.getAs[Double]("p_ensemble"))).toMap
    assert(out.size == 20)
    val w = Ensemble.hdWeights(3, 0.6)
    (0 until 20).foreach { i =>
      val scores = models.map(m => ((i * 7 + m * 13) % 10) / 10.0).sorted
      val want = (1 until 3).foldLeft(w(0) * scores(0))((acc, j) =>
        acc + w(j) * scores(j))
      val (nm, p) = out(s"E$i")
      assert(nm == 3)
      assert(math.abs(p - want) < 1e-15, s"E$i: $p != $want")
    }
  }

  test("scoreEnsembleFused == scoreEnsemble for column-expressible models; ONE scan") {
    import spark.implicits._
    import graft.ml.Cnn
    // per-EPOCH rows (3 windows per event) so the fused path's folded-in
    // A4 max rollup is exercised, not just the one-row-per-event case
    val rnd = new scala.util.Random(17)
    val rows = for (e <- 0 until 12; w <- 0 until 3) yield
      (s"E$e", (e % 2).toDouble, Array.fill(20)(rnd.nextGaussian()))
    val data = rows.toDF("eventId", "label", "window")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    data.count()
    try {
      val models = (0 until 3).map { s =>
        val r = new scala.util.Random(s + 40)
        Cnn.CnnModel(2, 5, 20,
          filters = Array.fill(10)(r.nextGaussian()),
          filterBias = Array.fill(2)(r.nextGaussian() * 0.1),
          dense = Array.fill(2)(r.nextGaussian()),
          bias = r.nextGaussian(), mean = 0.0, std = 1.0)
      }
      // generic path: per-model corpus scans, event-max rollup per model
      val generic = Ensemble.scoreEnsemble[Cnn.CnnModel](models,
        (m, df) => Cnn.scoreWindows(m, df)
          .groupBy(col("eventId"))
          .agg(max(col("label")).as("label"),
            max(col("p_seizure")).as("p_seizure")),
        data, q = 0.6)
      // fused path: all k probabilities in ONE projection over ONE scan
      val fused = Ensemble.scoreEnsembleFused[Cnn.CnnModel](models,
        m => lit(1.0) / (lit(1.0) + exp(-Cnn.logitCol(m, col("window")))),
        data, q = 0.6)
      val g = generic.collect()
        .map(r => r.getAs[String]("eventId") -> r.getAs[Double]("p_ensemble"))
        .toMap
      val f = fused.collect()
        .map(r => r.getAs[String]("eventId") ->
          (r.getAs[Int]("n_models"), r.getAs[Double]("p_ensemble"))).toMap
      assert(f.size == 12 && g.size == 12)
      f.foreach { case (e, (nm, p)) =>
        assert(nm == 3)
        assert(math.abs(p - g(e)) < 1e-12, s"$e: fused $p vs generic ${g(e)}")
      }
      // the whole point: the fused physical plan scans `data` ONCE (the
      // generic path scans it k times). InMemoryTableScan count = 1.
      // AQE's toString renders BOTH the final and the initial plan —
      // count scans in the final plan only
      def finalScans(df: org.apache.spark.sql.DataFrame): Int = {
        val s = df.queryExecution.executedPlan.toString
        val cut = s.indexOf("== Initial Plan ==")
        val fin = if (cut >= 0) s.substring(0, cut) else s
        "InMemoryTableScan".r.findAllIn(fin).length
      }
      val scans = finalScans(fused)
      assert(scans == 1, s"fused ensemble should scan data once, saw $scans")
      val gscans = finalScans(generic)
      assert(gscans == models.size, s"generic path is the k-scan shape, saw $gscans")
    } finally data.unpersist(false)
  }

  test("scoreEnsembleFused covers the full-amber stacked LSTM (bidir + mha): ONE scan") {
    import spark.implicits._
    import graft.ml.LstmStack
    val rnd = new scala.util.Random(31)
    val rows = for (e <- 0 until 8; w <- 0 until 2) yield
      (s"E$e", (e % 2).toDouble, Array.fill(16)(rnd.nextGaussian()))
    val data = rows.toDF("eventId", "label", "window")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    data.count()
    try {
      val models = (0 until 3).map { s =>
        val r = new scala.util.Random(s + 80)
        val h1 = 2; val h2 = 2; val nH = 2
        LstmStack.Lstm2Model(h1, h2, 16,
          wx1 = Array.fill(4 * h1)(r.nextGaussian() * 0.5),
          wh1 = Array.fill(4 * h1 * h1)(r.nextGaussian() * 0.4),
          b1 = Array.fill(4 * h1)(r.nextGaussian() * 0.2),
          wx2 = Array.fill(4 * h2 * 2 * h1)(r.nextGaussian() * 0.5),
          wh2 = Array.fill(4 * h2 * h2)(r.nextGaussian() * 0.4),
          b2 = Array.fill(4 * h2)(r.nextGaussian() * 0.2),
          dense = Array.fill(h2)(r.nextGaussian()),
          bias = r.nextGaussian() * 0.2, mean = 0.0, std = 1.0,
          head = "mha", bidir = true,
          wx1b = Array.fill(4 * h1)(r.nextGaussian() * 0.5),
          wh1b = Array.fill(4 * h1 * h1)(r.nextGaussian() * 0.4),
          b1b = Array.fill(4 * h1)(r.nextGaussian() * 0.2),
          nHeads = nH,
          attA = Array.fill(nH * h2)(r.nextGaussian() * 0.5),
          attCs = Array.fill(nH)(r.nextGaussian() * 0.3),
          attD = Array.fill(nH * h2)(r.nextGaussian()))
      }
      val generic = Ensemble.scoreEnsemble[LstmStack.Lstm2Model](models,
        (m, df) => LstmStack.scoreWindows(m, df)
          .groupBy(col("eventId"))
          .agg(max(col("label")).as("label"),
            max(col("p_seizure")).as("p_seizure")),
        data, q = 0.6)
      val fused = Ensemble.scoreEnsembleFused[LstmStack.Lstm2Model](models,
        m => lit(1.0) / (lit(1.0) + exp(-LstmStack.logitCol(m, col("window")))),
        data, q = 0.6)
      val g = generic.collect()
        .map(r => r.getAs[String]("eventId") -> r.getAs[Double]("p_ensemble"))
        .toMap
      val f = fused.collect()
        .map(r => r.getAs[String]("eventId") -> r.getAs[Double]("p_ensemble"))
        .toMap
      assert(f.size == 8 && g.size == 8)
      f.foreach { case (e, p) =>
        assert(math.abs(p - g(e)) < 1e-12, s"$e: fused $p vs generic ${g(e)}") }
      val s = fused.queryExecution.executedPlan.toString
      val cut = s.indexOf("== Initial Plan ==")
      val fin = if (cut >= 0) s.substring(0, cut) else s
      assert("InMemoryTableScan".r.findAllIn(fin).length == 1,
        "full-amber fused ensemble should scan data once")
    } finally data.unpersist(false)
  }

  test("scoreEnsembleFused covers k composed conv pipes: ONE scan, == generic") {
    import spark.implicits._
    import graft.ml.{ConvFront, ConvPipe, LstmStack}
    val rnd = new scala.util.Random(67)
    val W = 24 // -> 11 -> 4 recurrence steps through two k=3 blocks
    def pipe(seed: Int): ConvPipe.ConvPipeModel = {
      val r = new scala.util.Random(seed)
      val front = ConvFront.ConvFrontModel(W,
        blocks = Seq(
          ConvFront.ConvBlock(1, 2, 3,
            w = Array.fill(6)(r.nextGaussian() * 0.5),
            b = Array.fill(2)(r.nextGaussian() * 0.1),
            scale = Array.fill(2)(1.0 + r.nextGaussian() * 0.1),
            shift = Array.fill(2)(r.nextGaussian() * 0.1)),
          ConvFront.ConvBlock(2, 2, 3,
            w = Array.fill(12)(r.nextGaussian() * 0.5),
            b = Array.fill(2)(r.nextGaussian() * 0.1),
            scale = Array.fill(2)(1.0 + r.nextGaussian() * 0.1),
            shift = Array.fill(2)(r.nextGaussian() * 0.1))),
        mix = Array.fill(2)(r.nextGaussian()),
        mixBias = 0.1, mean = 0.2, std = 1.4)
      val h1 = 2; val h2 = 2; val nH = 2
      ConvPipe.ConvPipeModel(front, LstmStack.Lstm2Model(h1, h2,
        front.outLen,
        wx1 = Array.fill(4 * h1)(r.nextGaussian() * 0.5),
        wh1 = Array.fill(4 * h1 * h1)(r.nextGaussian() * 0.4),
        b1 = Array.fill(4 * h1)(r.nextGaussian() * 0.2),
        wx2 = Array.fill(4 * h2 * 2 * h1)(r.nextGaussian() * 0.5),
        wh2 = Array.fill(4 * h2 * h2)(r.nextGaussian() * 0.4),
        b2 = Array.fill(4 * h2)(r.nextGaussian() * 0.2),
        dense = Array.fill(h2)(r.nextGaussian()),
        bias = 0.1, mean = 0.0, std = 1.0,
        head = "mha", bidir = true,
        wx1b = Array.fill(4 * h1)(r.nextGaussian() * 0.5),
        wh1b = Array.fill(4 * h1 * h1)(r.nextGaussian() * 0.4),
        b1b = Array.fill(4 * h1)(r.nextGaussian() * 0.2),
        nHeads = nH,
        attA = Array.fill(nH * h2)(r.nextGaussian() * 0.5),
        attCs = Array.fill(nH)(r.nextGaussian() * 0.3),
        attD = Array.fill(nH * h2)(r.nextGaussian())))
    }
    val models = (0 until 3).map(s => pipe(s + 700))
    val rows = for (e <- 0 until 8; w <- 0 until 2) yield
      (s"E$e", (e % 2).toDouble, Array.fill(W)(rnd.nextGaussian()))
    val data = rows.toDF("eventId", "label", "window")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    data.count()
    try {
      val generic = Ensemble.scoreEnsemble[ConvPipe.ConvPipeModel](models,
        (m, df) => ConvPipe.scoreWindows(m, df)
          .groupBy(col("eventId"))
          .agg(max(col("label")).as("label"),
            max(col("p_seizure")).as("p_seizure")),
        data, q = 0.6)
      val fused = Ensemble.scoreEnsembleFused[ConvPipe.ConvPipeModel](
        models,
        m => lit(1.0) / (lit(1.0) + exp(-ConvPipe.logitCol(m, col("window")))),
        data, q = 0.6)
      val g = generic.collect()
        .map(r => r.getAs[String]("eventId") -> r.getAs[Double]("p_ensemble"))
        .toMap
      val f = fused.collect()
        .map(r => r.getAs[String]("eventId") -> r.getAs[Double]("p_ensemble"))
        .toMap
      assert(f.size == 8 && g.size == 8)
      f.foreach { case (e, p) =>
        assert(math.abs(p - g(e)) < 1e-12, s"$e: fused $p vs generic ${g(e)}") }
      // all k COMPOSED (conv_front_seq nested in lstm_stack_logit)
      // probabilities in one projection over ONE scan
      val s = fused.queryExecution.executedPlan.toString
      val cut = s.indexOf("== Initial Plan ==")
      val fin = if (cut >= 0) s.substring(0, cut) else s
      assert("InMemoryTableScan".r.findAllIn(fin).length == 1,
        "composed-pipe fused ensemble should scan data once")
    } finally data.unpersist(false)
  }

  test("scoreEnsembleFused: a null per-model probability fails loudly") {
    import spark.implicits._
    val data = Seq(("E0", 1.0, 2.0), ("E1", 0.0, -1.0))
      .toDF("eventId", "label", "x")
    // model 1's pCol yields NULL for x < 0 — max() would swallow it and
    // p_ensemble would silently go NULL without the fused guard
    val models = Seq(0, 1)
    val fused = Ensemble.scoreEnsembleFused[Int](models,
      i => if (i == 0) lit(0.5) * col("x")
           else when(col("x") > 0, lit(0.25) * col("x")),
      data, q = 0.6)
    val e = intercept[Exception](fused.collect())
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("produced no score"),
      s"expected the fail-loud ensemble guard, got: ${rootMsg(e)}")
  }
}
