package graft

import org.apache.spark.sql.functions._
import graft.functions.Signal
import graft.operators.{Curate, Flatten, Spectrogram}
import graft.operators.Flatten.FlatDp
import graft.sources.{FlatCsv, SimulatedEvents}
import graft.streaming.NnBuffer

/** Round-4 operators: W6/P15 spectrogram + F10 gate, W8/M8 rolling
  * buffer, S13 simulated events (spectral goldens), S3 CSV round-trip,
  * W4 keep-max dedup, A4 event-level metrics. */
class DomainOpsSpec extends SparkSpec {
  import spark.implicits._

  private def flat(eventId: String, d: Int, raw: Array[Double],
                   xyz: Array[Double] = Array.emptyDoubleArray,
                   typ: Int = 0): FlatDp =
    FlatDp(eventId, "u1", "test", typ, 1700000000L + 5L * d, 0L, 0.0, 0.0,
      70.0, 98.0, raw, xyz, synthetic = false, seq = d.toLong)

  // ------------------------------------------------------------ F10

  test("F10: constant signal is rejected, strong motion is not") {
    assert(Spectrogram.rejectLowMotion(Array.fill(125)(1000.0), 10.0))
    val shaken = Array.tabulate(125)(i => 1000.0 + 300 * math.sin(i * 1.3))
    assert(!Spectrogram.rejectLowMotion(shaken, 10.0))
    // boundary algebra: std% = 100*std/mean
    val x = Array.tabulate(125)(i => 1000.0 + (if (i % 2 == 0) 50.0 else -50.0))
    val pct = Spectrogram.stdPct(x)
    assert(math.abs(pct - 100.0 * Signal.std(x) / Signal.mean(x)) < 1e-12)
    // sdThresh <= 0 disables the gate (nnAlg.py: mSdThresh falsy)
    assert(!Spectrogram.rejectLowMotion(Array.fill(125)(1000.0), 0.0))
  }

  // ------------------------------------------------------------ W6/P15

  test("W6: 5 Hz sine lights the 5 Hz spectrogram row; low-motion slices are zeroed") {
    // first 250 samples flat (std 0 < sdThresh), then a 5 Hz tremor on a
    // 1 g bias — slices sliding by 125 land entirely in one regime or the
    // other at endPosn 250 (flat) and endPosn >= 500 (moving)
    val n = 750
    val acc = Array.tabulate(n)(i =>
      if (i < 250) 1000.0 else 1000.0 + 200 * math.sin(2 * math.Pi * 5 * i / 25.0))
    val img = Spectrogram.spectralHistory(acc,
      Spectrogram.Config(windowLen = 125, stepLen = 125))
    // endPosn: 125, 250, 375, 500, 625 → 5 slices of 61 bins
    assert(img.length == 5)
    assert(img.forall(_.length == 61))
    // flat slices → all-zero rows
    assert(img(0).forall(_ == 0.0) && img(1).forall(_ == 0.0))
    // moving slices: bin index 24 is 5 Hz (bins are 1..61 at 0.2 Hz)
    val hot = img(4)
    val hotBin = hot.indexOf(hot.max)
    assert(hotBin == 24, s"expected 5 Hz row (24), got $hotBin")
    // 5 Hz dominates every other bin by orders of magnitude
    hot.zipWithIndex.filter(_._2 != 24).foreach { case (v, _) =>
      assert(v < hot(24) / 100)
    }
  }

  test("W6: normalise caps the hot bin at 1; zeroTol clips noise") {
    val acc = Array.tabulate(500)(i => 1000.0 + 200 * math.sin(2 * math.Pi * 5 * i / 25.0))
    val img = Spectrogram.spectralHistory(acc,
      Spectrogram.Config(windowLen = 125, stepLen = 125, normalise = true))
    img.foreach { row => assert(math.abs(row.max - 1.0) < 1e-12) }
  }

  test("W6: eventSpectrogram concatenates datapoints in time order") {
    val dps = (0 until 6).map { d =>
      flat("ev1", d, Array.tabulate(125)(i =>
        1000.0 + 200 * math.sin(2 * math.Pi * 5 * (d * 125 + i) / 25.0)))
    }
    val rows = Spectrogram.eventSpectrogram(
      spark.createDataset(dps.reverse), // out of order on purpose
      Spectrogram.Config(stepLen = 25)).collect()
    assert(rows.length == 1)
    val r = rows.head
    // total 750 samples → slices at 125,150,...,725 → 25
    assert(r.nSlices == 25 && r.nBins == 61)
    assert(r.spec.forall(row => row.indexOf(row.max) == 24))
  }

  // ------------------------------------------------------------ W8/M8

  test("W8: buffer emits the first vector at the 6th datapoint, in G") {
    val dps = (0 until 8).map(d => flat("ev1", d, Array.fill(125)(d * 100.0)))
    val out = NnBuffer.dp2vectors(spark.createDataset(dps)).collect()
      .sortBy(_.tsSec)
    assert(out.length == 3) // dps 5, 6, 7 complete windows
    assert(out.head.tsSec == 1700000000L + 5L * 5)
    assert(out.forall(_.vec.length == 750))
    // first emission covers dps 0..5: starts at 0/1000, ends at 500/1000
    assert(out(0).vec.head == 0.0 && out(0).vec.last == 0.5)
    // third emission covers dps 2..7
    assert(out(2).vec.head == 0.2 && out(2).vec.last == 0.7)
  }

  test("W8: buffer resets at event boundaries (no cross-event leakage)") {
    val dps = (0 until 6).map(d => flat("a", d, Array.fill(125)(100.0))) ++
      (0 until 6).map(d => flat("b", d, Array.fill(125)(200.0)))
    val out = NnBuffer.dp2vectors(spark.createDataset(dps)).collect()
    // one full window each — a leaked buffer would emit 7 for event b
    assert(out.count(_.eventId == "a") == 1)
    assert(out.count(_.eventId == "b") == 1)
    assert(out.find(_.eventId == "b").get.vec.forall(_ == 0.2))
  }

  test("W8: F10 gate skips low-motion datapoints without resetting the buffer") {
    val lively = (0 until 6).map(d => flat("a", d,
      Array.tabulate(125)(i => 1000.0 + 300 * math.sin((d * 125 + i) * 1.3))))
    val flatDp = flat("a", 6, Array.fill(125)(1000.0)) // rejected (std 0)
    val more = flat("a", 7,
      Array.tabulate(125)(i => 1000.0 + 300 * math.sin((7 * 125 + i) * 1.3)))
    val out = NnBuffer.dp2vectors(
      spark.createDataset(lively :+ flatDp :+ more), sdThresh = 10.0)
      .collect().sortBy(_.tsSec)
    // dp6 is gated out (no emission, buffer untouched); dp7 still emits
    assert(out.length == 2)
    assert(out.map(_.tsSec).toSeq == Seq(1700000000L + 25, 1700000000L + 35))
  }

  test("W8: normalise z-scores the window (sigma-0 falls back to centering)") {
    val dps = (0 until 6).map(d => flat("a", d,
      Array.tabulate(125)(i => 1000.0 + ((d * 125 + i) % 7) * 10.0)))
    val out = NnBuffer.dp2vectors(spark.createDataset(dps), normalise = true)
      .collect()
    val v = out.head.vec
    assert(math.abs(Signal.mean(v)) < 1e-9)
    assert(math.abs(Signal.std(v) - 1.0) < 1e-9)
    val const = (0 until 6).map(d => flat("c", d, Array.fill(125)(500.0)))
    val outC = NnBuffer.dp2vectors(spark.createDataset(const), normalise = true)
      .collect()
    assert(outC.head.vec.forall(_ == 0.0))
  }

  // ------------------------------------------------------------ S13 goldens

  test("S13: gravity-only event is a constant 1 g magnitude with an empty spectrum") {
    val dps = SimulatedEvents.generate(SimulatedEvents.defaultSpecs.head)
    assert(dps.length == 12 && dps.forall(_.rawData.length == 125))
    assert(dps.forall(_.rawData.forall(v => math.abs(v - 1000.0) < 1e-9)))
    dps.foreach { dp =>
      assert(Signal.roiPower(dp.rawData) < 1e-12)
      val (total, _) = Signal.bandPower(dp.rawData, 25.0, 1.0, 12.0)
      assert(total < 1e-12)
    }
  }

  test("S13: a 5 Hz amp-100 component injects a^2/2 power into the 5 Hz bin") {
    val dps = SimulatedEvents.generate(SimulatedEvents.defaultSpecs(1))
    dps.foreach { dp =>
      // one-sided PSD: a sinusoid of amplitude a carries a^2/2
      val (total, peak) = Signal.bandPower(dp.rawData, 25.0, 4.9, 5.1)
      assert(math.abs(total - 100.0 * 100.0 / 2) < 1e-6)
      assert(math.abs(peak - total) < 1e-9) // single bin
      // out-of-band is clean
      val (oob, _) = Signal.bandPower(dp.rawData, 25.0, 6.0, 12.0)
      assert(oob < 1e-9)
    }
  }

  test("S13: the 3 Hz burst lives only in its [20,40)s window, on the y axis") {
    val dps = SimulatedEvents.generate(SimulatedEvents.defaultSpecs(2))
      .sortBy(_.tsSec)
    dps.zipWithIndex.foreach { case (dp, d) =>
      val y = Signal.deinterleave(dp.rawData3D, 1)
      val (p3, _) = Signal.bandPower(y, 25.0, 2.9, 3.1)
      val inBurst = d >= 4 && d < 8 // dps cover [20,40)s
      if (inBurst) assert(math.abs(p3 - 300.0 * 300.0 / 2) < 1e-4)
      else assert(p3 < 1e-9)
    }
    // phase spec: 90 deg → y(t) = 300*cos(2*pi*3t + pi/2) = -300*sin(2*pi*3t)
    val burstY = Signal.deinterleave(dps(4).rawData3D, 1)
    assert(math.abs(burstY(0) - 300.0 * math.cos(math.Pi / 2)) < 1e-9)
  }

  test("S13: distributed generation matches the pure generator") {
    val local = SimulatedEvents.defaultSpecs.flatMap(SimulatedEvents.generate)
    val dist = SimulatedEvents(spark).collect()
    assert(dist.length == local.length)
    val l = local.map(d => (d.eventId, d.seq)).sorted
    val r = dist.map(d => (d.eventId, d.seq)).sorted.toSeq
    assert(l == r)
  }

  // ------------------------------------------------------------ S3 round-trip

  test("S3: flattenedWide → csv → read round-trips FlatDp exactly") {
    val dps = Seq(
      flat("e1", 0, Array.tabulate(125)(_.toDouble),
        Array.tabulate(375)(j => (j * 3 % 17).toDouble), typ = 1),
      flat("e1", 1, Array.tabulate(125)(i => (i * 7 % 31).toDouble),
        Array.tabulate(375)(j => (j % 13).toDouble), typ = 1),
      flat("e2", 0, Array.fill(125)(42.5)),   // no 3D data
      flat("e3", 0, Array.emptyDoubleArray))  // hr-only: no accel at all
    val dir = java.nio.file.Files.createTempDirectory("flatcsv").toString
    FlatCsv.write(spark.createDataset(dps).toDF(), dir)
    val back = FlatCsv.read(spark, dir).collect().sortBy(d => (d.eventId, d.seq))
    assert(back.length == 4)
    back.zip(dps.sortBy(d => (d.eventId, d.seq))).foreach { case (b, o) =>
      assert(b.eventId == o.eventId && b.userId == o.userId)
      assert(b.typeStr == o.typeStr && b.`type` == o.`type`)
      assert(b.tsSec == o.tsSec && b.hr == o.hr && b.o2sat == o.o2sat)
      assert(b.rawData.toSeq == o.rawData.toSeq)
      assert(b.rawData3D.toSeq == o.rawData3D.toSeq)
      assert(b.seq == o.seq)
    }
    // the reference's loader shape: CSV → nested events (io_utils:231-308)
    val events = FlatCsv.readEvents(spark, dir).collect()
      .map(r => r.getAs[String]("id") ->
        r.getAs[Seq[org.apache.spark.sql.Row]]("datapoints").size).toMap
    assert(events == Map("e1" -> 2, "e2" -> 1, "e3" -> 1))
  }

  // ------------------------------------------------------------ W4

  test("W4: chained clusters keep reference > dp-count > latest") {
    val rows = Seq(
      // one chained cluster (gaps 50 <= 60): ids 1,2,3 — id 2 has most dps
      ("u1", "seizure", 1L, 1000L, 5L, false),
      ("u1", "seizure", 2L, 1050L, 9L, false),
      ("u1", "seizure", 3L, 1100L, 7L, false),
      // next event 100s later: its own cluster
      ("u1", "seizure", 4L, 1200L, 1L, false),
      // reference flag beats a higher dp count
      ("u2", "seizure", 5L, 1000L, 9L, false),
      ("u2", "seizure", 6L, 1030L, 2L, true),
      // dp-count tie → later time wins
      ("u3", "seizure", 7L, 1000L, 4L, false),
      ("u3", "seizure", 8L, 1040L, 4L, false),
      // different type: never merged despite same user/time
      ("u1", "falseAlarm", 9L, 1010L, 1L, false))
      .toDF("user", "typ", "id", "ts", "ndp", "is_ref")
    val kept = Curate.keepMaxDedup(rows, Seq("user", "typ"), "ts", "ndp", "id",
      maxSeconds = 60L, isRefCol = Some("is_ref"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L, 6L, 8L, 9L))
  }

  test("W4: chain semantics — each link within maxSeconds extends the cluster") {
    // 0, 50, 100, 150: pairwise >60 from the first, but chained ≤60 links
    val rows = (0 until 4).map(i => ("u", "t", i.toLong, i * 50L, 1L + i, false))
      .toDF("user", "typ", "id", "ts", "ndp", "is_ref")
    val kept = Curate.keepMaxDedup(rows, Seq("user", "typ"), "ts", "ndp", "id",
      60L, Some("is_ref")).select("id").as[Long].collect().toSeq
    assert(kept == Seq(3L)) // one cluster, max dp count = latest id 3
  }

  // ------------------------------------------------------------ A4

  test("A4: event-level metrics aggregate max-prediction per event at 0.5") {
    val df = Seq(
      ("e1", Some(0.9), 1), ("e1", Some(0.1), 1),  // tp (max 0.9)
      ("e2", Some(0.4), 1), ("e2", Some(0.2), 1),  // fn
      ("e3", Some(0.6), 0),                         // fp
      ("e4", Some(0.3), 0), ("e4", Some(0.49), 0), // tn
      ("e5", None: Option[Double], 0))             // unscored → negative (tn)
      .toDF("eventId", "pred", "label")
    val m = Curate.eventLevelMetrics(df, "eventId", "pred", "label").collect().head
    assert(m.getAs[Long]("event_tp") == 1 && m.getAs[Long]("event_fn") == 1)
    // all-null predictions count as predicted-negative (pandas NaN >= 0.5
    // is False), so the confusion cells still sum to n_events
    assert(m.getAs[Long]("event_fp") == 1 && m.getAs[Long]("event_tn") == 2)
    assert(m.getAs[Long]("n_events") == 5)
    assert(m.getAs[Double]("event_tpr") == 0.5)
    assert(m.getAs[Double]("event_fpr") == 1.0 / 3)
  }

  // ------------------------------------------------------------ skew

  test("saltedJoin matches the plain equi-join on hot-key data") {
    import graft.operators.Skew
    // one pathologically hot key (90% of rows) + a long tail
    val fact = ((1 to 900).map(i => (7L, s"r$i")) ++
      (1 to 100).map(i => (i.toLong % 50, s"t$i")))
      .toDF("k", "payload")
    val build = (0L to 60L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = fact.join(build, Seq("k"))
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(fact, build, "k", salt = 8)
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
    // the hot key's rows really do spread across salt buckets
    val buckets = fact.withColumn("__salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8L)))
      .filter(col("k") === 7L).select("__salt").distinct().count()
    assert(buckets > 4, s"hot key landed in only $buckets salt buckets")
  }

  // ------------------------------------------------------------ streaming

  test("StreamAggs: watermarked tumbling/session plans are streaming-valid") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamAggs
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val src = mem.toDF().toDF("ts", "user_id", "value")

    val tumble = StreamAggs.tumblingMax(src, "ts", "user_id", "value")
    assert(tumble.isStreaming)
    val tPlan = tumble.queryExecution.analyzed.toString
    assert(tPlan.contains("EventTimeWatermark"), tPlan.take(800))
    assert(tPlan.contains("window"), tPlan.take(800))

    val sess = StreamAggs.sessionCounts(src, "ts", "user_id")
    assert(sess.isStreaming)
    val sPlan = sess.queryExecution.analyzed.toString
    assert(sPlan.contains("EventTimeWatermark") &&
      sPlan.contains("session_window"), sPlan.take(800))
  }

  // Always-on batch-vs-stream parity: the memory-sink drain path is fast
  // in this container (no checkpointed file sink → no fork pathology);
  // the StreamQueries drain feeds two real micro-batches plus two
  // watermark-advancing sentinels, so windows/sessions spanning the
  // batch split exercise the incremental state merge end to end. The
  // same queries run under the DuckDB hash gate at sf0.01
  // (st1_session_stream / st2_tumbling_stream share w3/a8's oracles).
  test("streaming parity: drained session/tumbling streams equal their batch twins") {
    import graft.queries.{RelationalQueries, StreamQueries}
    val sf = "/root/testdata/sf0.001"
    // the streaming entries feed only the bounded user_id % 4 == 0 slice
    // (StreamQueries.feedSlice) — restrict the batch twins identically
    val slice = col("user_id") % 4 === 0
    val sSess = StreamQueries.st1SessionStream(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val bSess = RelationalQueries.w3Session(spark, sf).filter(slice).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(sSess == bSess,
      s"session parity broke: ${sSess.diff(bSess).take(3)} vs ${bSess.diff(sSess).take(3)}")
    val sTum = StreamQueries.st2TumblingStream(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    val bTum = RelationalQueries.a8Tumbling10Min(spark, sf).filter(slice).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(sTum == bTum,
      s"tumbling parity broke: ${sTum.diff(bTum).take(3)} vs ${bTum.diff(sTum).take(3)}")
  }

  // ------------------------------------------------------------ M7 / S6

  test("M3: oversample with factor <= 1 is a no-op (no descending-sequence copies)") {
    import graft.operators.Augment
    val df = Seq(("1", 1), ("2", 0)).toDF("eventId", "type")
    val out1 = Augment.oversample(df, "eventId", factor = 1, col("type") === 1)
    assert(out1.count() == 2)
    // tcAugFac = 0 means "unchanged" per the reference contract
    val df2 = Seq(("1", 1, "Tonic-Clonic")).toDF("eventId", "type", "subType")
    assert(Augment.tonicClonicAugment(df2, "eventId", tcAugFac = 0).count() == 1)
  }

  test("E1: zero-norm vectors never poison the brute-force top-k with NaN") {
    import graft.operators.Similarity
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.8, 0.3)),
      (99L, Seq(0.0, 0.0))) // zero vector
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceKnn(df, "vec_id", "embedding", k = 2)
      .collect()
    // no NaN scores anywhere, and the zero vector is never a neighbor
    assert(out.forall(r => !r.getAs[Double]("score").isNaN))
    assert(out.forall(_.getAs[Long]("neighbor_id") != 99L))
    // the zero vector emits no rows as a query either (undefined cosine)
    assert(!out.exists(_.getAs[Long]("vec_id") == 99L))
  }

  test("SQL signal UDFs return null for null arrays (hr-only datapoints)") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT osd_spec_power(CAST(NULL AS ARRAY<DOUBLE>)) AS sp,
        |       osd_znormalize(CAST(NULL AS ARRAY<DOUBLE>)) AS zn,
        |       osd_magnitude3d(CAST(NULL AS ARRAY<DOUBLE>), 'V2') AS mg
        |""".stripMargin).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("C9: o2Sat falls back to the legacy dataJSON payload like hr does") {
    import graft.operators.Tidy
    val dj = """{"o2Sat": 97.0, "HR": 72.0}"""
    val df = spark.sql(
      s"""SELECT array(named_struct(
         |  'eventId', '1', 'dataTime', CAST(NULL AS STRING),
         |  'hr', CAST(NULL AS DOUBLE), 'o2Sat', CAST(NULL AS DOUBLE),
         |  'alarmState', CAST(NULL AS BIGINT),
         |  'specPower', CAST(NULL AS DOUBLE), 'roiPower', CAST(NULL AS DOUBLE),
         |  'roiRatio', CAST(NULL AS DOUBLE),
         |  'simpleSpec', CAST(NULL AS ARRAY<DOUBLE>),
         |  'rawData', CAST(NULL AS ARRAY<DOUBLE>),
         |  'rawData3D', CAST(NULL AS ARRAY<DOUBLE>),
         |  'dataJSON', '$dj')) AS datapoints
         |""".stripMargin)
    val dp = Tidy.tidyDatapoints(df)
      .selectExpr("datapoints[0].o2Sat AS o2", "datapoints[0].hr AS hr")
      .collect().head
    assert(dp.getDouble(0) == 97.0 && dp.getDouble(1) == 72.0)
  }

  test("M7: tonic-clonic events duplicate; other seizures and non-seizures don't") {
    import graft.operators.Augment
    val df = Seq(
      ("1", 1, "Tonic-Clonic"), ("2", 1, " tonic clonic "), ("3", 1, "Focal"),
      ("4", 0, "Tonic-Clonic"), ("5", 1, null))
      .toDF("eventId", "type", "subType")
    val out = Augment.tonicClonicAugment(df, "eventId", tcAugFac = 1)
      .select("eventId").as[String].collect().sorted.toSeq
    assert(out == Seq("1", "1-1", "2", "2-1", "3", "4", "5"))
  }

  test("S6: upsert replaces same-key rows and appends new keys") {
    import graft.sources.OsdbJson
    val existing = Seq(("a", 1, "old"), ("b", 2, "keep")).toDF("id", "v", "tag")
    val updates = Seq(("a", 10, "new"), ("c", 3, "ins")).toDF("id", "v", "tag")
    val out = OsdbJson.upsertEvents(existing, updates, "id")
      .select("id", "v", "tag").as[(String, Int, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a", 10, "new"), ("b", 2, "keep"), ("c", 3, "ins")))
  }

  test("S6: duplicate-key updates pick one deterministic winner, not a shuffle-order one") {
    import graft.sources.OsdbJson
    val existing = Seq(("a", 1, "old")).toDF("id", "v", "tag")
    val dupUpdates = Seq(("a", 10, "u1"), ("a", 11, "u2"), ("b", 5, "ins"))
      .toDF("id", "v", "tag")
    def run(updates: org.apache.spark.sql.DataFrame): Seq[(String, Int, String)] =
      OsdbJson.upsertEvents(existing, updates, "id")
        .select("id", "v", "tag").as[(String, Int, String)]
        .collect().sortBy(_._1).toSeq
    val base = run(dupUpdates)
    assert(base.map(_._1) == Seq("a", "b"), s"one row per key expected: $base")
    assert(base.exists(r => r._1 == "a" && r._3.startsWith("u")),
      s"an update must beat existing: $base")
    // winner is stable under any physical reordering of the updates side
    assert(run(dupUpdates.repartition(7)) == base)
    assert(run(dupUpdates.orderBy(col("v").desc)) == base)
  }

  // ------------------------------------------------------------ filters

  test("F6: digit criteria compare numerically — '1' rejects user 12, '01' matches user 1") {
    import graft.operators.{EventFilterConfig, EventFilters}
    val df = Seq(("a", "1"), ("b", "12"), ("c", "2"))
      .toDF("id", "userId")
    def keep(cfg: EventFilterConfig): Set[String] =
      df.filter(EventFilters.compile(cfg)).select("id")
        .as[String].collect().toSet
    assert(keep(EventFilterConfig(includeUserIds = Seq("1"))) == Set("a"))
    // leading zeros / whitespace: Python int == semantics, not string
    assert(keep(EventFilterConfig(includeUserIds = Seq("01"))) == Set("a"))
    assert(keep(EventFilterConfig(includeUserIds = Seq(" 2 "))) == Set("c"))
    // non-numeric criterion falls back to substring on the coerced string
    assert(keep(EventFilterConfig(includeUserIds = Seq("1x"))) == Set.empty)
    // substring criteria are stripped before matching (reference strip())
    val df2 = Seq(("a", "Seizure"), ("b", "Fall")).toDF("id", "type")
    assert(df2.filter(EventFilters.compile(
      EventFilterConfig(includeTypes = Seq("  SEIZURE ")))).select("id")
      .as[String].collect().toSet == Set("a"))
  }

  // ------------------------------------------------------------ LSH recall

  test("cosineNearDupPairs: planted near-dups recovered at the estimated recall") {
    import graft.operators.Similarity
    // doc math: the 8x6 default finds a 0.9-cosine pair with P ~ 0.88
    assert(math.abs(Similarity.lshRecallEstimate(0.9, 8, 6) - 0.88) < 0.02)
    assert(Similarity.lshRecallEstimate(0.5, 8, 6) < 0.3) // collapses

    val dim = 16
    val rng = new scala.util.Random(7)
    def rand(): Array[Double] = Array.fill(dim)(rng.nextGaussian())
    // 40 planted pairs at cosine >= ~0.95 (small additive noise)
    val planted = (0 until 40).map { i =>
      val v = rand()
      val n = math.sqrt(v.map(x => x * x).sum)
      val dup = v.zip(Array.fill(dim)(rng.nextGaussian() * 0.05 * n / math.sqrt(dim)))
        .map { case (a, b) => a + b }
      (i, v, dup)
    }
    val decoys = (0 until 200).map(i => (1000 + i, rand()))
    val rows = planted.flatMap { case (i, v, dup) =>
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, dup.toSeq)) } ++
      decoys.map { case (i, v) => (i.toLong, v.toSeq) }
    val df = rows.toDF("doc_id", "emb")
    val found = Similarity.cosineNearDupPairs(df, "doc_id", "emb", dim,
      minCosine = 0.9).collect()
    // precision 1: every emitted pair is exactly verified and ordered
    assert(found.forall(r => r.getAs[Double]("cos") >= 0.9))
    assert(found.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    // recall on the planted (2i, 2i+1) pairs — deterministic seed, the
    // estimate at cosine ~0.95 is ~0.96; assert a safe floor
    val hits = found.count { r =>
      val a = r.getAs[Long]("id_a"); val b = r.getAs[Long]("id_b")
      a < 80 && b == a + 1 && a % 2 == 0
    }
    assert(hits >= 32, s"planted-pair recall $hits/40 below floor")
  }

  test("W8: NnAlg snapshot/restore round-trips the rolling buffer mid-fill") {
    import graft.streaming.{NnAlg, NnSettings, ReplayDp}
    def dp(d: Int) = ReplayDp("e", 1700000000L + 5 * d, 70.0, 0L,
      Array.fill(125)(d * 100.0), Array.emptyDoubleArray, d.toLong)
    // score = the window's LAST sample in G: emits 0.5 (>= probThresh)
    // once the buffer is full at dp 5 — only if the buffer survived
    val score = (vec: Array[Double]) => vec.last
    val whole = new NnAlg(NnSettings(), score)
    val wholeOut = (0 until 6).map(d => whole.processDp(dp(d)))
    // interrupted at dp 3: snapshot, restore into a FRESH instance
    val a = new NnAlg(NnSettings(), score)
    (0 until 3).foreach(d => a.processDp(dp(d)))
    val (st, cnt, hist) = a.snapshot
    assert(hist.length == 3 * 125, "snapshot must carry the buffer")
    val b = new NnAlg(NnSettings(), score)
    b.restore(st, cnt, hist)
    val resumed = (3 until 6).map(d => b.processDp(dp(d)))
    // the resumed run emits at dp 5 with the same window (a lost buffer
    // would leave specRatio at 0.0 and the FSM untouched)
    assert(resumed.last.specRatio == 0.5 &&
      wholeOut.last.specRatio == 0.5)
    assert(resumed.last.alarmState == wholeOut.last.alarmState)
    assert(resumed.last.alarmCount == wholeOut.last.alarmCount)
  }

  // ------------------------------------------------------------ NnAlg FSM

  test("NnAlg: stub scorer drives the FSM through the full buffer path") {
    import graft.streaming.{AlgRegistry, ReplayDp}
    val alg = AlgRegistry.create("nn:0:0.5")
    // six violent dps fill the buffer; std in G far above the 0.25 knee
    val out = (0 until 10).map { d =>
      val raw = Array.tabulate(125)(i => 1000.0 + 800 * math.sin((d * 125 + i) * 1.9))
      alg.processDp(ReplayDp("e", 1700000000L + 5 * d, 70.0, 0L, raw,
        Array.emptyDoubleArray, d.toLong))
    }
    // while filling: state stays 0
    assert(out.take(5).forall(_.alarmState == 0))
    // once emitting, p ~ 1: count climbs 5,10,15... → WARN at 2nd, ALARM at 3rd
    assert(out(6).alarmState == 1)
    assert(out(7).alarmState == 2)
    assert(out.last.alarmState == 2)
  }

  test("checkAlarmStates: a clean database comes back empty; a wrong stored state surfaces") {
    import spark.implicits._
    val dps = Seq(("A", 0L), ("A", 2L), ("B", 1L), ("B", 1L))
      .toDF("eventId", "alarmState")
    val clean = Seq(("A", 2L), ("B", 1L)).toDF("eventId", "osdAlarmState")
    assert(Curate.checkAlarmStates(clean, dps).count() == 0)
    val dirty = Seq(("A", 0L), ("B", 1L)).toDF("eventId", "osdAlarmState")
    val bad = Curate.checkAlarmStates(dirty, dps).collect()
    assert(bad.length == 1)
    assert(bad.head.getString(0) == "A" &&
      bad.head.getLong(1) == 0L && bad.head.getLong(2) == 2L)

    // the tool's own quarry must not slip through the check: a NULL
    // stored state against real dps, and an event with no dps at all
    val nullStored = Seq(("A", null.asInstanceOf[java.lang.Long]),
        ("C", java.lang.Long.valueOf(3L)))
      .toDF("eventId", "osdAlarmState")
    val res = Curate.checkAlarmStates(nullStored, dps).collect()
      .map(r => r.getString(0)).toSet
    assert(res == Set("A", "C"), // A: null vs 2; C: 3 vs no dps (null)
      s"null-safe mismatches wrong: $res")
  }

  test("mergePriority: the reference source wins; fallthrough is the earliest source") {
    import spark.implicits._
    val ref = Seq(("E1", "ref1"), ("E2", "ref2")).toDF("id", "payload")
    val s1 = Seq(("E2", "s1-2"), ("E3", "s1-3")).toDF("id", "payload")
    val s2 = Seq(("E3", "s2-3"), ("E4", "s2-4")).toDF("id", "payload")
    val out = Curate.mergePriority(Seq(ref, s1, s2), "id").collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[Int]("src_index"), r.getAs[String]("payload"))).toMap
    assert(out == Map(
      "E1" -> (0, "ref1"), "E2" -> (0, "ref2"),
      "E3" -> (1, "s1-3"), "E4" -> (2, "s2-4")))
  }
}
