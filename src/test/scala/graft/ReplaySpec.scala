package graft

import graft.streaming._

class ReplaySpec extends SparkSpec {

  private def seizureRaw(amp: Double = 100.0): Array[Double] =
    Array.tabulate(125)(i => amp * math.sin(2 * math.Pi * 5.0 * i / 25.0))

  private def quietRaw: Array[Double] = Array.fill(125)(0.5)

  private def dp(id: String, t: Long, raw: Array[Double], hr: Double = 70,
                 recorded: Long = 0L): ReplayDp =
    ReplayDp(id, t, hr, recorded, raw, Array.emptyDoubleArray, seq = t / 5)

  test("OsdAlg FSM walks 0 -> WARN -> ALARM and decays 2 -> 1 -> 0") {
    val alg = new OsdAlg(OsdSettings(mode = "V0"))
    val hot = seizureRaw()
    // warnTime=5, alarmTime=10, samplePeriod=5:
    // counts 5,10,15 => states 0 (not >5), 1 (not >10), 2 (>10)
    assert(alg.processDp(dp("e", 0, hot)).alarmState == 0)
    assert(alg.processDp(dp("e", 5, hot)).alarmState == 1)
    assert(alg.processDp(dp("e", 10, hot)).alarmState == 2)
    // leaving alarm: 2 -> 1 with count parked at warnTime, then -> 0
    val d1 = alg.processDp(dp("e", 15, quietRaw))
    assert(d1.alarmState == 1 && d1.alarmCount == 5.0)
    assert(alg.processDp(dp("e", 20, quietRaw)).alarmState == 0)
  }

  test("OsdAlg ratio gate: quiet signal never alarms") {
    val alg = new OsdAlg(OsdSettings(mode = "V0"))
    (0 until 10).foreach { i =>
      assert(alg.processDp(dp("e", i * 5L, quietRaw)).alarmState == 0)
    }
  }

  test("HrAlg: missing HR forces -1 state; thresholds trigger the FSM") {
    val alg = new HrAlg(HrSettings(mode = "MODE_SIMPLE",
      threshHigh = 150, threshLow = 40))
    assert(alg.processDp(dp("e", 0, quietRaw, hr = 70)).alarmState == 0)
    assert(alg.processDp(dp("e", 5, quietRaw, hr = -1)).alarmState == -1)
    // high HR: counts 5,10,15 -> 0,1,2
    assert(alg.processDp(dp("e", 10, quietRaw, hr = 160)).alarmState == 0)
    assert(alg.processDp(dp("e", 15, quietRaw, hr = 160)).alarmState == 1)
    assert(alg.processDp(dp("e", 20, quietRaw, hr = 160)).alarmState == 2)
  }

  test("batch replay sorts by time, skips manual-alarm dps, resets per event") {
    import spark.implicits._
    val hot = seizureRaw()
    val dps = Seq(
      // event A: delivered out of order; one manual dp must be skipped
      dp("A", 10, hot), dp("A", 0, hot), dp("A", 5, hot),
      dp("A", 15, hot, recorded = 5L), // manual: skipped (F11)
      // event B: quiet — FSM must start fresh (no carry-over from A)
      dp("B", 0, quietRaw), dp("B", 5, quietRaw)
    ).toDS()
    val out = Replay.replayBatch(dps, Seq("osd:V0")).collect()
      .groupBy(_.eventId).view.mapValues(_.sortBy(_.tsSec)).toMap
    assert(out("A").map(_.alarmState).toSeq == Seq(0, 1, 2)) // manual dp gone
    assert(out("B").map(_.alarmState).toSeq == Seq(0, 0))
  }

  test("detectionStats marks events reaching full alarm") {
    import spark.implicits._
    val hot = seizureRaw()
    val dps = (0 until 4).map(i => dp("S", i * 5L, hot)) ++
      (0 until 4).map(i => dp("Q", i * 5L, quietRaw))
    val stats = Replay.detectionStats(Replay.replayBatch(dps.toDS(), Seq("osd:V0")))
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(stats("S") == 1 && stats("Q") == 0)
  }

  test("FSM snapshot/restore round-trip: chunked replay == single run " +
    "(the contract flatMapGroupsWithState state persistence relies on)") {
    val hot = seizureRaw()
    val seq = Seq(dp("A", 0, hot), dp("A", 5, hot), dp("A", 10, hot),
      dp("A", 15, quietRaw), dp("A", 20, hot))
    // single run
    val one = new OsdAlg(OsdSettings(mode = "V0"))
    val expect = seq.map(d => one.processDp(d).alarmState)
    // chunked run with a state round-trip between micro-batches
    val a1 = new OsdAlg(OsdSettings(mode = "V0"))
    val out1 = seq.take(2).map(d => a1.processDp(d).alarmState)
    val (st, cnt, hist) = a1.snapshot
    val a2 = new OsdAlg(OsdSettings(mode = "V0"))
    a2.restore(st, cnt, hist)
    val out2 = seq.drop(2).map(d => a2.processDp(d).alarmState)
    assert(out1 ++ out2 == expect)
    // same for HrAlg including its history buffer
    val hrSeq = Seq(160.0, 160.0, -1.0, 70.0, 160.0, 160.0)
    val h1 = new HrAlg(HrSettings())
    val hExpect = hrSeq.zipWithIndex.map { case (h, i) =>
      h1.processDp(dp("A", i * 5L, quietRaw, hr = h)).alarmState }
    val h2a = new HrAlg(HrSettings())
    val hOut1 = hrSeq.take(3).zipWithIndex.map { case (h, i) =>
      h2a.processDp(dp("A", i * 5L, quietRaw, hr = h)).alarmState }
    val (hs, hc, hh) = h2a.snapshot
    val h2b = new HrAlg(HrSettings())
    h2b.restore(hs, hc, hh)
    val hOut2 = hrSeq.drop(3).zipWithIndex.map { case (h, i) =>
      h2b.processDp(dp("A", (i + 3) * 5L, quietRaw, hr = h)).alarmState }
    assert(hOut1 ++ hOut2 == hExpect)
  }

  // End-to-end Structured Streaming parity via MemoryStream — ALWAYS-ON
  // since round 11: the "fMGWS micro-batches exceed 100 s here" lore
  // (rounds 5-10) was substantially a processAllAvailable LIVELOCK —
  // with a ProcessingTimeTimeout registered the engine runs continuous
  // no-data batches and the await-offset signal never fires; draining
  // by polling the sink's row count completes in seconds. (The
  // checkpoint kill-and-recover variant is TrainerSpec's restart test.)
  test("streaming replay (flatMapGroupsWithState) matches batch replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hot = seizureRaw()
    val data = Seq(dp("A", 0, hot), dp("A", 5, hot), dp("A", 10, hot),
      dp("B", 0, quietRaw), dp("B", 5, quietRaw))

    val mem = MemoryStream[ReplayDp]
    val q = Replay.replayStream(mem.toDS(), "osd:V0")
      .writeStream.format("memory").queryName("replay_out")
      .outputMode("append").start()
    try {
      // two micro-batches exercise the state save/restore path
      mem.addData(data.take(2))
      awaitStreamRows(q, spark.table("replay_out").count(), 2L)
      mem.addData(data.drop(2))
      awaitStreamRows(q, spark.table("replay_out").count(), data.size.toLong)
      val streamed = spark.table("replay_out").as[Replay.ReplayOut].collect()
        .map(r => (r.eventId, r.tsSec) -> r.alarmState).toMap
      val batch = Replay.replayBatch(data.toDS(), Seq("osd:V0")).collect()
        .map(r => (r.eventId, r.tsSec) -> r.alarmState).toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
