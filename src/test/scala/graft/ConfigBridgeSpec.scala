package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config.ConfigBridge
import graft.config.ConfigBridge.Doc
import org.json4s._

/** The config-JSON entry point ([[ConfigBridge]]): the reference's
  * `loadConfig` + `configObj | osdbCfgObj` merge (`libosd/
  * configUtils.py`, `selectData.py:137-142`) parsed into the engine's
  * typed configs, with the fail-loud unknown-key contract. The
  * END-TO-END wiring (shipped nnConfig.json → EventFilters →
  * skeleton → forModelClass) is the ORACLED cfg1_config_bridge query;
  * this spec pins the parse/merge laws themselves. */
class ConfigBridgeSpec extends AnyFunSuite {

  private def doc(json: String, src: String = "test"): Doc =
    ConfigBridge.parseDoc(json, src)

  // --------------------------------------------------------------- merge

  test("merge is Python dict-union: SHALLOW, override side wins whole-key") {
    val base = doc("""{"a": 1, "eventFilters": {"includeTypes": ["x"],
                      "excludeTypes": ["y"]}, "keep": "base"}""")
    val over = doc("""{"eventFilters": {"includeTypes": ["z"]}, "new": 2}""")
    val m = ConfigBridge.merge(base, over)
    // untouched key survives; new key arrives
    assert(m.fields("a") == JInt(1) && m.fields("new") == JInt(2))
    assert(m.fields("keep") == JString("base"))
    // the SECTION is REPLACED wholesale, not deep-merged: base's
    // excludeTypes is GONE (configObj | osdbCfgObj is a top-level
    // union — Python's | does not recurse)
    val ef = m.section("eventFilters")
    assert(ef.get("includeTypes").contains(JArray(List(JString("z")))))
    assert(!ef.contains("excludeTypes"),
      "shallow merge must replace the whole section object")
  }

  test("loadMerged follows the osdbCfg pointer; the osdb side WINS") {
    val dir = Files.createTempDirectory("cfgbridge").toFile
    dir.deleteOnExit()
    val osdb = new java.io.File(dir, "osdbCfg.json")
    Files.write(osdb.toPath,
      """{"eventFilters": {"excludeTypes": ["osdb-wins"]},
         "randomSeed": 99}""".getBytes("UTF-8"))
    val main = new java.io.File(dir, "nnConfig.json")
    Files.write(main.toPath,
      """{"osdbCfg": "osdbCfg.json", "randomSeed": 1,
         "eventFilters": {"excludeTypes": ["main-loses"]}}""".getBytes("UTF-8"))
    val m = ConfigBridge.loadMerged(main.getPath)
    assert(ConfigBridge.randomSeed(m).contains(99L))
    assert(ConfigBridge.eventFilters(m).excludeTypes == Seq("osdb-wins"))
    // no pointer -> identity
    val alone = ConfigBridge.loadMerged(osdb.getPath)
    assert(ConfigBridge.randomSeed(alone).contains(99L))
  }

  // ----------------------------------------------------------- fail-loud

  test("unknown keys raise with the offending names (closed sections)") {
    // eventFilters: a typo'd filter key must not silently select everything
    val e1 = intercept[IllegalArgumentException] {
      ConfigBridge.eventFilters(doc("""{"eventFilters": {"excludeSubType": ["x"]}}"""))
    }
    assert(e1.getMessage.contains("excludeSubType"))
    // dataProcessing
    val e2 = intercept[IllegalArgumentException] {
      ConfigBridge.dataProcessing(doc("""{"dataProcessing": {"widnow": 125}}"""))
    }
    assert(e2.getMessage.contains("widnow"))
    // top level
    val e3 = intercept[IllegalArgumentException] {
      ConfigBridge.validateTop(doc("""{"eventFilterss": {}}"""))
    }
    assert(e3.getMessage.contains("eventFilterss"))
  }

  test("reference doc-key conventions are exempt from fail-loud") {
    // _-prefixed alternates, *_desc prose, #-comment keys — all present
    // in the shipped files, never read by any reference tool
    val d = doc("""{"eventFilters_desc": "prose", "_disabled": 1,
                    "eventFilters": {"_includeTypes": ["off"],
                    "includeTypes_desc": "prose", "# note": "hi",
                    "includeTypes": ["Seizure"]},
                    "dataProcessing": {"_all_features": ["x"], "window": 50}}""")
    ConfigBridge.validateTop(d)
    assert(ConfigBridge.eventFilters(d).includeTypes == Seq("Seizure"))
    assert(ConfigBridge.dataProcessing(d).window == 50)
  }

  // --------------------------------------------------------------- typing

  test("dataProcessing: defaults, nHistory alias, null oversample") {
    val empty = ConfigBridge.dataProcessing(doc("""{}"""))
    assert(empty.window == 125 && empty.step == 125 &&
      empty.historyN == 0 && empty.oversample == "none")
    // legacy alias (addFeatureHistory.py:243-245): nHistory read only
    // when addFeatureHistoryLength is absent
    val alias = ConfigBridge.dataProcessing(
      doc("""{"dataProcessing": {"nHistory": 3}}"""))
    assert(alias.historyN == 3)
    val both = ConfigBridge.dataProcessing(
      doc("""{"dataProcessing": {"nHistory": 3, "addFeatureHistoryLength": 7}}"""))
    assert(both.historyN == 7)
    // "oversample": null is the reference's "none" (augmentData.py:545
    // guards `is not None` before lowercasing)
    val nul = ConfigBridge.dataProcessing(
      doc("""{"dataProcessing": {"oversample": null, "undersample": "RANDOM"}}"""))
    assert(nul.oversample == "none" && nul.undersample == "random")
  }

  test("featureExtractConfig pins the order-2 filtfilt; other orders raise") {
    val dp = ConfigBridge.dataProcessing(doc(
      """{"dataProcessing": {"window": 100, "step": 50, "highPassFreq": 0.7,
          "highPassOrder": 2}}"""))
    val fe = ConfigBridge.featureExtractConfig(dp)
    assert(fe.window == 100 && fe.step == 50 && fe.highPassHz == 0.7)
    val e = intercept[IllegalArgumentException] {
      ConfigBridge.featureExtractConfig(dp.copy(highPassOrder = 4))
    }
    assert(e.getMessage.contains("order"))
  }

  test("runSequenceConfig: oversample mapping and historyN floor") {
    val none = ConfigBridge.runSequenceConfig(
      ConfigBridge.dataProcessing(doc("""{}""")), k = 3)
    assert(none.oversampleFactor == 1 && none.historyN == 1 && none.k == 3)
    val rnd = ConfigBridge.runSequenceConfig(
      ConfigBridge.dataProcessing(
        doc("""{"dataProcessing": {"oversample": "random",
                "addFeatureHistoryLength": 5}}""")), k = 4, tcAugFac = 1)
    assert(rnd.oversampleFactor == 2 && rnd.historyN == 5 &&
      rnd.k == 4 && rnd.tcAugFac == 1)
  }

  test("modelConfig is an OPEN namespace; modelClass + subtypeWeights typed") {
    val d = doc("""{"modelConfig": {"modelClass": "rfModel.RfModel",
                    "n_estimators": 100, "anyKeyAtAll": true,
                    "subtypeWeights": {"tonicClonic": 2.5, "other": 1}}}""")
    assert(ConfigBridge.modelClass(d) == "rfModel.RfModel")
    assert(ConfigBridge.subtypeWeights(d) ==
      Map("tonicClonic" -> 2.5, "other" -> 1.0))
    val e = intercept[IllegalArgumentException] {
      ConfigBridge.modelClass(doc("""{"modelConfig": {}}"""))
    }
    assert(e.getMessage.contains("modelClass"))
  }

  test("withParam applies the runOptimisation precedence; no-match raises") {
    val d = doc("""{"randomSeed": 1,
                    "modelConfig": {"n_estimators": 100, "window": 9},
                    "dataProcessing": {"window": 125, "step": 125}}""")
    // top level wins first
    assert(ConfigBridge.withParam(d, "randomSeed", JInt(7))
      .fields("randomSeed") == JInt(7))
    // modelConfig before dataProcessing (runOptimisation.py:49-54) —
    // 'window' exists in BOTH; the modelConfig one must take the hit
    val w = ConfigBridge.withParam(d, "window", JInt(50))
    assert(w.section("modelConfig")("window") == JInt(50))
    assert(w.section("dataProcessing")("window") == JInt(125))
    // dataProcessing fallback
    assert(ConfigBridge.withParam(d, "step", JInt(25))
      .section("dataProcessing")("step") == JInt(25))
    // no level matches: the reference silently re-runs the baseline;
    // the engine raises (withKnob convention)
    val e = intercept[IllegalArgumentException] {
      ConfigBridge.withParam(d, "stpe", JInt(25))
    }
    assert(e.getMessage.contains("stpe"))
  }

  // ------------------------------------------------ testRunner config

  private def toneDp(bin: Int, d: Long, amp: Double = 1000.0) =
    graft.streaming.ReplayDp("E", 1700000000L + d * 5, 80.0, 0L,
      Array.tabulate(125)(i => amp * math.cos(2 * math.Pi * bin * i / 125.0)),
      Array.emptyDoubleArray, d)

  test("testRunnerConfig parses the shipped testConfig.json; buildAlg wires the flap branch") {
    import graft.config.ConfigBridge
    val cfg = ConfigBridge.testRunnerConfig(
      ConfigBridge.loadResource("/osdb/testConfig.json"))
    // top-level invalidEvents is the F4 list here (selectData puts it
    // under osdbConfig; testRunner at the top)
    assert(cfg.eventFilters.invalidIds.size == 20 &&
      cfg.eventFilters.invalidIds.contains("44314"))
    assert(cfg.eventFilters.excludeDataSources == Seq("Phone", "AndroidWear"))
    assert(cfg.algorithms.size == 8)
    assert(cfg.algorithms.filter(_.enabled).map(_.name).toSet ==
      Set("OSD_flap", "OSD_no_flap", "SpecCnn", "amber"))

    val flapAlg = ConfigBridge.buildAlg(
      cfg.algorithms.find(_.name == "OSD_flap").get)
    val noFlap = ConfigBridge.buildAlg(
      cfg.algorithms.find(_.name == "OSD_no_flap").get)
    // the entry name is injected into the detector (testRunner.py:136)
    assert(flapAlg.name == "OSD_flap" && noFlap.name == "OSD_no_flap")
    // bin 12 = 2.4 Hz: inside the flap band [2,4), outside main [3,8) —
    // only the flap-enabled build should ever raise the FSM
    def runTone(alg: graft.streaming.SdAlg, bin: Int): Int = {
      alg.reset()
      (0L until 5L).map(d => alg.processDp(toneDp(bin, d)).alarmState).max
    }
    assert(runTone(flapAlg, 12) == 2, "flap band must drive the FSM to ALARM")
    assert(runTone(noFlap, 12) == 0, "flap-disabled build must ignore 2.4 Hz")
    // bin 30 = 6 Hz: main band — both fire
    assert(runTone(flapAlg, 30) == 2 && runTone(noFlap, 30) == 2)
    // bin 2 = 0.4 Hz: neither
    assert(runTone(flapAlg, 2) == 0 && runTone(noFlap, 2) == 0)
    // a typo'd settings key fails loudly at build time
    val bad = cfg.algorithms.find(_.name == "OSD_flap").get
    val e = intercept[IllegalArgumentException] {
      ConfigBridge.buildAlg(bad.copy(settings =
        bad.settings + ("alarmTresh" -> JInt(5))))
    }
    assert(e.getMessage.contains("alarmTresh"))
  }

  test("buildAlg deploys model-bearing entries from graft artifacts") {
    import graft.config.ConfigBridge
    import graft.config.ConfigBridge.TestRunnerAlg
    val dir = Files.createTempDirectory("cfgmodels").toString
    // a tiny CNN artifact for the nnAlg entry
    graft.ml.ModelIo.saveCnn(graft.ml.Cnn.CnnModel(
      nFilters = 2, width = 4, window = 125,
      filters = Array.fill(8)(0.1), filterBias = Array.fill(2)(0.0),
      dense = Array(1.0, -1.0), bias = 0.0, mean = 0.0, std = 1.0),
      s"$dir/cnn.graft")
    val nn = ConfigBridge.buildAlg(TestRunnerAlg("cnn", "nnAlg.NnAlg",
      enabled = true, settings = Map(
        "modelFname" -> JString("cnn.graft"), "sdThresh" -> JDouble(0.0),
        "samplePeriod" -> JDouble(5.0))), modelDir = dir)
    assert(nn.name == "cnn")
    // a geometry-consistent SpecCnn artifact for the specAlg entry:
    // imageDims(analysisSamp=250, specSamp=50, specStep=5) = (25, 41)
    graft.ml.ModelIo.saveSpecCnn(graft.ml.SpecCnn.SpecCnnModel(
      nFreq = 25, nSpec = 41,
      layers = Array(graft.ml.SpecCnn.Layer(1, 1,
        Array.fill(9)(0.1), Array(0.0))),
      dense = Array.fill(13 * 21)(0.01), bias = 0.0, mean = 0.0, std = 1.0),
      s"$dir/spec.graft")
    val spec = ConfigBridge.buildAlg(TestRunnerAlg("SpecCnn", "specAlg.SpecAlg",
      enabled = true, settings = Map(
        "modelFname" -> JString("spec.graft"),
        "analysisSamp" -> JInt(250), "specSamp" -> JInt(50),
        "specStep" -> JInt(5))), modelDir = dir)
    assert(spec.name == "SpecCnn")
    // the wrong artifact family for nnAlg fails loudly with the format
    val e = intercept[IllegalArgumentException] {
      ConfigBridge.buildAlg(TestRunnerAlg("x", "nnAlg.NnAlg",
        enabled = true,
        settings = Map("modelFname" -> JString("spec.graft"))),
        modelDir = dir)
    }
    assert(e.getMessage.contains("graft-speccnn"))
    // amberAlg.AmberAlg (testRunner/amberAlg.py): the AMBER alias
    // deploys amber-family artifacts (graft-lstm2/convpipe) through
    // the nnAlg window seam
    val rnd = new scala.util.Random(31)
    val ah1 = 2; val ah2 = 2
    graft.ml.ModelIo.saveLstm2(graft.ml.LstmStack.Lstm2Model(ah1, ah2, 48,
      wx1 = Array.fill(4 * ah1)(rnd.nextGaussian()),
      wh1 = Array.fill(4 * ah1 * ah1)(rnd.nextGaussian()),
      b1 = Array.fill(4 * ah1)(rnd.nextGaussian()),
      wx2 = Array.fill(4 * ah2 * ah1)(rnd.nextGaussian()),
      wh2 = Array.fill(4 * ah2 * ah2)(rnd.nextGaussian()),
      b2 = Array.fill(4 * ah2)(rnd.nextGaussian()),
      dense = Array.fill(ah2)(rnd.nextGaussian()),
      bias = 0.0, mean = 0.0, std = 1.0), s"$dir/amber.graft")
    val amber = ConfigBridge.buildAlg(TestRunnerAlg("Amber",
      "amberAlg.AmberAlg", enabled = true, settings = Map(
        "modelFname" -> JString("amber.graft"),
        "mode" -> JString("raw"))), modelDir = dir)
    assert(amber.name == "Amber")
    // a .keras modelFname hits the named deployment-seam raise before
    // any filesystem touch, exactly like nnAlg entries
    val ek = intercept[IllegalArgumentException] {
      ConfigBridge.buildAlg(TestRunnerAlg("Amber2", "amberAlg.AmberAlg",
        enabled = true,
        settings = Map("modelFname" -> JString("amber.keras"))),
        modelDir = dir)
    }
    assert(ek.getMessage.contains(".keras runtime artifact"))
    // a non-amber-family graft artifact fails with the format named
    val ef = intercept[IllegalArgumentException] {
      ConfigBridge.buildAlg(TestRunnerAlg("Amber3", "amberAlg.AmberAlg",
        enabled = true,
        settings = Map("modelFname" -> JString("cnn.graft"))),
        modelDir = dir)
    }
    assert(ef.getMessage.contains("amber-family"))
    // the dead legacy trio stays declined, with the reasons written
    val ed = intercept[IllegalArgumentException] {
      ConfigBridge.buildAlg(TestRunnerAlg("svm", "svmAlg.SvmAlg",
        enabled = true, settings = Map.empty))
    }
    assert(ed.getMessage.contains("nnTraining") &&
      ed.getMessage.contains("jamie1"))
    // osdAlg_v1: spec-gated ratio at raw power scale — a main-band tone
    // still alarms (spec power clears the same 100 threshold)
    val v1 = ConfigBridge.buildAlg(TestRunnerAlg("OSD_v1",
      "osdAlg_v1.OsdAlg_v1", enabled = true, settings = Map(
        "alarmFreqMin" -> JInt(3), "alarmFreqMax" -> JInt(8),
        "alarmThresh" -> JInt(100), "alarmRatioThresh" -> JInt(57))))
    v1.reset()
    assert((0L until 5L).map(d => v1.processDp(toneDp(30, d)).alarmState).max == 2)
  }

  // ------------------------------------------------- shipped files parse

  test("all three shipped reference configs parse end-to-end") {
    // the main shipped file (also the cfg1 driver) from the MAIN
    // classpath; the tf-test and deep-pytorch variants from test
    // resources — full top-level validation + every typed section
    val main = ConfigBridge.validateTop(
      ConfigBridge.loadResource("/osdb/nnConfig.json"))
    val ef = ConfigBridge.eventFilters(main)
    assert(ef.require3dData && !ef.requireHrData)
    assert(ef.excludeDataSources == Seq("Phone", "AndroidWear"))
    assert(ef.excludeText == Seq("bulk type/subtype set"))
    val dp = ConfigBridge.dataProcessing(main)
    assert(dp.window == 125 && dp.step == 125 && dp.highPassFreq == 0.5 &&
      dp.historyN == 5 && dp.oversample == "none" &&
      dp.undersample == "random" && dp.seizureTimeRange.contains((-20, 20)) &&
      dp.features.size == 15)
    assert(ConfigBridge.modelClass(main) == "rfModel.RfModel")
    assert(ConfigBridge.randomSeed(main).contains(42L))
    // the dispatch string resolves in the engine registry
    val cand = graft.ml.RunSequence.NestedCandidate
      .forModelClass(ConfigBridge.modelClass(main))
    assert(cand.basis == "features")

    // the reference dispatch splits a FULL module path on dots
    // (nnTrainer.load_model_class:269-274) — the deep-pytorch shipped
    // file carries the fully-qualified form; a bare class name raises
    assert(graft.ml.RunSequence.NestedCandidate.forModelClass(
      "user_tools.nnTraining2.rfModel.RfModel").basis == "features")
    intercept[IllegalArgumentException] {
      graft.ml.RunSequence.NestedCandidate.forModelClass("RfModel")
    }

    for (r <- Seq("/osdb/nnConfig_test.json", "/osdb/nnConfig_deep_pytorch.json")) {
      val d = ConfigBridge.validateTop(ConfigBridge.loadResource(r))
      ConfigBridge.eventFilters(d)
      val p = ConfigBridge.dataProcessing(d)
      assert(p.window > 0 && p.step > 0)
      // each shipped variant's modelClass resolves in the registry
      val c = graft.ml.RunSequence.NestedCandidate
        .forModelClass(ConfigBridge.modelClass(d))
      assert(c.basis.nonEmpty)
    }
  }

  // --------------------------------------- every shipped testConfig variant

  /** A ReplayDp carrying a tone ONLY in the data3D x-axis (y=z=0,
    * stored magnitude ZERO): under osdAlg_v1's |x|+|y|+|z| recompute
    * (osdAlg_v1.py:48-61) the detector sees the tone; a mapping that
    * read the stored magnitude would see silence. The tone rides on a
    * +1000 offset so |x| == x (abs-sum == the x series). */
  private def tone3dDp(bin: Int, d: Long, amp: Double = 1000.0) =
    graft.streaming.ReplayDp("E", 1700000000L + d * 5, 80.0, 0L,
      Array.fill(125)(0.0),
      Array.tabulate(375)(j =>
        if (j % 3 == 0) 1000.0 + amp * math.cos(2 * math.Pi * bin * (j / 3) / 125.0)
        else 0.0),
      d)

  test("every shipped testConfig variant builds or fails with its documented reason") {
    import graft.config.ConfigBridge
    import graft.streaming.DeviceAlg

    // testConfig_HR — the HR detector farm: both enabled entries build
    // with injected names and the file's thresholds/modes wired
    val hr = ConfigBridge.testRunnerConfig(
      ConfigBridge.loadResource("/osdb/testConfig_HR.json"))
    assert(hr.algorithms.map(_.name) ==
      Seq("OSD_v1", "HR_Simple", "HR_Adaptive", "Phone"))
    val built = ConfigBridge.enabledAlgFactories(hr).map(_())
    assert(built.map(_.name) == Seq("HR_Simple", "HR_Adaptive"))
    // the file sets thresh_high 120 (not the 150 default): hr 125
    // alarms MODE_SIMPLE, hr 115 does not
    val simple = built.head
    simple.reset()
    val hi = (0L until 4L).map(d => simple.processDp(
      graft.streaming.ReplayDp("E", 1700000000L + d * 5, 125.0, 0L,
        Array.emptyDoubleArray, Array.emptyDoubleArray, d)).alarmState).max
    assert(hi >= 1, "hr 125 must cross the FILE's thresh_high 120")
    simple.reset()
    val lo = (0L until 4L).map(d => simple.processDp(
      graft.streaming.ReplayDp("E", 1700000000L + d * 5, 115.0, 0L,
        Array.emptyDoubleArray, Array.emptyDoubleArray, d)).alarmState).max
    assert(lo == 0, "hr 115 sits under the FILE's thresh_high 120")

    // the OSD_v1 entry (disabled in the file, built directly): the v1
    // mapping recomputes |x|+|y|+|z| from data3D — a tone delivered
    // ONLY via the x-axis alarms even though the stored magnitude is
    // silent (the r17 mapping read the stored magnitude: ADVICE item)
    val v1 = ConfigBridge.buildAlg(hr.algorithms.head)
    v1.reset()
    assert((0L until 5L).map(d => v1.processDp(tone3dDp(30, d)).alarmState).max == 2,
      "osdAlg_v1 must see the data3D abs-sum tone")

    // testConfig_HrFrozen — only the Phone DeviceAlg entry is enabled;
    // it builds a device client factory carrying the entry name
    val fz = ConfigBridge.testRunnerConfig(
      ConfigBridge.loadResource("/osdb/testConfig_HrFrozen.json"))
    val fzBuilt = ConfigBridge.enabledAlgFactories(fz).map(_())
    assert(fzBuilt.map(_.name) == Seq("Phone"))
    assert(fzBuilt.head.isInstanceOf[DeviceAlg])

    // testConfig_devices — a SIX-entry device farm: every entry builds
    // a DeviceAlg under its own injected name (stats would otherwise
    // collapse into one 'DeviceAlg' label)
    val dv = ConfigBridge.testRunnerConfig(
      ConfigBridge.loadResource("/osdb/testConfig_devices.json"))
    val dvBuilt = ConfigBridge.enabledAlgFactories(dv).map(_())
    assert(dvBuilt.size == 6 && dvBuilt.forall(_.isInstanceOf[DeviceAlg]))
    assert(dvBuilt.map(_.name).distinct.size == 6)
    assert(dvBuilt.map(_.name).contains("OsdAlg_4.3.1_flap"))

    // testConfig_pte — the ExecuTorch modelFname hits the documented
    // deployment-seam raise (a .pte runtime file is not a graft
    // artifact), BEFORE any filesystem touch
    val pte = ConfigBridge.testRunnerConfig(
      ConfigBridge.loadResource("/osdb/testConfig_pte.json"))
    val e = intercept[IllegalArgumentException] {
      ConfigBridge.enabledAlgFactories(pte).map(_())
    }
    assert(e.getMessage.contains(".pte runtime artifact"))

    // testDeviceHrAlg — its own format: the shared algorithms array +
    // eventHrData synthetic traces; the enabled HR farm replays them
    val (algs, traces) = ConfigBridge.deviceHrConfig(
      ConfigBridge.loadResource("/osdb/testDeviceHrAlg.json"))
    assert(traces.map(_.name) ==
      Seq("Spike", "Smaller Spike", "Slow Rise", "Fast Rise"))
    assert(traces.forall(_.hrVals.length == 30))
    val hrFarm = algs.filter(a => a.enabled && a.algClass == "hrAlg.HrAlg")
      .map(ConfigBridge.buildAlg(_))
    assert(hrFarm.map(_.name) == Seq("HR_Simple", "HR_Adaptive", "HR_Average"))
    def drive(alg: graft.streaming.SdAlg, t: ConfigBridge.HrTrace): Int = {
      alg.reset()
      t.hrVals.zipWithIndex.map { case (h, i) =>
        alg.processDp(graft.streaming.ReplayDp(t.name, 1700000000L + i * 5,
          h, 0L, Array.emptyDoubleArray, Array.emptyDoubleArray, i.toLong))
          .alarmState
      }.max
    }
    // the file's HR_Simple thresholds (150/40) never fire on the
    // Spike trace (peaks 105); the adaptive detector (offsets 20/20)
    // catches the Smaller Spike's 60→120 jump against its moving avg
    assert(drive(hrFarm(0), traces.head) == 0)
    assert(drive(hrFarm(1), traces(1)) >= 1)
  }

  test("the shipped dataSummariser osdbCfg template parses under summariserConfig") {
    import graft.config.ConfigBridge
    // checked-in verbatim from user_tools/dataSummariser/
    // osdbCfg.json.template: the _-prefixed keys (_cacheDir,
    // _dataFiles, _skipElements) are the reference's disabled-alternate
    // convention and must pass the doc-key exemption, the live keys
    // parse typed
    val cfg = ConfigBridge.summariserConfig(
      ConfigBridge.loadResource("/osdb/osdbCfg.json.template"))
    assert(cfg.dataFiles ==
      Seq("simulated_events.json", "osdb_3min_allSeizures.json"))
    assert(cfg.invalidIds.isEmpty && cfg.skipElements.isEmpty)
    // an unknown live key still raises (the exemption is doc keys only)
    val e = intercept[IllegalArgumentException] {
      ConfigBridge.summariserConfig(ConfigBridge.parseDoc(
        """{"dataFiles": [], "cacheDirr": "x"}""", "t"))
    }
    assert(e.getMessage.contains("cacheDirr"))
  }
}
