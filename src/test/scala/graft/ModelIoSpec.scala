package graft

import java.nio.file.{Files, Paths}

import graft.ml.{Cnn, Lstm, ModelIo}

/** Model export/import ([[graft.ml.ModelIo]], the reference's
  * deployment-artifact workflow): bit-exact weight round-trips,
  * loud failures on wrong/corrupt artifacts, and the manifest. */
class ModelIoSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("modelio").resolve(name).toString

  private def randCnn(seed: Int): Cnn.CnnModel = {
    val rnd = new scala.util.Random(seed)
    Cnn.CnnModel(4, 7, 64,
      filters = Array.fill(28)(rnd.nextGaussian()),
      filterBias = Array.fill(4)(rnd.nextGaussian()),
      dense = Array.fill(4)(rnd.nextGaussian()),
      bias = rnd.nextGaussian(), mean = rnd.nextGaussian() * 100,
      std = math.abs(rnd.nextGaussian()) + 0.5)
  }

  private def randLstm(seed: Int): Lstm.LstmModel = {
    val rnd = new scala.util.Random(seed)
    val h = 3
    Lstm.LstmModel(h, 48,
      wx = Array.fill(4 * h)(rnd.nextGaussian()),
      wh = Array.fill(4 * h * h)(rnd.nextGaussian()),
      b = Array.fill(4 * h)(rnd.nextGaussian()),
      dense = Array.fill(h)(rnd.nextGaussian()),
      bias = rnd.nextGaussian(), mean = 3.7, std = 2.1)
  }

  test("CNN artifact round-trips bit-exactly (weights AND scores)") {
    val m = randCnn(11)
    val p = tmp("cnn.json")
    ModelIo.saveCnn(m, p)
    val back = ModelIo.loadCnn(p)
    assert(back.filters.toSeq == m.filters.toSeq)
    assert(back.dense.toSeq == m.dense.toSeq)
    assert(java.lang.Double.doubleToLongBits(back.mean) ==
      java.lang.Double.doubleToLongBits(m.mean))
    val rnd = new scala.util.Random(5)
    (0 until 10).foreach { _ =>
      val w = Array.fill(64)(rnd.nextGaussian() * 300 + 900)
      assert(java.lang.Double.doubleToLongBits(Cnn.forward(back, w)) ==
        java.lang.Double.doubleToLongBits(Cnn.forward(m, w)))
    }
  }

  test("spectrogram-CNN artifact round-trips bit-exactly (weights AND scores); wrong format loud") {
    val rnd = new scala.util.Random(17)
    val layers = Array(
      graft.ml.SpecCnn.Layer(1, 2,
        Array.fill(18)(rnd.nextGaussian()), Array.fill(2)(rnd.nextGaussian())),
      graft.ml.SpecCnn.Layer(2, 3,
        Array.fill(54)(rnd.nextGaussian()), Array.fill(3)(rnd.nextGaussian())))
    val m = graft.ml.SpecCnn.SpecCnnModel(6, 5, layers,
      dense = Array.fill(3 * 2 * 2)(rnd.nextGaussian()),
      bias = rnd.nextGaussian(), mean = 0.21, std = 1.7)
    val p = tmp("speccnn.json")
    ModelIo.saveSpecCnn(m, p)
    val back = ModelIo.loadSpecCnn(p)
    assert(back.nFreq == 6 && back.nSpec == 5)
    assert(back.layers.zip(m.layers).forall { case (a, b) =>
      a.cIn == b.cIn && a.cOut == b.cOut &&
        a.w.toSeq == b.w.toSeq && a.b.toSeq == b.b.toSeq
    })
    assert(back.dense.toSeq == m.dense.toSeq)
    (0 until 10).foreach { _ =>
      val img = Array.fill(30)(rnd.nextGaussian() * 2)
      assert(java.lang.Double.doubleToLongBits(graft.ml.SpecCnn.forward(back, img)) ==
        java.lang.Double.doubleToLongBits(graft.ml.SpecCnn.forward(m, img)))
    }
    // wrong format is loud
    val pc = tmp("notspec.json")
    ModelIo.saveCnn(randCnn(3), pc)
    val e = intercept[RuntimeException](ModelIo.loadSpecCnn(pc))
    assert(e.getMessage.contains("graft-speccnn"))
  }

  test("LSTM artifact round-trips bit-exactly (weights AND scores)") {
    val m = randLstm(13)
    val p = tmp("lstm.json")
    ModelIo.saveLstm(m, p)
    val back = ModelIo.loadLstm(p)
    assert(back.wx.toSeq == m.wx.toSeq && back.wh.toSeq == m.wh.toSeq)
    val rnd = new scala.util.Random(7)
    (0 until 10).foreach { _ =>
      val w = Array.fill(48)(rnd.nextGaussian() * 2)
      assert(java.lang.Double.doubleToLongBits(Lstm.forward(back, w)) ==
        java.lang.Double.doubleToLongBits(Lstm.forward(m, w)))
    }
  }

  test("artifacts fail loudly: wrong format, bad version, NaN weights") {
    val cnn = randCnn(3)
    val pc = tmp("cnn2.json")
    ModelIo.saveCnn(cnn, pc)
    // a CNN artifact must not load as an LSTM
    val e1 = intercept[Exception](ModelIo.loadLstm(pc))
    assert(e1.getMessage.contains("format"))
    // corrupt version
    val raw = new String(Files.readAllBytes(Paths.get(pc)), "UTF-8")
    val pv = tmp("cnn3.json")
    Files.write(Paths.get(pv),
      raw.replace("\"version\":1", "\"version\":99").getBytes("UTF-8"))
    val e2 = intercept[Exception](ModelIo.loadCnn(pv))
    assert(e2.getMessage.contains("version"))
    // NaN weight refuses to serialize
    val bad = cnn.copy(filters = cnn.filters.updated(0, Double.NaN))
    val e3 = intercept[IllegalArgumentException](
      ModelIo.saveCnn(bad, tmp("bad.json")))
    assert(e3.getMessage.contains("NaN"))
  }

  test("deployed detector from a loaded artifact == the trained one") {
    val m = randCnn(17)
    val p = tmp("cnn4.json")
    ModelIo.saveCnn(m, p)
    val alg1 = Cnn.deployedCnn(m)
    val alg2 = Cnn.deployedCnn(ModelIo.loadCnn(p))
    val rnd = new scala.util.Random(9)
    val w = Array.fill(64)(rnd.nextGaussian() * 300 + 900)
    assert(Cnn.scorer(m)(w) == Cnn.scorer(ModelIo.loadCnn(p))(w))
    assert(alg1.name == alg2.name)
  }

  test("manifest carries the serving contract") {
    val s = ModelIo.manifest("cnn", 125, 912.5, 80.25,
      Map("trainedOn" -> "sf0.01"))
    assert(s.contains("\"modelClass\":\"cnn\""))
    assert(s.contains("\"window\":125"))
    assert(s.contains("\"trainedOn\":\"sf0.01\""))
    val p = tmp("manifest.json")
    ModelIo.saveManifest(p, "lstm", 250, 0.0, 1.0)
    assert(new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
      .contains("\"graft-model-manifest\""))
  }

  test("stacked-LSTM artifact round-trips bit-exactly (weights AND scores); wrong format loud") {
    import graft.ml.LstmStack
    val rnd = new scala.util.Random(17)
    val h1 = 3; val h2 = 2
    val m = LstmStack.Lstm2Model(h1, h2, 48,
      wx1 = Array.fill(4 * h1)(rnd.nextGaussian()),
      wh1 = Array.fill(4 * h1 * h1)(rnd.nextGaussian()),
      b1 = Array.fill(4 * h1)(rnd.nextGaussian()),
      wx2 = Array.fill(4 * h2 * h1)(rnd.nextGaussian()),
      wh2 = Array.fill(4 * h2 * h2)(rnd.nextGaussian()),
      b2 = Array.fill(4 * h2)(rnd.nextGaussian()),
      dense = Array.fill(h2)(rnd.nextGaussian()),
      bias = rnd.nextGaussian(), mean = 3.7, std = 2.1)
    val p = tmp("lstm2.json")
    ModelIo.saveLstm2(m, p)
    val back = ModelIo.loadLstm2(p)
    assert(back.wx1.toSeq == m.wx1.toSeq && back.wh2.toSeq == m.wh2.toSeq)
    val r2 = new scala.util.Random(9)
    (0 until 10).foreach { _ =>
      val w = Array.fill(48)(r2.nextGaussian() * 2)
      assert(java.lang.Double.doubleToLongBits(LstmStack.forward(back, w)) ==
        java.lang.Double.doubleToLongBits(LstmStack.forward(m, w)))
    }
    // a single-layer artifact must not half-load as a stacked one
    val pl = tmp("lstm1.json")
    ModelIo.saveLstm(randLstm(3), pl)
    val e = intercept[Exception](ModelIo.loadLstm2(pl))
    assert(e.getMessage.contains("graft-lstm2"))
  }

  test("composed conv-pipe artifact round-trips bit-exactly; wrong format loud") {
    import graft.ml.{ConvFront, ConvPipe, LstmStack}
    val rnd = new scala.util.Random(59)
    val front = ConvFront.ConvFrontModel(24,
      blocks = Seq(
        ConvFront.ConvBlock(1, 2, 3,
          w = Array.fill(6)(rnd.nextGaussian()),
          b = Array.fill(2)(rnd.nextGaussian() * 0.1),
          scale = Array.fill(2)(1.0 + rnd.nextGaussian() * 0.1),
          shift = Array.fill(2)(rnd.nextGaussian() * 0.1)),
        ConvFront.ConvBlock(2, 2, 3,
          w = Array.fill(12)(rnd.nextGaussian()),
          b = Array.fill(2)(rnd.nextGaussian() * 0.1),
          scale = Array.fill(2)(1.0 + rnd.nextGaussian() * 0.1),
          shift = Array.fill(2)(rnd.nextGaussian() * 0.1))),
      mix = Array.fill(2)(rnd.nextGaussian()),
      mixBias = rnd.nextGaussian() * 0.1, mean = 0.4, std = 1.3)
    val h1 = 2; val h2 = 2; val nH = 2
    val stack = LstmStack.Lstm2Model(h1, h2, front.outLen,
      wx1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.5),
      wh1 = Array.fill(4 * h1 * h1)(rnd.nextGaussian() * 0.4),
      b1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.2),
      wx2 = Array.fill(4 * h2 * 2 * h1)(rnd.nextGaussian() * 0.5),
      wh2 = Array.fill(4 * h2 * h2)(rnd.nextGaussian() * 0.4),
      b2 = Array.fill(4 * h2)(rnd.nextGaussian() * 0.2),
      dense = Array.fill(h2)(rnd.nextGaussian()),
      bias = 0.1, mean = 0.0, std = 1.0,
      head = "mha", bidir = true,
      wx1b = Array.fill(4 * h1)(rnd.nextGaussian() * 0.5),
      wh1b = Array.fill(4 * h1 * h1)(rnd.nextGaussian() * 0.4),
      b1b = Array.fill(4 * h1)(rnd.nextGaussian() * 0.2),
      nHeads = nH,
      attA = Array.fill(nH * h2)(rnd.nextGaussian() * 0.5),
      attCs = Array.fill(nH)(rnd.nextGaussian() * 0.3),
      attD = Array.fill(nH * h2)(rnd.nextGaussian()))
    val m = ConvPipe.ConvPipeModel(front, stack)
    val p = tmp("convpipe.json")
    ModelIo.saveConvPipe(m, p)
    val back = ModelIo.loadConvPipe(p)
    // the stack is embedded IN MEMORY — no sidecar temp files may
    // exist after save or load (two concurrent saves of one path used
    // to race on path + ".stack")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p + ".stack")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p + ".stack.tmp")))
    assert(back.front.blocks.map(_.w.toSeq) ==
      m.front.blocks.map(_.w.toSeq))
    assert(back.stack.attD.toSeq == m.stack.attD.toSeq)
    (0 until 10).foreach { _ =>
      val w = Array.fill(24)(rnd.nextGaussian() * 2)
      assert(java.lang.Double.doubleToLongBits(ConvPipe.forward(back, w)) ==
        java.lang.Double.doubleToLongBits(ConvPipe.forward(m, w)))
    }
    // a stacked-LSTM artifact must not half-load as a composed pipe
    val pl = tmp("lstm2_not_pipe.json")
    ModelIo.saveLstm2(stack, pl)
    val e = intercept[Exception](ModelIo.loadConvPipe(pl))
    assert(e.getMessage.contains("graft-convpipe"))
  }

  test("tower-fusion artifact round-trips bit-exactly; wrong embedded block loud") {
    import graft.ml.{ConvFront, ConvPipe, LstmStack, TowerFusion}
    val rnd = new scala.util.Random(77)
    def tower(axis: Int): ConvPipe.ConvPipeModel = {
      val front = ConvFront.ConvFrontModel(16,
        blocks = Seq(ConvFront.ConvBlock(3, 2, 3,
          w = Array.tabulate(18) { idx =>
            if ((idx / 3) % 3 == axis) rnd.nextGaussian() * 0.4 else 0.0
          },
          b = Array.fill(2)(rnd.nextGaussian() * 0.1),
          scale = Array.fill(2)(1.0), shift = Array.fill(2)(0.0))),
        mix = Array.fill(2)(rnd.nextGaussian()),
        mixBias = 0.1, mean = 0.0, std = 2.0)
      val h1 = 2; val h2 = 2; val nH = 2
      ConvPipe.ConvPipeModel(front, LstmStack.Lstm2Model(h1, h2,
        front.outLen,
        wx1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.5),
        wh1 = Array.fill(4 * h1 * h1)(rnd.nextGaussian() * 0.4),
        b1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.2),
        wx2 = Array.fill(4 * h2 * 2 * h1)(rnd.nextGaussian() * 0.5),
        wh2 = Array.fill(4 * h2 * h2)(rnd.nextGaussian() * 0.4),
        b2 = Array.fill(4 * h2)(rnd.nextGaussian() * 0.2),
        dense = Array.fill(h2)(rnd.nextGaussian()),
        bias = 0.1, mean = 0.0, std = 1.0,
        head = "mha", bidir = true,
        wx1b = Array.fill(4 * h1)(rnd.nextGaussian() * 0.5),
        wh1b = Array.fill(4 * h1 * h1)(rnd.nextGaussian() * 0.4),
        b1b = Array.fill(4 * h1)(rnd.nextGaussian() * 0.2),
        nHeads = nH,
        attA = Array.fill(nH * h2)(rnd.nextGaussian() * 0.5),
        attCs = Array.fill(nH)(rnd.nextGaussian() * 0.3),
        attD = Array.fill(nH * h2)(rnd.nextGaussian())))
    }
    val towers = (0 until 3).map(tower)
    val d = towers.map(t => TowerFusion.pooledDim(t.stack)).sum
    val m = TowerFusion.TowerFusionModel(towers,
      fuse = Array.fill(d * d)(rnd.nextGaussian() * 0.2),
      w1 = Array.fill(4 * d)(rnd.nextGaussian() * 0.3),
      b1 = Array.fill(4)(rnd.nextGaussian() * 0.2),
      w2 = Array.fill(4)(rnd.nextGaussian()),
      b2 = 0.2)
    val p = tmp("towerfusion.json")
    ModelIo.saveTowerFusion(m, p)
    val back = ModelIo.loadTowerFusion(p)
    assert(back.towers.size == 3 &&
      back.fuse.toSeq == m.fuse.toSeq && back.w2.toSeq == m.w2.toSeq)
    (0 until 10).foreach { _ =>
      val w = Array.fill(3 * 16)(rnd.nextGaussian() * 2)
      assert(java.lang.Double.doubleToLongBits(TowerFusion.forward(back, w)) ==
        java.lang.Double.doubleToLongBits(TowerFusion.forward(m, w)))
    }
    // a conv-pipe artifact must not half-load as a tower fusion
    val pc = tmp("pipe_not_fusion.json")
    ModelIo.saveConvPipe(towers.head, pc)
    val e = intercept[Exception](ModelIo.loadTowerFusion(pc))
    assert(e.getMessage.contains("graft-towerfusion"))
  }

  test("pre-bidir v1 stacked artifact (no bidir block) loads as unidirectional") {
    import graft.ml.LstmStack
    val rnd = new scala.util.Random(23)
    val h1 = 2; val h2 = 2
    val m = LstmStack.Lstm2Model(h1, h2, 16,
      wx1 = Array.fill(4 * h1)(rnd.nextGaussian()),
      wh1 = Array.fill(4 * h1 * h1)(rnd.nextGaussian()),
      b1 = Array.fill(4 * h1)(rnd.nextGaussian()),
      wx2 = Array.fill(4 * h2 * h1)(rnd.nextGaussian()),
      wh2 = Array.fill(4 * h2 * h2)(rnd.nextGaussian()),
      b2 = Array.fill(4 * h2)(rnd.nextGaussian()),
      dense = Array.fill(h2)(rnd.nextGaussian()),
      bias = 0.1, mean = 0.0, std = 1.0)
    val p = tmp("lstm2_prebidir.json")
    ModelIo.saveLstm2(m, p)
    // strip the bidir block — exactly what the r13 writer emitted
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)
    val stripped = txt
      .replace(",\"bidir\":false", "")
      .replace(",\"wx1b\":[]", "").replace(",\"wh1b\":[]", "")
      .replace(",\"b1b\":[]", "")
    assert(stripped != txt, "test must actually strip the bidir block")
    val p2 = tmp("lstm2_prebidir_stripped.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(p2),
      stripped.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val back = ModelIo.loadLstm2(p2)
    assert(!back.bidir && back.wx1b.isEmpty)
    val w = Array.fill(16)(rnd.nextGaussian())
    assert(java.lang.Double.doubleToLongBits(LstmStack.forward(back, w)) ==
      java.lang.Double.doubleToLongBits(LstmStack.forward(m, w)))
  }
}
