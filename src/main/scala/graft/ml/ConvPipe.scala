package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ml.ConvFront.{ConvBlock, ConvFrontModel}
import graft.ml.LstmStack.Lstm2Model

/** The COMPOSED conv→recurrence architecture — the reference's
  * `lstm_pipe` (`amber/model.py:31-39`: conv_block stack → MaxPool →
  * Bidirectional(LSTM) → LSTM) trained END-TO-END as one parameter
  * vector: gradients flow from the logistic head through the stacked
  * recurrence ([[LstmStack.rowGrad]]'s input-gradient output) into the
  * conv front-end backward ([[ConvFront.rowBackward]]). Same training
  * discipline as every family: breeze LBFGS over one [[DetAgg]]
  * gradient pass per evaluation, L2 on weight matrices (conv kernels +
  * channel mix + the stack's weight ranges), deterministic seeded
  * init, driver state = one parameter vector.
  *
  * Scoring composes the two codegen'd expressions —
  * `LstmStackLogit(ConvFrontSeq(window))` — one projection, no
  * shuffle. The stack consumes the conv output RAW (its mean/std are
  * identity); the input normalization lives in the front end.
  *
  * Parameter layout: [block₀ w|b|scale|shift | block₁ … | mix |
  * mixBias | stack block ([[LstmStack]] layout)].
  */
object ConvPipe {

  case class BlockSpec(cOut: Int, k: Int = 3)

  /** `cIn` is the INPUT channel count (1 = scalar magnitude window;
    * 3 = interleaved X/Y/Z, the rawData3D stride convention — the
    * reference's multi-feature input towers, `amber/model.py:42-49`,
    * in the composed single-tower form: the first conv block mixes
    * the channels the way `build_model` fuses per-feature inputs). */
  case class Config(
      blocks: Seq[BlockSpec] = Seq(BlockSpec(3), BlockSpec(4)),
      h1: Int = 4,
      h2: Int = 3,
      head: String = "mha",
      nHeads: Int = 2,
      bidir: Boolean = true,
      cIn: Int = 1,
      maxIter: Int = 120,
      regParam: Double = 1e-4,
      seed: Long = 42L)

  case class ConvPipeModel(front: ConvFrontModel, stack: Lstm2Model) {
    require(stack.window == front.outLen,
      s"stack window ${stack.window} != front outLen ${front.outLen}")
    require(stack.mean == 0.0 && stack.std == 1.0,
      "the stack consumes the conv output raw; scaling lives in the front")
  }

  def forward(m: ConvPipeModel, x: Array[Double]): Double =
    LstmStack.forward(m.stack, ConvFront.forward(m.front, x))

  /** One projection: conv sequence expression nested in the stacked
    * recurrence expression. */
  def logitCol(m: ConvPipeModel, win: Column): Column =
    LstmStack.logitCol(m.stack, ConvFront.seqCol(m.front, win))

  /** Fail-loud serve-length contract, like every scoring seam. The
    * expected array length is [[ConvFront.ConvFrontModel.inputLen]]
    * (cIn0 · window — interleaved channels). */
  def scoreWindows(m: ConvPipeModel, windows: DataFrame,
                   winCol: String = "window"): DataFrame = {
    val z = when(size(col(winCol)) === m.front.inputLen,
        logitCol(m, col(winCol)))
      .otherwise(raise_error(concat(
        lit("window "), coalesce(size(col(winCol)).cast("string"), lit("NULL")),
        lit(s" != trained input length ${m.front.inputLen}"))).cast("double"))
    windows.withColumn("logit", z)
      .withColumn("p_seizure", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
  }

  def scorer(m: ConvPipeModel): Array[Double] => Double =
    (w: Array[Double]) => 1.0 / (1.0 + math.exp(-forward(m, w)))

  /** The composed model as a replay detector (same contract as
    * [[Lstm.deployedLstm]]). */
  def deployedConvPipe(m: ConvPipeModel,
      base: graft.streaming.NnSettings = graft.streaming.NnSettings())
      : graft.streaming.NnAlg =
    new graft.streaming.NnAlg(
      base.copy(bufferSamples = m.front.inputLen, normalise = false),
      scorer(m))

  /** The (fit, score) family seam — slots into
    * [[RunSequence.runWithWindows]] / nested selection like
    * [[LstmStack.lstm2Family]]. */
  def convPipeFamily(cfg: Config = Config(),
                     subtypeWeights: Map[String, Double] = Map.empty)
      : (DataFrame => ConvPipeModel,
         (ConvPipeModel, DataFrame) => DataFrame) = {
    val fit = (train0: DataFrame) =>
      if (subtypeWeights.isEmpty) train(train0, cfg)
      else train(
        train0.withColumn("__m13_w", Trainer.subtypeWeightCol(subtypeWeights)),
        cfg, Some("__m13_w"))
    val score = (m: ConvPipeModel, test: DataFrame) =>
      scoreWindows(m, test)
        .select(col("eventId"), col("label"), col("p_seizure"))
    (fit, score)
  }

  // ------------------------------------------------------- param layout

  private[ml] def shapesOf(blocks: Seq[BlockSpec],
      cIn0: Int): Seq[(Int, Int, Int)] = {
    var cIn = cIn0
    blocks.map { b => val s = (cIn, b.cOut, b.k); cIn = b.cOut; s }
  }

  private[ml] def convParamCount(shapes: Seq[(Int, Int, Int)]): Int =
    shapes.map { case (ci, co, k) => co * ci * k + 3 * co }.sum +
      shapes.last._2 + 1 // mix + mixBias

  /** Build the front-end model from the parameter vector (blocks at
    * ascending offsets, then mix/mixBias — [[ConvFront.rowBackward]]'s
    * exact walk). */
  private[ml] def frontOf(p: Array[Double], shapes: Seq[(Int, Int, Int)],
      window: Int, mean: Double, std: Double): ConvFrontModel = {
    var o = 0
    val blocks = shapes.map { case (ci, co, k) =>
      val w = java.util.Arrays.copyOfRange(p, o, o + co * ci * k)
      o += co * ci * k
      val b = java.util.Arrays.copyOfRange(p, o, o + co); o += co
      val sc = java.util.Arrays.copyOfRange(p, o, o + co); o += co
      val sh = java.util.Arrays.copyOfRange(p, o, o + co); o += co
      ConvBlock(ci, co, k, w, b, sc, sh)
    }
    val cLast = shapes.last._2
    val mix = java.util.Arrays.copyOfRange(p, o, o + cLast)
    ConvFrontModel(window, blocks, mix, p(o + cLast), mean, std)
  }

  // ------------------------------------------------------------ training

  def train(windows: DataFrame, cfg: Config = Config(),
            weightCol: Option[String] = None): ConvPipeModel = {
    import breeze.linalg.{DenseVector => BDV}
    val spark = windows.sparkSession
    import spark.implicits._
    val wCol = weightCol.map(col).getOrElse(lit(1.0))
    val ds = windows.select(col("label").cast("double"),
        wCol.cast("double").as("__w"),
        col("window").cast("array<double>"))
      .as[(Double, Double, Array[Double])]
      .rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (sum, sumSq, cnt, wLen, wSum) = DetAgg.windowStats(ds)
      val mean = sum / cnt
      val varr = math.max(sumSq / cnt - mean * mean, 0.0)
      val std = if (varr == 0.0) 1.0 else math.sqrt(varr)
      require(cfg.cIn >= 1 && wLen % cfg.cIn == 0,
        s"input length $wLen not a multiple of ${cfg.cIn} channels")
      val tLen = wLen / cfg.cIn // per-channel window length
      val shapes = shapesOf(cfg.blocks, cfg.cIn)
      val nConv = convParamCount(shapes)
      val h1N = cfg.h1; val h2N = cfg.h2
      val mha = cfg.head == "mha"
      val nH = if (mha) cfg.nHeads else 1
      val nStack = LstmStack.nParams(h1N, h2N, cfg.head, cfg.bidir, nH)
      val nP = nConv + nStack
      val outLen = shapes.foldLeft(tLen)((t, s) => (t - s._3 + 1) / 2)
      require(outLen >= 2,
        s"window $tLen collapses to $outLen positions through ${cfg.blocks}")
      val nRows = wSum
      require(nRows > 0 && !nRows.isNaN && !nRows.isInfinite,
        s"weight sum must be positive finite: $nRows")
      val sc = spark.sparkContext

      // L2: conv kernels + channel mix + the stack's weight ranges;
      // conv biases and the affine (scale, shift) are bias-like
      val convWRanges = {
        var o = 0
        val rs = shapes.map { case (ci, co, k) =>
          val r = (o, o + co * ci * k); o += co * ci * k + 3 * co; r
        }
        rs :+ ((o, o + shapes.last._2)) // mix
      }
      val stackRanges = LstmStack
        .stackWeightRanges(h1N, h2N, cfg.head, cfg.bidir, nH)
        .map(r => (nConv + r._1, nConv + r._2))
      val wRanges = convWRanges ++ stackRanges
      def isWeight(i: Int): Boolean =
        wRanges.exists(r => i >= r._1 && i < r._2)

      val fn = new breeze.optimize.DiffFunction[BDV[Double]] {
        def calculate(p: BDV[Double]): (Double, BDV[Double]) = {
          val bw = sc.broadcast(p.data.clone())
          try {
            // the RDD pass lives in gradientPass (an object method):
            // a closure defined HERE would capture this anonymous
            // DiffFunction and fail serialization
            val (lossSum, gradSum) = gradientPass(ds, bw, cfg, tLen,
              mean, std)
            val grad = new Array[Double](nP)
            var reg = 0.0
            var i = 0
            while (i < nP) {
              grad(i) = gradSum(i) / nRows
              if (isWeight(i)) {
                reg += 0.5 * cfg.regParam * p.data(i) * p.data(i)
                grad(i) += cfg.regParam * p.data(i)
              }
              i += 1
            }
            (lossSum / nRows + reg, BDV(grad))
          } finally bw.unpersist(false)
        }
      }

      val rnd = new scala.util.Random(cfg.seed)
      val init = new Array[Double](nP);
      {
        var o = 0
        shapes.foreach { case (ci, co, k) =>
          (0 until co * ci * k).foreach(j =>
            init(o + j) = rnd.nextGaussian() * 0.3)
          o += co * ci * k
          o += co // conv bias 0
          (0 until co).foreach(j => init(o + j) = 1.0) // affine scale 1
          o += co
          o += co // affine shift 0
        }
        (0 until shapes.last._2).foreach(j =>
          init(o + j) = rnd.nextGaussian() * 0.3) // mix
      }
      System.arraycopy(
        LstmStack.stackInit(rnd, h1N, h2N, cfg.head, cfg.bidir, nH),
        0, init, nConv, nStack)
      val lbfgs = new breeze.optimize.LBFGS[BDV[Double]](
        maxIter = cfg.maxIter, m = 10, tolerance = 1e-7)
      val sol = lbfgs.minimize(fn, BDV(init)).data
      ConvPipeModel(
        frontOf(sol, shapes, tLen, mean, std),
        LstmStack.stackUnpack(sol, nConv, h1N, h2N, outLen, 0.0, 1.0,
          cfg.head, cfg.bidir, nH))
    } finally ds.unpersist(false)
  }

  /** Exposed for ConvPipeSpec's finite-difference gradient check. */
  private[graft] def gradientPassForTest(
      ds: org.apache.spark.rdd.RDD[(Double, Double, Array[Double])],
      bw: org.apache.spark.broadcast.Broadcast[Array[Double]],
      cfg: Config, window: Int, mean: Double, std: Double)
      : (Double, Array[Double]) =
    gradientPass(ds, bw, cfg, window, mean, std)

  /** One composed loss/gradient evaluation (recurrence rowGrad feeding
    * the conv backward), partials combined in partition-index order.
    * `window` is the PER-CHANNEL length (raw rows are cIn·window). */
  private def gradientPass(
      ds: org.apache.spark.rdd.RDD[(Double, Double, Array[Double])],
      bw: org.apache.spark.broadcast.Broadcast[Array[Double]],
      cfg: Config, window: Int, mean: Double, std: Double)
      : (Double, Array[Double]) = {
    val shapes = shapesOf(cfg.blocks, cfg.cIn)
    val nConv = convParamCount(shapes)
    val mha = cfg.head == "mha"
    val nH = if (mha) cfg.nHeads else 1
    val nP = nConv +
      LstmStack.nParams(cfg.h1, cfg.h2, cfg.head, cfg.bidir, nH)
    DetAgg.lossGrad(
      ds.mapPartitionsWithIndex { case (pi, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val pv = bw.value
          val front = frontOf(pv, shapes, window, mean, std)
          val grad = new Array[Double](nP)
          var ls = 0.0
          it.foreach { case (y, wt, xRaw) =>
            val convOut = ConvFront.forward(front, xRaw)
            val dxs = new Array[Double](convOut.length)
            ls += LstmStack.rowGrad(pv, nConv, cfg.h1, cfg.h2,
              cfg.head, cfg.bidir, nH, y, wt, convOut, grad, dxs)
            ConvFront.rowBackward(front, xRaw, dxs, grad, 0)
          }
          Iterator.single((pi, (ls, grad)))
        }
      }, nP)
  }
}
