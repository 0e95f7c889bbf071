package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A 1-D convolutional network trained IN-ENGINE — the round-12
  * verdict's "missing #2" boundary (the reference's conv architectures,
  * `user_tools/nnTraining2/cnnModel.py:43-76`,
  * `deepEpiCnnModel_torch.py:249-331`) re-expressed the Spark way: the
  * architecture is a per-row pure function (forward pass = native
  * Catalyst column expressions, codegen'd, no UDF in the batch path)
  * and training is distributed first-order optimization — breeze LBFGS
  * on the driver over a loss/gradient computed as ONE `treeAggregate`
  * pass per evaluation, the exact execution shape MLlib's own
  * `LogisticRegression` uses. Driver state is the parameter vector
  * (`nf·w + 2nf + 1` doubles); no training row ever reaches the driver.
  *
  * Architecture (the reference's small-net skeleton, minus the layers
  * MLlib-class training can't justify at this parameter count):
  *
  *   window (length W, one channel)
  *     → z-scale by the corpus-global (mean, std) stored in the model
  *     → Conv1D: `nf` filters of width `w`, stride 1, valid → L = W−w+1
  *     → ReLU → global max-pool per filter (pool_f = max(0, max_t c_f,t))
  *     → dense: logit = b + Σ_f v_f·pool_f   (sigmoid at serve time)
  *
  * Exactness contract: [[forward]] (the JVM loop used by the streaming
  * scorer) and [[logitCol]] (the Catalyst expression used by batch
  * scoring and the ml3 oracle row) accumulate in the SAME order
  * (j ascending inside a filter, filters ascending into the logit), so
  * their doubles are bit-identical — CnnSpec pins the equality. With
  * integer inputs and integer weights every intermediate is an exact
  * integer (|values| ≪ 2^53), which is what lets the ml3 oracle gate
  * the REAL forward pass cross-engine with a plain hash compare.
  *
  * Scale slope: training cost per LBFGS iteration is one map-side
  * partial-gradient pass (O(rows·nf·L·w) flops, combiner-collapsed) +
  * an O(P) driver update; batch scoring is whole-stage-codegen per-row
  * work with no shuffle at all. Both survive a 1000-executor corpus
  * untouched. */
object Cnn {

  /** Trained network + the input scaling it was fit under (the serve
    * side must replay the SAME (mean, std), exactly like
    * [[Trainer.MlpModel]]); `window` is the trained input length —
    * serving a different buffer length is a fail-loud require, not a
    * silent re-binning. `filters` is row-major: filter f weight j at
    * `f*width + j`. */
  case class CnnModel(
      nFilters: Int,
      width: Int,
      window: Int,
      filters: Array[Double],
      filterBias: Array[Double],
      dense: Array[Double],
      bias: Double,
      mean: Double,
      std: Double) {
    require(filters.length == nFilters * width &&
      filterBias.length == nFilters && dense.length == nFilters,
      "CnnModel weight shapes inconsistent")
    def nParams: Int = nFilters * width + 2 * nFilters + 1
  }

  case class Config(
      nFilters: Int = 4,
      width: Int = 9,
      maxIter: Int = 120,
      regParam: Double = 1e-4,
      seed: Long = 42L)

  /** Forward pass → LOGIT (pre-sigmoid), JVM loop form — the streaming
    * scorer's hot path and [[logitCol]]'s bit-exact twin (same
    * accumulation order; see the object docblock). */
  def forward(m: CnnModel, x: Array[Double]): Double = {
    require(x.length == m.window,
      s"window ${x.length} != trained window ${m.window}")
    val L = x.length - m.width + 1
    var z = m.bias
    var f = 0
    while (f < m.nFilters) {
      var best = 0.0 // pool_f = max(0, max_t c_t): ReLU folded into the max
      var t = 0
      while (t < L) {
        var c = m.filterBias(f)
        var j = 0
        while (j < m.width) {
          c += m.filters(f * m.width + j) * ((x(t + j) - m.mean) / m.std)
          j += 1
        }
        if (c > best) best = c
        t += 1
      }
      z += m.dense(f) * best
      f += 1
    }
    z
  }

  /** The forward pass as a native Catalyst column over an
    * `array<double>` window
    * ([[org.apache.spark.sql.graft.Conv1dMaxPoolLogit]], codegen'd
    * tight loop — NOT composed from `transform`/`array_max`, whose
    * interpreted lambda dispatch measured ~280–1200× slower;
    * CnnScaleProbe has the numbers). Accumulation order matches
    * [[forward]] bit-for-bit. NULL for a window shorter than the
    * filter (nothing to convolve). */
  def logitCol(m: CnnModel, win: Column): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.conv1dLogit(
      win, m.nFilters, m.width,
      m.filters.toSeq, m.filterBias.toSeq, m.dense.toSeq,
      m.bias, m.mean, m.std)

  /** One distributed loss/gradient evaluation: a map-side partial pass
    * over `(label, weight, window)` rows against the broadcast
    * parameter vector, combined DETERMINISTICALLY in partition-index
    * order ([[DetAgg.lossGrad]] — `treeAggregate`'s completion-order
    * final merge made training nondeterministic in final ulps).
    * A top-level object method so the executor lambdas capture ONLY
    * their arguments — an inner definition would drag the enclosing
    * optimizer instance (and its SparkContext) into the closure. */
  private def gradientPass(
      ds: org.apache.spark.rdd.RDD[(Double, Double, Array[Double])],
      bw: org.apache.spark.broadcast.Broadcast[Array[Double]],
      nf: Int, w: Int, mean: Double, std: Double)
      : (Double, Array[Double]) = {
    val nP = nf * w + 2 * nf + 1
    val seqOp: ((Double, Array[Double]), (Double, Double, Array[Double]))
        => (Double, Array[Double]) = { case ((ls, g), (y, wt, x)) =>
        val pp = bw.value
        val L = x.length - w + 1
        val xs = new Array[Double](x.length)
        var i = 0
        while (i < x.length) { xs(i) = (x(i) - mean) / std; i += 1 }
        val pool = new Array[Double](nf)
        val arg = new Array[Int](nf)
        var z = pp(nP - 1)
        var f = 0
        while (f < nf) {
          var best = 0.0; var bt = -1
          var t = 0
          while (t < L) {
            var c = pp(nf * w + f)
            var j = 0
            while (j < w) { c += pp(f * w + j) * xs(t + j); j += 1 }
            if (c > best) { best = c; bt = t }
            t += 1
          }
          pool(f) = best; arg(f) = bt
          z += pp(nf * w + nf + f) * best
          f += 1
        }
        val loss =
          if (z > 0) z + math.log1p(math.exp(-z)) - y * z
          else math.log1p(math.exp(z)) - y * z
        // Per-row weight (M13): scales the loss AND its whole gradient
        // through dz. wt = 1.0 multiplies exactly (IEEE), so the
        // unweighted path is bit-identical to the pre-weighting code.
        val dz = wt * (1.0 / (1.0 + math.exp(-z)) - y)
        g(nP - 1) += dz
        f = 0
        while (f < nf) {
          g(nf * w + nf + f) += dz * pool(f)
          if (arg(f) >= 0) { // pool > 0: gradient flows
            val dc = dz * pp(nf * w + nf + f)
            g(nf * w + f) += dc
            var j = 0
            while (j < w) {
              g(f * w + j) += dc * xs(arg(f) + j); j += 1
            }
          }
          f += 1
        }
        (ls + wt * loss, g)
      }
    DetAgg.lossGrad(
      ds.mapPartitionsWithIndex { case (pi, it) =>
        if (it.isEmpty) Iterator.empty
        else Iterator.single(
          (pi, it.foldLeft((0.0, new Array[Double](nP)))(seqOp)))
      }, nP)
  }

  /** Distributed training: breeze LBFGS where each loss/gradient
    * evaluation is one `treeAggregate` over `(label, window)` rows —
    * max-pool routes the gradient to its argmax position, ReLU gates
    * it, L2 on the weights (not the biases). Input frame: `label`
    * (0/1 double) + `window` (`array<double>`, all the same length).
    * Deterministic: seeded init, fixed partitioning per run.
    *
    * `weightCol` (M13, the reference's `subtypeWeights` knob applied to
    * the conv family): an optional per-row positive weight multiplying
    * that row's loss and gradient; the objective normalizes by the
    * WEIGHT SUM, so all-1.0 weights reproduce the unweighted model
    * bit-exactly (summing 1.0s is exact integer arithmetic < 2^53).
    * Build it with [[Trainer.subtypeWeightCol]]. The z-scaling stats
    * stay unweighted — weighting steers the LOSS, not the input
    * normalization (same contract as MLlib's standardization). */
  def train(windows: DataFrame, cfg: Config = Config(),
            weightCol: Option[String] = None): CnnModel = {
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
      // Stats + weight-sum partials per partition, combined in
      // partition-index order (DetAgg): `reduce`'s completion-order
      // merge would make (mean, std, weight sum) — and therefore the
      // trained model — nondeterministic in final ulps.
      val (sum, sumSq, cnt, wLen, wSum) = DetAgg.windowStats(ds)
      val mean = sum / cnt
      val varr = math.max(sumSq / cnt - mean * mean, 0.0)
      val std = if (varr == 0.0) 1.0 else math.sqrt(varr)
      val nf = cfg.nFilters; val w = cfg.width
      require(wLen >= w, s"window $wLen shorter than filter width $w")
      val nP = nf * w + 2 * nf + 1
      // Objective normalizer: the weight sum (== row count when
      // unweighted — summing 1.0s is exact, so the unweighted model is
      // bit-identical to the pre-weighting code).
      val nRows = wSum
      require(nRows > 0 && !nRows.isNaN && !nRows.isInfinite,
        s"weight sum must be positive finite: $nRows")
      val sc = spark.sparkContext

      val fn = new breeze.optimize.DiffFunction[BDV[Double]] {
        def calculate(p: BDV[Double]): (Double, BDV[Double]) = {
          val bw = sc.broadcast(p.data.clone())
          try {
            val (lossSum, gradSum) =
              gradientPass(ds, bw, nf, w, mean, std)
            // L2 on conv + dense weights only (indices < nf*w and the
            // dense block) — biases unpenalized, the standard choice
            var reg = 0.0
            val grad = new Array[Double](nP)
            var i = 0
            while (i < nP) {
              grad(i) = gradSum(i) / nRows
              val isWeight = i < nf * w ||
                (i >= nf * w + nf && i < nf * w + 2 * nf)
              if (isWeight) {
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
      val init = new Array[Double](nP)
      (0 until nf * w).foreach(i => init(i) = rnd.nextGaussian() * 0.3)
      (0 until nf).foreach(f =>
        init(nf * w + nf + f) = rnd.nextGaussian() * 0.3)
      val lbfgs = new breeze.optimize.LBFGS[BDV[Double]](
        maxIter = cfg.maxIter, m = 10, tolerance = 1e-7)
      val sol = lbfgs.minimize(fn, BDV(init)).data
      CnnModel(nf, w, wLen,
        filters = sol.slice(0, nf * w),
        filterBias = sol.slice(nf * w, nf * w + nf),
        dense = sol.slice(nf * w + nf, nf * w + 2 * nf),
        bias = sol(nP - 1), mean = mean, std = std)
    } finally ds.unpersist(false)
  }

  /** Batch scoring: per-row logit + probability over a window column —
    * pure codegen'd column work, no shuffle. The serve-time window
    * contract is enforced HERE, same as [[forward]]'s require: a
    * wrong-length window fails loudly instead of convolving a
    * different-length input into a confidently wrong score
    * ([[logitCol]] itself stays permissive — the ml3 oracle applies it
    * to raw fixture arrays). */
  def scoreWindows(m: CnnModel, windows: DataFrame,
                   winCol: String = "window"): DataFrame = {
    val z = when(size(col(winCol)) === m.window, logitCol(m, col(winCol)))
      .otherwise(raise_error(concat(
        lit("window "), coalesce(size(col(winCol)).cast("string"), lit("NULL")),
        lit(s" != trained window ${m.window}"))).cast("double"))
    windows.withColumn("logit", z)
      .withColumn("p_seizure", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
  }

  /** The CNN as a replay scorer closure. UNIT CONTRACT: this model
    * family trains directly on the buffer's window (G, via
    * [[graft.streaming.NnAlg.dp2vectors]]) — no mG conversion and no
    * P12 basis, unlike [[Trainer.scorer]]; what must match is the
    * WINDOW LENGTH, enforced by [[forward]]'s require. */
  def scorer(m: CnnModel): Array[Double] => Double =
    (vecG: Array[Double]) => 1.0 / (1.0 + math.exp(-forward(m, vecG)))

  /** The trained CNN as a fully-assembled replay detector —
    * bufferSamples pinned to the trained window, normalise off (the
    * model's own (mean, std) is the only scaling; a z-scored buffer
    * would double-scale silently). */
  def deployedCnn(m: CnnModel,
                  base: graft.streaming.NnSettings = graft.streaming.NnSettings())
      : graft.streaming.NnAlg =
    new graft.streaming.NnAlg(
      base.copy(bufferSamples = m.window, normalise = false), scorer(m))
}
