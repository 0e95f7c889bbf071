package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ml.ConvPipe.ConvPipeModel

/** The N-TOWER fusion of the reference's `build_model`
  * (`user_tools/nnTraining2/amber/model.py:42-66`): one `lstm_pipe`
  * tower per input feature, per-tower `Attention()` (identity over the
  * single pooled token — softmax over one key is weight 1), then
  * `EnhancedFusionLayer` (`amber/enhanced_fusion_layer.py:14-22`:
  * concat → MultiHeadAttention → residual Add; over a single token the
  * MHA collapses to a linear map, so the layer is exactly
  * v + A·v) and the dense head — in the engine's oracle-preserving
  * form:
  *
  *   - each tower is a composed conv→recurrence pipe whose first conv
  *     block reads the 3-channel interleaved input with weights
  *     NON-ZERO ONLY ON ITS OWN AXIS — the per-feature input split of
  *     `build_model` stated as axis-selective channel weights, so
  *     every tower consumes the same raw rawData3D column and the
  *     oracle can state the identical expression (zero terms
  *     included) bit-for-bit;
  *   - the tower readout is the pooled HEAD-INPUT VECTOR, obtained
  *     through the K-class machinery with UNIT readout rows
  *     ([[unitKHead]] — one recurrence evaluation per tower, the
  *     pooled vector as `array<double>`);
  *   - fusion: v = concat(tower vectors); fused = v + A·v (the
  *     collapsed EnhancedFusionLayer); ReLU dense layer; scalar head.
  *     Every op is IEEE mul/add/compare; the long fusion dot products
  *     put the FINAL value on the ×1e6 round grid in the oracle (the
  *     ml5 FMA discipline).
  *
  * Plan shape: one projection per tower (each a nested codegen'd
  * `LstmStackLogit(ConvFrontSeq(w))` in K-mode) + one arithmetic
  * projection — scan → project chain, no shuffle, no UDF. The tower
  * projections stay SEPARATE from the fusion arithmetic by
  * CollapseProject's own guard (a non-cheap alias referenced more
  * than once is never inlined), so each tower's recurrence runs once
  * per row. */
object TowerFusion {

  case class TowerFusionModel(
      towers: Seq[ConvPipeModel],
      fuse: Array[Double], // D×D row-major: fused = v + fuse·v
      w1: Array[Double],   // H×D dense layer
      b1: Array[Double],   // H
      w2: Array[Double],   // H readout
      b2: Double) {
    require(towers.nonEmpty, "tower fusion over zero towers")
    require(towers.map(_.front.inputLen).distinct.size == 1,
      "towers must consume the same raw input length")
    val dims: Seq[Int] = towers.map(t => pooledDim(t.stack))
    val d: Int = dims.sum
    require(fuse.length == d * d, s"fuse must be $d x $d: ${fuse.length}")
    require(w1.length == b1.length * d && w2.length == b1.length,
      s"dense layer shapes inconsistent: |w1|=${w1.length} |b1|=${b1.length}")
    def inputLen: Int = towers.head.front.inputLen
  }

  /** Dimension of the pooled head-input vector: the residual/mean pool
    * (h2) plus, for the mha head, each attention head's pooled vector
    * (nHeads · h2) — the order [[LstmStack]]'s readout walks. */
  def pooledDim(m: LstmStack.Lstm2Model): Int =
    if (m.head == "mha") m.h2 * (1 + m.nHeads) else m.h2

  /** The pooled vector as a K-class head with UNIT readout rows: class
    * c reads exactly pooled component c (zero rows elsewhere — zero
    * multiplies are value-preserving), so `logitsKCol` emits the
    * pooled head-input vector from one recurrence evaluation. */
  def unitKHead(m: LstmStack.Lstm2Model): LstmStack.KHead = {
    val dd = pooledDim(m)
    require(dd >= 2, s"pooled dim must be >= 2 for the K machinery: $dd")
    val mha = m.head == "mha"
    val denseK = new Array[Double](dd * m.h2)
    val attDK =
      if (mha) new Array[Double](dd * m.nHeads * m.h2)
      else Array.emptyDoubleArray
    var c = 0
    while (c < dd) {
      if (c < m.h2) denseK(c * m.h2 + c) = 1.0
      else {
        val k = (c - m.h2) / m.h2
        val u = (c - m.h2) % m.h2
        attDK(c * m.nHeads * m.h2 + k * m.h2 + u) = 1.0
      }
      c += 1
    }
    LstmStack.KHead(dd, denseK, new Array[Double](dd), attDK)
  }

  /** JVM twin of the column form: tower pooled vectors → fusion →
    * dense → scalar logit, all in the column's accumulation order. */
  def forward(m: TowerFusionModel, x: Array[Double]): Double = {
    val v = m.towers.flatMap(t =>
      LstmStack.forwardK(t.stack, unitKHead(t.stack),
        ConvFront.forward(t.front, x))).toArray
    fusionScalar(m, v)
  }

  private def fusionScalar(m: TowerFusionModel, v: Array[Double]): Double = {
    val d = m.d
    val fused = new Array[Double](d)
    var j = 0
    while (j < d) {
      var acc = v(j)
      var i = 0
      while (i < d) { acc += m.fuse(j * d + i) * v(i); i += 1 }
      fused(j) = acc
      j += 1
    }
    var z = m.b2
    var r = 0
    while (r < m.b1.length) {
      var h = m.b1(r)
      var jj = 0
      while (jj < d) { h += m.w1(r * d + jj) * fused(jj); jj += 1 }
      z += m.w2(r) * (if (h > 0.0) h else 0.0)
      r += 1
    }
    z
  }

  /** Attach the fused logit to `df`: one staged column per tower (the
    * pooled vector, one nested codegen'd expression each), then the
    * fusion/dense arithmetic staged LEVEL BY LEVEL — pooled components,
    * fused vector, ReLU dense units — each level's expressions
    * referencing the previous level's ATTRIBUTES only. Staging is not
    * cosmetic: one monolithic z expression duplicates every fused(j)
    * subtree into all H dense rows (and the ReLU's when() doubles each
    * h) — a multi-thousand-node tree whose generated method blows past
    * the JIT compile threshold and runs ~15× slow (measured 21.9 s vs
    * 1.5 s at sf0.1). Per level, CollapseProject's non-cheap-alias
    * guard keeps multiply-referenced definitions in their own
    * projection, so every subtree is computed exactly once per row.
    * Returns `df` with `outCol` appended; staged columns dropped. */
  def withLogit(m: TowerFusionModel, df: DataFrame, winCol: String,
                outCol: String = "logit"): DataFrame = {
    val d = m.d
    val nH = m.b1.length
    val towers = m.towers.zipWithIndex.foldLeft(df) { case (acc, (t, ti)) =>
      acc.withColumn(s"__tfp$ti",
        LstmStack.logitsKCol(t.stack, unitKHead(t.stack),
          ConvFront.seqCol(t.front, col(winCol))))
    }
    // pooled components as scalar columns
    val vDefs = m.towers.zipWithIndex.flatMap { case (t, ti) =>
      (0 until pooledDim(t.stack)).map(i =>
        element_at(col(s"__tfp$ti"), i + 1))
    }
    val withV = vDefs.zipWithIndex.foldLeft(towers) { case (acc, (c, j)) =>
      acc.withColumn(s"__tfv$j", c)
    }
    // fused = v + A·v, one column per component
    val withF = (0 until d).foldLeft(withV) { (acc, j) =>
      acc.withColumn(s"__tff$j",
        (0 until d).foldLeft(col(s"__tfv$j"): Column)((a2, i) =>
          a2 + lit(m.fuse(j * d + i)) * col(s"__tfv$i")))
    }
    // ReLU dense units (the when() duplicates only this level's h)
    val withH = (0 until nH).foldLeft(withF) { (acc, r) =>
      val h = (0 until d).foldLeft(lit(m.b1(r)): Column)((a2, j) =>
        a2 + lit(m.w1(r * d + j)) * col(s"__tff$j"))
      acc.withColumn(s"__tfh$r", when(h > 0.0, h).otherwise(lit(0.0)))
    }
    val z = (0 until nH).foldLeft(lit(m.b2): Column)((acc, r) =>
      acc + lit(m.w2(r)) * col(s"__tfh$r"))
    withH.withColumn(outCol, z)
      .drop(m.towers.indices.map(ti => s"__tfp$ti") ++
        (0 until d).map(j => s"__tfv$j") ++
        (0 until d).map(j => s"__tff$j") ++
        (0 until nH).map(r => s"__tfh$r"): _*)
  }
}
