package graft

import org.apache.spark.sql.functions._

import graft.ml.{ConvFront, ConvPipe, LstmStack, TowerFusion}

/** The N-tower fusion of the reference's build_model ([[TowerFusion]]):
  * the column form (per-tower K-mode pooled vectors + fusion
  * arithmetic) is bit-identical to the JVM twin, the pooled unit-KHead
  * readout really is the head-input vector, and the plan is a
  * shuffle-free scan→project chain. */
class TowerFusionSpec extends SparkSpec {

  private def tower(seed: Int, axis: Int, T: Int): ConvPipe.ConvPipeModel = {
    val r = new scala.util.Random(seed)
    val b0 = ConvFront.ConvBlock(3, 2, 3,
      w = Array.tabulate(18) { idx =>
        val ci = (idx / 3) % 3
        if (ci == axis) r.nextGaussian() * 0.4 else 0.0
      },
      b = Array.fill(2)(r.nextGaussian() * 0.1),
      scale = Array.fill(2)(1.0 + r.nextGaussian() * 0.1),
      shift = Array.fill(2)(r.nextGaussian() * 0.1))
    val b1 = ConvFront.ConvBlock(2, 2, 3,
      w = Array.fill(12)(r.nextGaussian() * 0.4),
      b = Array.fill(2)(r.nextGaussian() * 0.1),
      scale = Array.fill(2)(1.0 + r.nextGaussian() * 0.1),
      shift = Array.fill(2)(r.nextGaussian() * 0.1))
    val front = ConvFront.ConvFrontModel(T, Seq(b0, b1),
      mix = Array.fill(2)(r.nextGaussian()),
      mixBias = 0.1, mean = 0.0, std = 2.0)
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

  test("withLogit == forward bit-exactly; unit-KHead pooled is the head-input vector; no shuffle") {
    import spark.implicits._
    val T = 20 // per-channel; raw input 60 interleaved values
    val rnd = new scala.util.Random(41)
    val towers = (0 until 3).map(a => tower(900 + a, a, T))
    val d = towers.map(t => TowerFusion.pooledDim(t.stack)).sum
    val r = new scala.util.Random(7)
    val m = TowerFusion.TowerFusionModel(towers,
      fuse = Array.fill(d * d)(r.nextGaussian() * 0.2),
      w1 = Array.fill(4 * d)(r.nextGaussian() * 0.4),
      b1 = Array.fill(4)(r.nextGaussian() * 0.2),
      w2 = Array.fill(4)(r.nextGaussian()),
      b2 = 0.15)
    val rows = (0 until 12).map(i =>
      (i, Array.fill(3 * T)(rnd.nextGaussian() * 2)))
    val df = TowerFusion.withLogit(m, rows.toDF("i", "window"), "window")
    val got = df.select(col("i"), col("logit"))
      .collect().map(rr => rr.getInt(0) -> rr.getDouble(1)).toMap
    rows.foreach { case (i, x) =>
      val want = TowerFusion.forward(m, x)
      assert(java.lang.Double.doubleToLongBits(got(i)) ==
        java.lang.Double.doubleToLongBits(want),
        s"row $i: column ${got(i)} != jvm $want")
    }
    // plan: scan -> project chain, NO exchange (each tower one K-mode
    // nested expression; fusion is plain arithmetic)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1200))
    // the unit-KHead really reads out the pooled head-input vector:
    // a hand-built mean-head model's pooled vector is s/T, which for a
    // dense = e_u readout equals the scalar logit with bias 0
    val mm = towers.head.stack
    val kh = TowerFusion.unitKHead(mm)
    val seq0 = ConvFront.forward(towers.head.front,
      Array.fill(3 * T)(0.7))
    val pooled = LstmStack.forwardK(mm, kh, seq0)
    assert(pooled.length == TowerFusion.pooledDim(mm))
    (0 until mm.h2).foreach { u =>
      val unit = mm.copy(
        dense = Array.tabulate(mm.h2)(v => if (v == u) 1.0 else 0.0),
        bias = 0.0,
        attD = new Array[Double](mm.nHeads * mm.h2))
      assert(pooled(u) == LstmStack.forward(unit, seq0),
        s"pooled($u) != unit-dense scalar readout")
    }
  }
}
