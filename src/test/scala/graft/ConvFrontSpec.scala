package graft

import org.apache.spark.sql.functions._

import graft.ml.ConvFront
import graft.ml.ConvFront.{ConvBlock, ConvFrontModel}
import graft.ml.LstmStack

/** The conv front-end ([[ConvFront]] — the reference lstm_pipe's
  * conv_block stack re-expressed as a codegen'd sequence expression):
  * Catalyst column == JVM loop bit-exactly, composition with the
  * stacked recurrence is one projection, degenerate inputs are NULL,
  * and the hand calculus survives a closed-form check. */
class ConvFrontSpec extends SparkSpec {

  private def randomFront(seed: Int, win: Int): ConvFrontModel = {
    val rnd = new scala.util.Random(seed)
    def block(cIn: Int, cOut: Int, k: Int) = ConvBlock(cIn, cOut, k,
      w = Array.fill(cOut * cIn * k)(rnd.nextGaussian() * 0.4),
      b = Array.fill(cOut)(rnd.nextGaussian() * 0.1),
      scale = Array.fill(cOut)(1.0 + rnd.nextGaussian() * 0.1),
      shift = Array.fill(cOut)(rnd.nextGaussian() * 0.1))
    ConvFrontModel(win,
      blocks = Seq(block(1, 3, 3), block(3, 4, 3)),
      mix = Array.fill(4)(rnd.nextGaussian()),
      mixBias = rnd.nextGaussian() * 0.1,
      mean = 0.3, std = 1.2)
  }

  test("closed form: one 1-tap identity block is affine-relu-pool") {
    // k=1, w=1, scale=2, shift=-1: act(t) = relu(2·x̂(t) − 1), pool max
    val m = ConvFrontModel(6,
      blocks = Seq(ConvBlock(1, 1, 1, Array(1.0), Array(0.0),
        Array(2.0), Array(-1.0))),
      mix = Array(1.0), mixBias = 0.0, mean = 0.0, std = 1.0)
    val x = Array(0.2, 0.9, 1.4, -3.0, 0.5, 0.51)
    val want = Seq(
      math.max(math.max(2 * 0.2 - 1, 0.0), math.max(2 * 0.9 - 1, 0.0)),
      math.max(math.max(2 * 1.4 - 1, 0.0), 0.0),
      math.max(0.0, math.max(2 * 0.51 - 1, 0.0)))
    assert(ConvFront.forward(m, x).toSeq == want)
  }

  test("seqCol == forward bit-exactly; composed with LstmStackLogit in one projection") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val win = 40
    val cf = randomFront(11, win)
    val tf = cf.outLen
    assert(tf >= 1)
    val rows = (0 until 15).map(i =>
      (i, Array.fill(win)(rnd.nextGaussian() * 2 + 0.3)))
    val df = rows.toDF("i", "window")
    val got = df.select(col("i"), ConvFront.seqCol(cf, col("window")).as("y"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (i, x) =>
      val want = ConvFront.forward(cf, x).toSeq
      assert(got(i) == want, s"row $i: column ${got(i)} != jvm $want")
    }
    // composition: conv sequence feeding the stacked recurrence is one
    // projection and matches the chained JVM loops bit-exactly
    val lstm = {
      val r = new scala.util.Random(7)
      val h1 = 2; val h2 = 2
      LstmStack.Lstm2Model(h1, h2, tf,
        wx1 = Array.fill(4 * h1)(r.nextGaussian() * 0.5),
        wh1 = Array.fill(4 * h1 * h1)(r.nextGaussian() * 0.4),
        b1 = Array.fill(4 * h1)(r.nextGaussian() * 0.2),
        wx2 = Array.fill(4 * h2 * h1)(r.nextGaussian() * 0.5),
        wh2 = Array.fill(4 * h2 * h2)(r.nextGaussian() * 0.4),
        b2 = Array.fill(4 * h2)(r.nextGaussian() * 0.2),
        dense = Array.fill(h2)(r.nextGaussian()),
        bias = 0.1, mean = 0.0, std = 1.0)
    }
    val composed = df.select(col("i"),
      LstmStack.logitCol(lstm, ConvFront.seqCol(cf, col("window"))).as("z"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach { case (i, x) =>
      val want = LstmStack.forward(lstm, ConvFront.forward(cf, x))
      assert(composed(i) == want,
        s"row $i: composed ${composed(i)} != jvm $want")
    }
  }

  test("degenerate inputs: empty and too-short windows are NULL") {
    import spark.implicits._
    val cf = randomFront(13, 40)
    // two blocks of k=3 + pool(2): need >= 11 samples for one position
    val df = Seq(
      (0, Array.empty[Double]),
      (1, Array.fill(6)(1.0)),
      (2, Array.fill(11)(1.0))).toDF("i", "window")
    val got = df.select(col("i"), ConvFront.seqCol(cf, col("window")).as("y"))
      .collect().map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(got(0) && got(1) && !got(2))
  }
}
