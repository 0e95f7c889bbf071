package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.LstmStack

/** Stacked-LSTM variant cost ladder: measured rows/s for the codegen'd
  * [[LstmStack.logitCol]] across the amber-shape axes (mean → attn →
  * bidir → bidir+mha), plus one full-amber training point — the numbers
  * behind the r14 SCALING claims that the bidir flag costs ~2× layer-1
  * arithmetic and the mha head is noise next to the recurrence.
  *
  * Windows synthesized in-plan (same generator discipline as
  * [[CnnScaleProbe]]).
  *
  * `runMain graft.tools.Lstm2ScaleProbe [scoreRows] [trainRows]`
  */
object Lstm2ScaleProbe {
  def main(args: Array[String]): Unit = {
    val scoreRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val trainRows = args.lift(1).map(_.toLong).getOrElse(100000L)
    // 3rd arg: comma-separated sections (score, train, tftrain)
    val parts = args.lift(2).getOrElse("score,train,tftrain")
      .split(",").map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val W = 125
    def windows(n: Long): DataFrame =
      spark.range(n).select(
        col("id"),
        (col("id") % 2).cast("double").as("label"),
        transform(sequence(lit(0), lit(W - 1)), t => {
          val ph = pmod(col("id") * 2654435761L, lit(628)).cast("double") / 100.0
          lit(900.0) +
            lit(60.0) * sin(t.cast("double") / lit(8.0) + ph) +
            when(col("id") % 2 === 1,
              lit(80.0) * sin(t.cast("double") * lit(1.26) + ph))
              .otherwise(lit(0.0))
        }).as("window"))

    val h1 = 4; val h2 = 3; val nH = 2
    def model(head: String, bidir: Boolean): LstmStack.Lstm2Model = {
      val rnd = new scala.util.Random(7)
      val xDim = if (bidir) 2 * h1 else h1
      LstmStack.Lstm2Model(h1, h2, W,
        wx1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.4),
        wh1 = Array.fill(4 * h1 * h1)(rnd.nextGaussian() * 0.3),
        b1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.1),
        wx2 = Array.fill(4 * h2 * xDim)(rnd.nextGaussian() * 0.3),
        wh2 = Array.fill(4 * h2 * h2)(rnd.nextGaussian() * 0.3),
        b2 = Array.fill(4 * h2)(rnd.nextGaussian() * 0.1),
        dense = Array.fill(h2)(rnd.nextGaussian()),
        bias = 0.1, mean = 900.0, std = 80.0,
        head = head,
        attA = head match {
          case "attn" => Array.fill(h2)(rnd.nextGaussian() * 0.3)
          case "mha"  => Array.fill(nH * h2)(rnd.nextGaussian() * 0.3)
          case _      => Array.emptyDoubleArray
        },
        attC = if (head == "attn") 0.1 else 0.0,
        bidir = bidir,
        wx1b = if (bidir) Array.fill(4 * h1)(rnd.nextGaussian() * 0.4)
               else Array.emptyDoubleArray,
        wh1b = if (bidir) Array.fill(4 * h1 * h1)(rnd.nextGaussian() * 0.3)
               else Array.emptyDoubleArray,
        b1b = if (bidir) Array.fill(4 * h1)(rnd.nextGaussian() * 0.1)
              else Array.emptyDoubleArray,
        nHeads = if (head == "mha") nH else 1,
        attCs = if (head == "mha") Array.fill(nH)(0.1)
                else Array.emptyDoubleArray,
        attD = if (head == "mha") Array.fill(nH * h2)(rnd.nextGaussian())
               else Array.emptyDoubleArray)
    }

    if (parts("score")) {
    val sdf = windows(scoreRows).persist()
    sdf.count()
    val variants = Seq(
      ("mean", false), ("attn", false),
      ("mean", true), ("attn", true), ("mha", true))
    variants.foreach { case (head, bd) =>
      val m = model(head, bd)
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        sdf.select(LstmStack.logitCol(m, col("window")).as("z"))
          .agg(sum("z")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val s = reps.min
      System.err.println(
        f"[lstm2] score head=$head%-4s bidir=$bd%-5s n=$scoreRows%8d: " +
          f"$s%6.2f s (${scoreRows / s}%,.0f rows/s)")
    }
    // the composed conv→recurrence pipe on the SAME windows: conv
    // shrinks 125 → 29 recurrence steps, so despite the extra conv
    // flops the composed forward should beat the bare bidir stack
    locally {
      val r = new scala.util.Random(21)
      val front = graft.ml.ConvFront.ConvFrontModel(W,
        blocks = Seq(
          graft.ml.ConvFront.ConvBlock(1, 2, 3,
            w = Array.fill(6)(r.nextGaussian() * 0.4),
            b = Array.fill(2)(0.0),
            scale = Array.fill(2)(1.0), shift = Array.fill(2)(0.0)),
          graft.ml.ConvFront.ConvBlock(2, 2, 3,
            w = Array.fill(12)(r.nextGaussian() * 0.4),
            b = Array.fill(2)(0.0),
            scale = Array.fill(2)(1.0), shift = Array.fill(2)(0.0))),
        mix = Array.fill(2)(r.nextGaussian()), mixBias = 0.0,
        mean = 900.0, std = 80.0)
      val m = graft.ml.ConvPipe.ConvPipeModel(front,
        model("mha", bidir = true).copy(window = front.outLen,
          mean = 0.0, std = 1.0))
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        sdf.select(graft.ml.ConvPipe.logitCol(m, col("window")).as("z"))
          .agg(sum("z")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val s = reps.min
      System.err.println(
        f"[lstm2] score conv_pipe (125->29 steps, bidir+mha) n=$scoreRows%8d: " +
          f"$s%6.2f s (${scoreRows / s}%,.0f rows/s)")
    }
    sdf.unpersist()

    // round-15 rows: the MULTI-CHANNEL pipe (ml4g shape — cIn=3 over
    // interleaved 3-axis windows) and the N-TOWER fusion (ml4i shape —
    // three axis-selective towers + the collapsed EnhancedFusionLayer)
    locally {
      def windows3d(n: Long): DataFrame =
        spark.range(n).select(
          col("id"),
          transform(sequence(lit(0), lit(3 * W - 1)), j => {
            val t = (j / 3).cast("double")
            val a = (j % 3).cast("double")
            val ph = pmod(col("id") * 2654435761L, lit(628))
              .cast("double") / 100.0
            lit(100.0) * a + lit(500.0) * sin(t / lit(8.0) + ph)
          }).as("window"))
      val s3 = windows3d(scoreRows).persist()
      s3.count()
      val r = new scala.util.Random(33)
      def front3(axisOnly: Option[Int]) =
        graft.ml.ConvFront.ConvFrontModel(W,
          blocks = Seq(
            graft.ml.ConvFront.ConvBlock(3, 2, 3,
              w = Array.tabulate(18) { idx =>
                val ci = (idx / 3) % 3
                if (axisOnly.forall(_ == ci)) r.nextGaussian() * 0.4
                else 0.0
              },
              b = Array.fill(2)(0.0),
              scale = Array.fill(2)(1.0), shift = Array.fill(2)(0.0)),
            graft.ml.ConvFront.ConvBlock(2, 2, 3,
              w = Array.fill(12)(r.nextGaussian() * 0.4),
              b = Array.fill(2)(0.0),
              scale = Array.fill(2)(1.0), shift = Array.fill(2)(0.0))),
          mix = Array.fill(2)(r.nextGaussian()), mixBias = 0.0,
          mean = 0.0, std = 256.0)
      val stack = model("mha", bidir = true)
      def pipe(axisOnly: Option[Int]) =
        graft.ml.ConvPipe.ConvPipeModel(front3(axisOnly),
          stack.copy(window = front3(None).outLen, mean = 0.0, std = 1.0))
      val m3 = pipe(None)
      val reps3 = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        s3.select(graft.ml.ConvPipe.logitCol(m3, col("window")).as("z"))
          .agg(sum("z")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[lstm2] score conv3d_pipe (cIn=3, 125->29 steps) n=$scoreRows%8d: " +
          f"${reps3.min}%6.2f s (${scoreRows / reps3.min}%,.0f rows/s)")
      val towers = (0 until 3).map(a => pipe(Some(a)))
      val d = towers.map(t =>
        graft.ml.TowerFusion.pooledDim(t.stack)).sum
      val tf = graft.ml.TowerFusion.TowerFusionModel(towers,
        fuse = Array.fill(d * d)(r.nextGaussian() * 0.1),
        w1 = Array.fill(4 * d)(r.nextGaussian() * 0.3),
        b1 = Array.fill(4)(0.0),
        w2 = Array.fill(4)(r.nextGaussian()),
        b2 = 0.0)
      val repsT = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.ml.TowerFusion.withLogit(tf, s3, "window")
          .agg(sum("logit")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[lstm2] score tower_fusion (3 towers) n=$scoreRows%8d: " +
          f"${repsT.min}%6.2f s (${scoreRows / repsT.min}%,.0f rows/s)")
      s3.unpersist()
    }
    } // parts("score")

    // one full-amber training point at fixed iterations (warm first)
    if (parts("train")) {
      val iters = 10
      LstmStack.train(windows(500),
        LstmStack.Config(h1 = 2, h2 = 2, maxIter = 2, head = "mha",
          bidir = true, nHeads = nH))
      val tdf = windows(trainRows).persist()
      tdf.count()
      val t0 = System.nanoTime()
      LstmStack.train(tdf,
        LstmStack.Config(h1 = 2, h2 = 2, maxIter = iters, head = "mha",
          bidir = true, nHeads = nH))
      System.err.println(
        f"[lstm2] train full-amber (bidir+mha) n=$trainRows%8d " +
          f"maxIter=$iters: ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      tdf.unpersist()
    }

    // joint N-tower fusion training point (round 15): interleaved
    // 3-axis windows, fixed iterations — the cost model says ~N× the
    // single composed pipe per evaluation plus fusion flops
    if (parts("tftrain")) {
      def windows3d(n: Long): DataFrame =
        spark.range(n).select(
          col("id"),
          (col("id") % 2).cast("double").as("label"),
          transform(sequence(lit(0), lit(3 * W - 1)), j => {
            val t = (j / 3).cast("double")
            val a = (j % 3).cast("double")
            val ph = pmod(col("id") * 2654435761L, lit(628))
              .cast("double") / 100.0
            lit(100.0) * a + lit(500.0) * sin(t / lit(8.0) + ph) +
              when(col("id") % 2 === 1,
                lit(200.0) * sin(t * lit(1.26) + ph)).otherwise(lit(0.0))
          }).as("window"))
      val cfg = graft.ml.TowerFusion.TrainConfig(
        nTowers = 3,
        blocks = Seq(graft.ml.ConvPipe.BlockSpec(2, 3),
          graft.ml.ConvPipe.BlockSpec(2, 3)),
        h1 = 2, h2 = 2, nHeads = 2, fusionHidden = 4, maxIter = 10)
      graft.ml.TowerFusion.train(windows3d(500),
        cfg.copy(maxIter = 2)) // warmup
      val tdf3 = windows3d(trainRows).persist()
      tdf3.count()
      val t0 = System.nanoTime()
      graft.ml.TowerFusion.train(tdf3, cfg)
      System.err.println(
        f"[lstm2] train tower-fusion (3 towers, joint) n=$trainRows%8d " +
          f"maxIter=10: ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      tdf3.unpersist()
    }
    spark.stop()
  }
}
