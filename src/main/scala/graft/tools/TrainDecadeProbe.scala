package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Cnn, ConvPipe, Lstm}

/** The round-13 verdict's item 7: the CNN/LSTM training decade
  * exponents were measured to 1M rows; this probe adds the 10M-row
  * decade (1M → 10M at fixed LBFGS iterations) and a PARTITION-COUNT
  * sweep at fixed rows — together they pin whether the distributed
  * combine (now [[graft.ml.DetAgg]]'s index-ordered two-level tree, not
  * treeAggregate) needs deeper fan-in before the 100× claim is safe:
  * the decade exponent says how cost grows with DATA, the sweep says
  * how it grows with PARTIAL COUNT at constant data (the only term
  * DetAgg's group shuffle + driver fold add).
  *
  * `runMain graft.tools.TrainDecadeProbe [baseRows] [maxIter]`
  * (defaults 1000000, 5 — fixed-iteration timing, same discipline as
  * CnnScaleProbe).
  */
object TrainDecadeProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(1000000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
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

    def timed(what: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[decade] $what: $s%8.2f s")
      s
    }

    // which sections run (3rd arg, comma-separated; default: all)
    val parts = args.lift(2).getOrElse("cnn,lstm,pipe,sweep")
      .split(",").map(_.trim).toSet

    // ---- 1M → 10M decade at fixed iterations
    val sizes = Seq(base, base * 10L)
    def decade(name: String, train: DataFrame => Unit): Unit = {
      val ts = sizes.map { n =>
        val df = windows(n).persist(); df.count()
        val s = timed(s"$name train n=$n")(train(df))
        df.unpersist(); s
      }
      System.err.println(
        f"[decade] $name exponent ${math.log10(ts(1) / ts(0))}%.2f")
    }
    if (parts("cnn")) {
      Cnn.train(windows(500), Cnn.Config(maxIter = 3)) // warmup
      decade("cnn", df => Cnn.train(df, Cnn.Config(maxIter = iters)))
    }
    if (parts("lstm")) {
      Lstm.train(windows(500), Lstm.Config(maxIter = 3)) // warmup
      decade("lstm",
        df => Lstm.train(df, Lstm.Config(nUnits = 4, maxIter = iters)))
    }
    // ConvPipe decade (round-15: the composed end-to-end backward —
    // recurrence rowGrad feeding the conv backward — inherits the
    // linear decade iff the exponent stays at-or-below 1.0). Fewer
    // iterations than the bare families: the exponent is a ratio, so
    // the iteration count cancels; the ml4f-ish small shape keeps the
    // absolute time bounded.
    if (parts("pipe")) {
      val pipeCfg = ConvPipe.Config(
        blocks = Seq(ConvPipe.BlockSpec(2, 3), ConvPipe.BlockSpec(2, 3)),
        h1 = 2, h2 = 2, head = "mha", nHeads = 2, bidir = true,
        maxIter = 3)
      ConvPipe.train(windows(500), pipeCfg) // warmup
      decade("pipe", df => ConvPipe.train(df, pipeCfg))
    }

    // ---- partition sweep at fixed rows: DetAgg's only P-dependent
    // work is the group shuffle (P tiny records) + ceil(P/64) driver
    // folds — flat here means the combine is not the term that needs
    // a depth bump at cluster partition counts
    if (parts("sweep")) Seq(32, 128, 512, 2048).foreach { p =>
      val df = windows(base).repartition(p).persist(); df.count()
      timed(s"cnn  train n=$base P=$p maxIter=$iters")(
        Cnn.train(df, Cnn.Config(maxIter = iters)))
      df.unpersist()
    }
    spark.stop()
  }
}
