package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Cnn, Lstm}

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

    // warmups (Janino + JIT for the whole gradient path)
    Cnn.train(windows(500), Cnn.Config(maxIter = 3))
    Lstm.train(windows(500), Lstm.Config(maxIter = 3))

    // ---- 1M → 10M decade at fixed iterations
    val sizes = Seq(base, base * 10L)
    val cnnT = sizes.map { n =>
      val df = windows(n).persist(); df.count()
      val s = timed(s"cnn  train n=$n maxIter=$iters")(
        Cnn.train(df, Cnn.Config(maxIter = iters)))
      df.unpersist(); s
    }
    System.err.println(
      f"[decade] cnn exponent ${math.log10(cnnT(1) / cnnT(0))}%.2f")
    val lstmT = sizes.map { n =>
      val df = windows(n).persist(); df.count()
      val s = timed(s"lstm train n=$n maxIter=$iters")(
        Lstm.train(df, Lstm.Config(nUnits = 4, maxIter = iters)))
      df.unpersist(); s
    }
    System.err.println(
      f"[decade] lstm exponent ${math.log10(lstmT(1) / lstmT(0))}%.2f")

    // ---- partition sweep at fixed rows: DetAgg's only P-dependent
    // work is the group shuffle (P tiny records) + ceil(P/64) driver
    // folds — flat here means the combine is not the term that needs
    // a depth bump at cluster partition counts
    Seq(32, 128, 512, 2048).foreach { p =>
      val df = windows(base).repartition(p).persist(); df.count()
      timed(s"cnn  train n=$base P=$p maxIter=$iters")(
        Cnn.train(df, Cnn.Config(maxIter = iters)))
      df.unpersist()
    }
    spark.stop()
  }
}
