package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Trainer
import graft.sources.SimulatedEvents
import graft.sources.SimulatedEvents.{Component, EventSpec}

/** MLP architecture/budget probe (round-12 verdict item 6): the
  * reference's best nets are 5-layer (`documentation/ResultsSummary.md`
  * V0.09+), so measure what depth buys through the engine's seam —
  * hidden = Seq(16) (the round-11 default) vs Seq(64, 32, 16) (the
  * 5-layer shape) across LBFGS iteration budgets, on a
  * planted-separable corpus with an event-disjoint held-out split.
  * Reports fit seconds + held-out epoch AUROC per configuration; the
  * `trainMlp` defaults should be the measured-adequate point, not a
  * guess.
  *
  * `runMain graft.tools.MlpProbe [nEventPairs]`
  */
object MlpProbe {
  def main(args: Array[String]): Unit = {
    val nPairs = args.headOption.map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // NOT TrainerSpec's cleanly-separable physics: both classes carry an
    // in-ROI tremor with OVERLAPPING amplitude ranges (SZ 100+5i vs OK
    // 70+5i — heavy overlap across the index sweep) plus a class-shared
    // sway, so the quality ceiling sits below 1.0 and depth/budget
    // differences have room to show. A fully-separable corpus saturates
    // every config at AUROC 1.0 and measures nothing but fit time
    // (first probe run did exactly that).
    val specs = (0 until nPairs).flatMap { i =>
      Seq(
        EventSpec(s"SZ$i", "seizure sim", typeStr = "seizure",
          durationSecs = 60.0,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("tremor", 0, 3.0 + (i % 8) * 0.4, 130.0 + 4.0 * i,
              11.25 * i, 5.0, 55.0),
            Component("sway", 1, 0.3 + 0.01 * i, 40.0, 5.0 * i, 0.0, 1e9))),
        EventSpec(s"OK$i", "normal sim", typeStr = "falseAlarm",
          durationSecs = 60.0,
          components = Seq(
            Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
            Component("tremor", 0, 3.0 + ((i + 3) % 8) * 0.4, 60.0 + 4.0 * i,
              7.5 * i, 5.0, 55.0),
            Component("sway", 1, 0.3 + 0.01 * i, 40.0, 5.0 * i, 0.0, 1e9))))
    }
    val epochs = graft.operators.FeatureExtract.extract(
      SimulatedEvents(spark, specs),
      graft.operators.FeatureExtract.Config(
        window = 125, step = 125, highPassHz = 0.0))
    val assembled = Trainer.assembleFeatures(epochs).cache()
    val idx = expr("CAST(substring(eventId, 3) AS INT) % 2")
    val train = assembled.filter(idx === 0).cache()
    val heldOut = assembled.filter(idx === 1).cache()
    System.err.println(
      s"[mlp] train epochs=${train.count()}, held-out=${heldOut.count()}")

    for {
      hidden <- Seq(Seq(16), Seq(64, 32, 16))
      maxIter <- Seq(50, 100, 200)
    } {
      val t0 = System.nanoTime()
      val m = Trainer.trainMlp(train, hidden = hidden, maxIter = maxIter)
      val fitS = (System.nanoTime() - t0) / 1e9
      val scoreUdf = udf { (v: org.apache.spark.ml.linalg.Vector) =>
        val a = v.toArray
        val scaled = Array.tabulate(a.length)(j => (a(j) - m.mean(j)) / m.std(j))
        m.model.predictProbability(
          org.apache.spark.ml.linalg.Vectors.dense(scaled)).toArray(1)
      }
      val scored = heldOut.select(col("eventId"), col("label"),
        scoreUdf(col("features")).as("p_seizure"))
      val a = Trainer.auroc(scored)
      System.err.println(
        f"[mlp] hidden=${hidden.mkString("x")}%-9s maxIter=$maxIter%3d: " +
          f"fit $fitS%6.2f s, held-out AUROC $a%.4f")
    }
    spark.stop()
  }
}
