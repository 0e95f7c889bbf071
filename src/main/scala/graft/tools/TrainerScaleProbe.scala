package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade probe for the round-10 training stage (graft.ml.Trainer):
  * feature assembly + LBFGS logistic regression over the w5/p12 epoch
  * path's output. Labels come from the fixture's type column — the
  * probe measures COST SHAPE (treeAggregate passes over epochs), not
  * model quality (that is TrainerSpec's planted-separable corpus).
  *
  * `runMain graft.tools.TrainerScaleProbe <sfDir> [reps]`
  */
object TrainerScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val epochs = graft.operators.FeatureExtract.extract(
      graft.queries.OsdbFixture.flatDps(spark, dir,
        col("e") % 80 === 0 && col("has_raw")),
      graft.operators.FeatureExtract.Config(
        window = 250, step = 125, highPassHz = 0.0))
    val assembled = graft.ml.Trainer.assembleFeatures(epochs).cache()
    val n = assembled.count()
    System.err.println(s"[trainer] epochs=$n")

    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val model = graft.ml.Trainer.trainLogistic(assembled, maxIter = 20)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[trainer] fit rep $i: $dt%.2f s (coef[0]=${model.coefficients(0)}%.4g)")
    }
    val t0 = System.nanoTime()
    val model = graft.ml.Trainer.trainLogistic(assembled, maxIter = 20)
    graft.ml.Trainer.scoreEvents(model, assembled).count()
    System.err.println(
      f"[trainer] fit+score: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // --- MLP (round-11): same treeAggregate shape as LR, one fit
    val tm = System.nanoTime()
    val mlp = graft.ml.Trainer.trainMlp(assembled, maxIter = 50)
    System.err.println(
      f"[trainer] mlp fit: ${(System.nanoTime() - tm) / 1e9}%.2f s " +
        f"(layers ${mlp.model.getLayers.mkString("x")})")

    // --- AUROC all-distinct ladder: two-phase rank vs the old global
    // window. Continuous LR probabilities make every score distinct, so
    // the distinct-score table is O(N) — the regime where the round-10
    // Window.orderBy form funnels the whole table through one sorted
    // task. Same statistic both ways; the probe records the divergence
    // in wall time as N grows (and equality of the result).
    def synth(n: Long) = spark.range(n).select(
      (hash(col("id")).cast("double") / Int.MaxValue).as("p_seizure"),
      (col("id") % 2).cast("double").as("label"))
    def windowForm(df: org.apache.spark.sql.DataFrame): Double = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      val r = df.groupBy(col("p_seizure").as("s"))
        .agg(count(lit(1)).as("n"), sum(col("label")).as("npos"))
        .withColumn("cumN", sum("n").over(w))
        .withColumn("avgRank", col("cumN") - (col("n") - 1) / 2.0)
        .agg(sum(col("avgRank") * col("npos")), sum("npos"), sum("n")).head()
      val np = r.getDouble(1)
      (r.getDouble(0) - np * (np + 1) / 2.0) / (np * (r.getLong(2) - np))
    }
    Seq(100000L, 1000000L, 10000000L).foreach { n =>
      val df = synth(n).cache(); df.count()
      val t1 = System.nanoTime()
      val aNew = graft.ml.Trainer.auroc(df)
      val dNew = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val aOld = windowForm(df)
      val dOld = (System.nanoTime() - t2) / 1e9
      df.unpersist()
      System.err.println(
        f"[auroc] $n%,d distinct scores: two-phase $dNew%.2f s vs window $dOld%.2f s " +
          f"(equal=${aNew == aOld}, a=$aNew%.6f)")
    }
    spark.stop()
  }
}
