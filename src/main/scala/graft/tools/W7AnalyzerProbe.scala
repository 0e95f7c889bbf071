package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retroactive measurement for the round-12 `FeatureHistory.addHistory`
  * rewrite (single projection instead of a withColumn-per-derived-column
  * loop). The claim was "O(cols²) analyzer work that stalls plan
  * building long before execution" — this probe puts numbers on it at
  * the real P12 width (144 features × (n lags + mean) derived columns)
  * by timing ANALYSIS ONLY (`queryExecution.analyzed`, no action) of
  * both forms on an empty in-memory frame. The loop form is
  * reconstructed inline exactly as round 11 shipped it: one
  * `withColumn` per derived column, each nesting another Project.
  *
  * `runMain graft.tools.W7AnalyzerProbe [nFeatures] [nLags]`
  */
object W7AnalyzerProbe {
  def main(args: Array[String]): Unit = {
    val nF = args.headOption.map(_.toInt).getOrElse(144)
    val n = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val feats = (0 until nF).map(i => f"f$i%03d")
    val base = spark.range(0).toDF("id")
      .withColumn("eventId", col("id").cast("string"))
      .withColumn("tsSec", col("id").cast("double"))
      .withColumn("startSample", col("id"))
      .select(Seq(col("eventId"), col("tsSec"), col("startSample")) ++
        feats.map(f => (col("id") * 0).cast("double").as(f)): _*)

    // round-11 form: fold of withColumn calls, one nested Project each
    def loopForm(df: DataFrame): DataFrame = {
      val w = Window.partitionBy("eventId").orderBy("tsSec", "startSample")
      def lagOf(f: String, k: Int) =
        if (k == 0) col(f) else lag(col(f), k).over(w)
      val withLags = feats.foldLeft(df) { (acc, f) =>
        (0 until n).foldLeft(acc) { (a, k) =>
          a.withColumn(s"${f}_t-$k", lagOf(f, k))
        }.withColumn(s"${f}_mean",
          (0 until n).map(k => col(s"${f}_t-$k")).reduce(_ + _) / n)
      }
      val deepest = feats.map(f => col(s"${f}_t-${n - 1}").isNotNull)
      withLags.filter(deepest.reduce(_ && _))
    }

    def t(tag: String)(body: => DataFrame): Unit =
      try {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val analyzed = body.queryExecution.analyzed
          ((System.nanoTime() - t0) / 1e9, analyzed.output.size)
        }
        System.err.println(f"[w7an] $tag%-22s analysis min ${runs.map(_._1).min}%7.3f s " +
          f"(reps ${runs.map(r => f"${r._1}%.3f").mkString(",")}; outCols ${runs.head._2})")
      } catch {
        // the r11 loop form's nested-Project depth exceeds the default
        // driver stack well before the 144-feature basis — that crash
        // IS the measurement, so report it and keep probing
        case _: StackOverflowError =>
          System.err.println(s"[w7an] $tag analysis: StackOverflowError " +
            "(nested-Project depth exceeds default driver stack)")
      }

    System.err.println(s"[w7an] features=$nF, lags=$n " +
      s"(${nF * (n + 1)} derived columns)")
    t("withColumn loop (r11)")(loopForm(base))
    t("single select (r12)")(
      graft.operators.FeatureHistory.addHistory(base, feats, n))
    spark.stop()
  }
}
