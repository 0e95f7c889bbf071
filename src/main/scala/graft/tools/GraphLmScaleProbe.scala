package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md probe for the round-9 closing additions (w12 EMA, lm1
  * bigram-LM scoring, g1 PageRank, g2 triangles, a19 histogram): runs
  * each registered query at one sf dir and reports min-of-reps seconds.
  *
  * Every timing forces the FULL result through an xxhash64 aggregate —
  * a bare count() would let Catalyst eliminate unique-key left joins
  * and the expensive subtrees above them (the NewDedupScaleProbe d7
  * trap, documented in the verify skill).
  *
  * `runMain graft.tools.GraphLmScaleProbe <sfDir> [reps]`
  */
object GraphLmScaleProbe {
  private val defaultTargets = Seq("w12_ema", "lm1_bigram_score",
    "g1_pagerank", "g2_triangles", "a19_histogram")

  /** Override the query list with GRAFT_PROBE_QUERIES=a,b,c (any
    * registered name) — the generic timing harness for one-off
    * regression bisects. */
  private def targets: Seq[String] =
    sys.env.get("GRAFT_PROBE_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(defaultTargets)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GraphLmScaleProbe <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (name <- targets) {
      val times = (1 to reps).map { i =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(sum(col("h").cast("decimal(38,0)"))).collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[graphlm] $name rep $i: $dt%.3f s ($h)")
        dt
      }
      println(f"$name min=${times.min}%.3f s over $reps reps @ $dir")
    }
    spark.stop()
  }
}
