package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Absorb session/codegen warmup outside the timed loop so per-query
    // numbers reflect steady state, not first-job init.
    SparkEntry.queries.get("q1_agg").foreach(f => f(spark, sfDir).count())
    // Two reps, report the min: single-JVM local runs occasionally eat a
    // multi-second host hiccup (GC/IO stall) that would otherwise land on
    // one arbitrary query and dominate its number.
    def timeOne(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min over SUCCESSFUL reps only: -1 marks failure and must neither
      // win the min (one bad rep hiding a working query) nor subtract
      // from the total (failures making the benchmark look faster)
      val good = Seq(timeOne(fn), timeOne(fn)).filter(_ >= 0)
      name -> (if (good.isEmpty) -1.0 else good.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
