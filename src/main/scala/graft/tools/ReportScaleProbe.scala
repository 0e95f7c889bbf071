package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Page-emission rate for the round-10 report layer: executor-rendered
  * HTML event pages (one DFT per datapoint, five SVG charts, Hadoop FS
  * writes) per second of wall clock — the number behind the "a
  * 1M-event report streams out of the tasks" claim.
  *
  * `runMain graft.tools.ReportScaleProbe <sfDir> [reps]`
  */
object ReportScaleProbe {
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
    (1 to reps).foreach { i =>
      val out = java.nio.file.Files.createTempDirectory("rptprobe").toString
      val dps = graft.queries.OsdbFixture.flatDps(spark, dir,
        col("e") % 20 === 0 && col("has_raw"))
      val t0 = System.nanoTime()
      val n = graft.report.Summarise.writeEventPages(dps, out).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[report] rep $i: $n pages in $dt%.2f s (${n / dt}%.0f pages/s)")
    }
    spark.stop()
  }
}
