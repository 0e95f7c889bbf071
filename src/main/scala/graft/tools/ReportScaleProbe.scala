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
    // both container modes: per-event dirs vs per-task bundles — same
    // render path, so pages/s should match and the FILE COUNT is the
    // story (O(events) vs O(tasks): object-store metadata hostility)
    Seq(false, true).foreach { packed =>
      (1 to reps).foreach { i =>
        val out = java.nio.file.Files.createTempDirectory("rptprobe").toString
        val dps = graft.queries.OsdbFixture.flatDps(spark, dir,
          col("e") % 20 === 0 && col("has_raw"))
        val t0 = System.nanoTime()
        val n = graft.report.Summarise
          .writeEventPages(dps, out, packed = packed).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val nFiles = {
          def walk(f: java.io.File): Long =
            if (f.isFile) 1L
            else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
          walk(new java.io.File(out))
        }
        System.err.println(
          f"[report] packed=$packed rep $i: $n pages in $dt%.2f s " +
            f"(${n / dt}%.0f pages/s, $nFiles files)")
      }
    }

    // --- index-shard decade ladder: driver memory must stay FLAT ---
    // The round-10 writeReport collected O(events) index rows to the
    // driver; the sharded form's driver state is O(partitions + groups)
    // count metadata only. Render real shard HTML for 10x-apart event
    // counts and record used heap after GC — the two numbers should sit
    // within noise of each other, not 10x apart.
    import spark.implicits._
    def usedHeapMb(): Double = {
      System.gc(); Thread.sleep(200); System.gc()
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / 1048576.0
    }
    Seq(100000L, 1000000L, 10000000L).foreach { nEvents =>
      val out = java.nio.file.Files.createTempDirectory("idxprobe").toString
      val idx = spark.range(nEvents).select(
        concat(lit("cat"), (col("id") % 4).cast("string")).as("category"),
        format_string("ev%09d", col("id")).as("id"),
        concat(lit("u"), (col("id") % 1000).cast("string")).as("userId"),
        lit("Seizure").as("typeStr"), lit("other").as("subType"),
        (col("id") % 40 + 1).as("nDp")).as[graft.report.Summarise.IdxRow]
      val before = usedHeapMb()
      val t0 = System.nanoTime()
      val (shards, totals) =
        graft.report.Summarise.writeIndexShards(idx, out, pageSize = 1000)
      val nShards = shards.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val after = usedHeapMb()
      shards.unpersist()
      System.err.println(
        f"[index] $nEvents%,d events -> $nShards shards (${totals.values.sum}%,d rows) " +
          f"in $dt%.2f s; driver heap $before%.0f -> $after%.0f MB")
    }
    spark.stop()
  }
}
