package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake maintenance: small-file compaction for partitioned parquet lakes
  * (SURVEY §1.3's normalized layout under churn).
  *
  * Incremental ingest — S6 upsert batches, streaming sinks, per-category
  * appends — leaves each partition directory with dozens-to-thousands of
  * small files; at 100 TB the scan cost becomes file-open dominated
  * (listing, footer reads, one input split per tiny file) long before
  * bytes dominate. Compaction rewrites each partition's rows into
  * size-bounded files WITHOUT changing content.
  *
  * Shape: one declarative job — `repartition(partitionCol)` lines the
  * data up one-shuffle-task-per-partition (AQE coalesces empties), and
  * the writer's `maxRecordsPerFile` rolls each task's output into
  * ceil(rows/max) files, so the file count per partition is bounded by
  * construction. No driver loop over partitions, no per-partition jobs:
  * the same plan compacts 10 partitions or 10,000. (Row count is the
  * size proxy — records here are near-fixed width; a byte-exact target
  * would need the writer's rolling policy, which parquet's row-group
  * granularity approximates anyway.) The rewrite lands in `destDir`;
  * swapping it over the source is the caller's (atomic-rename /
  * metastore) move — in-place rewrite without a transaction log is how
  * lakes lose data.
  *
  * [[compactionStats]] reports files/rows per partition for both dirs.
  * The listing is driver-side O(files) — the stats instrument, not the
  * compaction path; a production lake reads its manifest instead.
  */
object LakeMaintenance {

  def compact(spark: SparkSession, srcDir: String, destDir: String,
              partitionCol: String, maxRecordsPerFile: Long): Unit =
    spark.read.parquet(srcDir)
      .repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(destDir)

  /** (partition, files_src, files_dest) per partition directory. */
  def compactionStats(spark: SparkSession, srcDir: String,
                      destDir: String): DataFrame = {
    import spark.implicits._
    def filesPerPartition(dir: String): Map[String, Int] = {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isDirectory).map { d =>
        d.getPath.getName ->
          fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet"))
      }.toMap
    }
    val src = filesPerPartition(srcDir)
    val dst = filesPerPartition(destDir)
    (src.keySet ++ dst.keySet).toSeq.sorted
      .map(k => (k, src.getOrElse(k, 0), dst.getOrElse(k, 0)))
      .toDF("partition", "files_src", "files_dest")
  }
}
