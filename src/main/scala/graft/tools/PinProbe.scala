package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic re-pin procedure for constant-pinned gate queries (e5, d5,
  * p9, e6, …): runs any registered SparkEntry query over a testdata dir
  * and prints the full result, so the VALUES constants in its oracle
  * can be re-derived after a fixture regeneration.
  * Run: runMain graft.tools.PinProbe <queryName> [sfDir] */
object PinProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PinProbe <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, sfDir).show(1000, truncate = false)
    spark.stop()
  }
}
