package graft.tools

import org.apache.spark.sql.SparkSession

/** Re-pin procedure for the d5 dedup-recall gate: prints the
  * d5DedupRecall rows for a testdata dir so the VALUES constants in
  * TextQueries.d5Sql can be re-derived after a fixture regeneration.
  * Run: runMain graft.tools.DedupProbe <sfDir> */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.TextQueries.d5DedupRecall(spark, sfDir)
      .orderBy("method").show(false)
    spark.stop()
  }
}
