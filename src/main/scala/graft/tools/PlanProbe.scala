package graft.tools
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of a registered query:
  * `runMain graft.tools.PlanProbe <queryName> [sfDir]`.
  * The .explain-and-iterate loop the scale mandate asks for, without
  * writing a scratch main per query. Caveat: the st* entries drain
  * their stream eagerly and return the materialized memory-sink table,
  * so their printed plan is the sink scan, not the streaming plan —
  * inspect those via the StreamingQuery progress/explain instead. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: PlanProbe <queryName> [sfDir]\nknown: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
