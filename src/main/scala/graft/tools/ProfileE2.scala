package graft.tools
import org.apache.spark.sql.SparkSession

/** Stage profile for e2_lsh_ann: where do 2 s go on 2000 rows? */
object ProfileE2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    // warm up session
    spark.range(10).count()
    val q = () => graft.queries.TextQueries.all("e2_lsh_ann")(spark, sf)
    time("e2 cold")(q().count())
    time("e2 warm")(q().count())
    time("e2 warm2")(q().count())
    println(q().queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Aggregate") || l.contains("Window"))
      .mkString("\n"))
    spark.stop()
  }
}
