package graft.tools

import org.apache.spark.sql.SparkSession

/** Full-registry codegen audit — the 64 KB tripwire's wide-angle
  * sibling: compile EVERY registered query's whole-stage bodies (plan
  * only, no execution) and report the largest generated methods, so a
  * query OUTSIDE CodegenTripwireSpec's at-risk list that creeps toward
  * the Janino cliff shows up before it falls off. The spec stays the
  * always-on gate over the known expression-stackers; this sweep is
  * the periodic census that feeds its list.
  *
  * `runMain graft.tools.CodegenSweep [sfDir] [reportFloorBytes]`
  */
object CodegenSweep {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val floor = args.lift(1).map(_.toInt).getOrElse(8000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = graft.Queries.all.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          // execute = true: under AQE, whole-stage codegen nodes are
          // only inserted per query stage AT materialization — a
          // plan-only audit sees zero stages for any exchange-bearing
          // query (the first sweep audited 51/202 for exactly this)
          val reports = org.apache.spark.sql.graft.CodegenAudit
            .audit(fn(spark, sf), execute = true)
          spark.sharedState.cacheManager.clearCache()
          reports.map(r => (name, r.stage, r.maxMethodCodeSize, r.error))
        } catch {
          case e: Throwable =>
            System.err.println(
              s"[skip] $name: ${Option(e.getMessage).getOrElse(e.toString).take(100)}")
            Nil
        }
    }
    results.filter(r => r._4.nonEmpty || r._3 > floor)
      .sortBy(-_._3)
      .foreach { case (n, s, sz, err) =>
        println(f"$n%-28s $s%-24s $sz%7d ${err.getOrElse("")}")
      }
    val worst = results.maxBy(_._3)
    println(s"WORST: ${worst._1} / ${worst._2} = ${worst._3} bytes")
    println(s"audited ${results.map(_._1).distinct.size} queries, " +
      s"${results.size} codegen stages, ${results.count(_._4.nonEmpty)} compile failures")
    spark.stop()
  }
}
