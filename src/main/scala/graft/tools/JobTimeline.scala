package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job timeline for one registry query (r20; guide §1/§7 — find the
  * serialized job waves before touching anything). Prints every job's
  * start offset, duration and description in submission order, so the
  * gaps (driver-side planning, eager actions between waves) and the
  * overlap (concurrent AQE stages / §2.6 thread pools) are directly
  * visible — JobProfile gives the counts, this gives the phasing.
  *
  * Usage: JobTimeline [sfDir] [reps] [q1,q2,...]
  */
object JobTimeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else Seq("ml9_param_sweep")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.get("q1_agg").foreach(f => f(spark, sfDir).count())

    case class J(id: Int, start: Long, var end: Long = -1L,
                 var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          jobs(e.jobId) = J(e.jobId, e.time, desc = d)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (rep <- 1 to reps) {
        spark.sharedState.cacheManager.clearCache()
        jobs.synchronized(jobs.clear())
        val t0 = System.currentTimeMillis()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.currentTimeMillis() - t0) / 1e3
        Thread.sleep(400) // async listener bus tail
        println(f"=== $name rep$rep wall=$wall%.2fs jobs=${jobs.size} ===")
        if (rep == reps) jobs.synchronized {
          jobs.values.toSeq.sortBy(_.start).foreach { j =>
            val off = (j.start - t0) / 1e3
            val dur = if (j.end < 0) Double.NaN else (j.end - j.start) / 1e3
            println(f"  job ${j.id}%3d  +$off%6.3fs  dur=$dur%6.3fs  ${j.desc.take(110)}")
          }
        }
      }
    }
    spark.stop()
  }
}
