package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Job/stage/task attribution for any registry query (r20; guide §1 —
  * measure where the time goes before touching anything). For each
  * selected query this runs the bench's action (toRdd.count, query
  * construction included) while a SparkListener counts jobs, stages and
  * tasks and sums executor task time. On a many-small-jobs query
  * (iterative graph rounds, per-file maintenance, persist+count
  * ladders) wall ≫ taskSum/cores and the fixed per-job/per-stage
  * scheduling cost — not the operators — is the bill; that is the
  * shape that runs FASTER on 8 cores than 32 at sf0.1.
  *
  * Usage: JobProfile [sfDir] [reps] [q1,q2,...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else Seq("rpt3_index_shards", "g1_pagerank", "g2_triangles",
        "g3_communities", "lake3_compaction")
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

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null)
          taskMs.addAndGet(e.taskMetrics.executorRunTime)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (rep <- 1 to reps) {
        spark.sharedState.cacheManager.clearCache()
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async — let the tail events land
        Thread.sleep(300)
        val tSum = taskMs.get() / 1e3
        println(f"$name rep$rep wall=$wall%6.2fs jobs=${jobs.get()}%3d " +
          f"stages=${stages.get()}%3d tasks=${tasks.get()}%5d " +
          f"taskSum=$tSum%7.2fs ideal@$cpus=${tSum / cpus.toInt}%5.2fs")
      }
    }
    spark.stop()
  }
}
