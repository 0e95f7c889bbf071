package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Phase attribution for the streaming (st*) declared queries — r19
  * verdict #3: "profile where the time goes per entry (stream setup +
  * 4-file micro-batches + state store vs the aggregation itself)".
  *
  * For each selected st query this runs the registry entry end to end
  * (the bench's toRdd.count action) while a StreamingQueryListener
  * captures every micro-batch's progress: batchId, numInputRows and
  * the durationMs phases (addBatch = execution incl. state commits,
  * queryPlanning, getBatch/latestOffset = source work, walCommit,
  * commitOffsets). total − Σbatch = the NON-stream cost: feed prep
  * (min/max agg + chunk writes), query start/stop, result localize.
  *
  * Usage: StProfile [sfDir] [reps] [q1,q2,...]
  */
object StProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else graft.SparkEntry.queries.keys.filter(_.startsWith("st")).toSeq.sorted
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

    val batches = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Map[String, Long])]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        val m = scala.collection.mutable.Map.empty[String, Long]
        dm.forEach((k, v) => m.update(k, v))
        batches.synchronized {
          batches += ((p.batchId, p.numInputRows, m.toMap))
        }
      }
    }
    spark.streams.addListener(listener)

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (rep <- 1 to reps) {
        batches.synchronized(batches.clear())
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val total = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the last batch's event a beat
        Thread.sleep(300)
        val bs = batches.synchronized(batches.toVector)
        val sumBatch = bs.map(_._3.getOrElse("triggerExecution", 0L)).sum / 1e3
        val phases = bs.flatMap(_._3.toSeq).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).sum }
          .toSeq.sortBy(-_._2)
          .map { case (k, v) => f"$k=${v / 1e3}%.2fs" }.mkString(" ")
        println(f"$name rep$rep total=$total%6.2fs nBatches=${bs.size}%2d " +
          f"batchSum=$sumBatch%5.2fs nonStream=${total - sumBatch}%5.2fs | $phases")
        val perBatch = bs.sortBy(_._1).map { case (id, rows, m) =>
          f"b$id(rows=$rows,${m.getOrElse("triggerExecution", 0L)}ms)"
        }.mkString(" ")
        println(s"  $perBatch")
      }
    }
    spark.stop()
  }
}
