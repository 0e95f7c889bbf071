package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.EpochFeatures
import graft.ml.RunSequence
import graft.operators.FeatureHistory
import graft.queries.{Exact, OsdbFixture}

/** r19: ml9_param_sweep times the SAME at sf0.001 and sf0.1 (18.7 vs
  * 18.9 s min) — its cost is fixed driver work, not data. This probe
  * replays the sweep's internals stage by stage to attribute that
  * fixed cost: selection persist, the memoized extraction, the
  * per-historyN evW materializations (each an addHistory 720-column
  * window plan), and the per-run skeleton plan+collect.
  *
  * `runMain graft.tools.Ml9Profile <sfDir> [reps]`
  */
object Ml9Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stage[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[ml9prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to reps).foreach { rep =>
      System.err.println(s"--- rep $rep ---")
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val events = OsdbFixture.ev(spark, dir).select(
        col("e").as("id"), col("u"),
        col("type_str").as("type"), col("sub_type").as("subType"))
      val dps = OsdbFixture.flatDps(spark, dir,
        where = col("k") % 3 =!= 2 && col("u") % 2 === 0)
      val base = RunSequence.Config()

      val ev = stage("ev persist+count+foldrange") {
        val e = RunSequence.selectedEvents(events,
            col("type") =!= "Unknown" && col("u") % 2 === 0,
            Exact.knuthHash32(col("id")) % 3)
          .persist(StorageLevel.MEMORY_AND_DISK)
        e.count()
        e.agg(min("fold"), max("fold")).head()
        e
      }
      val flat = stage("flatEpochs persist+count") {
        val f = RunSequence.flatEpochs(ev, dps, base.extract)
          .persist(StorageLevel.MEMORY_AND_DISK)
        f.count()
        f
      }
      def evWOf(historyN: Int) = {
        val hist = FeatureHistory.addHistory(flat,
          EpochFeatures.FeatureNames, historyN)
        val perEvent = hist.groupBy(col("eventId"))
          .agg(count(lit(1)).as("nEp"))
        val w = ev.join(perEvent, ev("srcId") === perEvent("eventId"), "left")
          .select(col("srcId"), col("fold"),
            coalesce(col("nEp"), lit(0L)).as("nEp"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        w.count()
        w
      }
      val evW3 = stage("evW historyN=3 (addHistory plan+count)") { evWOf(3) }
      val evW2 = stage("evW historyN=2 (addHistory plan+count)") { evWOf(2) }
      // four skeleton runs: baseline + the three knobs (two share evW3)
      val runs = Seq(
        ("baseline", -1L, base, evW3),
        ("oversampleFactor", 3L, RunSequence.withKnob(base, "oversampleFactor", 3L), evW3),
        ("tcAugFac", 2L, RunSequence.withKnob(base, "tcAugFac", 2L), evW3),
        ("historyN", 2L, RunSequence.withKnob(base, "historyN", 2L), evW2))
      val frames = runs.map { case (p, v, cfg, w) =>
        stage(s"skeleton plan $p") {
          RunSequence.skeletonFromEvW(ev, w, cfg)
            .select(lit(p).as("param"), lit(v).as("value"),
              col("fold"), col("stage"), col("n_events"), col("n_epochs"))
        }
      }
      stage("union collect (4 runs)") {
        frames.reduce(_.unionByName(_)).collect().length
      }
      evW2.unpersist(false); evW3.unpersist(false)
      flat.unpersist(false); ev.unpersist(false)
      System.err.println(f"[ml9prof] TOTAL rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
