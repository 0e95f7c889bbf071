package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{EpochFeatures, Signal}
import graft.operators.FeatureExtract
import graft.queries.OsdbFixture

/** Round-10 verdict item #8: the p-family is the largest bench family,
  * and its data-scaled member is the w5/p12 epoch path
  * (FeatureExtract.extract — flatMapGroups + plain-JVM DFT kernels).
  * Before promoting the band-power kernel to a native codegen
  * Expression, measure WHERE the time actually goes:
  *
  *   - `full`     — the shipped path (boundary + kernel)
  *   - `boundary` — an identical flatMapGroups pipeline (same shuffle,
  *     same typed deserialization, same sort/concat/slice work) with
  *     the epoch feature kernel replaced by an empty map
  *   - `kernel1t` — the SAME epoch kernel over the same sample volume
  *     in a single driver thread (the pure-math floor, no Spark)
  *
  * full − boundary = the distributed kernel cost a native Expression
  * could at best halve (it still computes the same DFT flops);
  * boundary = what moving OFF typed objects could save. The verdict
  * goes to SCALING.md.
  *
  * `runMain graft.tools.EpochProfile <sfDir> [reps]`
  */
object EpochProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(tag: String)(body: => Long): Double = {
      val runs = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val m = body
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[epoch] $tag rep $i: $dt%.2f s ($m rows)")
        dt
      }
      runs.min
    }

    val cfg = FeatureExtract.Config(window = 250, step = 125, highPassHz = 0.0)
    def dps() = OsdbFixture.flatDps(spark, dir,
      col("e") % 80 === 0 && col("has_raw"))

    val full = time("full") {
      FeatureExtract.extract(dps(), cfg).count()
    }

    // boundary-only: the same grouped/sorted/concatenated epoch slicing
    // with no feature math — isolates shuffle + typed deser + array work
    val boundary = time("boundary") {
      val n = graft.model.Osdb.SamplesPerDatapoint
      dps().groupByKey(_.eventId).flatMapGroups { (eventId, it) =>
        val sorted = it.toArray.sortBy(d => (d.tsSec, d.seq))
        if (sorted.isEmpty) Iterator.empty
        else {
          val total = sorted.length * n
          val x = new Array[Double](total)
          var d = 0
          while (d < sorted.length) {
            val a3 = sorted(d).rawData3D
            if (a3 != null && a3.length >= 3) {
              var i = 0
              val m = math.min(n, a3.length / 3)
              while (i < m) { x(d * n + i) = a3(3 * i); i += 1 }
              d += 1
            } else d += 1
          }
          (0 to total - cfg.window by cfg.step).iterator.map { start =>
            (eventId, start, x(start))
          }
        }
      }.count()
    }

    // pure-math floor: the shipped kernel over an equivalent sample
    // volume, one driver thread
    val nEpochs = FeatureExtract.extract(dps(), cfg).count()
    val kernel1t = time("kernel1t") {
      val ex = Array.tabulate(cfg.window)(i => math.sin(i * 0.37) * 500)
      val ey = Array.tabulate(cfg.window)(i => math.cos(i * 0.21) * 300)
      val ez = Array.tabulate(cfg.window)(i => math.sin(i * 0.11) * 100)
      var i = 0L
      var acc = 0.0
      while (i < nEpochs) {
        acc += EpochFeatures.epochFeatures(ex, ey, ez, cfg.sampleFreq).size
        i += 1
      }
      acc.toLong
    }
    System.err.println(
      f"[epoch] verdict inputs: full=$full%.2f boundary=$boundary%.2f " +
        f"kernel-distributed=${full - boundary}%.2f kernel-1thread=$kernel1t%.2f " +
        f"(n_epochs=$nEpochs)")
    spark.stop()
  }
}
