package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.operators.Flatten.FlatDp
import graft.streaming.{Replay, ReplayDp}

/** Giant-event skew probe (SURVEY §7.4 risk 6, the last unmeasured
  * skew surface): both [[graft.report.Summarise.writeEventPages]] and
  * [[Replay.replayBatch]] process one event per task, so a single
  * pathological event — a device left recording for hours — becomes a
  * straggler no partitioning knob can split. Plant ONE 10⁶-sample
  * event (8,000 datapoints × 125 samples) beside a uniform corpus
  * (512 events × 8 dps) and measure the wall-clock delta: uniform
  * alone vs uniform+giant is exactly the straggler tail, because the
  * uniform work rides the other 31 cores either way.
  *
  * `runMain graft.tools.GiantEventProbe [report|replay|both] [giantDps]`
  */
object GiantEventProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")
    val giantDps = args.lift(1).map(_.toInt).getOrElse(8000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nUniform = 512
    val uniformDps = 8

    def raw(e: Long, d: Long): Array[Double] =
      Array.tabulate(125)(i => 800.0 + (e * 104729 + d * 257 + i * 23) % 401)

    def flat(id: String, e: Long, nDp: Int): Seq[FlatDp] =
      (0 until nDp).map { d =>
        FlatDp(id, s"u${e % 7}", "Seizure", 1, 1700000000L + d * 5L, 0L,
          0.0, 0.0, 60.0 + (e + d) % 60, 95.0, raw(e, d),
          Array.emptyDoubleArray, synthetic = false, seq = d.toLong)
      }

    def rdp(id: String, e: Long, nDp: Int): Seq[ReplayDp] =
      (0 until nDp).map { d =>
        ReplayDp(id, 1700000000L + d * 5L, 60.0 + (e + d) % 60, 0L,
          raw(e, d), Array.emptyDoubleArray, d.toLong)
      }

    def time[T](tag: String, reps: Int = 3)(body: => T): Double = {
      val runs = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[giant] $tag rep $i: $dt%.2f s")
        dt
      }
      runs.min
    }

    if (mode == "report" || mode == "both") {
      val uniform = spark.createDataset(
        (0 until nUniform).flatMap(e => flat(s"E$e", e, uniformDps)))
        .repartition(cpus.toInt).cache()
      uniform.count()
      val giant = spark.createDataset(flat("GIANT", 999999L, giantDps))
      val both = uniform.unionByName(giant).cache()
      both.count()
      def pages(ds: Dataset[FlatDp], tag: String): Unit = {
        val out = java.nio.file.Files.createTempDirectory("giantrpt").toString
        val t = time(tag) {
          val p = graft.report.Summarise.writeEventPages(ds, out)
          val mx = p.agg(org.apache.spark.sql.functions.max("nBytes")).head().getLong(0)
          System.err.println(s"[giant] $tag max page bytes: $mx")
        }
        System.err.println(f"[giant] $tag min: $t%.2f s")
      }
      pages(uniform, s"report uniform($nUniform x $uniformDps dps)")
      pages(both, s"report uniform+giant($giantDps dps)")
      uniform.unpersist(); both.unpersist()
    }

    // the P14→P12 fused extraction lineage (FeatureExtract.extract with
    // validate=true — the exact per-event flatMapGroups the ml2/cfg1
    // skeleton and every training path run): the third per-event-linear
    // surface of SURVEY §7.4 risk 6, unmeasured until round 17. The
    // giant event's epochs are windowed (window=step=125), so the work
    // is ~linear in dps; the question is the straggler TAIL (one task
    // owns all 8,000 windows: DFT + Welch + filtfilt per window).
    if (mode == "extract" || mode == "both") {
      val uniform = spark.createDataset(
        (0 until nUniform).flatMap(e => flat(s"E$e", e, uniformDps)))
        .repartition(cpus.toInt).cache()
      uniform.count()
      val both = uniform.unionByName(
        spark.createDataset(flat("GIANT", 999999L, giantDps))).cache()
      both.count()
      def extract(ds: Dataset[FlatDp], tag: String): Unit = {
        val t = time(tag) {
          graft.operators.FeatureExtract.extract(ds, validate = true)
            .toDF().queryExecution.toRdd.count()
        }
        System.err.println(f"[giant] $tag min: $t%.2f s")
      }
      extract(uniform, s"extract uniform($nUniform x $uniformDps dps)")
      extract(both, s"extract uniform+giant($giantDps dps)")
      uniform.unpersist(); both.unpersist()
    }

    if (mode == "replay" || mode == "both") {
      val uniform = spark.createDataset(
        (0 until nUniform).flatMap(e => rdp(s"E$e", e, uniformDps)))
        .repartition(cpus.toInt).cache()
      uniform.count()
      val both = uniform.unionByName(
        spark.createDataset(rdp("GIANT", 999999L, giantDps))).cache()
      both.count()
      def replay(ds: Dataset[ReplayDp], tag: String): Unit = {
        val t = time(tag) {
          Replay.detectionStats(Replay.replayBatch(ds, Seq("osd:V2")))
            .queryExecution.toRdd.count()
        }
        System.err.println(f"[giant] $tag min: $t%.2f s")
      }
      replay(uniform, s"replay uniform($nUniform x $uniformDps dps)")
      replay(both, s"replay uniform+giant($giantDps dps)")
    }
    spark.stop()
  }
}
