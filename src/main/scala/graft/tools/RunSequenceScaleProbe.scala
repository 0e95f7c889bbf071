package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.RunSequence
import graft.operators.FeatureExtract
import graft.queries.{Exact, OsdbFixture}

/** Scale probe for the COMPOSED §3.1 pipeline (graft.ml.RunSequence) —
  * the round-12 verdict's "scale story asserted in comments, not
  * probed". Three claims under measurement, on ml2's exact workload
  * (same select / foldOf / fixture slice as the oracle row):
  *
  *   1. fold-count invariance of the shared lineage: `skeleton` at
  *      k=3 vs k=6 — extraction runs ONCE, so doubling k must cost
  *      ~nothing (the 3k+1 skeleton branches aggregate an O(events)
  *      frame);
  *   2. decade exponent: `skeleton` wall time across
  *      sf0.001 → sf0.01 → sf0.1 (a linear pipeline reads ≤ ~1.0);
  *   3. `run` per-fold marginal: total time at k=3 decomposed as
  *      shared-materialization + k·(LBFGS + score) — the only O(k·data)
  *      part should be the training passes.
  *
  * `runMain graft.tools.RunSequenceScaleProbe [reps]`
  */
object RunSequenceScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def workload(dir: String) = {
      val events = OsdbFixture.ev(spark, dir).select(
        col("e").as("id"), col("u"),
        col("type_str").as("type"), col("sub_type").as("subType"))
      val dps = OsdbFixture.flatDps(spark, dir,
        where = col("k") % 3 =!= 2 && col("u") % 2 === 0)
      (events, dps)
    }
    val select = col("type") =!= "Unknown" && col("u") % 2 === 0
    val foldOf = Exact.knuthHash32(col("id")) % 3

    def minOf(f: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // ---- claim 1 + 2: skeleton across decades, k=3 vs k=6 at sf0.1
    val decades = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val times = decades.map { dir =>
      val (ev, dps) = workload(dir)
      val t = minOf {
        RunSequence.skeleton(ev, dps, select, foldOf).toDF()
          .queryExecution.toRdd.count()
      }
      println(f"[skeleton] $dir%-28s min=$t%7.2f s (of $reps)")
      t
    }
    times.sliding(2).zip(decades.sliding(2)).foreach {
      case (Seq(a, b), Seq(d1, d2)) =>
        println(f"[skeleton] decade exponent ${d1.split('/').last}->" +
          f"${d2.split('/').last}: ${math.log10(b / a)}%5.2f")
      case _ =>
    }
    val (ev1, dps1) = workload("/root/testdata/sf0.1")
    val tK6 = minOf {
      RunSequence.skeleton(ev1, dps1, select,
          Exact.knuthHash32(col("id")) % 6,
          RunSequence.Config(k = 6)).toDF()
        .queryExecution.toRdd.count()
    }
    println(f"[skeleton] sf0.1 k=6: min=$tK6%7.2f s " +
      f"(k=3 was ${times.last}%5.2f s; ratio ${tK6 / times.last}%4.2f " +
      "— ~1.0 means extraction is fold-count invariant)")

    // ---- claim 3: run() total vs shared lineage at sf0.1
    val cfg = RunSequence.Config(maxIter = 20)
    val tShared = minOf {
      val evs = RunSequence.selectedEvents(ev1, select, foldOf)
      RunSequence.historyEpochs(evs, dps1, cfg)
        .queryExecution.toRdd.count()
    }
    val t0 = System.nanoTime()
    val res = RunSequence.run(ev1, dps1, select, foldOf, cfg)
    val tRun = (System.nanoTime() - t0) / 1e9
    println(f"[run] sf0.1 k=3 total=$tRun%7.2f s; shared lineage alone=" +
      f"$tShared%7.2f s; per-fold marginal ~ " +
      f"${(tRun - tShared) / cfg.k}%5.2f s (train+score+metrics)")
    res.foreach(r => println(
      f"[run]   fold ${r.fold} auroc=${r.heldOutAuroc}%6.4f " +
        s"train=${r.nTrainEvents} aug=${r.nTrainAugEvents} " +
        s"test=${r.nTestEvents}"))
    spark.stop()
  }
}
