package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** One-off timing probe for the IVF parameter-scaling rule (SCALING.md).
  *
  * `runMain graft.tools.IvfScaleProbe <sfDir> <nlist> <nprobe> [reps]`
  *
  * Times `Similarity.ivfKnn` end-to-end (count of the top-k result) at
  * the given coarse-quantizer size and reports min across reps. Used to
  * confirm by measurement that growing nlist ∝ √corpus pulls the 10×
  * scale-up exponent of e4 back to the linear pack (the `ivfKnn`
  * scaladoc's knob), without touching the declared e4 entry whose
  * recall is hash-pinned by e5 at the fixed nlist=16 config.
  */
object IvfScaleProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: IvfScaleProbe <sfDir> <nlist> <nprobe> [reps] [mode=ivf|pq]")
    val dir = args(0)
    val nlist = args(1).toInt
    val nprobe = args(2).toInt
    val reps = if (args.length > 3) args(3).toInt else 3
    val mode = if (args.length > 4) args(4) else "ivf"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val emb = Tables.embeddings(spark, dir)
      val n = (if (mode == "pq")
        Similarity.ivfPqKnn(emb, "vec_id", "embedding", dim = 64, k = 3,
          nlist = nlist, nprobe = nprobe, m = 4, ksub = 16, pqIters = 3)
      else
        Similarity.ivfKnn(emb, "vec_id", "embedding", dim = 64, k = 3,
          nlist = nlist, nprobe = nprobe)).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[ivfprobe:$mode] rep $i: $dt%.3f s ($n rows)")
      dt
    }
    println(f"""{"mode":"$mode","nlist":$nlist,"nprobe":$nprobe,"dir":"$dir","min_sec":${times.min}%.3f}""")
    spark.stop()
  }
}
