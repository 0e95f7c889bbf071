package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

    if (mode == "recall") {
      // DERIVED-KNOB recall at scale (round-11): nlist = 0 derives
      // ceil(√N); truth is a SAMPLED brute force (the full O(N²) truth
      // side is gate-only by the round-8 rule — never in a scale probe).
      // Queries: ~512 deterministic vec_ids; truth = top-k by cosine
      // over the whole corpus per sampled query (broadcast query side,
      // one narrow pass over the vectors).
      import org.apache.spark.sql.expressions.Window
      val planted = graft.queries.TextQueries.e7PlantedEmbeddings(spark, dir)
        .persist()
      val n = planted.count()
      val step = math.max(1L, n / 512L)
      val t0 = System.nanoTime()
      val ann = Similarity.ivfKnn(planted, "vec_id", "embedding",
          dim = 64, k = 3, nlist = nlist, nprobe = nprobe)
        .filter(pmod(col("vec_id"), lit(step)) === 0)
        .select("vec_id", "neighbor_id").persist()
      val annRows = ann.count()
      val dtAnn = (System.nanoTime() - t0) / 1e9
      val qs = planted.filter(pmod(col("vec_id"), lit(step)) === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val scored = planted.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          expr("aggregate(zip_with(embedding, qv, (a, b) -> a * b), " +
            "0.0D, (acc, x) -> acc + x)").as("dot"))
      val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
      val bf = scored.withColumn("rk", org.apache.spark.sql.functions
          .row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid").as("vec_id"), col("nid").as("neighbor_id"))
        .persist()
      val nBf = bf.count()
      val hits = ann.join(bf, Seq("vec_id", "neighbor_id")).count()
      val recall = hits.toDouble / nBf
      System.err.println(
        f"[recall] N=$n%,d derived-knob ivf: recall@3 = $recall%.4f " +
          f"($hits/$nBf over ${nBf / 3} queries; ann $dtAnn%.1f s, $annRows rows)")
      println(f"""{"mode":"recall","dir":"$dir","n":$n,"recall":$recall%.4f,"ann_sec":$dtAnn%.2f}""")
    } else {
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
    }
    spark.stop()
  }
}
