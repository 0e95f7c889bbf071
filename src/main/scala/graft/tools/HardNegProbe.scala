package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hard-negative mining decade probe (round 17): e11's exact cross
  * join vs [[graft.operators.Similarity.hardNegativesAnn]] with the
  * DERIVED knobs (nlist = ⌈√N⌉, nprobe = ⌈√nlist⌉ — the production
  * law) on the same corpora. The declared e12 gate keeps the pinned
  * (16, 4) knobs for the oracle; this probe measures the scale shape
  * the knob law buys.
  *
  * `runMain graft.tools.HardNegProbe <sfDir> [sfDir2 ...]`
  */
object HardNegProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HardNegProbe <sfDir> [sfDir2 ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String, reps: Int = 3)(body: => Long): Double = {
      val runs = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[hardneg] $tag rep $i: $dt%.2f s ($n rows)")
        dt
      }
      val m = runs.min
      println(f"[hardneg] $tag min: $m%.2f s")
      m
    }

    args.foreach { sf =>
      val emb = graft.Tables.embeddings(spark, sf)
      val n = emb.count()
      println(s"[hardneg] === $sf: $n vectors ===")
      def ann(nlist: Int, nprobe: Int) =
        graft.operators.Similarity.hardNegativesAnn(emb, "vec_id",
          "embedding", "label", dim = 64, k = 2, nlist = nlist,
          nprobe = nprobe, anchorPred = col("id") % 7 === 0)
      time(s"$sf ann-derived") {
        ann(0, 0).queryExecution.toRdd.count()
      }
      time(s"$sf exact-cross (e11 form)") {
        graft.queries.TextQueries.e11HardNegatives(spark, sf)
          .queryExecution.toRdd.count()
      }
      // recall@2 vs the exact form, per knob setting: the pinned gate
      // (16,4), the derived law, and derived-nlist with a doubled probe
      val exact = graft.queries.TextQueries.e11HardNegatives(spark, sf)
        .select(col("qid"), col("nid")).cache()
      val nEx = exact.count()
      val nl = graft.operators.Similarity.sqrtKnob(n)
      for ((tag, a) <- Seq(
          ("pinned(16,4)", ann(16, 4)),
          (s"derived($nl,0)", ann(0, 0)),
          (s"wide($nl,${2 * math.max(4, graft.operators.Similarity.sqrtKnob(nl.toLong))})",
            ann(nl, 2 * math.max(4, graft.operators.Similarity.sqrtKnob(nl.toLong)))),
          ("per-label(derived)",
            graft.operators.Similarity.hardNegativesAnnPerLabel(emb,
              "vec_id", "embedding", "label", dim = 64, k = 2,
              anchorPred = col("id") % 7 === 0)),
          ("per-label(2x-probe)",
            graft.operators.Similarity.hardNegativesAnnPerLabel(emb,
              "vec_id", "embedding", "label", dim = 64, k = 2,
              nprobe = 2 * math.max(4, graft.operators.Similarity.sqrtKnob(
                graft.operators.Similarity.sqrtKnob(n / 10).toLong)),
              anchorPred = col("id") % 7 === 0)))) {
        val hit = exact.join(a.select(col("vec_id").as("qid"),
            col("neighbor_id").as("nid")), Seq("qid", "nid"))
          .count()
        println(f"[hardneg] $sf recall@2 $tag: ${hit.toDouble / nEx}%.4f")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
