package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md probe for the round-9 dedup additions:
  *
  *   - d7 duplicate-span removal ([[graft.operators.Dedup
  *     .duplicateSpanRemoval]]) — the gram explosion and its two
  *     gram-keyed exchanges are the load; ScaleGen's copy prefix
  *     ("c<i> ") shifts every window by one token yet leaves interior
  *     grams identical across copies, so the duplicate side grows with
  *     the factor — a deliberate worst-case-ish stress.
  *   - SemDeDup (KMeans.lloyd + [[graft.operators.Similarity
  *     .semDedupKept]]) — `k` is the scale dial, and the probe takes it
  *     as an argument to demonstrate the k ∝ √N rule: the pair join is
  *     O(N²/k) but Lloyd assignment is O(N·k), so constant cluster
  *     size (k ∝ N) just moves the quadratic into training; k ∝ √N
  *     balances both at O(N^1.5) — the same decade law as e4's
  *     nlist ∝ √N. ScaleGen copies (+c·1e-4 per component) are
  *     near-dups of their base by construction, so the drop side
  *     stays loaded.
  *
  * `runMain graft.tools.NewDedupScaleProbe <sfDir> <k> [reps]`
  */
object NewDedupScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: NewDedupScaleProbe <sfDir> <k> [reps]")
    val dir = args(0)
    val k = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 3
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

    def time(tag: String)(body: => Long): Double = {
      val runs = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[newdedup] $tag rep $i: $dt%.3f s ($n rows)")
        dt
      }
      runs.min
    }

    val d7 = time("d7_span") {
      // sum(n_removed)+max(len) force the dup join and the rebuild —
      // a bare count() lets Catalyst skip the entire duplicate side
      // (left join, unique right key: count == count(left))
      val out = graft.operators.Dedup
        .duplicateSpanRemoval(graft.Tables.documents(spark, dir),
          "doc_id", "text", n = 20)
        .agg(sum("n_removed").as("rm"), max(length(col("clean_text"))))
        .head()
      out.getLong(0)
    }
    val bpe = time("bpe_train6") {
      // merges count forces training; the corpus-scale step is the one
      // word-frequency collapse, everything after is vocab-bounded
      graft.operators.Bpe.train(
        graft.Tables.documents(spark, dir), "text", numMerges = 6)
        .merges.count()
    }
    val sem = time(s"semdedup_k$k") {
      val emb = graft.Tables.embeddings(spark, dir)
      val clusters = graft.operators.KMeans.lloyd(
        emb, "vec_id", "embedding", k = k, iters = 2)
      graft.operators.Similarity.semDedupKept(
          emb.join(clusters, "vec_id"), "vec_id", "embedding", "cluster",
          tau = 0.95)
        .filter(!col("kept")).count()
    }
    println(f"""{"dir":"$dir","d7_min_sec":$d7%.3f,"bpe_min_sec":$bpe%.3f,"semdedup_min_sec":$sem%.3f,"k":$k}""")
    spark.stop()
  }
}
