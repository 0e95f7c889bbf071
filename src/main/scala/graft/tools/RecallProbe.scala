package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** One-off tuning probe for the e5 recall gate: recall@3 of lshKnn /
  * ivfKnn vs bruteForceKnn over a parameter grid, on the driver
  * embeddings table. Run: runMain graft.tools.RecallProbe <sfDir> */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val bf = Similarity.bruteForceKnn(emb, "vec_id", "embedding", k = 3)
      .select("vec_id", "neighbor_id").cache()
    val nBf = bf.count()
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      ann.select("vec_id", "neighbor_id").join(bf, Seq("vec_id", "neighbor_id"))
        .count().toDouble / nBf
    for (bits <- Seq(4, 6, 8); tables <- Seq(4, 8, 16)) {
      val t0 = System.nanoTime()
      val r = recall(Similarity.lshKnn(emb, "vec_id", "embedding",
        dim = 64, k = 3, bits = bits, tables = tables))
      println(f"lsh bits=$bits%2d tables=$tables%2d recall=$r%.3f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    for (nlist <- Seq(8, 16); nprobe <- Seq(4, 8)) {
      val t0 = System.nanoTime()
      val r = recall(Similarity.ivfKnn(emb, "vec_id", "embedding",
        dim = 64, k = 3, nlist = nlist, nprobe = nprobe))
      println(f"ivf nlist=$nlist%2d nprobe=$nprobe%2d recall=$r%.3f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    // context: score distribution of the true top-3
    val scored = Similarity.bruteForceKnn(emb, "vec_id", "embedding", k = 3)
    scored.select(min("score"), expr("percentile(score, 0.1)"),
      expr("percentile(score, 0.5)"), expr("percentile(score, 0.9)"), max("score"))
      .show(false)
    spark.stop()
  }
}
