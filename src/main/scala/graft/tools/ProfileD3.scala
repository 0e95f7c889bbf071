package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileD3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    docs.count(); emb.count()
    time("d3_run1") { graft.operators.Dedup.minHashCandidates(docs, "doc_id", "text").count() }
    time("d3_run2") { graft.operators.Dedup.minHashCandidates(docs, "doc_id", "text").count() }
    time("e2_run1") { graft.operators.Similarity.lshKnn(emb, "vec_id", "embedding", dim = 64, k = 3, bits = 8, tables = 4).count() }
    time("e2_run2") { graft.operators.Similarity.lshKnn(emb, "vec_id", "embedding", dim = 64, k = 3, bits = 8, tables = 4).count() }
    time("neardup") { graft.operators.Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", dim = 64, minCosine = 0.9).count() }
    spark.stop()
  }
}
