package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage breakdown for pipe7 (kept as a worked example of
  * profiling a composed pipeline entry stage-by-stage). */
object Pipe7Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[p7] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the JVM/codegen on a first full run, then measure stages
    t("full-once") {
      graft.queries.TextQueries.all("pipe7_clean_train_tokenize")(spark, dir).collect()
    }
    spark.sharedState.cacheManager.clearCache()
    // the SAME builder pipe7 uses — the profiler cannot drift from it
    val cleaned = graft.queries.TextQueries.pipe7Cleaned(spark, dir)
    t("d7-materialize")(cleaned.count())
    val model = t("bpe-train")(
      graft.operators.Bpe.train(cleaned, "clean_text",
        graft.queries.TextQueries.BpeRounds))
    t("tokenize")(
      graft.operators.Bpe
        .tokenCountsBySource(cleaned, "clean_text", "source", model)
        .join(cleaned.groupBy("source").agg(count(lit(1)).as("n_docs")),
          "source").collect())
    spark.stop()
  }
}
