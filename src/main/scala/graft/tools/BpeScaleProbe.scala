package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the Bpe.train merge-round scaling fix: the local path must
  * reach reference-scale merge counts (10k+) in seconds, where the
  * per-merge driver-synchronized distributed rounds pay 2+ Spark jobs
  * of fixed scheduler cost each. Prints per-path timings plus a
  * first-k merge-table equality check so the speed claim is for the
  * SAME algorithm, not a different one. */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val distMerges = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The synthetic documents table draws from a few-hundred-word list
    // (vocab exhausts after ~106 merges — measured); real corpora carry
    // ~1M distinct words (Heaps). Re-derive a rich-vocab corpus by
    // suffixing each word with a (word, doc_id)-hash tag — same doc
    // count/length, ~100× vocab, merge supply in the thousands.
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "source",
        """concat_ws(' ', transform(split(text, ' '),
           w -> concat(w, '_', pmod(xxhash64(w, doc_id), 997)))) AS text""")
    docs.cache().count() // isolate training cost from the scan

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[bpe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm codegen/JVM on a small run first
    t("warmup-local-10")(
      graft.operators.Bpe.train(docs, "text", 10).vocabSeqs.count())

    val local1k = t("local-1000-merges")(
      graft.operators.Bpe.train(docs, "text", 1000))
    t("local-5000-merges")(
      graft.operators.Bpe.train(docs, "text", 5000).merges.count())
    t("local-10000-merges")(
      graft.operators.Bpe.train(docs, "text", 10000).merges.count())

    val dist = t(s"distributed-$distMerges-merges")(
      graft.operators.Bpe.train(docs, "text", distMerges,
        localVocabBytes = 0L))

    val lm = local1k.merges.orderBy("rank").limit(distMerges)
      .collect().map(_.toSeq).toSeq
    val dm = dist.merges.orderBy("rank").collect().map(_.toSeq).toSeq
    System.err.println(s"[bpe] first-$distMerges merge tables equal: ${lm == dm}")
    dist.release()
    spark.stop()
  }
}
