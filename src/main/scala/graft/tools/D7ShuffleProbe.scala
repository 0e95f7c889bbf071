package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B shuffle-byte measurement for d7's gram-key fingerprinting
  * (round-10 verdict item #2): runs duplicateSpanRemoval's pipeline
  * with (a) the shipped 128-bit fingerprint keys and (b) the
  * pre-round-10 raw ~20-token string keys (inlined here verbatim for
  * the comparison), reporting wall time and TOTAL SHUFFLE WRITE BYTES
  * per run via a stage-completion listener. Results must be
  * row-identical — the probe asserts the aggregate matches.
  *
  * `runMain graft.tools.D7ShuffleProbe <sfDir> [reps]`
  */
object D7ShuffleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: D7ShuffleProbe <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
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

    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // the pre-round-10 pipeline: identical except the two exchanges key
    // on the raw gram STRING (kept here for the A/B only)
    def rawKeyed(docs: DataFrame): DataFrame = {
      val n = 20
      val arr = docs.select(col("doc_id").cast("long").as("id"),
          split(lower(trim(col("text"))), "\\s+").as("toks"))
        .filter(size(col("toks")) >= n)
      val occ = arr.select(col("id"),
        posexplode(expr(
          s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
          .as(Seq("s", "gram")))
      val winners = occ.groupBy("gram")
        .agg(min(struct(col("id"), col("s"))).as("w"))
      val dupSpans = occ.join(winners, "gram")
        .filter(!(col("id") === col("w.id") && col("s") === col("w.s")))
        .groupBy("id").agg(collect_list(col("s")).as("ss"))
      arr.join(dupSpans, Seq("id"), "left")
        .withColumn("kept", expr(
          s"filter(sequence(0, size(toks) - 1), i -> ss IS NULL OR NOT exists(ss, s -> s <= i AND i <= s + ${n - 1}))"))
        .select(col("id").as("doc_id"),
          size(col("toks")).as("n_tok"),
          (size(col("toks")) - size(col("kept"))).as("n_removed"),
          expr("concat_ws(' ', transform(kept, i -> toks[i]))").as("clean_text"))
    }

    def run(tag: String)(df: => DataFrame): Long = {
      var agg = 0L
      (1 to reps).foreach { i =>
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        val r = df
          .agg(sum("n_removed").as("rm"), max(length(col("clean_text"))))
          .head()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000) // let the listener bus drain
        agg = r.getLong(0)
        System.err.println(
          f"[d7shuf] $tag rep $i: $dt%.2f s, shuffle ${shuffleBytes.get / 1e6}%.1f MB (removed=$agg)")
      }
      agg
    }

    val docs = graft.Tables.documents(spark, dir)
    docs.cache().count()
    val a = run("fingerprint")(graft.operators.Dedup
      .duplicateSpanRemoval(docs, "doc_id", "text", n = 20))
    val b = run("raw-string")(rawKeyed(docs))
    require(a == b, s"A/B results diverge: fingerprint=$a raw=$b")
    System.err.println(s"[d7shuf] results identical (n_removed total = $a)")
    spark.stop()
  }
}
