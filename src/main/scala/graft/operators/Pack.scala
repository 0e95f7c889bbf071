package graft.operators

import org.apache.spark.RangePartitioner
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: "concatenate and chop" —
  * documents are laid end-to-end in a deterministic order and cut into
  * fixed token-budget chunks; a document's chunk is decided by its START
  * offset in the concatenated stream. The hard part at scale is the
  * global running sum of token counts: the naive plan is a window over
  * `ORDER BY id` with no partition key, which Spark executes as a
  * SINGLE-partition sort — one task owns the entire corpus, the classic
  * 100 TB anti-plan. [[prefixSum]] replaces it with the textbook
  * distributed two-pass prefix sum:
  *
  *   1. range-partition by id and sort within partitions;
  *   2. job 1: per-partition totals — one row per PARTITION to the
  *      driver, independent of data size;
  *   3. broadcast the exclusive prefix of those totals; job 2 adds each
  *      partition's offset to its local running sum.
  *
  * This is one of the few places the engine drops to the RDD API, and
  * deliberately: the two passes must see the SAME partitioning, and a
  * Dataset-level `repartitionByRange` re-plans its exchange on every
  * action — RE-SAMPLING the range boundaries, so pass-1 offsets could
  * misalign with pass-2 partitions. At the RDD layer the
  * [[RangePartitioner]] is constructed once (one sampling pass) and the
  * shuffle it defines is written once and REUSED by both jobs (Spark
  * skips the map stage of an already-materialized ShuffleDependency),
  * which also means the corpus is shuffled exactly once.
  */
object Pack {

  /** Global exclusive prefix sum of `(id, weight)` pairs ordered by id:
    * returns `(doc_id, n_tokens, start_offset)` where `start_offset` =
    * sum of all weights with smaller id. Two jobs + one boundary-sample
    * pass over ONE shuffle; no single-partition stage. Ids must be
    * unique (ties within a partition are summed in sort order, so equal
    * ids would get order-dependent offsets). */
  def prefixSum(pairs: Dataset[(Long, Long)], parts: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val kv = pairs.rdd
    val partitioner = new RangePartitioner(parts, kv)
    val sorted = kv.repartitionAndSortWithinPartitions(partitioner)
    // job 1: per-partition totals; collect preserves partition order
    val partSums: Array[Long] = sorted
      .mapPartitions(it => {
        var s = 0L; it.foreach(s += _._2); Iterator.single(s)
      }, preservesPartitioning = true)
      .collect()
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per pid
    val bc = spark.sparkContext.broadcast(offsets)
    // job 2: shuffle output reused, local scan + broadcast offset
    val out = sorted.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { case (id, w) =>
        val start = run
        run += w
        (id, w, start)
      }
    }
    spark.createDataset(out).toDF("doc_id", "n_tokens", "start_offset")
  }

  /** Concatenate-and-chop packing: each document goes to the chunk its
    * start offset falls in (`start_offset div seqLen` — documents may
    * span chunk boundaries, as in pretraining packing). `idCol` must be
    * unique; it defines the concatenation order. */
  def tokenPack(docs: DataFrame, idCol: String, tokensCol: String,
                seqLen: Long, parts: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = docs
      .select(col(idCol).cast("long"), col(tokensCol).cast("long"))
      .as[(Long, Long)]
    prefixSum(pairs, parts)
      .withColumn("chunk", expr(s"start_offset div $seqLen"))
  }
}
