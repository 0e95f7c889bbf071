package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding TOKENIZER TRAINING (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units" —
  * the learn_bpe algorithm) — the step a training-data pipeline runs
  * before token counting/packing means anything: the vocabulary itself
  * is learned from the corpus.
  *
  * Scale shape — the reason BPE trains fine on 100 TB:
  *   - ONE corpus-scale pass: the word-frequency collapse (tokenize →
  *     groupBy word). Everything after runs on the DISTINCT-word table,
  *     which grows sublinearly (Heaps' law) and is
  *     corpus-size-independent per merge round.
  *   - per round: adjacent-pair counts weighted by word frequency (an
  *     exchange bounded by vocab × avg word length), an argmax of ONE
  *     row to the driver (the merge decision — control plane, like
  *     KMeans' centroids), and a narrow per-word merge apply.
  *   - driver state: the merge list (numMerges pairs). Nothing else.
  *
  * Determinism: greedy left-to-right merge application (the reference
  * algorithm's order), and the argmax tie-breaks by (count DESC, left
  * ASC, right ASC) — total order, so the learned merges are a pure
  * function of the corpus. Pair counting counts OVERLAPPING adjacent
  * pairs ("aaa" contributes (a,a) twice), exactly like the reference's
  * get_stats; application merges non-overlapping occurrences left to
  * right, so a run of 2k 'a's becomes k 'aa's.
  *
  * The merge apply is a tight-loop UDF (same justification as
  * [[Dedup.minHashSignature]]: an array-HOF formulation re-evaluates
  * its inputs per lambda and cannot express the consumed-position
  * state); the cross-engine contract is the run-parity law — a greedy
  * left-to-right scan merges position i iff symbols (i, i+1) match and
  * i sits at an EVEN offset within its run of left-symbol repeats —
  * which is what the SQL oracle states with window functions.
  *
  * `</w>` is the end-of-word sentinel symbol (the reference's
  * convention), so merges can learn whole-word tokens and suffixes.
  */
object Bpe {

  val EndOfWord = "</w>"

  case class BpeModel(merges: DataFrame, vocabSeqs: DataFrame)

  private val mergeUdf = udf { (seq: Seq[String], a: String, b: String) =>
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = seq.length
    while (i < n) {
      if (i + 1 < n && seq(i) == a && seq(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += seq(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `numMerges` BPE merges from the corpus.
    *
    * @return merges — (rank, left, right, freq): the learned merge table
    *         in training order; vocabSeqs — (w, f, s): every distinct
    *         word with its frequency and FINAL symbol sequence (the
    *         trained tokenizer's lookup table — broadcast it to
    *         tokenize the corpus, [[tokenCountsBySource]]). vocabSeqs
    *         stays CACHED (vocab-bounded); call
    *         `model.vocabSeqs.unpersist()` when done with the model.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            vocabParts: Int = 8): BpeModel = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    var seqs = words
      // filter the trailing "" that Spark's limit=-1 split("") keeps
      .withColumn("s", concat(
        expr("filter(split(w, ''), x -> x <> '')"), array(lit(EndOfWord))))
      .select("w", "f", "s")
      // coalesce the vocab-bounded table: every merge round runs 2 jobs
      // over it, and at shuffle-partition width (32+) the rounds pay
      // 32 mostly-empty tasks of scheduling overhead each — measured
      // ~1 s/round of pure overhead in pipe7. The corpus-scale collapse
      // above keeps full map-side width; only the reduce/round side
      // narrows. Heaps' law keeps vocab ≪ corpus at any sf; raise
      // vocabParts for billion-word vocabs.
      .coalesce(vocabParts)
      .cache() // vocab-bounded: the corpus-scale pass is behind us
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to numMerges) {
      val best = seqs.filter(size(col("s")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(0, size(s) - 2), i -> struct(s[i] AS a, s[i+1] AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      require(best.nonEmpty,
        s"corpus exhausted after ${r - 1} merges (every word is one symbol)")
      val (a, b, cnt) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((r, a, b, cnt))
      // cache-swap per round: materialize the merged table, THEN drop
      // the previous round's cache — otherwise round r rebuilds the
      // whole r-deep UDF chain from the base (O(numMerges²) total, and
      // the reference trains 10k+ merges, not 6)
      val next = seqs.withColumn("s", mergeUdf(col("s"), lit(a), lit(b)))
        .cache()
      next.count()
      seqs.unpersist(false)
      seqs = next
    }
    import spark.implicits._
    BpeModel(
      merges.toSeq.toDF("rank", "lhs", "rhs", "freq"),
      seqs.select("w", "f", "s"))
  }

  /** Tokenize the corpus under a trained model: per-word token counts
    * come from the vocab table (broadcast — vocab-bounded), so the
    * corpus-scale side is ONE scan + narrow explode; no text shuffles.
    * Words outside the vocab fall back to character count + 1 (their
    * untrained symbol sequence length). */
  def tokenCountsBySource(docs: DataFrame, textCol: String,
                          groupCol: String, model: BpeModel): DataFrame = {
    val wordTok = model.vocabSeqs
      .select(col("w"), size(col("s")).as("n_tok"))
    docs
      .select(col(groupCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(wordTok), Seq("w"), "left")
      .withColumn("n_tok",
        coalesce(col("n_tok"), length(col("w")) + lit(1)))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
  }
}
