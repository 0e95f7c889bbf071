package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication at scale: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard. Design target is 100 TB: every variant is
  * shuffle-on-a-compact-key (hash/bucket), never an all-pairs compare.
  */
object Dedup {

  /** Exact dedup on the normalized-text fingerprint: one hash-groupBy
    * keeping the smallest id per fingerprint (deterministic winner).
    * The only shuffle key is the 16-byte fingerprint. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("fingerprint").orderBy(col(idCol))
    docs.withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      // give callers back their own schema: both helper columns go
      // (fingerprint-wanting callers use exactDupGroups)
      .drop("__rn", "fingerprint")
  }

  /** Exact-dup groups: fingerprint -> canonical id + duplicate count. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  // ------------------------------------------------------------ MinHash LSH

  /** Deterministic universal hash h_i(x) = (a_i*x + b_i) mod p over a
    * 64-bit token hash, with p = 2^31-1 so (h mod p)*(a mod p) stays
    * below 2^62 — no overflow under ANSI arithmetic. */
  private val MersennePrime = 2147483647L // 2^31 - 1

  case class MinHashConfig(
      numHashes: Int = 64,
      bands: Int = 16,            // 16 bands x 4 rows: catches J >~ 0.5
      shingleSize: Int = 3,
      seed: Long = 42L) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** 64-bit deterministic string hash (FNV-1a) for shingles/tokens. */
  @inline private def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  private def shingleSet(text: String, n: Int): Array[String] = {
    val toks = Option(text).getOrElse("").toLowerCase.trim.split("\\s+")
    if (toks.length < n) Array.empty
    else toks.sliding(n).map(_.mkString(" ")).toArray.distinct
  }

  /** Per-doc MinHash signature as an array<bigint> column. Shingles are
    * token n-grams fingerprinted to 64 bits by FNV-combining the n token
    * hashes — no shingle string is ever materialized, and no distinct
    * pass runs: duplicate shingles cannot change a min, so the multiset
    * is as good as the set. Each signature slot is the min of (a*h+b)
    * mod p over the doc's shingle hashes.
    *
    * One tight-loop UDF per row: expressing this as nested array HOFs
    * re-evaluates the tokenizer per (slot x shingle) because lambda
    * bodies inline their inputs — O(10^7) interpreted regex splits per
    * document. The UDF tokenizes once, hashes each token once, and runs
    * slots x shingles fused multiply-adds. */
  def minHashSignature(textCol: Column, cfg: MinHashConfig = MinHashConfig()): Column = {
    val p = MersennePrime
    val as = Array.tabulate(cfg.numHashes)(i =>
      math.abs(new scala.util.Random(cfg.seed * 7919 + i).nextLong()) % p | 1L)
    val bs = Array.tabulate(cfg.numHashes)(i =>
      math.abs(new scala.util.Random(cfg.seed * 104729 + i).nextLong()) % p)
    val n = cfg.shingleSize
    val nh = cfg.numHashes
    val sigUdf = udf { (text: String) =>
      val toks = Option(text).getOrElse("").toLowerCase.trim.split("\\s+")
      val nSh = toks.length - n + 1
      val out = Array.fill(nh)(Long.MaxValue)
      var i = 0
      while (i < nSh) {
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < n) { h ^= hash64(toks(i + j)); h *= 0x100000001b3L; j += 1 }
        val sh = java.lang.Math.floorMod(h, p)
        var k = 0
        while (k < nh) {
          val v = (sh * as(k) + bs(k)) % p
          if (v < out(k)) out(k) = v
          k += 1
        }
        i += 1
      }
      if (nSh <= 0) Array.fill(nh)(-1L) else out
    }
    sigUdf(textCol)
  }

  /** LSH band key: hash of one band's signature slice. Docs sharing any
    * band key are candidate duplicates. */
  def bandKeys(sig: Column, cfg: MinHashConfig): Column =
    array((0 until cfg.bands).map { b =>
      xxhash64(lit(b), concat_ws(",",
        (0 until cfg.rowsPerBand).map(r =>
          element_at(sig, b * cfg.rowsPerBand + r + 1)): _*))
    }: _*)

  /** Candidate duplicate pairs via LSH banding: explode band keys,
    * self-join on the bucket, dedupe pairs. The join key is (band,
    * bucket-hash) so only near-duplicates ever meet in the shuffle —
    * this is the O(n) path that replaces the O(n^2) compare at scale.
    * Estimated Jaccard = fraction of matching signature slots.
    *
    * Shuffle discipline (the round-2 bench bottleneck was violating it):
    * the band self-join and the pair dedup carry ONLY (id, band) /
    * (id_a, id_b) longs — the 64-slot signature arrays never enter a
    * join or dedup shuffle. Signatures are joined back onto the few
    * surviving pairs afterwards; recomputing the signature projection
    * for those joins is a per-row map (~0.3 s for 5k docs) while
    * shuffling 512-byte arrays through an exploded 16x self-join costs
    * multiples of that, and the gap widens with corpus size.
    *
    * Contract for sub-shingle-length docs (< shingleSize tokens): they
    * produce the all -1 sentinel signature and are EXCLUDED here — all
    * of them would otherwise share identical band keys and report
    * est_jaccard=1.0 against each other. Exact duplicates among short
    * docs are the designated job of [[exactDedup]]/[[exactDupGroups]]
    * (fingerprint equality), which a dedup pipeline should always run
    * alongside MinHash. */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        cfg: MinHashConfig = MinHashConfig(),
                        minEstJaccard: Double = 0.5): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
        minHashSignature(col(textCol), cfg).as("sig"))
      .filter(element_at(col("sig"), 1) =!= lit(-1L))
    val banded = sigs.select(col("id"),
      explode(bandKeys(col("sig"), cfg)).as("band"))
    val pairIds = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    pairIds
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / cfg.numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash over token hashes: majority vote per bit — bits with
    * more set-token hashes than unset become 1. Tight-loop UDF for the
    * same reason as [[minHashSignature]]: one tokenize, 64 bit counters
    * in one pass. */
  def simHash(textCol: Column): Column = {
    val simUdf = udf { (text: String) =>
      val toks = Option(text).getOrElse("").toLowerCase.trim.split("\\s+")
      val counts = new Array[Int](64)
      var i = 0
      while (i < toks.length) {
        val h = hash64(toks(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
    simUdf(textCol)
  }

  /** Hamming distance between two simhashes (bit_count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the 4 x 16-bit chunks (a pair
    * within Hamming distance 3 of 64 bits must agree on at least one
    * 16-bit chunk — pigeonhole), join per chunk, verify distance. */
  def simHashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
      .withColumn("chunk", explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))): _*)))
    sigs.as("a").join(sigs.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDist(col("a.sim"), col("b.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------- duplicate-cluster resolution

  /** Connected components over candidate-duplicate pairs — the cluster
    * step every dedup pipeline runs after candidate generation: group
    * transitively-linked near-dups and pick min-id as the canonical
    * document. Iterative min-label propagation: each round joins labels
    * across edges and keeps the per-node min, one key shuffle per
    * round, `localCheckpoint` cutting the lineage so round N's plan
    * does not re-execute rounds 1..N-1. Converges in O(cluster
    * diameter) rounds — near-dup clusters are shallow (a hub document
    * links its variants), so 3-4 rounds is typical; `maxIter` bounds
    * pathology. The driver loop iterates ROUNDS (one count() action
    * each, the standard iterative-algorithm shape — MLlib does the
    * same), never rows. At 100 TB the same loop holds — the state is
    * one (id, comp) pair per DISTINCT doc appearing in any candidate
    * pair (far smaller than the corpus), and each round's shuffle
    * carries only those pairs; the log-round large-star/small-star
    * variant is the escalation if cluster diameters ever grow deep.
    *
    * Returns (doc_id, component_id) for every doc in `pairs`;
    * singletons (docs with no candidate pair) are absent — callers
    * union them back with component_id = own id. */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val prop = edges
        .join(labels.select(col("id").as("v"), col("comp").as("vcomp")), "v")
        .groupBy(col("u")).agg(min("vcomp").as("ncomp"))
      val next = labels
        .join(prop.select(col("u").as("id"), col("ncomp")), Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint()
      changed = next
        .join(labels.select(col("id"), col("comp").as("old")), "id")
        .filter(col("comp") =!= col("old")).count()
      labels = next
      it += 1
    }
    labels.select(col("id").as("doc_id"), col("comp").as("component_id"))
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact token-n-gram Jaccard over *discriminative* shingles inside a
    * blocking key. Shingles with document frequency above `maxDf` are
    * dropped (stop-shingle removal) BEFORE the self-join: a shingle
    * shared by d documents contributes d^2 join pairs, so without the df
    * cap one hot shingle turns the shuffle into a cross join — at corpus
    * scale this cap is what keeps the operator O(n * maxDf) instead of
    * O(n^2). High-df shingles carry no near-dup signal anyway (they are
    * the corpus' stopword phrases). Jaccard is then exact over the kept
    * shingle sets — deterministic and oracle-matchable. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: Column, n: Int = 2,
                        minJaccard: Double = 0.0,
                        maxDf: Int = 20): DataFrame = {
    val ngramsUdf = udf((text: String) => shingleSet(text, n))
    val sh = docs.select(col(idCol).as("id"), blockCol.as("block"),
        explode(ngramsUdf(col(textCol))).as("shingle"))
    val rare = sh.groupBy("block", "shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("block", "shingle")
    val kept = sh.join(rare, Seq("block", "shingle"))
    val counts = kept.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = kept.as("a").join(kept.as("b"),
        col("a.block") === col("b.block") &&
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }
}
