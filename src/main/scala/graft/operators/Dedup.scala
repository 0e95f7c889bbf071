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
      .filter(col("__rn") === 1).drop("__rn")
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

  /** Per-doc MinHash signature as an array<bigint> column. Shingles are
    * token 3-grams hashed to 64 bits; each signature slot is the min of
    * (a*h+b) mod p over the doc's shingle set. Pure columnar HOFs —
    * the signature computation never leaves codegen. */
  def minHashSignature(textCol: Column, cfg: MinHashConfig = MinHashConfig()): Column = {
    val shingleHashes = transform(
      TextAnalysis.tokenNgrams(lower(textCol), cfg.shingleSize),
      s => abs(xxhash64(s)))
    val slots = (0 until cfg.numHashes).map { i =>
      val a = math.abs(new scala.util.Random(cfg.seed * 7919 + i).nextLong()) % MersennePrime | 1L
      val b = math.abs(new scala.util.Random(cfg.seed * 104729 + i).nextLong()) % MersennePrime
      array_min(transform(shingleHashes,
        h => pmod(h % lit(MersennePrime) * lit(a) + lit(b), lit(MersennePrime))))
    }
    array(slots: _*)
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
    * Estimated Jaccard = fraction of matching signature slots. */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        cfg: MinHashConfig = MinHashConfig(),
                        minEstJaccard: Double = 0.5): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
        minHashSignature(col(textCol), cfg).as("sig"))
      .withColumn("band", explode(bandKeys(col("sig"), cfg)))
    val pairs = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    pairs.withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / cfg.numHashes)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("id_a", "id_b", "est_jaccard")
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash over token hashes: majority vote per bit. Bits with
    * more set-token hashes than unset become 1. Columnar: aggregate over
    * the token array per bit-plane via bit ops. */
  def simHash(textCol: Column): Column = {
    val tokHashes = transform(TextAnalysis.tokens(lower(textCol)), t => xxhash64(t))
    val n = size(tokHashes)
    val bits = (0 until 64).map { bit =>
      val ones = size(filter(tokHashes,
        h => shiftright(h, bit).bitwiseAND(lit(1L)) === 1L))
      when(ones * 2 > n, lit(1L) * lit(1L << bit).cast("long")).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
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

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact token-bigram Jaccard for candidate pairs inside a blocking
    * key (e.g. same lang + similar length). Explode distinct shingles,
    * count intersections via a shingle-keyed join — the shuffle key is
    * the shingle, so identical text clusters co-locate. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: Column, n: Int = 2,
                        minJaccard: Double = 0.0): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), blockCol.as("block"),
        explode(array_distinct(TextAnalysis.tokenNgrams(lower(col(textCol)), n)))
          .as("shingle"))
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
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
