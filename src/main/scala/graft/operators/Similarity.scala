package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Baseline: brute-force cosine top-k with a broadcast
  * query side. Scale path: random-hyperplane LSH bucketing so the join
  * shuffles on compact bucket signatures instead of forming n^2 pairs.
  */
object Similarity {

  /** Dot product of two double arrays — zip_with + left-fold aggregate,
    * fully codegen'd, deterministic evaluation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k for every vector against the corpus.
    * The corpus side is broadcast when it fits (the common "query a
    * reference set" shape); ranking is total via the (score desc, id)
    * tiebreak. At 100 TB the corpus side is the broadcast dimension and
    * the big side streams — no shuffle of the big side at all. */
  def bruteForceKnn(vectors: DataFrame, idCol: String, vecCol: String,
                    k: Int, broadcastCorpus: Boolean = true): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val corpus = base.select(col("id").as("nid"), col("v").as("nv"))
    val joined = base.crossJoin(if (broadcastCorpus) broadcast(corpus) else corpus)
      .filter(col("id") =!= col("nid"))
      .select(col("id"), col("nid"), cosine(col("v"), col("nv")).as("score"))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id").as("vec_id"), col("rank"), col("nid").as("neighbor_id"),
        col("score"))
  }

  /** Random-hyperplane signature: `bits` sign bits of dot(v, r_i) with
    * deterministic pseudo-random hyperplanes derived from (seed, i, dim).
    * Vectors with equal signatures land in one bucket. */
  def hyperplaneSignature(vecCol: Column, dim: Int, bits: Int = 12,
                          seed: Long = 42L): Column = {
    val planes = (0 until bits).map { i =>
      val rng = new scala.util.Random(seed ^ (i.toLong << 32))
      val plane = Array.fill(dim)(rng.nextGaussian())
      val d = (0 until dim).map(j =>
        element_at(vecCol, j + 1).cast("double") * lit(plane(j))).reduce(_ + _)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    planes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: signature buckets -> within-bucket brute force ->
    * per-query top-k. `tables` independent signatures raise recall (a
    * neighbor is found if it collides in ANY table). The shuffle key is
    * (table, bucket) — at 1000x the data this stays a bucket-local
    * problem while bruteForceKnn's pair count grows quadratically. */
  def lshKnn(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
             k: Int, bits: Int = 12, tables: Int = 4, seed: Long = 42L): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val tabled = base.withColumn("tb", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          hyperplaneSignature(col("v"), dim, bits, seed + t * 7919L).as("sig"))): _*)))
      .select(col("id"), col("v"), col("tb.t").as("t"), col("tb.sig").as("sig"))
    val pairs = tabled.as("a").join(tabled.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
        col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nid"),
        col("a.v").as("v"), col("b.v").as("nv"))
      .distinct()
      .select(col("id"), col("nid"), cosine(col("v"), col("nv")).as("score"))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id").as("vec_id"), col("rank"), col("nid").as("neighbor_id"),
        col("score"))
  }

  /** Embedding-cosine near-duplicate pairs: symmetric pairs above a
    * cosine threshold (id_a < id_b), brute-force or via lshKnn upstream. */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                         minCosine: Double): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    base.as("a").crossJoin(broadcast(base.as("b")))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= minCosine)
  }
}
