package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the clustering
  * primitive behind SemDeDup-style semantic dedup, IVF index training,
  * and corpus domain discovery. Reference analogue: the reference trains
  * per-user classifiers on grouped feature vectors (nnTraining.py); this
  * is the unsupervised grouping step re-expressed for a 100 TB corpus.
  *
  * Exactness design (how a float-vector iterative algorithm can be
  * oracle-gated bit-for-bit across engines):
  *   - vectors are quantized ONCE to integer grid points
  *     (`floor(x * quantScale + 0.5)` — float→double casts, a power-of-two
  *     multiply and a +0.5 both exact in IEEE double, so both engines
  *     land on identical integers);
  *   - seed centroids are the `k` lowest-id vectors (no RNG);
  *   - distances are squared-L2 sums of integer-valued doubles — exact
  *     in any summation order while they fit 2^53, which a 2^10 grid on
  *     unit-scale embeddings leaves ~9 orders of headroom for;
  *   - centroid updates sum integer components exactly (BIGINT) and pay
  *     exactly ONE double division per dimension — deterministic.
  *
  * Scale shape (per iteration):
  *   - assignment is 100% NARROW: the k×dim centroid matrix rides into
  *     the plan as a literal (at k=1024, dim=1024 that is 8 MB — still a
  *     broadcast-sized constant), and each task argmins its own rows;
  *     no join, no shuffle, no pair materialization;
  *   - the update exchange carries partial (cluster, dim, sum, count)
  *     rows — bounded by partitions × k × dim, collapsing to k × dim,
  *     INDEPENDENT of corpus size;
  *   - driver state is the k×dim centroid matrix, nothing else.
  * Each iteration re-scans the source (lineage recomputation); a real
  * 100 TB run would persist the quantized projection once up front —
  * that is a caching decision for the caller, not a shape change.
  *
  * An empty cluster keeps its previous centroid (the seed's vector on
  * iteration 1), mirroring [[Similarity.ivfKnn]]'s rule.
  *
  * Ties (two centroids at equal distance) break to the LOWEST cluster
  * index — `array_position` returns the first match — totally ordered,
  * so the oracle's `ORDER BY dist, c` reproduces it.
  *
  * @return one row per input vector: (`idCol`, cluster INT) after
  *         `iters` assignment rounds.
  */
object KMeans {

  def lloyd(vectors: DataFrame, idCol: String, vecCol: String, k: Int = 0,
            iters: Int = 2, quantScale: Int = 1024): DataFrame = {
    // k = 0 derives ceil(√N) — the measured SemDeDup/IVF balance point
    // (Similarity.sqrtKnob docblock; pipe6's k-both-ways decade probe):
    // one count() job, control plane like the seed TakeOrdered below.
    // ONLY 0 is the derive sentinel — a negative k is a caller bug and
    // must stay loud, not silently cluster with a derived k.
    require(k >= 0, s"k must be >= 1, or 0 to derive ceil(sqrt(N)); got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(quantScale > 0 && (quantScale & (quantScale - 1)) == 0,
      s"quantScale must be a positive power of two (exact double " +
        s"multiply), got $quantScale")

    // Materialize the quantized projection ONCE up front (r20 — the
    // caching decision the docblock above assigned to the caller, now
    // taken here where every consumer needs it): the seed TakeOrdered,
    // each iteration's update aggregate and the final assignment pass
    // all re-executed the corpus scan + quantization.
    val q = graft.Tables.materialize(
      vectors.select(col(idCol),
        transform(col(vecCol),
          x => floor(x.cast("double") * quantScale + lit(0.5d)).cast("long"))
          .as("q")))
    // derived-k count reads the materialized blocks (same N: the
    // projection never filters)
    val kk = if (k >= 1) k else Similarity.sqrtKnob(q.count())

    // Seeds: the k lowest-id vectors (TakeOrdered — k rows to the
    // driver, never a full sort).
    val seedRows = q.orderBy(col(idCol)).limit(kk).collect()
    require(seedRows.length == kk,
      s"corpus has only ${seedRows.length} vectors, need >= $kk seeds")
    var cents: Array[Array[Double]] =
      seedRows.map(_.getSeq[Long](1).map(_.toDouble).toArray)

    var assigned: DataFrame = null
    for (it <- 1 to iters) {
      val centLit: Column =
        array(cents.map(cv => array(cv.map(v => lit(v)): _*)): _*)
      // Squared L2 to every centroid via the codegen ArrayDot on the
      // difference vector — index-order fold, the e1-established
      // cross-engine contract (== DuckDB list_dot_product).
      val dists = transform(centLit, cv =>
        graft.plans.GraftExpressions.arrayDot(
          zip_with(col("q"), cv, (a, b) => a.cast("double") - b),
          zip_with(col("q"), cv, (a, b) => a.cast("double") - b)))
      assigned = q.withColumn("dists", dists)
        .withColumn("cluster",
          (array_position(col("dists"), array_min(col("dists"))) - 1)
            .cast("int"))
        .drop("dists")

      if (it < iters) {
        // Update: exact integer sums per (cluster, dim); the exchange is
        // k*dim-bounded regardless of corpus size (partial agg collapses
        // map-side).
        val upd = assigned
          .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "x")))
          .groupBy("cluster", "pos")
          .agg(sum("x").as("s"), count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.clone())
        upd.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) =
            r.getLong(2).toDouble / r.getLong(3).toDouble
        }
        cents = next
      }
    }
    assigned.select(col(idCol), col("cluster"))
  }
}
