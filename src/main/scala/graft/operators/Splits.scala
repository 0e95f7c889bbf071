package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M1/M2: deterministic dataset splitting (SURVEY §2.10, §7.4.5).
  *
  * The reference uses sklearn's seeded shufflers
  * (osdDbConnection.py:614-634, splitData.py:122-241); bitwise parity
  * with a driver-side RNG is impossible in a distributed engine, so the
  * engine-native contract is salted hashing: membership is a pure
  * function of (id, seed) — stable under repartitioning, re-runs, and
  * cluster size, and stratification holds because the hash is uniform
  * within every stratum. Invariant tests (fold sizes, disjointness,
  * determinism) replace bitwise golden values.
  */
object Splits {

  private def bucket(idCol: Column, seed: Long, m: Int): Column =
    pmod(xxhash64(idCol.cast("string"), lit(seed)), lit(m.toLong))

  /** Train/test split by key: trainFrac of each stratum lands in train. */
  def hashSplit(df: DataFrame, idCol: String, trainFrac: Double,
                seed: Long = 42L): DataFrame =
    df.withColumn("split",
      when(bucket(col(idCol), seed, 1000000) < (trainFrac * 1000000).toLong,
        "train").otherwise("test"))

  /** K-fold assignment: adds a `fold` column in [0, k). */
  def kFold(df: DataFrame, idCol: String, k: Int, seed: Long = 42L): DataFrame =
    df.withColumn("fold", bucket(col(idCol), seed, k))

  /** Nested k-fold (splitData.py nested mode): outer fold for test,
    * inner fold within the remaining data for validation. */
  def nestedKFold(df: DataFrame, idCol: String, kOuter: Int, kInner: Int,
                  seed: Long = 42L): DataFrame =
    df.withColumn("outerFold", bucket(col(idCol), seed, kOuter))
      .withColumn("innerFold", bucket(col(idCol), seed + 1, kInner))

  /** J3: materialize one fold's train/test split via semi joins on the
    * fold table — the reference's per-fold CSV emission shape. */
  def foldSlice(df: DataFrame, foldCol: String, testFold: Int): (DataFrame, DataFrame) =
    (df.filter(col(foldCol) =!= testFold), df.filter(col(foldCol) === testFold))

  /** EXACTLY-k-per-stratum deterministic sample: the k rows with the
    * smallest `(hash, tie)` in each stratum (all rows when a stratum has
    * fewer than k). Fraction splits ([[hashSplit]]) give binomial
    * per-stratum counts; a curation budget ("10 000 docs per source,
    * exactly, reproducibly") needs the order statistic itself.
    *
    * Two-phase distributed selection, NOT a per-stratum sort: the naive
    * form (`row_number` over every stratum, filter ≤ k — the shape the
    * DuckDB oracle states) shuffles and sorts the ENTIRE table to keep
    * k rows per stratum. Here phase 1 histograms each stratum over
    * `buckets` equal hash ranges (a map-side-collapsing count whose
    * exchange is ≤ strata·buckets rows regardless of input size) and a
    * tiny window over that histogram finds, per stratum, the BOUNDARY
    * bucket holding the k-th smallest hash plus the rows-before count.
    * Phase 2 keeps every row in buckets strictly below the boundary
    * outright (a broadcast-joined filter — no shuffle, no sort) and
    * sorts ONLY the boundary bucket's rows (~n_s/buckets of each
    * stratum) to rank the remainder. Exact by construction at any
    * scale: bucket order is the hash's own high-bit order, so
    * bucket-below ∪ first-(k−before)-of-boundary IS the bottom-k set.
    *
    * The histogram rides one small exchange and the boundary sort one
    * small exchange; the base table is scanned (not shuffled) twice —
    * the 100 TB trade this operator exists for. `hash`/`tie` must be a
    * deterministic total order ((hash, tie) pairs unique per stratum);
    * `hashMax` bounds the hash's domain (exclusive).
    */
  def stratifiedExactK(df: DataFrame, stratumCol: String, hash: Column,
                       tie: Column, k: Int, hashMax: Long = 1L << 32,
                       buckets: Int = 4096): DataFrame = {
    require(k > 0 && buckets > 0 && hashMax >= buckets,
      "need k > 0 and 0 < buckets <= hashMax")
    require(hashMax <= (1L << 53),
      "hashMax beyond 2^53: the bucket division would lose integer precision")
    val reserved = Seq("__sk_h", "__sk_b", "__sk_bstar", "__sk_need", "__sk_rn")
    require(df.columns.intersect(reserved).isEmpty,
      s"column names $reserved are reserved by stratifiedExactK")
    val width = hashMax / buckets // >= 1 by the require above
    val hb = df.withColumn("__sk_h", hash)
      .withColumn("__sk_b", (col("__sk_h") / lit(width)).cast("long"))

    // Phase 1: per-(stratum, bucket) counts, then the boundary bucket —
    // the first whose cumulative count reaches k. Strata smaller than k
    // produce no boundary row and fall through to keep-all.
    val wcum = Window.partitionBy(stratumCol).orderBy(col("__sk_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = hb.groupBy(col(stratumCol), col("__sk_b")).count()
      .withColumn("__sk_before", coalesce(sum(col("count")).over(wcum), lit(0L)))
      .filter(col("__sk_before") < k && col("__sk_before") + col("count") >= k)
      .select(col(stratumCol), col("__sk_b").as("__sk_bstar"),
        (lit(k.toLong) - col("__sk_before")).as("__sk_need"))

    // Phase 2: below-boundary rows pass with NO shuffle; only the
    // boundary bucket's rows pay a (per-stratum, tiny) sort.
    val joined = hb.join(broadcast(boundary), Seq(stratumCol), "left")
    val below = joined.filter(
      col("__sk_bstar").isNull || col("__sk_b") < col("__sk_bstar"))
    val wrank = Window.partitionBy(stratumCol).orderBy(col("__sk_h"), tie)
    val atBoundary = joined.filter(col("__sk_b") === col("__sk_bstar"))
      .withColumn("__sk_rn", row_number().over(wrank))
      .filter(col("__sk_rn") <= col("__sk_need"))
      .drop("__sk_rn")
    below.unionByName(atBoundary)
      .drop("__sk_h", "__sk_b", "__sk_bstar", "__sk_need")
  }
}
