package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
