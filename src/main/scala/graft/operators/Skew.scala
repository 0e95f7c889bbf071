package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * At 100 TB a handful of hot keys (one prolific user, one default
  * device id) can pin a shuffle partition to a single task. Three tiers,
  * in preference order:
  *
  *   1. broadcast the small side — no shuffle at all (J1 pattern);
  *   2. AQE skew-join (`spark.sql.adaptive.skewJoin`, on by default) —
  *      splits oversized sort-merge partitions at runtime;
  *   3. [[saltedJoin]] below — for the residual case: a shuffle join
  *      whose build side is too big to broadcast while single keys still
  *      overflow AQE's split granularity (AQE splits partitions, not
  *      keys: ONE key's rows always hash to one partition without
  *      salting).
  *
  * The fact side gets a deterministic per-row salt in [0, k); the build
  * side is replicated k ways (explode of a k-element sequence — a
  * generator, costing k*|build| rows, which is why `salt` should stay
  * small and the build side lean). Join on (key, salt) spreads each hot
  * key over k partitions. Semantics are exactly the plain equi-join's —
  * pinned by the OperatorsSpec equivalence test.
  */
object Skew {

  /** Inner equi-join of `fact` and `build` on `key`, salted `salt` ways.
    * Row-deterministic: the salt is a hash of the whole fact row (via
    * its monotonically-increasing position would break determinism under
    * repartitioning, so we hash the fact columns themselves). Edge case:
    * bit-identical DUPLICATE fact rows hash to the same salt, so a
    * corpus of literal copies of one hot-key row still lands on one
    * partition — dedup (or add a discriminating column) before salting
    * if that shape is possible in the input. */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(!fact.columns.contains("__salt") && !build.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename the input column")
    val factCols = fact.columns
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factCols.map(col): _*), lit(salt.toLong)))
    val replicated = build
      .withColumn("__salt", explode(expr(s"sequence(0L, ${salt - 1}L)")))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
