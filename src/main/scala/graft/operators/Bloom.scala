package graft.operators

import graft.plans.GraftExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filtered semi join — the manual form of Spark's runtime
  * row-level filtering (`InjectRuntimeFilter`), built from the same two
  * Catalyst pieces (`BloomFilterAggregate` / `BloomFilterMightContain`)
  * so a caller controls WHEN the filter is built and WHERE it is
  * applied instead of relying on the optimizer's size thresholds.
  *
  * The 100 TB shape this exists for: `large ⋉ small` where `small`'s
  * keyset is too big to broadcast as a hash relation but its BLOOM
  * fingerprint (1 MB for ~1 M keys at ~1% fpp) ships everywhere for
  * free. The filter build is one distributed pass (executor-side
  * partial Blooms, merged by bitwise OR — merge order can't change the
  * result); the application side probes the CONSTANT filter inside
  * whole-stage codegen before the join's exchange, so the shuffle
  * carries only rows that might match instead of the full fact table.
  * False positives are then removed by a real semi join over the
  * already-pruned input — results are EXACT for any fpp; the fpp only
  * moves how much shuffle the prefilter saves.
  *
  * Both sides key through `xxhash64` (the runtime-filter convention):
  * it normalizes any key type to a long, and build/probe use the same
  * hash so there are no false NEGATIVES by construction.
  *
  * Driver materialization note: the built filter is a single binary
  * value held by the driver and folded into the probe predicate — the
  * same arrangement as Spark's own runtime filter (whose subquery
  * result also lands on the driver before re-broadcast), bounded by
  * `numBits/8` bytes regardless of data volume.
  *
  * Reference trigger: the curation pipeline's id-list filtering
  * (reference `osdbUtils.py` include/exclude id sets) at corpus scale,
  * where the id list is itself a table, not a literal.
  */
object Bloom {

  /** One-pass distributed Bloom build over `df`'s key column; returns
    * the serialized filter, or null when `df` is empty (the aggregate's
    * empty-input convention). `expectedItems`/`numBits` size the filter:
    * ~8 bits/key ≈ 2% fpp, ~10 bits/key ≈ 1%. */
  def buildKeyFilter(df: DataFrame, keyCol: String,
                     expectedItems: Long, numBits: Long): Array[Byte] =
    df.select(GraftExpressions
        .bloomAgg(xxhash64(col(keyCol)), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Membership probe for a filter built by [[buildKeyFilter]] — apply
    * to the LARGE side before its shuffle. */
  def mightContainKey(bloom: Array[Byte], key: Column): Column =
    GraftExpressions.bloomMightContain(bloom, xxhash64(key))

  /** Exact semi join with a Bloom prefilter on the large side.
    *
    * Plan shape (pinned in PlanSpec): `might_contain` runs as a Filter
    * directly over the large scan (inside whole-stage codegen, before
    * the exchange); the LeftSemi join then sees only surviving rows.
    * NOTE: builds the filter EAGERLY (one aggregation job over `small`)
    * at call time, like `Similarity.ivfKnn`'s training step. */
  def bloomSemiJoin(large: DataFrame, largeKey: String,
                    small: DataFrame, smallKey: String,
                    expectedItems: Long = 1000000L,
                    numBits: Long = 8388608L): DataFrame = {
    val bf = buildKeyFilter(small, smallKey, expectedItems, numBits)
    if (bf == null) {
      // empty build side: semi join result is empty by definition
      large.limit(0)
    } else {
      large.filter(mightContainKey(bf, col(largeKey)))
        .join(keySet(small, smallKey), col(largeKey) === col(BloomKey), "left_semi")
    }
  }

  /** Exact anti join with a Bloom SHORT-CIRCUIT on the large side — the
    * incremental-ingest shape: "which of today's rows are NOT already in
    * the corpus?" at 100 TB, where `small` is the corpus fingerprint set
    * and `large` is the new batch.
    *
    * The trick is the Bloom's one-sided error: `might_contain = false`
    * PROVES absence (no false negatives), so rows failing the probe are
    * emitted directly — no join, no shuffle, just a codegen'd scan
    * filter. Only the `might_contain = true` sliver (true matches +
    * fpp·N false positives) pays the exact LeftAnti join. With
    * mostly-new data — the common ingest case — the join input shrinks
    * from the whole batch to roughly the overlap, and the result is
    * exact for any fpp. */
  def bloomAntiJoin(large: DataFrame, largeKey: String,
                    small: DataFrame, smallKey: String,
                    expectedItems: Long = 1000000L,
                    numBits: Long = 8388608L): DataFrame = {
    val bf = buildKeyFilter(small, smallKey, expectedItems, numBits)
    if (bf == null) {
      // empty corpus: everything in the batch is new
      large
    } else {
      val probe = mightContainKey(bf, col(largeKey))
      val definitelyNew = large.filter(!probe)
      val needsCheck = large.filter(probe)
        .join(keySet(small, smallKey), col(largeKey) === col(BloomKey), "left_anti")
      definitelyNew.unionByName(needsCheck)
    }
  }

  /** Distinct build-side keyset under a reserved name, so same-named
    * keys on both sides can't make the join condition ambiguous. */
  private val BloomKey = "__bloom_key"
  private def keySet(small: DataFrame, smallKey: String): DataFrame =
    small.select(col(smallKey).as(BloomKey)).distinct()
}
