package graft.operators

import org.apache.spark.sql.Dataset

/** The shared core of the repo's TWO-PHASE DISTRIBUTED RANK — the
  * replacement for `Window.orderBy(...)`'s single sorted task (the
  * round-10 audit's scale-killer class): range-repartition + local
  * sort, ONE bounded O(partitions × groups) driver collect of
  * per-partition weight subtotals, broadcastable prefix offsets, then
  * a per-partition local cumsum at the call site.
  *
  * Call sites (kept in lockstep through this one implementation):
  *   - `Summarise.shardAssign` — index-page sharding; weight 1 per row,
  *     group = category;
  *   - `Trainer.auroc` — Mann-Whitney rank; weight = tie-group row
  *     count, one global group.
  *
  * Determinism contract: `ranged` must be PERSISTED by the caller —
  * the subtotal job here and the caller's cumsum job must see the
  * identical partition contents/order, which the cache guarantees and
  * a recomputed lineage only probabilistically provides. */
object TwoPhaseRank {

  /** Per-(partition, group) prefix offsets (total weight in earlier
    * partitions of the same group) and per-group totals. */
  def prefixOffsets[T](ranged: Dataset[T], groupOf: T => String,
                       weightOf: T => Long)
      : (Map[(Int, String), Long], Map[String, Long]) = {
    val counts: Array[((Int, String), Long)] = ranged.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { r =>
          val g = groupOf(r)
          m.update(g, m.getOrElse(g, 0L) + weightOf(r))
        }
        m.iterator.map { case (g, n) => ((pid, g), n) }
      }.collect()
    val totals = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val offsets: Map[(Int, String), Long] =
      counts.sortBy(_._1._1).map { case ((pid, g), n) =>
        val off = totals.getOrElse(g, 0L)
        totals.update(g, off + n)
        ((pid, g), off)
      }.toMap
    (offsets, totals.toMap)
  }
}
