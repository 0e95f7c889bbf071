package graft.ml

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD

/** Deterministic replacement for `treeAggregate`/`reduce` over training
  * partials. Spark's `reduce` (and `treeAggregate`'s final level) folds
  * task results in COMPLETION order, and double addition is commutative
  * but not associative — so two runs of the identical training job can
  * produce models differing in final ulps. That made the "deterministic:
  * seeded init" claim quietly false, and it breaks the M13 gate that
  * all-1.0 weights reproduce the unweighted model BIT-exactly
  * (CnnSpec/LstmSpec pin that identity).
  *
  * Here partials combine in PARTITION-INDEX order through a fixed
  * two-level tree: groups of `fanout` partition partials fold
  * index-ascending on executors (one shuffle of P tiny records — each a
  * (loss, gradient) pair, O(nP) doubles), then the G = ceil(P/fanout)
  * group partials fold group-ascending on the driver. Driver traffic per
  * call is G·nP doubles — a few MB per LBFGS iteration even at 10⁵
  * partitions with the CNN/LSTM parameter counts, same order as
  * `treeAggregate`'s own final level. The group fold runs where the data
  * is; only the already-reduced group partials cross to the driver —
  * this is control-plane aggregation, not a data collect. */
object DetAgg {

  /** Fold per-partition partials in strict partition-index order.
    * `perPartition` must emit AT MOST one `(partitionIndex, partial)`
    * record per partition (empty partitions may emit none). `add` may
    * mutate and return its left argument (the accumulator is always a
    * fresh `zero`). */
  def ordered[T: ClassTag](perPartition: RDD[(Int, T)], fanout: Int = 64)(
      zero: => T)(add: (T, T) => T): T = {
    val groups = perPartition
      .map { case (i, v) => (i / fanout, (i, v)) }
      .groupByKey()
      .mapValues(it => it.toArray.sortBy(_._1).map(_._2).foldLeft(zero)(add))
      .collect().sortBy(_._1)
    groups.map(_._2).foldLeft(zero)(add)
  }

  /** The (loss, gradient) shape both model families aggregate: one
    * partial per partition, summed index-ascending. */
  def lossGrad(perPartition: RDD[(Int, (Double, Array[Double]))],
               nP: Int): (Double, Array[Double]) =
    ordered(perPartition)((0.0, new Array[Double](nP))) { (a, b) =>
      val g = a._2
      var i = 0
      while (i < nP) { g(i) += b._2(i); i += 1 }
      (a._1 + b._1, g)
    }

  /** The pre-training stats pass every gradient family shares
    * ([[Cnn.train]]/[[Lstm.train]]/[[LstmStack.train]]/[[ConvPipe.train]]):
    * per partition, (Σx, Σx², sample count, window length, Σweight),
    * combined in partition-index order. A partition emits its partial
    * whenever it saw ANY row — keying the skip on the SAMPLE count
    * would silently drop the weights of a partition holding only
    * zero-length windows and hide its length-0 from the ragged check;
    * here such a partition emits len = 0, which collides loudly with
    * every real window length at the combine. */
  def windowStats(ds: RDD[(Double, Double, Array[Double])])
      : (Double, Double, Long, Int, Double) =
    ordered(
      ds.mapPartitionsWithIndex { case (pi, it) =>
        var s = 0.0; var s2 = 0.0; var c = 0L; var len = -1; var ws = 0.0
        var rows = 0L
        it.foreach { case (_, wt, x) =>
          require(len == -1 || len == x.length,
            s"ragged windows: $len vs ${x.length}")
          len = x.length
          x.foreach { v => s += v; s2 += v * v }
          c += x.length
          ws += wt
          rows += 1
        }
        if (rows == 0L) Iterator.empty
        else Iterator.single((pi, (s, s2, c, len, ws)))
      })((0.0, 0.0, 0L, -1, 0.0)) { (a, b) =>
      require(a._4 == -1 || b._4 == -1 || a._4 == b._4,
        s"ragged windows: ${a._4} vs ${b._4}")
      (a._1 + b._1, a._2 + b._2, a._3 + b._3, math.max(a._4, b._4),
        a._5 + b._5)
    }
}
