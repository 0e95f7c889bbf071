package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W7: lag/feature-history columns (nnTraining2/addFeatureHistory.py:21-39).
  *
  * For each feature f and history length n: emit `f_t-0 .. f_t-(n-1)`
  * and `f_mean` (mean of the n values), dropping rows without full
  * history — the reference drops the first n-1 rows of each event.
  *
  * Pure analytic-window implementation: one shuffle on the partition key,
  * all lags computed in a single window pass over each partition.
  */
object FeatureHistory {

  def addHistory(df: DataFrame, featureCols: Seq[String], n: Int,
                 partitionCol: String = "eventId",
                 orderCols: Seq[String] = Seq("tsSec", "startSample")): DataFrame = {
    require(n >= 1)
    val w = Window.partitionBy(partitionCol).orderBy(orderCols.map(col): _*)
    // ONE projection, not a withColumn-per-column loop: the full P12
    // basis is 144 features × (n lags + mean) derived columns, and the
    // loop form nests one Project per column — O(cols²) analyzer work
    // that stalls plan building long before execution. The mean restates
    // the lag expressions instead of referencing the generated names;
    // they canonicalize equal, so the physical Window computes each lag
    // once either way.
    def lagOf(f: String, k: Int): org.apache.spark.sql.Column =
      if (k == 0) col(f) else lag(col(f), k).over(w)
    val derived = featureCols.flatMap { f =>
      (0 until n).map(k => lagOf(f, k).as(s"${f}_t-$k")) :+
        ((0 until n).map(k => lagOf(f, k)).reduce(_ + _) / n).as(s"${f}_mean")
    }
    val out = df.select(df.columns.map(col) ++ derived: _*)
    // rows with incomplete history have a null deepest lag
    val deepest = featureCols.map(f => col(s"${f}_t-${n - 1}").isNotNull)
    if (deepest.isEmpty) out else out.filter(deepest.reduce(_ && _))
  }

  /** Per-key exponential moving average — the RECURSIVE window class
    * (state_i = f(state_{i−1}, x_i)) that frame-based windows cannot
    * express without O(n²) frame re-evaluation. One shuffle on the key,
    * then a per-group ordered linear fold (sort_array + higher-order
    * aggregate) — the same per-key-fold shape as the w10 FSM replay, so
    * at 100 TB it scales with the largest single key, not the table.
    * Seed is the group's first value, folded over elements 2..n.
    *
    * Cross-engine exactness holds when `alpha` (and 1−alpha) are exact
    * binary fractions (1/2, 1/4, 1/8, …): the fold is then the identical
    * IEEE multiply-add sequence on any engine replaying it in the same
    * order (Exact.scala rules). CONTRACT: `orderCols` must totally order
    * the rows within each key (end in a unique column, the repo-wide
    * window rule) — the struct sort incidentally breaks remaining ties
    * by value, but an oracle ordering only by orderCols would not, so
    * non-unique orderings give engine-dependent folds. Inputs must be
    * non-null. Returns keyCols + (n, ema). */
  def ema(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
          valueCol: String, alpha: Double): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty)
    require(alpha > 0.0 && alpha <= 1.0,
      s"ema: alpha must be in (0, 1], got $alpha")
    val seq = sort_array(collect_list(
      struct((orderCols :+ valueCol).map(col): _*)))
    df.groupBy(keyCols.map(col): _*)
      .agg(seq.as("seq"))
      .select(keyCols.map(col) ++ Seq(
        // long, not size()'s int: every other per-key count in the
        // registry is 64-bit (COUNT(*) oracles, st8's stream twin), and
        // a width-sensitive driver hash would flag int32 vs int64
        size(col("seq")).cast("long").as("n"),
        aggregate(
          expr("slice(seq, 2, size(seq) - 1)"),
          element_at(col("seq"), 1).getField(valueCol),
          (acc, x) => acc * lit(1.0 - alpha) +
            x.getField(valueCol) * lit(alpha)).as("ema")): _*)
  }
}
