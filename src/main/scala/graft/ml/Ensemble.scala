package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-fold ensemble prediction — the reference's tunable-sensitivity
  * combiner (`user_tools/nnTraining2/ensemblePredictor.py:28-67`,
  * Spahr et al. 2025 methodology): the k per-fold models all score the
  * same events, and the ensemble probability per event is the
  * HARRELL-DAVIS QUANTILE of the k scores — a weighted average of
  * order statistics whose weights are regularized-incomplete-beta mass
  * slices. Tuning the quantile q trades sensitivity against false
  * alarms without retraining anything.
  *
  * Spark-first shape: n (the model count) is a small COMPILE-TIME
  * constant, so the beta weights are computed ONCE on the driver
  * (commons-math3, already on Spark's classpath) and the per-event
  * combine is pure built-in column work — `sort_array` + a weighted
  * sum over `element_at` — fully inside whole-stage codegen, no UDF,
  * no shuffle beyond the one groupBy that gathers each event's k
  * scores. At 100 TB the ensemble pass is one exchange keyed by
  * eventId; the beta math never touches an executor.
  *
  * The ml5 oracle gates the combine cross-engine: the driver-computed
  * weights are embedded as shortest-round-trip literals in BOTH plans
  * (one source of truth), so sort + dot product is the same IEEE
  * expression tree in Spark and DuckDB. */
object Ensemble {

  /** Harrell-Davis weights for n order statistics at quantile q:
    * w_i = I_{(i+1)/n}(a, b) − I_{i/n}(a, b) with a = (n+1)q,
    * b = (n+1)(1−q) — the Beta(a, b) probability mass falling on the
    * i-th order statistic's rank interval. Sums to 1 by construction
    * (the CDF telescopes). */
  def hdWeights(n: Int, q: Double): Array[Double] = {
    require(n > 0, "need at least one model")
    require(q > 0.0 && q < 1.0, s"quantile must be in (0,1): $q")
    val a = (n + 1) * q
    val b = (n + 1) * (1 - q)
    Array.tabulate(n) { i =>
      val lower =
        if (i == 0) 0.0
        else org.apache.commons.math3.special.Beta
          .regularizedBeta(i.toDouble / n, a, b)
      val upper = org.apache.commons.math3.special.Beta
        .regularizedBeta((i + 1).toDouble / n, a, b)
      upper - lower
    }
  }

  /** The Harrell-Davis combine as a codegen'd column over an
    * `array<double>` of exactly n scores: sort ascending, then the
    * weighted sum Σ w_i · s_(i) (i ascending — the cross-engine
    * accumulation order). A wrong-sized array fails LOUDLY (a missing
    * fold model must not silently shift every weight). */
  def harrellDavisCol(scores: Column, n: Int, q: Double): Column = {
    val w = hdWeights(n, q)
    val s = sort_array(scores)
    val combined = (1 until n).foldLeft(
      lit(w(0)) * element_at(s, 1)) { (acc, i) =>
      acc + lit(w(i)) * element_at(s, i + 1)
    }
    when(size(scores) === n, combined)
      .otherwise(raise_error(concat(
        lit(s"harrellDavis: expected $n model scores, got "),
        coalesce(size(scores).cast("string"), lit("NULL")))).cast("double"))
  }

  /** The reference's comparison baseline (`simple_quantile`): numpy's
    * linear-interpolation quantile, as the same sort + fixed-index
    * blend — pos = (n−1)q, v = s_(lo)·(1−frac) + s_(lo+1)·frac. */
  def simpleQuantileCol(scores: Column, n: Int, q: Double): Column = {
    require(n > 0)
    val pos = (n - 1) * q
    val lo = math.floor(pos).toInt
    val frac = pos - lo
    val s = sort_array(scores)
    val v =
      if (frac == 0.0 || lo + 1 >= n) element_at(s, lo + 1) * lit(1.0)
      else element_at(s, lo + 1) * lit(1 - frac) +
        element_at(s, lo + 2) * lit(frac)
    when(size(scores) === n, v)
      .otherwise(raise_error(concat(
        lit(s"simpleQuantile: expected $n model scores, got "),
        coalesce(size(scores).cast("string"), lit("NULL")))).cast("double"))
  }

  /** Score `data` with every fold model and combine per event: one
    * union of k codegen'd scoring passes (no model ever leaves the
    * driver — weights travel inside each plan), one groupBy(eventId)
    * to gather the k scores, then the Harrell-Davis column. Returns
    * (eventId, label, n_models, p_ensemble).
    *
    * CONTRACT: `score` must return exactly ONE row per eventId
    * (eventId, label, p_seizure) — a per-epoch scorer must roll up to
    * the event first (the A4 max reduction). The size guard inside
    * [[harrellDavisCol]] enforces it: k models × one row each, so a
    * per-epoch leak, a missing model, or a duplicated score all fail
    * loudly at the combine instead of silently shifting weights. */
  def scoreEnsemble[M](models: Seq[M],
                       score: (M, DataFrame) => DataFrame,
                       data: DataFrame,
                       q: Double = 0.6): DataFrame = {
    require(models.nonEmpty, "ensemble of zero models")
    val scored = models.map(m =>
        score(m, data).select(col("eventId"), col("label"),
          col("p_seizure")))
      .reduce(_ unionByName _)
    scored
      .groupBy(col("eventId"))
      .agg(first(col("label")).as("label"),
        collect_list(col("p_seizure")).as("scores"))
      .select(col("eventId"), col("label"),
        size(col("scores")).as("n_models"),
        harrellDavisCol(col("scores"), models.size, q).as("p_ensemble"))
  }

  /** The SINGLE-SCAN fast path for COLUMN-EXPRESSIBLE model families
    * (CNN/LSTM/logistic — anything whose probability is a pure Column
    * over the row, [[Cnn.logitCol]]-style). [[scoreEnsemble]]'s generic
    * `(M, DataFrame) => DataFrame` seam forces k full corpus scans (k
    * per-model passes unioned, then the gather exchange); here all k
    * probabilities are emitted in ONE projection over ONE scan of
    * `data`, the per-event/per-model rollup (the A4 max reduction —
    * folded in, so callers pass per-EPOCH rows directly) happens in the
    * single eventId exchange, and the Harrell-Davis combine reads the
    * k per-model maxima. At 100 TB with k=5 this is 1/5 the scan IO of
    * the generic path; PlanSpec pins the one-scan shape.
    *
    * `pCol(m)` must be the model's probability as a Column over `data`'s
    * columns (e.g. `sigmoid(Cnn.logitCol(m, col("window")))`). Output
    * schema matches [[scoreEnsemble]]: (eventId, label, n_models,
    * p_ensemble); label rolls up by MAX (identical to `first` when the
    * input is one row per event, the A4 convention per-epoch). */
  def scoreEnsembleFused[M](models: Seq[M],
                            pCol: M => Column,
                            data: DataFrame,
                            q: Double = 0.6): DataFrame = {
    require(models.nonEmpty, "ensemble of zero models")
    val k = models.size
    val perModelMax = models.zipWithIndex.map { case (m, i) =>
      max(pCol(m)).as(s"__p$i")
    }
    // Fail-loud parity with the generic path: scoreEnsemble's
    // collect_list DROPS a null probability and harrellDavisCol's size
    // guard then fires; here max() ignores nulls too, so an all-null
    // model column would otherwise slide a NULL element into a
    // size-k array and p_ensemble would silently go NULL.
    def pOrRaise(i: Int): Column =
      coalesce(col(s"__p$i"), raise_error(concat(
        lit(s"ensemble model $i produced no score for event "),
        coalesce(col("eventId").cast("string"), lit("NULL")))).cast("double"))
    data
      .groupBy(col("eventId"))
      .agg(max(col("label")).as("label"), perModelMax: _*)
      .select(col("eventId"), col("label"),
        lit(k).as("n_models"),
        harrellDavisCol(array((0 until k).map(pOrRaise): _*),
          k, q).as("p_ensemble"))
  }
}
