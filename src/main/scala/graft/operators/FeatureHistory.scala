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
    var out = df
    for (f <- featureCols) {
      for (k <- 0 until n) {
        val c = if (k == 0) col(f) else lag(col(f), k).over(w)
        out = out.withColumn(s"${f}_t-$k", c)
      }
      out = out.withColumn(s"${f}_mean",
        (0 until n).map(k => col(s"${f}_t-$k")).reduce(_ + _) / n)
    }
    // rows with incomplete history have a null deepest lag
    val deepest = featureCols.map(f => col(s"${f}_t-${n - 1}").isNotNull)
    if (deepest.isEmpty) out else out.filter(deepest.reduce(_ && _))
  }
}
