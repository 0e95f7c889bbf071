package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C16: min-max feature scaling (nnTraining2/scaleFeatures.py:5-36).
  *
  * Two passes, both distributed: one tiny agg row of per-column min/max
  * (broadcast implicitly as literals), then a pure map — the reference
  * holds the whole feature matrix in memory, this streams it. Constant
  * columns scale to 0 (the sklearn MinMaxScaler convention the
  * reference relies on).
  */
object ScaleFeatures {

  def minMaxScale(df: DataFrame, cols: Seq[String],
                  suffix: String = "_scaled"): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.foldLeft(df) { (acc, c) =>
      val lo = row.getAs[Any](s"__min_$c") match { case n: Number => n.doubleValue }
      val hi = row.getAs[Any](s"__max_$c") match { case n: Number => n.doubleValue }
      val scaled =
        if (hi == lo) lit(0.0)
        else (col(c) - lit(lo)) / lit(hi - lo)
      acc.withColumn(c + suffix, scaled)
    }
  }
}
