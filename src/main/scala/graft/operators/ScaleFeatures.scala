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
      // empty input / all-null column: agg yields null — treat as a
      // constant column (scales to 0), same as the hi == lo branch
      def num(field: String): Option[Double] =
        Option(row.getAs[Any](field)).map(_.asInstanceOf[Number].doubleValue)
      val scaled = (num(s"__min_$c"), num(s"__max_$c")) match {
        case (Some(lo), Some(hi)) if hi != lo => (col(c) - lit(lo)) / lit(hi - lo)
        case _                                => lit(0.0)
      }
      acc.withColumn(c + suffix, scaled)
    }
  }
}
