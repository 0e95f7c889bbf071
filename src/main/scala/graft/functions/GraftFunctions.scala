package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-facing registration of the domain function library, so
  * `spark.sql` users get the same surface as the Scala API:
  *
  *   SELECT osd_spec_power(rawData), osd_roi_power(rawData) FROM dps
  *
  * One call per session (or wire [[graft.plans.GraftExtensions]] for the
  * native-expression tier fleet-wide). These are plain Scala UDFs —
  * acceptable here because each call is one tight loop over one array,
  * not a per-element lambda; the per-row boundary cost is what the
  * native `array_dot` expression avoids for the hot similarity kernels.
  */
object GraftFunctions {

  // NULL arrays (hr-only datapoints after tidy) must yield NULL, not
  // NPE: Spark only auto-null-handles primitive-typed UDF args, so
  // Seq-typed kernels get an explicit Option guard
  private def nullSafe(f: Array[Double] => Double): Seq[Double] => Option[Double] =
    a => Option(a).map(x => f(x.toArray))

  private def nullSafeArr(f: Array[Double] => Array[Double]): Seq[Double] => Seq[Double] =
    a => if (a == null) null else f(a.toArray).toSeq

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("osd_spec_power", nullSafe(Signal.specPower(_)))
    spark.udf.register("osd_roi_power", nullSafe(Signal.roiPower(_)))
    spark.udf.register("osd_spectrum_ratio", nullSafe(Signal.spectrumRatio(_)))
    spark.udf.register("osd_alarm_state",
      (a: Seq[Double]) => Option(a).map(x => Signal.alarmState(x.toArray)))
    spark.udf.register("osd_mean_line_length", nullSafe(Signal.meanLineLength))
    spark.udf.register("osd_zero_crossings", nullSafe(Signal.zeroCrossingRate))
    spark.udf.register("osd_magnitude3d",
      (xyz: Seq[Double], mode: String) =>
        if (xyz == null) null
        else Signal.magnitude3D(xyz.toArray, Option(mode).getOrElse("V2")).toSeq)
    spark.udf.register("osd_deinterleave",
      (xyz: Seq[Double], axis: Int) =>
        if (xyz == null) null else Signal.deinterleave(xyz.toArray, axis).toSeq)
    spark.udf.register("osd_znormalize", nullSafeArr(Signal.zNormalize))
    spark.udf.register("osd_std_pct",
      nullSafe(graft.operators.Spectrogram.stdPct))
    // the native codegen expression rides along
    graft.plans.GraftExpressions.register(spark)
  }
}
