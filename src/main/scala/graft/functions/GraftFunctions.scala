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

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("osd_spec_power",
      (a: Seq[Double]) => Signal.specPower(a.toArray))
    spark.udf.register("osd_roi_power",
      (a: Seq[Double]) => Signal.roiPower(a.toArray))
    spark.udf.register("osd_spectrum_ratio",
      (a: Seq[Double]) => Signal.spectrumRatio(a.toArray))
    spark.udf.register("osd_alarm_state",
      (a: Seq[Double]) => Signal.alarmState(a.toArray))
    spark.udf.register("osd_mean_line_length",
      (a: Seq[Double]) => Signal.meanLineLength(a.toArray))
    spark.udf.register("osd_zero_crossings",
      (a: Seq[Double]) => Signal.zeroCrossingRate(a.toArray))
    spark.udf.register("osd_magnitude3d",
      (xyz: Seq[Double], mode: String) =>
        Signal.magnitude3D(xyz.toArray, mode).toSeq)
    spark.udf.register("osd_deinterleave",
      (xyz: Seq[Double], axis: Int) =>
        Signal.deinterleave(xyz.toArray, axis).toSeq)
    spark.udf.register("osd_znormalize",
      (a: Seq[Double]) => Signal.zNormalize(a.toArray).toSeq)
    spark.udf.register("osd_std_pct",
      (a: Seq[Double]) => graft.operators.Spectrogram.stdPct(a.toArray))
    // the native codegen expression rides along
    graft.plans.GraftExpressions.register(spark)
  }
}
