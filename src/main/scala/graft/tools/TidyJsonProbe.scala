package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures [[graft.operators.Tidy.tidyDatapoints]] on a corpus whose
  * datapoints carry REAL double-encoded dataJSON payloads — the legacy
  * shape the fixture never exercises (fixture dataJSON is null, so
  * `from_json` short-circuits and the registry benches cannot see the
  * expansion cost). Each datapoint's named_struct references the outer
  * parse ~8 times and the inner parse ~6 times; Catalyst does not CSE
  * across a `transform` lambda's fields, so the parse count per dp is
  * what this probe exposes.
  *
  * `runMain graft.tools.TidyJsonProbe [nEvents] [dpsPerEvent] [reps]
  * [populated]` (defaults 20000, 10, 3; any 4th arg switches to the
  * RE-TIDY shape — first-class fields populated, dataJSON still
  * attached — which must pay ZERO parses, like the per-field coalesce
  * form's short-circuit).
  */
object TidyJsonProbe {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toInt).getOrElse(20000)
    val nDp = args.lift(1).map(_.toInt).getOrElse(10)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val populated = args.length > 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // double-encoded payload: outer dataJSON wraps an inner dataJSON
    // string carrying HR + a 125-sample data array (dpTools.py shape)
    val inner = (0 until 125).mkString(
      """{\\\"HR\\\": 72.5, \\\"o2Sat\\\": 97.0, \\\"alarmState\\\": 1, \\\"data\\\": [""",
      ",", "]}")
    val outer = s"""{\\"dataTime\\": \\"2023-04-30T00:00:00Z\\", \\"dataJSON\\": \\"$inner\\"}"""
    // populated mode: the re-tidy shape — every first-class field
    // already carries a value, dataJSON still attached
    val dt = if (populated) "'2023-04-30T00:00:00Z'" else "cast(null as string)"
    val d = if (populated) "cast(1.0 as double)" else "cast(null as double)"
    val l = if (populated) "cast(1 as bigint)" else "cast(null as bigint)"
    val arr =
      if (populated) "array(cast(1.0 as double))" else "cast(null as array<double>)"
    val df = spark.range(nEvents.toLong)
      .select(col("id").cast("string").as("id"),
        expr(s"""transform(sequence(1, $nDp), i -> named_struct(
          |  'eventId', cast(id as string),
          |  'dataTime', $dt,
          |  'hr', $d,
          |  'o2Sat', $d,
          |  'alarmState', $l,
          |  'specPower', $d,
          |  'roiPower', $d,
          |  'roiRatio', $d,
          |  'simpleSpec', $arr,
          |  'rawData', $arr,
          |  'rawData3D', $arr,
          |  'dataJSON', "$outer"))""".stripMargin).as("datapoints"))
      .persist()
    df.count()

    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.operators.Tidy.tidyDatapoints(df)
        .select(expr("aggregate(datapoints, 0D, (a, dp) -> a + " +
          "coalesce(dp.hr, 0D) + coalesce(size(dp.rawData), 0))").as("s"))
        .agg(sum(col("s"))).head()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[tidyjson] rep$r $t%.2f s  ($nEvents ev x $nDp dp)  checksum=$n")
    }
    spark.stop()
  }
}
