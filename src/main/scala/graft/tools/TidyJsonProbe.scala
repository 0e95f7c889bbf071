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
  * `runMain graft.tools.TidyJsonProbe [nEvents] [dpsPerEvent] [reps]`
  * (defaults 20000, 10, 3).
  */
object TidyJsonProbe {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toInt).getOrElse(20000)
    val nDp = args.lift(1).map(_.toInt).getOrElse(10)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
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
    val df = spark.range(nEvents.toLong)
      .select(col("id").cast("string").as("id"),
        expr(s"""transform(sequence(1, $nDp), i -> named_struct(
          |  'eventId', cast(id as string),
          |  'dataTime', cast(null as string),
          |  'hr', cast(null as double),
          |  'o2Sat', cast(null as double),
          |  'alarmState', cast(null as bigint),
          |  'specPower', cast(null as double),
          |  'roiPower', cast(null as double),
          |  'roiRatio', cast(null as double),
          |  'simpleSpec', cast(null as array<double>),
          |  'rawData', cast(null as array<double>),
          |  'rawData3D', cast(null as array<double>),
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
