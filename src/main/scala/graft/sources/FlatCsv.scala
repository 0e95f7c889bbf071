package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Osdb
import graft.operators.Flatten
import graft.operators.Flatten.FlatDp

/** S3: the flattened wide-CSV interchange format, both directions.
  *
  * The reference *loads* this layout back into events
  * (testRunner/io_utils.py:308 loadCsvFile; nnTraining2/io_utils.py:11-39
  * streams it per contiguous event); the writer is
  * nnTraining2/flattenData.py:104-146. Columns: metadata, then M000..M124
  * magnitude, then X/Y/Z000..124 de-interleaved axes.
  *
  * Spark-first shape: the CSV is an exchange surface only — `read`
  * reassembles the arrays immediately so everything downstream works on
  * the array layout. Reading is splittable (plain CSV): at 100 TB each
  * task parses its own split; the only shuffle is the window that
  * restores within-event sample order for equal timestamps.
  */
object FlatCsv {

  private val metaFields: Seq[StructField] = Seq(
    StructField("eventId", StringType), StructField("userId", StringType),
    StructField("typeStr", StringType), StructField("type", IntegerType),
    StructField("tsSec", LongType), StructField("osdAlarmState", LongType),
    StructField("osdSpecPower", DoubleType), StructField("osdRoiPower", DoubleType),
    StructField("hr", DoubleType), StructField("o2sat", DoubleType))

  /** Explicit schema — never infer on a 100 TB read (inference = an extra
    * full scan). */
  val schema: StructType = {
    val n = Osdb.SamplesPerDatapoint
    StructType(metaFields ++
      (0 until n).map(i => StructField(f"M$i%03d", DoubleType)) ++
      Seq("X", "Y", "Z").flatMap(a =>
        (0 until n).map(i => StructField(f"$a$i%03d", DoubleType))))
  }

  /** Write datapoints as the reference's wide CSV (S10 projection). */
  def write(dps: DataFrame, path: String): Unit =
    Flatten.flattenedWide(dps)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** The reference's loadCsvFile returns EVENTS, not rows
    * (testRunner/io_utils.py:231-308 rebuilds event objects with nested
    * datapoint lists) — reconstruct the nested shape from the flat read:
    * one row per event, datapoints sorted by (tsSec, seq). One shuffle
    * on eventId; at scale this is the standard explode-inverse. */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .groupBy(col("eventId").as("id"), col("userId"), col("typeStr").as("type"),
        col("type").as("typeId"))
      .agg(expr("array_sort(collect_list(struct(tsSec, seq, " +
        "osdAlarmState, osdSpecPower, osdRoiPower, hr, o2sat, rawData, " +
        "rawData3D)))").as("datapoints"))

  /** Read the wide CSV back into [[FlatDp]] rows. `seq` is re-derived as
    * the within-event time order (the CSV does not carry a source index;
    * rows for an event are contiguous and time-ordered per
    * io_utils.py:13-17, so this reproduces it). */
  def read(spark: SparkSession, path: String): Dataset[FlatDp] = {
    import spark.implicits._
    val n = Osdb.SamplesPerDatapoint
    val raw = spark.read.option("header", "true").schema(schema).csv(path)
    val mArr = array((0 until n).map(i => col(f"M$i%03d")): _*)
    val xyzArr = array((0 until n).flatMap(i =>
      Seq(col(f"X$i%03d"), col(f"Y$i%03d"), col(f"Z$i%03d"))): _*)
    // tsSec alone can tie (the exact case seq exists to break for the
    // FSM), and row_number over a tied order is nondeterministic across
    // runs — a whole-row hash makes the derived order stable; true
    // duplicate rows still tie, harmlessly (identical dps commute)
    val w = Window.partitionBy("eventId")
      .orderBy(col("tsSec"), xxhash64(schema.fieldNames.map(col): _*))
    raw
      // absent accel/3D data round-trips as an EMPTY array, not 125/375
      // nulls; the writer emits cells all-or-none per row, so one probe
      // column decides (an isNull reduce over every cell would nest the
      // plan thousands deep and blow the analyzer stack). Without the
      // M000 probe, an hr-only datapoint would decode null elements into
      // FlatDp's primitive Array[Double] and crash the Dataset encoder.
      .withColumn("rawData",
        when(col("M000").isNull, array().cast("array<double>"))
          .otherwise(mArr))
      .withColumn("rawData3D",
        when(col("X000").isNull, array().cast("array<double>"))
          .otherwise(xyzArr))
      .withColumn("synthetic", lit(false))
      .withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .select("eventId", "userId", "typeStr", "type", "tsSec", "osdAlarmState",
        "osdSpecPower", "osdRoiPower", "hr", "o2sat", "rawData", "rawData3D",
        "synthetic", "seq")
      .as[FlatDp]
  }
}
