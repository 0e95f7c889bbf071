package graft.model

import org.apache.spark.sql.types._

/** The OSDB data model: Event ⊃ Datapoints, re-expressed as Spark types.
  *
  * Reference shape: documentation/Data_Structure.md:61-114 (event fields),
  * :97-113 (datapoint fields); relational rendering
  * curator_tools/makeOsdDb_refactor/src/osdb_sqlite.py:160-220. Every
  * field is nullable — the reference documents that any key may be absent
  * (Data_Structure.md:114).
  *
  * Arrays stay arrays (`rawData` 125 doubles, `rawData3D` 375 interleaved,
  * `simpleSpec` 10 bins) — the flattened 500-column CSV of
  * nnTraining2/flattenData.py:104-146 is a *projection* emitted on demand,
  * never the storage layout (SURVEY.md §1.3).
  */
object Osdb {

  /** One 5-second sensor window (25 Hz ⇒ 125 magnitude samples). */
  case class Datapoint(
      eventId: Option[String],
      dataTime: Option[String],       // string on the wire; multi-format legacy
      hr: Option[Double],             // bpm; -1/null = missing sentinel
      o2Sat: Option[Double],          // %; -1 = sensor error sentinel
      alarmState: Option[Long],       // 0 OK / 1 WARN / 2 ALARM / 3 FALL / 5 MANUAL
      specPower: Option[Double],
      roiPower: Option[Double],
      roiRatio: Option[Double],
      simpleSpec: Option[Seq[Double]], // 10 x 1 Hz power bins 0-10 Hz
      rawData: Option[Seq[Double]],    // 125 accel-magnitude samples, milli-g
      rawData3D: Option[Seq[Double]],  // 375 interleaved x,y,z samples
      dataJSON: Option[String])        // legacy double-encoded payload

  case class Event(
      id: Option[String],             // string-coerced (osdDbConnection.py:273)
      userId: Option[String],
      dataTime: Option[String],
      typeStr: Option[String],        // "type": Seizure / False Alarm / ...
      subType: Option[String],
      desc: Option[String],
      dataSourceName: Option[String],
      osdAlarmState: Option[Long],
      alarmState: Option[Long],
      sampleFreq: Option[Double],     // 25 Hz
      alarmFreqMin: Option[Double],
      alarmFreqMax: Option[Double],
      alarmThresh: Option[Double],
      alarmRatioThresh: Option[Double],
      hrAlarmActive: Option[Boolean],
      hrThreshMin: Option[Double],
      hrThreshMax: Option[Double],
      o2SatThreshMin: Option[Double],
      seizureTimes: Option[Seq[Double]], // [startSec, endSec] curated
      has3dData: Option[Boolean],
      hasHrData: Option[Boolean],
      hasO2SatData: Option[Boolean],
      dataJSON: Option[String],
      datapoints: Option[Seq[Datapoint]])

  val datapointSchema: StructType = StructType(Seq(
    StructField("eventId", StringType),
    StructField("dataTime", StringType),
    StructField("hr", DoubleType),
    StructField("o2Sat", DoubleType),
    StructField("alarmState", LongType),
    StructField("specPower", DoubleType),
    StructField("roiPower", DoubleType),
    StructField("roiRatio", DoubleType),
    StructField("simpleSpec", ArrayType(DoubleType)),
    StructField("rawData", ArrayType(DoubleType)),
    StructField("rawData3D", ArrayType(DoubleType)),
    StructField("dataJSON", StringType)))

  val eventSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("userId", StringType),
    StructField("dataTime", StringType),
    StructField("type", StringType),
    StructField("subType", StringType),
    StructField("desc", StringType),
    StructField("dataSourceName", StringType),
    StructField("osdAlarmState", LongType),
    StructField("alarmState", LongType),
    StructField("sampleFreq", DoubleType),
    StructField("alarmFreqMin", DoubleType),
    StructField("alarmFreqMax", DoubleType),
    StructField("alarmThresh", DoubleType),
    StructField("alarmRatioThresh", DoubleType),
    StructField("hrAlarmActive", BooleanType),
    StructField("hrThreshMin", DoubleType),
    StructField("hrThreshMax", DoubleType),
    StructField("o2SatThreshMin", DoubleType),
    StructField("seizureTimes", ArrayType(DoubleType)),
    StructField("has3dData", BooleanType),
    StructField("hasHrData", BooleanType),
    StructField("hasO2SatData", BooleanType),
    StructField("dataJSON", StringType),
    StructField("datapoints", ArrayType(datapointSchema))))

  /** Sensor constants (Data_Structure.md:78,110-112). */
  val SampleFreqHz = 25
  val SamplesPerDatapoint = 125   // 5 s windows
  val Samples3D = 375             // 125 x interleaved (x,y,z)
  val SimpleSpecBins = 10
  val DatapointPeriodSec = 5.0

  /** Alarm states (Data_Structure.md:74). */
  val AlarmOk = 0L
  val AlarmWarn = 1L
  val AlarmFull = 2L
  val AlarmFall = 3L
  val AlarmManual = 5L
}
