package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.TimeParse
import graft.operators.Tidy
import graft.sources.OsdbJson

class TidySourcesSpec extends SparkSpec {

  /** Build an OSDB-shaped category JSON file (array-of-events, like
    * tests/testData/testAllData.json: ramp rawData, day-first times). */
  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("osdb").toFile
    val ramp = (0 until 130).mkString("[", ",", "]") // 130 -> must truncate to 125
    val dpJson = """{\"dataJSON\": \"{\\\"HR\\\": 75.0, \\\"data\\\": [1,2,3]}\"}"""
    val events = (1 to 4).map { i =>
      val alarm = if (i == 1) 2 else if (i == 2) 1 else 0
      s"""{
         |"id": $i, "userId": "u$i", "dataTime": "09-05-2022 02:37:2$i",
         |"type": ${if (i % 2 == 0) "\"False Alarm\"" else "\"Seizure\""},
         |"subType": "Tonic-Clonic", "desc": "fixture event $i",
         |"dataSourceName": "phone",
         |"datapoints": [
         |  {"eventId": "$i", "dataTime": "09-05-2022 02:37:2$i", "hr": 75,
         |   "alarmState": $alarm, "rawData": $ramp},
         |  {"eventId": "$i", "dataTime": "09-05-2022 02:37:3$i",
         |   "alarmState": 0, "dataJSON": "$dpJson"}
         |]}""".stripMargin
    }
    val f = new java.io.File(dir, "tcSeizures.json")
    Files.writeString(f.toPath, events.mkString("[", ",", "]"))
    f.getAbsolutePath
  }

  test("S1 read + tidy: schema'd multiLine read, truncation, derived fields") {
    val path = writeFixture()
    val df = OsdbJson.readEvents(spark, Seq(path)).cache()
    assert(df.count() == 4)
    // category from file name
    assert(df.select("category").distinct().collect().map(_.getString(0)).toSeq
      == Seq("tcSeizures"))
    // C8: 130-element ramp truncated to 125
    val sizes = df.select(expr("transform(datapoints, dp -> size(dp.rawData))"))
      .collect().map(_.getSeq[Int](0))
    assert(sizes.forall(_.head == 125))
    // A2 worst state: event 1 has an ALARM dp, event 2 a WARN dp
    val states = df.select("id", "osdAlarmState").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(states("1") == 2L && states("2") == 1L && states("3") == 0L)
    // A3 flags: every dp has hr but one per event is -1 => 1/2 => flag true
    val hrFlags = df.select("id", "hasHrData").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(hrFlags.values.forall(_ == true))
    assert(df.select("has3dData").collect().forall(!_.getBoolean(0)))
    // C9: nested dataJSON expansion recovered HR and data for the 2nd dp
    val dp2 = df.filter(col("id") === "1")
      .select(expr("datapoints[1].hr"), expr("size(datapoints[1].rawData)"))
      .head()
    assert(dp2.getDouble(0) == 75.0 && dp2.getInt(1) == 3)
  }

  test("A3 flags are reference-exact: hr 0 and all-zero 3D traces do not count") {
    // tidy_db.py:120-146: a datapoint counts toward hasHrData only when
    // hr > 0 (0 = sensor off, not merely 'present'), toward hasO2SatData
    // only when o2Sat > 0, and toward has3dData only when the 3D trace
    // sums non-zero (abs(sum3d) > 0)
    val dir = Files.createTempDirectory("osdb").toFile
    val zeros375 = Seq.fill(375)(0).mkString("[", ",", "]")
    val live375 = (1 to 375).mkString("[", ",", "]")
    val events =
      s"""[
         |{"id": 1, "userId": "u1", "type": "Seizure",
         | "datapoints": [
         |   {"eventId": "1", "hr": 0, "o2Sat": 0, "rawData3D": $zeros375},
         |   {"eventId": "1", "hr": 0, "o2Sat": 0, "rawData3D": $zeros375}]},
         |{"id": 2, "userId": "u2", "type": "Seizure",
         | "datapoints": [
         |   {"eventId": "2", "hr": 72, "o2Sat": 97, "rawData3D": $live375},
         |   {"eventId": "2", "hr": 68, "o2Sat": 98, "rawData3D": $live375}]}
         |]""".stripMargin
    val f = new java.io.File(dir, "flags.json")
    Files.writeString(f.toPath, events)
    val flags = OsdbJson.readEvents(spark, Seq(f.getAbsolutePath))
      .select("id", "hasHrData", "hasO2SatData", "has3dData")
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(flags("1") == ((false, false, false)),
      "hr 0 / o2Sat 0 / all-zero 3D are sensor-off, not data")
    assert(flags("2") == ((true, true, true)))
  }

  test("A2 tidy REPLACES a wrong stored event alarm state from the datapoints") {
    // tidy_db.py:235 + 170-198: updateEventAlarmState runs on every
    // event — the stored state is overwritten by the recomputed worst
    // (the pass exists because stored states were wrong for some false
    // alarms); only a datapoint-less event keeps its stored value
    val dir = Files.createTempDirectory("osdb").toFile
    val events =
      """[
        |{"id": 1, "userId": "u1", "type": "False Alarm", "osdAlarmState": 2,
        | "datapoints": [{"eventId": "1", "alarmState": 0},
        |                {"eventId": "1", "alarmState": 0}]},
        |{"id": 2, "userId": "u2", "type": "Seizure", "osdAlarmState": 1,
        | "datapoints": [{"eventId": "2", "alarmState": 3},
        |                {"eventId": "2", "alarmState": 2}]},
        |{"id": 3, "userId": "u3", "type": "Seizure", "osdAlarmState": 2},
        |{"id": 4, "userId": "u4", "type": "Seizure", "osdAlarmState": 2,
        | "datapoints": []}
        |]""".stripMargin
    val f = new java.io.File(dir, "states.json")
    Files.writeString(f.toPath, events)
    val states = OsdbJson.readEvents(spark, Seq(f.getAbsolutePath))
      .select("id", "osdAlarmState").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(states("1") == 0L, "stored ALARM with all-OK dps is corrected to OK")
    assert(states("2") == 3L, "FALL outranks ALARM in the correction ladder")
    assert(states("3") == 2L, "a MISSING datapoints key keeps the stored state")
    assert(states("4") == 0L,
      "an EMPTY datapoints list still runs the correction (all counts 0 -> OK)")
  }

  test("C2 multi-format timestamp parse handles legacy day-first strings") {
    import spark.implicits._
    // one string per structural class of the dispatch ladder (ISO 'T',
    // ISO space, day-first dash/slash, bare date, zone-suffixed) plus
    // the null-returning shapes (garbage, too-short, near-miss ISO)
    val df = Seq("09-05-2022 02:37:25", "2022-05-09T02:37:25",
      "2022-05-09 02:37:25.123", "garbage",
      "09/05/2022 02:37:25", "2022-05-09", "2022-05-09T02:37:25Z",
      "abc", "2022-05-09X02:37:25").toDF("s")
    val parsed = df.select(date_format(TimeParse.parseOsdbTime(col("s")),
      "yyyy-MM-dd HH:mm:ss").as("p")).collect().map(r => Option(r.getString(0)))
    assert(parsed(0).contains("2022-05-09 02:37:25"))
    assert(parsed(1).contains("2022-05-09 02:37:25"))
    assert(parsed(2).contains("2022-05-09 02:37:25"))
    assert(parsed(3).isEmpty)
    assert(parsed(4).contains("2022-05-09 02:37:25"))
    assert(parsed(5).contains("2022-05-09 00:00:00"))
    assert(parsed(6).contains("2022-05-09 02:37:25")) // session tz is UTC
    assert(parsed(7).isEmpty)
    assert(parsed(8).isEmpty)
  }

  test("J1 seizure-times side input joins onto events (S12)") {
    import spark.implicits._
    val path = writeFixture()
    val events = OsdbJson.readEvents(spark, Seq(path))
    val st = Seq(("1", 10.0, 40.0)).toDF("eventId", "startSec", "endSec")
    val joined = Tidy.joinSeizureTimes(events, st)
    val times = joined.filter(col("id") === "1").select("seizureTimes").head()
      .getSeq[Double](0)
    assert(times == Seq(10.0, 40.0))
    assert(joined.filter(col("id") === "2").select("seizureTimes").head().isNullAt(0))
  }

  test("S9 index CSV sink writes ordered fixed columns") {
    val path = writeFixture()
    val df = OsdbJson.readEvents(spark, Seq(path))
    val out = Files.createTempDirectory("idx").toFile.getAbsolutePath + "/index"
    OsdbJson.writeIndexCsv(df, out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 4)
    assert(back.columns.toSeq == OsdbJson.IndexColumns)
  }

  test("S7 Mongo sink: _id + $date on the wire; null date and absent keys survive") {
    import spark.implicits._
    import graft.sources.MongoSink
    val df = Seq(
      ("e1", Some("2022-05-09 02:37:21"), Some("u1"), Some(3L)),
      ("e2", None, None, Some(5L)),              // null date, absent userId
      ("e3", Some("2022-05-09 02:37:23"), Some("u3"), None))
      .toDF("id", "dtStr", "userId", "n")
      .withColumn("dataTime", col("dtStr").cast("timestamp")).drop("dtStr")
    val out = Files.createTempDirectory("mongo").toFile.getAbsolutePath + "/lake"
    MongoSink.writeEventsMongoJson(df, out, idCol = "id",
      dateCols = Seq("dataTime"))
    // the wire really is Extended JSON: _id present, $date wrapper on dates,
    // null fields omitted (Mongo's absent-key convention)
    val lines = spark.read.textFile(out).collect().sorted
    assert(lines.forall(_.contains("\"_id\":")))
    assert(lines.count(_.contains("\"$date\":\"2022-05-09T")) == 2)
    val e2line = lines.find(_.contains("\"_id\":\"e2\"")).get
    assert(!e2line.contains("userId") && !e2line.contains("dataTime"))
    val back = MongoSink.readEventsMongoJson(spark, out, df.schema,
      idCol = "id", dateCols = Seq("dataTime")).cache()
    assert(back.columns.toSeq == df.columns.toSeq)
    assert(back.count() == 3)
    assert(back.filter(col("id") === "e2").head().isNullAt(
      back.columns.indexOf("dataTime")))
    val e1 = back.filter(col("id") === "e1").head()
    assert(e1.getTimestamp(back.columns.indexOf("dataTime")).toString
      .startsWith("2022-05-09 02:37:21"))
    assert(back.filter(col("id") === "e3").head().isNullAt(
      back.columns.indexOf("n")))
  }
}
