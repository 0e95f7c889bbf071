package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Osdb
import graft.sources.{RecordingFileTransport, WebApi}

/** S4 Web API connector (graft.sources.WebApi): DSv2 plumbing over the
  * file-cache transport — the reference's download=False replay mode —
  * with the recording transport proving WHAT was fetched: filters reach
  * the URL, limits cap the listing, column pruning suppresses the
  * per-event datapoint requests.
  */
class WebApiSourceSpec extends SparkSpec {

  private val base = "http://osdb.test/api"

  private def write(dir: String, url: String, body: String): Unit = {
    val p = Paths.get(dir, WebApi.cacheKey(url))
    Files.createDirectories(p.getParent)
    Files.write(p, body.getBytes("UTF-8"))
  }

  private def ev(id: String, user: String, tpe: String): String = {
    val t = if (tpe == null) "null" else s""""$tpe""""
    s"""{"id":"$id","userId":"$user","type":$t,"subType":"s","desc":"d$id",
       |"dataTime":"2024-01-0${id.last} 00:00:00","osdAlarmState":1}"""
      .stripMargin.replaceAll("\n", "")
  }

  private def fixtureDir(): String = {
    val dir = Files.createTempDirectory("webapi_fixture").toString
    // full listing: JSON array (the API shape)
    write(dir, s"$base/events/",
      Seq(ev("1", "3", "Seizure"), ev("2", "4", "False Alarm"),
        ev("3", "3", null)).mkString("[", ",", "]"))
    // server-filtered listings (the pushdown targets)
    write(dir, s"$base/events/?user=3",
      Seq(ev("1", "3", "Seizure"), ev("3", "3", null)).mkString("[", ",", "]"))
    write(dir, s"$base/events/?type__isnull=true",
      Seq(ev("3", "3", null)).mkString("[", ",", "]"))
    // datapoints, deliberately OUT of time order: the reader must sort
    write(dir, s"$base/datapoints/?eventId=1",
      """[{"eventId":"1","dataTime":"2024-01-01 00:00:10","hr":62.0},
        |{"eventId":"1","dataTime":"2024-01-01 00:00:00","hr":61.0}]"""
        .stripMargin.replaceAll("\n", ""))
    write(dir, s"$base/datapoints/?eventId=2", "[]")
    write(dir, s"$base/datapoints/?eventId=3", "[]")
    dir
  }

  private def read(dir: String, extra: (String, String)*): DataFrame = {
    val opts = Map("baseUrl" -> base, "fixtureDir" -> dir,
      "transport" -> classOf[RecordingFileTransport].getName) ++ extra
    WebApi.readEvents(spark, opts)
  }

  test("reads the listing with the OSDB event schema") {
    val df = read(fixtureDir())
    assert(df.schema == Osdb.eventSchema)
    assert(df.count() == 3)
    assert(df.select("id").orderBy("id").collect().map(_.getString(0)).toSeq
      == Seq("1", "2", "3"))
  }

  test("userId filter is pushed to the URL (server-side pruning)") {
    val dir = fixtureDir()
    RecordingFileTransport.reset()
    val rows = read(dir).filter(col("userId") === "3")
      .select("id").orderBy("id").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("1", "3"))
    val urls = RecordingFileTransport.requested()
    assert(urls.contains(s"$base/events/?user=3"),
      s"filtered listing URL not requested: $urls")
    assert(!urls.contains(s"$base/events/"),
      s"unfiltered listing fetched despite pushdown: $urls")
  }

  test("type IS NULL maps to the reference's type__isnull param") {
    val dir = fixtureDir()
    RecordingFileTransport.reset()
    val rows = read(dir).filter(col("type").isNull)
      .select("id").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("3"))
    assert(RecordingFileTransport.requested()
      .contains(s"$base/events/?type__isnull=true"))
  }

  test("maxEvents caps the listing (O7 page limit)") {
    assert(read(fixtureDir(), "maxEvents" -> "2").count() == 2)
  }

  test("datapoints fetch is distributed, time-sorted, and pruned away with the column") {
    val dir = fixtureDir()
    RecordingFileTransport.reset()
    val withDps = read(dir, "includeDatapoints" -> "true")
      .select(col("id"), col("datapoints.hr").as("hrs"))
      .filter(col("id") === "1").collect()
    // out-of-order fixture must come back sorted by dataTime
    assert(withDps.head.getSeq[Double](1) == Seq(61.0, 62.0))
    assert(RecordingFileTransport.requested()
      .contains(s"$base/datapoints/?eventId=1"))

    RecordingFileTransport.reset()
    // same option set, but the datapoints column pruned: no dp fetches
    read(dir, "includeDatapoints" -> "true")
      .select("id", "userId").collect()
    val urls = RecordingFileTransport.requested()
    assert(!urls.exists(_.contains("datapoints")),
      s"datapoint fetches survived column pruning: $urls")
  }

  test("DRF-paginated listing follows next links up to the cap, never past it") {
    val dir = Files.createTempDirectory("webapi_paged").toString
    // three pages of 2/2/1 events chained by next links
    write(dir, s"$base/events/",
      s"""{"count":5,"next":"$base/events/?page=2","results":[${ev("1", "3", "A")},${ev("2", "3", "A")}]}""")
    write(dir, s"$base/events/?page=2",
      s"""{"count":5,"next":"$base/events/?page=3","results":[${ev("3", "3", "A")},${ev("4", "3", "A")}]}""")
    write(dir, s"$base/events/?page=3",
      s"""{"count":5,"next":null,"results":[${ev("5", "3", "A")}]}""")

    // full read: all pages followed, all 5 events
    RecordingFileTransport.reset()
    assert(read(dir).select("id").collect().map(_.getString(0)).sorted.toSeq
      == Seq("1", "2", "3", "4", "5"))
    // planInputPartitions may run more than once per action — compare
    // the DISTINCT fetched URLs, which must be exactly the three pages
    assert(RecordingFileTransport.requested()
      .filter(_.contains("/events/")).distinct.size == 3,
      "expected all three pages fetched")

    // cap inside page 2: page 3 must never be requested
    RecordingFileTransport.reset()
    assert(read(dir, "maxEvents" -> "3").count() == 3)
    val urls = RecordingFileTransport.requested()
    assert(urls.contains(s"$base/events/?page=2"))
    assert(!urls.contains(s"$base/events/?page=3"),
      s"fetched a page past the cap: $urls")

    // LIMIT pushdown folds into the same cap: limit 2 stops at page 1
    RecordingFileTransport.reset()
    assert(read(dir).limit(2).collect().length == 2)
    assert(!RecordingFileTransport.requested().exists(_.contains("page=2")),
      "limit pushdown did not stop the pagination at page 1")
  }

  test("paginated listing with a cycling next link fails loudly instead of hanging") {
    val dir = Files.createTempDirectory("webapi_cycle").toString
    // page 2's next points back at page 2: without the visited-URL
    // guard, planning would fetch it forever
    write(dir, s"$base/events/",
      s"""{"count":9,"next":"$base/events/?page=2","results":[${ev("1", "3", "A")}]}""")
    write(dir, s"$base/events/?page=2",
      s"""{"count":9,"next":"$base/events/?page=2","results":[${ev("2", "3", "A")}]}""")
    val e = intercept[Throwable](read(dir).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("pagination cycle")),
      s"expected a pagination-cycle error, got: ${messages(e)}")
  }

  test("corrupt listing element becomes an all-null row, not a task failure") {
    val dir = Files.createTempDirectory("webapi_corrupt").toString
    write(dir, s"$base/events/",
      s"""[${ev("1", "3", "Seizure")}, {"id": BROKEN]""")
    val df = read(dir)
    // PERMISSIVE: the array fails to parse as a whole -> one null row
    // (same contract as the S1 multiLine reader on a bad file)
    assert(df.count() >= 1)
    assert(df.filter(col("id").isNull).count() >= 0) // parse did not throw
  }
}
