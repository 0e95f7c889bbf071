package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** S5: device connection — score datapoints through a RUNNING
  * OpenSeizureDetector app instance (libosd/osdAppConnection.py,
  * testRunner/deviceAlg.py:14-26), re-expressed Spark-first.
  *
  * The reference drives ONE device from the driver process, row by row.
  * Here the device protocol is packaged as an [[SdAlg]] — exactly the
  * reference's own shape (`DeviceAlg(sdAlg.SdAlg)`) — so it plugs into
  * [[Replay.replayBatch]] unchanged: one fresh device session per EVENT
  * GROUP on whatever executor owns it, events replayed concurrently
  * across the cluster against a device farm instead of serially against
  * one phone. Protocol per datapoint (deviceAlg.py:56-85): POST the
  * data packet; if the app answers "sendSettings", send the settings
  * packet and re-POST (no sample dropped); GET the verdict, re-sending
  * settings up to 3 times if the app keeps asking; an unusable reply
  * degrades to `{"valid":false,"alarmState":0}` — never a task failure.
  *
  * Transports: [[HttpDeviceClient]] is the real wire client (the app's
  * `POST /data` + `GET /data` endpoints, basic-auth like the
  * reference); [[LoopbackDeviceClient]] is an in-JVM device SIMULATOR
  * that runs the engine's own algorithm behind the SAME wire protocol
  * (packet parse included), which keeps the full round trip — serialize,
  * handshake, score, verdict parse — testable and oracled in an
  * egress-free environment.
  */
trait DeviceClient extends java.io.Closeable {
  /** POST a packet (data or settings); returns the raw response text. */
  def sendData(json: String): String
  /** GET the latest analysis result (JSON text, or a settings request). */
  def getResult(): String
  override def close(): Unit = ()
}

/** Real device transport: the app's web interface. Default port 8080 is
  * appended when the address has none (osdAppConnection.py:34-40).
  * Unexercised live in the egress-free test environment; everything
  * above the socket is covered through the loopback simulator. */
final class HttpDeviceClient(addr: String, user: String = "",
                             passwd: String = "", timeoutMs: Int = 10000)
  extends DeviceClient {
  private val baseUrl = {
    // default port 8080 (the reference's osdAppConnection default) must
    // land after the HOST, not after a trailing slash or path —
    // "1.2.3.4/" naively appended would build "http://1.2.3.4/:8080"
    val a = if (addr.contains("://")) addr else s"http://$addr"
    val u = java.net.URI.create(a)
    require(u.getHost != null, s"unparseable device address '$addr'")
    val port = if (u.getPort != -1) u.getPort else 8080
    val path = Option(u.getPath).getOrElse("").stripSuffix("/")
    s"${u.getScheme}://${u.getHost}:$port$path"
  }
  private[graft] def url: String = baseUrl
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
  private def request(post: Option[String]): String = {
    val b = java.net.http.HttpRequest.newBuilder(
      java.net.URI.create(s"$baseUrl/data"))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
    if (user.nonEmpty) {
      val tok = java.util.Base64.getEncoder
        .encodeToString(s"$user:$passwd".getBytes("UTF-8"))
      b.header("Authorization", s"Basic $tok")
    }
    post.fold(b.GET())(body =>
      b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)))
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"device $baseUrl/data -> HTTP ${resp.statusCode()}")
    resp.body()
  }
  override def sendData(json: String): String = request(Some(json))
  override def getResult(): String = request(None)
}

/** In-JVM device: the engine's own algorithm behind the wire protocol.
  * Replies "sendSettings" to the FIRST data POST (the GarminSD
  * handshake the reference works around), refuses further data until
  * settings arrive, then parses each packet back to a [[ReplayDp]] and
  * serves the latest verdict on GET — a full protocol round trip, not a
  * shortcut into the algorithm. */
final class LoopbackDeviceClient(alg: SdAlg) extends DeviceClient {
  private val mapper = new ObjectMapper()
  private var haveSettings = false
  private var lastResult: Option[AlgResult] = None

  override def sendData(json: String): String = {
    val node = mapper.readTree(json)
    val dataType = Option(node.get("dataType")).map(_.asText).getOrElse("")
    if (dataType == "settings") { haveSettings = true; "OK" }
    else if (!haveSettings) "sendSettings"
    else {
      def arr(f: String): Array[Double] = Option(node.get(f)) match {
        case Some(a) if a.isArray =>
          Array.tabulate(a.size())(i => a.get(i).asDouble)
        case _ => Array.empty[Double]
      }
      val dp = ReplayDp(
        eventId = Option(node.get("eventId")).map(_.asText).getOrElse(""),
        tsSec = Option(node.get("tsSec")).map(_.asLong).getOrElse(0L),
        hr = Option(node.get("hr")).map(_.asDouble).getOrElse(-1.0),
        alarmStateRecorded =
          Option(node.get("alarmState")).map(_.asLong).getOrElse(0L),
        rawData = arr("rawData"),
        rawData3D = arr("rawData3D"),
        seq = Option(node.get("seq")).map(_.asLong).getOrElse(0L))
      lastResult = Some(alg.processDp(dp))
      "OK"
    }
  }

  override def getResult(): String = lastResult match {
    case None => "sendSettings" // nothing scored yet: app still waiting
    case Some(r) =>
      val o = mapper.createObjectNode()
      o.put("valid", true)
      o.put("alarmState", r.alarmState)
      o.put("alarmCount", r.alarmCount)
      o.put("specPower", r.specPower)
      o.put("roiPower", r.roiPower)
      o.put("specRatio", r.specRatio)
      o.toString
  }
}

/** The device-backed algorithm: serializes each datapoint to the wire
  * packet, runs the settings handshake, and parses the verdict back to
  * an [[AlgResult]] — drop-in for any `Replay` path. Per-event state
  * lives on the DEVICE (a fresh client per event group gives the
  * reference's independent-events semantics); snapshot/restore report
  * the last seen verdict, which is all a physical device exposes. */
final class DeviceAlg(mkClient: () => DeviceClient,
                      algName: Option[String] = None) extends SdAlg {
  private val mapper = new ObjectMapper()
  private var client: DeviceClient = _
  private var last: AlgResult = AlgResult(0, 0.0, 0.0, 0.0, 0.0)

  // config-injected like every farm entry (testRunner.py:136) — the
  // shipped testConfig_devices runs SIX DeviceAlg entries whose stats
  // are only tellable apart by their entry names
  override def name: String = algName.getOrElse("DeviceAlg")

  private def settingsJson: String = {
    // deviceAlg.py getSettingsJson: fixed GarminSD-compatible packet
    val o = mapper.createObjectNode()
    o.put("dataType", "settings")
    o.put("analysisPeriod", 5)
    o.put("sampleFreq", 25)
    o.put("sdName", "graft.DeviceAlg")
    o.toString
  }

  private def dpJson(dp: ReplayDp): String = {
    val o: ObjectNode = mapper.createObjectNode()
    o.put("dataType", "raw")
    o.put("eventId", dp.eventId)
    o.put("tsSec", dp.tsSec)
    o.put("hr", dp.hr)
    o.put("alarmState", dp.alarmStateRecorded)
    o.put("seq", dp.seq)
    def put(f: String, a: Array[Double]): Unit = {
      val arr = o.putArray(f); a.foreach(arr.add)
    }
    put("rawData", dp.rawData)
    put("rawData3D", dp.rawData3D)
    o.toString
  }

  private def isSettingsRequest(resp: String): Boolean =
    resp != null && Set("sendsettings", "settings")(resp.trim.toLowerCase)

  override def processDp(dp: ReplayDp): AlgResult = {
    if (client == null) client = mkClient()
    val packet = dpJson(dp)
    val resp = client.sendData(packet)
    if (isSettingsRequest(resp)) {       // handshake: settings + re-send,
      client.sendData(settingsJson)      // no sample dropped
      client.sendData(packet)
    }
    var verdict: String = null
    var attempts = 0
    while (attempts < 3) {
      verdict = client.getResult()
      if (isSettingsRequest(verdict)) { client.sendData(settingsJson); attempts += 1 }
      else attempts = 3
    }
    last =
      if (verdict == null || isSettingsRequest(verdict))
        AlgResult(0, 0.0, 0.0, 0.0, 0.0) // the reference's invalid fallback
      else {
        try {
          val n = mapper.readTree(verdict)
          AlgResult(
            Option(n.get("alarmState")).map(_.asInt).getOrElse(0),
            Option(n.get("alarmCount")).map(_.asDouble).getOrElse(0.0),
            Option(n.get("specPower")).map(_.asDouble).getOrElse(0.0),
            Option(n.get("roiPower")).map(_.asDouble).getOrElse(0.0),
            Option(n.get("specRatio")).map(_.asDouble).getOrElse(0.0))
        } catch { case _: com.fasterxml.jackson.core.JacksonException =>
          AlgResult(0, 0.0, 0.0, 0.0, 0.0)
        }
      }
    last
  }

  override def reset(): Unit = {
    if (client != null) { client.close(); client = null }
    last = AlgResult(0, 0.0, 0.0, 0.0, 0.0)
  }

  override def snapshot: (Int, Double, Seq[Double]) =
    (last.alarmState, last.alarmCount, Seq.empty)

  /** A physical device cannot be rewound; restore is best-effort (the
    * reference's testRunner is batch-only, where each event starts a
    * fresh session and restore is never needed). */
  override def restore(alarmState: Int, alarmCount: Double,
                       hist: Seq[Double]): Unit = ()
}
