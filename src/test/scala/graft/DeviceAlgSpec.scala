package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming._

/** S5 device connection: the wire protocol round trip (packet
  * serialize → handshake → score → verdict parse) against the loopback
  * device, pinned equal to driving the inner algorithm directly.
  */
class DeviceAlgSpec extends AnyFunSuite {

  private def dp(id: String, t: Long, hr: Double, seq: Long,
                 recorded: Long = 0L): ReplayDp =
    ReplayDp(id, t, hr, recorded, Array.empty, Array.empty, seq)

  private val feed: Seq[ReplayDp] =
    (0 until 12).map(i => dp("e1", 1000L + i * 5, if (i >= 3 && i < 8) 160.0 else 80.0, i))

  test("device verdicts equal the inner algorithm's, datapoint for datapoint") {
    val direct = AlgRegistry.create("hr:MODE_SIMPLE")
    val device = AlgRegistry.create("device:loopback:hr:MODE_SIMPLE")
    val (a, b) = feed.map(d => (direct.processDp(d), device.processDp(d))).unzip
    assert(a == b, "wire round trip changed a verdict")
    assert(b.map(_.alarmState).distinct.size > 1,
      "fixture too tame: FSM never left state 0, parity check is vacuous")
  }

  test("the sendSettings handshake re-sends the first datapoint (no sample dropped)") {
    // count what the device actually SCORED: a dropped first sample would
    // shift every subsequent FSM step
    var scored = 0
    val counting = new SdAlg {
      val inner = AlgRegistry.create("hr:MODE_SIMPLE")
      def processDp(d: ReplayDp): AlgResult = { scored += 1; inner.processDp(d) }
      def reset(): Unit = inner.reset()
      def name: String = inner.name
      def snapshot: (Int, Double, Seq[Double]) = inner.snapshot
      def restore(s: Int, c: Double, h: Seq[Double]): Unit = inner.restore(s, c, h)
    }
    val device = new DeviceAlg(() => new LoopbackDeviceClient(counting))
    feed.foreach(device.processDp)
    assert(scored == feed.length,
      s"device scored $scored of ${feed.length} samples across the handshake")
  }

  test("a fresh session resets device state (per-event-group semantics)") {
    val device = AlgRegistry.create("device:loopback:hr:MODE_SIMPLE")
    feed.foreach(device.processDp)
    device.reset()
    // after reset the next sample starts from FSM state 0 again
    val r = device.processDp(dp("e2", 5000L, 160.0, 0))
    assert(r.alarmState == 0, s"state leaked across sessions: $r")
  }

  test("http transport resolves addresses like the reference (default port 8080)") {
    // construction only — no egress in this environment; the default
    // port lands after the HOST even with a trailing slash or path
    assert(new HttpDeviceClient("192.168.1.29").url == "http://192.168.1.29:8080")
    assert(new HttpDeviceClient("192.168.1.29/").url == "http://192.168.1.29:8080")
    assert(new HttpDeviceClient("localhost:8081").url == "http://localhost:8081")
    assert(new HttpDeviceClient("http://dev.example:9000/").url
      == "http://dev.example:9000")
    assert(new HttpDeviceClient("dev.example/api/").url
      == "http://dev.example:8080/api")
    val unreachable = new HttpDeviceClient("127.0.0.1:1", timeoutMs = 200)
    intercept[Exception](unreachable.sendData("{}"))
  }
}
