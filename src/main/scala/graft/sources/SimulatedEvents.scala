package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Osdb
import graft.operators.Flatten.FlatDp

/** S13: the simulated-event generator — events synthesised from sine/noise
  * component specifications with analytically-known spectra, the
  * reference's property-test fixture.
  *
  * Reference: user_tools/nnTraining2/generateSimulatedEvents.py:21-120 —
  * for each sample n at t = n/sampleFreq, each active component
  * ([startSecs, endSecs)) contributes
  * `ampl * cos(2*pi*freq*t + phase*2*pi/360)` to its axis; magnitude =
  * sqrt(x^2+y^2+z^2); every samplePeriod*sampleFreq samples close one
  * datapoint (hr = 0, o2sat = 0, simpleSpec = zeros); event metadata
  * type defaults to "nda", subType "simulation", userId "1".
  *
  * A component at frequency f with amplitude a, alone on its axis and
  * riding on a constant-gravity component, injects power a^2/2 into the
  * magnitude signal's f bin — the golden-test property SURVEY §5 uses.
  *
  * Generation is distributed: one Spark task per event (spark.parallelize
  * over specs, flatMap to datapoints) — generating a 10^9-event synthetic
  * corpus is the same code at 1000 executors.
  */
object SimulatedEvents {

  /** One additive component (generateSimulatedEvents.py componentsLst). */
  case class Component(
      desc: String,
      axis: Int,          // 0=x 1=y 2=z
      freq: Double,       // Hz
      ampl: Double,       // milli-g
      phase: Double,      // degrees
      startSecs: Double,
      endSecs: Double)

  case class EventSpec(
      id: String,
      desc: String,
      typeStr: String = "nda",
      userId: String = "1",
      startSecs: Long = 1651718245L,  // "2022-05-05T02:37:25Z"
      sampleFreq: Double = 25.0,
      durationSecs: Double = 60.0,
      components: Seq[Component] = Seq.empty)

  /** Gravity-only spec + a shaken variant, mirroring the reference's
    * simulated_events.json fixtures. */
  def defaultSpecs: Seq[EventSpec] = Seq(
    EventSpec("S001", "Simulated - gravity (x axis) only",
      components = Seq(Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9))),
    // tremor rides the SAME axis as gravity so the magnitude signal sees
    // it at 5 Hz with amplitude 100; a perpendicular tremor would appear
    // frequency-doubled and amplitude-squashed through the sqrt
    EventSpec("S002", "Simulated - gravity + 5 Hz tremor (x axis)",
      components = Seq(
        Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
        Component("tremor5Hz", 0, 5.0, 100.0, 0.0, 0.0, 1e9))),
    EventSpec("S003", "Simulated - gravity + 3 Hz seizure burst 20-40 s",
      typeStr = "seizure",
      components = Seq(
        Component("gravity", 0, 0.0, 1000.0, 0.0, 0.0, 1e9),
        Component("seizure3Hz", 1, 3.0, 300.0, 90.0, 20.0, 40.0))))

  /** Generate one event's datapoints (pure; reused by tests directly). */
  def generate(spec: EventSpec): Seq[FlatDp] = {
    val samplePeriod = 5.0
    val nDpSamp = (samplePeriod * spec.sampleFreq).toInt
    val nSamp = (spec.durationSecs * spec.sampleFreq).toInt
    val label = graft.operators.Flatten.type2id(spec.typeStr)
    val out = scala.collection.mutable.ArrayBuffer.empty[FlatDp]
    var dpMag = new Array[Double](0)
    var dp3d = new Array[Double](0)
    val magBuf = scala.collection.mutable.ArrayBuffer.empty[Double]
    val xyzBuf = scala.collection.mutable.ArrayBuffer.empty[Double]
    var n = 0
    while (n < nSamp) {
      val t = n / spec.sampleFreq
      var x = 0.0; var y = 0.0; var z = 0.0
      spec.components.foreach { c =>
        if (t >= c.startSecs && t < c.endSecs) {
          val a = c.ampl * math.cos(2 * math.Pi * c.freq * t + c.phase * 2 * math.Pi / 360.0)
          c.axis match {
            case 0 => x += a
            case 1 => y += a
            case 2 => z += a
            case other => throw new IllegalArgumentException(s"Invalid axis $other")
          }
        }
      }
      magBuf += math.sqrt(x * x + y * y + z * z)
      xyzBuf += x; xyzBuf += y; xyzBuf += z
      if (magBuf.length == nDpSamp) {
        val dpIdx = out.length
        out += FlatDp(
          eventId = spec.id, userId = spec.userId, typeStr = spec.typeStr,
          `type` = label,
          // dataTime stamps the dp's LAST sample (generateSimulatedEvents
          // .py:116: dataTimeSecs = startTimeSecs + timeSecs at close)
          tsSec = spec.startSecs + (n / spec.sampleFreq).toLong,
          osdAlarmState = 0L, osdSpecPower = 0.0, osdRoiPower = 0.0,
          hr = 0.0, o2sat = 0.0,
          rawData = magBuf.toArray, rawData3D = xyzBuf.toArray,
          synthetic = true, seq = dpIdx.toLong)
        magBuf.clear(); xyzBuf.clear()
      }
      n += 1
    }
    out.toSeq
  }

  /** Distributed generation: one task per spec. */
  def apply(spark: SparkSession, specs: Seq[EventSpec] = defaultSpecs): Dataset[FlatDp] = {
    import spark.implicits._
    spark.createDataset(specs)
      .repartition(math.max(1, math.min(specs.length, 64)))
      .flatMap(generate _)
  }
}
