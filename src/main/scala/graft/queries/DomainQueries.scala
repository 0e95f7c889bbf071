package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Signal, TimeParse}
import graft.operators._
import graft.sources.SimulatedEvents
import graft.streaming.{NnBuffer, Replay, ReplayDp}

/** The OSDB DOMAIN operator inventory as oracled CORRECTNESS entries —
  * tidy, flatten/explode, signal statistics, low-motion gating, the
  * rolling NN buffer, the replay FSM, augmentation, curation dedup — each
  * driven over [[OsdbFixture]] so a DuckDB oracle can check it exactly.
  *
  * Exactness doctrine (see OsdbFixture): integer aggregates compare
  * bit-exact; single-IEEE-op projections (one division / subtraction
  * of identical operands) compare bit-exact; order-dependent float
  * accumulations (std, magnitude sums) are compared by RANK with a
  * unique tiebreak, never by value. FSM and buffer entries are real
  * cross-checks: the oracle derives the expected output analytically
  * from the fixture formulas, independently of the Scala implementation.
  */
object DomainQueries {
  import OsdbFixture.sqlBase

  // ---------------------------------------------------------------- UDFs
  // Tight-loop UDFs over primitive arrays (container HOF lambdas are
  // interpreted and re-evaluate inputs — see round-1 notes).

  /** Exact integer sum of an integer-valued double array. A tight UDF:
    * the aggregate() HOF is CodegenFallback and pays a lambda dispatch
    * per element. */
  private val sumLongUdf = udf { (a: Seq[Double]) =>
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i).toLong; i += 1 }
    s
  }
  private val dpSumL = sumLongUdf(col("rawData"))

  private val rejectLowMotionUdf =
    udf((a: Seq[Double]) => Spectrogram.rejectLowMotion(a.toArray, 10.0))
  private val mllUdf = udf((a: Seq[Double]) => Signal.meanLineLength(a.toArray))
  private val zcrUdf = udf((a: Seq[Double]) => Signal.zeroCrossingRate(a.toArray))
  private val meanUdf = udf((a: Seq[Double]) => Signal.mean(a.toArray))
  private val stdUdf = udf((a: Seq[Double]) => Signal.std(a.toArray))
  private val skewUdf = udf((a: Seq[Double]) => Signal.skewness(a.toArray))
  private val kurtUdf = udf((a: Seq[Double]) => Signal.kurtosis(a.toArray))
  private val znormArgmaxUdf = udf((a: Seq[Double]) => {
    // C15: z-normalise, return the index of the max |z| (strict >, so the
    // FIRST max wins — the tiebreak the oracle mirrors with ORDER BY i)
    val z = Signal.zNormalize(a.toArray)
    var best = 0; var bestV = -1.0; var i = 0
    while (i < z.length) {
      val v = math.abs(z(i)); if (v > bestV) { bestV = v; best = i }; i += 1
    }
    best
  })
  private val magMeanUdf = udf((xyz: Seq[Double]) =>
    Signal.mean(Signal.magnitude3D(xyz.toArray, "V2")))
  private val magV1SumUdf = udf((xyz: Seq[Double]) => {
    val m = Signal.magnitude3D(xyz.toArray, "V1")
    var s = 0.0; var i = 0
    while (i < m.length) { s += m(i); i += 1 }
    s
  })
  private val axisSumsUdf = udf((xyz: Seq[Double]) => {
    val a = xyz.toArray
    def s(ax: Int): Double = {
      val v = Signal.deinterleave(a, ax)
      var t = 0.0; var i = 0
      while (i < v.length) { t += v(i); i += 1 }
      t
    }
    (s(0), s(1), s(2))
  })
  /** One DFT per row: all four p1 projections come out of a single
    * kernel invocation (a per-bin UDF would re-run the O(n²) transform
    * once per column). */
  private val fftBinsUdf = udf { (a: Seq[Double], f1: Int, f2: Int) =>
    val (re, im) = Signal.dft(a.toArray)
    def mag(k: Int) = math.sqrt(Signal.magnitudeSq(re(k), im(k)))
    (mag(0), mag(f1), mag(f2), Signal.magnitudeSq(re(f1), im(f1)))
  }
  private val winSumUdf = udf { (name: String, n: Int) =>
    val w = Signal.window(name, n)
    var s = 0.0; var i = 0
    while (i < w.length) { s += w(i); i += 1 }
    s
  }
  private val specPowerUdf = udf((a: Seq[Double]) => Signal.specPower(a.toArray))
  private val roiPowerUdf = udf((a: Seq[Double]) => Signal.roiPower(a.toArray))
  private val spectrumRatioUdf = udf((a: Seq[Double]) => Signal.spectrumRatio(a.toArray))
  private val alarmStateUdf = udf((a: Seq[Double]) => Signal.alarmState(a.toArray))
  private val hpRmsUdf = udf { (a: Seq[Double]) =>
    // P8 probe statistic: RMS of the filtered signal over the centre
    // window [250, 750) of the n=1000 tone, where the filtfilt startup
    // transient (pole radius ~0.915/sample) has decayed below 1e-9 of
    // the signal and the zero-phase closed form holds (ToneGainProbe).
    val y = graft.functions.Filters.highPass(a.toArray)
    var s = 0.0; var i = 250
    while (i < 750) { s += y(i) * y(i); i += 1 }
    math.sqrt(s / 500.0)
  }
  private val bandPowerUdf = udf { (a: Seq[Double]) =>
    val (tot, peak) = Signal.bandPower(a.toArray, 25.0, 3.0, 8.0)
    Array(tot, peak)
  }
  private val centroidUdf = udf((a: Seq[Double]) => Signal.spectralCentroid(a.toArray, 25.0))
  private val entropyUdf = udf((a: Seq[Double]) => Signal.spectralEntropy(a.toArray))
  private val interpSumUdf = udf { (ds: Seq[Long], hrs: Seq[Double]) =>
    // P13: interpolate the per-dp hr knots (at sample index d*125) onto
    // the full 25 Hz grid, then summarize with exactly-restatable stats
    val xs = ds.map(_ * 125.0).toArray
    val n = ds.length * 125
    val out = Signal.interpOnto(n, xs, hrs.toArray)
    var s = 0.0; var i = 0
    while (i < out.length) { s += out(i); i += 1 }
    Array(n.toLong, math.round(s), out(0).toLong, out(out.length - 1).toLong)
  }
  private val welchStatsUdf = udf { (a: Seq[Double]) =>
    // P9 probe statistics: the four PSD-shape numbers of the Welch
    // kernel (total power, peak bin power, mean frequency, spectral
    // entropy), each rounded at a fixed scale so the per-dp values are
    // integers a VALUES oracle can pin after a SUM.
    val (freqs, psd) = graft.functions.EpochFeatures.welchPsd(a.toArray, 25.0)
    var tot = 0.0; var peak = 0.0; var num = 0.0
    var k = 0
    while (k < psd.length) {
      tot += psd(k); if (psd(k) > peak) peak = psd(k)
      num += freqs(k) * psd(k); k += 1
    }
    var h = 0.0
    k = 0
    while (k < psd.length) {
      val q = psd(k) / tot
      h -= q * (math.log(q + 1e-12) / math.log(2.0))
      k += 1
    }
    Array(math.round(tot * 1e3), math.round(peak * 1e3),
      math.round(num / tot * 1e6), math.round(h * 1e6))
  }

  // ------------------------------------------------------------- A: groups

  /** A1 (group-by-event collect, osdDbConnection.getEventsDf): per event,
    * the d-ordered list of datapoint magnitude sums as a string — list
    * compare without array-vs-list bridge ambiguity. */
  def a1GroupCollect(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"), dpSumL.as("sv"))
      .groupBy("e")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(d, sv)))," +
        " p -> cast(p.sv as string)), ',')").as("dp_sums"))

  val a1Sql: String = sqlBase +
    """SELECT e, string_agg(CAST(sv AS VARCHAR), ',' ORDER BY d) AS dp_sums
      |FROM (SELECT e, d, CAST(SUM(m) AS BIGINT) AS sv FROM sampm GROUP BY e, d)
      |GROUP BY e""".stripMargin

  /** O1 (sort datapoints within event by time): first/last dp after the
    * in-group time sort. */
  def o1SortWithin(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("ts"), col("d"), dpSumL.as("sv"))
      .groupBy("e")
      .agg(expr("array_sort(collect_list(struct(ts, d, sv)))").as("arr"))
      .select(col("e"),
        element_at(col("arr"), 1).getField("sv").as("first_s"),
        element_at(col("arr"), -1).getField("sv").as("last_s"),
        size(col("arr")).cast("long").as("n"))

  val o1Sql: String = sqlBase +
    """SELECT e, first(sv ORDER BY ts, d) AS first_s,
      |       last(sv ORDER BY ts, d) AS last_s, COUNT(*) AS n
      |FROM (SELECT e, ts, d, CAST(SUM(m) AS BIGINT) AS sv
      |      FROM sampm GROUP BY e, ts, d)
      |GROUP BY e""".stripMargin

  /** J2 (explode datapoints with parent propagation — the real
    * [[Flatten.explodeDatapoints]] over nested events). */
  def j2ExplodeParent(s: SparkSession, d: String): DataFrame =
    Flatten.explodeDatapoints(OsdbFixture.nested(s, d, arrays = false))
      .groupBy("typeStr")
      .agg(count(lit(1)).as("n"), sum(col("dpIdx")).cast("long").as("d_sum"))

  val j2Sql: String = sqlBase +
    """SELECT type_str AS typeStr, COUNT(*) AS n, CAST(SUM(d) AS BIGINT) AS d_sum
      |FROM dpx GROUP BY type_str""".stripMargin

  /** A2+A3 (tidy derived fields: worst-alarm-state rollup and the 50%
    * has-data flags — the real [[Tidy.derive]] over nested events). */
  def a3HasFlags(s: SparkSession, d: String): DataFrame =
    Tidy.derive(OsdbFixture.nested(s, d, arrays = false))
      .groupBy(
        col("osdAlarmState").as("worst_state"),
        col("has3dData").as("has3d"),
        col("hasHrData").as("has_hr"),
        col("hasO2SatData").as("has_o2"))
      .agg(count(lit(1)).as("n"))

  val a3Sql: String = sqlBase +
    """SELECT worst_state, has3d, has_hr, has_o2, COUNT(*) AS n FROM (
      |  SELECT e,
      |    MAX(CASE WHEN alarm IN (1,2,3) THEN alarm ELSE 0 END) AS worst_state,
      |    2*SUM(CASE WHEN has_3d THEN 1 ELSE 0 END) >= COUNT(*) AS has3d,
      |    2*SUM(CASE WHEN hr <> -1 THEN 1 ELSE 0 END) >= COUNT(*) AS has_hr,
      |    2*SUM(CASE WHEN o2 <> -1 THEN 1 ELSE 0 END) >= COUNT(*) AS has_o2
      |  FROM dpx GROUP BY e)
      |GROUP BY 1, 2, 3, 4""".stripMargin

  /** A4 (event-level prediction metrics, eventLevelMetrics.py:46-88): the
    * real [[Curate.eventLevelMetrics]] with user_id as the event key. */
  def a4EventMetrics(s: SparkSession, d: String): DataFrame =
    Curate.eventLevelMetrics(
      Tables.events(s, d)
        .withColumn("label", when(col("user_id") % 3 === 0, 1).otherwise(0)),
      "user_id", "value", "label")

  val a4Sql: String =
    """SELECT event_tp, event_fp, event_tn, event_fn, n_events,
      |  n_seizure_events, n_non_seizure_events,
      |  CASE WHEN event_tp + event_fn > 0
      |       THEN CAST(event_tp AS DOUBLE) / (event_tp + event_fn)
      |       ELSE 0.0 END AS event_tpr,
      |  CASE WHEN event_fp + event_tn > 0
      |       THEN CAST(event_fp AS DOUBLE) / (event_fp + event_tn)
      |       ELSE 0.0 END AS event_fpr
      |FROM (SELECT
      |  CAST(SUM(CASE WHEN mp >= 0.5 AND lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS event_tp,
      |  CAST(SUM(CASE WHEN mp >= 0.5 AND lbl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS event_fp,
      |  CAST(SUM(CASE WHEN mp < 0.5 AND lbl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS event_tn,
      |  CAST(SUM(CASE WHEN mp < 0.5 AND lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS event_fn,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_seizure_events,
      |  CAST(SUM(CASE WHEN lbl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_non_seizure_events
      | FROM (SELECT user_id, MAX(value) AS mp,
      |              MAX(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS lbl
      |       FROM events GROUP BY user_id))""".stripMargin

  // ------------------------------------------------------------ F: filters

  /** F7 (dataSource include/exclude through the real
    * [[EventFilters.compile]] predicate over nested events). */
  def f7SourceFilter(s: SparkSession, d: String): DataFrame =
    OsdbFixture.nested(s, d, arrays = false)
      .filter(EventFilters.compile(EventFilterConfig(
        includeDataSources = Seq("garmin", "phone"),
        excludeSubTypes = Seq("tonic"))))
      .groupBy(col("type").as("type_str"))
      .agg(count(lit(1)).as("n"))

  val f7Sql: String = sqlBase +
    """SELECT type_str, COUNT(*) AS n FROM ev
      |WHERE k % 4 IN (0, 2) AND k % 5 >= 2
      |GROUP BY type_str""".stripMargin

  /** F9 (accel-presence filter). */
  def f9AccelPresence(s: SparkSession, d: String): DataFrame =
    // presence stubs: the predicate only inspects size(rawData) > 0, so
    // generating full 125-sample arrays would be pure waste
    OsdbFixture.dps(s, d, arrays = false)
      .filter(size(col("rawData")) > 0)
      .groupBy("type_str")
      .agg(count(lit(1)).as("n"))

  val f9Sql: String = sqlBase +
    """SELECT type_str, COUNT(*) AS n FROM dpx WHERE has_raw
      |GROUP BY type_str""".stripMargin

  /** F10 (low-motion rejection, nnAlg.py:113-121): the float predicate
    * (100*std/mean < 10) vs the oracle's exact integer restatement
    * 100*(n*Σm² − S²) < S² — boundary-exact cross-check. */
  def f10LowMotion(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(rejectLowMotionUdf(col("rawData")).as("rej"))
      .groupBy("rej")
      .agg(count(lit(1)).as("n"))

  val f10Sql: String = sqlBase +
    """SELECT rej, COUNT(*) AS n FROM (
      |  SELECT 100*(125*SUM(m*m) - SUM(m)*SUM(m)) < SUM(m)*SUM(m) AS rej
      |  FROM sampm GROUP BY e, d)
      |GROUP BY rej""".stripMargin

  // ------------------------------------------------------------ C: scalars

  /** C1 (dateStr2secs over the legacy format ladder). */
  def c1ParseSecs(s: SparkSession, d: String): DataFrame = {
    val raw = when(col("event_id") % 2 === 0,
        date_format(col("ts"), "dd-MM-yyyy HH:mm:ss"))
      .otherwise(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
    Tables.events(s, d)
      .withColumn("raw", raw)
      .select(col("event_id"), col("raw"),
        TimeParse.dateStr2secs(col("raw")).as("secs"))
  }

  val c1Sql: String =
    """SELECT event_id, raw,
      | epoch_us(COALESCE(try_strptime(raw, '%d-%m-%Y %H:%M:%S'),
      |                   try_strptime(raw, '%Y-%m-%dT%H:%M:%S'))) // 1000000 AS secs
      |FROM (SELECT event_id,
      |        CASE WHEN event_id % 2 = 0 THEN strftime(ts, '%d-%m-%Y %H:%M:%S')
      |             ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END AS raw
      |      FROM events)""".stripMargin

  /** C3 (timezone normalisation: naive local wall time → UTC seconds).
    * Asia/Kolkata — fixed +05:30, no DST ambiguity in any season. */
  def c3TzNormalize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("raw", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .select(col("event_id"),
        to_utc_timestamp(to_timestamp(col("raw"), "yyyy-MM-dd HH:mm:ss"),
          "Asia/Kolkata").cast("long").as("utc_secs"))

  val c3Sql: String =
    """SELECT event_id,
      | epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
      |   '%Y-%m-%d %H:%M:%S') AT TIME ZONE 'Asia/Kolkata') // 1000000 AS utc_secs
      |FROM events""".stripMargin

  /** C5+C6 (3D magnitude modes): V1 |x|+|y|+|z| sums exactly (integers);
    * the V2 sqrt magnitude is order-dependent float, compared by in-event
    * rank only. */
  def c5MagnitudeRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("e").orderBy(col("mag_mean").desc, col("d"))
    OsdbFixture.dps(s, d).filter(col("has_3d"))
      .select(col("e"), col("d"),
        magV1SumUdf(col("rawData3D")).cast("long").as("v1_sum"),
        magMeanUdf(col("rawData3D")).as("mag_mean"))
      .withColumn("mag_rank", row_number().over(w).cast("long"))
      .drop("mag_mean")
  }

  val c5Sql: String = sqlBase +
    """SELECT e, d, v1_sum,
      |  CAST(row_number() OVER (PARTITION BY e ORDER BY s2 DESC, d) AS BIGINT) AS mag_rank
      |FROM (SELECT e, d,
      |        CAST(SUM(ABS(vx)+ABS(vy)+ABS(vz)) AS BIGINT) AS v1_sum,
      |        SUM(sqrt(CAST(vx*vx + vy*vy + vz*vz AS DOUBLE))) AS s2
      |      FROM samp3 GROUP BY e, d)""".stripMargin

  /** C5 on the NATIVE tier (c5n): the same magnitude ranking as
    * [[c5MagnitudeRank]] but through the codegen expressions end to end
    * — `array_mag3d` for the per-sample magnitudes and `array_dot`
    * against a ones vector for the index-order sum. No UDF boundary
    * anywhere in the row pipeline; the oracle is c5's verbatim (same
    * output contract), so this pins that the native kernels are drop-in
    * bit-compatible with the Signal-library path. */
  def c5nNativeMag(s: SparkSession, d: String): DataFrame = {
    import graft.plans.GraftExpressions.{arrayDot, arrayMag3D}
    val ones = array(Seq.fill(125)(lit(1.0)): _*)
    val w = Window.partitionBy("e").orderBy(col("mag_sum").desc, col("d"))
    OsdbFixture.dps(s, d).filter(col("has_3d"))
      .select(col("e"), col("d"),
        arrayDot(arrayMag3D(col("rawData3D"), "V1"), ones).cast("long").as("v1_sum"),
        arrayDot(arrayMag3D(col("rawData3D"), "V2"), ones).as("mag_sum"))
      .withColumn("mag_rank", row_number().over(w).cast("long"))
      .drop("mag_sum")
  }

  val c5nSql: String = sqlBase +
    """SELECT e, d, v1_sum,
      |  CAST(row_number() OVER (PARTITION BY e ORDER BY s2 DESC, d) AS BIGINT) AS mag_rank
      |FROM (SELECT e, d,
      |        CAST(SUM(ABS(vx)+ABS(vy)+ABS(vz)) AS BIGINT) AS v1_sum,
      |        SUM(sqrt(CAST(vx*vx + vy*vy + vz*vz AS DOUBLE))) AS s2
      |      FROM samp3 GROUP BY e, d)""".stripMargin

  /** C7 (de-interleave stride-3 axes): per-axis integer sums. */
  def c7Deinterleave(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_3d"))
      .select(col("e"), col("d"), axisSumsUdf(col("rawData3D")).as("ax"))
      .select(col("e"), col("d"),
        col("ax._1").cast("long").as("sx"),
        col("ax._2").cast("long").as("sy"),
        col("ax._3").cast("long").as("sz"))

  val c7Sql: String = sqlBase +
    """SELECT e, d, CAST(SUM(vx) AS BIGINT) AS sx, CAST(SUM(vy) AS BIGINT) AS sy,
      |       CAST(SUM(vz) AS BIGINT) AS sz
      |FROM samp3 GROUP BY e, d""".stripMargin

  /** C8 (array truncation 125/375/10 through the real
    * [[Tidy.tidyDatapoints]]): fixture arrays are over-length (130/381/12)
    * and must come back clipped. */
  def c8Truncate(s: SparkSession, d: String): DataFrame =
    Tidy.tidyDatapoints(OsdbFixture.nested(s, d, rawLen = 130, xyzLen = 381,
        specLen = 12))
      .filter(col("k") % 2 === 0) // over-length arrays are heavy; halve
      .select(col("e_num").as("e"), posexplode(col("datapoints")).as(Seq("d", "dp")))
      .filter(col("dp.rawData").isNotNull)
      .select(col("e"), col("d").cast("long").as("d"),
        size(col("dp.rawData")).as("raw_n"),
        sumLongUdf(col("dp.rawData")).as("raw_sum"),
        coalesce(size(col("dp.rawData3D")), lit(0)).as("n3d"),
        size(col("dp.simpleSpec")).as("spec_n"))

  val c8Sql: String = sqlBase +
    """SELECT e, d, CAST(125 AS INT) AS raw_n, CAST(SUM(m) AS BIGINT) AS raw_sum,
      |  CAST(CASE WHEN has_3d THEN 375 ELSE 0 END AS INT) AS n3d,
      |  CAST(10 AS INT) AS spec_n
      |FROM sampm WHERE k % 2 = 0 GROUP BY e, d, has_3d""".stripMargin

  /** C12 (mean line length): integer |diff| sum, one division — exact. */
  def c12LineLength(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"), mllUdf(col("rawData")).as("mll"))

  val c12Sql: String = sqlBase +
    """SELECT e, d, CAST(SUM(ad) AS DOUBLE) / 124.0 AS mll
      |FROM (SELECT e, d, ABS(m - lag(m) OVER (PARTITION BY e, d ORDER BY i)) AS ad
      |      FROM sampm)
      |GROUP BY e, d""".stripMargin

  /** C13 (zero-crossing rate about the mean): the mean is one exact
    * division, every (x−m) subtraction has identical operands in both
    * engines, so even the float products compare bit-exact. */
  def c13ZeroCross(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"), zcrUdf(col("rawData")).as("zcr"))

  val c13Sql: String = sqlBase +
    """SELECT e, d,
      |  CAST(SUM(CASE WHEN (m - mn)*(pm - mn) < 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / 124.0 AS zcr
      |FROM (SELECT e, d, m,
      |        CAST(SUM(m) OVER (PARTITION BY e, d) AS DOUBLE) / 125.0 AS mn,
      |        lag(m) OVER (PARTITION BY e, d ORDER BY i) AS pm
      |      FROM sampm)
      |GROUP BY e, d""".stripMargin

  /** C14 (moment statistics): mean exact; std (order-dependent float)
    * compared by in-event rank. */
  def c14Moments(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("e").orderBy(col("sd").desc, col("d"))
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        meanUdf(col("rawData")).as("mn"),
        stdUdf(col("rawData")).as("sd"))
      .withColumn("std_rank", row_number().over(w).cast("long"))
      .drop("sd")
  }

  val c14Sql: String = sqlBase +
    """SELECT e, d, mn,
      |  CAST(row_number() OVER (PARTITION BY e ORDER BY v DESC, d) AS BIGINT) AS std_rank
      |FROM (SELECT s.e AS e, s.d AS d, g.mn AS mn,
      |        SUM((s.m - g.mn)*(s.m - g.mn)) AS v
      |      FROM sampm s
      |      JOIN (SELECT e, d, CAST(SUM(m) AS DOUBLE)/125.0 AS mn
      |            FROM sampm GROUP BY e, d) g
      |        ON s.e = g.e AND s.d = g.d
      |      GROUP BY s.e, s.d, g.mn)""".stripMargin

  /** C15 (z-normalise): index of the max |z| sample — scale-invariant, so
    * the oracle ranks |m − mean| directly; first index wins ties in both
    * engines. */
  def c15ZnormArgmax(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"), znormArgmaxUdf(col("rawData")).as("amax_i"))

  val c15Sql: String = sqlBase +
    """SELECT e, d, CAST(i AS INT) AS amax_i FROM (
      |  SELECT s.e AS e, s.d AS d, s.i AS i,
      |    row_number() OVER (PARTITION BY s.e, s.d
      |      ORDER BY ABS(s.m - g.mn) DESC, s.i) AS rn
      |  FROM sampm s
      |  JOIN (SELECT e, d, CAST(SUM(m) AS DOUBLE)/125.0 AS mn
      |        FROM sampm GROUP BY e, d) g
      |    ON s.e = g.e AND s.d = g.d)
      |WHERE rn = 1""".stripMargin

  /** C16 (min-max feature scaling through the real
    * [[ScaleFeatures.minMaxScale]]): min/max are exact integers, the
    * scale is one subtraction + one division of identical operands —
    * bit-exact across engines. */
  def c16MinMax(s: SparkSession, d: String): DataFrame = {
    // k-even subset: minMaxScale is two passes (eager min/max agg + map)
    // and each pass regenerates the fixture arrays
    val sums = OsdbFixture.dps(s, d, where = col("has_raw") && col("k") % 2 === 0)
      .select(col("e"), col("d"), dpSumL.as("sv"))
    ScaleFeatures.minMaxScale(sums, Seq("sv"))
      .select(col("e"), col("d"), col("sv"), col("sv_scaled"))
  }

  val c16Sql: String = sqlBase +
    """SELECT e, d, sv,
      |  CASE WHEN mx <> mn THEN (sv - mn) / CAST(mx - mn AS DOUBLE)
      |       ELSE 0.0 END AS sv_scaled
      |FROM (SELECT e, d, sv, MIN(sv) OVER () AS mn, MAX(sv) OVER () AS mx
      |      FROM (SELECT e, d, CAST(SUM(m) AS BIGINT) AS sv
      |            FROM sampm WHERE k % 2 = 0 GROUP BY e, d))""".stripMargin

  /** C18/P14 (gap-fill zero-datapoint construction through the real
    * [[Flatten.validateAndFill]]): the fixture's missing datapoints
    * ((k+d)%7==0) leave 10-second holes the validator must fill with
    * zero rows; inserted count per event has the closed form
    * max(d) - min(d) + 1 - n_present, which the oracle computes
    * independently. */
  def c18GapFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Flatten.validateAndFill(OsdbFixture.flatDps(s, d, col("has_raw")))
      .toDF()
      .groupBy(col("eventId").as("event_id"))
      .agg(sum(when(col("synthetic"), 1L).otherwise(0L)).as("n_synth"),
        count(lit(1)).as("n_total"))
  }

  val c18Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS event_id,
      |  CAST(MAX(d) - MIN(d) + 1 - COUNT(*) AS BIGINT) AS n_synth,
      |  CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n_total
      |FROM dpx WHERE has_raw GROUP BY e""".stripMargin

  // ------------------------------------------------------------ W: windows

  /** W4 (keep-max curation dedup, merge_json.py:148-250): the real
    * [[Curate.keepMaxDedup]] vs an independent gaps-and-islands SQL
    * restatement of the chained-60s-cluster + priority ordering. */
  def w4MergeDedup(s: SparkSession, d: String): DataFrame =
    Curate.keepMaxDedup(OsdbFixture.ev(s, d), Seq("ub", "type_str"),
        "wts", "n_dp", "e", 3000L, Some("is_ref"))
      .select("ub", "type_str", "e", "wts", "n_dp")

  val w4Sql: String = sqlBase +
    """SELECT ub, type_str, e, wts, n_dp FROM (
      |  SELECT *, row_number() OVER (PARTITION BY ub, type_str, cid
      |    ORDER BY is_ref DESC, n_dp DESC, wts DESC, e DESC) AS rn
      |  FROM (
      |    SELECT *, SUM(CASE WHEN pw IS NULL OR wts - pw > 3000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY ub, type_str ORDER BY wts, e) AS cid
      |    FROM (SELECT *, lag(wts) OVER (PARTITION BY ub, type_str
      |                                   ORDER BY wts, e) AS pw
      |          FROM ev)))
      |WHERE rn = 1""".stripMargin

  /** W5 (sliding sample epochs through the real [[FeatureExtract]]):
    * epoch layout (count, last end) checked exactly; feature values are
    * golden-tested against simulated events (SignalSpec). */
  def w5Epochs(s: SparkSession, d: String): DataFrame =
    FeatureExtract.extract(
        OsdbFixture.flatDps(s, d, col("e") % 80 === 0 && col("has_raw")),
        FeatureExtract.Config(window = 250, step = 125, highPassHz = 0.0))
      .groupBy(col("eventId").as("event_id"))
      .agg(count(lit(1)).as("n_epochs"), max("endSample").cast("long").as("last_end"))

  val w5Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS event_id, np - 1 AS n_epochs,
      |       np * 125 AS last_end
      |FROM (SELECT e, COUNT(*) AS np FROM dpx
      |      WHERE has_raw AND e % 80 = 0 GROUP BY e)""".stripMargin

  /** W6/P15 (spectral history): slice layout checked exactly; spectral
    * content is golden-tested (SpectrogramSpec, 5 Hz sine fixture). */
  def w6Spectrogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Spectrogram.eventSpectrogram(
        OsdbFixture.flatDps(s, d, col("e") % 80 === 0 && col("has_raw")),
        Spectrogram.Config(stepLen = 25))
      .select(col("eventId").as("event_id"),
        col("nSlices").cast("long").as("n_slices"),
        col("nBins").cast("long").as("n_bins"))
  }

  val w6Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS event_id,
      |       ((np * 125 - 126) // 25) + 1 AS n_slices,
      |       CAST(61 AS BIGINT) AS n_bins
      |FROM (SELECT e, COUNT(*) AS np FROM dpx
      |      WHERE has_raw AND e % 80 = 0 GROUP BY e)""".stripMargin

  /** W8/M8 (the 750-sample rolling NN buffer): emission schedule and the
    * window's first/last samples (single mG→G divisions, bit-exact)
    * derived independently by the oracle from the fixture formulas. */
  def w8NnBuffer(s: SparkSession, d: String): DataFrame =
    NnBuffer.dp2vectors(
        OsdbFixture.flatDps(s, d, col("has_raw")),
        bufferSamples = 750, normalise = false, sdThresh = 0.0)
      .select(col("eventId").as("event_id"), col("tsSec").as("ts_sec"),
        size(col("vec")).cast("long").as("n"),
        element_at(col("vec"), 1).as("first_g"),
        element_at(col("vec"), 750).as("last_g"))

  val w8Sql: String = sqlBase +
    """SELECT CAST(a.e AS VARCHAR) AS event_id, a.ts AS ts_sec,
      |  CAST(750 AS BIGINT) AS n,
      |  (CASE WHEN (b.k + b.d) % 11 = 0 THEN 1000
      |        ELSE 800 + (b.k*104729 + b.d*257) % 401 END) / 1000.0 AS first_g,
      |  (CASE WHEN (a.k + a.d) % 11 = 0 THEN 1000
      |        ELSE 800 + (a.k*104729 + a.d*257 + 2852) % 401 END) / 1000.0 AS last_g
      |FROM (SELECT e, k, d, ts, row_number() OVER (PARTITION BY e ORDER BY d) AS rn
      |      FROM dpx WHERE has_raw) a
      |JOIN (SELECT e, k, d, row_number() OVER (PARTITION BY e ORDER BY d) AS rn
      |      FROM dpx WHERE has_raw) b
      |  ON a.e = b.e AND b.rn = a.rn - 5""".stripMargin

  /** W10 (the alarm-count FSM through the real [[Replay.replayBatch]] +
    * HrAlg): the oracle computes the expected WARN/ALARM/decay schedule
    * analytically from the fixture's alarm-run length k%6 — a true
    * independent check of the FSM, including the 2→1 decay quirk and the
    * F11 manual-skip. */
  private def w10Dps(s: SparkSession, d: String) = {
    import s.implicits._
    OsdbFixture.ev(s, d)
      .withColumn("d", explode(expr("sequence(0L, 11L)")))
      .select(
        col("e").cast("string").as("eventId"),
        (lit(OsdbFixture.TsBase) + col("k") * 3600 + col("d") * 5).as("tsSec"),
        when(col("k") % 5 === 0 && col("d") === 1, -1.0)
          .when(col("d") >= 3 && col("d") < lit(3) + col("k") % 6, 160.0)
          .otherwise(80.0).as("hr"),
        when(col("k") % 9 === 0 && col("d") === 0, 5L).otherwise(0L)
          .as("alarmStateRecorded"),
        array().cast("array<double>").as("rawData"),
        array().cast("array<double>").as("rawData3D"),
        col("d").as("seq"))
      .as[ReplayDp]
  }

  private def replayStats(s: SparkSession, d: String, spec: String): DataFrame =
    Replay.detectionStats(Replay.replayBatch(w10Dps(s, d), Seq(spec)))
      .select(col("eventId").as("event_id"), col("alg"),
        col("detected").cast("long").as("detected"),
        col("nAlarm").as("n_alarm"), col("nWarn").as("n_warn"),
        col("nDp").as("n_dp"))

  def w10ReplayFsm(s: SparkSession, d: String): DataFrame =
    replayStats(s, d, "hr:MODE_SIMPLE")

  /** S5 (device connection through the real [[graft.streaming.DeviceAlg]]
    * wire protocol, osdAppConnection.py + deviceAlg.py): the w10 replay
    * rerun with every datapoint serialized to the GarminSD data packet,
    * pushed through the settings handshake, scored by the loopback
    * device (the engine's own HrAlg behind the wire), and the verdict
    * parsed back — so the oracle is the SAME closed-form FSM prediction
    * as w10 with the device's alg label. A dropped packet, a handshake
    * that loses a sample, or a mis-parsed verdict field all break the
    * hash against w10's closed form. One fresh device session per event
    * group: the reference's one-phone serial loop becomes a device farm
    * scaling with the executor count. */
  def s5Device(s: SparkSession, d: String): DataFrame =
    replayStats(s, d, "device:loopback:hr:MODE_SIMPLE")

  val s5Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS event_id, 'DeviceAlg' AS alg,
      |  CAST(CASE WHEN k % 6 >= 3 THEN 1 ELSE 0 END AS BIGINT) AS detected,
      |  CAST(CASE WHEN k % 6 >= 3 THEN k % 6 - 2 ELSE 0 END AS BIGINT) AS n_alarm,
      |  CAST((CASE WHEN k % 6 >= 2 THEN 1 ELSE 0 END)
      |     + (CASE WHEN k % 6 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_warn,
      |  CAST(12 - CASE WHEN k % 9 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_dp
      |FROM base""".stripMargin

  val w10Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS event_id, 'HrAlg-MODE_SIMPLE' AS alg,
      |  CAST(CASE WHEN k % 6 >= 3 THEN 1 ELSE 0 END AS BIGINT) AS detected,
      |  CAST(CASE WHEN k % 6 >= 3 THEN k % 6 - 2 ELSE 0 END AS BIGINT) AS n_alarm,
      |  CAST((CASE WHEN k % 6 >= 2 THEN 1 ELSE 0 END)
      |     + (CASE WHEN k % 6 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_warn,
      |  CAST(12 - CASE WHEN k % 9 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_dp
      |FROM base""".stripMargin

  /** A6B — the testRunner detection-stats parity pivot
    * (`user_tools/testRunner/results.py:99-243` saveResults2): per
    * (algorithm, category) totals, correct counts, and the correct
    * proportion — the last testRunner output not emitted verbatim.
    * Algorithms are the real replay FSM over the w10 fixture plus the
    * reference's extra `reported` column (the event's own recorded
    * alarm state == ALARM, results.py:145-160 — realized here as the
    * A2 worst-alarm-state rollup over the fixture datapoints).
    * Categories are the reference's four type2index outputs
    * (allSeizures / falseAlarms / otherEvents / nda — nda is absent
    * from the fixture and must still emit an explicit zero row with a
    * NULL proportion, exactly like the reference's empty output file)
    * plus the TonicClonic rows it embeds in the allSeizures footer.
    * TC membership uses the repo's established matcher (subType
    * contains tonic AND clonic ⇒ fixture k%5<2 — the reference's
    * literal 'tonic-clonic' substring would match zero fixture rows).
    * `correct` = alarmed ⟺ type is Seizure; the proportion is ONE
    * integer division (IEEE-identical across engines), NULL-guarded
    * like C11. */
  def a6bDetectionPivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fsm = Replay.detectionStats(
        Replay.replayBatch(w10Dps(s, d), Seq("hr:MODE_SIMPLE")))
      .select(col("eventId"), col("alg"),
        (col("detected") === 1).as("alarmed"))
    val reported = OsdbFixture.dps(s, d, arrays = false)
      .groupBy(col("e").cast("string").as("eventId"))
      .agg((max(col("alarm")) === 2).as("alarmed"))
      .select(col("eventId"), lit("reported").as("alg"), col("alarmed"))
    val evMeta = OsdbFixture.ev(s, d).select(
      col("e").cast("string").as("eventId"),
      col("type_str"),
      (col("type_str") === "Seizure").as("expect"),
      (col("k") % 3 === 0 && col("k") % 5 < 2).as("is_tc"))
    val j = fsm.unionByName(reported).join(evMeta, Seq("eventId"))
      .withColumn("correct", col("alarmed") === col("expect"))
    val byType = j.withColumn("category",
      when(col("type_str") === "Seizure", "allSeizures")
        .when(col("type_str") === "False Alarm", "falseAlarms")
        .otherwise("otherEvents"))
    val tcRows = j.filter(col("is_tc"))
      .withColumn("category", lit("tcSeizures"))
    val agg = byType.unionByName(tcRows)
      .groupBy("alg", "category")
      .agg(count(lit(1)).as("nt"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("nc"))
    val frame = Seq("HrAlg-MODE_SIMPLE", "reported").flatMap(a =>
      Seq("allSeizures", "falseAlarms", "otherEvents", "nda",
        "tcSeizures").map(c => (a, c))).toDF("alg", "category")
    // broadcast the aggregated (small) side — the LEFT of a left join
    // cannot be the broadcast build side
    frame.join(broadcast(agg), Seq("alg", "category"), "left")
      .select(col("alg"), col("category"),
        coalesce(col("nt"), lit(0L)).as("n_total"),
        coalesce(col("nc"), lit(0L)).as("n_correct"),
        when(coalesce(col("nt"), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(col("nc").cast("double") / col("nt"))
          .as("correct_prop"))
  }

  val a6bSql: String = sqlBase +
    """, verd AS (
      |  SELECT e, 'HrAlg-MODE_SIMPLE' AS alg, k % 6 >= 3 AS alarmed FROM ev
      |  UNION ALL
      |  SELECT e, 'reported', MAX(alarm) = 2 FROM dpx GROUP BY e),
      |evm AS (
      |  SELECT e, k % 3 = 0 AS expect,
      |    CASE k % 3 WHEN 0 THEN 'allSeizures' WHEN 1 THEN 'falseAlarms'
      |         ELSE 'otherEvents' END AS category,
      |    k % 3 = 0 AND k % 5 < 2 AS is_tc
      |  FROM ev),
      |catrows AS (
      |  SELECT v.alg, m.category, v.alarmed = m.expect AS correct
      |  FROM verd v JOIN evm m ON v.e = m.e
      |  UNION ALL
      |  SELECT v.alg, 'tcSeizures', v.alarmed = m.expect
      |  FROM verd v JOIN evm m ON v.e = m.e WHERE m.is_tc),
      |aggd AS (
      |  SELECT alg, category, COUNT(*) AS nt,
      |         CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS nc
      |  FROM catrows GROUP BY 1, 2),
      |frame AS (
      |  SELECT a.alg, c.category
      |  FROM (VALUES ('HrAlg-MODE_SIMPLE'), ('reported')) a(alg)
      |  CROSS JOIN (VALUES ('allSeizures'), ('falseAlarms'),
      |              ('otherEvents'), ('nda'), ('tcSeizures')) c(category))
      |SELECT f.alg, f.category,
      |  COALESCE(nt, 0) AS n_total,
      |  COALESCE(nc, 0) AS n_correct,
      |  CASE WHEN COALESCE(nt, 0) = 0 THEN NULL
      |       ELSE CAST(nc AS DOUBLE) / nt END AS correct_prop
      |FROM frame f LEFT JOIN aggd USING (alg, category)""".stripMargin

  // --------------------------------------------------------- M: augmentation

  /** M4 (noise augmentation): per-source-event output cardinality —
    * originals plus factor copies of every 3D seizure datapoint. Noisy
    * values themselves are seeded-random; the structural contract is the
    * oracle-able part (values are unit-tested). */
  def m4NoiseAug(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Augment.noiseAugment(OsdbFixture.flatDps(s, d, col("k") % 2 === 0),
        factor = 2, sigmaMilliG = 10.0)
      .select(substring_index(col("eventId"), "-", 1).as("base_id"))
      .groupBy("base_id")
      .agg(count(lit(1)).as("n"))
  }

  val m4Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS base_id,
      |  CAST(n_dp * (CASE WHEN k % 3 = 0 AND k % 4 <> 1 THEN 3 ELSE 1 END)
      |       AS BIGINT) AS n
      |FROM ev WHERE k % 2 = 0""".stripMargin

  /** M5 (phase augmentation): shifted re-windowing is pure integer data
    * movement — each synthetic event's datapoint count and total
    * magnitude sum are exact window sums over the concatenated signal. */
  def m5PhaseAug(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Augment.phaseAugment(
        OsdbFixture.flatDps(s, d, col("has_raw")), factor = 2)
      .toDF()
      .select(col("eventId").as("event_id"), dpSumL.as("sv"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_dps"), sum(col("sv")).as("mag_sum"))
  }

  val m5Sql: String = sqlBase +
    """, pres AS (
      |  SELECT e, k, d, dense_rank() OVER (PARTITION BY e ORDER BY d) AS rn
      |  FROM dpx WHERE has_raw),
      |npc AS (SELECT e, COUNT(*) AS np FROM pres GROUP BY e),
      |gs AS (
      |  SELECT s.e AS e, s.k AS k, (p.rn - 1)*125 + s.i AS j, s.m AS m
      |  FROM sampm s JOIN pres p ON s.e = p.e AND s.d = p.d)
      |SELECT CAST(g.e AS VARCHAR) AS event_id, MAX(n.np) AS n_dps,
      |       CAST(SUM(g.m) AS BIGINT) AS mag_sum
      |FROM gs g JOIN npc n ON g.e = n.e GROUP BY g.e
      |UNION ALL
      |SELECT CAST(g.e AS VARCHAR) || '-p1', MAX(n.np) - 1,
      |       CAST(SUM(CASE WHEN g.j >= 41 AND g.j < 41 + (n.np - 1)*125
      |                     THEN g.m ELSE 0 END) AS BIGINT)
      |FROM gs g JOIN npc n ON g.e = n.e WHERE g.k % 3 = 0 GROUP BY g.e
      |UNION ALL
      |SELECT CAST(g.e AS VARCHAR) || '-p2', MAX(n.np) - 1,
      |       CAST(SUM(CASE WHEN g.j >= 83 AND g.j < 83 + (n.np - 1)*125
      |                     THEN g.m ELSE 0 END) AS BIGINT)
      |FROM gs g JOIN npc n ON g.e = n.e WHERE g.k % 3 = 0 GROUP BY g.e""".stripMargin

  /** M6 (user augmentation): every user group is topped up to the max
    * per-user count — exact output cardinality per group. */
  def m6UserAug(s: SparkSession, d: String): DataFrame =
    Augment.userAugment(
      OsdbFixture.ev(s, d).select(col("e").cast("string").as("id"), col("ub")),
      "id", "ub")
      .groupBy("ub")
      .agg(count(lit(1)).as("n"))

  val m6Sql: String = sqlBase +
    """SELECT ub, (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM ev GROUP BY ub)) AS n
      |FROM ev GROUP BY ub""".stripMargin

  // ------------------------------------------------------------- S: sources

  /** S13 (simulated-event generator): structural contract of the default
    * specs — ids, types, datapoint/sample cardinalities. Spectral content
    * is golden-tested analytically (SignalSpec). */
  def s13Simulated(s: SparkSession, d: String): DataFrame =
    SimulatedEvents(s)
      .groupBy(col("eventId").as("event_id"), col("typeStr").as("type_str"))
      .agg(count(lit(1)).as("n_dp"),
        max(size(col("rawData"))).cast("long").as("raw_len"),
        max(size(col("rawData3D"))).cast("long").as("len3d"))

  val s13Sql: String =
    """SELECT * FROM (VALUES
      |  ('S001', 'nda', CAST(12 AS BIGINT), CAST(125 AS BIGINT), CAST(375 AS BIGINT)),
      |  ('S002', 'nda', CAST(12 AS BIGINT), CAST(125 AS BIGINT), CAST(375 AS BIGINT)),
      |  ('S003', 'seizure', CAST(12 AS BIGINT), CAST(125 AS BIGINT), CAST(375 AS BIGINT)))
      |t(event_id, type_str, n_dp, raw_len, len3d)""".stripMargin

  /** M7 (tonic-clonic augmentation through the real
    * [[Augment.tonicClonicAugment]]): fixture events match iff
    * type == 1 (k%3==0) and subType == 'tonicClonic' (k%5<2); with
    * tcAugFac=2 each match triples. Exact per-base-id cardinality,
    * m4/m6-style. */
  def m7TcAug(s: SparkSession, d: String): DataFrame =
    Augment.tonicClonicAugment(
        OsdbFixture.ev(s, d).select(col("e").cast("string").as("id"),
          col("label").as("type"), col("sub_type").as("subType")),
        "id", tcAugFac = 2)
      .select(substring_index(col("id"), "-", 1).as("base_id"))
      .groupBy("base_id")
      .agg(count(lit(1)).as("n"))

  val m7Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS base_id,
      |  CAST(CASE WHEN k % 3 = 0 AND k % 5 < 2 THEN 3 ELSE 1 END AS BIGINT) AS n
      |FROM ev""".stripMargin

  // --------------------------------------------------------------- S: sinks

  /** Scratch dir for the sink round-trip entries: under java.io.tmpdir,
    * keyed by the Spark applicationId so two concurrent sessions running
    * the same query cannot overwrite each other's files mid-read (and no
    * absolute repo path survives a checkout relocation). A JVM shutdown
    * hook removes the whole app-scoped dir so repeated test/bench runs
    * do not accumulate scratch lakes in the container's tmpdir. */
  private val qtmpCleanupRegistered =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  private def qtmp(s: SparkSession, name: String): String = {
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-qtmp-${s.sparkContext.applicationId}")
    if (qtmpCleanupRegistered.putIfAbsent(base.getAbsolutePath, true) == null)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(base)
      }))
    new java.io.File(base, name).getAbsolutePath
  }

  /** S3/S10 (flattened wide-CSV interchange, write -> read round-trip
    * through the real [[graft.sources.FlatCsv]]): per-event integer
    * invariants (dp count, magnitude sum, hr sum, ts sum) must survive
    * the 510-column projection and the array reassembly; the oracle
    * derives them from the fixture directly, so a lossy cell, a dropped
    * row, or a mis-stitched array all break the hash.
    *
    * Bench note: ~1.4-1.8 s at sf0.1 is real filesystem work — a
    * 510-column CSV is written AND read back inside the query (that IS
    * the operator under test); the cost scales with the interchange
    * volume, not with a plan defect. */
  def s3FlatCsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "s3_flatcsv")
    graft.sources.FlatCsv.write(
      OsdbFixture.flatDps(s, d, col("e") % 40 === 0).toDF(), dir)
    graft.sources.FlatCsv.read(s, dir).toDF()
      .groupBy(col("eventId").as("event_id"))
      .agg(count(lit(1)).as("n_dp"),
        sum(sumLongUdf(col("rawData"))).as("mag_sum"),
        sum(col("hr").cast("long")).as("hr_sum"),
        sum(col("tsSec")).as("ts_sum"))
  }

  val s3Sql: String = sqlBase +
    """SELECT CAST(a.e AS VARCHAR) AS event_id, a.n_dp,
      |  COALESCE(mg.mag_sum, 0) AS mag_sum, a.hr_sum, a.ts_sum
      |FROM (SELECT e, COUNT(*) AS n_dp, CAST(SUM(hr) AS BIGINT) AS hr_sum,
      |        CAST(SUM(ts) AS BIGINT) AS ts_sum
      |      FROM dpx WHERE e % 40 = 0 GROUP BY e) a
      |LEFT JOIN (SELECT e, CAST(SUM(m) AS BIGINT) AS mag_sum
      |           FROM sampm WHERE e % 40 = 0 GROUP BY e) mg
      |  ON a.e = mg.e""".stripMargin

  /** S6 (lake upsert through the real [[graft.sources.OsdbJson
    * .upsertEvents]]): k%3==0 keys are replaced with bumped values,
    * k%5==0 adds fresh keys — the INSERT OR REPLACE contract as one
    * ranking-union query vs the oracle's direct restatement. */
  def s6Upsert(s: SparkSession, d: String): DataFrame = {
    val ev = OsdbFixture.ev(s, d)
    val existing = ev.select(col("e").cast("string").as("id"),
      col("n_dp").as("v"), col("type_str"))
    val updates = ev.filter(col("k") % 3 === 0)
      .select(col("e").cast("string").as("id"),
        (col("n_dp") + 100).as("v"), col("type_str"))
      .unionByName(ev.filter(col("k") % 5 === 0)
        .select(concat(lit("n"), col("e").cast("string")).as("id"),
          col("n_dp").as("v"), col("type_str")))
    graft.sources.OsdbJson.upsertEvents(existing, updates, "id")
  }

  val s6Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS id,
      |  CAST(CASE WHEN k % 3 = 0 THEN n_dp + 100 ELSE n_dp END AS BIGINT) AS v,
      |  type_str
      |FROM ev
      |UNION ALL
      |SELECT 'n' || CAST(e AS VARCHAR) AS id, CAST(n_dp AS BIGINT) AS v, type_str
      |FROM ev WHERE k % 5 = 0""".stripMargin

  /** S8 (JSON sink, write -> read round-trip through the real
    * [[graft.sources.OsdbJson.writeEventsJson]]): nested fixture events
    * land in the category-partitioned JSON lake and are read back with
    * the explicit event schema (category recovered from the partition
    * dirs). Per-event integer invariants — dp count, hr/alarm sums, raw
    * magnitude sum — must survive the JSON serialization of the nested
    * datapoints array; the oracle derives them from the fixture directly,
    * so a lossy double, a dropped datapoint, or a mangled partition all
    * break the hash. */
  def s8JsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "s8_json")
    val ev = OsdbFixture.nested(s, d).filter(col("e_num") % 40 === 0)
      .withColumn("category", col("dataSourceName"))
      .drop("k", "e_num", "n_dp")
    graft.sources.OsdbJson.writeEventsJson(ev, dir)
    val back = s.read.schema(graft.model.Osdb.eventSchema).json(dir)
    back.select(col("id"), col("category"), explode(col("datapoints")).as("dp"))
      .groupBy("id", "category")
      .agg(count(lit(1)).as("n_dp"),
        sum(col("dp.hr").cast("long")).as("hr_sum"),
        sum(col("dp.alarmState")).as("alarm_sum"),
        sum(when(col("dp.rawData").isNotNull, sumLongUdf(col("dp.rawData")))
          .otherwise(0L)).as("mag_sum"))
  }

  val s8Sql: String = sqlBase +
    """SELECT CAST(a.e AS VARCHAR) AS id, a.category, a.n_dp, a.hr_sum,
      |  a.alarm_sum, COALESCE(mg.mag_sum, 0) AS mag_sum
      |FROM (SELECT e, data_source AS category, COUNT(*) AS n_dp,
      |        CAST(SUM(hr) AS BIGINT) AS hr_sum,
      |        CAST(SUM(alarm) AS BIGINT) AS alarm_sum
      |      FROM dpx WHERE e % 40 = 0 GROUP BY e, data_source) a
      |LEFT JOIN (SELECT e, CAST(SUM(m) AS BIGINT) AS mag_sum
      |           FROM sampm WHERE e % 40 = 0 GROUP BY e) mg
      |  ON a.e = mg.e""".stripMargin

  /** S9 (event-index CSV sink, write -> read round-trip through the real
    * [[graft.sources.OsdbJson.writeIndexCsv]]): the fixed column list,
    * dataTime ordering and quote-everything contract — a quoted free-text
    * desc, boolean flags and a formatted timestamp all pass through the
    * CSV as strings. The oracle restates the index fields from the
    * fixture formulas; min/max of the formatted dataTime check the
    * ordering-relevant column survives byte-exact (both engines format
    * the same naive UTC timestamp). */
  def s9IndexCsv(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "s9_index")
    val idx = OsdbFixture.ev(s, d).select(
      col("e").cast("string").as("id"),
      col("u").cast("string").as("userId"),
      date_format(timestamp_seconds(col("wts")), "yyyy-MM-dd HH:mm:ss").as("dataTime"),
      col("type_str").as("type"),
      col("sub_type").as("subType"),
      (col("k") % 6).as("osdAlarmState"),
      (col("k") % 4 =!= 1).as("has3dData"),
      (col("k") % 2 === 0).as("hasHrData"),
      (col("k") % 3 === 0).as("hasO2SatData"),
      concat(lit("ev "), col("e")).as("desc"))
    graft.sources.OsdbJson.writeIndexCsv(idx, dir)
    s.read.option("header", "true").csv(dir)
      .groupBy(col("has3dData"))
      .agg(count(lit(1)).as("n"),
        sum(col("id").cast("long")).as("id_sum"),
        sum(col("osdAlarmState").cast("long")).as("alarm_sum"),
        min(col("dataTime")).as("first_dt"),
        max(col("dataTime")).as("last_dt"))
  }

  val s9Sql: String = sqlBase +
    """SELECT CAST(k % 4 <> 1 AS VARCHAR) AS has3dData, COUNT(*) AS n,
      |  CAST(SUM(e) AS BIGINT) AS id_sum,
      |  CAST(SUM(k % 6) AS BIGINT) AS alarm_sum,
      |  MIN(strftime(make_timestamp(wts * 1000000), '%Y-%m-%d %H:%M:%S')) AS first_dt,
      |  MAX(strftime(make_timestamp(wts * 1000000), '%Y-%m-%d %H:%M:%S')) AS last_dt
      |FROM ev GROUP BY 1""".stripMargin

  /** S7 (MongoDB mirror sink, write -> read round-trip through the real
    * [[graft.sources.MongoSink]]): the e%30==0 nested-event slice lands
    * as mongoimport-ready Extended JSON NDJSON — event id as `_id`, a
    * synthesized TimestampType dataTime wrapped `{"$date": ISO-8601Z}`,
    * nested datapoints verbatim — and is read back through the wire
    * schema. The per-event invariants (dp count, hr/alarm sums) plus the
    * reformatted `$date` gate both directions: a broken `_id` rename, a
    * mis-wrapped or tz-shifted date, or a dropped datapoint all break
    * the hash. The oracle restates the slice from the fixture formulas —
    * both engines format the same naive UTC timestamp. */
  def s7MongoRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "s7_mongo")
    val ev = OsdbFixture.nested(s, d).filter(col("e_num") % 30 === 0)
      .withColumn("dataTime",
        timestamp_seconds(lit(1600000000L) + col("e_num") * 60))
      .drop("k", "e_num", "n_dp")
    graft.sources.MongoSink.writeEventsMongoJson(ev, dir,
      idCol = "id", dateCols = Seq("dataTime"))
    val back = graft.sources.MongoSink.readEventsMongoJson(s, dir, ev.schema,
      idCol = "id", dateCols = Seq("dataTime"))
    back.select(col("id"),
        date_format(col("dataTime"), "yyyy-MM-dd HH:mm:ss").as("dt"),
        explode(col("datapoints")).as("dp"))
      .groupBy("id", "dt")
      .agg(count(lit(1)).as("n_dp"),
        sum(col("dp.hr").cast("long")).as("hr_sum"),
        sum(col("dp.alarmState")).as("alarm_sum"))
  }

  val s7Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS id,
      |  strftime(make_timestamp((1600000000 + e * 60) * 1000000),
      |           '%Y-%m-%d %H:%M:%S') AS dt,
      |  COUNT(*) AS n_dp, CAST(SUM(hr) AS BIGINT) AS hr_sum,
      |  CAST(SUM(alarm) AS BIGINT) AS alarm_sum
      |FROM dpx WHERE e % 30 = 0 GROUP BY e""".stripMargin

  /** U3 (multi-file union through the real [[graft.sources.OsdbJson
    * .readEvents]] paths* overload): two single-file NDJSON category
    * files — the reference's one-JSON-file-per-category layout — read in
    * ONE scan, with the category recovered from each file name. The
    * staging write is the harness (coalesce(1) + rename to `<cat>.json`,
    * the layout the reference ships); the operator under test is the
    * union read + filename category extraction. */
  def u3MultifileUnion(s: SparkSession, d: String): DataFrame = {
    val base = new java.io.File(qtmp(s, "u3_union"))
    base.mkdirs()
    val ev = OsdbFixture.ev(s, d)
    def writeCat(df: DataFrame, cat: String): String = {
      val stage = new java.io.File(base, s"_stage_$cat")
      df.coalesce(1).write.mode("overwrite").json(stage.getAbsolutePath)
      val part = stage.listFiles().find(f => f.getName.startsWith("part-")
        && f.getName.endsWith(".json")).get
      val dest = new java.io.File(base, s"$cat.json")
      java.nio.file.Files.move(part.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dest.getAbsolutePath
    }
    def proj(df: DataFrame) = df.select(
      col("e").cast("string").as("id"),
      col("u").cast("string").as("userId"),
      col("type_str").as("type"),
      col("sub_type").as("subType"),
      col("data_source").as("dataSourceName"))
    val pa = writeCat(proj(ev.filter(col("k") % 2 === 0)), "catA")
    val pb = writeCat(proj(ev.filter(col("k") % 2 =!= 0)), "catB")
    graft.sources.OsdbJson.readEvents(s, Seq(pa, pb),
        multiLine = false, tidy = false)
      .groupBy("category")
      .agg(count(lit(1)).as("n"), sum(col("id").cast("long")).as("id_sum"))
  }

  val u3Sql: String = sqlBase +
    """SELECT CASE WHEN k % 2 = 0 THEN 'catA' ELSE 'catB' END AS category,
      |  COUNT(*) AS n, CAST(SUM(e) AS BIGINT) AS id_sum
      |FROM ev GROUP BY 1""".stripMargin

  /** S1 (multiLine JSON-ARRAY category file through the real
    * [[graft.sources.OsdbJson.readEvents]] multiLine=true branch —
    * the reference's native one-array-per-category layout,
    * osdDbConnection.py:101-126): the k%3==0 event slice is staged as
    * NDJSON by Spark, wrapped into a single `[...]` array file by the
    * harness (driver-side string assembly of an already-coalesced
    * single part file — same bounded-harness class as u3's rename),
    * and read back through the array-parsing code path with category
    * recovered from the file name. The oracle restates the slice from
    * the fixture formulas, so a mis-parsed array element, a dropped
    * row, or a broken filename-category extraction all break the hash.
    *
    * Scale note: a multiLine JSON array file is NOT splittable — Spark
    * parses it in one task, which is inherent to the S1 layout (the
    * reference's files are single arrays). The scale layout is NDJSON
    * (S2/U3) or the parquet lake; S1 exists for ingesting the
    * reference's own files. */
  def s1MultilineArray(s: SparkSession, d: String): DataFrame = {
    val base = new java.io.File(qtmp(s, "s1_array"))
    base.mkdirs()
    val ev = OsdbFixture.ev(s, d).filter(col("k") % 3 === 0)
      .select(
        col("e").cast("string").as("id"),
        col("u").cast("string").as("userId"),
        col("type_str").as("type"),
        col("sub_type").as("subType"),
        col("data_source").as("dataSourceName"))
    val stage = new java.io.File(base, "_stage_catC")
    ev.coalesce(1).write.mode("overwrite").json(stage.getAbsolutePath)
    val part = stage.listFiles().find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"no part- file in staged JSON dir $stage; contents: " +
          stage.listFiles().map(_.getName).mkString(", ")))
    val lines = java.nio.file.Files.readAllLines(part.toPath)
    val dest = new java.io.File(base, "catC.json")
    java.nio.file.Files.write(dest.toPath,
      lines.stream().collect(java.util.stream.Collectors.joining(",\n", "[", "]"))
        .getBytes("UTF-8"))
    graft.sources.OsdbJson.readEvents(s, Seq(dest.getAbsolutePath),
        multiLine = true, tidy = false)
      .groupBy("category")
      .agg(count(lit(1)).as("n"), sum(col("id").cast("long")).as("id_sum"))
  }

  val s1Sql: String = sqlBase +
    """SELECT 'catC' AS category, COUNT(*) AS n, CAST(SUM(e) AS BIGINT) AS id_sum
      |FROM ev WHERE k % 3 = 0""".stripMargin

  /** S4 (Web API event source through the real
    * [[graft.sources.WebApi]] DSv2 connector, webApiConnection.py
    * getEvents shape): the ub==3 fixture slice is staged as the
    * transport's cached listing for the FILTERED URL
    * `events/?user=3` — and ONLY that URL, so the query passes iff the
    * `userId = '3'` filter actually pushes down to the wire (an
    * unfiltered listing fetch dies loudly on the missing cache file).
    * The oracle restates the slice from the fixture formulas; the
    * file-cache transport is the reference's own download=False replay
    * mode, not a test-only shim. Same bounded staging-harness class as
    * s1/u3. */
  def s4WebApi(s: SparkSession, d: String): DataFrame = {
    val base = new java.io.File(qtmp(s, "s4_webapi"))
    base.mkdirs()
    val apiBase = "http://osdb.fixture/api"
    val listing = OsdbFixture.ev(s, d).filter(col("ub") === 3)
      .select(
        col("e").cast("string").as("id"),
        col("ub").cast("string").as("userId"),
        col("type_str").as("type"),
        col("sub_type").as("subType"))
    val stage = new java.io.File(base, "_stage_listing")
    listing.coalesce(1).write.mode("overwrite").json(stage.getAbsolutePath)
    val part = stage.listFiles().find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"no part- file in staged JSON dir $stage; contents: " +
          stage.listFiles().map(_.getName).mkString(", ")))
    val dest = new java.io.File(base,
      graft.sources.WebApi.cacheKey(s"$apiBase/events/?user=3"))
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    graft.sources.WebApi.readEvents(s, Map(
        "baseUrl" -> apiBase, "transport" -> "file",
        "fixtureDir" -> base.getAbsolutePath))
      .filter(col("userId") === "3")
      .groupBy("type")
      .agg(count(lit(1)).as("n"), sum(col("id").cast("long")).as("id_sum"))
  }

  val s4Sql: String = sqlBase +
    """SELECT type_str AS type, COUNT(*) AS n, CAST(SUM(e) AS BIGINT) AS id_sum
      |FROM ev WHERE ub = 3 GROUP BY 1""".stripMargin

  /** S14 — corrupt-record quarantine through
    * [[graft.sources.OsdbJson.readEventsQuarantined]]: the k%3==1
    * fixture slice is staged as NDJSON in k-order, the harness then
    * vandalizes every 10th LINE into non-JSON (unclosed-brace prefix),
    * and the quarantined read must route exactly those lines to
    * `_corrupt_record` (schema fields null) while parsing the rest
    * normally. The oracle restates good/corrupt counts and the
    * good-row id sum from the fixture formulas via the same
    * every-10th-by-k-rank rule — a mis-parsed good line, a silently
    * swallowed bad line, or an off-by-one in PERMISSIVE routing all
    * break the hash. Same bounded staging-harness class as s1.
    *
    * Scale note: this is the plan you want at 100 TB ingest — garbage
    * accounting and quarantine are a FILTER on the one scan that was
    * happening anyway, not a second validation pass over the corpus. */
  def s14CorruptQuarantine(s: SparkSession, d: String): DataFrame = {
    val base = new java.io.File(qtmp(s, "s14_quarantine"))
    base.mkdirs()
    val ev = OsdbFixture.ev(s, d).filter(col("k") % 3 === 1).orderBy("k")
      .select(
        col("e").cast("string").as("id"),
        col("u").cast("string").as("userId"),
        col("type_str").as("type"),
        col("sub_type").as("subType"),
        col("data_source").as("dataSourceName"))
    val stage = new java.io.File(base, "_stage")
    ev.coalesce(1).write.mode("overwrite").json(stage.getAbsolutePath)
    val part = stage.listFiles().find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"no part- file in staged JSON dir $stage; contents: " +
          stage.listFiles().map(_.getName).mkString(", ")))
    val lines = java.nio.file.Files.readAllLines(part.toPath)
    val sb = new StringBuilder
    var i = 0
    lines.forEach { l =>
      i += 1
      sb.append(if (i % 10 == 0) "{corrupt " + l else l).append('\n')
    }
    val dest = new java.io.File(base, "feed.json")
    java.nio.file.Files.write(dest.toPath, sb.toString.getBytes("UTF-8"))
    graft.sources.OsdbJson.readEventsQuarantined(s, dest.getAbsolutePath)
      .agg(
        count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
        count(col("_corrupt_record")).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("id").cast("long")))
          .as("id_sum"))
  }

  val s14Sql: String = sqlBase +
    """SELECT COUNT(*) FILTER (WHERE rn % 10 <> 0) AS n_good,
      |       COUNT(*) FILTER (WHERE rn % 10 = 0) AS n_corrupt,
      |       CAST(SUM(e) FILTER (WHERE rn % 10 <> 0) AS BIGINT) AS id_sum
      |FROM (SELECT e, row_number() OVER (ORDER BY k) AS rn
      |      FROM ev WHERE k % 3 = 1)""".stripMargin

  /** LAKE1 — partition-pruned lake access END TO END: write the events
    * table as a category-partitioned parquet lake through the real
    * [[graft.sources.OsdbJson.writeEventsParquet]] (the SURVEY §1.3
    * normalized layout, category = the reference's per-category file
    * split re-expressed as a partition column), then read ONE category
    * back with the partition filter doing the pruning. At 100 TB this
    * is the single biggest scan lever the engine has: the filtered read
    * lists and scans ONE directory of the lake — the other categories'
    * files are never opened. PlanSpec pins the executed plan
    * (PartitionFilters non-empty, category=purchase); this entry pins
    * the VALUES against DuckDB running the same slice off the original
    * table, so layout round-trip and pruning correctness are both
    * gated. The aggregate uses count/max only — exact at any fold
    * order, so the hash gate is FP-safe. */
  def lake1Write(s: SparkSession, d: String): String = {
    val dir = qtmp(s, "lake1_lake")
    graft.sources.OsdbJson.writeEventsParquet(
      graft.Tables.events(s, d).withColumn("category", col("event_type")), dir)
    dir
  }

  /** The read side, exposed separately so PlanSpec can pin the pruned
    * scan on exactly the DataFrame the declared entry executes. */
  def lake1Read(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)
      .filter(col("category") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))

  def lake1PrunedScan(s: SparkSession, d: String): DataFrame =
    lake1Read(s, lake1Write(s, d))

  val lake1Sql: String =
    """SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
      |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  /** LAKE2 — BUCKETED CO-LOCATED JOIN end to end: the second of the two
    * big 100 TB scan/shuffle levers (lake1 demonstrates partition
    * pruning; this demonstrates bucketing). The events fact table and a
    * per-user profile dimension are both written as 16-bucket parquet
    * tables bucketed by `user_id` — each side pre-repartitioned on the
    * bucket key so every bucket is exactly ONE file — and the join then
    * plans as a sort-merge join with NO exchange on either input: the
    * bucket layout IS the shuffle, paid once at write time and amortized
    * over every subsequent join. At 100 TB this turns the recurring
    * fact-dim co-location shuffle (the biggest repeated cost in a
    * star-schema pipeline) into a one-time layout decision. The `merge`
    * hint pins the sort-merge path at test scale, where the planner
    * would otherwise broadcast the small dim (the regime bucketing
    * exists for is the one where BOTH sides are too big to broadcast);
    * PlanSpec pins the executed plan — both scans `Bucketed: true`, no
    * exchange or sort on the join keys — and the DuckDB oracle pins the
    * joined VALUES (all-integer aggregates, exact at any fold order). */
  def lake2Write(s: SparkSession, d: String): (String, String) = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val profile = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_user"))
    def writeBucketed(df: DataFrame, table: String, path: String): Unit =
      df.repartition(16, col("user_id"))
        .write.format("parquet").option("path", path)
        .bucketBy(16, "user_id").sortBy("user_id")
        .mode("overwrite").saveAsTable(table)
    writeBucketed(ev, "graft_lake2_events", qtmp(s, "lake2_events"))
    writeBucketed(profile, "graft_lake2_profile", qtmp(s, "lake2_profile"))
    ("graft_lake2_events", "graft_lake2_profile")
  }

  /** The read side, exposed separately so PlanSpec can pin the
    * exchange-free bucketed join on exactly the DataFrame the declared
    * entry executes. */
  def lake2Read(s: SparkSession, evTable: String, dimTable: String): DataFrame =
    s.table(evTable).hint("merge").join(s.table(dimTable), "user_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("n_user")).as("sum_user_events"))

  def lake2BucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (evT, dimT) = lake2Write(s, d)
    lake2Read(s, evT, dimT)
  }

  val lake2Sql: String =
    """WITH p AS (SELECT user_id, COUNT(*) AS n_user FROM events GROUP BY 1)
      |SELECT e.event_type, COUNT(*) AS n,
      |  CAST(SUM(p.n_user) AS BIGINT) AS sum_user_events
      |FROM events e JOIN p USING (user_id) GROUP BY 1""".stripMargin

  /** LAKE3 — SMALL-FILE COMPACTION end to end ([[graft.sources
    * .LakeMaintenance.compact]]): the maintenance lever that keeps
    * lake1's layout healthy under churn. The harness fabricates ingest
    * sprawl (32 writer tasks per partition — the shape every
    * incremental/streaming sink leaves behind), compaction rewrites it
    * as one declarative repartition-by-partition job with
    * `maxRecordsPerFile` bounding files per directory — no driver loop,
    * same plan at 10 or 10,000 partitions — and the entry reads the
    * COMPACTED lake back for per-category integer invariants (count,
    * distinct users, event-id sum) the DuckDB oracle states off the
    * original table: a dropped row-group, a partition mixed into the
    * wrong directory, or a corrupted rewrite all break the hash.
    * PlanSpec-style file-count assertions (32+ files -> 1 per
    * partition) live in the OperatorsSpec test, where the
    * environment-dependent part (file sizes) belongs. */
  def lake3Compaction(s: SparkSession, d: String): DataFrame = {
    val src = qtmp(s, "lake3_src")
    val dst = qtmp(s, "lake3_dst")
    graft.Tables.events(s, d).withColumn("category", col("event_type"))
      .repartition(32)
      .write.mode("overwrite").partitionBy("category").parquet(src)
    graft.sources.LakeMaintenance.compact(s, src, dst, "category",
      maxRecordsPerFile = 1L << 20)
    s.read.parquet(dst)
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("id_sum"))
  }

  val lake3Sql: String =
    """SELECT event_type AS category, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events GROUP BY 1""".stripMargin

  private val lake8RunId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** LAKE8 — snapshot versioning / TIME TRAVEL end to end
    * ([[graft.sources.LakeMaintenance.commitVersion]]/readVersion):
    * commit v1 (one user cohort), commit v2 as an APPEND carrying v1's
    * manifest forward (a second cohort), then — with both commits on
    * disk — read BOTH versions and aggregate each. The v1 read after
    * v2's commit must see only v1's file set (snapshot isolation, the
    * reproducible-training-run property); the oracle restates both
    * snapshots' content from the source table, so a version leaking
    * newer files, losing carried ones, or double-counting an appended
    * row breaks the hash. */
  def lake8TimeTravel(s: SparkSession, d: String): DataFrame = {
    // fresh lake per invocation: versions are immutable BY CONTRACT
    // (commitVersion fails loudly on re-commit), and Bench re-runs every
    // declared query three times in one session
    val dir = qtmp(s, s"lake8_lake_${lake8RunId.incrementAndGet()}")
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 0), version = 1)
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 1), version = 2,
      carryFrom = Some(1))
    def agg(v: Int): DataFrame =
      graft.sources.LakeMaintenance.readVersion(s, dir, v)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
        .select(lit(v.toLong).as("version"), col("event_type"), col("n"),
          col("id_sum"))
    agg(1).unionByName(agg(2))
  }

  val lake8Sql: String =
    """SELECT 1 AS version, event_type, COUNT(*) AS n,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events WHERE user_id % 3 = 0 GROUP BY 2
      |UNION ALL
      |SELECT 2, event_type, COUNT(*),
      |  CAST(SUM(event_id) AS BIGINT)
      |FROM events WHERE user_id % 3 IN (0, 1) GROUP BY 2""".stripMargin

  /** RPT1 — the report layer's category index as a distributed
    * aggregate ([[graft.report.Summarise.indexSummary]], the
    * reference's summary_index bucketing at summariseData.py:168-180):
    * Tonic-Clonic seizures must land in BOTH tcSeizures and
    * allSeizures, the rest partition by type — the oracle restates the
    * four buckets (with the deliberate tc ⊂ all overlap) from the
    * fixture formulas, so a mis-bucketed event, a lost duplicate
    * membership, or a wrong per-event dp count breaks the hash. The
    * HTML rendering itself is ReportSpec's (byte-level SVG/structure
    * pins belong in specs, not row hashes). Shape-only fixture
    * (arrays=false): the index never needs sample arrays. */
  def rpt1SummaryIndex(s: SparkSession, d: String): DataFrame =
    graft.report.Summarise.indexSummary(
        OsdbFixture.nested(s, d, arrays = false))
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        sum(col("id").cast("long")).as("id_sum"),
        sum(col("n_dp")).as("dp_sum"))

  val rpt1Sql: String = sqlBase +
    """SELECT category, COUNT(*) AS n, CAST(SUM(e) AS BIGINT) AS id_sum,
      |  CAST(SUM(n_dp) AS BIGINT) AS dp_sum
      |FROM (
      |  SELECT 'tcSeizures' AS category, e, n_dp FROM ev
      |    WHERE k % 3 = 0 AND k % 5 < 2
      |  UNION ALL SELECT 'allSeizures', e, n_dp FROM ev WHERE k % 3 = 0
      |  UNION ALL SELECT 'falseAlarms', e, n_dp FROM ev WHERE k % 3 = 1
      |  UNION ALL SELECT 'otherEvents', e, n_dp FROM ev WHERE k % 3 = 2
      |) GROUP BY 1""".stripMargin

  /** RPT2 — the per-user summary rollup
    * ([[graft.report.Summarise.userSummary]], userSummary.template's
    * data): (user, category) event + datapoint counts, sharing rpt1's
    * bucketing (so the tc ⊂ all overlap must hold PER USER too). */
  def rpt2UserSummary(s: SparkSession, d: String): DataFrame =
    graft.report.Summarise.userSummary(
      OsdbFixture.nested(s, d, arrays = false))

  val rpt2Sql: String = sqlBase +
    """SELECT userId, category, COUNT(*) AS n, CAST(SUM(n_dp) AS BIGINT) AS dp_sum
      |FROM (
      |  SELECT CAST(u AS VARCHAR) AS userId, 'tcSeizures' AS category, n_dp
      |    FROM ev WHERE k % 3 = 0 AND k % 5 < 2
      |  UNION ALL SELECT CAST(u AS VARCHAR), 'allSeizures', n_dp
      |    FROM ev WHERE k % 3 = 0
      |  UNION ALL SELECT CAST(u AS VARCHAR), 'falseAlarms', n_dp
      |    FROM ev WHERE k % 3 = 1
      |  UNION ALL SELECT CAST(u AS VARCHAR), 'otherEvents', n_dp
      |    FROM ev WHERE k % 3 = 2
      |) GROUP BY 1, 2""".stripMargin

  /** ML1 — the evaluation half of the training stage
    * ([[graft.ml.Trainer.auroc]]): exact Mann-Whitney AUROC with
    * average ranks for ties, over a deterministic fixture scoring
    * (p = k mod 13 — 13 distinct scores, heavy ties, both classes in
    * every tie group). Every intermediate is integers and exact binary
    * halves, so the one final division is IEEE-identical across
    * engines; ×1e9 floor makes the hash integer. The TRAINER itself is
    * spec-gated (TrainerSpec's planted-separable corpus) — LBFGS float
    * accumulation is not a cross-engine contract, but the metric that
    * judges it is. */
  def ml1Auroc(s: SparkSession, d: String): DataFrame = {
    val scored = OsdbFixture.ev(s, d).select(
      (col("k") % 13).cast("double").as("p"),
      when(col("k") % 3 === 0, 1.0).otherwise(0.0).as("label"))
    val a = graft.ml.Trainer.auroc(scored, "p", "label")
    import s.implicits._
    Seq(math.floor(a * 1e9).toLong).toDF("auroc_x1e9")
  }

  val ml1Sql: String = sqlBase +
    // parenthesization matters: the Spark side computes floor(1e9 * a)
    // with a = num/den already divided — the SQL must divide FIRST too
    // ((1e9*num)/den has a different rounding path and can floor one
    // integer apart when 1e9*num exceeds 2^53)
    """SELECT CAST(FLOOR(1e9 * ((rsp - npos * (npos + 1) / 2.0)
      |                  / (npos * (nall - npos)))) AS BIGINT) AS auroc_x1e9
      |FROM (
      |  SELECT SUM((cumN - (n - 1) / 2.0) * npos) AS rsp,
      |         SUM(npos) AS npos, SUM(n) AS nall
      |  FROM (
      |    SELECT p, n, npos, SUM(n) OVER (ORDER BY p) AS cumN
      |    FROM (SELECT CAST(k % 13 AS DOUBLE) AS p, COUNT(*) AS n,
      |                 SUM(CASE WHEN k % 3 = 0 THEN 1.0 ELSE 0.0 END) AS npos
      |          FROM ev GROUP BY 1)))""".stripMargin

  /** ML2 — the COMPOSED runSequence lineage under the oracle gate
    * ([[graft.ml.RunSequence.skeleton]], the reference's headline
    * workflow `user_tools/nnTraining2/runSequence.py:799,995-1224` as
    * one Spark plan): select (F5) → fused flatten+validate (P14) →
    * epoch features (P12) → lag history (W7) → k-fold slices (M2) →
    * copy-augmentation plan (M3 + M7) → the F14 contamination guard,
    * all read off as (fold, stage, n_events, n_epochs) rows.
    *
    * The counts come from the REAL composed frames — the per-event
    * epoch counts are whatever the fused P14→P12→W7 lineage actually
    * emits — while the oracle restates them from the fixture's closed
    * forms: validated datapoint count = the kept-d span (interior
    * skips gap-fill back to contiguity, leading/trailing skips
    * shorten the record), epochs = validated dps (window = step =
    * 125), history drop = historyN−1 = 2 per event, augment
    * multiplier = 2 for seizures ×2 again for tonic-clonic, fold =
    * knuthHash32(id) % 3. A lost gap-fill, a mis-dropped history row,
    * a plan over/under-copy, or a fold leak (guard rows MUST be 0)
    * each break the hash.
    *
    * Selection (type ≠ Unknown ∧ u % 2 = 0) keeps both seizure and
    * false-alarm folds, both 3D-present (k%4≠1) and gap-fill
    * (k%4=1) validation branches, and TC/non-TC augment paths, at
    * ~1/3 of the fixture — the same workload class as p12 plus the
    * history window and skeleton aggregates. */
  def ml2RunSequence(s: SparkSession, d: String): DataFrame = {
    val events = OsdbFixture.ev(s, d).select(
      col("e").as("id"), col("u"),
      col("type_str").as("type"), col("sub_type").as("subType"))
    val dps = OsdbFixture.flatDps(s, d,
      where = col("k") % 3 =!= 2 && col("u") % 2 === 0)
    graft.ml.RunSequence.skeleton(
      events, dps,
      select = col("type") =!= "Unknown" && col("u") % 2 === 0,
      foldOf = Exact.knuthHash32(col("id")) % 3)
  }

  val ml2Sql: String = sqlBase +
    """, ndpp AS (
      |  SELECT e, MAX(d) - MIN(d) + 1 AS ndp2
      |  FROM dpx
      |  WHERE (k % 4 <> 1 OR (k + d) % 7 <> 0)
      |    AND k % 3 <> 2 AND u % 2 = 0
      |  GROUP BY e),
      |selml AS (
      |  SELECT ev.e, ((ev.e * 2654435761) % 4294967296) % 3 AS fold,
      |         GREATEST(ndp2 - 2, 0) AS nep,
      |         CASE WHEN ev.label = 1 AND ev.sub_type = 'tonicClonic' THEN 4
      |              WHEN ev.label = 1 THEN 2 ELSE 1 END AS mult
      |  FROM ev JOIN ndpp ON ev.e = ndpp.e
      |  WHERE ev.k % 3 <> 2 AND ev.u % 2 = 0),
      |foldsml AS (SELECT unnest(range(0, 3)) AS f)
      |SELECT f AS fold, 'train' AS stage, COUNT(*) AS n_events,
      |       CAST(SUM(nep) AS BIGINT) AS n_epochs
      |FROM selml, foldsml WHERE fold <> f GROUP BY f
      |UNION ALL
      |SELECT f, 'train_aug', CAST(SUM(mult) AS BIGINT),
      |       CAST(SUM(mult * nep) AS BIGINT)
      |FROM selml, foldsml WHERE fold <> f GROUP BY f
      |UNION ALL
      |SELECT f, 'test', COUNT(*), CAST(SUM(nep) AS BIGINT)
      |FROM selml, foldsml WHERE fold = f GROUP BY f
      |UNION ALL
      |SELECT f, 'guard', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |FROM foldsml""".stripMargin

  /** CFG1 — the CONFIG-JSON entry point under the oracle gate
    * ([[graft.config.ConfigBridge]], the last parity surface from the
    * round-16 verdict): the reference's own shipped `nnConfig.json`
    * (checked-in verbatim at `/osdb/nnConfig.json`;
    * `user_tools/nnTraining2/nnConfig.json`) drives the ml2 skeleton
    * END TO END — `eventFilters` compiles to the F5/F6 predicate
    * (require3dData=true → k%4≠1; excludeDataSources "Phone" substring-
    * matches the fixture's PhoneApp → k%4≠2; excludeText probes the
    * null-desc path; excludeSubTypes matches nothing by content),
    * `dataProcessing` supplies window/step/highPass (125/125/0.5 —
    * the extraction kernel config), addFeatureHistoryLength=5 → the
    * W7 drop is 4 rows per event (vs ml2's 2 — a bridge that ignored
    * the file and used engine defaults breaks the hash), and
    * oversample="none" → multiplier 1 (train_aug == train, vs the
    * engine default ×2 — same tripwire). `modelConfig.modelClass`
    * resolves through [[graft.ml.RunSequence.NestedCandidate
    * .forModelClass]] and the resolved (class, basis) pair is emitted
    * as a receipt row the oracle pins as a constant — if the file's
    * modelClass changed, the Spark side would emit a different string.
    *
    * The oracle restates the config's effect from the fixture's closed
    * forms: selection k%4∉{1,2}, epochs = GREATEST(n_dp − 4, 0)
    * (historyN 5; n_dp = 4+k%5 ∈ 4..8, so the 0-epoch branch is
    * exercised at n_dp=4), fold = knuthHash32(e) % 3, guard ≡ 0. */
  def cfg1ConfigBridge(s: SparkSession, d: String): DataFrame = {
    import graft.config.ConfigBridge
    val doc = ConfigBridge.validateTop(ConfigBridge.loadResource("/osdb/nnConfig.json"))
    val efc = ConfigBridge.eventFilters(doc)
    val dp = ConfigBridge.dataProcessing(doc)
    val cfg = ConfigBridge.runSequenceConfig(dp, k = 3)
    // the importlib-string dispatch must RESOLVE (fail-loud wiring);
    // the receipt row pins which family+basis the file selected
    val cand = graft.ml.RunSequence.NestedCandidate.forModelClass(
      ConfigBridge.modelClass(doc), ConfigBridge.subtypeWeights(doc))
    val events = OsdbFixture.ev(s, d).select(
      col("e").as("id"), col("u").as("userId"),
      col("type_str").as("type"), col("sub_type").as("subType"),
      col("data_source").as("dataSourceName"),
      lit(null).cast("string").as("desc"),
      (col("k") % 4 =!= 1).as("has3dData"),
      // honest any-datapoint flags from the fixture's closed forms
      // (not consulted by the shipped config's require*=false, but
      // real if a config flips them)
      expr("exists(sequence(0L, n_dp - 1), dd -> (k + dd) % 4 >= k % 5)")
        .as("hasHrData"),
      expr("exists(sequence(0L, n_dp - 1), dd -> (k*2 + dd) % 6 >= k % 7)")
        .as("hasO2SatData"))
    val dps = OsdbFixture.flatDps(s, d,
      where = col("k") % 4 =!= 1 && col("k") % 4 =!= 2)
    val skel = graft.ml.RunSequence.skeleton(
      events, dps,
      select = EventFilters.compile(efc),
      foldOf = Exact.knuthHash32(col("id")) % 3,
      cfg = cfg)
    val receipt = s.range(1).select(
      lit(-1L).as("fold"),
      lit(s"model_class:${cand.name}:${cand.basis}").as("stage"),
      lit(0L).as("n_events"), lit(0L).as("n_epochs"))
    skel.unionByName(receipt)
  }

  val cfg1Sql: String = sqlBase +
    """, ndpc AS (
      |  SELECT e, MAX(d) - MIN(d) + 1 AS ndp2
      |  FROM dpx WHERE k % 4 NOT IN (1, 2)
      |  GROUP BY e),
      |selcfg AS (
      |  SELECT ev.e, ((ev.e * 2654435761) % 4294967296) % 3 AS fold,
      |         GREATEST(ndp2 - 4, 0) AS nep
      |  FROM ev JOIN ndpc ON ev.e = ndpc.e
      |  WHERE ev.k % 4 NOT IN (1, 2)),
      |foldc AS (SELECT unnest(range(0, 3)) AS f)
      |SELECT f AS fold, 'train' AS stage, COUNT(*) AS n_events,
      |       CAST(SUM(nep) AS BIGINT) AS n_epochs
      |FROM selcfg, foldc WHERE fold <> f GROUP BY f
      |UNION ALL
      |SELECT f, 'train_aug', COUNT(*), CAST(SUM(nep) AS BIGINT)
      |FROM selcfg, foldc WHERE fold <> f GROUP BY f
      |UNION ALL
      |SELECT f, 'test', COUNT(*), CAST(SUM(nep) AS BIGINT)
      |FROM selcfg, foldc WHERE fold = f GROUP BY f
      |UNION ALL
      |SELECT f, 'guard', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |FROM foldc
      |UNION ALL
      |SELECT -1, 'model_class:rfModel.RfModel:features',
      |       CAST(0 AS BIGINT), CAST(0 AS BIGINT)""".stripMargin

  /** The ml3 network: FIXED small-integer weights (3 filters × width
    * 4) so that, over the fixture's integer magnitude samples, every
    * intermediate of the real CNN forward pass — conv sums, ReLU'd
    * max-pool, dense logit — is an exact integer (|logit| ≪ 2^53) and
    * the cross-engine compare is a plain hash. ONE source of truth:
    * [[ml3Sql]] is GENERATED from this object's weights, so the Spark
    * plan and the DuckDB restatement cannot drift. */
  private val ml3Net: graft.ml.Cnn.CnnModel = {
    val nf = 3; val w = 4
    graft.ml.Cnn.CnnModel(nf, w, window = 125,
      filters = Array.tabulate(nf * w)(i =>
        (((i / w) * 7 + (i % w) * 3) % 5 - 2).toDouble),
      filterBias = Array.tabulate(nf)(f => (f - 1).toDouble),
      dense = Array.tabulate(nf)(f => ((f * 3) % 5 - 2).toDouble),
      bias = 1.0, mean = 0.0, std = 1.0)
  }

  /** ML3 — the 1-D CNN forward pass under the oracle gate
    * ([[graft.ml.Cnn.logitCol]], the architecture boundary the
    * round-12 verdict listed as missing #2, `user_tools/nnTraining2/
    * cnnModel.py:43-76`): conv → ReLU → global max-pool → dense logit
    * over every present magnitude window, as native codegen'd column
    * expressions. The TRAINER is spec-gated (CnnSpec's
    * planted-separable corpus — LBFGS float accumulation is not a
    * cross-engine contract); the architecture the training optimizes
    * IS gated here, bit-exactly, via [[ml3Net]]'s integer weights. */
  def ml3CnnForward(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        graft.ml.Cnn.logitCol(ml3Net, col("rawData"))
          .cast("long").as("logit"))

  val ml3Sql: String = {
    val m = ml3Net
    val pools = (0 until m.nFilters).map { f =>
      val terms = (0 until m.width).map(j =>
        s"(${m.filters(f * m.width + j).toLong})*xs[t+$j]")
        .mkString(" + ")
      s"GREATEST(0, list_max([${m.filterBias(f).toLong} + $terms " +
        s"for t in range(1, ${m.window - m.width + 2})])) AS p$f"
    }
    val dense = (0 until m.nFilters)
      .map(f => s"(${m.dense(f).toLong})*p$f").mkString(" + ")
    sqlBase +
      s""", xsml AS (
         |  SELECT e, d, list(m ORDER BY i) AS xs FROM sampm GROUP BY e, d),
         |poolml AS (SELECT e, d, ${pools.mkString(", ")} FROM xsml)
         |SELECT e, d, CAST(${m.bias.toLong} + $dense AS BIGINT) AS logit
         |FROM poolml""".stripMargin
  }

  /** The ml4 network: FIXED quarter-grid weights (H = 2 units) so
    * that, over the fixture's integer magnitude samples scaled by the
    * EXACT dyadic (m − 1000)/64, the hard-gate recurrence is pure IEEE
    * mul/add/compare with the same operation order on both engines —
    * bit-identical doubles out of a 125-step recursion, no grid bridge
    * needed. ONE source of truth: [[ml4Sql]] is GENERATED from this
    * object's weights. */
  private val ml4Net: graft.ml.Lstm.LstmModel = {
    val h = 2
    graft.ml.Lstm.LstmModel(h, window = 125,
      wx = Array.tabulate(4 * h)(j => ((j * 5) % 7 - 3) * 0.25),
      wh = Array.tabulate(4 * h * h)(j => ((j * 3) % 5 - 2) * 0.25),
      b = Array.tabulate(4 * h)(j => ((j * 2) % 3 - 1) * 0.25),
      dense = Array(1.0, -1.0),
      bias = 0.25, mean = 1000.0, std = 64.0)
  }

  /** ML4 — the hard-gate LSTM forward pass under the oracle gate
    * ([[graft.ml.Lstm.logitCol]], the RECURRENT half of the round-12
    * verdict's missing #2; the reference's AMBER LSTM family,
    * `user_tools/nnTraining2/amber/model.py:31-39`): z-scale →
    * 125-step LSTM cell → dense logit over every present magnitude
    * window, as one native codegen'd expression. The TRAINER is
    * spec-gated (LstmSpec: finite-difference BPTT check +
    * planted-separable corpus); the architecture the training
    * optimizes IS gated here via [[ml4Net]], with the oracle replaying
    * the recurrence as a DuckDB recursive CTE — feasible only because
    * the hard gates are piecewise-linear (no libm transcendentals to
    * diverge by ulps). */
  def ml4LstmForward(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        graft.ml.Lstm.logitCol(ml4Net, col("rawData")).as("logit"))

  val ml4Sql: String = {
    val m = ml4Net
    val H = m.nUnits
    def L(d: Double): String = if (d < 0) s"($d)" else d.toString
    // gate pre-activation: b + wx*x + wh0*h0 + wh1*h1 (left-assoc,
    // matching the expression's accumulation order exactly)
    def pre(g: Int, u: Int): String = {
      val whTerms = (0 until H)
        .map(v => s"${L(m.wh((g * H + u) * H + v))}*h$v").mkString(" + ")
      s"${L(m.b(g * H + u))} + ${L(m.wx(g * H + u))}*x + $whTerms"
    }
    def sig(a: String): String =
      s"CASE WHEN $a < -2.0 THEN 0.0 WHEN $a > 2.0 THEN 1.0 ELSE 0.25*$a + 0.5 END"
    def tnh(a: String): String =
      s"CASE WHEN $a < -1.0 THEN -1.0 WHEN $a > 1.0 THEN 1.0 ELSE $a END"
    val preCols = (for (g <- 0 until 4; u <- 0 until H)
      yield s"${pre(g, u)} AS a${g}_$u").mkString(",\n      |        ")
    val gateCols = (0 until H).map { u =>
      s"${sig(s"a0_$u")} AS gi$u, ${sig(s"a1_$u")} AS gf$u, " +
        s"${tnh(s"a2_$u")} AS gg$u, ${sig(s"a3_$u")} AS go$u"
    }.mkString(",\n      |        ")
    val cnCols = (0 until H)
      .map(u => s"gf$u*c$u + gi$u*gg$u AS cn$u").mkString(", ")
    val hOut = (0 until H)
      .map(u => s"go$u * (${tnh(s"cn$u")}) AS h$u").mkString(",\n      |       ")
    val cOut = (0 until H).map(u => s"cn$u AS c$u").mkString(", ")
    val stateInit = (0 until H)
      .map(u => s"CAST(0.0 AS DOUBLE) AS h$u").mkString(", ") + ", " +
      (0 until H).map(u => s"CAST(0.0 AS DOUBLE) AS c$u").mkString(", ")
    val stateCarry = (0 until H)
      .map(u => s"s.h$u AS h$u").mkString(", ") + ", " +
      (0 until H).map(u => s"s.c$u AS c$u").mkString(", ")
    val logit = s"${L(m.bias)} + " +
      (0 until H).map(u => s"${L(m.dense(u))}*h$u").mkString(" + ")
    sqlBase.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""", edml4 AS (SELECT e, d FROM sampm WHERE i = 0),
         |lstm AS (
         |  SELECT e, d, 0 AS t, $stateInit FROM edml4
         |  UNION ALL
         |  SELECT e, d, t,
         |       $hOut,
         |       $cOut
         |  FROM (
         |    SELECT *, $cnCols FROM (
         |      SELECT *,
         |        $gateCols
         |      FROM (
         |        SELECT *,
         |        $preCols
         |        FROM (
         |          SELECT s.e AS e, s.d AS d, s.t + 1 AS t,
         |                 $stateCarry,
         |                 (p.m - 1000.0)/64.0 AS x
         |          FROM lstm s JOIN sampm p
         |            ON p.e = s.e AND p.d = s.d AND p.i = s.t
         |          WHERE s.t < ${m.window}))))
         |)
         |SELECT e, d, $logit AS logit FROM lstm WHERE t = ${m.window}""".stripMargin
  }

  /** The ml4b network: the STACKED two-layer hard-gate LSTM + mean-pool
    * head ([[graft.ml.LstmStack]] — the round-13 verdict's missing #1)
    * with FIXED quarter-grid weights, H1 = H2 = 2. Same exactness
    * reasoning as [[ml4Net]]: dyadic weights over the exact dyadic
    * (m − 1000)/64 input keep the whole two-layer recurrence AND the
    * pool accumulation pure IEEE mul/add/compare; the single division
    * s/T at the head is one op on both engines. ONE source of truth:
    * [[ml4bSql]] is GENERATED from this object's weights. */
  private val ml4bNet: graft.ml.LstmStack.Lstm2Model = {
    val h1 = 2; val h2 = 2
    graft.ml.LstmStack.Lstm2Model(h1, h2, window = 125,
      wx1 = Array.tabulate(4 * h1)(j => ((j * 5) % 7 - 3) * 0.25),
      wh1 = Array.tabulate(4 * h1 * h1)(j => ((j * 3) % 5 - 2) * 0.25),
      b1 = Array.tabulate(4 * h1)(j => ((j * 2) % 3 - 1) * 0.25),
      wx2 = Array.tabulate(4 * h2 * h1)(j => ((j * 7) % 5 - 2) * 0.25),
      wh2 = Array.tabulate(4 * h2 * h2)(j => ((j * 3) % 7 - 3) * 0.25),
      b2 = Array.tabulate(4 * h2)(j => ((j * 5) % 3 - 1) * 0.25),
      dense = Array(1.0, -1.0),
      bias = 0.25, mean = 1000.0, std = 64.0)
  }

  /** ML4B — the STACKED LSTM forward pass under the oracle gate
    * ([[graft.ml.LstmStack.logitCol]]): z-scale → layer-1 hard-gate
    * recurrence → layer-2 recurrence over layer 1's hidden sequence →
    * mean-pool over time → dense logit, as one native codegen'd
    * expression. The TRAINER is spec-gated (LstmStackSpec: two-layer
    * BPTT == finite differences + planted corpus); the architecture is
    * gated HERE via [[ml4bNet]], the oracle replaying BOTH layers plus
    * the pool sums as one DuckDB recursive CTE — 10 state columns per
    * (e, d) row, bit-exact because nothing transcendental ever runs. */
  def ml4bLstmStackForward(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        graft.ml.LstmStack.logitCol(ml4bNet, col("rawData")).as("logit"))

  /** Shared generator for the stacked-LSTM recursive-CTE oracles (ml4b
    * mean head / ml4c attention head): BOTH layers' states, the head
    * accumulators (pool sums; plus the attention denominator), replayed
    * step-by-step with the expression's exact accumulation order.
    * `edCte`/`cteName` keep the two oracles' CTE names distinct so the
    * prefix stays shared. */
  private def lstm2StackSql(m: graft.ml.LstmStack.Lstm2Model,
                            edCte: String, cteName: String): String = {
    val attn = m.head == "attn"
    if (m.bidir) return lstm2BidirSql(m, edCte, cteName)
    // the mha head is rendered only by the bidirectional generator
    // (ml4e's config); a unidir-mha oracle would need its head columns
    // added here — fail loudly rather than emit the mean-head SQL
    require(m.head != "mha",
      "lstm2StackSql: mha head not implemented for the unidir renderer")
    val H1 = m.h1; val H2 = m.h2
    def L(d: Double): String = if (d < 0) s"($d)" else d.toString
    def sig(a: String): String =
      s"CASE WHEN $a < -2.0 THEN 0.0 WHEN $a > 2.0 THEN 1.0 ELSE 0.25*$a + 0.5 END"
    def tnh(a: String): String =
      s"CASE WHEN $a < -1.0 THEN -1.0 WHEN $a > 1.0 THEN 1.0 ELSE $a END"
    // layer-1 pre: b + wx*x + wh0*h1_0 + wh1*h1_1 (left-assoc = the
    // expression's accumulation order)
    def pre1(g: Int, u: Int): String = {
      val whTerms = (0 until H1)
        .map(v => s"${L(m.wh1((g * H1 + u) * H1 + v))}*h1_$v").mkString(" + ")
      s"${L(m.b1(g * H1 + u))} + ${L(m.wx1(g * H1 + u))}*x + $whTerms"
    }
    // layer-2 pre: b2 + wx2 terms over h1n_j (j ascending) + wh2 terms
    // over the CARRIED h2_v (v ascending)
    def pre2(g: Int, u: Int): String = {
      val wxTerms = (0 until H1)
        .map(j => s"${L(m.wx2((g * H2 + u) * H1 + j))}*h1n_$j").mkString(" + ")
      val whTerms = (0 until H2)
        .map(v => s"${L(m.wh2((g * H2 + u) * H2 + v))}*h2_$v").mkString(" + ")
      s"${L(m.b2(g * H2 + u))} + $wxTerms + $whTerms"
    }
    val pre1Cols = (for (g <- 0 until 4; u <- 0 until H1)
      yield s"${pre1(g, u)} AS a1${g}_$u").mkString(",\n        ")
    val gate1Cols = (0 until H1).map { u =>
      s"${sig(s"a10_$u")} AS i1$u, ${sig(s"a11_$u")} AS f1$u, " +
        s"${tnh(s"a12_$u")} AS g1$u, ${sig(s"a13_$u")} AS o1$u"
    }.mkString(",\n        ")
    val cn1Cols = (0 until H1)
      .map(u => s"f1$u*c1_$u + i1$u*g1$u AS cn1_$u").mkString(", ")
    val h1nCols = (0 until H1)
      .map(u => s"o1$u * (${tnh(s"cn1_$u")}) AS h1n_$u").mkString(", ")
    val pre2Cols = (for (g <- 0 until 4; u <- 0 until H2)
      yield s"${pre2(g, u)} AS a2${g}_$u").mkString(",\n        ")
    val gate2Cols = (0 until H2).map { u =>
      s"${sig(s"a20_$u")} AS i2$u, ${sig(s"a21_$u")} AS f2$u, " +
        s"${tnh(s"a22_$u")} AS g2$u, ${sig(s"a23_$u")} AS o2$u"
    }.mkString(",\n        ")
    val cn2Cols = (0 until H2)
      .map(u => s"f2$u*c2_$u + i2$u*g2$u AS cn2_$u").mkString(", ")
    val h2nCols = (0 until H2)
      .map(u => s"o2$u * (${tnh(s"cn2_$u")}) AS h2n_$u").mkString(", ")
    // head accumulators: s_u = Σ h2 (mean) or Σ w·h2 (attn, + den = Σ w)
    val headState = (0 until H2).map(u => s"s_$u") ++
      (if (attn) Seq("den") else Seq.empty)
    val headOut =
      if (attn)
        (0 until H2).map(u => s"s_$u + wat*h2n_$u AS s_$u")
          .mkString(", ") + ", den + wat AS den"
      else (0 until H2).map(u => s"s_$u + h2n_$u AS s_$u").mkString(", ")
    val outCols =
      (0 until H1).map(u => s"h1n_$u AS h1_$u").mkString(", ") + ",\n       " +
      (0 until H1).map(u => s"cn1_$u AS c1_$u").mkString(", ") + ",\n       " +
      (0 until H2).map(u => s"h2n_$u AS h2_$u").mkString(", ") + ",\n       " +
      (0 until H2).map(u => s"cn2_$u AS c2_$u").mkString(", ") + ",\n       " +
      headOut
    val stateInit =
      ((0 until H1).map(u => s"CAST(0.0 AS DOUBLE) AS h1_$u") ++
        (0 until H1).map(u => s"CAST(0.0 AS DOUBLE) AS c1_$u") ++
        (0 until H2).map(u => s"CAST(0.0 AS DOUBLE) AS h2_$u") ++
        (0 until H2).map(u => s"CAST(0.0 AS DOUBLE) AS c2_$u") ++
        headState.map(s => s"CAST(0.0 AS DOUBLE) AS $s")).mkString(", ")
    val stateCarry =
      ((0 until H1).map(u => s"s.h1_$u AS h1_$u") ++
        (0 until H1).map(u => s"s.c1_$u AS c1_$u") ++
        (0 until H2).map(u => s"s.h2_$u AS h2_$u") ++
        (0 until H2).map(u => s"s.c2_$u AS c2_$u") ++
        headState.map(s => s"s.$s AS $s")).mkString(", ")
    // attention weight of the NEW h2 state: hardSig(attC + Σ a_u·h2n_u),
    // left-assoc ascending — the expression's accumulation order
    val watLevel =
      if (attn) {
        val score = s"${L(m.attC)} + " + (0 until H2)
          .map(u => s"${L(m.attA(u))}*h2n_$u").mkString(" + ")
        s"SELECT *, ${sig(s"($score)")} AS wat FROM (\n    "
      } else ""
    val watClose = if (attn) ")" else ""
    val logit =
      if (attn)
        s"${L(m.bias)} + " + (0 until H2)
          .map(u => s"${L(m.dense(u))}*(s_$u/(1.0 + den))").mkString(" + ")
      else
        s"${L(m.bias)} + " + (0 until H2)
          .map(u => s"${L(m.dense(u))}*(s_$u/${m.window}.0)").mkString(" + ")
    sqlBase.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""", $edCte AS (SELECT e, d FROM sampm WHERE i = 0),
         |$cteName AS (
         |  SELECT e, d, 0 AS t, $stateInit FROM $edCte
         |  UNION ALL
         |  SELECT e, d, t,
         |       $outCols
         |  FROM (
         |    ${watLevel}SELECT *, $h2nCols FROM (
         |      SELECT *, $cn2Cols FROM (
         |        SELECT *,
         |        $gate2Cols
         |        FROM (
         |          SELECT *,
         |        $pre2Cols
         |          FROM (
         |            SELECT *, $h1nCols FROM (
         |              SELECT *, $cn1Cols FROM (
         |                SELECT *,
         |        $gate1Cols
         |                FROM (
         |                  SELECT *,
         |        $pre1Cols
         |                  FROM (
         |                    SELECT s.e AS e, s.d AS d, s.t + 1 AS t,
         |                           $stateCarry,
         |                           (p.m - 1000.0)/64.0 AS x
         |                    FROM $cteName s JOIN sampm p
         |                      ON p.e = s.e AND p.d = s.d AND p.i = s.t
         |                    WHERE s.t < ${m.window})))))))))$watClose
         |)
         |SELECT e, d, $logit AS logit FROM $cteName WHERE t = ${m.window}""".stripMargin
  }

  /** The BIDIRECTIONAL rendering: layer 1 becomes TWO recursive CTEs
    * (forward over samples 0..W-1; backward over W-1..0, its own
    * weights), joined per original timestep into the layer-2 + head
    * recursion — layer 2's input at step t is [h1fwd(t); h1bwd(t)],
    * where the backward state for original time t-1 (0-based) is the
    * backward CTE's row W-t+1 (it has processed samples W-1 down to
    * t-1 by then). Same clamp-ladder discipline throughout.
    *
    * The per-timestep concat CTE MUST be `AS MATERIALIZED`: DuckDB
    * inlines single-reference CTEs, and this one is referenced from
    * the layer-2 recursion's RECURSIVE part — inlined, BOTH layer-1
    * recursions re-execute on every one of the W layer-2 iterations
    * (measured 207 s vs 2.1 s at sf0.001, a W× blow-up that would
    * time out the driver's gate at sf0.1). */
  /** `src`/`xExpr` parameterize the recurrence's INPUT: default is the
    * raw fixture samples with the inline scaling; the composed
    * conv→recurrence oracle (ml4f) passes its conv-output CTE and
    * `p.y`. `prefixCtes` is inserted (as ", name AS (...)" text) before
    * the recursions — the conv chain goes there, and its OUTPUT CTE
    * must be AS MATERIALIZED (both layer-1 recursions reference it
    * from their recursive parts — the ml4d inlining lesson). */
  /** `kHead`: when present, the final SELECT emits ALL K class logits
    * (each class row through the same readout walk as the binary
    * head — [[graft.ml.LstmStack.KHead]]) plus the first-max argmax
    * `pred` as a CASE ladder; `confusion` further rolls the rows up to
    * the (label, pred, n) confusion matrix (the A6 tie-in). */
  private def lstm2BidirSql(m: graft.ml.LstmStack.Lstm2Model,
                            edCte: String, cteName: String,
                            src: String = "sampm",
                            xExpr: String = "(p.m - 1000.0)/64.0",
                            prefixCtes: String = "",
                            kHead: Option[graft.ml.LstmStack.KHead] = None,
                            confusion: Boolean = false,
                            bodyOnly: Boolean = false): String = {
    val attn = m.head == "attn"
    val H1 = m.h1; val H2 = m.h2
    val W = m.window
    def L(d: Double): String = if (d < 0) s"($d)" else d.toString
    def sig(a: String): String =
      s"CASE WHEN $a < -2.0 THEN 0.0 WHEN $a > 2.0 THEN 1.0 ELSE 0.25*$a + 0.5 END"
    def tnh(a: String): String =
      s"CASE WHEN $a < -1.0 THEN -1.0 WHEN $a > 1.0 THEN 1.0 ELSE $a END"

    // one layer-1 direction as a recursive CTE: states per processing
    // step; `sampleIdx` maps the step counter to the sample index
    def l1Cte(name: String, wx: Array[Double], wh: Array[Double],
              b: Array[Double], sampleIdx: String): String = {
      def pre(g: Int, u: Int): String = {
        val whTerms = (0 until H1)
          .map(v => s"${L(wh((g * H1 + u) * H1 + v))}*h1_$v").mkString(" + ")
        s"${L(b(g * H1 + u))} + ${L(wx(g * H1 + u))}*x + $whTerms"
      }
      val preCols = (for (g <- 0 until 4; u <- 0 until H1)
        yield s"${pre(g, u)} AS a1${g}_$u").mkString(",\n        ")
      val gateCols = (0 until H1).map { u =>
        s"${sig(s"a10_$u")} AS i1$u, ${sig(s"a11_$u")} AS f1$u, " +
          s"${tnh(s"a12_$u")} AS g1$u, ${sig(s"a13_$u")} AS o1$u"
      }.mkString(",\n        ")
      val cnCols = (0 until H1)
        .map(u => s"f1$u*c1_$u + i1$u*g1$u AS cn1_$u").mkString(", ")
      val hnCols = (0 until H1)
        .map(u => s"o1$u * (${tnh(s"cn1_$u")}) AS h1n_$u").mkString(", ")
      val outCols = (0 until H1).map(u => s"h1n_$u AS h1_$u").mkString(", ") +
        ", " + (0 until H1).map(u => s"cn1_$u AS c1_$u").mkString(", ")
      val init = ((0 until H1).map(u => s"CAST(0.0 AS DOUBLE) AS h1_$u") ++
        (0 until H1).map(u => s"CAST(0.0 AS DOUBLE) AS c1_$u")).mkString(", ")
      val carry = ((0 until H1).map(u => s"s.h1_$u AS h1_$u") ++
        (0 until H1).map(u => s"s.c1_$u AS c1_$u")).mkString(", ")
      s"""$name AS (
         |  SELECT e, d, 0 AS t, $init FROM $edCte
         |  UNION ALL
         |  SELECT e, d, t, $outCols
         |  FROM (
         |    SELECT *, $hnCols FROM (
         |      SELECT *, $cnCols FROM (
         |        SELECT *,
         |        $gateCols
         |        FROM (
         |          SELECT *,
         |        $preCols
         |          FROM (
         |            SELECT s.e AS e, s.d AS d, s.t + 1 AS t, $carry,
         |                   $xExpr AS x
         |            FROM $name s JOIN $src p
         |              ON p.e = s.e AND p.d = s.d AND p.i = $sampleIdx
         |            WHERE s.t < $W)))))
         |)""".stripMargin
    }

    // layer-2 pre over the concat [hf; hb] + carried h2 (left-assoc:
    // b2, wx2 terms j ascending over 2H1, wh2 terms v ascending)
    val xDim = 2 * H1
    def inName(j: Int): String = if (j < H1) s"hf_$j" else s"hb_${j - H1}"
    def pre2(g: Int, u: Int): String = {
      val wxTerms = (0 until xDim)
        .map(j => s"${L(m.wx2((g * H2 + u) * xDim + j))}*${inName(j)}")
        .mkString(" + ")
      val whTerms = (0 until H2)
        .map(v => s"${L(m.wh2((g * H2 + u) * H2 + v))}*h2_$v").mkString(" + ")
      s"${L(m.b2(g * H2 + u))} + $wxTerms + $whTerms"
    }
    val pre2Cols = (for (g <- 0 until 4; u <- 0 until H2)
      yield s"${pre2(g, u)} AS a2${g}_$u").mkString(",\n        ")
    val gate2Cols = (0 until H2).map { u =>
      s"${sig(s"a20_$u")} AS i2$u, ${sig(s"a21_$u")} AS f2$u, " +
        s"${tnh(s"a22_$u")} AS g2$u, ${sig(s"a23_$u")} AS o2$u"
    }.mkString(",\n        ")
    val cn2Cols = (0 until H2)
      .map(u => s"f2$u*c2_$u + i2$u*g2$u AS cn2_$u").mkString(", ")
    val h2nCols = (0 until H2)
      .map(u => s"o2$u * (${tnh(s"cn2_$u")}) AS h2n_$u").mkString(", ")
    val mhaH = m.head == "mha"
    val nH = m.nHeads
    val headState = (0 until H2).map(u => s"s_$u") ++
      (if (attn) Seq("den") else Seq.empty) ++
      (if (mhaH)
         (for (k <- 0 until nH; u <- 0 until H2) yield s"n${k}_$u") ++
           (0 until nH).map(k => s"dn$k")
       else Seq.empty)
    val headOut =
      if (attn)
        (0 until H2).map(u => s"s_$u + wat*h2n_$u AS s_$u")
          .mkString(", ") + ", den + wat AS den"
      else if (mhaH)
        ((0 until H2).map(u => s"s_$u + h2n_$u AS s_$u") ++
          (for (k <- 0 until nH; u <- 0 until H2)
            yield s"n${k}_$u + wat$k*h2n_$u AS n${k}_$u") ++
          (0 until nH).map(k => s"dn$k + wat$k AS dn$k")).mkString(", ")
      else (0 until H2).map(u => s"s_$u + h2n_$u AS s_$u").mkString(", ")
    val outCols =
      (0 until H2).map(u => s"h2n_$u AS h2_$u").mkString(", ") + ",\n       " +
      (0 until H2).map(u => s"cn2_$u AS c2_$u").mkString(", ") + ",\n       " +
      headOut
    val stateInit =
      ((0 until H2).map(u => s"CAST(0.0 AS DOUBLE) AS h2_$u") ++
        (0 until H2).map(u => s"CAST(0.0 AS DOUBLE) AS c2_$u") ++
        headState.map(x => s"CAST(0.0 AS DOUBLE) AS $x")).mkString(", ")
    val stateCarry =
      ((0 until H2).map(u => s"s.h2_$u AS h2_$u") ++
        (0 until H2).map(u => s"s.c2_$u AS c2_$u") ++
        headState.map(x => s"s.$x AS $x")).mkString(", ")
    val inCarry =
      ((0 until H1).map(j => s"q.hf_$j AS hf_$j") ++
        (0 until H1).map(j => s"q.hb_$j AS hb_$j")).mkString(", ")
    val watLevel =
      if (attn) {
        val score = s"${L(m.attC)} + " + (0 until H2)
          .map(u => s"${L(m.attA(u))}*h2n_$u").mkString(" + ")
        s"SELECT *, ${sig(s"($score)")} AS wat FROM (\n    "
      } else if (mhaH) {
        // every head's weight depends only on the NEW h2 state, so one
        // SELECT level emits all of them
        val wats = (0 until nH).map { k =>
          val score = s"${L(m.attCs(k))} + " + (0 until H2)
            .map(u => s"${L(m.attA(k * H2 + u))}*h2n_$u").mkString(" + ")
          s"${sig(s"($score)")} AS wat$k"
        }.mkString(", ")
        s"SELECT *, $wats FROM (\n    "
      } else ""
    val watClose = if (attn || mhaH) ")" else ""
    // one readout with an arbitrary (bias, dense row, attD row) — the
    // binary logit and every K-class row share this walk (the exact
    // order LstmStack.HeadState.logitFor replays)
    def readout(b0: Double, dv: Int => Double,
                aD: (Int, Int) => Double): String =
      if (attn)
        s"${L(b0)} + " + (0 until H2)
          .map(u => s"${L(dv(u))}*(s_$u/(1.0 + den))").mkString(" + ")
      else if (mhaH)
        s"${L(b0)} + " +
          ((0 until H2).map(u => s"${L(dv(u))}*(s_$u/$W.0)") ++
            (for (k <- 0 until nH; u <- 0 until H2)
              yield s"${L(aD(k, u))}*(n${k}_$u/(1.0 + dn$k))"))
            .mkString(" + ")
      else
        s"${L(b0)} + " + (0 until H2)
          .map(u => s"${L(dv(u))}*(s_$u/$W.0)").mkString(" + ")
    val logit = readout(m.bias, m.dense, (k, u) => m.attD(k * H2 + u))
    val fSel = (0 until H1).map(u => s"f.h1_$u AS hf_$u").mkString(", ")
    val bSel = (0 until H1).map(u => s"bb.h1_$u AS hb_$u").mkString(", ")
    val body = prefixCtes +
      s""", $edCte AS (SELECT e, d FROM $src WHERE i = 0),
         |${l1Cte(cteName + "f", m.wx1, m.wh1, m.b1, "s.t")},
         |${l1Cte(cteName + "b", m.wx1b, m.wh1b, m.b1b, s"$W - 1 - s.t")},
         |${cteName}in AS MATERIALIZED (
         |  SELECT f.e AS e, f.d AS d, f.t AS t, $fSel, $bSel
         |  FROM ${cteName}f f JOIN ${cteName}b bb
         |    ON bb.e = f.e AND bb.d = f.d AND bb.t = $W - f.t + 1
         |  WHERE f.t >= 1),
         |$cteName AS (
         |  SELECT e, d, 0 AS t, $stateInit FROM $edCte
         |  UNION ALL
         |  SELECT e, d, t,
         |       $outCols
         |  FROM (
         |    ${watLevel}SELECT *, $h2nCols FROM (
         |      SELECT *, $cn2Cols FROM (
         |        SELECT *,
         |        $gate2Cols
         |        FROM (
         |          SELECT *,
         |        $pre2Cols
         |          FROM (
         |            SELECT s.e AS e, s.d AS d, s.t + 1 AS t,
         |                   $stateCarry,
         |                   $inCarry
         |            FROM $cteName s JOIN ${cteName}in q
         |              ON q.e = s.e AND q.d = s.d AND q.t = s.t + 1
         |            WHERE s.t < $W)))))$watClose
         |)""".stripMargin
    if (bodyOnly) body
    else sqlBase.replaceFirst("WITH ", "WITH RECURSIVE ") + body + "\n" +
      finalSelect(cteName, W, logit, readout, kHead, confusion)
  }

  /** The bidir renderer's tail: binary logit, K-class logits + argmax
    * pred, or the (label, pred, n) confusion rollup. The pred ladder is
    * FIRST-max (class c wins iff >= every later class) — byte-for-byte
    * the comparison order of [[graft.ml.LstmStack.argmaxCol]]. */
  private def finalSelect(cteName: String, W: Int, logit: String,
      readout: (Double, Int => Double, (Int, Int) => Double) => String,
      kHead: Option[graft.ml.LstmStack.KHead],
      confusion: Boolean): String = kHead match {
    case None =>
      s"SELECT e, d, $logit AS logit FROM $cteName WHERE t = $W"
    case Some(kh) =>
      val K = kh.nClasses
      val logitCols = (0 until K).map { c =>
        val e = readout(kh.biasK(c),
          u => kh.denseK(c * (kh.denseK.length / K) + u),
          (k, u) => kh.attDK(
            c * (kh.attDK.length / K) + k * (kh.denseK.length / K) + u))
        s"$e AS logit_$c"
      }.mkString(",\n       ")
      def pred(c: Int): String =
        if (c == K - 1) c.toString
        else s"CASE WHEN " +
          (c + 1 until K).map(d => s"logit_$c >= logit_$d")
            .mkString(" AND ") + s" THEN $c ELSE ${pred(c + 1)} END"
      val predSel =
        s"""SELECT e, d, ${(0 until K).map(c => s"logit_$c").mkString(", ")},
           |       ${pred(0)} AS pred
           |FROM (SELECT e, d,
           |       $logitCols
           |      FROM $cteName WHERE t = $W)""".stripMargin
      if (!confusion) predSel
      else
        s"""SELECT x.label AS label, q.pred AS pred, COUNT(*) AS n
           |FROM ($predSel) q
           |JOIN (SELECT DISTINCT e, d, label FROM dpx) x
           |  ON x.e = q.e AND x.d = q.d
           |GROUP BY 1, 2""".stripMargin
  }

  val ml4bSql: String = lstm2StackSql(ml4bNet, "edml4b", "lstm2")

  /** The ml4c network: [[ml4bNet]] with the ADD-ONE-SMOOTHED HARD
    * ATTENTION head ([[graft.ml.LstmStack]] `head = "attn"` — the
    * oracle-preserving analog of the amber fusion attention,
    * `amber/enhanced_fusion_layer.py`): per-step w_t = hardSig(attC +
    * a·h2(t)), pooled = Σ w·h2 / (1 + Σ w). Quarter-grid attention
    * params keep every op dyadic-rational; the single division per unit
    * at the head is one IEEE op on both engines. */
  private val ml4cNet: graft.ml.LstmStack.Lstm2Model =
    ml4bNet.copy(head = "attn", attA = Array(0.5, -0.25), attC = 0.25)

  /** ML4C — the attention-pooled stacked LSTM forward pass under the
    * oracle gate: same two-layer recurrence as ml4b, head replaced by
    * hard attention; the oracle's recursive CTE gains the attention
    * weight column and the (numerator, denominator) accumulators —
    * 11 state columns × 125 steps, still bit-exact (nothing
    * transcendental). LstmStackSpec gates the TRAINING side of this
    * head (two-layer BPTT + attention calculus == finite differences). */
  def ml4cLstmAttnForward(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        graft.ml.LstmStack.logitCol(ml4cNet, col("rawData")).as("logit"))

  val ml4cSql: String = lstm2StackSql(ml4cNet, "edml4c", "lstm2c")

  /** The ml4d network: the FULL amber shape in dyadic-grid form —
    * BIDIRECTIONAL layer 1 (separate backward-direction weights),
    * stacked layer 2 over the [fwd; bwd] concat, hard-attention head.
    * `wx2` spans the doubled input width. */
  private val ml4dNet: graft.ml.LstmStack.Lstm2Model = {
    val h1 = 2; val h2 = 2
    graft.ml.LstmStack.Lstm2Model(h1, h2, window = 125,
      wx1 = ml4bNet.wx1, wh1 = ml4bNet.wh1, b1 = ml4bNet.b1,
      wx2 = Array.tabulate(4 * h2 * 2 * h1)(j => ((j * 7) % 5 - 2) * 0.25),
      wh2 = ml4bNet.wh2, b2 = ml4bNet.b2,
      dense = Array(1.0, -1.0), bias = 0.25, mean = 1000.0, std = 64.0,
      head = "attn", attA = Array(0.5, -0.25), attC = 0.25,
      bidir = true,
      wx1b = Array.tabulate(4 * h1)(j => ((j * 3) % 7 - 3) * 0.25),
      wh1b = Array.tabulate(4 * h1 * h1)(j => ((j * 5) % 5 - 2) * 0.25),
      b1b = Array.tabulate(4 * h1)(j => ((j * 7) % 3 - 1) * 0.25))
  }

  /** ML4D — the bidirectional stacked attention-pooled LSTM forward
    * pass under the oracle gate: the COMPLETE amber architecture shape
    * (Bidirectional(LSTM) → LSTM → attention fusion → dense) in its
    * oracle-preserving hard-gate form. The oracle runs THREE recursive
    * CTEs — forward layer-1, backward layer-1 (walking the samples in
    * reverse), and the layer-2 + attention recursion over their joined
    * per-timestep concatenation — all bit-exact. */
  def ml4dLstmBidirForward(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        graft.ml.LstmStack.logitCol(ml4dNet, col("rawData")).as("logit"))

  val ml4dSql: String = lstm2StackSql(ml4dNet, "edml4d", "lstm2d")

  /** The ml4e network: ml4d's bidirectional stack with the
    * MULTI-HEAD + RESIDUAL fusion head ([[graft.ml.LstmStack]]
    * `head = "mha"` — the oracle-preserving analog of the reference's
    * EnhancedFusionLayer, `amber/enhanced_fusion_layer.py:14-22`:
    * `Add()([inputs, MultiHeadAttention()(inputs, inputs)])`): two
    * hard-attention heads pool the h2 sequence independently, each
    * read out by its own quarter-grid slice, plus the residual mean
    * pool read out by `dense`. */
  private val ml4eNet: graft.ml.LstmStack.Lstm2Model = {
    val h2 = 2; val nH = 2
    ml4dNet.copy(head = "mha", nHeads = nH,
      attA = Array.tabulate(nH * h2)(j => ((j * 3) % 7 - 3) * 0.25),
      attC = 0.0,
      attCs = Array.tabulate(nH)(k => (k * 2 - 1) * 0.25),
      attD = Array.tabulate(nH * h2)(j => ((j * 5) % 7 - 3) * 0.25))
  }

  /** ML4E — the multi-head + residual fusion readout under the oracle
    * gate: ml4d's bidirectional stack, head replaced by the mha
    * fusion. The oracle's layer-2 recursion carries the residual pool
    * sums PLUS per-head (numerator, denominator) accumulator columns;
    * every op stays piecewise-linear, so the whole
    * Bidirectional(LSTM) → LSTM → multi-head attention ⊕ residual →
    * dense line is bit-exact across engines. */
  def ml4eLstmFusionForward(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        graft.ml.LstmStack.logitCol(ml4eNet, col("rawData")).as("logit"))

  val ml4eSql: String = lstm2StackSql(ml4eNet, "edml4e", "lstm2e")

  /** The conv front-end ([[graft.ml.ConvFront]]) as NON-recursive CTE
    * text feeding the recurrence oracles: normalize → per block
    * (LEAD taps → conv+affine+ReLU activations → pair-MAX pool with a
    * halved index) → the 1×1 channel mix. Term order matches the
    * engine's accumulation exactly (b, then ci-major × j-minor taps,
    * left-assoc; affine outside; mix c-ascending). The OUTPUT CTE is
    * `AS MATERIALIZED` — both layer-1 recursions reference it from
    * their recursive parts (the ml4d inlining lesson). */
  private def convFrontCtes(cf: graft.ml.ConvFront.ConvFrontModel,
                            outName: String): String = {
    def L(d: Double): String = if (d < 0) s"($d)" else d.toString
    val sb = new StringBuilder
    // input: the scalar magnitude stream (sampm.m) for a 1-channel
    // front; the X/Y/Z axis streams (samp3.vx/vy/vz — the engine's
    // rawData3D de-interleave, channel a = stride-slice a) for cIn0=3
    val chanSel = cf.cIn0 match {
      case 1 => s"(m - ${L(cf.mean)})/${L(cf.std)} AS v0 FROM sampm"
      case 3 => Seq("vx", "vy", "vz").zipWithIndex.map { case (c, a) =>
        s"($c - ${L(cf.mean)})/${L(cf.std)} AS v$a"
      }.mkString(", ") + " FROM samp3"
      case n => sys.error(s"convFrontCtes: no fixture stream for $n channels")
    }
    sb.append(s", ${outName}n AS (SELECT e, d, i, " +
      s"$chanSel WHERE i < ${cf.window})")
    var src = s"${outName}n"
    var valCols: Seq[String] = (0 until cf.cIn0).map(a => s"v$a")
    var tIn = cf.window
    cf.blocks.zipWithIndex.foreach { case (bl, bi) =>
      val k = bl.k
      val nPos = tIn - k + 1
      val leadCols = (0 until bl.cIn).flatMap { ci =>
        val c = valCols(ci)
        (1 until k).map(j =>
          s"LEAD($c, $j) OVER (PARTITION BY e, d ORDER BY i) AS ${c}_$j")
      }.mkString(", ")
      sb.append(s", ${outName}l$bi AS (SELECT e, d, i, " +
        valCols.mkString(", ") +
        (if (leadCols.nonEmpty) ", " + leadCols else "") + s" FROM $src)")
      def tap(ci: Int, j: Int): String =
        if (j == 0) valCols(ci) else s"${valCols(ci)}_$j"
      val actCols = (0 until bl.cOut).map { o =>
        val terms = (for (ci <- 0 until bl.cIn; j <- 0 until k)
          yield s"${L(bl.w((o * bl.cIn + ci) * k + j))}*${tap(ci, j)}")
          .mkString(" + ")
        val n = s"${L(bl.scale(o))}*(${L(bl.b(o))} + $terms) + " +
          L(bl.shift(o))
        s"CASE WHEN ($n) > 0.0 THEN ($n) ELSE 0.0 END AS a$o"
      }.mkString(", ")
      sb.append(s", ${outName}a$bi AS (SELECT e, d, i, $actCols " +
        s"FROM ${outName}l$bi WHERE i < $nPos)")
      val tOut = nPos / 2
      val poolCols = (0 until bl.cOut).map(o => s"MAX(a$o) AS a$o")
        .mkString(", ")
      sb.append(s", ${outName}p$bi AS (SELECT e, d, i // 2 AS i, " +
        s"$poolCols FROM ${outName}a$bi WHERE i < ${2 * tOut} " +
        s"GROUP BY e, d, i // 2)")
      src = s"${outName}p$bi"
      valCols = (0 until bl.cOut).map(o => s"a$o")
      tIn = tOut
    }
    val mixExpr = s"${L(cf.mixBias)} + " + cf.mix.zipWithIndex
      .map { case (w, c) => s"${L(w)}*a$c" }.mkString(" + ")
    sb.append(s", $outName AS MATERIALIZED " +
      s"(SELECT e, d, i, $mixExpr AS y FROM $src)")
    sb.toString
  }

  /** The ml4f pipe: the COMPLETE lstm_pipe line in dyadic-grid form —
    * two conv blocks (1→2→2 channels, k=3, affine+ReLU+pool) feeding
    * [[ml4eNet]]'s bidirectional multi-head-fusion stack over the
    * pooled 29-step sequence (125 → 61 → 29). The stack consumes the
    * conv output raw; the front end owns the input scaling. */
  private val ml4fPipe: graft.ml.ConvPipe.ConvPipeModel = {
    import graft.ml.ConvFront.{ConvBlock, ConvFrontModel}
    val b0 = ConvBlock(1, 2, 3,
      w = Array.tabulate(6)(j => ((j * 3) % 5 - 2) * 0.25),
      b = Array.tabulate(2)(o => (o * 2 - 1) * 0.25),
      scale = Array(1.25, 0.75),
      shift = Array(0.25, -0.25))
    val b1 = ConvBlock(2, 2, 3,
      w = Array.tabulate(12)(j => ((j * 5) % 7 - 3) * 0.25),
      b = Array.tabulate(2)(o => (1 - o * 2) * 0.25),
      scale = Array(0.75, 1.25),
      shift = Array(-0.25, 0.25))
    val front = ConvFrontModel(125, Seq(b0, b1),
      mix = Array(0.75, -0.5), mixBias = 0.25,
      mean = 1000.0, std = 64.0)
    graft.ml.ConvPipe.ConvPipeModel(front,
      ml4eNet.copy(window = front.outLen, mean = 0.0, std = 1.0))
  }

  /** ML4F — the composed conv→recurrence forward pass under the oracle
    * gate: Conv1D blocks → Bidirectional(LSTM) → LSTM → multi-head
    * attention ⊕ residual → dense, the reference's complete lstm_pipe +
    * fusion line, as ONE projection of two nested codegen'd
    * expressions. The oracle chains the conv CTEs (window taps,
    * piecewise-linear activations, pair-max pooling) into the
    * three-recursion bidirectional oracle — bit-exact throughout
    * because every op is IEEE mul/add/compare. */
  def ml4fConvPipeForward(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        graft.ml.ConvPipe.logitCol(ml4fPipe, col("rawData")).as("logit"))

  val ml4fSql: String = lstm2BidirSql(ml4fPipe.stack, "edml4f", "lstm2g",
    src = "cfout", xExpr = "p.y",
    prefixCtes = convFrontCtes(ml4fPipe.front, "cfout"))

  /** The ml4g pipe: the MULTI-CHANNEL composed line — the reference's
    * multi-feature input towers (`amber/model.py:42-49`: one input per
    * feature, fused before the dense head) in the composed
    * single-projection form: the first conv block takes the THREE
    * de-interleaved X/Y/Z axis channels (cIn = 3 — C7's stride slice
    * of rawData3D) and mixes them exactly where `build_model` fuses
    * per-feature inputs, then the ml4f chain (second block →
    * bidirectional multi-head-fusion stack over the pooled 29-step
    * sequence). Axis values are ±1000 integers; /256 (a power of two)
    * keeps the channel scaling exact. */
  private val ml4gPipe: graft.ml.ConvPipe.ConvPipeModel = {
    import graft.ml.ConvFront.{ConvBlock, ConvFrontModel}
    val b0 = ConvBlock(3, 2, 3,
      w = Array.tabulate(18)(j => ((j * 7) % 9 - 4) * 0.25),
      b = Array.tabulate(2)(o => (o * 2 - 1) * 0.25),
      scale = Array(0.75, 1.25),
      shift = Array(0.25, -0.25))
    val b1 = ConvBlock(2, 2, 3,
      w = Array.tabulate(12)(j => ((j * 5) % 9 - 4) * 0.25),
      b = Array.tabulate(2)(o => (1 - o * 2) * 0.25),
      scale = Array(1.25, 0.75),
      shift = Array(-0.25, 0.25))
    val front = ConvFrontModel(125, Seq(b0, b1),
      mix = Array(-0.5, 0.75), mixBias = -0.25,
      mean = 0.0, std = 256.0)
    graft.ml.ConvPipe.ConvPipeModel(front,
      ml4eNet.copy(window = front.outLen, mean = 0.0, std = 1.0))
  }

  /** ML4G — the multi-channel composed conv→recurrence forward pass
    * under the oracle gate: 3-channel Conv1D (X/Y/Z de-interleaved
    * from the interleaved rawData3D) → conv block → Bidirectional
    * (LSTM) → LSTM → multi-head attention ⊕ residual → dense, as ONE
    * projection of two nested codegen'd expressions over the raw
    * interleaved array. The oracle's first conv CTE reads the three
    * axis streams (samp3.vx/vy/vz) as three value columns; everything
    * downstream is the ml4f chain — bit-exact throughout (IEEE
    * mul/add/compare only). */
  def ml4gConv3dPipeForward(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_3d"))
      .select(col("e"), col("d"),
        graft.ml.ConvPipe.logitCol(ml4gPipe, col("rawData3D")).as("logit"))

  val ml4gSql: String = lstm2BidirSql(ml4gPipe.stack, "edml4g", "lstm2i",
    src = "cf3out", xExpr = "p.y",
    prefixCtes = convFrontCtes(ml4gPipe.front, "cf3out"))

  /** The ml4h K-class head: the reference's `Dense(num_classes,
    * softmax)` readout (`amber/model.py:66` — C4's type2id has THREE
    * classes: Seizure 1, False Alarm 0, Unknown 2) over [[ml4eNet]]'s
    * bidirectional multi-head stack, in argmax-serving form (softmax
    * is monotone per row, so no transcendental ever runs). Quarter-grid
    * per-class readout rows. */
  private val ml4hKHead: graft.ml.LstmStack.KHead = {
    val h2 = 2; val nH = 2; val K = 3
    graft.ml.LstmStack.KHead(K,
      denseK = Array.tabulate(K * h2)(j => ((j * 5) % 7 - 3) * 0.25),
      biasK = Array.tabulate(K)(c => (c - 1) * 0.25),
      attDK = Array.tabulate(K * nH * h2)(j => ((j * 3) % 7 - 3) * 0.25))
  }

  /** ML4H — the MULTI-CLASS forward pass under the oracle gate: one
    * codegen'd expression emits all K class logits from ONE recurrence
    * evaluation; `pred` is the first-max argmax ladder. The oracle
    * replays the same bidirectional recursion and reads each class
    * through the identical per-class readout walk — bit-exact, so the
    * K logit columns hash-match raw and the integer pred column is
    * derivation-identical. */
  def ml4hMulticlassForward(s: SparkSession, d: String): DataFrame = {
    val logits = graft.ml.LstmStack.logitsKCol(
      ml4eNet, ml4hKHead, col("rawData"))
    val ls = (0 until 3).map(c =>
      element_at(col("__lk"), c + 1).as(s"logit_$c"))
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .withColumn("__lk", logits)
      .select(col("e") +: col("d") +: ls: _*)
      .withColumn("pred", graft.ml.LstmStack.argmaxCol(
        (0 until 3).map(c => col(s"logit_$c"))))
  }

  val ml4hSql: String = lstm2BidirSql(ml4eNet, "edml4h", "lstm2k",
    kHead = Some(ml4hKHead))

  /** A6C — the K-class confusion matrix (the A6 detection-stats tie-in
    * for the multi-class head): fixture label × first-max pred →
    * counts, ONE scan (label rides the same rows the logits are
    * computed on — no join). Integer output; same recursion as ml4h
    * underneath. */
  def a6cMulticlassConfusion(s: SparkSession, d: String): DataFrame = {
    val logits = graft.ml.LstmStack.logitsKCol(
      ml4eNet, ml4hKHead, col("rawData"))
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .withColumn("__lk", logits)
      .withColumn("pred", graft.ml.LstmStack.argmaxCol(
        (0 until 3).map(c => element_at(col("__lk"), c + 1))))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
  }

  val a6cSql: String = lstm2BidirSql(ml4eNet, "edml4h", "lstm2k",
    kHead = Some(ml4hKHead), confusion = true)

  /** The ml4i model: the N-TOWER fusion of `build_model`
    * (`amber/model.py:42-66` + `enhanced_fusion_layer.py:14-22`) —
    * three composed conv→recurrence towers, one per input feature
    * (axis-selective first-block weights over the same interleaved
    * rawData3D: tower a's block-0 kernel is zero on every channel but
    * a), each pooled to its head-input vector; fusion = v + A·v (the
    * single-token EnhancedFusionLayer collapsed to its linear form),
    * then a ReLU dense layer and the scalar readout. All quarter/
    * eighth-grid dyadic weights; the final value goes on the ×1e6
    * ROUND grid (long fusion dot products — the ml5 FMA discipline). */
  private val ml4iModel: graft.ml.TowerFusion.TowerFusionModel = {
    import graft.ml.ConvFront.{ConvBlock, ConvFrontModel}
    val towers = (0 until 3).map { a =>
      val b0 = ConvBlock(3, 2, 3,
        w = Array.tabulate(18) { idx =>
          val ci = (idx / 3) % 3
          if (ci == a) ((idx * 7) % 9 - 4) * 0.25 else 0.0
        },
        b = Array.tabulate(2)(o => (o * 2 - 1) * 0.25),
        scale = Array(0.75, 1.25),
        shift = Array(0.25, -0.25))
      val b1 = ConvBlock(2, 2, 3,
        w = Array.tabulate(12)(j => ((j * (3 + a)) % 9 - 4) * 0.25),
        b = Array.tabulate(2)(o => (1 - o * 2) * 0.25),
        scale = Array(1.25, 0.75),
        shift = Array(-0.25, 0.25))
      val front = ConvFrontModel(125, Seq(b0, b1),
        mix = Array(0.75, -0.5), mixBias = 0.25,
        mean = 0.0, std = 256.0)
      graft.ml.ConvPipe.ConvPipeModel(front,
        ml4eNet.copy(window = front.outLen, mean = 0.0, std = 1.0,
          b1 = Array.tabulate(8)(j => ((j * (2 + a)) % 3 - 1) * 0.25)))
    }
    val d = towers.map(t =>
      graft.ml.TowerFusion.pooledDim(t.stack)).sum // 3 × 6 = 18
    graft.ml.TowerFusion.TowerFusionModel(
      towers,
      fuse = Array.tabulate(d * d)(j => ((j * 5) % 9 - 4) * 0.125),
      w1 = Array.tabulate(4 * d)(j => ((j * 7) % 9 - 4) * 0.25),
      b1 = Array.tabulate(4)(r => (r - 2) * 0.25),
      w2 = Array.tabulate(4)(r => ((r * 3) % 5 - 2) * 0.5),
      b2 = 0.25)
  }

  /** ML4I — the N-tower fused forward pass under the oracle gate:
    * three tower projections (each ONE nested codegen'd
    * K-mode recurrence over its axis) + one arithmetic projection,
    * scan → project chain, no shuffle. The oracle chains THREE
    * conv-CTE + three-recursion blocks and states the fusion
    * arithmetic over the joined per-tower pooled components. */
  def ml4iTowerFusion(s: SparkSession, d: String): DataFrame =
    graft.ml.TowerFusion.withLogit(ml4iModel,
        OsdbFixture.dps(s, d).filter(col("has_3d")), "rawData3D")
      .select(col("e"), col("d"),
        round(col("logit") * 1e6).cast("long").as("z_x1e6"))

  val ml4iSql: String = {
    def L(x: Double): String = if (x < 0) s"($x)" else x.toString
    val m = ml4iModel
    val bodies = m.towers.zipWithIndex.map { case (t, ti) =>
      lstm2BidirSql(t.stack, s"edtf$ti", s"tf$ti",
        src = s"tf${ti}c", xExpr = "p.y",
        prefixCtes = convFrontCtes(t.front, s"tf${ti}c"),
        bodyOnly = true)
    }.mkString("")
    val vExprs: Seq[String] = m.towers.zipWithIndex.flatMap { case (t, ti) =>
      val h2 = t.stack.h2; val nH = t.stack.nHeads
      val w = t.stack.window
      val a = s"q$ti"
      (0 until h2).map(u => s"$a.s_$u/$w.0") ++
        (for (k <- 0 until nH; u <- 0 until h2)
          yield s"$a.n${k}_$u/(1.0 + $a.dn$k)")
    }
    val vCols = vExprs.zipWithIndex
      .map { case (e, i) => s"$e AS v$i" }.mkString(",\n         ")
    val fusedCols = (0 until m.d).map { j =>
      (0 until m.d).foldLeft(s"v$j")((acc, i) =>
        s"$acc + ${L(m.fuse(j * m.d + i))}*v$i") + s" AS f$j"
    }.mkString(",\n       ")
    val zExpr = m.b1.indices.foldLeft(L(m.b2)) { (acc, r) =>
      val h = (0 until m.d).foldLeft(L(m.b1(r)))((a2, j) =>
        s"$a2 + ${L(m.w1(r * m.d + j))}*f$j")
      s"$acc + ${L(m.w2(r))}*(CASE WHEN ($h) > 0.0 THEN ($h) ELSE 0.0 END)"
    }
    val joins = (1 until m.towers.size).map { ti =>
      s"JOIN (SELECT * FROM tf$ti WHERE t = ${m.towers(ti).stack.window}) " +
        s"q$ti ON q$ti.e = q0.e AND q$ti.d = q0.d"
    }.mkString("\n      ")
    sqlBase.replaceFirst("WITH ", "WITH RECURSIVE ") + bodies +
      s"""
         |SELECT e, d, CAST(ROUND(($zExpr) * 1000000.0) AS BIGINT) AS z_x1e6
         |FROM (
         |  SELECT e, d,
         |       $fusedCols
         |  FROM (
         |    SELECT q0.e AS e, q0.d AS d,
         |         $vCols
         |    FROM (SELECT * FROM tf0 WHERE t = ${m.towers.head.stack.window}) q0
         |      $joins))""".stripMargin
  }

  private val ml5K = 5
  private val ml5Q = 0.6

  /** ML5 — the k-fold ensemble combiner under the oracle gate
    * ([[graft.ml.Ensemble]], the reference's tunable-sensitivity
    * predictor, `user_tools/nnTraining2/ensemblePredictor.py:28-87`):
    * per event, five synthetic fold scores (integer fixture
    * arithmetic), combined by BOTH the Harrell-Davis quantile and the
    * reference's simple linear-interpolation quantile at q = 0.6. The
    * beta-mass weights are computed ONCE on the driver and embedded as
    * shortest-round-trip literals in both plans (one source of truth).
    * The combined score compares on the ×1e6 ROUND grid (the viz1
    * discipline), NOT as raw doubles: the weighted sum is a
    * multiply-accumulate chain, and DuckDB's compiled a·b+c can
    * contract to FMA where Java never does — measured 1-ulp diffs
    * (~1e-12 absolute at these magnitudes, six orders inside the
    * grid). The ml4 recurrence dodges this because its per-step values
    * round through clamp COMPARISONS, not a long dot product. */
  def ml5Ensemble(s: SparkSession, d: String): DataFrame = {
    val scores = array((0 until ml5K).map(f =>
      ((col("e") * 13 + (f + 1) * 29) % 97).cast("double")): _*)
    OsdbFixture.ev(s, d).select(col("e"),
      round(graft.ml.Ensemble.harrellDavisCol(scores, ml5K, ml5Q) * 1e6)
        .cast("long").as("p_hd_x1e6"),
      round(graft.ml.Ensemble.simpleQuantileCol(scores, ml5K, ml5Q) * 1e6)
        .cast("long").as("p_q_x1e6"))
  }

  val ml5Sql: String = {
    val w = graft.ml.Ensemble.hdWeights(ml5K, ml5Q)
    val elems = (0 until ml5K)
      .map(f => s"CAST((e*13 + ${(f + 1) * 29}) % 97 AS DOUBLE)")
      .mkString(", ")
    val hd = (1 until ml5K).foldLeft(s"${w(0)}*s[1]") { (acc, i) =>
      s"$acc + ${w(i)}*s[${i + 1}]"
    }
    val pos = (ml5K - 1) * ml5Q
    val lo = math.floor(pos).toInt
    val frac = pos - lo
    val sq =
      if (frac == 0.0 || lo + 1 >= ml5K) s"s[${lo + 1}]*1.0"
      else s"s[${lo + 1}]*${1 - frac} + s[${lo + 2}]*$frac"
    sqlBase +
      s""", ml5s AS (SELECT e, list_sort([$elems]) AS s FROM ev)
         |SELECT e, CAST(round(($hd) * 1000000.0) AS BIGINT) AS p_hd_x1e6,
         |       CAST(round(($sq) * 1000000.0) AS BIGINT) AS p_q_x1e6
         |FROM ml5s""".stripMargin
  }

  /** ML6 — the NESTED k-fold skeleton under the oracle gate
    * ([[graft.ml.RunSequence.nestedSkeleton]]; the reference's
    * nestedKfold splitter, `user_tools/nnTraining2/splitData.py` +
    * NESTED_KFOLD_README.md): outer 2-fold × inner 3-fold slice
    * counts over the fixture events with label ≠ 2, knuth-hash fold
    * assignment on both levels (caller-owned, restated verbatim by the
    * oracle), explicit zero rows, inner_fold = −1 for the outer
    * stages, and the duplicate-id guard emitted as data. */
  def ml6NestedKfold(s: SparkSession, d: String): DataFrame = {
    val ev = OsdbFixture.ev(s, d)
      .select(col("e").cast("string").as("id"), col("e"), col("k"))
    graft.ml.RunSequence.nestedSkeleton(
      ev,
      col("k") % 3 =!= 2,
      ((col("e") * 2654435761L) % 4294967296L) % 2,
      ((col("e") * 2246822519L) % 4294967296L) % 3,
      outerK = 2, innerK = 3)
  }

  val ml6Sql: String = sqlBase +
    """, nev AS (
      |  SELECT e, ((e * 2654435761) % 4294967296) % 2 AS ofold,
      |         ((e * 2246822519) % 4294967296) % 3 AS ifold
      |  FROM ev WHERE k % 3 <> 2),
      |ofr AS (SELECT unnest(range(0, 2)) AS onf),
      |ifr AS (SELECT unnest(range(0, 3)) AS inf)
      |SELECT onf AS outer_fold, inf AS inner_fold,
      |       'inner_train' AS stage,
      |       (SELECT COUNT(*) FROM nev WHERE ofold <> onf AND ifold <> inf)
      |         AS n_events
      |FROM ofr, ifr
      |UNION ALL
      |SELECT onf, inf, 'inner_val',
      |       (SELECT COUNT(*) FROM nev WHERE ofold <> onf AND ifold = inf)
      |FROM ofr, ifr
      |UNION ALL
      |SELECT onf, CAST(-1 AS BIGINT), 'outer_train',
      |       (SELECT COUNT(*) FROM nev WHERE ofold <> onf)
      |FROM ofr
      |UNION ALL
      |SELECT onf, CAST(-1 AS BIGINT), 'outer_test',
      |       (SELECT COUNT(*) FROM nev WHERE ofold = onf)
      |FROM ofr
      |UNION ALL
      |SELECT onf, CAST(-1 AS BIGINT), 'guard',
      |       (SELECT COUNT(*) FROM nev t1 JOIN nev t2 ON t1.e = t2.e
      |        WHERE t1.ofold <> onf AND t2.ofold = onf)
      |FROM ofr""".stripMargin

  /** ML7 — the pipeline audit under the oracle gate
    * ([[graft.ml.RunSequence.auditFrame]]; the reference's
    * `user_tools/nnTraining2/auditDataProcessing.py`): per-stage
    * seizure/non-seizure class counts over ml2's select + fold hash —
    * `selected` (fold −1), per-fold `train`/`train_aug`/`test`. The
    * augmented counts reuse ml2's multiplicity closed form (seizure
    * ×2 oversample, tonic-clonic seizures ×4 after the TC copy of the
    * oversampled rows). */
  def ml7Audit(s: SparkSession, d: String): DataFrame = {
    val ev = OsdbFixture.ev(s, d).select(
      col("e").cast("string").as("id"),
      col("type_str").as("type"),
      col("sub_type").as("subType"),
      col("e"), col("k"), col("u"))
    graft.ml.RunSequence.auditFrame(ev,
      col("k") % 3 =!= 2 && col("u") % 2 === 0,
      ((col("e") * 2654435761L) % 4294967296L) % 3)
  }

  val ml7Sql: String = sqlBase +
    """, aud AS (
      |  SELECT e, ((e * 2654435761) % 4294967296) % 3 AS fold,
      |         CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END AS sz,
      |         CASE WHEN k % 3 = 0 AND k % 5 < 2 THEN 4
      |              WHEN k % 3 = 0 THEN 2 ELSE 1 END AS mult
      |  FROM ev WHERE k % 3 <> 2 AND u % 2 = 0),
      |audf AS (SELECT unnest(range(0, 3)) AS f)
      |SELECT CAST(-1 AS BIGINT) AS fold, 'selected' AS stage,
      |       (SELECT COUNT(*) FROM aud WHERE sz = 1) AS n_seizure,
      |       (SELECT COUNT(*) FROM aud WHERE sz = 0) AS n_other
      |UNION ALL
      |SELECT f, 'train',
      |       (SELECT COUNT(*) FROM aud WHERE fold <> f AND sz = 1),
      |       (SELECT COUNT(*) FROM aud WHERE fold <> f AND sz = 0)
      |FROM audf
      |UNION ALL
      |SELECT f, 'train_aug',
      |       (SELECT CAST(COALESCE(SUM(mult), 0) AS BIGINT)
      |        FROM aud WHERE fold <> f AND sz = 1),
      |       (SELECT COUNT(*) FROM aud WHERE fold <> f AND sz = 0)
      |FROM audf
      |UNION ALL
      |SELECT f, 'test',
      |       (SELECT COUNT(*) FROM aud WHERE fold = f AND sz = 1),
      |       (SELECT COUNT(*) FROM aud WHERE fold = f AND sz = 0)
      |FROM audf""".stripMargin

  /** The ml8 forest: FIXED integer thresholds and integer leaf votes
    * over four integer-exact window features, so the whole forest
    * output — compare-and-descend only, no arithmetic beyond the final
    * vote sum — is an exact integer and the cross-engine compare is a
    * plain hash with ZERO FMA hazard (unlike the ml4/ml5 grid
    * bridges). Feature basis over a present rawData window:
    * f_max / f_min / f_sum (Σm) / f_above (#{m > 1000}) — all exact
    * integers on the fixture. ONE source of truth: [[ml8Sql]]'s nested
    * CASE ladders are GENERATED from this object's node arrays.
    * Thresholds bisect the fixture (m ∈ [800, 1200], Σm ≈ 125 000,
    * low-motion dps pin f_max = 1001 / f_above = 62), so every branch
    * of every tree is exercised. */
  private val ml8Net: graft.ml.Forest.ForestModel = {
    import graft.ml.Forest.Tree
    // feature ids: 0 = f_max, 1 = f_min, 2 = f_sum, 3 = f_above
    val t0 = Tree(
      feature = Array(2, 0, 3, -1, -1, -1, -1),
      threshold = Array(125000.0, 1150.0, 62.0, 0, 0, 0, 0),
      left = Array(1, 3, 5, 0, 0, 0, 0),
      right = Array(2, 4, 6, 0, 0, 0, 0),
      vote = Array(0, 0, 0, 0.0, 1.0, 2.0, 3.0))
    val t1 = Tree(
      feature = Array(3, 1, 2, -1, -1, -1, -1),
      threshold = Array(60.0, 820.0, 126000.0, 0, 0, 0, 0),
      left = Array(1, 3, 5, 0, 0, 0, 0),
      right = Array(2, 4, 6, 0, 0, 0, 0),
      vote = Array(0, 0, 0, 2.0, 0.0, 1.0, 3.0))
    val t2 = Tree(
      feature = Array(0, -1, 1, -1, -1),
      threshold = Array(1180.0, 0, 810.0, 0, 0),
      left = Array(1, 0, 3, 0, 0),
      right = Array(2, 0, 4, 0, 0),
      vote = Array(0, 1.0, 0, 0.0, 2.0))
    graft.ml.Forest.ForestModel(
      Seq("f_max", "f_min", "f_sum", "f_above"), Array(t0, t1, t2))
  }

  /** ML8 — the random-forest forward pass under the oracle gate
    * ([[graft.ml.Forest.voteSumCol]]; the reference's shipping DEFAULT
    * modelClass, `user_tools/nnTraining2/rfModel.py` via
    * `nnConfig.json:174`): four integer window features → three fixed
    * decision trees as pure Catalyst comparison ladders → the summed
    * vote, per present magnitude window. The TRAINER
    * ([[graft.ml.Forest.train]], MLlib RandomForestClassifier through
    * the Trainer seam) is spec-gated (ForestSpec: planted-separable
    * corpus, MLlib-vs-flattened forward parity, ModelIo round-trip,
    * replay deployment); the SCORING PATH the training produces is
    * gated here bit-exactly via [[ml8Net]]. */
  def ml8RfForward(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        array_max(col("rawData")).as("f0"),
        array_min(col("rawData")).as("f1"),
        aggregate(col("rawData"), lit(0.0), (a, x) => a + x).as("f2"),
        size(filter(col("rawData"), x => x > 1000)).cast("double").as("f3"))
      .select(col("e"), col("d"),
        graft.ml.Forest.voteSumCol(ml8Net,
          Seq(col("f0"), col("f1"), col("f2"), col("f3")))
          .cast("long").as("votes"))

  val ml8Sql: String = {
    def caseOf(t: graft.ml.Forest.Tree, i: Int): String =
      if (t.feature(i) < 0) t.vote(i).toLong.toString
      else s"(CASE WHEN f${t.feature(i)} <= ${t.threshold(i).toLong} " +
        s"THEN ${caseOf(t, t.left(i))} ELSE ${caseOf(t, t.right(i))} END)"
    val votes = ml8Net.trees.map(caseOf(_, 0)).mkString(" + ")
    sqlBase +
      s""", featrf AS (
         |  SELECT e, d, MAX(m) AS f0, MIN(m) AS f1, SUM(m) AS f2,
         |         SUM(CASE WHEN m > 1000 THEN 1 ELSE 0 END) AS f3
         |  FROM sampm GROUP BY e, d)
         |SELECT e, d, CAST($votes AS BIGINT) AS votes FROM featrf""".stripMargin
  }

  /** The ml9 sweep grid — one knob changed per run, baseline first
    * (the reference sweeps each param independently against one shared
    * baseline, `runOptimisation.py:41-55`). ONE source of truth: the
    * query's `sweeps` argument AND [[ml9Sql]]'s per-run constants both
    * derive from this list through [[graft.ml.RunSequence.withKnob]]. */
  private val ml9Sweeps: Seq[(String, Long)] =
    Seq("oversampleFactor" -> 3L, "tcAugFac" -> 2L, "historyN" -> 2L)

  /** ML9 — the `runOptimisation.py` parameter-sweep harness under the
    * oracle gate ([[graft.ml.RunSequence.paramSweep]],
    * `user_tools/nnTraining2/runOptimisation.py:8-80`): baseline run +
    * one re-run per swept knob, each emitting the ml2 skeleton's
    * (fold, stage, n_events, n_epochs) summary, collected into one
    * comparison frame keyed by (param, value). The counts come from
    * the REAL re-composed frames per config — a knob that silently
    * failed to propagate (augment multiplier, history drop) breaks
    * exactly its run's rows. Extraction MEMOIZATION (one
    * materialization for all four runs here, since none touch
    * window/step) is pinned by RunSequenceSpec's receipt test. */
  def ml9ParamSweep(s: SparkSession, d: String): DataFrame = {
    val events = OsdbFixture.ev(s, d).select(
      col("e").as("id"), col("u"),
      col("type_str").as("type"), col("sub_type").as("subType"))
    val dps = OsdbFixture.flatDps(s, d,
      where = col("k") % 3 =!= 2 && col("u") % 2 === 0)
    graft.ml.RunSequence.paramSweep(
      events, dps,
      select = col("type") =!= "Unknown" && col("u") % 2 === 0,
      foldOf = Exact.knuthHash32(col("id")) % 3,
      sweeps = ml9Sweeps.map { case (p, v) => p -> Seq(v) })
  }

  val ml9Sql: String = {
    val base = graft.ml.RunSequence.Config()
    val runs = ("baseline", -1L, base) +: ml9Sweeps.map { case (p, v) =>
      (p, v, graft.ml.RunSequence.withKnob(base, p, v))
    }
    val blocks = runs.zipWithIndex.map { case ((p, v, cfg), i) =>
      val o = cfg.oversampleFactor
      val tcM = o * (1 + cfg.tcAugFac)
      val nep = s"GREATEST(ndp2 - ${cfg.historyN - 1}, 0)"
      val mult = s"CASE WHEN label = 1 AND sub_type = 'tonicClonic' " +
        s"THEN $tcM WHEN label = 1 THEN $o ELSE 1 END"
      // only the first block names the output columns
      val as = if (i == 0)
        (" AS param", " AS value", " AS fold", " AS stage",
          " AS n_events", " AS n_epochs")
      else ("", "", "", "", "", "")
      s"""SELECT '$p'${as._1}, CAST($v AS BIGINT)${as._2}, f${as._3},
         |       'train'${as._4}, COUNT(*)${as._5},
         |       CAST(SUM($nep) AS BIGINT)${as._6}
         |FROM selswp, foldswp WHERE fold <> f GROUP BY f
         |UNION ALL
         |SELECT '$p', CAST($v AS BIGINT), f, 'train_aug',
         |       CAST(SUM($mult) AS BIGINT),
         |       CAST(SUM(($mult) * ($nep)) AS BIGINT)
         |FROM selswp, foldswp WHERE fold <> f GROUP BY f
         |UNION ALL
         |SELECT '$p', CAST($v AS BIGINT), f, 'test', COUNT(*),
         |       CAST(SUM($nep) AS BIGINT)
         |FROM selswp, foldswp WHERE fold = f GROUP BY f
         |UNION ALL
         |SELECT '$p', CAST($v AS BIGINT), f, 'guard',
         |       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |FROM foldswp""".stripMargin
    }
    sqlBase +
      s""", ndpswp AS (
         |  SELECT e, MAX(d) - MIN(d) + 1 AS ndp2
         |  FROM dpx
         |  WHERE (k % 4 <> 1 OR (k + d) % 7 <> 0)
         |    AND k % 3 <> 2 AND u % 2 = 0
         |  GROUP BY e),
         |selswp AS (
         |  SELECT ev.e, ((ev.e * 2654435761) % 4294967296) % 3 AS fold,
         |         ndp2, ev.label, ev.sub_type
         |  FROM ev JOIN ndpswp ON ev.e = ndpswp.e
         |  WHERE ev.k % 3 <> 2 AND ev.u % 2 = 0),
         |foldswp AS (SELECT unnest(range(0, 3)) AS f)
         |${blocks.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** The ml10 network: FIXED small-integer weights over a 6×5 image so
    * that every intermediate of the real 2-D CNN forward — same-padded
    * 3×3 convs, ReLU, same-pool maxes, dense logit — is an exact
    * integer (|logit| ≪ 2^53) and the cross-engine compare is a plain
    * hash (the ml3 oracle class: mul/add/compare only). Two layers
    * (1→2→2 channels) so the stack, the channel chain, AND the odd-dim
    * same-pool edges (6×5 → 3×3 → 2×2) are all exercised. ONE source
    * of truth: [[ml10Sql]]'s staged per-cell CTEs are GENERATED from
    * this object's weights. */
  private val ml10Net: graft.ml.SpecCnn.SpecCnnModel = {
    import graft.ml.SpecCnn.{Layer, SpecCnnModel}
    val l0 = Layer(1, 2,
      w = Array.tabulate(2 * 1 * 9)(i => ((i * 5) % 7 - 3).toDouble),
      b = Array.tabulate(2)(o => (o - 1).toDouble))
    val l1 = Layer(2, 2,
      w = Array.tabulate(2 * 2 * 9)(i => ((i * 3) % 5 - 2).toDouble),
      b = Array.tabulate(2)(o => (1 - o).toDouble))
    SpecCnnModel(6, 5, Array(l0, l1),
      dense = Array.tabulate(2 * 2 * 2)(i => ((i * 7) % 5 - 2).toDouble),
      bias = 1.0, mean = 0.0, std = 1.0)
  }

  /** ML10 — the spectrogram-model 2-D CNN forward pass under the
    * oracle gate ([[graft.ml.SpecCnn.logitCol]]; the reference's
    * `specCnnModel.py` makeModel, the last nnModel subclass): the
    * fixture window's first 30 magnitude samples read as a 6×5
    * freq-major image → conv(3×3 same)→ReLU→maxpool(2×2 same), twice →
    * dense logit, as ONE native codegen'd expression. The SPECTROGRAM
    * extraction is spec-gated ([[graft.ml.SpecCnn.specImage]] —
    * SpecCnnSpec's layout/DC/sine-bin tests; DFT magnitudes are
    * transcendental, not a cross-engine hash contract), and the
    * TRAINER is spec-gated (finite-difference gradient + planted
    * corpus); the architecture both produce and consume IS gated here
    * bit-exactly via [[ml10Net]]'s integer weights. */
  def ml10SpecCnn(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        graft.ml.SpecCnn.logitCol(ml10Net, slice(col("rawData"), 1, 30))
          .cast("long").as("logit"))

  val ml10Sql: String = {
    val m = ml10Net
    // plan-time dims per level: 6×5 → 3×3 → 2×2
    val dims = Seq((6, 5), (3, 3), (2, 2))
    def wv(l: Int, o: Int, ci: Int, dy: Int, dx: Int): Long =
      m.layers(l).w(((o * m.layers(l).cIn + ci) * 3 + dy) * 3 + dx).toLong
    // conv cell (o, f, s) of layer l over input refs `in(ci, ff, ss)`
    def convCell(l: Int, o: Int, f: Int, s: Int,
                 in: (Int, Int, Int) => String): String = {
      val (h, w) = dims(l)
      val terms = for {
        ci <- 0 until m.layers(l).cIn
        dy <- 0 until 3
        ff = f + dy - 1
        if ff >= 0 && ff < h
        dx <- 0 until 3
        ss = s + dx - 1
        if ss >= 0 && ss < w
      } yield s"(${wv(l, o, ci, dy, dx)})*${in(ci, ff, ss)}"
      s"GREATEST(0, ${m.layers(l).b(o).toLong} + ${terms.mkString(" + ")})"
    }
    // pool cell (o, fp, sp) at level l+1 over act refs `a(o, f, s)`
    def poolCell(l: Int, o: Int, fp: Int, sp: Int,
                 a: (Int, Int, Int) => String): String = {
      val (h, w) = dims(l)
      val cells = for {
        f <- Seq(2 * fp, 2 * fp + 1) if f < h
        s <- Seq(2 * sp, 2 * sp + 1) if s < w
      } yield a(o, f, s)
      if (cells.size == 1) cells.head else s"GREATEST(${cells.mkString(", ")})"
    }
    def grid(l: Int): Seq[(Int, Int, Int)] = for {
      o <- 0 until m.layers(l).cOut
      f <- 0 until dims(l)._1
      s <- 0 until dims(l)._2
    } yield (o, f, s)
    def pgrid(l: Int): Seq[(Int, Int, Int)] = for {
      o <- 0 until m.layers(l).cOut
      f <- 0 until dims(l + 1)._1
      s <- 0 until dims(l + 1)._2
    } yield (o, f, s)
    val a0 = grid(0).map { case (o, f, s) =>
      s"${convCell(0, o, f, s, (_, ff, ss) => s"xs[${ff * 5 + ss + 1}]")} AS a${o}_${f}_$s"
    }
    val p0 = pgrid(0).map { case (o, fp, sp) =>
      s"${poolCell(0, o, fp, sp, (oo, f, s) => s"a${oo}_${f}_$s")} AS p${o}_${fp}_$sp"
    }
    val a1 = grid(1).map { case (o, f, s) =>
      s"${convCell(1, o, f, s, (ci, ff, ss) => s"p${ci}_${ff}_$ss")} AS b${o}_${f}_$s"
    }
    val p1 = pgrid(1).map { case (o, fp, sp) =>
      s"${poolCell(1, o, fp, sp, (oo, f, s) => s"b${oo}_${f}_$s")} AS q${o}_${fp}_$sp"
    }
    val dense = (for {
      c <- 0 until 2; f <- 0 until 2; s <- 0 until 2
    } yield s"(${m.dense(((c * 2) + f) * 2 + s).toLong})*q${c}_${f}_$s")
      .mkString(" + ")
    sqlBase +
      s""", xs10 AS (
         |  SELECT e, d, list(m ORDER BY i) AS xs FROM sampm
         |  WHERE i < 30 GROUP BY e, d),
         |c10a AS (SELECT e, d, ${a0.mkString(",\n         ")} FROM xs10),
         |c10p AS (SELECT e, d, ${p0.mkString(",\n         ")} FROM c10a),
         |c10b AS (SELECT e, d, ${a1.mkString(",\n         ")} FROM c10p),
         |c10q AS (SELECT e, d, ${p1.mkString(",\n         ")} FROM c10b)
         |SELECT e, d, CAST(${m.bias.toLong} + $dense AS BIGINT) AS logit
         |FROM c10q""".stripMargin
  }

  /** RPT5 — the results-analysis tool under the oracle gate
    * ([[graft.report.ResultsAnalysis.analyze]]; the reference's
    * `user_tools/nnTraining2/analyzeEventResults.py:123-255`):
    * per-user TPR/FAR with sparse users folded to 'Other', per-subType
    * TPR, and the combined tonic-clonic row, over a deterministic
    * fixture "prediction" column ((e·13+7) mod 10 < 6). Rates are one
    * integer division each — bit-identical cross-engine, compared
    * raw. Thresholds 2/2 so the fixture actually exercises both the
    * named-user and 'Other' branches; the TC pattern is
    * fixture-adapted ('tonicclonic' — the engine default stays the
    * tool's 'tonic-clonic'/'combined'). */
  def rpt5ResultsAnalysis(s: SparkSession, d: String): DataFrame = {
    val res = OsdbFixture.ev(s, d).filter(col("k") % 3 =!= 2).select(
      col("e").cast("string").as("eventId"),
      col("u").as("userId"),
      when(col("k") % 3 === 0, 1).otherwise(0).as("label"),
      when((col("e") * 13 + 7) % 10 < 6, 1).otherwise(0).as("prediction"),
      col("sub_type").as("subType"))
    graft.report.ResultsAnalysis.analyze(res, seizureThreshold = 2,
      farThreshold = 2, tcPatterns = Seq("tonicclonic"))
  }

  val rpt5Sql: String = sqlBase +
    """, res5 AS (
      |  SELECT e, u, sub_type,
      |         CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END AS label,
      |         CASE WHEN (e * 13 + 7) % 10 < 6 THEN 1 ELSE 0 END AS pred
      |  FROM ev WHERE k % 3 <> 2),
      |sz5 AS (SELECT * FROM res5 WHERE label = 1),
      |szc5 AS (SELECT u, COUNT(*) AS n FROM sz5 GROUP BY u),
      |szg5 AS (SELECT CASE WHEN c.n < 2 THEN 'Other'
      |                     ELSE CAST(s.u AS VARCHAR) END AS grp, s.pred
      |         FROM sz5 s JOIN szc5 c ON s.u = c.u),
      |ns5 AS (SELECT * FROM res5 WHERE label = 0),
      |nsc5 AS (SELECT u, COUNT(*) AS n FROM ns5 GROUP BY u),
      |nsg5 AS (SELECT CASE WHEN c.n < 2 THEN 'Other'
      |                     ELSE CAST(s.u AS VARCHAR) END AS grp, s.pred
      |         FROM ns5 s JOIN nsc5 c ON s.u = c.u)
      |SELECT 'user_tpr' AS side, grp, COUNT(*) AS n_events,
      |       CAST(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_pred_pos,
      |       CAST(SUM(CASE WHEN pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_pred_neg,
      |       CAST(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |         / COUNT(*) AS rate
      |FROM szg5 GROUP BY grp
      |UNION ALL
      |SELECT 'user_far', grp, COUNT(*),
      |       CAST(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(SUM(CASE WHEN pred = 0 THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |         / COUNT(*)
      |FROM nsg5 GROUP BY grp
      |UNION ALL
      |SELECT 'subtype_tpr', sub_type, COUNT(*),
      |       CAST(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(SUM(CASE WHEN pred = 0 THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |         / COUNT(*)
      |FROM sz5 WHERE sub_type IS NOT NULL GROUP BY sub_type
      |UNION ALL
      |SELECT 'tc_combined', 'tc_combined', COUNT(*),
      |       CAST(COALESCE(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END), 0)
      |         AS BIGINT),
      |       CAST(COALESCE(SUM(CASE WHEN pred = 0 THEN 1 ELSE 0 END), 0)
      |         AS BIGINT),
      |       CASE WHEN COUNT(*) > 0 THEN
      |         CAST(COALESCE(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END), 0)
      |           AS DOUBLE) / COUNT(*)
      |       ELSE 0.0 END
      |FROM sz5
      |WHERE contains(lower(COALESCE(sub_type, '')), 'tonicclonic')""".stripMargin

  /** CUR1 — the curator's alarm-state consistency check under the
    * oracle gate ([[graft.operators.Curate.checkAlarmStates]];
    * `curator_tools/checkAlarmStates.py`): the event's stored top-level
    * state (here the fixture's d = 0 state — a plausibly-buggy
    * dashboard convention, which is exactly the bug the tool was
    * written to catch) vs the max over its datapoints; only the
    * mismatch rows come back. */
  def cur1AlarmCheck(s: SparkSession, d: String): DataFrame = {
    val dpAlarms = OsdbFixture.dps(s, d, arrays = false)
      .select(col("e").as("eventId"), col("alarm").as("alarmState"))
    val events = OsdbFixture.ev(s, d).select(
      col("e").as("eventId"),
      when(col("k") % 9 < 4, col("k") % 9).otherwise(0L).as("osdAlarmState"))
    graft.operators.Curate.checkAlarmStates(events, dpAlarms)
      .select(col("eventId").as("e"), col("stored"), col("derived"))
  }

  val cur1Sql: String = sqlBase +
    """, ca AS (
      |  SELECT e, CASE WHEN k % 9 < 4 THEN k % 9 ELSE 0 END AS stored,
      |         MAX(alarm) AS derived
      |  FROM dpx GROUP BY e, k)
      |SELECT e, stored, derived FROM ca WHERE stored <> derived""".stripMargin

  /** CUR2 — the curator's reference-priority multi-source merge under
    * the oracle gate ([[graft.operators.Curate.mergePriority]];
    * `curator_tools/merge_json.py`: the first file is the reference
    * dataset, its version of an event wins; otherwise the earliest
    * source that has it): three overlapping fixture slices with
    * source-distinct payloads so the winner is observable. */
  def cur2MergePriority(s: SparkSession, d: String): DataFrame = {
    val base = OsdbFixture.ev(s, d)
    def src(cond: org.apache.spark.sql.Column, m: Long, a: Long) =
      base.filter(cond).select(col("e"), (col("k") * m + a).as("v"))
    graft.operators.Curate.mergePriority(Seq(
        src(col("k") % 4 === 0, 3, 1),
        src(col("k") % 3 === 0, 5, 2),
        src(col("k") % 2 === 0, 7, 3)), "e")
      .select(col("e"), col("src_index").cast("long").as("src_index"),
        col("v"))
  }

  val cur2Sql: String = sqlBase +
    """, mg0 AS (SELECT e, k*3+1 AS v, 0 AS si FROM ev WHERE k % 4 = 0),
      |mg1 AS (SELECT e, k*5+2 AS v, 1 AS si FROM ev WHERE k % 3 = 0),
      |mg2 AS (SELECT e, k*7+3 AS v, 2 AS si FROM ev WHERE k % 2 = 0),
      |mgu AS (SELECT * FROM mg0 UNION ALL SELECT * FROM mg1
      |        UNION ALL SELECT * FROM mg2)
      |SELECT e, CAST(MIN(si) AS BIGINT) AS src_index,
      |       arg_min(v, si) AS v
      |FROM mgu GROUP BY e""".stripMargin

  /** FA1 — the false-alarm dashboard grouping under the oracle gate
    * (`user_tools/dataSummariser/false_alarm_analysis.py:99-121`:
    * events grouped by (type, userId, 1-day period), per-group event
    * counts — the frame behind the per-user false-alarm-rate
    * dashboard). Day buckets as integer epoch-day (wts div 86400),
    * the exact restatement of pandas' `Grouper(freq='1D')` on an
    * epoch-derived datetime. */
  def fa1FalseAlarmPeriods(s: SparkSession, d: String): DataFrame =
    OsdbFixture.ev(s, d)
      .groupBy(col("type_str").as("type"), col("u"),
        expr("wts div 86400").as("day_bucket"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("type"), col("u"), col("day_bucket"), col("n_events"))

  val fa1Sql: String = sqlBase +
    """ SELECT type_str AS type, u, wts // 86400 AS day_bucket,
      |       COUNT(*) AS n_events
      |FROM ev GROUP BY 1, 2, 3""".stripMargin

  /** DASH1 — the data dashboard under the oracle gate
    * (`user_tools/dataSummariser/dashboard.py`): the last uncovered
    * dataSummariser tool, three of its steps composed as one frame —
    *
    *   1. `getNewEventsIdsLst` (dashboard.py:51-68): incoming event ids
    *      not already in the database and not config-listed invalid —
    *      an ANTI join (F4's pattern) against the existing lake plus an
    *      anti semi-filter on the invalid list;
    *   2. `getEventsDf`'s warning filter (dashboard.py:114-116):
    *      keep Seizure/Fall events and anything whose alarm state is
    *      not WARNING (1) — warnings only survive when seizure-tagged;
    *   3. `getGroupedData` (dashboard.py:132-155): the dashboard table,
    *      count per (type, userId, 1-day period) — fa1's day-bucket
    *      restatement of pandas' `Grouper(freq='1D')`.
    *
    * Fixture slices: the "existing DB" is the k%3==0 ∪ k%7==2 slice,
    * the invalid list is k%17==3, the event alarm state is cur1's
    * stored-state formula. Scale shape: both the existing-id side and
    * the invalid side join as broadcast-able id sets (at 100 TB the
    * incoming batch anti-joins the lake's bucketed id column — F4's
    * documented plan); the day-bucket rollup is one hash aggregate. */
  def dash1NewEvents(s: SparkSession, d: String): DataFrame = {
    val ev = OsdbFixture.ev(s, d)
    val existing = ev.filter(col("k") % 3 === 0 || col("k") % 7 === 2)
      .select(col("e").as("ex_e"))
    val invalid = ev.filter(col("k") % 17 === 3).select(col("e").as("inv_e"))
    val alarmState = when(col("k") % 9 < 4, col("k") % 9).otherwise(0L)
    ev.join(existing, col("e") === col("ex_e"), "left_anti")
      .join(invalid, col("e") === col("inv_e"), "left_anti")
      .withColumn("alarm_state", alarmState)
      .filter(col("type_str") === "Seizure" || col("type_str") === "Fall" ||
        col("alarm_state") =!= 1)
      .groupBy(col("type_str").as("type"), col("u"),
        expr("wts div 86400").as("day_bucket"))
      .agg(count(lit(1)).as("n_new"))
      .select(col("type"), col("u"), col("day_bucket"), col("n_new"))
  }

  val dash1Sql: String = sqlBase +
    """, dnew AS (
      |  SELECT *, CASE WHEN k % 9 < 4 THEN k % 9 ELSE 0 END AS alarm_state
      |  FROM ev
      |  WHERE NOT (k % 3 = 0 OR k % 7 = 2) AND k % 17 <> 3)
      |SELECT type_str AS type, u, wts // 86400 AS day_bucket,
      |       COUNT(*) AS n_new
      |FROM dnew
      |WHERE type_str IN ('Seizure', 'Fall') OR alarm_state <> 1
      |GROUP BY 1, 2, 3""".stripMargin

  /** RPT6 — `analyzeData.py` parity (`user_tools/nnTraining2/
    * analyzeData.py:19-113`: per-event datapoint counts + global
    * seizure/non-seizure totals over a pipeline CSV), as ONE rollup
    * frame: per-event rows carry (type, dp count); the rollup total
    * row carries the global statistics (total events, total
    * datapoints, seizure/non-seizure event counts, avg dps/event —
    * one exact division). The reference's seizure test ('1' in the
    * type string) is the fixture's label == 1. One scan, one hash
    * aggregate — scales as a pure map-side-combined rollup. */
  def rpt6AnalyzeData(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d, arrays = false)
      .rollup(col("e"))
      .agg(
        max(col("type_str")).as("type_str"),
        count(lit(1)).as("n_dp"),
        countDistinct(col("e")).as("n_events"),
        countDistinct(when(col("label") === 1, col("e")))
          .as("n_seizure_events"),
        countDistinct(when(col("label") =!= 1, col("e")))
          .as("n_non_seizure_events"))
      .withColumn("avg_dp",
        col("n_dp").cast("double") / col("n_events"))

  val rpt6Sql: String = sqlBase +
    """SELECT e, MAX(type_str) AS type_str, COUNT(*) AS n_dp,
      |       COUNT(DISTINCT e) AS n_events,
      |       COUNT(DISTINCT CASE WHEN label = 1 THEN e END)
      |         AS n_seizure_events,
      |       COUNT(DISTINCT CASE WHEN label <> 1 THEN e END)
      |         AS n_non_seizure_events,
      |       CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT e) AS avg_dp
      |FROM dpx
      |GROUP BY ROLLUP(e)""".stripMargin

  /** RPT7 — `compare_your_models.py` parity
    * (`user_tools/nnTraining2/compare_your_models.py` +
    * `nnTrainer.calculate_selection_metric:697-751`): per candidate
    * model, (TPR, FPR) from a thresholded score over the fixture
    * events, then the selection metrics — F-beta over the
    * (sensitivity, specificity) pair for β ∈ {0.25, 0.5, 1, 2, 4}
    * (all powers of two, so β² is exact), Youden's J (TPR − FPR), and
    * the per-β winner. TPR/FPR are single exact divisions of integer
    * counts; the F-beta chain is a multiply-accumulate → ×1e6 ROUND
    * grid (the ml5 FMA discipline); the winner ranks on the INTEGER
    * grid with a model-id tiebreak, so the argmax can never flip on a
    * float ulp. One scan builds all five models' confusion counts
    * (conditional sums); the 25-row metric grid is a broadcast cross
    * join against the one-row count frame — nothing here grows with
    * the corpus except the first aggregate. */
  def rpt7ModelCompare(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val models = 0 until 5
    val betas = Seq(0.25, 0.5, 1.0, 2.0, 4.0)
    val perModel = models.flatMap { f =>
      val pred = (col("e") * 13 + (f + 1) * 29) % 97 >= 50
      Seq(
        sum(when(pred && col("label") === 1, 1L).otherwise(0L)).as(s"tp$f"),
        sum(when(pred && col("label") =!= 1, 1L).otherwise(0L)).as(s"fp$f"))
    }
    val aggCols = Seq(
      sum(when(col("label") === 1, 1L).otherwise(0L)).as("pos"),
      sum(when(col("label") =!= 1, 1L).otherwise(0L)).as("neg")) ++ perModel
    val counts = OsdbFixture.ev(s, d).agg(aggCols.head, aggCols.tail: _*)
    val mb = models.flatMap(f => betas.map(b => (f, b)))
      .toDF("model", "beta")
    def pick(prefix: String): org.apache.spark.sql.Column =
      models.tail.foldLeft(
        when(col("model") === 0, col(s"${prefix}0"))) { (acc, f) =>
        acc.when(col("model") === f, col(s"$prefix$f"))
      }
    val tpr = pick("tp").cast("double") / col("pos")
    val fpr = pick("fp").cast("double") / col("neg")
    val spec = lit(1.0) - fpr
    val bsq = col("beta") * col("beta")
    val fbeta = (lit(1.0) + bsq) * (tpr * spec) / (bsq * spec + tpr)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("beta"))
      .orderBy(col("fbeta_x1e6").desc, col("model"))
    counts.crossJoin(mb)
      .select(col("model"), col("beta"),
        tpr.as("tpr"), fpr.as("fpr"),
        round(fbeta * 1e6).cast("long").as("fbeta_x1e6"),
        (tpr - fpr).as("youden"))
      .withColumn("winner", row_number().over(w) === 1)
  }

  val rpt7Sql: String = sqlBase +
    """, fgrid AS (SELECT unnest(range(0, 5)) AS model),
      |cnt AS (
      |  SELECT f.model AS model,
      |    SUM(CASE WHEN (e*13 + (f.model+1)*29) % 97 >= 50 AND label = 1
      |        THEN 1 ELSE 0 END) AS tp,
      |    SUM(CASE WHEN (e*13 + (f.model+1)*29) % 97 >= 50 AND label <> 1
      |        THEN 1 ELSE 0 END) AS fp,
      |    SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS pos,
      |    SUM(CASE WHEN label <> 1 THEN 1 ELSE 0 END) AS neg
      |  FROM ev, fgrid f
      |  GROUP BY 1),
      |grid AS (
      |  SELECT model, beta,
      |    CAST(tp AS DOUBLE)/pos AS tpr, CAST(fp AS DOUBLE)/neg AS fpr
      |  FROM cnt, (SELECT unnest([0.25, 0.5, 1.0, 2.0, 4.0]) AS beta) b),
      |met AS (
      |  SELECT model, beta, tpr, fpr,
      |    CAST(ROUND((1.0 + beta*beta) * (tpr * (1.0 - fpr))
      |      / (beta*beta * (1.0 - fpr) + tpr) * 1000000.0) AS BIGINT)
      |      AS fbeta_x1e6,
      |    tpr - fpr AS youden
      |  FROM grid)
      |SELECT model, beta, tpr, fpr, fbeta_x1e6, youden,
      |  ROW_NUMBER() OVER (PARTITION BY beta
      |    ORDER BY fbeta_x1e6 DESC, model) = 1 AS winner
      |FROM met""".stripMargin

  private val rpt3RunId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** RPT3 — the SHARDED index itself under the oracle gate: the
    * round-11 pagination rewrite ([[graft.report.Summarise
    * .writeIndexShards]] — two-phase distributed rank, ≤pageSize rows
    * per executor-rendered page) emits per-shard metadata (category,
    * shard, n_rows, first/last event id), and the oracle restates it
    * from the fixture's bucketing with a plain ROW_NUMBER slice: a
    * mis-sized shard, a row landing on the wrong page, or a chain that
    * does not reproduce the per-category STRING id order breaks the
    * hash. pageSize = 7 forces multi-shard chains at every sf. The
    * final metadata localize is the gate instrument (O(shards) at
    * fixture scale); production callers consume the distributed
    * dataset [[graft.report.Summarise.writeIndexShards]] returns. */
  def rpt3IndexShards(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val outDir = qtmp(s, s"rpt3_${rpt3RunId.incrementAndGet()}")
    val idx = graft.report.Summarise.indexSummary(
        OsdbFixture.nested(s, d, arrays = false))
      .select(col("category"), col("id"), col("userId"),
        col("type").as("typeStr"), col("subType"), col("n_dp").as("nDp"))
      .as[graft.report.Summarise.IdxRow]
    val (shards, _) =
      graft.report.Summarise.writeIndexShards(idx, outDir, pageSize = 7)
    val rows = shards.collect()
    shards.unpersist()
    rows.toSeq.toDF()
      .select(col("category"), col("shard"), col("nRows").as("n_rows"),
        col("loId").as("lo_id"), col("hiId").as("hi_id"))
  }

  val rpt3Sql: String = sqlBase +
    """, catev AS (
      |  SELECT 'tcSeizures' AS category, CAST(e AS VARCHAR) AS id FROM ev
      |    WHERE k % 3 = 0 AND k % 5 < 2
      |  UNION ALL SELECT 'allSeizures', CAST(e AS VARCHAR) FROM ev WHERE k % 3 = 0
      |  UNION ALL SELECT 'falseAlarms', CAST(e AS VARCHAR) FROM ev WHERE k % 3 = 1
      |  UNION ALL SELECT 'otherEvents', CAST(e AS VARCHAR) FROM ev WHERE k % 3 = 2)
      |SELECT category, CAST((rn - 1) // 7 AS BIGINT) AS shard,
      |       COUNT(*) AS n_rows, MIN(id) AS lo_id, MAX(id) AS hi_id
      |FROM (SELECT category, id,
      |        row_number() OVER (PARTITION BY category ORDER BY id) AS rn
      |      FROM catev)
      |GROUP BY 1, 2""".stripMargin

  /** VIZ1 — dataVisualiser series parity (`user_tools/dataVisualiser/
    * frequency_band_energy_plotter.py`, `skewness_kurtosis_plotter.py`,
    * `std_and_max_acceleration_plotter.py`): the three standalone
    * plotters' per-datapoint series as ONE stacked query over the
    * existing P10/C14 kernels — the series themselves, so "the chart is
    * one query away" stops being an argument and becomes a row hash.
    *
    * Exactness per series, each the established discipline for its
    * value class: `band_total_x1000` runs [[Signal.bandPower]]'s real
    * DFT over the tone fixture and answers p10's closed form (integer
    * after the ×1000 bridge); `max_accel` is an integer max over the
    * magnitude samples; `std` compares by IN-EVENT RANK (c14's trick —
    * its values space widely); skewness/kurtosis are NEARLY CONSTANT
    * across a fixture event (rank order there is float noise — measured:
    * the rank form flipped ~40 kurt pairs), so they compare as ×1e6
    * ROUND-GRID VALUES instead (round, not floor: a symmetric window's
    * true skew is 0 and the kernel's accumulation lands at ±ε, which
    * floor splits across the zero boundary — measured on 5 fixture dps), against the oracle's algebraically
    * equal central-power-sum forms (skew = √n·c3/c2^1.5,
    * kurt = n·c4/c2² − 3; paths differ by ~1e-12, six orders inside
    * the grid). The report layer renders these exact series in its
    * event pages (ReportSpec). */
  def viz1DatavizSeries(s: SparkSession, d: String): DataFrame = {
    val band = OsdbFixture.toneDps(s, d)
      .select(col("e"), col("d"), lit("band_total_x1000").as("series"),
        round(bandPowerUdf(col("rawData")).getItem(0) * 1000)
          .cast("long").as("v"))
    val stats = OsdbFixture.dps(s, d).filter(col("has_raw"))
      .select(col("e"), col("d"),
        expr("array_max(rawData)").as("mx"),
        stdUdf(col("rawData")).as("sd"),
        skewUdf(col("rawData")).as("sk"),
        kurtUdf(col("rawData")).as("ku"))
    def rankOf(c: String, name: String) = stats
      .withColumn("v", row_number().over(
        Window.partitionBy("e").orderBy(col(c).desc, col("d"))).cast("long"))
      .select(col("e"), col("d"), lit(name).as("series"), col("v"))
    def gridOf(c: String, name: String) = stats
      .select(col("e"), col("d"), lit(name).as("series"),
        round(col(c) * 1e6).cast("long").as("v"))
    band
      .unionByName(stats.select(col("e"), col("d"),
        lit("max_accel").as("series"), col("mx").cast("long").as("v")))
      .unionByName(rankOf("sd", "std_rank"))
      .unionByName(gridOf("sk", "skew_x1e6"))
      .unionByName(gridOf("ku", "kurt_x1e6"))
  }

  val viz1Sql: String = sqlBase +
    """, cm AS (
      |  SELECT s.e AS e, s.d AS d,
      |         MAX(s.m) AS mx,
      |         SUM((s.m - g.mn)*(s.m - g.mn)) AS c2,
      |         SUM((s.m - g.mn)*(s.m - g.mn)*(s.m - g.mn)) AS c3,
      |         SUM((s.m - g.mn)*(s.m - g.mn)*(s.m - g.mn)*(s.m - g.mn)) AS c4
      |  FROM sampm s
      |  JOIN (SELECT e, d, CAST(SUM(m) AS DOUBLE)/125.0 AS mn
      |        FROM sampm GROUP BY e, d) g
      |    ON s.e = g.e AND s.d = g.d
      |  GROUP BY s.e, s.d)
      |SELECT e, d, 'band_total_x1000' AS series, CAST(a1*a1*500 AS BIGINT) AS v
      |FROM (SELECT e, d, 4*(1 + k % 3) AS a1 FROM dpx)
      |UNION ALL SELECT e, d, 'max_accel', CAST(mx AS BIGINT) FROM cm
      |UNION ALL SELECT e, d, 'std_rank',
      |  CAST(row_number() OVER (PARTITION BY e ORDER BY c2 DESC, d) AS BIGINT)
      |FROM cm
      |UNION ALL SELECT e, d, 'skew_x1e6',
      |  CAST(ROUND(1e6 * (SQRT(125.0) * c3 / POW(c2, 1.5))) AS BIGINT)
      |FROM cm
      |UNION ALL SELECT e, d, 'kurt_x1e6',
      |  CAST(ROUND(1e6 * (125.0 * c4 / (c2*c2) - 3.0)) AS BIGINT)
      |FROM cm""".stripMargin

  private val lake9RunId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** LAKE9 — vacuum end to end
    * ([[graft.sources.LakeMaintenance.vacuum]], the round-10 missing
    * half of lake8's versioning contract): commit v1 (cohort A), v2 as
    * an APPEND carrying v1 (cohort B), and v3 (a doomed cohort C), then
    * vacuum retaining ONLY v2. v3's data files and the v1/v3 manifests
    * must go (the result pins manifests_deleted = 2); v1's FILES must
    * SURVIVE because v2's manifest still references them. The retained
    * snapshot is then aggregated — a vacuum that deletes carried files
    * loses cohort A's rows, one that misses v3's files leaves the count
    * wrong, and either breaks the hash. The loud-read-of-vacuumed-
    * version half of the contract is spec-pinned (OperatorsSpec), where
    * exception semantics belong. */
  def lake9Vacuum(s: SparkSession, d: String): DataFrame = {
    // fresh lake per invocation, like lake8: versions are immutable and
    // vacuumed version numbers are burned — Bench re-runs every entry
    val dir = qtmp(s, s"lake9_lake_${lake9RunId.incrementAndGet()}")
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 0), version = 1)
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 1), version = 2,
      carryFrom = Some(1))
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 2), version = 3)
    val deleted = graft.sources.LakeMaintenance.vacuum(s, dir, Seq(2))
    val manifestsGone = deleted.filter(col("kind") === "manifest").count()
    graft.sources.LakeMaintenance.readVersion(s, dir, 2)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      .withColumn("manifests_deleted", lit(manifestsGone))
  }

  val lake9Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
      |  CAST(2 AS BIGINT) AS manifests_deleted
      |FROM events WHERE user_id % 3 IN (0, 1) GROUP BY 1""".stripMargin

  private val lake10RunId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** LAKE10 — ATOMIC targeted delete through the versioned lake
    * ([[graft.sources.LakeMaintenance.deleteWhereVersioned]], the
    * manifest-commit answer to lake5's documented delete+rename
    * window): commit v1, delete one user cohort into v2 with
    * file-level pruning, then read BOTH versions — v2 must hold
    * exactly the survivors while v1 still holds everything (snapshot
    * isolation through a delete, the recall-a-bad-batch-without-
    * losing-history operation). The oracle restates both snapshots
    * from the source table; a row leaking between versions, a survivor
    * lost from a rewritten file, or a carried file dropped from the
    * manifest all break the hash. */
  def lake10VersionedDelete(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, s"lake10_lake_${lake10RunId.incrementAndGet()}")
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    graft.sources.LakeMaintenance.commitVersion(s, dir,
      ev.repartition(4, col("user_id")), version = 1)
    graft.sources.LakeMaintenance.deleteWhereVersioned(
      s, dir, fromVersion = 1, newVersion = 2,
      predicate = col("user_id") % 5 === 2)
    def agg(v: Int): DataFrame =
      graft.sources.LakeMaintenance.readVersion(s, dir, v)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
        .select(lit(v.toLong).as("version"), col("event_type"), col("n"),
          col("id_sum"))
    agg(1).unionByName(agg(2))
  }

  val lake10Sql: String =
    """SELECT 1 AS version, event_type, COUNT(*) AS n,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events GROUP BY 2
      |UNION ALL
      |SELECT 2, event_type, COUNT(*),
      |  CAST(SUM(event_id) AS BIGINT)
      |FROM events WHERE user_id % 5 <> 2 GROUP BY 2""".stripMargin

  /** S4B — DRF-PAGINATED listing through the same [[graft.sources
    * .WebApi]] connector (the round-10 pagination fix, oracled): the
    * ub==4 fixture slice is split across THREE chained
    * `{"count", "next", "results"}` pages — only page 1 sits at the
    * filtered listing URL; pages 2 and 3 are reachable ONLY by
    * following `next` links. The oracle restates the whole slice, so a
    * connector that stops at the first response (the reference
    * client's behavior) is missing two-thirds of its rows and breaks
    * the hash. Filter pushdown still gates the entry: only the
    * `?user=4` page chain is staged. */
  def s4bPagedListing(s: SparkSession, d: String): DataFrame = {
    val base = new java.io.File(qtmp(s, "s4b_paged"))
    base.mkdirs()
    val apiBase = "http://osdb.fixture/api"
    val listing = OsdbFixture.ev(s, d).filter(col("ub") === 4)
      .select(
        col("e").cast("string").as("id"),
        col("ub").cast("string").as("userId"),
        col("type_str").as("type"),
        col("sub_type").as("subType"))
    val stage = new java.io.File(base, "_stage_listing")
    listing.coalesce(1).write.mode("overwrite").json(stage.getAbsolutePath)
    val part = stage.listFiles().find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"no part- file in staged JSON dir $stage"))
    val lines = Vector.newBuilder[String]
    java.nio.file.Files.readAllLines(part.toPath)
      .forEach(l => if (l.nonEmpty) lines += l)
    val all = lines.result()
    val pages = all.grouped(math.max(1, (all.size + 2) / 3)).toSeq
    def pageUrl(i: Int): String =
      if (i == 0) s"$apiBase/events/?user=4"
      else s"$apiBase/events/?user=4&page=${i + 1}"
    pages.zipWithIndex.foreach { case (g, i) =>
      val next =
        if (i == pages.size - 1) "null" else "\"" + pageUrl(i + 1) + "\""
      java.nio.file.Files.write(
        new java.io.File(base,
          graft.sources.WebApi.cacheKey(pageUrl(i))).toPath,
        s"""{"count":${all.size},"next":$next,"results":[${g.mkString(",")}]}"""
          .getBytes("UTF-8"))
    }
    graft.sources.WebApi.readEvents(s, Map(
        "baseUrl" -> apiBase, "transport" -> "file",
        "fixtureDir" -> base.getAbsolutePath))
      .filter(col("userId") === "4")
      .groupBy("type")
      .agg(count(lit(1)).as("n"), sum(col("id").cast("long")).as("id_sum"))
  }

  val s4bSql: String = sqlBase +
    """SELECT type_str AS type, COUNT(*) AS n, CAST(SUM(e) AS BIGINT) AS id_sum
      |FROM ev WHERE ub = 4 GROUP BY 1""".stripMargin

  /** LAKE7 — format-agnostic lake layer: the same partitioned write /
    * pruned read / aggregate path as lake1-lake3, through ORC instead
    * of parquet (both columnar formats ship in Spark; a real lake mixes
    * them during migrations). The read applies a partition-pruning
    * filter (category = 'click') so the entry also gates that ORC scans
    * prune directories the way parquet scans do; the oracle restates
    * the aggregate off the original table — a row lost or duplicated in
    * the ORC round trip, or a partition mis-pruned, breaks the hash.
    * Timestamps are excluded from the round trip on purpose: the lake
    * content here is the id/user/value payload (ORC session-tz
    * timestamp semantics differ from parquet's and deserve their own
    * migration story, not a silent dependency). */
  def lake7Orc(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "lake7_orc")
    graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .withColumn("category", col("event_type"))
      .write.mode("overwrite").partitionBy("category").orc(dir)
    s.read.orc(dir)
      .filter(col("category") === "click")
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("id_sum"),
        Exact.dsum(col("value")).as("value_sum"))
  }

  val lake7Sql: String =
    s"""SELECT event_type AS category, COUNT(*) AS n,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
       |  ${Exact.dsumSql("value")} AS value_sum
       |FROM events WHERE event_type = 'click' GROUP BY 1""".stripMargin

  /** LAKE5 — TARGETED DELETE end to end ([[graft.sources.LakeMaintenance
    * .deleteWhere]], the right-to-be-forgotten / bad-batch-recall op):
    * the events lake partitioned by category, every row of the
    * user_id % 7 == 3 cohort deleted, the SURVIVING lake read back and
    * aggregated. The operator rewrites only partitions containing
    * matches (here all of them — user ids are uncorrelated with
    * category; the partial-rewrite evidence, untouched-partition files
    * byte-identical, is OperatorsSpec's crafted-layout test) and swaps
    * directories atomically per partition. The oracle restates the
    * surviving aggregate off the original table, so a row deleted too
    * many or too few — or a partition lost in the swap — breaks the
    * hash. */
  def lake5Delete(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "lake5_lake")
    graft.sources.OsdbJson.writeEventsParquet(
      graft.Tables.events(s, d).withColumn("category", col("event_type")),
      dir)
    graft.sources.LakeMaintenance.deleteWhere(s, dir, "category",
      col("user_id") % 7 === 3)
    s.read.parquet(dir)
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("id_sum"))
  }

  val lake5Sql: String =
    """SELECT event_type AS category, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events WHERE user_id % 7 <> 3 GROUP BY 1""".stripMargin

  /** LAKE6 — SCHEMA EVOLUTION under write drift: two writer generations
    * land in the same lake — the old one without, the new one WITH a
    * `fw_version` column — and `mergeSchema` reconciles the read: old
    * rows surface the new column as null (bucketed to 'legacy' here),
    * and no backfill rewrite ever runs. This is the add-a-column half
    * of the physical-drift story whose timestamp-rendition half broke
    * round 8 (Tables.normalizeTs / SchemaDriftSpec); a production lake
    * sees both as writers upgrade. Scale note: mergeSchema reconciles
    * FOOTERS (one task per file schema), not data — the read stays one
    * scan; pin the merged schema in the table catalog once it
    * stabilizes to skip even that. The oracle restates the generation
    * split by formula, so a dropped generation, a misaligned column, or
    * a non-null legacy value all break the hash. */
  def lake6SchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "lake6_lake")
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    ev.filter(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(dir + "/gen=1")
    ev.filter(col("event_id") % 2 =!= 0)
      .withColumn("fw_version",
        concat(lit("v"), (col("user_id") % 3).cast("string")))
      .write.mode("overwrite").parquet(dir + "/gen=2")
    s.read.option("mergeSchema", "true").parquet(dir)
      .groupBy(coalesce(col("fw_version"), lit("legacy")).as("fw_version"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
  }

  val lake6Sql: String =
    """SELECT CASE WHEN event_id % 2 = 0 THEN 'legacy'
      |            ELSE 'v' || CAST(user_id % 3 AS VARCHAR) END AS fw_version,
      |  COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events GROUP BY 1""".stripMargin

  /** LAKE4 — Z-ORDER LAYOUT end to end ([[graft.sources.LakeMaintenance
    * .writeZOrdered]]): the events table rewritten along the Morton
    * curve of (user_id, ts), then read back through a TWO-dimension box
    * predicate (a user band AND a time band) and aggregated. Z-order is
    * the multi-column data-skipping lever — a user_id-sorted layout
    * leaves every file spanning the full time range, so ts predicates
    * skip nothing; the curve keeps each file a localized (user, time)
    * box and parquet min/max stats prune on EITHER dimension (the
    * OperatorsSpec test measures exactly that: bounding-box hit
    * fraction under a ts-only predicate, z-ordered vs user-sorted).
    * The oracle restates the box aggregate off the original table, so
    * the rewrite is also content-gated: a row lost or duplicated in the
    * re-layout breaks the hash. */
  def lake4ZOrder(s: SparkSession, d: String): DataFrame = {
    val dst = qtmp(s, "lake4_z")
    val ev = graft.Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
    graft.sources.LakeMaintenance.writeZOrdered(
      ev.drop("ts"), dst, col("user_id"), col("ts_us"), numFiles = 16)
    val mm = ev.agg(min("ts_us"), max("ts_us"), min("user_id"),
      max("user_id")).head()
    val (tLo, tHi, uLo, uHi) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    val (tA, tB) = (tLo + (tHi - tLo) / 4, tLo + (tHi - tLo) / 2)
    val (uA, uB) = (uLo + (uHi - uLo) / 4, uLo + (uHi - uLo) / 2)
    s.read.parquet(dst)
      .filter(col("user_id").between(uA, uB) &&
        col("ts_us").between(tA, tB))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
  }

  /** The same box bounds re-derived from the raw table: quartile
    * arithmetic on BIGINT min/max is exact on both engines. */
  val lake4Sql: String =
    """WITH mm AS (
      |  SELECT MIN(epoch_us(ts)) AS tlo, MAX(epoch_us(ts)) AS thi,
      |         MIN(user_id) AS ulo, MAX(user_id) AS uhi
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events, mm
      |WHERE user_id BETWEEN ulo + (uhi - ulo) // 4 AND ulo + (uhi - ulo) // 2
      |  AND epoch_us(ts) BETWEEN tlo + (thi - tlo) // 4
      |                       AND tlo + (thi - tlo) // 2
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------- P: spectral (oracled)

  /** P1+P3 (getFFT + |z|² magnitude quirk, `osdAlgTools.py:95-105` and
    * `:6-14`): the raw DFT bins themselves, hash-matched at the planted
    * tone bins. An integer-bin tone A·cos(2πfi/n) is orthogonal to
    * every other bin, so the UNWINDOWED spectrum (the P1 quirk: the
    * window is computed but never applied) has the exact closed form
    * |X_0| = offset·n, |X_f| = A·n/2 at the tone bin, and the P3 quirk
    * output |X_f|² = (A·n/2)². With n=125, offset=1000, A1=4(1+k%3),
    * A2=4(1+d%2): dc = 125000, |X_f1|·1000 = 250000·(1+k%3),
    * |X_f2|·1000 = 250000·(1+d%2), |X_f1|² = 62500·(1+k%3)² — all
    * integers; naive-summation error ≤ 124·ε·Σ|x| ≈ 4e-9 against a 0.5
    * rounding margin. If a window were ever (incorrectly) applied, the
    * tone's energy would leak across bins and every one of these pins
    * would shift — this entry is the direct regression gate on the
    * reference's unapplied-window quirk. */
  def p1FftBins(s: SparkSession, d: String): DataFrame = {
    val f1 = (lit(15) + (col("k") + col("d")) % 24).cast("int")
    val f2 = (lit(41) + (col("k") + col("d")) % 21).cast("int")
    OsdbFixture.toneDps(s, d)
      .withColumn("b", fftBinsUdf(col("rawData"), f1, f2))
      .select(col("e"), col("d"),
        round(col("b._1")).cast("long").as("dc_mag"),
        round(col("b._2") * 1000).cast("long").as("mag_f1_x1000"),
        round(col("b._3") * 1000).cast("long").as("mag_f2_x1000"),
        round(col("b._4")).cast("long").as("magsq_f1"))
  }

  val p1Sql: String = sqlBase +
    """SELECT e, d,
      |  CAST(125000 AS BIGINT) AS dc_mag,
      |  CAST(250000 * (1 + k % 3) AS BIGINT) AS mag_f1_x1000,
      |  CAST(250000 * (1 + d % 2) AS BIGINT) AS mag_f2_x1000,
      |  CAST(62500 * (1 + k % 3) * (1 + k % 3) AS BIGINT) AS magsq_f1
      |FROM dpx""".stripMargin

  /** P2 (window generators, `osdAlgTools.py:34-42` raisedCosine et al.):
    * coefficient sums of the real [[Signal.window]] kernels at the
    * device epoch length n=125, against their closed forms. With
    * denominator n-1 = 124, Σcos(2πi/124) over i=0..124 is one full
    * period (0) plus the repeated endpoint (1), so:
    * hann = 0.5·125 − 0.5·1 = 62; hamming = 0.54·125 − 0.46·1 = 67.04;
    * triangle = 125 − Σ|i−62.5|/62.5 = 125 − 3906.5/62.5 = 62.496;
    * rect = 125. Float error ~1e-13 against the 0.5/1000 margin. */
  def p2WindowSums(s: SparkSession, d: String): DataFrame =
    s.range(1).select(
      round(winSumUdf(lit("rect"), lit(125)) * 1000).cast("long").as("rect_x1000"),
      round(winSumUdf(lit("hann"), lit(125)) * 1000).cast("long").as("hann_x1000"),
      round(winSumUdf(lit("hamming"), lit(125)) * 1000).cast("long").as("hamming_x1000"),
      round(winSumUdf(lit("triangle"), lit(125)) * 1000).cast("long").as("triangle_x1000"))

  val p2Sql: String =
    """SELECT CAST(125000 AS BIGINT) AS rect_x1000,
      |  CAST(62000 AS BIGINT) AS hann_x1000,
      |  CAST(67040 AS BIGINT) AS hamming_x1000,
      |  CAST(62496 AS BIGINT) AS triangle_x1000""".stripMargin

  /** P4/P5 (getSpecPower / getRoiPower over planted pure-tone
    * datapoints): the real [[Signal.specPower]]/[[Signal.roiPower]] DFT
    * path, hash-matched against the closed-form integer band powers of
    * the [[OsdbFixture.toneDps]] tones (see the derivation there —
    * integer-bin tones make both powers exact integers; round() bridges
    * the ~1e-9 DFT float error). */
  def p4BandPower(s: SparkSession, d: String): DataFrame =
    OsdbFixture.toneDps(s, d)
      .select(col("e"), col("d"),
        round(specPowerUdf(col("rawData"))).cast("long").as("spec_power"),
        round(roiPowerUdf(col("rawData"))).cast("long").as("roi_power"))

  val p4Sql: String = sqlBase +
    """SELECT e, d,
      |  CAST((a1*a1 + a2*a2) * 125 // 8 AS BIGINT) AS spec_power,
      |  CAST(a1*a1 * 15625 // 100 AS BIGINT) AS roi_power
      |FROM (SELECT e, d, 4*(1 + k % 3) AS a1, 4*(1 + d % 2) AS a2 FROM dpx)""".stripMargin

  /** P6 (getSpectrumRatio over the tone fixture): the real
    * [[Signal.spectrumRatio]] — 10*roi/spec gated on specPower >
    * alarmThresh(900), else 0 — has an exact closed form on the tones:
    * spec = (A1²+A2²)·125/8 and roi = A1²·156.25, so the gated ratio is
    * 100·A1²/(A1²+A2²). Fixture spec powers are {500,1250,2000,2500,3250}
    * — none near the 900 gate, so the ~1e-9 DFT float error cannot flip
    * it. The ×1000 round() bridge keeps the one non-integer ratio
    * (A1=12,A2=8 → 69230.769…) > 0.2 away from the rounding boundary —
    * >1e5 sigma against the DFT error. */
  def p6SpectrumRatio(s: SparkSession, d: String): DataFrame =
    OsdbFixture.toneDps(s, d)
      .select(col("e"), col("d"),
        round(spectrumRatioUdf(col("rawData")) * 1000).cast("long").as("ratio_x1000"))

  val p6Sql: String = sqlBase +
    """SELECT e, d,
      |  CAST(ROUND(CASE WHEN (a1*a1 + a2*a2) * 125.0 / 8 > 900
      |       THEN 100000.0 * a1*a1 / (a1*a1 + a2*a2) ELSE 0 END) AS BIGINT)
      |    AS ratio_x1000
      |FROM (SELECT e, d, 4*(1 + k % 3) AS a1, 4*(1 + d % 2) AS a2 FROM dpx)""".stripMargin

  /** P7 (getAlarmState over the tone fixture): the real
    * [[Signal.alarmState]] — 1 iff spectrumRatio > alarmRatioThresh(57).
    * Fixture gated ratios are {0, 20, 50, 69.23, 80, 90}: the nearest to
    * the 57 threshold is 9 away, so the DFT error cannot flip a state.
    * Completes the oracled device-algorithm chain P4 → P5 → P6 → P7. */
  def p7AlarmState(s: SparkSession, d: String): DataFrame =
    OsdbFixture.toneDps(s, d)
      .select(col("e"), col("d"),
        alarmStateUdf(col("rawData")).cast("long").as("alarm_state"))

  val p7Sql: String = sqlBase +
    """SELECT e, d,
      |  CAST(CASE WHEN (a1*a1 + a2*a2) * 125.0 / 8 > 900
      |            AND 100.0 * a1*a1 / (a1*a1 + a2*a2) > 57 THEN 1 ELSE 0 END
      |       AS BIGINT) AS alarm_state
      |FROM (SELECT e, d, 4*(1 + k % 3) AS a1, 4*(1 + d % 2) AS a2 FROM dpx)""".stripMargin

  /** P8 (Butterworth high-pass filtfilt, `accelFeatures.py:22-40` /
    * `extractFeatures.py:214-261`): the real [[graft.functions.Filters]]
    * zero-phase filter over an n=1000 tone fixture, hash-matched against
    * the textbook closed form. A zero-phase order-2 high-pass passes
    * tone A·cos(wi) as A·|H(w)|²·cos(wi); the oracle states |H(w)|² from
    * the bilinear-transform biquad coefficients (the same formula the
    * Scala `butterHighPass` derives) and numerically sums the closed
    * form's RMS over the centre window [250, 750), where the filtfilt
    * startup transient has decayed to < 1e-9 of the signal. n=1000 bins
    * put f1 at 0.375-0.95 Hz — straddling the 0.5 Hz corner, so the
    * pinned gains sweep the filter's transition band rather than its
    * flat tails. [[graft.tools.ToneGainProbe]] pins the numerics: max
    * |kernel - closedForm| = 9.0e-8 x1000-units against a worst-case
    * rounding-boundary margin of 1.1e-4 — three orders of safety. */
  def p8FiltfiltRms(s: SparkSession, d: String): DataFrame =
    OsdbFixture.toneDps(s, d, n = 1000)
      .select(col("e"), col("d"),
        round(hpRmsUdf(col("rawData")) * 1000).cast("long").as("hp_rms_x1000"))

  val p8Sql: String = sqlBase.stripSuffix("\n") +
    """,
      |hpc AS (
      |  SELECT nrm AS b0, -2.0*nrm AS b1, nrm AS b2,
      |         2.0*(wc*wc - 1.0)*nrm AS fa1,
      |         (1.0 - kk*wc + wc*wc)*nrm AS fa2
      |  FROM (SELECT wc, kk, 1.0/(1.0 + kk*wc + wc*wc) AS nrm
      |        FROM (SELECT tan(pi()*0.5/25.0) AS wc, sqrt(2.0) AS kk))),
      |tone AS (
      |  SELECT e, d, 4*(1 + k % 3) AS a1, 4*(1 + d % 2) AS a2,
      |         2*pi()*(15 + (k+d) % 24)/1000.0 AS w1,
      |         2*pi()*(41 + (k+d) % 21)/1000.0 AS w2
      |  FROM dpx),
      |gains AS (
      |  SELECT e, d, a1, a2, w1, w2,
      |    ((b0 + b1*cos(w1) + b2*cos(2*w1))*(b0 + b1*cos(w1) + b2*cos(2*w1))
      |     + (b1*sin(w1) + b2*sin(2*w1))*(b1*sin(w1) + b2*sin(2*w1)))
      |    / ((1.0 + fa1*cos(w1) + fa2*cos(2*w1))*(1.0 + fa1*cos(w1) + fa2*cos(2*w1))
      |     + (fa1*sin(w1) + fa2*sin(2*w1))*(fa1*sin(w1) + fa2*sin(2*w1))) AS g1,
      |    ((b0 + b1*cos(w2) + b2*cos(2*w2))*(b0 + b1*cos(w2) + b2*cos(2*w2))
      |     + (b1*sin(w2) + b2*sin(2*w2))*(b1*sin(w2) + b2*sin(2*w2)))
      |    / ((1.0 + fa1*cos(w2) + fa2*cos(2*w2))*(1.0 + fa1*cos(w2) + fa2*cos(2*w2))
      |     + (fa1*sin(w2) + fa2*sin(2*w2))*(fa1*sin(w2) + fa2*sin(2*w2))) AS g2
      |  FROM tone, hpc),
      |ys AS (
      |  SELECT e, d, a1*g1*cos(w1*i) + a2*g2*cos(w2*i) AS y
      |  FROM (SELECT *, unnest(range(250, 750)) AS i FROM gains))
      |SELECT e, d,
      |  CAST(ROUND(sqrt(SUM(y*y)/500.0)*1000.0) AS BIGINT) AS hp_rms_x1000
      |FROM ys GROUP BY e, d""".stripMargin

  /** P10 (band total power + peak PSD over [3, 8] Hz,
    * `accelFeatures.py:84-96`): the real [[Signal.bandPower]] DFT path
    * over the n=125 tone fixture. Only the f1 tone (3.0-7.6 Hz) lands in
    * the band, so total = peak = A1²/2 exactly — an integer after the
    * ×1000 bridge (A1 ∈ {4,8,12} → 8000/32000/72000), a 0.5-unit margin
    * against the DFT's ~1e-9 float error (ToneGainProbe). */
  def p10BandPeak(s: SparkSession, d: String): DataFrame =
    OsdbFixture.toneDps(s, d)
      .select(col("e"), col("d"), bandPowerUdf(col("rawData")).as("bp"))
      .select(col("e"), col("d"),
        round(col("bp").getItem(0) * 1000).cast("long").as("band_total_x1000"),
        round(col("bp").getItem(1) * 1000).cast("long").as("band_peak_x1000"))

  val p10Sql: String = sqlBase +
    """SELECT e, d,
      |  CAST(a1*a1*500 AS BIGINT) AS band_total_x1000,
      |  CAST(a1*a1*500 AS BIGINT) AS band_peak_x1000
      |FROM (SELECT e, d, 4*(1 + k % 3) AS a1 FROM dpx)""".stripMargin

  /** P11 (spectral centroid + Shannon entropy, `accelFeatures.py:97-104`):
    * the real [[Signal.spectralCentroid]]/[[Signal.spectralEntropy]] DFT
    * path over the n=125 tone fixture, whose one-sided PSD has exactly
    * three live bins — DC (1000² = 1e6) and the two tones (A²/2) — so
    * both statistics have closed forms:
    *   centroid = 0.2·(f1·p1 + f2·p2) / (p0 + p1 + p2)
    *   entropy  = −Σ (p/t)·ln(p/t) over the three bins
    * ToneGainProbe pins the ×1e7 bridge: kernel-vs-closed-form error
    * ~1e-10 units against boundary margins of 4.4e-4 (centroid) and
    * 8.9e-2 (entropy) — ≥6 orders of safety. */
  def p11SpectralShape(s: SparkSession, d: String): DataFrame =
    OsdbFixture.toneDps(s, d)
      .select(col("e"), col("d"),
        round(centroidUdf(col("rawData")) * 1e7).cast("long").as("centroid_x1e7"),
        round(entropyUdf(col("rawData")) * 1e7).cast("long").as("entropy_x1e7"))

  val p11Sql: String = sqlBase +
    """SELECT e, d,
      |  CAST(ROUND(1e7 * (0.2*(f1*p1 + f2*p2)/(p0 + p1 + p2))) AS BIGINT)
      |    AS centroid_x1e7,
      |  CAST(ROUND(1e7 * -((p0/t)*ln(p0/t) + (p1/t)*ln(p1/t) + (p2/t)*ln(p2/t)))
      |       AS BIGINT) AS entropy_x1e7
      |FROM (SELECT *, p0 + p1 + p2 AS t FROM
      |  (SELECT e, d, 15 + (k+d) % 24 AS f1, 41 + (k+d) % 21 AS f2,
      |          1000000.0 AS p0,
      |          (4*(1 + k % 3))*(4*(1 + k % 3))/2.0 AS p1,
      |          (4*(1 + d % 2))*(4*(1 + d % 2))/2.0 AS p2
      |   FROM dpx))""".stripMargin

  /** P12 (epoch feature vector through the real [[FeatureExtract]] over
    * 3D fixture events, window=step=125 so epoch j == datapoint j):
    * the full 144-feature vector is computed; the oracled projection is
    * the bit-exact subset — per-axis mean (one division), rms (exact
    * integer sum of squares, one division, one sqrt — both correctly
    * rounded IEEE ops) and the telescoping-sign zcr quirk — plus the
    * feature count. The Welch-PSD features (symmetric Hann window, no
    * closed form for integer-bin tones) stay golden-tested in
    * SignalSpec; this pins the epoch slicing, axis de-interleave and
    * feature plumbing end to end.
    *
    * Bench note: ~0.8-1.0 s at sf0.1 — round 5 replaced the former
    * rows-only projection (0.25 s) with REAL 144-feature extraction
    * (4 DFTs + stats per epoch), so the step up vs BENCH_r04 is the
    * upgrade, not a regression. */
  def p12EpochFeatures(s: SparkSession, d: String): DataFrame =
    FeatureExtract.extract(
        OsdbFixture.flatDps(s, d, col("e") % 80 === 0),
        FeatureExtract.Config(window = 125, step = 125, highPassHz = 0.0))
      .toDF()
      .select(
        col("eventId").as("event_id"),
        col("startSample").cast("long").as("start_s"),
        size(map_keys(col("features"))).cast("long").as("n_features"),
        col("features")("mean_x").as("mean_x"),
        col("features")("mean_y").as("mean_y"),
        col("features")("mean_z").as("mean_z"),
        col("features")("activity_count_x").as("rms_x"),
        col("features")("activity_count_y").as("rms_y"),
        col("features")("activity_count_z").as("rms_z"),
        col("features")("zcr_x").as("zcr_x"),
        col("features")("zcr_y").as("zcr_y"),
        col("features")("zcr_z").as("zcr_z"))

  val p12Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS event_id, CAST(d*125 AS BIGINT) AS start_s,
      |  CAST(144 AS BIGINT) AS n_features,
      |  CAST(SUM(vx) AS DOUBLE)/125.0 AS mean_x,
      |  CAST(SUM(vy) AS DOUBLE)/125.0 AS mean_y,
      |  CAST(SUM(vz) AS DOUBLE)/125.0 AS mean_z,
      |  sqrt(CAST(SUM(vx*vx) AS DOUBLE)/125.0) AS rms_x,
      |  sqrt(CAST(SUM(vy*vy) AS DOUBLE)/125.0) AS rms_y,
      |  sqrt(CAST(SUM(vz*vz) AS DOUBLE)/125.0) AS rms_z,
      |  (MAX(CASE WHEN i = 124 THEN CAST(SIGN(vx) AS DOUBLE) END)
      |   - MAX(CASE WHEN i = 0 THEN CAST(SIGN(vx) AS DOUBLE) END))/250.0 AS zcr_x,
      |  (MAX(CASE WHEN i = 124 THEN CAST(SIGN(vy) AS DOUBLE) END)
      |   - MAX(CASE WHEN i = 0 THEN CAST(SIGN(vy) AS DOUBLE) END))/250.0 AS zcr_y,
      |  (MAX(CASE WHEN i = 124 THEN CAST(SIGN(vz) AS DOUBLE) END)
      |   - MAX(CASE WHEN i = 0 THEN CAST(SIGN(vz) AS DOUBLE) END))/250.0 AS zcr_z
      |FROM samp3 WHERE e % 80 = 0 GROUP BY e, d""".stripMargin

  /** S12 (curated seizure-times side input, `tidy_db.py` seizureTimes
    * merge): the real [[Tidy.joinSeizureTimes]] — a broadcast left join
    * of the tiny curated (eventId → [startSec, endSec]) table onto
    * events, the side-input shape (a dim table measured in KB against a
    * fact table measured in TB; broadcast is the only sane physical
    * plan and the operator hints it explicitly). The k%4==0 slice gets
    * times derived from the fixture formulas; unmatched events keep
    * NULL seizureTimes — the left-join contract the oracle restates
    * with a CASE. */
  def s12SeizureTimes(s: SparkSession, d: String): DataFrame = {
    val ev = OsdbFixture.ev(s, d)
    val events = ev.select(col("e").cast("string").as("id"), col("type_str"))
    val times = ev.filter(col("k") % 4 === 0).select(
      col("e").as("eventId"),
      (col("wts") + 10).cast("double").as("startSec"),
      (col("wts") + 70).cast("double").as("endSec"))
    Tidy.joinSeizureTimes(events, times)
      .select(col("id"), col("type_str"),
        element_at(col("seizureTimes"), 1).as("st_start"),
        element_at(col("seizureTimes"), 2).as("st_end"))
  }

  val s12Sql: String = sqlBase +
    """SELECT CAST(e AS VARCHAR) AS id, type_str,
      |  CASE WHEN k % 4 = 0 THEN CAST(wts + 10 AS DOUBLE) END AS st_start,
      |  CASE WHEN k % 4 = 0 THEN CAST(wts + 70 AS DOUBLE) END AS st_end
      |FROM ev""".stripMargin

  /** P9 (Welch PSD, `accelFeatures.py` "welch with nperseg=None"
    * collapse): the real [[graft.functions.EpochFeatures.welchPsd]]
    * kernel — mean-detrend, symmetric Hann window, one-sided density
    * scaling — over every tone-fixture datapoint, reduced to a pinned
    * single row: per-dp the four PSD-shape statistics (total power,
    * peak bin, mean frequency, entropy) are rounded to integers at a
    * fixed scale, then summed (a sum of exact integers is
    * order-independent, so the parallel aggregation cannot move it).
    * The symmetric Hann window spreads an integer-bin tone across all
    * bins, so unlike p4/p10/p11 there is no rational closed form — the
    * pins are constants measured once on the driver testdata (the
    * e5/d5 pattern): any change to the detrend, window, scaling, or
    * band edges moves these integers and breaks the hash. Re-derive
    * with `runMain graft.tools.PinProbe p9_welch_psd <sfDir>` after a
    * fixture regeneration. */
  def p9WelchPsd(s: SparkSession, d: String): DataFrame =
    OsdbFixture.toneDps(s, d)
      .select(welchStatsUdf(col("rawData")).as("w"))
      .agg(count(lit(1)).as("n_dp"),
        sum(col("w").getItem(0)).as("tot_x1e3"),
        sum(col("w").getItem(1)).as("peak_x1e3"),
        sum(col("w").getItem(2)).as("meanfreq_x1e6"),
        sum(col("w").getItem(3)).as("entropy_x1e6"))

  /** Constants measured once PER SF on the driver testdata (see
    * [[p9WelchPsd]]), dispatched on the events-table row count (the
    * TextQueries d5Sql pattern — an unknown sf selects zero rows and
    * fails loudly); a failure here with no code change means the
    * fixture moved — re-pin via `graft.tools.PinProbe`. */
  val p9Sql: String =
    """SELECT n_dp, tot_x1e3, peak_x1e3, meanfreq_x1e6, entropy_x1e6
      |FROM (VALUES
      |  (1000,   CAST(300 AS BIGINT),   CAST(83878620 AS BIGINT),
      |   CAST(40159852 AS BIGINT),   CAST(2143639104 AS BIGINT),
      |   CAST(618295168 AS BIGINT)),
      |  (10000,  CAST(3000 AS BIGINT),  CAST(847066302 AS BIGINT),
      |   CAST(406832379 AS BIGINT),  CAST(21676584369 AS BIGINT),
      |   CAST(6175213816 AS BIGINT)),
      |  (100000, CAST(30000 AS BIGINT), CAST(8478940457 AS BIGINT),
      |   CAST(4073563494 AS BIGINT), CAST(216636040545 AS BIGINT),
      |   CAST(61744305269 AS BIGINT)))
      |  t(sf_n, n_dp, tot_x1e3, peak_x1e3, meanfreq_x1e6, entropy_x1e6)
      |WHERE sf_n = (SELECT COUNT(*) FROM events)""".stripMargin

  /** P13 (HR/O2 interpolation onto the sample timebase,
    * `nnTraining2/extractFeatures.py` hrInterp shape): the real
    * [[Signal.interpOnto]] — per event, the dp-level hr series at
    * xs = d·125 linearly interpolated onto the n_dp·125-sample 25 Hz
    * grid — hash-matched against an EXACT closed form: summing a
    * piecewise-linear interpolant over an integer grid telescopes,
    *   Σ_{t∈[x_d, x_{d+1})} interp(t) = 125·y_d + 62·(y_{d+1}−y_d)
    * (Σ_{t=0}^{124} t = 7750 = 62·125 divides exactly), and the flat
    * tail past the last knot contributes 125·y_last — all integers for
    * the fixture's integer hr values, so the oracle restates the sum
    * per event with one lead() window. round() bridges the ~1e-10
    * float-summation error against an exact-integer true value; the
    * endpoint samples out(0)/out(last) pin the flat-extension
    * contract. */
  def p13Interp(s: SparkSession, d: String): DataFrame =
    OsdbFixture.dps(s, d, arrays = false)
      .groupBy("e")
      .agg(sort_array(collect_list(struct(col("d"), col("hr")))).as("pts"))
      .select(col("e"),
        interpSumUdf(col("pts.d"), col("pts.hr")).as("r"))
      .select(col("e"),
        col("r").getItem(0).as("n_samples"),
        col("r").getItem(1).as("interp_sum"),
        col("r").getItem(2).as("y_first"),
        col("r").getItem(3).as("y_last"))

  val p13Sql: String = sqlBase +
    """SELECT e, CAST(MIN(n_dp)*125 AS BIGINT) AS n_samples,
      |  CAST(SUM(CASE WHEN y1 IS NULL THEN 125*y0
      |                ELSE 125*y0 + 62*(y1 - y0) END) AS BIGINT) AS interp_sum,
      |  CAST(MIN(CASE WHEN d = 0 THEN y0 END) AS BIGINT) AS y_first,
      |  CAST(MIN(CASE WHEN y1 IS NULL THEN y0 END) AS BIGINT) AS y_last
      |FROM (SELECT e, d, n_dp, hr AS y0,
      |        lead(hr) OVER (PARTITION BY e ORDER BY d) AS y1 FROM dpx)
      |GROUP BY e""".stripMargin

  // ---------------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_group_collect"  -> (a1GroupCollect _),
    "o1_sort_within"    -> (o1SortWithin _),
    "j2_explode_parent" -> (j2ExplodeParent _),
    "a3_has_flags"      -> (a3HasFlags _),
    "a4_event_metrics"  -> (a4EventMetrics _),
    "f7_source_filter"  -> (f7SourceFilter _),
    "f9_accel_presence" -> (f9AccelPresence _),
    "f10_low_motion"    -> (f10LowMotion _),
    "c1_parse_secs"     -> (c1ParseSecs _),
    "c3_tz_normalize"   -> (c3TzNormalize _),
    "c5_magnitude_rank" -> (c5MagnitudeRank _),
    "c5n_native_mag"    -> (c5nNativeMag _),
    "c7_deinterleave"   -> (c7Deinterleave _),
    "c8_truncate"       -> (c8Truncate _),
    "c12_line_length"   -> (c12LineLength _),
    "c13_zero_cross"    -> (c13ZeroCross _),
    "c14_moments"       -> (c14Moments _),
    "c15_znorm_argmax"  -> (c15ZnormArgmax _),
    "c16_minmax"        -> (c16MinMax _),
    "c18_gap_fill"      -> (c18GapFill _),
    "w4_merge_dedup"    -> (w4MergeDedup _),
    "w5_epochs"         -> (w5Epochs _),
    "w6_spectrogram"    -> (w6Spectrogram _),
    "w8_nn_buffer"      -> (w8NnBuffer _),
    "w10_replay_fsm"    -> (w10ReplayFsm _),
    "a6b_detection_pivot" -> (a6bDetectionPivot _),
    "m4_noise_aug"      -> (m4NoiseAug _),
    "m5_phase_aug"      -> (m5PhaseAug _),
    "m6_user_aug"       -> (m6UserAug _),
    "m7_tc_aug"         -> (m7TcAug _),
    "s13_simulated"     -> (s13Simulated _),
    "s3_flatcsv_roundtrip" -> (s3FlatCsvRoundtrip _),
    "s6_upsert"         -> (s6Upsert _),
    "s7_mongo_roundtrip" -> (s7MongoRoundtrip _),
    "s8_json_roundtrip" -> (s8JsonRoundtrip _),
    "s9_index_csv"      -> (s9IndexCsv _),
    "u3_multifile_union" -> (u3MultifileUnion _),
    "s1_multiline_array" -> (s1MultilineArray _),
    "s4_webapi"         -> (s4WebApi _),
    "s5_device"         -> (s5Device _),
    "s14_corrupt_quarantine" -> (s14CorruptQuarantine _),
    "lake1_pruned_scan" -> (lake1PrunedScan _),
    "lake2_bucketed_join" -> (lake2BucketedJoin _),
    "lake3_compaction"  -> (lake3Compaction _),
    "lake7_orc"         -> (lake7Orc _),
    "lake8_time_travel" -> (lake8TimeTravel _),
    "lake9_vacuum"      -> (lake9Vacuum _),
    "s4b_paged_listing" -> (s4bPagedListing _),
    "rpt1_summary_index" -> (rpt1SummaryIndex _),
    "rpt2_user_summary" -> (rpt2UserSummary _),
    "ml1_auroc"         -> (ml1Auroc _),
    "ml2_run_sequence"  -> (ml2RunSequence _),
    "cfg1_config_bridge" -> (cfg1ConfigBridge _),
    "ml3_cnn_forward"   -> (ml3CnnForward _),
    "ml4_lstm_forward"  -> (ml4LstmForward _),
    "ml4b_lstm_stack"   -> (ml4bLstmStackForward _),
    "ml4c_lstm_attn"    -> (ml4cLstmAttnForward _),
    "ml4d_lstm_bidir"   -> (ml4dLstmBidirForward _),
    "ml4e_lstm_fusion"  -> (ml4eLstmFusionForward _),
    "ml4f_conv_pipe"    -> (ml4fConvPipeForward _),
    "ml4g_conv3d_pipe"  -> (ml4gConv3dPipeForward _),
    "ml4h_multiclass"   -> (ml4hMulticlassForward _),
    "ml4i_tower_fusion" -> (ml4iTowerFusion _),
    "a6c_multiclass_confusion" -> (a6cMulticlassConfusion _),
    "ml5_ensemble"      -> (ml5Ensemble _),
    "ml6_nested_kfold"  -> (ml6NestedKfold _),
    "ml7_pipeline_audit" -> (ml7Audit _),
    "ml8_rf"            -> (ml8RfForward _),
    "ml9_param_sweep"   -> (ml9ParamSweep _),
    "ml10_spec_cnn"     -> (ml10SpecCnn _),
    "rpt5_results_analysis" -> (rpt5ResultsAnalysis _),
    "rpt6_analyze_data" -> (rpt6AnalyzeData _),
    "rpt7_model_compare" -> (rpt7ModelCompare _),
    "cur1_alarm_check"  -> (cur1AlarmCheck _),
    "cur2_merge_priority" -> (cur2MergePriority _),
    "fa1_false_alarm_periods" -> (fa1FalseAlarmPeriods _),
    "dash1_new_events"  -> (dash1NewEvents _),
    "rpt3_index_shards" -> (rpt3IndexShards _),
    "viz1_dataviz_series" -> (viz1DatavizSeries _),
    "lake10_versioned_delete" -> (lake10VersionedDelete _),
    "lake4_zorder"      -> (lake4ZOrder _),
    "lake5_delete"      -> (lake5Delete _),
    "lake6_schema_evolution" -> (lake6SchemaEvolution _),
    "s12_seizure_times" -> (s12SeizureTimes _),
    "p1_fft_bins"       -> (p1FftBins _),
    "p2_window_sums"    -> (p2WindowSums _),
    "p4_band_power"     -> (p4BandPower _),
    "p6_spectrum_ratio" -> (p6SpectrumRatio _),
    "p7_alarm_state"    -> (p7AlarmState _),
    "p8_filtfilt_rms"   -> (p8FiltfiltRms _),
    "p10_band_peak"     -> (p10BandPeak _),
    "p11_spectral_shape" -> (p11SpectralShape _),
    "p12_epoch_features" -> (p12EpochFeatures _),
    "p9_welch_psd"      -> (p9WelchPsd _),
    "p13_interp"        -> (p13Interp _)
  )

  val oracles: Map[String, String] = Map(
    "a1_group_collect"  -> a1Sql,
    "o1_sort_within"    -> o1Sql,
    "j2_explode_parent" -> j2Sql,
    "a3_has_flags"      -> a3Sql,
    "a4_event_metrics"  -> a4Sql,
    "f7_source_filter"  -> f7Sql,
    "f9_accel_presence" -> f9Sql,
    "f10_low_motion"    -> f10Sql,
    "c1_parse_secs"     -> c1Sql,
    "c3_tz_normalize"   -> c3Sql,
    "c5_magnitude_rank" -> c5Sql,
    "c5n_native_mag"    -> c5nSql,
    "c7_deinterleave"   -> c7Sql,
    "c8_truncate"       -> c8Sql,
    "c12_line_length"   -> c12Sql,
    "c13_zero_cross"    -> c13Sql,
    "c14_moments"       -> c14Sql,
    "c15_znorm_argmax"  -> c15Sql,
    "c16_minmax"        -> c16Sql,
    "c18_gap_fill"      -> c18Sql,
    "w4_merge_dedup"    -> w4Sql,
    "w5_epochs"         -> w5Sql,
    "w6_spectrogram"    -> w6Sql,
    "w8_nn_buffer"      -> w8Sql,
    "w10_replay_fsm"    -> w10Sql,
    "a6b_detection_pivot" -> a6bSql,
    "m4_noise_aug"      -> m4Sql,
    "m5_phase_aug"      -> m5Sql,
    "m6_user_aug"       -> m6Sql,
    "m7_tc_aug"         -> m7Sql,
    "s13_simulated"     -> s13Sql,
    "s3_flatcsv_roundtrip" -> s3Sql,
    "s6_upsert"         -> s6Sql,
    "s7_mongo_roundtrip" -> s7Sql,
    "s8_json_roundtrip" -> s8Sql,
    "s9_index_csv"      -> s9Sql,
    "u3_multifile_union" -> u3Sql,
    "s1_multiline_array" -> s1Sql,
    "s4_webapi"         -> s4Sql,
    "s5_device"         -> s5Sql,
    "s14_corrupt_quarantine" -> s14Sql,
    "lake1_pruned_scan" -> lake1Sql,
    "lake2_bucketed_join" -> lake2Sql,
    "lake3_compaction"  -> lake3Sql,
    "lake7_orc"         -> lake7Sql,
    "lake8_time_travel" -> lake8Sql,
    "lake9_vacuum"      -> lake9Sql,
    "s4b_paged_listing" -> s4bSql,
    "rpt1_summary_index" -> rpt1Sql,
    "rpt2_user_summary" -> rpt2Sql,
    "ml1_auroc"         -> ml1Sql,
    "ml2_run_sequence"  -> ml2Sql,
    "cfg1_config_bridge" -> cfg1Sql,
    "ml3_cnn_forward"   -> ml3Sql,
    "ml4_lstm_forward"  -> ml4Sql,
    "ml4b_lstm_stack"   -> ml4bSql,
    "ml4c_lstm_attn"    -> ml4cSql,
    "ml4d_lstm_bidir"   -> ml4dSql,
    "ml4e_lstm_fusion"  -> ml4eSql,
    "ml4f_conv_pipe"    -> ml4fSql,
    "ml4g_conv3d_pipe"  -> ml4gSql,
    "ml4h_multiclass"   -> ml4hSql,
    "ml4i_tower_fusion" -> ml4iSql,
    "a6c_multiclass_confusion" -> a6cSql,
    "ml5_ensemble"      -> ml5Sql,
    "ml6_nested_kfold"  -> ml6Sql,
    "ml7_pipeline_audit" -> ml7Sql,
    "ml8_rf"            -> ml8Sql,
    "ml9_param_sweep"   -> ml9Sql,
    "ml10_spec_cnn"     -> ml10Sql,
    "rpt5_results_analysis" -> rpt5Sql,
    "rpt6_analyze_data" -> rpt6Sql,
    "rpt7_model_compare" -> rpt7Sql,
    "cur1_alarm_check"  -> cur1Sql,
    "cur2_merge_priority" -> cur2Sql,
    "fa1_false_alarm_periods" -> fa1Sql,
    "dash1_new_events"  -> dash1Sql,
    "rpt3_index_shards" -> rpt3Sql,
    "viz1_dataviz_series" -> viz1Sql,
    "lake10_versioned_delete" -> lake10Sql,
    "lake4_zorder"      -> lake4Sql,
    "lake5_delete"      -> lake5Sql,
    "lake6_schema_evolution" -> lake6Sql,
    "s12_seizure_times" -> s12Sql,
    "p1_fft_bins"       -> p1Sql,
    "p2_window_sums"    -> p2Sql,
    "p4_band_power"     -> p4Sql,
    "p6_spectrum_ratio" -> p6Sql,
    "p7_alarm_state"    -> p7Sql,
    "p8_filtfilt_rms"   -> p8Sql,
    "p10_band_peak"     -> p10Sql,
    "p11_spectral_shape" -> p11Sql,
    "p12_epoch_features" -> p12Sql,
    "p9_welch_psd"      -> p9Sql,
    "p13_interp"        -> p13Sql
  )
}
