package graft.report

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Flatten.FlatDp
import graft.operators.Spectrogram

/** The reference's presentation layer — HTML event summaries and the
  * category index (`user_tools/dataSummariser/summariseData.py:105-203`,
  * per-event pages :227-300; plot emission
  * `dataSummariser/eventAnalyser.py:280-560`) — re-expressed for an
  * engine: the reference renders matplotlib PNGs and Jinja templates
  * one event at a time in the driver process; here
  *
  *   - the INDEX summary (category classification + per-event stats) is
  *     a distributed aggregate like any other query — oracled as
  *     rpt1_summary_index;
  *   - the PER-EVENT pages render ON THE EXECUTORS: each task computes
  *     its events' series + spectral history (the real
  *     [[Spectrogram.spectralHistory]] kernel, W6/P15) and writes
  *     self-contained HTML with inline SVG charts — no image library,
  *     no driver bottleneck. A 1M-event report streams out of the
  *     tasks; the driver only renders the (bounded, by construction)
  *     index page.
  *
  * SVG replaces matplotlib deliberately: the charts are pure string
  * assembly over the already-computed numbers, so the report stage adds
  * ZERO dependencies and stays testable byte-for-byte. Executors open
  * the output filesystem with a default Hadoop Configuration — correct
  * for file:// and default-configured HDFS; an object-store deployment
  * would broadcast the session's hadoopConfiguration entries. */
object Summarise {

  // ------------------------------------------------------------ index side

  /** Category classification exactly as the reference buckets its index
    * (summariseData.py:168-180): Tonic-Clonic seizures land in BOTH
    * `tcSeizures` and `allSeizures`; the rest partition by type. Input
    * is the nested-event shape (id, userId, type, subType,
    * dataSourceName, n_dp); output adds one row per (event, category).
    */
  def indexSummary(nested: DataFrame): DataFrame =
    nested.select(col("id"), col("userId"), col("type"), col("subType"),
        col("dataSourceName"), col("n_dp"))
      .withColumn("category", explode(
        when(col("type") === "Seizure" && col("subType") === "tonicClonic",
          array(lit("tcSeizures"), lit("allSeizures")))
          .when(col("type") === "Seizure", array(lit("allSeizures")))
          .when(col("type") === "False Alarm", array(lit("falseAlarms")))
          .otherwise(array(lit("otherEvents")))))

  /** Per-user rollup (userSummary.template's data table): event counts
    * by category per user — the same distributed aggregate class as
    * [[indexSummary]]. */
  def userSummary(nested: DataFrame): DataFrame =
    indexSummary(nested)
      .groupBy("userId", "category")
      .agg(count(lit(1)).as("n"), sum(col("n_dp")).as("dp_sum"))

  // ------------------------------------------------------------- SVG layer

  private def esc(s: String): String =
    if (s == null) "-"
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      // quotes too: escaped values land in attribute contexts (href)
      .replace("\"", "&quot;")

  /** Polyline chart of a series (missing values < 0 are skipped — the
    * reference's -1 sentinel convention). Pure string assembly. */
  def svgPolyline(series: Seq[Double], w: Int, h: Int,
                  stroke: String = "#1f77b4", title: String = ""): String = {
    val present = series.filter(_ >= 0)
    val (lo, hi) =
      if (present.isEmpty) (0.0, 1.0)
      else (present.min, math.max(present.max, present.min + 1e-9))
    val pts = series.zipWithIndex.collect {
      case (v, i) if v >= 0 =>
        val x = if (series.size <= 1) 0.0 else i.toDouble * w / (series.size - 1)
        val y = h - (v - lo) / (hi - lo) * h
        f"$x%.1f,$y%.1f"
    }
    s"""<svg viewBox="0 0 $w $h" width="$w" height="$h" role="img">""" +
      s"""<title>${esc(title)}</title>""" +
      s"""<rect width="$w" height="$h" fill="#fafafa"/>""" +
      s"""<polyline fill="none" stroke="$stroke" stroke-width="1.5" points="${pts.mkString(" ")}"/>""" +
      "</svg>"
  }

  /** Multi-series polyline chart with a text legend — the SVG analog
    * of plotAnalysisGraph's stacked series (eventAnalyser.py:513-552).
    * All series share one y-scale (the reference overlays them too);
    * missing values < 0 are skipped per series. */
  def svgMultiline(series: Seq[(String, String, Seq[Double])],
                   w: Int, h: Int, title: String = ""): String = {
    val present = series.flatMap(_._3).filter(_ >= 0)
    // fixed zero baseline: the analysis series are non-negative powers/
    // ratios/states, and a shared zero anchor is what makes the
    // overlaid series comparable (unlike svgPolyline's per-series span)
    val lo = 0.0
    val hi = if (present.isEmpty) 1.0 else math.max(present.max, 1e-9)
    val lines = series.map { case (_, color, vals) =>
      val pts = vals.zipWithIndex.collect {
        case (v, i) if v >= 0 =>
          val x = if (vals.size <= 1) 0.0 else i.toDouble * w / (vals.size - 1)
          val y = h - (v - lo) / (hi - lo) * h
          f"$x%.1f,$y%.1f"
      }
      s"""<polyline fill="none" stroke="$color" stroke-width="1.5" points="${pts.mkString(" ")}"/>"""
    }
    val legend = series.zipWithIndex.map { case ((label, color, _), i) =>
      s"""<text x="6" y="${14 + i * 14}" fill="$color" font-size="11">${esc(label)}</text>"""
    }
    s"""<svg viewBox="0 0 $w $h" width="$w" height="$h" role="img">""" +
      s"""<title>${esc(title)}</title>""" +
      s"""<rect width="$w" height="$h" fill="#fafafa"/>""" +
      lines.mkString + legend.mkString + "</svg>"
  }

  /** Spectral-history heatmap (slices × frequency bins), grayscale by
    * per-image max — the SVG twin of plotSpectralHistory's PNG. One
    * rect per cell; cells at zero are skipped (the background shows
    * through), so low-motion-zeroed slices render blank exactly like
    * the reference's sdThresh gating. */
  def svgHeatmap(img: Array[Array[Double]], w: Int, h: Int,
                 title: String = ""): String = {
    val slices = img.length
    val bins = if (slices == 0) 0 else img(0).length
    val peak = if (slices == 0) 0.0 else img.map(s => if (s.isEmpty) 0.0 else s.max).max
    val cw = if (slices == 0) 0.0 else w.toDouble / slices
    val ch = if (bins == 0) 0.0 else h.toDouble / bins
    val cells = new StringBuilder
    var s = 0
    while (s < slices) {
      var b = 0
      while (b < bins) {
        val v = img(s)(b)
        if (v > 0 && peak > 0) {
          val shade = 255 - math.min(255, (v / peak * 255).toInt)
          cells.append(
            f"""<rect x="${s * cw}%.1f" y="${h - (b + 1) * ch}%.1f" width="${cw max 1.0}%.1f" height="${ch max 1.0}%.1f" fill="rgb($shade,$shade,$shade)"/>""")
        }
        b += 1
      }
      s += 1
    }
    s"""<svg viewBox="0 0 $w $h" width="$w" height="$h" role="img">""" +
      s"""<title>${esc(title)}</title>""" +
      s"""<rect width="$w" height="$h" fill="#ffffff" stroke="#ccc"/>""" +
      cells.toString + "</svg>"
  }

  // -------------------------------------------------------- per-event pages

  case class EventPage(eventId: String, path: String, nBytes: Long)

  /** The per-event summary page (index.html.template's data table +
    * the reference's five plots as inline SVG: rawData, HR, the
    * analysis graph's two panels — spectrum/ROI powers and ROI ratio
    * with alarm state, eventAnalyser.py:513-552 — and the mean power
    * spectrum, :554-600, plus the spectral-history heatmap). */
  def renderEventHtml(eventId: String, userId: String, typeStr: String,
                      nDp: Int, dpMeans: Seq[Double], hrs: Seq[Double],
                      specPowers: Seq[Double], roiPowers: Seq[Double],
                      roiRatios: Seq[Double], alarms: Seq[Double],
                      meanSpectrum: Seq[Double],
                      spec: Array[Array[Double]]): String = {
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>Event ${esc(eventId)}</title>
       |<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
       |td,th{border:1px solid #999;padding:4px 10px}h2{margin-top:1.5em}</style>
       |</head><body>
       |<h1>Event ${esc(eventId)} Summary</h1>
       |<table>
       |<tr><th>Event ID</th><td>${esc(eventId)}</td></tr>
       |<tr><th>User ID</th><td>${esc(userId)}</td></tr>
       |<tr><th>Type</th><td>${esc(typeStr)}</td></tr>
       |<tr><th>Datapoints</th><td>$nDp</td></tr>
       |</table>
       |<h2>Acceleration (per-datapoint mean magnitude, mg)</h2>
       |${svgPolyline(dpMeans, 600, 120, "#1f77b4", "acceleration")}
       |<h2>Heart rate (bpm)</h2>
       |${svgPolyline(hrs, 600, 120, "#d62728", "heart rate")}
       |<h2>Spectrum / ROI powers</h2>
       |${svgMultiline(Seq(
           ("Spectrum Power", "#1f77b4", specPowers),
           ("ROI Power", "#ff7f0e", roiPowers)), 600, 140, "powers")}
       |<h2>ROI ratio &amp; alarm state</h2>
       |${svgMultiline(Seq(
           ("ROI Ratio", "#2ca02c", roiRatios),
           ("Alarm State", "#d62728", alarms)), 600, 140, "roi ratio")}
       |<h2>Mean power spectrum</h2>
       |${svgPolyline(meanSpectrum, 600, 120, "#9467bd", "spectrum")}
       |<h2>Spectral history</h2>
       |${svgHeatmap(spec, 600, 180, "spectral history")}
       |</body></html>
       |""".stripMargin
  }

  /** Render + WRITE one page per event, executor-side. Returns
    * (eventId, path, n_bytes) — the bounded metadata the index joins.
    * Pages land at `outDir/Event_<id>_summary/index.html` (the
    * reference's URL shape, summariseData.py:166). */
  def writeEventPages(dps: Dataset[FlatDp], outDir: String,
                      cfg: Spectrogram.Config = Spectrogram.Config())
      : Dataset[EventPage] = {
    val spark = dps.sparkSession
    import spark.implicits._
    dps.groupByKey(_.eventId).mapGroups { (eventId, it) =>
      val sorted = it.toArray.sortBy(d => (d.tsSec, d.seq))
      val dpMeans = sorted.map { d =>
        if (d.rawData == null || d.rawData.isEmpty) -1.0
        else d.rawData.sum / d.rawData.length
      }.toSeq
      val hrs = sorted.map(_.hr).toSeq
      // the analysis series: the REAL osdAlg kernels per datapoint
      // (P4-P7), exactly what the reference's analysisLst carries.
      // ONE DFT per datapoint serves all five quantities (the FromDft
      // overloads) — the naive per-kernel form recomputed the O(n²)
      // transform 7× per datapoint.
      import graft.functions.Signal
      val analysis = sorted.map { d =>
        if (d.rawData == null || d.rawData.isEmpty) None
        else {
          val (re, im) = Signal.dft(d.rawData)
          val spec = Signal.specPowerFromDft(re, im)
          val roi = Signal.roiPowerFromDft(re, im)
          val ratio = if (spec > 900.0) 10.0 * roi / spec else 0.0
          val alarm = if (ratio > 57.0) 1.0 else 0.0
          Some((spec, roi, ratio, alarm,
            Array.tabulate(re.length / 2)(i => Signal.magnitudeSq(re(i), im(i)))))
        }
      }
      val specPowers = analysis.map(_.fold(-1.0)(_._1)).toSeq
      val roiPowers = analysis.map(_.fold(-1.0)(_._2)).toSeq
      val roiRatios = analysis.map(_.fold(-1.0)(_._3)).toSeq
      val alarms = analysis.map(_.fold(-1.0)(_._4)).toSeq
      // mean |X_k|^2 spectrum over present datapoints (plotSpectrumGraph)
      val specs = analysis.flatten.map(_._5)
      val meanSpectrum =
        if (specs.isEmpty) Seq.empty[Double]
        else {
          val n = specs.map(_.length).min
          (0 until n).map(i => specs.map(_(i)).sum / specs.length)
        }
      val acc = sorted.flatMap(d =>
        if (d.rawData == null) Array.empty[Double] else d.rawData)
      val spec = Spectrogram.spectralHistory(acc, cfg)
      val html = renderEventHtml(eventId,
        sorted.headOption.map(_.userId).getOrElse("-"),
        sorted.headOption.map(_.typeStr).getOrElse("-"),
        sorted.length, dpMeans, hrs, specPowers, roiPowers, roiRatios,
        alarms, meanSpectrum, spec)
      val dir = new org.apache.hadoop.fs.Path(outDir, s"Event_${eventId}_summary")
      val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.mkdirs(dir)
      val p = new org.apache.hadoop.fs.Path(dir, "index.html")
      val out = fs.create(p, true)
      val bytes = html.getBytes("UTF-8")
      out.write(bytes)
      out.close()
      EventPage(eventId, p.toString, bytes.length.toLong)
    }
  }

  // ------------------------------------------------------------- index page

  /** The category index (summary_index.html.template): events grouped
    * into the reference's four buckets with per-event rows linking to
    * their pages. Driver-side BY DESIGN — the index is one bounded
    * page; the heavy per-event work happened on the executors. */
  def renderIndexHtml(rows: Seq[(String, String, String, String, String, Long)])
      : String = {
    val order = Seq("tcSeizures", "allSeizures", "falseAlarms", "otherEvents")
    val byCat = rows.groupBy(_._1)
    val sections = order.map { cat =>
      val evs = byCat.getOrElse(cat, Seq.empty).sortBy(_._2)
      s"""<h2>${esc(cat)} (${evs.size})</h2>
         |<table><tr><th>Event</th><th>User</th><th>Type</th><th>SubType</th>
         |<th>Source</th><th>Datapoints</th></tr>
         |${evs.map { case (_, id, u, t, st, ndp) =>
             s"""<tr><td><a href="Event_${esc(id)}_summary/index.html">${esc(id)}</a></td>""" +
               s"<td>${esc(u)}</td><td>${esc(t)}</td><td>${esc(st)}</td>" +
               s"<td>-</td><td>$ndp</td></tr>"
           }.mkString("\n")}
         |</table>""".stripMargin
    }
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>OSDB Summary</title>
       |<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
       |td,th{border:1px solid #999;padding:4px 10px}</style></head><body>
       |<h1>Database Summary</h1>
       |<p><a href="users.html">Per-user summary</a></p>
       |${sections.mkString("\n")}
       |</body></html>
       |""".stripMargin
  }

  /** The per-user summary page (userSummary.template's shape): one
    * table per user, category × (events, datapoints). */
  def renderUsersHtml(rows: Seq[(String, String, Long, Long)]): String = {
    val users = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val sections = users.map { case (u, rs) =>
      s"""<h2>User ${esc(u)}</h2>
         |<table><tr><th>Category</th><th>Events</th><th>Datapoints</th></tr>
         |${rs.sortBy(_._2).map { case (_, cat, n, dp) =>
             s"<tr><td>${esc(cat)}</td><td>$n</td><td>$dp</td></tr>"
           }.mkString("\n")}
         |</table>""".stripMargin
    }
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>OSDB User Summary</title>
       |<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
       |td,th{border:1px solid #999;padding:4px 10px}</style></head><body>
       |<h1>User Analysis Summary</h1>
       |<p><a href="index.html">Back to the event index</a></p>
       |${sections.mkString("\n")}
       |</body></html>
       |""".stripMargin
  }

  /** End-to-end report: executor-rendered event pages + the driver-side
    * category index. `nested` supplies the index metadata (the cheap
    * shape — pass arrays=false fixtures / projected scans); `dps`
    * supplies the per-event series. Returns the page-metadata table so
    * callers can verify/aggregate it. */
  def writeReport(nested: DataFrame, dps: Dataset[FlatDp],
                  outDir: String): DataFrame = {
    val spark = nested.sparkSession
    import spark.implicits._
    // FORCE the page writes now: writeEventPages' side effect lives in
    // a lazy mapGroups — without this collect, an index could publish
    // links to pages that were never rendered (and a caller running two
    // actions on the result would render every page twice). The page
    // metadata is the same per-event order as the index rows collected
    // below, so localizing it adds no new driver-size class.
    val pageRows = writeEventPages(dps, outDir).collect().toSeq
    val pages = pageRows.toDF("eventId", "path", "nBytes")
    val idxRows = indexSummary(nested)
      .select("category", "id", "userId", "type", "subType", "n_dp")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5)))
      .toSeq
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    def put(name: String, html: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(root, name), true)
      out.write(html.getBytes("UTF-8"))
      out.close()
    }
    put("index.html", renderIndexHtml(idxRows))
    // the per-user rollup is derivable from the idxRows already in
    // hand — re-running userSummary would re-execute the distributed
    // index scan a second time for a page's worth of counts ([[
    // userSummary]] stays the public aggregate for query-side use)
    val userRows = idxRows
      .groupBy(r => (r._3, r._1)) // (userId, category)
      .map { case ((u, cat), rs) =>
        (u, cat, rs.size.toLong, rs.map(_._6).sum) }
      .toSeq
    put("users.html", renderUsersHtml(userRows))
    pages
  }
}
