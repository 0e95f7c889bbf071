package graft

import org.apache.spark.sql.functions._

import graft.queries.OsdbFixture
import graft.report.Summarise

/** The report layer (graft.report.Summarise): category bucketing,
  * executor-side page emission, SVG chart assembly, and the driver-side
  * index — the spec-level twin of the rpt1_summary_index oracle row. */
class ReportSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("indexSummary: tonic-clonic seizures land in BOTH tc and all buckets") {
    import spark.implicits._
    val nested = Seq(
      ("1", "u1", "Seizure", "tonicClonic", "src", 4L),
      ("2", "u1", "Seizure", "other", "src", 5L),
      ("3", "u2", "False Alarm", "other", "src", 6L),
      ("4", "u3", "Unknown", "other", "src", 7L)
    ).toDF("id", "userId", "type", "subType", "dataSourceName", "n_dp")
    val out = Summarise.indexSummary(nested)
      .select("category", "id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(
      ("tcSeizures", "1"), ("allSeizures", "1"), ("allSeizures", "2"),
      ("falseAlarms", "3"), ("otherEvents", "4")))
  }

  test("svg charts: sentinel gaps skipped, heatmap cells only where power > 0") {
    val line = Summarise.svgPolyline(Seq(1.0, -1.0, 3.0), 100, 50)
    // two present points -> one polyline with exactly two coordinate pairs
    assert(line.contains("<polyline") &&
      line.split("points=\"")(1).split("\"")(0).trim.split(" ").length == 2)
    val heat = Summarise.svgHeatmap(
      Array(Array(0.0, 2.0), Array(0.0, 0.0), Array(1.0, 4.0)), 90, 60)
    // cells appear only for the three nonzero values
    assert("<rect x=".r.findAllIn(heat).size == 3, heat)
    // empty image renders a frame, not an exception
    assert(Summarise.svgHeatmap(Array.empty, 10, 10).contains("<svg"))
  }

  test("writeReport: executor-rendered pages + index, end to end on the fixture") {
    val outDir = java.nio.file.Files.createTempDirectory("report").toString
    val nested = OsdbFixture.nested(spark, sf, arrays = false)
    val dps = OsdbFixture.flatDps(spark, sf, col("e") % 40 === 0)
    val pages = Summarise.writeReport(nested, dps, outDir).collect()
    assert(pages.nonEmpty, "no event pages emitted")
    // every page file exists at its reported path with its reported size
    pages.foreach { r =>
      val f = new java.io.File(new java.net.URI(r.getString(1)).getPath)
      assert(f.isFile, s"missing page ${r.getString(1)}")
      assert(f.length() == r.getLong(2))
    }
    // a page is self-contained HTML with the three inline SVG charts
    val html = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(new java.net.URI(
        pages.head.getString(1)).getPath).toPath), "UTF-8")
    assert(html.startsWith("<!DOCTYPE html>") && html.contains("</html>"))
    // the reference's five plots + the spectral-history heatmap
    assert("<svg ".r.findAllIn(html).size == 6, "expected 6 inline charts")
    assert(html.contains(s"Event ${pages.head.getString(0)} Summary"))
    assert(html.contains("ROI Ratio") && html.contains("Spectrum Power"),
      "analysis panels missing their legends")
    // the driver-side index links every category section
    val idx = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "index.html")), "UTF-8")
    Seq("tcSeizures", "allSeizures", "falseAlarms", "otherEvents")
      .foreach(c => assert(idx.contains(c), s"index missing section $c"))
    assert(idx.contains("_summary/index.html\""), "index rows carry page links")
    // the per-user summary page exists and is linked
    assert(idx.contains("users.html"))
    val users = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "users.html")), "UTF-8")
    assert(users.contains("User Analysis Summary") && users.contains("<h2>User "))
  }

  test("svgMultiline: every series draws and carries its legend label") {
    val m = Summarise.svgMultiline(Seq(
      ("a", "#111111", Seq(1.0, 2.0)), ("b", "#222222", Seq(2.0, -1.0, 4.0))),
      100, 50)
    assert("<polyline".r.findAllIn(m).size == 2)
    assert(m.contains(">a</text>") && m.contains(">b</text>"))
    // series b skips its sentinel: one polyline has exactly 2 points
    assert(m.split("points=\"").exists(
      s => s.takeWhile(_ != '"').trim.split(" ").length == 2))
  }
}
