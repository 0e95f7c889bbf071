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
    // NaN is missing too (the pre-round-11 `_ >= 0` semantics, pinned
    // after a refactor regressed it): one NaN must not blank the chart
    val withNaN = Summarise.svgPolyline(Seq(1.0, Double.NaN, 3.0), 100, 50)
    assert(!withNaN.contains("NaN"), "NaN leaked into polyline points")
    assert(withNaN.split("points=\"")(1).split("\"")(0)
      .trim.split(" ").length == 2)
    // signed variant: negatives are DATA, NaN is its missing sentinel
    val signed = Summarise.svgSignedPolyline(
      Seq(-2.0, Double.NaN, 2.0), 100, 50)
    assert(!signed.contains("NaN") &&
      signed.split("points=\"")(1).split("\"")(0).trim.split(" ").length == 2)
    val heat = Summarise.svgHeatmap(
      Array(Array(0.0, 2.0), Array(0.0, 0.0), Array(1.0, 4.0)), 90, 60)
    // cells appear only for the three nonzero values
    assert("<rect x=".r.findAllIn(heat).size == 3, heat)
    // empty image renders a frame, not an exception
    assert(Summarise.svgHeatmap(Array.empty, 10, 10).contains("<svg"))
  }

  test("svgHeatmap giant-event guard: columns max-pool to <= width, peaks survive") {
    // 1200 slices into w=40: at most 40 columns' worth of rects, and the
    // single planted peak must survive pooling as the darkest cell
    val img = Array.tabulate(1200)(s =>
      Array(1.0, if (s == 777) 100.0 else 2.0))
    val heat = Summarise.svgHeatmap(img, 40, 20)
    val rects = "<rect x=".r.findAllIn(heat).size
    assert(rects <= 40 * 2 && rects > 0, s"$rects rects for 40px")
    // peak cell: value 100 of per-image max 100 -> shade 0
    assert(heat.contains("rgb(0,0,0)"), "pooled peak lost")
    // fits-in-width images are untouched: every cell still renders
    val small = Array.tabulate(30)(s => Array(1.0 + s, 2.0))
    assert("<rect x=".r.findAllIn(Summarise.svgHeatmap(small, 40, 20)).size
      == 60)
  }

  test("packed pages: O(tasks) bundle files, content identical to per-event mode") {
    val dps = OsdbFixture.flatDps(spark, sf, col("e") % 40 === 0)
    val looseDir = java.nio.file.Files.createTempDirectory("pagesLoose").toString
    val packDir = java.nio.file.Files.createTempDirectory("pagesPacked").toString
    val loose = Summarise.writeEventPages(dps, looseDir).collect()
    val packed = Summarise.writeEventPages(dps, packDir, packed = true).collect()
    assert(loose.length == packed.length && loose.nonEmpty)
    // container shape: one bundle per non-empty task, not one dir per event
    val bundles = new java.io.File(packDir).listFiles()
      .filter(_.getName.matches("pages-\\d+\\.jsonl"))
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(bundles.nonEmpty && bundles.length <= nPart,
      s"${bundles.length} bundles for $nPart partitions")
    assert(bundles.length < loose.length,
      "packed mode did not reduce the file count on a >partitions corpus")
    // round-trip: the distributed reader recovers every page, and each
    // page's HTML is byte-identical to the per-event-mode file
    val back = Summarise.readPackedPages(spark, packDir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back.keySet == loose.map(_.eventId).toSet)
    loose.foreach { p =>
      val f = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(new java.net.URI(p.path).getPath).toPath), "UTF-8")
      assert(back(p.eventId) == f, s"packed html differs for ${p.eventId}")
    }
    // metadata contract: bundle#eventId paths, true byte sizes
    packed.foreach { p =>
      assert(p.path.contains(".jsonl#"), p.path)
      assert(p.nBytes == back(p.eventId).getBytes("UTF-8").length.toLong)
    }
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
    // the reference's five plots + the spectral-history heatmap + the
    // round-11 dataVisualiser series (band energy, std/max accel,
    // skewness, kurtosis — viz1's kernels rendered in place)
    assert("<svg ".r.findAllIn(html).size == 10, "expected 10 inline charts")
    assert(html.contains(s"Event ${pages.head.getString(0)} Summary"))
    assert(html.contains("ROI Ratio") && html.contains("Spectrum Power"),
      "analysis panels missing their legends")
    assert(html.contains("Band energy") && html.contains("Std Accel") &&
      html.contains("Max Accel") && html.contains("Skewness") &&
      html.contains("Kurtosis"), "dataVisualiser series panels missing")
    // the driver-side TOC is bounded: one row per category + links to
    // shard 0 of each non-empty category and to the user pages
    val idx = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "index.html")), "UTF-8")
    Seq("tcSeizures", "allSeizures", "falseAlarms", "otherEvents")
      .foreach(c => assert(idx.contains(c), s"TOC missing category $c"))
    assert(idx.contains("users_0.html"), "TOC missing user-summary link")
    // event links live in the executor-rendered shards, not the TOC
    val shard0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "index_allSeizures_0.html")), "UTF-8")
    assert(shard0.contains("_summary/index.html\""), "shard rows carry page links")
    assert(shard0.contains("""<a href="index.html">Index</a>"""))
    val users = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "users_0.html")), "UTF-8")
    assert(users.contains("User Analysis Summary") && users.contains("<h2>User "))
  }

  test("index shards: N events > pageSize => k chained pages, ids partition in order") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("shards").toString
    val nested = OsdbFixture.nested(spark, sf, arrays = false)
    val idx = Summarise.indexSummary(nested)
      .select(col("category"), col("id"), col("userId"),
        col("type").as("typeStr"), col("subType"), col("n_dp").as("nDp"))
      .as[Summarise.IdxRow]
    val pageSize = 3
    val (shards, totals) = Summarise.writeIndexShards(idx, outDir, pageSize)
    val meta = shards.collect()
    val expectedIds = idx.collect().groupBy(_.category)
      .map { case (c, rs) => c -> rs.map(_.id).sorted.toSeq }
    expectedIds.foreach { case (cat, ids) =>
      val k = (ids.size + pageSize - 1) / pageSize
      val catShards = meta.filter(_.category == cat).sortBy(_.shard)
      assert(catShards.map(_.shard).toSeq == (0L until k.toLong),
        s"$cat: expected $k contiguous shards")
      assert(catShards.forall(_.nRows <= pageSize), s"$cat: oversize shard")
      assert(catShards.map(_.nRows).sum == ids.size)
      assert(totals(cat) == ids.size.toLong)
      // ids across the shard chain reproduce the sorted category ids,
      // and each page links prev/next exactly at the chain interior
      val seen = (0 until k).flatMap { s =>
        val html = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(outDir, s"index_${cat}_$s.html")), "UTF-8")
        assert(html.contains(s"index_${cat}_${s + 1}.html") == (s < k - 1),
          s"$cat shard $s: bad next link")
        assert(html.contains(s"index_${cat}_${s - 1}.html") == (s > 0),
          s"$cat shard $s: bad prev link")
        ">([^<>]+)</a></td>".r.findAllMatchIn(html).map(_.group(1)).toSeq
      }
      assert(seen == ids, s"$cat: shard chain does not reproduce sorted ids")
    }
    shards.unpersist()
  }

  test("sanitizeId: traversal-shaped external ids cannot escape outDir") {
    import spark.implicits._
    assert(Summarise.sanitizeId("123") == "123")
    assert(!Summarise.sanitizeId("../../etc/passwd").contains("/"))
    assert(Summarise.sanitizeId("a/b") != Summarise.sanitizeId("a=2Fb"),
      "escape encoding must stay injective")
    // oversized ids truncate deterministically under the filename cap,
    // distinct ids stay distinct (64-bit hash suffix on the original)
    val long1 = "x" * 300
    val long2 = "x" * 299 + "y"
    assert(Summarise.sanitizeId(long1).length <= 128 + 18)
    assert(Summarise.sanitizeId(long1) == Summarise.sanitizeId(long1))
    assert(Summarise.sanitizeId(long1) != Summarise.sanitizeId(long2))
    // forgery: an id crafted to EQUAL a capped id's sanitized form must
    // not map to the same page dir — its '=' re-escapes to =3D
    val capped = Summarise.sanitizeId(long1)
    assert(Summarise.sanitizeId(capped) != capped,
      "a capped sanitized form must not be forgeable by a short id")
    val outDir = java.nio.file.Files.createTempDirectory("evil").toString
    val evil = "../pwned/x"
    val dp = graft.operators.Flatten.FlatDp(evil, "u1", "Seizure", 1, 1000L,
      0L, 0.0, 0.0, 60.0, 95.0, Array.fill(125)(1000.0), Array.empty, false, 0L)
    val pages = Summarise.writeEventPages(Seq(dp).toDS(), outDir).collect()
    assert(pages.length == 1)
    val written = new java.io.File(new java.net.URI(pages.head.path).getPath)
    assert(written.isFile)
    val canonOut = new java.io.File(outDir).getCanonicalPath
    assert(written.getCanonicalPath.startsWith(canonOut + "/"),
      s"page escaped outDir: ${written.getCanonicalPath}")
    assert(!new java.io.File(new java.io.File(outDir).getParent, "pwned").exists())
    // the index href uses the SAME sanitized form, so links resolve
    val href = s"Event_${Summarise.sanitizeId(evil)}_summary/index.html"
    assert(written.getCanonicalPath.endsWith(href))
    val html = Summarise.renderIndexShardHtml("allSeizures", 0, 1, 1,
      Seq(Summarise.IdxRow("allSeizures", evil, "u1", "Seizure", "other", 1L)))
    assert(html.contains(s"""href="$href""""), "index href != written path form")
  }

  test("session hadoopConfiguration reaches the task-side write path") {
    import spark.implicits._
    val key = "graft.test.fs.marker"
    spark.sparkContext.hadoopConfiguration.set(key, "42")
    try {
      // the exact mechanism writeEventPages/writeIndexShards ship to
      // tasks: entries serialized into the closure, conf rebuilt task-side
      val box = Summarise.HadoopConfBox.fromSession(spark)
      val seen = spark.range(2).mapPartitions { _ =>
        Iterator(Option(box.conf.get(key)).getOrElse("absent"))
      }.collect().toSet
      assert(seen == Set("42"), s"task-side conf saw $seen")
    } finally spark.sparkContext.hadoopConfiguration.unset(key)
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
