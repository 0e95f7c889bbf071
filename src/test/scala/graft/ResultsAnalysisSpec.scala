package graft

import org.apache.spark.sql.functions._

import graft.report.ResultsAnalysis

/** analyzeEventResults.py parity ([[graft.report.ResultsAnalysis]]):
  * the branches the rpt5 fixture can't reach — null users fold to
  * 'Unknown' (before any threshold), the reference's default
  * Tonic-Clonic/Combined pattern, empty-TC zero row, null-subtype
  * drop — plus the grouping/rate arithmetic on a hand-checked frame. */
class ResultsAnalysisSpec extends SparkSpec {

  private def frame(rows: Seq[(String, java.lang.Long, Int, Int, String)]) = {
    import spark.implicits._
    rows.toDF("eventId", "userId", "label", "prediction", "subType")
  }

  test("user sides: thresholds fold sparse users to Other; null user is Unknown") {
    val rows = Seq[(String, java.lang.Long, Int, Int, String)](
      // user 1: 3 seizures (2 detected), user 2: 1 seizure (sparse)
      ("e1", 1L, 1, 1, "Tonic-Clonic"), ("e2", 1L, 1, 1, "other"),
      ("e3", 1L, 1, 0, "other"), ("e4", 2L, 1, 0, "other"),
      // null user seizure
      ("e5", null, 1, 1, "other"),
      // non-seizures: user 1 has 2 (1 false alarm), user 2 has 1
      ("e6", 1L, 0, 1, null), ("e7", 1L, 0, 0, null), ("e8", 2L, 0, 0, null))
    val out = ResultsAnalysis.analyze(frame(rows),
        seizureThreshold = 2, farThreshold = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out(("user_tpr", "1")) == (3L, 2L, 1L, 2.0 / 3))
    assert(out(("user_tpr", "Other")) == (1L, 0L, 1L, 0.0))
    assert(out(("user_tpr", "Unknown")) == (1L, 1L, 0L, 1.0))
    assert(out(("user_far", "1")) == (2L, 1L, 1L, 0.5))
    assert(out(("user_far", "Other")) == (1L, 0L, 1L, 0.0))
    // subtype table DROPS the null-subtype rows (pd.notna filter)
    assert(!out.keys.exists { case (s, g) => s == "subtype_tpr" && g == null })
    assert(out(("subtype_tpr", "Tonic-Clonic")) == (1L, 1L, 0L, 1.0))
    // reference default pattern matches 'Tonic-Clonic' case-insensitively
    assert(out(("tc_combined", "tc_combined")) == (1L, 1L, 0L, 1.0))
  }

  test("'Combined' subtype matches the default TC pattern; empty TC slice emits a zero row") {
    val rows = Seq[(String, java.lang.Long, Int, Int, String)](
      ("e1", 1L, 1, 1, "Combined tonic"), ("e2", 1L, 1, 0, "focal"))
    val out = ResultsAnalysis.analyze(frame(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("tc_combined", "tc_combined")) == (1L, 1L))

    val none = Seq[(String, java.lang.Long, Int, Int, String)](
      ("e1", 1L, 1, 1, "focal"))
    val z = ResultsAnalysis.analyze(frame(none)).collect()
      .filter(_.getString(0) == "tc_combined").head
    assert(z.getLong(2) == 0 && z.getDouble(5) == 0.0)
  }
}
