package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** [[graft.operators.AsOf.asOfJoin]] semantics on a planted fixture —
  * latest-prior selection, inclusive equal-ts match, tie-break to the
  * largest tie id, no-match nulls, tolerance null-out, left-column
  * passthrough — plus the plan shape the operator exists for: one
  * exchange, zero join nodes.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // left: (alarm id, key, ts); right: (key, ts, reading id, value)
  private lazy val left = Seq(
    (100L, 1L, ts(50)),  // between r1@10 and r3@60 -> matches r2@30
    (101L, 1L, ts(60)),  // equal-ts with r3@60 -> inclusive match r3
    (102L, 1L, ts(5)),   // before every right row -> null
    (103L, 2L, ts(1000)),// key 2's only right is @100, tol 500s -> stale
    (104L, 3L, ts(70)),  // key 3 has NO right rows -> null
    (105L, 1L, ts(30))   // equal-ts TIE: r2a/r2b both @30 -> larger id 22
  ).toDF("alarm_id", "k", "ts")

  private lazy val right = Seq(
    (1L, ts(10), 20L, 1.0),  // r1
    (1L, ts(30), 21L, 2.0),  // r2a
    (1L, ts(30), 22L, 2.5),  // r2b (same ts as r2a, larger id wins)
    (1L, ts(60), 23L, 3.0),  // r3
    (2L, ts(100), 30L, 9.0)
  ).toDF("k", "ts", "rid", "v")

  private lazy val joined = AsOf.asOfJoin(
    left, right, Seq("k"), "ts", "rid", Seq("v"),
    toleranceUs = Some(500L * 1000000L)) // 500 s

  test("as-of join: latest-prior, inclusive ties, tolerance, nulls") {
    val rows = joined
      .select("alarm_id", "asof_rid", "asof_v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.map(t => (t._1, t._2)).toSeq == Seq(
      100L -> 22L,  // latest prior to t=50 is the t=30 pair, id 22
      101L -> 23L,  // equal ts matches (inclusive <=)
      102L -> -1L,  // nothing prior
      103L -> -1L,  // match exists but 900 s stale > 500 s tolerance
      104L -> -1L,  // key never has right rows
      105L -> 22L)) // equal-ts tie resolves to the larger rid
    assert(rows.find(_._1 == 100L).get._3 == 2.5)
  }

  test("as-of join: matched ts rides along; left columns pass through") {
    val r = joined.filter(col("alarm_id") === 101L)
      .select("k", "ts", "asof_ts").collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getTimestamp(1) == ts(60) && r.getTimestamp(2) == ts(60))
  }

  test("a null payload value in the latest right row rides through as null") {
    // the reason the match is ONE struct: per-column ignoreNulls lasts
    // would skip a legitimately-null payload back to an OLDER right row
    // and mix fields across rows. The latest row must win wholesale.
    val r = Seq(
      (1L, ts(10), 20L, Some(1.0)),
      (1L, ts(20), 21L, None: Option[Double]) // latest; v is null
    ).toDF("k", "ts", "rid", "v")
    val l = Seq((100L, 1L, ts(30))).toDF("alarm_id", "k", "ts")
    val row = AsOf.asOfJoin(l, r, Seq("k"), "ts", "rid", Seq("v"))
      .select("asof_rid", "asof_v").collect().head
    assert(row.getLong(0) == 21L, "must match the latest right row")
    assert(row.isNullAt(1), "its null payload must NOT fall back to rid 20")
  }

  test("as-of join plans as one exchange and zero joins") {
    // string pin (PlanSpec convention): AQE's wrapper node hides the
    // inner plan from TreeNode.collect until execution finalizes it.
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"as-of must not plan a join:\n$plan")
    assert("Exchange ".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange (hash on key):\n$plan")
  }
}
