package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** [[graft.operators.IntervalJoin.pointInInterval]]: exactly-once pair
  * semantics across bucket spans, inclusive bounds, and the plan claim
  * the operator exists for — an equi join where the naive predicate
  * join is a nested loop.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // bucket = 10; interval B spans buckets 0..3 — a contained point must
  // still appear exactly once.
  private lazy val points = Seq(
    (1L, 5L),   // in A and B
    (2L, 10L),  // == A.lo (inclusive) and in B
    (3L, 35L),  // in B only (bucket 3, B's 4th exploded row)
    (4L, 39L),  // == B.hi (inclusive)
    (5L, 40L),  // just past B.hi; bucket 4 matches nothing
    (6L, 200L)  // far away
  ).toDF("pid", "p_us")

  private lazy val intervals = Seq(
    (10L, 10L, 14L), // A: single bucket
    (11L, 2L, 39L),  // B: spans buckets 0..3
    (12L, 90L, 95L)  // C: matches nothing
  ).toDF("iid", "lo_us", "hi_us")

  private lazy val joined = IntervalJoin.pointInInterval(
    points, "p_us", intervals, "lo_us", "hi_us", bucketUs = 10L)

  test("pointInInterval: exactly-once pairs, inclusive bounds") {
    val pairs = joined.select("pid", "iid").as[(Long, Long)].collect()
    assert(pairs.length == pairs.distinct.length, "duplicate pairs")
    assert(pairs.toSet == Set(
      1L -> 11L, 2L -> 10L, 2L -> 11L, 3L -> 11L, 4L -> 11L))
    // brute force over the cross product agrees
    val brute = points.crossJoin(intervals)
      .filter(col("lo_us") <= col("p_us") && col("p_us") <= col("hi_us"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(pairs.toSet == brute)
  }

  test("pointInInterval with an equi key restricts within the key") {
    val p = points.withColumn("u", col("pid") % 2)
    val iv = intervals.withColumn("u", col("iid") % 2)
    val got = IntervalJoin.pointInInterval(
        p, "p_us", iv, "lo_us", "hi_us", bucketUs = 10L, keys = Seq("u"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = p.crossJoin(iv.withColumnRenamed("u", "u2"))
      .filter(col("u") === col("u2") &&
        col("lo_us") <= col("p_us") && col("p_us") <= col("hi_us"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("pointInInterval plans an equi join, not a nested loop") {
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"bucketed interval join must not nested-loop:\n$plan")
    // the naive predicate join on the same inputs IS a nested loop —
    // the contrast the operator exists for
    val naive = points.join(intervals,
      col("lo_us") <= col("p_us") && col("p_us") <= col("hi_us"))
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }
}
