package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT an equi key — the join class Spark
  * plans as BroadcastNestedLoopJoin (or a cartesian) because no
  * equality column exists to hash or sort on: every (point, interval)
  * pair where `lo <= point <= hi`, both sides large.
  *
  * The bucketing trick turns it into an equi join: pick a bucket width
  * W, give each point the key `point div W`, and EXPLODE each interval
  * to one row per bucket it touches (`sequence(lo div W, hi div W)`).
  * A pair can only satisfy the containment if the point's bucket is one
  * of the interval's buckets, so the equi join on the synthetic key
  * finds every candidate, the residual `BETWEEN` filter removes
  * bucket-collision false positives, and — because `sequence` emits
  * each bucket id once — every true pair joins EXACTLY once: no
  * post-join dedup.
  *
  * Cost model for choosing W: the interval side inflates by
  * `len/W + 1` rows per interval and the join key has
  * `timespan/W` distinct values. W ≈ the typical interval length keeps
  * inflation ≤ 2× while giving the shuffle enough key cardinality to
  * spread; a hot time range (many intervals over one bucket) is
  * ordinary join skew — AQE's skew split or [[Skew]]-style salting
  * applies unchanged, which is exactly why reducing to an equi join is
  * the right 100 TB move: it inherits every equi-join lever Spark has.
  *
  * Bucket ids use `div` (64-bit integer division) — exact at any epoch
  * scale, and applied identically to points and both interval bounds,
  * so coverage (`trunc` is monotone) and once-per-bucket uniqueness
  * hold regardless of sign.
  *
  * Reference trigger: seizure-times labelling (`tidy_db.py:160-168` —
  * is this datapoint inside any seizure interval?) done reference-side
  * with a per-event dict lookup; j1 keeps that broadcast shape for
  * small interval tables, this operator is the same semantics when the
  * interval table is itself fact-sized.
  */
object IntervalJoin {

  /** Inner-join `points` × `intervals` on
    * `intervals.loUs <= points.pointUs <= intervals.hiUs`
    * (+ optional `keys` equality), via bucket-exploded equi join.
    * The three named columns must be LONG (e.g. `unix_micros`);
    * non-key column names must not collide across the two sides.
    */
  def pointInInterval(points: DataFrame, pointUsCol: String,
                      intervals: DataFrame, loUsCol: String, hiUsCol: String,
                      bucketUs: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val reserved = "__ij_b"
    require(!points.columns.contains(reserved) &&
      !intervals.columns.contains(reserved),
      s"column name $reserved is reserved by pointInInterval")
    val p = points.withColumn(reserved, expr(s"`$pointUsCol` div ${bucketUs}L"))
    val iv = intervals.withColumn(reserved,
      explode(sequence(expr(s"`$loUsCol` div ${bucketUs}L"),
        expr(s"`$hiUsCol` div ${bucketUs}L"))))
    p.join(iv, keys :+ reserved)
      .filter(col(loUsCol) <= col(pointUsCol) &&
        col(pointUsCol) <= col(hiUsCol))
      .drop(reserved)
  }
}
