package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Osdb

/** Flatten layer (SURVEY §7.1.3): datapoint explode with parent
  * propagation (J2), temporal-continuity validation with gap fill /
  * overlap drop (P14, nnTraining2/flattenData.py:240-341), and the
  * flattened-wide CSV projection (S10).
  */
object Flatten {

  /** One row per datapoint after validation — the pipeline interchange
    * record (the reference's flattened CSV row, arrays kept as arrays). */
  case class FlatDp(
      eventId: String,
      userId: String,
      typeStr: String,
      `type`: Int,
      tsSec: Long,             // end-of-datapoint time, epoch seconds
      osdAlarmState: Long,
      osdSpecPower: Double,
      osdRoiPower: Double,
      hr: Double,
      o2sat: Double,
      rawData: Array[Double],    // magnitude, 125
      rawData3D: Array[Double],  // interleaved, 375 (empty if absent)
      synthetic: Boolean,        // true for gap-fill zero datapoints
      seq: Long = 0L)            // source order within event (posexplode
                                 // index) — the deterministic tiebreak for
                                 // datapoints sharing a timestamp

  /** C4 type2id (flattenData.py:13-27): seizure→1, falseAlarm/nda→0,
    * else 2 (case-insensitive substring on the type string). */
  def type2id(t: String): Int = {
    val lt = Option(t).getOrElse("").toLowerCase
    if (lt.contains("seizure")) 1
    else if (lt.contains("false alarm") || lt.contains("nda")) 0
    else 2
  }

  /** J2: plain explode with parent columns — no join, the parent columns
    * ride along each emitted child row. */
  def explodeDatapoints(events: DataFrame): DataFrame =
    events.select(
      col("id").cast("string").as("eventId"),
      col("userId").cast("string").as("userId"),
      col("type").as("typeStr"),
      col("subType"),
      posexplode(col("datapoints")).as(Seq("dpIdx", "dp")))

  /** P14 + F9: per-event sorted validation. dataTime marks the LAST
    * sample, so a datapoint spans [t-5s, t]; consecutive datapoints
    * should abut. Gap > 2 s beyond the expected spacing ⇒ insert
    * floor(gap/5 s) zero datapoints; overlap > 2 s ⇒ drop the datapoint;
    * datapoints without accelerometer data are skipped (F9).
    *
    * Runs as flatMapGroups: one event = one group = one task's unit of
    * work; no driver-side loop, arbitrarily many events in parallel. */
  def validateAndFill(dps: Dataset[FlatDp]): Dataset[FlatDp] = {
    val spark = dps.sparkSession
    import spark.implicits._
    dps.groupByKey(_.eventId).flatMapGroups { (_, it) =>
      validateGroupSorted(it.toArray.sortBy(d => (d.tsSec, d.seq))).iterator
    }
  }

  /** The P14 core over ONE event's (tsSec, seq)-sorted datapoints —
    * shared by [[validateAndFill]] and the fused validate+extract path
    * ([[FeatureExtract.extract]] `validate = true`), so a pipeline that
    * needs both pays ONE per-event shuffle instead of two. Output stays
    * time-ordered: gap rows land strictly between their neighbours'
    * timestamps, so re-sorting by (tsSec, seq) is a no-op
    * (RunSequenceSpec pins fused == sequential). */
  private[graft] def validateGroupSorted(sorted: Array[FlatDp]): Array[FlatDp] = {
    val tolMs = 2000L
    val dpMs = 5000L
    val out = scala.collection.mutable.ArrayBuffer.empty[FlatDp]
    var lastEndMs = Long.MinValue
    // synthetic rows get their own strictly-decreasing negative seq so
    // (tsSec, seq) stays unique within the event by construction, not
    // by the implicit no-tsSec-collision property of gap arithmetic
    var synthSeq = -1L
    sorted.foreach { dp =>
      val hasAcc = dp.rawData.nonEmpty || dp.rawData3D.nonEmpty
      if (hasAcc) {
        val endMs = dp.tsSec * 1000L
        val startMs = endMs - dpMs
        if (lastEndMs == Long.MinValue) {
          out += dp; lastEndMs = endMs
        } else {
          val gapMs = startMs - lastEndMs
          if (gapMs > tolMs) {
            val nGap = (gapMs / dpMs).toInt
            var i = 1
            while (i <= nGap) {
              val gapEnd = lastEndMs + dpMs * i
              out += FlatDp(dp.eventId, dp.userId, dp.typeStr, dp.`type`,
                gapEnd / 1000L, 0L, 0.0, 0.0, -1.0, -1.0,
                new Array[Double](Osdb.SamplesPerDatapoint),
                Array.emptyDoubleArray, synthetic = true, seq = synthSeq)
              synthSeq -= 1
              i += 1
            }
            out += dp
            lastEndMs = endMs
          } else if (gapMs < -tolMs) {
            // overlap: drop
          } else {
            out += dp; lastEndMs = endMs
          }
        }
      }
    }
    out.toArray
  }

  /** S10: the reference's wide-CSV projection — M000..M124 magnitude,
    * X/Y/Z de-interleaved axes. 500 generated columns; only emitted on
    * demand for compatibility, never used as the processing layout. */
  def flattenedWide(dps: DataFrame): DataFrame = {
    val n = Osdb.SamplesPerDatapoint
    // try_element_at: absent 3D data is an EMPTY array and must project
    // as null cells (the reference's empty CSV columns), not throw under
    // ANSI mode's strict element_at
    val mCols = (0 until n).map(i =>
      try_element_at(col("rawData"), lit(i + 1)).as(f"M$i%03d"))
    val axes = Seq("X" -> 0, "Y" -> 1, "Z" -> 2)
    val xyzCols = axes.flatMap { case (nm, ax) =>
      (0 until n).map(i =>
        try_element_at(col("rawData3D"), lit(3 * i + ax + 1)).as(f"$nm$i%03d"))
    }
    dps.select(
      (Seq(col("eventId"), col("userId"), col("typeStr"), col("type"),
        col("tsSec"), col("osdAlarmState"), col("osdSpecPower"),
        col("osdRoiPower"), col("hr"), col("o2sat")) ++ mCols ++ xyzCols): _*)
  }
}
