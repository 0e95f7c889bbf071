package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked streaming aggregations — the §2.5 window family as
  * Structured Streaming plans (readStream → transform → writeStream).
  *
  * These mirror the batch queries (a8 tumbling max, w3 sessions) so a
  * user can run the same rollup over the stored lake and over the live
  * device feed. The watermark bounds state: closed windows are evicted
  * and later-than-watermark data is dropped — the property that keeps
  * state finite at device-fleet rates.
  */
object StreamAggs {

  /** A8/W1 as a stream: tumbling-window max + count per key. */
  def tumblingMax(events: DataFrame, tsCol: String, keyCol: String,
                  valCol: String, windowLen: String = "10 minutes",
                  watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), window(col(tsCol), windowLen).as("w"))
      .agg(max(col(valCol)).as("max_value"), count(lit(1)).as("n"))

  /** W3 as a stream: session windows (gap-merged) per key.
    *
    * Note the deliberate asymmetry with the BATCH w3 query: in batch the
    * lag+cumsum gaps-and-islands form wins (session_window's merging
    * ObjectHashAggregate measured 15x slower and the analytic plan is
    * predictable at scale), but in STREAMING gaps-and-islands is not
    * expressible — merging session state incrementally is exactly what
    * `session_window` + watermark exist for, so here it is the right
    * tool. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String = "30 minutes",
                    watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n"))

  /** Streaming tidy→filter: the stateless ingest prefix (tidy expansion,
    * predicate filter) applied to a stream — identical code path to
    * batch, which is the point: one definition, two execution modes. */
  def tidyFilterStream(events: DataFrame, predicate: Column): DataFrame =
    graft.operators.Tidy(events).filter(predicate)
}
