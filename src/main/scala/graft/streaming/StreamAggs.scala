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

  case class EmaIn(ts_us: Long, user_id: Long, event_id: Long, value: Double)
  case class EmaState(n: Long, ema: Double)
  case class EmaOut(user_id: Long, n: Long, ema: Double)

  /** W12 as a stream: per-key running EMA via flatMapGroupsWithState —
    * the RECURSIVE-window class (state_i = f(state_{i−1}, x_i)) that
    * windowed aggregations cannot express; the streaming twin of
    * [[graft.operators.FeatureHistory.ema]] (α = 1/4, seed = first
    * value, identical IEEE fold).
    *
    * Order contract: an EMA is order-SENSITIVE, so streaming parity
    * with the batch fold needs (a) rows sorted by (ts_us, event_id)
    * WITHIN each micro-batch (done here — the per-group iterator is
    * unordered) and (b) a feed whose micro-batches are time-monotone
    * per key (the file feed's time-split chunks guarantee it; a
    * production feed gets it from log-structured arrival). State is one
    * (n, ema) pair per key — O(keys), no sample buffers. Emits the
    * running state after each batch that touched the key; the reader
    * keeps the max-n row per key for the final value. */
  def emaStates(events: DataFrame, alpha: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("ts_us"), col("user_id"), col("event_id"), col("value"))
      .as[EmaIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EmaIn],
         state: org.apache.spark.sql.streaming.GroupState[EmaState]) =>
          val rows = it.toSeq.sortBy(r => (r.ts_us, r.event_id))
          if (rows.isEmpty) Iterator.empty
          else {
            var (n, ema) = state.getOption
              .map(s => (s.n, s.ema)).getOrElse((0L, 0.0))
            rows.foreach { r =>
              ema = if (n == 0) r.value
                    else ema * (1.0 - alpha) + r.value * alpha
              n += 1
            }
            state.update(EmaState(n, ema))
            Iterator(EmaOut(uid, n, ema))
          }
      }.toDF()
  }
}
