package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W4: the curation keep-max duplicate merge and A4 event-level
  * prediction metrics.
  */
object Curate {

  /** W4 (curator_tools/merge_json.py:148-250 detect_and_mark_duplicates):
    * within each (user, type, subType) group, events sorted by time form
    * a duplicate cluster while each is within `maxSeconds` of the
    * PREVIOUS one (chained adjacency, not a fixed bucket); per cluster
    * keep exactly one by: reference-dataset flag first, then most
    * datapoints, then latest time (`dt > best` strict), with the id as
    * the final unique tiebreak the reference leaves unspecified.
    *
    * Spark shape: gaps-and-islands (lag + running sum — one shuffle on
    * the group key, both window passes share its sort) then a ranking
    * window; no session_window (see w3 scale note) and no self-join. */
  def keepMaxDedup(df: DataFrame, groupCols: Seq[String], tsSecCol: String,
                   dpCountCol: String, idCol: String, maxSeconds: Long,
                   isRefCol: Option[String] = None): DataFrame = {
    val keys = groupCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(tsSecCol), col(idCol))
    val newCluster = when(col("__prev").isNull ||
      col(tsSecCol) - col("__prev") > maxSeconds, 1L).otherwise(0L)
    val isRef: Column = isRefCol.map(col).getOrElse(lit(false))
    val clustered = df
      .withColumn("__prev", lag(col(tsSecCol), 1).over(wOrd))
      .withColumn("__cid", sum(newCluster).over(wOrd))
    val wPick = Window
      .partitionBy(keys :+ col("__cid"): _*)
      .orderBy(isRef.desc, col(dpCountCol).desc, col(tsSecCol).desc,
        col(idCol).desc)
    clustered
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .drop("__prev", "__cid", "__rn")
  }

  /** A4 (nnTraining2/eventLevelMetrics.py:46-88): per-event max predicted
    * probability vs the event's label, 0.5 threshold, event-level
    * confusion + TPR/FPR. The label is constant within an event, so
    * `max(label)` realises pandas' `first` deterministically. Two partial
    * aggregations, both map-side combinable; output is one row. */
  def eventLevelMetrics(df: DataFrame, eventCol: String, predCol: String,
                        labelCol: String, probThresh: Double = 0.5): DataFrame = {
    val perEvent = df.groupBy(col(eventCol))
      .agg(max(col(predCol)).as("max_predicted"),
        max(col(labelCol)).as("true_label"))
    // an event whose predictions are all null (e.g. unscored after a left
    // join) counts as predicted-NEGATIVE, matching the reference's pandas
    // (NaN >= 0.5) == False — a bare cast would leave it out of every
    // confusion cell and break tp+fp+tn+fn == n_events
    val predicted = when(col("max_predicted") >= probThresh, 1).otherwise(0)
    perEvent.agg(
      sum(when(predicted === 1 && col("true_label") === 1, 1L).otherwise(0L)).as("event_tp"),
      sum(when(predicted === 1 && col("true_label") === 0, 1L).otherwise(0L)).as("event_fp"),
      sum(when(predicted === 0 && col("true_label") === 0, 1L).otherwise(0L)).as("event_tn"),
      sum(when(predicted === 0 && col("true_label") === 1, 1L).otherwise(0L)).as("event_fn"),
      count(lit(1)).as("n_events"),
      sum(when(col("true_label") === 1, 1L).otherwise(0L)).as("n_seizure_events"),
      sum(when(col("true_label") === 0, 1L).otherwise(0L)).as("n_non_seizure_events"))
      .withColumn("event_tpr",
        when(col("event_tp") + col("event_fn") > 0,
          col("event_tp").cast("double") / (col("event_tp") + col("event_fn")))
          .otherwise(0.0))
      .withColumn("event_fpr",
        when(col("event_fp") + col("event_tn") > 0,
          col("event_fp").cast("double") / (col("event_fp") + col("event_tn")))
          .otherwise(0.0))
  }

  /** Curator consistency check — the reference's
    * `curator_tools/checkAlarmStates.py`: the event's top-level alarm
    * state must be the MOST SEVERE of its datapoints' states (written
    * because the dashboard's analysis was suspected of storing the
    * wrong one). Returns the MISMATCH rows only: (eventId, stored,
    * derived) where stored ≠ max(dp state) — an empty result is a
    * clean database. NULL-safe by design: a NULL stored state against
    * a real dp max IS a mismatch (the likeliest corruption the tool
    * hunts), and an event with no datapoints at all surfaces with a
    * NULL derived — a plain inner join + `=!=` would silently pass
    * exactly those rows. One grouping shuffle + the join back;
    * nothing row-expanding. */
  def checkAlarmStates(events: DataFrame, dps: DataFrame,
                       eventIdCol: String = "eventId",
                       storedCol: String = "osdAlarmState",
                       dpStateCol: String = "alarmState"): DataFrame = {
    val derived = dps.groupBy(col(eventIdCol))
      .agg(max(col(dpStateCol)).as("derived"))
    events.select(col(eventIdCol), col(storedCol).as("stored"))
      .join(derived, Seq(eventIdCol), "left")
      .filter(!(col("stored") <=> col("derived")))
  }

  /** Curator multi-source merge — the reference's
    * `curator_tools/merge_json.py`: union several event files where
    * the FIRST source is the reference dataset; per event id, the
    * reference's version wins, otherwise the version from the
    * earliest source that has it (deterministic — a curator merging
    * exports must never get a random winner). Sources must share a
    * schema. One union + one groupBy(id) with `min_by` on
    * (source index, row content hash) — map-side combinable, no
    * window sort; the content-hash tiebreak keeps even a DUPLICATED
    * id within one source deterministic across runs (identical-content
    * duplicates tie harmlessly — either row is the same row). Adds
    * `src_index` (which source won) to the output. */
  def mergePriority(sources: Seq[DataFrame], idCol: String): DataFrame = {
    require(sources.nonEmpty, "merge of zero sources")
    // Resolve source columns by exact name (backtick-quoted), and winner
    // fields with getField — a column literally named "a.b" must not be
    // parsed as nested-path access anywhere in this plan.
    def q(c: String) = col("`" + c.replace("`", "``") + "`")
    val tagged = sources.zipWithIndex.map { case (df, i) =>
      df.select(q(idCol), struct(lit(i).as("__src"),
        struct(df.columns.map(c => q(c).as(c)): _*).as("__row")).as("__cand"))
    }.reduce(_ unionByName _)
    val won = tagged.groupBy(q(idCol))
      .agg(min_by(col("__cand"),
        struct(col("__cand").getField("__src"),
          xxhash64(col("__cand").getField("__row"))))
        .as("__w"))
    // Emit columns in sources.head order — idCol stays in its original
    // position instead of migrating to the end — with src_index appended
    // last so existing consumers of the source schema see it unchanged.
    val out = sources.head.columns.map { c =>
      if (c == idCol) q(idCol)
      else col("__w").getField("__row").getField(c).as(c)
    } :+ col("__w").getField("__src").as("src_index")
    won.select(out: _*)
  }
}
