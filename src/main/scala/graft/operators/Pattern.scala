package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-pattern detection (CEP's MATCH_RECOGNIZE core, which Spark
  * has no builtin for): find every occurrence of a fixed label sequence
  * per key, with the whole match inside a time bound — "view, view,
  * purchase within 10 minutes", "WARN, WARN, ALARM within 30 s". The
  * reference's per-datapoint FSM (W10) answers this for ONE hardcoded
  * alarm pattern inside the algorithm; this is the corpus-level query
  * form over any labelled event table.
  *
  * Shape: one hash shuffle on the key, then a LEAD chain inside a
  * single window frame — for a length-L pattern, L−1 leads of the label
  * and one lead of the timestamp, all sharing one sort, entirely
  * codegen window evaluation. No self-joins (the naive L-way join
  * shuffles the table L times), no per-key collect. Matches may
  * OVERLAP (a row can start a match and sit inside another — the
  * MATCH_RECOGNIZE AFTER MATCH SKIP TO NEXT ROW semantics); ties on
  * equal timestamps break by the caller's `tieCol` so the sequence is
  * total and both engines agree.
  *
  * @return one row per match: (key, match_start ts, match_end ts).
  */
object Pattern {

  def sequencePattern(events: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, labelCol: String,
                      pattern: Seq[String], withinSec: Long): DataFrame = {
    require(pattern.nonEmpty, "pattern must have at least one label")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val labelAt: Int => Column = i =>
      if (i == 0) col(labelCol) else lead(col(labelCol), i).over(w)
    val matches = pattern.zipWithIndex
      .map { case (lbl, i) => labelAt(i) === lit(lbl) }
      .reduce(_ && _)
    val endTs = if (pattern.size == 1) col(tsCol)
      else lead(col(tsCol), pattern.size - 1).over(w)
    events
      .withColumn("__end", endTs)
      .withColumn("__hit", matches &&
        unix_micros(col("__end")) - unix_micros(col(tsCol))
          <= withinSec * 1000000L)
      .filter(col("__hit"))
      .select(col(keyCol), col(tsCol).as("match_start"),
        col("__end").as("match_end"))
  }
}
