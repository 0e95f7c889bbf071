package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-hoc results analysis — the reference's
  * `user_tools/nnTraining2/analyzeEventResults.py` as relational
  * rollups over an event-level results frame (eventId, userId, label
  * 0/1, prediction 0/1, subType):
  *
  *   - `analyze_by_user` (:123-209): per-user TPR over seizures and
  *     FAR over non-seizures, with SPARSE users folded into an 'Other'
  *     group (fewer than `seizureThreshold` seizures / `farThreshold`
  *     non-seizures) and null users as 'Unknown' — grouping BEFORE
  *     thresholding would leak tiny cohorts into the table, which is
  *     exactly what the tool exists to prevent;
  *   - `analyze_by_seizure_type` (:209-255): per-subType TPR over
  *     seizures (null subtypes dropped, the tool's `pd.notna` filter)
  *     plus the combined Tonic-Clonic/Combined row (case-insensitive
  *     substring match, the tool's regex).
  *
  * One output frame, `side` discriminated: `user_tpr`, `user_far`,
  * `subtype_tpr`, `tc_combined`. Every rate is ONE integer division
  * (hits / group size — note fp/(fp+tn) == predicted-positive /
  * group-size on the non-seizure slice, same shape as TPR), so the
  * doubles are bit-identical cross-engine and the rpt5 oracle compares
  * them raw.
  *
  * Scale shape: two aggregations per side (per-user counts, then the
  * grouped rollup), both map-side combinable; the per-user count joins
  * back by user key — at 100 TB of results that is one shuffle keyed
  * by userId and one by the group label, nothing row-expanding. */
object ResultsAnalysis {

  /** The reference's TC-row pattern (`Tonic-Clonic|Combined`,
    * case-insensitive). Fixture-shaped corpora can pass their own
    * substrings; the DEFAULT is the tool's. */
  val TcPatterns: Seq[String] = Seq("tonic-clonic", "combined")

  def analyze(results: DataFrame,
              seizureThreshold: Long = 3,
              farThreshold: Long = 100,
              tcPatterns: Seq[String] = TcPatterns): DataFrame = {
    require(tcPatterns.nonEmpty, "need at least one TC pattern")

    def userSide(label: Int, thresh: Long, sideName: String): DataFrame = {
      val sub = results.filter(col("label") === label)
      val counts = sub.groupBy(col("userId"))
        .agg(count(lit(1)).as("__n"))
      sub.join(counts, Seq("userId"), "left")
        .withColumn("grp",
          when(col("userId").isNull, "Unknown")
            .when(col("__n") < thresh, "Other")
            .otherwise(col("userId").cast("string")))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("prediction") === 1, 1L).otherwise(0L)).as("n_pred_pos"),
          sum(when(col("prediction") === 0, 1L).otherwise(0L)).as("n_pred_neg"))
        .select(lit(sideName).as("side"), col("grp"),
          col("n_events"), col("n_pred_pos"), col("n_pred_neg"),
          (col("n_pred_pos").cast("double") / col("n_events")).as("rate"))
    }

    val seizures = results.filter(col("label") === 1)

    val bySubtype = seizures.filter(col("subType").isNotNull)
      .groupBy(col("subType"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("prediction") === 1, 1L).otherwise(0L)).as("n_pred_pos"),
        sum(when(col("prediction") === 0, 1L).otherwise(0L)).as("n_pred_neg"))
      .select(lit("subtype_tpr").as("side"), col("subType").as("grp"),
        col("n_events"), col("n_pred_pos"), col("n_pred_neg"),
        (col("n_pred_pos").cast("double") / col("n_events")).as("rate"))

    val isTc: Column = tcPatterns
      .map(p => lower(coalesce(col("subType"), lit(""))).contains(p))
      .reduce(_ || _)
    // a GLOBAL agg emits its one row even on an empty TC slice — the
    // explicit zero row the tool prints; null sums coalesce to 0 and
    // the rate guards the zero count (the tool's `if (tp+fn) > 0`)
    val tcRow = seizures.filter(isTc)
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("prediction") === 1, 1L).otherwise(0L)).as("n_pred_pos"),
        sum(when(col("prediction") === 0, 1L).otherwise(0L)).as("n_pred_neg"))
      .select(lit("tc_combined").as("side"), lit("tc_combined").as("grp"),
        col("n_events"),
        coalesce(col("n_pred_pos"), lit(0L)).as("n_pred_pos"),
        coalesce(col("n_pred_neg"), lit(0L)).as("n_pred_neg"),
        when(col("n_events") > 0,
          coalesce(col("n_pred_pos"), lit(0L)).cast("double") /
            col("n_events"))
          .otherwise(0.0).as("rate"))

    userSide(1, seizureThreshold, "user_tpr")
      .unionByName(userSide(0, farThreshold, "user_far"))
      .unionByName(bySubtype)
      .unionByName(tcRow)
  }
}
