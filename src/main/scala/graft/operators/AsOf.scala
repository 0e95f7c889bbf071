package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, attach the single
  * most recent right row with `right.ts <= left.ts` on the same key,
  * optionally rejecting matches staler than a tolerance. The operator
  * Spark's join family lacks: an equi+inequality join that must return
  * exactly ONE right row per left row (the argmax over the inequality),
  * not every row satisfying the predicate.
  *
  * Implementation is the scalable union+window form, NOT a join:
  * both sides are tagged and unioned (right rows carry their payload
  * packed in one struct, null on left rows), the union is
  * hash-partitioned by key and sorted by `(ts, side, tie)` once, and a
  * running `last(struct, ignoreNulls)` over
  * `rowsBetween(unboundedPreceding, currentRow)` gives every left row
  * the latest preceding right struct in the same pass. Left rows are
  * then kept and the struct unpacked.
  *
  * Why this shape at 100 TB: the naive formulation
  * (`l JOIN r ON key AND r.ts <= l.ts`, then argmax per left row — the
  * shape the DuckDB oracle uses) materializes every (left, right)
  * candidate pair, which is O(|L|·|R|) per key per tolerance window and
  * explodes exactly when keys are active. The union+window form
  * shuffles |L|+|R| slim rows ONCE on the key, no pair blowup, and the
  * per-key sort is the only super-linear term. Ties are fully
  * deterministic: at equal `ts` the right row wins (inclusive `<=`
  * semantics), and equal-`ts` right rows resolve to the largest `tie`
  * value — the same total order the oracle's
  * `ORDER BY r.ts DESC, r.event_id DESC` states.
  *
  * Hot-key refinement (not needed at test scale, documented for the
  * 1000-executor case): when one key's row count exceeds a partition,
  * sub-bucket the key by coarse time range and replicate each bucket's
  * last right row into the next bucket as a boundary carry — the same
  * two-level split [[graft.operators.Pack]] uses for its prefix sum.
  *
  * Reference trigger: the reference associates sensor datapoints to
  * events by time proximity — NN training selects datapoints in a
  * fixed window around each event's time
  * (`documentation/ResultsSummary.md:55-70`, the −20..+40 s selection)
  * and curation picks representative rows per (user, type, 3-min
  * bucket) (`curator_tools/makeOsdDb.py:181-186`). Those symmetric
  * windows are range joins (j6/f8's class); the as-of variant here is
  * the beyond-reference generalization a training-data pipeline needs
  * when "the latest reading AT the alarm instant" must be exact and
  * one-to-one — the same latest-prior semantics pandas' `merge_asof`
  * serves single-node.
  */
object AsOf {

  /** As-of join `left` ← latest-prior-`right` per `keys`.
    *
    * @param left        probe side; all its columns pass through.
    * @param right       reference side; only `keys`, `tsCol`, `tieCol`
    *                    and `payloadCols` are read.
    * @param keys        equi-join key columns (present on both sides).
    * @param tsCol       event-time column name (present on both sides;
    *                    TimestampType — the tolerance math routes
    *                    through `unix_micros`).
    * @param tieCol      right-side unique id breaking equal-`ts` ties
    *                    (largest wins — "latest written").
    * @param payloadCols right-side columns to attach.
    * @param toleranceUs match only if `left.ts - right.ts` ≤ this many
    *                    microseconds (inclusive); older matches null out.
    * @return `left`'s columns plus `asof_<tsCol>`, `asof_<tieCol>` and
    *         `asof_<payload>` for each payload column — all null when
    *         no right row qualifies.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      payloadCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    val reserved = Seq("__asof_m", "__asof_side")
    require(left.columns.intersect(reserved).isEmpty &&
      right.columns.intersect(reserved).isEmpty,
      s"column names $reserved are reserved by asOfJoin")
    require(payloadCols.intersect(Seq("ts", "tie")).isEmpty,
      "payloadCols named 'ts' or 'tie' collide with the match struct's slots")

    // Right rows: key + ts + the whole match packed in ONE struct, so a
    // single ignoreNulls `last` carries (ts, tie, payload...) atomically
    // — per-column `last`s could mix fields from different right rows
    // when a payload value is legitimately null.
    val matchStruct = struct(
      (col(tsCol).as("ts") +: col(tieCol).as("tie") +:
        payloadCols.map(col)): _*)
    val rightSel = right.select(
      (keys.map(col) :+ col(tsCol) :+ matchStruct.as("__asof_m")): _*)
      .withColumn("__asof_side", lit(1))
    // unionByName(allowMissingColumns): left's passthrough columns are
    // null on right rows, the match struct is null on left rows.
    val unioned = left.withColumn("__asof_side", lit(0))
      .unionByName(rightSel, allowMissingColumns = true)

    // One hash partitioning on the key; ROWS frame so each left row sees
    // every right row sorting at-or-before it. Order: ts asc, right rows
    // before left rows at equal ts (inclusive <=), equal-ts right rows
    // ascending by tie so `last` picks the largest.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__asof_side").desc,
        col("__asof_m").getField("tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof_m", last(col("__asof_m"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 0)

    val fresh = toleranceUs match {
      case Some(tol) => when(
        unix_micros(col(tsCol)) -
          unix_micros(col("__asof_m").getField("ts")) <= tol,
        col("__asof_m"))
      case None => col("__asof_m")
    }
    val withFresh = matched.withColumn("__asof_m", fresh)
    val outCols = left.columns.map(col).toSeq ++
      ((tsCol, "ts") +: (tieCol, "tie") +: payloadCols.map(p => (p, p))).map {
        case (outName, field) =>
          col("__asof_m").getField(field).as(s"asof_$outName")
      }
    withFresh.select(outCols: _*)
  }
}
