package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F5/F6: the reference's include/exclude composite event filter
  * (libosd/osdDbConnection.py:405-587) compiled to ONE Column predicate:
  *
  *   keep = (matches ANY include criterion, or no includes given)
  *          AND NOT (matches ANY exclude criterion)
  *          AND all require-flags
  *          AND id not in the invalid list (F4)
  *
  * Match semantics (F6, elementMatches osdDbConnection.py:540-587):
  * case-insensitive *substring* for strings, equality for numbers; an
  * empty/None value list matches everything.
  *
  * One predicate ⇒ one scan, fully pushed into the parquet reader where
  * fields allow — the reference makes four passes over the event list.
  */
case class EventFilterConfig(
    includeUserIds: Seq[String] = Nil,
    includeTypes: Seq[String] = Nil,
    includeSubTypes: Seq[String] = Nil,
    includeDataSources: Seq[String] = Nil,
    includeText: Seq[String] = Nil,       // searched in desc
    excludeUserIds: Seq[String] = Nil,
    excludeTypes: Seq[String] = Nil,
    excludeSubTypes: Seq[String] = Nil,
    excludeDataSources: Seq[String] = Nil,
    excludeText: Seq[String] = Nil,
    require3dData: Boolean = false,
    requireHrData: Boolean = false,
    requireO2SatData: Boolean = false,
    invalidIds: Seq[String] = Nil)

object EventFilters {

  /** F6 element-match primitive (osdDbConnection.py:540-587):
    * case-insensitive *substring* match, any-of across the value list.
    * Criteria are stripped first (str(val).strip().lower() in the
    * reference), so stray whitespace in config lists cannot diverge. */
  private def substrAny(c: Column, vals: Seq[String]): Option[Column] =
    if (vals.isEmpty) None
    else Some(vals.map(v => lower(c).contains(v.trim.toLowerCase)).reduce(_ || _))

  /** F6 for numeric-typed event fields (userId): the reference compares
    * non-string element values with ==, so includeUserIds = Seq("1")
    * must NOT match user "12" — and the comparison is NUMERIC, so "01"
    * matches user 1 exactly as Python's int == would. A non-numeric
    * criterion against the (string-coerced) column falls back to
    * substring, the str-vs-str branch of elementMatches. */
  private def numAny(c: Column, vals: Seq[String]): Option[Column] =
    if (vals.isEmpty) None
    else Some(vals.map { raw =>
      val v = raw.trim
      // numeric equality only where the value is safely a long — longer
      // digit strings fall back to the string branch
      if (v.nonEmpty && v.length <= 18 && v.forall(_.isDigit))
        c.cast("long") === lit(v.toLong)
      else lower(c).contains(v.toLowerCase)
    }.reduce(_ || _))

  private def orAll(preds: Seq[Option[Column]]): Option[Column] =
    preds.flatten.reduceOption(_ || _)

  def compile(cfg: EventFilterConfig): Column = {
    val include = orAll(Seq(
      numAny(col("userId").cast("string"), cfg.includeUserIds),
      substrAny(col("type"), cfg.includeTypes),
      substrAny(col("subType"), cfg.includeSubTypes),
      substrAny(col("dataSourceName"), cfg.includeDataSources),
      substrAny(col("desc"), cfg.includeText)))
    val exclude = orAll(Seq(
      numAny(col("userId").cast("string"), cfg.excludeUserIds),
      substrAny(col("type"), cfg.excludeTypes),
      substrAny(col("subType"), cfg.excludeSubTypes),
      substrAny(col("dataSourceName"), cfg.excludeDataSources),
      substrAny(col("desc"), cfg.excludeText)))

    var pred = include.getOrElse(lit(true))
    exclude.foreach(e => pred = pred && !coalesce(e, lit(false)))
    if (cfg.require3dData) pred = pred && col("has3dData")
    if (cfg.requireHrData) pred = pred && col("hasHrData")
    if (cfg.requireO2SatData) pred = pred && col("hasO2SatData")
    if (cfg.invalidIds.nonEmpty)
      pred = pred && !col("id").cast("string").isin(cfg.invalidIds: _*)
    pred
  }
}
