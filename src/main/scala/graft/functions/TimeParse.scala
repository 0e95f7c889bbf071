package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-format timestamp parsing (SURVEY §2.8 C1-C3).
  *
  * The reference parses dataTime strings through a list of legacy formats
  * with day-first ambiguity (nnTraining2/flattenData.py:30-74,
  * osdb_sqlite.py:44-122 normalize_datetime). Spark-side this is a single
  * coalesce chain of try_to_timestamp — codegen-friendly, no UDF — that
  * tries the most specific formats first so "dd-MM-yyyy" never swallows
  * an ISO string.
  */
object TimeParse {

  /** Format list, ordered most-specific-first (mirrors the reference's
    * format ladder; day-first forms come after ISO forms). */
  val Formats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "dd-MM-yyyy HH:mm:ss",          // legacy day-first (fixture format)
    "dd/MM/yyyy HH:mm:ss",
    "yyyy-MM-dd")

  /** String column → TimestampType via the format ladder; null when no
    * format matches (the reference logs-and-skips unparseable rows). */
  def parseOsdbTime(c: Column): Column =
    coalesce(Formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** C1 dateStr2secs (libosd/dpTools.py:6-11): epoch seconds. */
  def dateStr2secs(c: Column): Column = parseOsdbTime(c).cast("long")
}
