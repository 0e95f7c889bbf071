package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Osdb
import graft.operators.Tidy

/** Sources and sinks for the OSDB JSON database files (SURVEY §2.1).
  *
  *   S1  multi-line JSON array category files → explicit-schema read
  *   S2  NDJSON streaming variant → same reader, multiLine=false
  *   U3  multi-file union → pass several paths, one scan
  *   S8  JSON sink
  *   S9  per-event index CSV (fixed columns, time-ordered)
  *   S10 flattened per-datapoint CSV (see Flatten.flattenedWide)
  *
  * The explicit schema matters doubly at scale: schema inference over
  * 100 TB of JSON would be a full extra pass, and the permissive mode
  * tolerates the reference's decode-error events (tidy_db.py:77-79).
  */
object OsdbJson {

  /** S1/S2/U3: read one or more category files; category taken from the
    * file name (the reference keeps one JSON array per category).
    *
    * SPLITTABILITY: a `multiLine` ARRAY file is NOT splittable — the
    * whole file parses as ONE task. Fine for the reference's four
    * category files; a footgun for a big array-file lake (one 1 TB
    * array = one task). Bulk data belongs in NDJSON (line-splittable)
    * or parquet — the array encoding is an ingest format, not a
    * storage format. */
  def readEvents(spark: SparkSession, paths: Seq[String],
                 multiLine: Boolean = true, tidy: Boolean = true): DataFrame = {
    val raw = spark.read
      .option("multiLine", multiLine)
      .option("mode", "PERMISSIVE")
      .schema(Osdb.eventSchema)
      .json(paths: _*)
      .withColumn("category",
        regexp_extract(input_file_name(), "([^/]+)\\.json", 1))
    if (tidy) Tidy(raw) else raw
  }

  /** S2-robustness: NDJSON read with corrupt-record QUARANTINE. The
    * plain [[readEvents]] PERMISSIVE mode silently turns an unparseable
    * line into an all-null row — fine for the reference's occasional
    * decode-error event (tidy_db.py:77-79), wrong for a 100 TB ingest
    * where "how many lines were garbage, and which" is an SLO. This
    * variant adds Spark's `columnNameOfCorruptRecord` column to the
    * explicit schema: good lines parse normally (corrupt column null),
    * bad lines land with every schema field null and the RAW LINE
    * preserved in `_corrupt_record` for a quarantine sink — counting,
    * sampling, and replaying garbage becomes a plain filter instead of
    * a re-read. (Spark disallows plans referencing ONLY the corrupt
    * column; any real use — counts alongside data fields, quarantine
    * writes of the full row — is fine, e.g. the s14 entry.) */
  def readEventsQuarantined(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", false)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(org.apache.spark.sql.types.StructType(Osdb.eventSchema.fields :+
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType)))
      .json(path)

  /** S8: JSON sink (category-partitioned — the lake layout replacing
    * one-file-per-category). */
  def writeEventsJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("category").json(path)

  /** Columnar lake sink: category-partitioned parquet — the engine's
    * canonical storage (SURVEY §1.3). */
  def writeEventsParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("category").parquet(path)

  /** S6: upsert into the event lake — INSERT OR REPLACE by key, the
    * SQLite staging store's write semantics (osdb_sqlite.py) without the
    * single-node store: rows in `updates` replace same-key rows in
    * `existing`; new keys append. One shuffle on the key, no driver
    * loop. On a transactional table format this becomes MERGE INTO — the
    * ranking union is the plain-parquet-lake equivalent.
    *
    * Total order: updates beat existing (`__src`), and among same-key
    * rows on the same side a whole-row hash breaks the tie — so a
    * key-duplicated `updates` frame picks the SAME winner on every run
    * and under any repartitioning, instead of whichever row the shuffle
    * happened to deliver first. (Bit-identical duplicate rows still tie,
    * harmlessly: either is the same row.) */
  def upsertEvents(existing: DataFrame, updates: DataFrame,
                   keyCol: String = "id"): DataFrame = {
    val unioned = existing.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)),
        allowMissingColumns = true)
    val rowCols = unioned.columns.filter(_ != "__src").map(col).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("__src").desc, col("__tie").asc)
    unioned
      .withColumn("__tie", xxhash64(rowCols: _*))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__tie", "__rn")
  }

  /** S9: the event-index CSV — fixed column list, ordered by dataTime,
    * everything quoted like the reference's non-numeric quoting. */
  val IndexColumns: Seq[String] = Seq(
    "id", "userId", "dataTime", "type", "subType", "osdAlarmState",
    "has3dData", "hasHrData", "hasO2SatData", "desc")

  def writeIndexCsv(df: DataFrame, path: String): Unit =
    df.select(IndexColumns.map(col): _*)
      .orderBy("dataTime")
      .write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .csv(path)
}
