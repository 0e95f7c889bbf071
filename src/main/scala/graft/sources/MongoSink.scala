package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S7: the MongoDB mirror sink (SURVEY §2.1), re-expressed without a
  * driver-side `insert_many` loop or a connector jar.
  *
  * The reference inserts event dicts verbatim into `OSDB.events`
  * (user_tools/mongodb/importOsdb.py:38-53) — the documents ARE the
  * event JSON, plus MongoDB's `_id` convention. The Spark-first
  * equivalent is a distributed write of mongoimport-compatible
  * MongoDB Extended JSON (relaxed mode) NDJSON:
  *
  *   - the event key column becomes `_id` (what `insert_many` would
  *     otherwise auto-assign an ObjectId for; the reference relies on
  *     event ids being the natural key everywhere else);
  *   - designated timestamp columns are wrapped as `{"$date":
  *     "ISO-8601Z"}` so mongoimport materializes real BSON dates
  *     instead of strings (relaxed Extended JSON per the public BSON
  *     spec); everything else serializes as plain JSON, which relaxed
  *     mode defines as the correct rendition for doubles/longs/strings
  *     and which matches the reference's verbatim-dict inserts;
  *   - absent keys are OMITTED, not null-valued — `to_json` drops null
  *     fields by default, mirroring the reference's documented
  *     "any key may be absent" model (Data_Structure.md:114).
  *
  * Each partition writes its own file, so a 1000-executor run emits the
  * lake in parallel and `mongoimport --numInsertionWorkers` (or a
  * connector on a real cluster) loads files concurrently — the
  * single-connection insert_many loop is the part that cannot survive
  * 100 TB, and it is exactly the part replaced here.
  *
  * [[readEventsMongoJson]] is the inverse (the `listEvents.py` read
  * direction): same NDJSON, `_id` restored to the key column, `$date`
  * wrappers parsed back to session-UTC timestamps — so a lake exported
  * FROM MongoDB round-trips through the engine unchanged.
  */
object MongoSink {

  /** BSON dates are int64 MILLIS by spec — sub-millisecond digits do not
    * survive any MongoDB sink, so the wire format carries exactly three
    * fractional digits. Engine timestamps are micros; a consumer needing
    * them keeps the original column alongside. */
  private val IsoFmt = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  /** date_format renders in the SESSION timezone while the wire suffix
    * is a literal 'Z' — shift through to_utc_timestamp(sessionTz) so the
    * rendered wall time really is UTC in ANY session zone (and invert
    * with from_utc_timestamp on read). In the default UTC sessions both
    * shifts are identity. */
  private def sessionTz(df: DataFrame): String =
    df.sparkSession.sessionState.conf.sessionLocalTimeZone

  /** Write `df` as mongoimport-ready Extended JSON NDJSON under `path`.
    *
    * @param idCol    column renamed to MongoDB's `_id`
    * @param dateCols TimestampType columns to wrap as `{"$date": ...}`
    */
  def writeEventsMongoJson(df: DataFrame, path: String, idCol: String = "id",
                           dateCols: Seq[String] = Seq.empty): Unit = {
    require(df.columns.contains(idCol), s"id column '$idCol' not in frame")
    val tz = sessionTz(df)
    val dated = dateCols.foldLeft(df) { (d, c) =>
      // guard: a null date must stay null (absent key), not become "{}"
      d.withColumn(c, when(col(c).isNotNull,
        struct(date_format(
          to_utc_timestamp(col(c).cast("timestamp"), tz), IsoFmt)
          .as("$date"))))
    }
    val rest = dated.columns.filter(_ != idCol).map(col).toSeq
    dated
      .select(to_json(struct((col(idCol).as("_id") +: rest): _*)).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** Read an Extended JSON event lake back into the engine's shape.
    *
    * @param schema the TARGET schema (with `idCol` under its engine name
    *               and `dateCols` as TimestampType); the reader derives
    *               the wire schema from it, so no inference pass runs.
    */
  def readEventsMongoJson(spark: SparkSession, path: String,
                          schema: StructType, idCol: String = "id",
                          dateCols: Seq[String] = Seq.empty): DataFrame = {
    val wire = StructType(schema.fields.map { f =>
      if (f.name == idCol) StructField("_id", f.dataType)
      else if (dateCols.contains(f.name))
        StructField(f.name, StructType(Seq(StructField("$date", StringType))))
      else f
    })
    val raw = spark.read.schema(wire).option("multiLine", false).json(path)
    val tz = sessionTz(raw)
    val unwrapped = dateCols.foldLeft(raw) { (d, c) =>
      d.withColumn(c, from_utc_timestamp(
        to_timestamp(col(c).getField("$date"), IsoFmt), tz))
    }
    unwrapped.withColumnRenamed("_id", idCol)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }
}
