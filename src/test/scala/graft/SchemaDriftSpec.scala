package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.TimestampType

/** Guards [[Tables.normalizeTs]] against testdata schema drift.
  *
  * The driver has regenerated `events.parquet` at least once, flipping the
  * physical `ts` type from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
  * and silently breaking every events-based query (round-8 verdict). Two
  * committed golden fixtures with identical logical rows — one per
  * rendition — pin the loader's contract: whatever physical schema the
  * lake serves, `Tables.events` yields the same session-UTC TimestampType
  * column with the same values. A future regen (or a third rendition)
  * fails HERE, loudly, instead of zeroing the correctness registry.
  */
class SchemaDriftSpec extends SparkSpec {
  private def fixture(name: String): String =
    getClass.getResource(s"/schemadrift/$name/events.parquet").getPath
      .stripSuffix("/events.parquet")

  private def loadRows(dir: String): (org.apache.spark.sql.types.DataType, Seq[Row]) = {
    val df = Tables.events(spark, dir)
    (df.schema("ts").dataType,
      df.selectExpr("event_id", "unix_micros(ts)", "user_id", "event_type",
        "value", "props").orderBy("event_id").collect().toSeq)
  }

  test("nanos-long and micros-timestamp renditions load identically") {
    val (tNanos, rNanos)   = loadRows(fixture("nanos"))
    val (tMicros, rMicros) = loadRows(fixture("micros"))
    assert(tNanos == TimestampType && tMicros == TimestampType)
    assert(rNanos == rMicros,
      s"renditions diverged:\nnanos=$rNanos\nmicros=$rMicros")
    // sub-microsecond tail in the nanos fixture must truncate, not round
    assert(rNanos.head.getLong(1) == 1704067798778549L)
  }

  test("micros rendition normalises under NTZ inference too (conf-independent)") {
    // Sessions without inferTimestampNTZ.enabled=false read TIMESTAMP(MICROS)
    // as TIMESTAMP_NTZ; normalizeTs must still deliver TimestampType with
    // the same instants (session TZ is UTC, so the cast is value-preserving).
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "true")
      val (t, rows) = loadRows(fixture("micros"))
      assert(t == TimestampType)
      assert(rows.head.getLong(1) == 1704067798778549L)
    } finally spark.conf.set(key, prev)
  }
}
