package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.catalyst.util.{FailureSafeParser, PermissiveMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side JSON → InternalRow parsing for the Web API connector
  * ([[graft.sources.WebApi]]) — the SAME Jackson parser the built-in
  * json datasource runs, so a payload fetched from the API parses with
  * bit-identical semantics to the S1/S2 file readers (PERMISSIVE mode,
  * bad payloads become all-null rows instead of failing the task,
  * mirroring the reference's tolerated decode-error events).
  *
  * Lives under `org.apache.spark.sql` because JacksonParser /
  * JSONOptions / FailureSafeParser are `private[sql]` — the same
  * arrangement as [[expressions]]. Serializable carrier; the parser
  * itself is built lazily per executor.
  *
  * `allowArrayAsStructs = true`: a top-level JSON ARRAY (the API's
  * listing shape) yields one row per element, exactly like the
  * multiLine S1 reader.
  */
class JsonRowParser(schema: StructType, timeZoneId: String) extends Serializable {

  @transient private lazy val safeParser: FailureSafeParser[String] = {
    val raw = new JacksonParser(
      schema,
      new JSONOptions(Map.empty[String, String], timeZoneId, "_corrupt_record"),
      allowArrayAsStructs = true,
      Nil)
    new FailureSafeParser[String](
      (input: String) =>
        raw.parse(input, CreateJacksonParser.string, UTF8String.fromString),
      PermissiveMode, schema, "_corrupt_record")
  }

  def parse(json: String): Iterator[InternalRow] = safeParser.parse(json)
}
