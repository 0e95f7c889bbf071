package graft.sources

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.graft.JsonRowParser
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNull}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.Osdb

/** S4: the reference's Web API event source
  * (libosd/webApiConnection.py:86-149,221-227,320-358) as a Spark
  * DataSourceV2 — `spark.read.format("osdb-api")`.
  *
  * The reference fetches everything through the DRIVER process: the
  * events listing, then one datapoints request per event, serially.
  * Re-expressed Spark-first, only the bounded listing (≤ maxEvents ids,
  * the reference's own cap) is fetched at PLANNING time; the expensive
  * per-event datapoint fetches are distributed across the cluster —
  * each input partition carries a batch of listed events and its reader
  * fetches + splices that batch's datapoints on an executor. At 10k
  * events and 1000 executors the wall-clock is the slowest batch, not
  * the sum.
  *
  * Operator pushdown reaches the WIRE, not just the scan:
  *   - `userId = N` / `type IS NULL` filters become the reference's own
  *     query params (`events/?user=N`, `?type__isnull=true`) — the
  *     server prunes, nothing unfetched ever crosses the network;
  *   - LIMIT folds into the listing cap (O7 `maxEvents`, truncated at
  *     planning — no page is fetched past it);
  *   - column pruning reaches the READER: if `datapoints` is not in the
  *     required schema the per-event fetches are skipped entirely (the
  *     dominant cost), and the Jackson parser materializes only the
  *     requested fields.
  *
  * Transport is pluggable (`transport` option): `http` is a real
  * java.net.http client (token auth header, the reference's auth
  * shape); `file` replays a local JSON cache directory — the
  * reference's own `download=False` cache mode
  * (webApiConnection.py:95-97, loadEventsCache) — which also makes the
  * connector fully testable in an egress-free environment; any
  * fully-qualified class name implementing [[ApiTransport]] with a
  * `(Map[String, String])` constructor plugs in custom auth/retry.
  */
object WebApi {

  /** URL → cache-file key, shared by the file transport and whatever
    * writes the cache (sanitized exactly the same way on both sides). */
  def cacheKey(url: String): String =
    url.replaceFirst("^https?://", "")
      .replaceAll("[^A-Za-z0-9._-]", "_") + ".json"

  /** Programmatic entry mirroring the reference's getEvents(userId,
    * includeDatapoints): options + format in one call. */
  def readEvents(spark: org.apache.spark.sql.SparkSession,
                 options: Map[String, String]): org.apache.spark.sql.DataFrame =
    spark.read.format("osdb-api").options(options).load()
}

/** Pluggable fetch layer. Implementations must be constructible from
  * the (case-insensitive, lower-cased keys) option map and be
  * serializable: the same instance recipe runs on the driver (listing)
  * and executors (datapoints). */
trait ApiTransport extends Serializable {
  def get(url: String): String
}

object ApiTransport {
  def create(options: Map[String, String]): ApiTransport =
    options.getOrElse("transport", "http") match {
      case "http" => new JdkHttpTransport(options)
      case "file" => new FileTransport(options)
      case fqcn =>
        Class.forName(fqcn)
          .getDeclaredConstructor(classOf[Map[String, String]])
          .newInstance(options)
          .asInstanceOf[ApiTransport]
    }
}

/** Real HTTP transport: JDK client, optional `authToken` sent as the
  * reference's DRF token header. (Unexercised in the egress-free test
  * environment; the plumbing around it is covered through [[FileTransport]].) */
final class JdkHttpTransport(options: Map[String, String]) extends ApiTransport {
  @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
  override def get(url: String): String = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET()
    options.get("authtoken").foreach(t => b.header("Authorization", s"Token $t"))
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"GET $url -> HTTP ${resp.statusCode()}")
    resp.body()
  }
}

/** The reference's local JSON cache replay (`download=False`):
  * `fixtureDir/<cacheKey(url)>`. A missing file is a loud error — a
  * silent empty listing would look like an empty database. */
final class FileTransport(options: Map[String, String]) extends ApiTransport {
  private val dir = options.getOrElse("fixturedir",
    throw new IllegalArgumentException("file transport requires fixtureDir"))
  override def get(url: String): String = {
    val f = new java.io.File(dir, WebApi.cacheKey(url))
    if (!f.isFile) throw new java.io.FileNotFoundException(
      s"no cached payload for $url (expected ${f.getAbsolutePath})")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }
}

class OsdbApiSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "osdb-api"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Osdb.eventSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OsdbApiTable(schema, properties.asScala.toMap.map {
      case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v
    })
}

class OsdbApiTable(schema: StructType, options: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String =
    s"osdb-api(${options.getOrElse("baseurl", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new OsdbApiScanBuilder(schema, options)
}

class OsdbApiScanBuilder(fullSchema: StructType, options: Map[String, String])
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownLimit with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var userParam: Option[String] = None
  private var typeIsNull: Boolean = false
  private var cap: Int = options.get("maxevents").map(_.toInt).getOrElse(10000)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("userId", v: String) => userParam = Some(v); true
      case IsNull("type")               => typeIsNull = true; true
      case _                            => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(limit: Int): Boolean = {
    cap = math.min(cap, limit)
    true // the listing truncates at the cap: fully applied at the source
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new OsdbApiScan(required, options, userParam, typeIsNull, cap)
}

class OsdbApiScan(requiredSchema: StructType, options: Map[String, String],
                  userParam: Option[String], typeIsNull: Boolean, cap: Int)
  extends Scan with Batch {

  private val baseUrl = options.getOrElse("baseurl",
    throw new IllegalArgumentException("osdb-api requires baseUrl"))

  private def listingUrl: String = {
    val params = userParam.map(u => s"user=$u").toSeq ++
      (if (typeIsNull) Seq("type__isnull=true") else Nil)
    s"$baseUrl/events/" + (if (params.isEmpty) "" else params.mkString("?", "&", ""))
  }

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"osdb-api listing=$listingUrl cap=$cap cols=${requiredSchema.fieldNames.mkString(",")}"

  /** The listing fetch: metadata-scale (≤ cap events, no datapoints),
    * exactly what the reference's getEvents() pulls to its driver — the
    * heavy per-event payloads stay on the executors. Accepts three
    * listing shapes: the DRF-paginated object
    * `{"count": N, "next": url|null, "results": [...]}` — pages are
    * FOLLOWED via their `next` links until exhausted or the cap is
    * reached (never a fetch past the cap; the reference client fetches
    * one response and iterates it — webApiConnection.py:104-117 — with
    * its commented-out main showing the DRF `results` envelope,
    * webApiConnection.py:399 — so a multi-page database silently
    * truncates there; following `next` is the complete-listing shape),
    * a plain JSON array, and an NDJSON cache file. */
  override def planInputPartitions(): Array[InputPartition] = {
    val transport = ApiTransport.create(options)
    val payload = transport.get(listingUrl)
    val mapper = new ObjectMapper()
    val trimmed = payload.trim
    // the DRF envelope vs a single-object NDJSON first line: only a
    // top-level object WITH a results array is a page (readTree parses
    // the first complete JSON value and ignores any NDJSON tail)
    def isDrfPage(s: String): Boolean = s.startsWith("{") && {
      try {
        val n = mapper.readTree(s)
        n.has("results") && n.get("results").isArray
      } catch {
        case _: com.fasterxml.jackson.core.JacksonException => false
      }
    }
    val events: Seq[String] =
      if (isDrfPage(trimmed)) {
        val buf = mutable.ArrayBuffer.empty[String]
        // bounded follow: a cycling `next` link or an endless chain of
        // empty-results pages (broken proxy, buggy server) must fail
        // loudly, not hang planning forever. Every useful page carries
        // >= 1 event, so 2*cap + 64 pages is beyond any legitimate
        // chain that respects the cap.
        val seen = mutable.Set(listingUrl)
        // Long arithmetic: a cap near Int.MaxValue would overflow the
        // Int product negative and fail the bound check on page 2
        val maxPages = 2L * cap + 64L
        var nPages = 1L
        var url = listingUrl
        var page = trimmed
        var done = false
        while (!done) {
          val root = mapper.readTree(page)
          require(root.has("results") && root.get("results").isArray,
            s"paginated listing at $url has no results array")
          root.get("results").elements().asScala
            .takeWhile(_ => buf.length < cap)
            .foreach(e => buf += e.toString)
          val next = root.get("next")
          if (buf.length >= cap || next == null || next.isNull ||
            next.asText.isEmpty) done = true
          else {
            url = next.asText
            require(seen.add(url),
              s"listing pagination cycle: $url already fetched")
            nPages += 1
            require(nPages <= maxPages,
              s"listing pagination exceeded $maxPages pages before the " +
                s"$cap-event cap — endless empty-page chain?")
            page = transport.get(url).trim
          }
        }
        buf.toSeq
      } else if (trimmed.startsWith("[")) {
        // Unparseable listing payloads degrade to ONE opaque record so the
        // executor-side PERMISSIVE parser yields its all-null row — same
        // decode-error tolerance as the S1/S2 readers, never a plan abort.
        try {
          val root = mapper.readTree(trimmed)
          require(root.isArray, s"listing at $listingUrl is not a JSON array")
          root.elements().asScala.map(_.toString).toSeq
        } catch { case _: com.fasterxml.jackson.core.JacksonException =>
          Seq(trimmed)
        }
      } else {
        trimmed.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      }
    val capped = events.take(cap)
    val nParts = math.max(1,
      math.min(options.get("fetchpartitions").map(_.toInt).getOrElse(32),
        capped.length))
    val perPart = (capped.length + nParts - 1) / math.max(nParts, 1)
    if (capped.isEmpty) Array(OsdbApiPartition(Array.empty))
    else capped.grouped(perPart).map(g => OsdbApiPartition(g.toArray))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    OsdbApiReaderFactory(requiredSchema, options, baseUrl,
      options.get("includedatapoints").exists(_.toBoolean))
}

case class OsdbApiPartition(eventJsons: Array[String]) extends InputPartition

case class OsdbApiReaderFactory(requiredSchema: StructType,
                                options: Map[String, String],
                                baseUrl: String,
                                includeDatapoints: Boolean)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OsdbApiPartitionReader(partition.asInstanceOf[OsdbApiPartition],
      requiredSchema, options, baseUrl,
      // column pruning reaches the fetch: no datapoints column, no
      // per-event requests — the dominant cost disappears with the column
      includeDatapoints && requiredSchema.fieldNames.contains("datapoints"))
}

class OsdbApiPartitionReader(partition: OsdbApiPartition,
                             requiredSchema: StructType,
                             options: Map[String, String],
                             baseUrl: String,
                             fetchDatapoints: Boolean)
  extends PartitionReader[InternalRow] {

  private val transport = ApiTransport.create(options)
  private val mapper = new ObjectMapper()
  private val parser = new JsonRowParser(requiredSchema,
    options.getOrElse("timezone", "UTC"))

  private val rows: Iterator[InternalRow] =
    partition.eventJsons.iterator.flatMap { ev =>
      parser.parse(if (fetchDatapoints) spliceDatapoints(ev) else ev)
    }
  private var current: InternalRow = _

  /** getDataPointsByEvent + time-sort + attach, executor-side
    * (webApiConnection.py:123-131,222-227): fetch
    * `datapoints/?eventId=`, sort by parsed dataTime (the reference's
    * dateStr2secs ordering, same format ladder as
    * [[graft.functions.TimeParse]]), splice under "datapoints". */
  private def spliceDatapoints(eventJson: String): String = {
    val ev = mapper.readTree(eventJson).asInstanceOf[ObjectNode]
    val id = Option(ev.get("id")).map(_.asText).getOrElse("")
    val dps = mapper.readTree(
      transport.get(s"$baseUrl/datapoints/?eventId=$id")).asInstanceOf[ArrayNode]
    val sorted = dps.elements().asScala.toSeq.sortBy { dp =>
      Option(dp.get("dataTime")).map(n => DataTimeSort.epochMillis(n.asText))
        .getOrElse(Long.MaxValue)
    }
    val arr = mapper.createArrayNode()
    sorted.foreach(arr.add)
    ev.set[ObjectNode]("datapoints", arr)
    ev.toString
  }

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** dataTime → epoch millis for the reader's sort, trying the SAME
  * format ladder as [[graft.functions.TimeParse.Formats]] (executor-side
  * plain-JVM twin of the Column version; unparseable sorts last). */
private[sources] object DataTimeSort {
  import java.time._
  import java.time.format.DateTimeFormatter

  private lazy val formatters =
    graft.functions.TimeParse.Formats.map(DateTimeFormatter.ofPattern)

  def epochMillis(s: String): Long = {
    formatters.foreach { f =>
      try return OffsetDateTime.parse(s, f).toInstant.toEpochMilli
      catch { case _: Exception => }
      try return LocalDateTime.parse(s, f).toInstant(ZoneOffset.UTC).toEpochMilli
      catch { case _: Exception => }
      try return LocalDate.parse(s, f).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
      catch { case _: Exception => }
    }
    Long.MaxValue
  }
}

/** Test/support transport that records every requested URL (static,
  * per-JVM — local-mode tests read it back) before delegating to the
  * file transport: the spec's proof that filter pushdown reached the
  * WIRE and that column pruning suppressed the datapoint fetches. */
final class RecordingFileTransport(options: Map[String, String]) extends ApiTransport {
  private val inner = new FileTransport(options)
  override def get(url: String): String = {
    RecordingFileTransport.record(url)
    inner.get(url)
  }
}

object RecordingFileTransport {
  private val urls = mutable.ArrayBuffer.empty[String]
  def record(u: String): Unit = synchronized { urls += u }
  def requested(): Seq[String] = synchronized { urls.toSeq }
  def reset(): Unit = synchronized { urls.clear() }
}
