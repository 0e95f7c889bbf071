package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Signal, TimeParse}
import graft.operators._
import graft.sources.SimulatedEvents
import graft.streaming.{NnBuffer, Replay, ReplayDp}

/** The LAKE family of oracled queries (lake1-lake10): partition-pruned
  * scans, bucketed co-located joins, compaction, time travel, vacuum,
  * versioned delete, ORC, schema evolution, z-order — split out of
  * [[DomainQueries]] (round-17 registry-size split; behavior and
  * oracle hashes unchanged). Shared fixture helpers (qtmp, UDFs) stay
  * in [[DomainQueries]] as private[queries]. */
object LakeQueries {
  import OsdbFixture.sqlBase
  import DomainQueries._

  /** LAKE1 — partition-pruned lake access END TO END: write the events
    * table as a category-partitioned parquet lake through the real
    * [[graft.sources.OsdbJson.writeEventsParquet]] (the SURVEY §1.3
    * normalized layout, category = the reference's per-category file
    * split re-expressed as a partition column), then read ONE category
    * back with the partition filter doing the pruning. At 100 TB this
    * is the single biggest scan lever the engine has: the filtered read
    * lists and scans ONE directory of the lake — the other categories'
    * files are never opened. PlanSpec pins the executed plan
    * (PartitionFilters non-empty, category=purchase); this entry pins
    * the VALUES against DuckDB running the same slice off the original
    * table, so layout round-trip and pruning correctness are both
    * gated. The aggregate uses count/max only — exact at any fold
    * order, so the hash gate is FP-safe. */
  def lake1Write(s: SparkSession, d: String): String = {
    val dir = qtmp(s, "lake1_lake")
    graft.sources.OsdbJson.writeEventsParquet(
      graft.Tables.events(s, d).withColumn("category", col("event_type")), dir)
    dir
  }

  /** The read side, exposed separately so PlanSpec can pin the pruned
    * scan on exactly the DataFrame the declared entry executes. */
  def lake1Read(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)
      .filter(col("category") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))

  def lake1PrunedScan(s: SparkSession, d: String): DataFrame =
    lake1Read(s, lake1Write(s, d))

  val lake1Sql: String =
    """SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
      |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  /** LAKE2 — BUCKETED CO-LOCATED JOIN end to end: the second of the two
    * big 100 TB scan/shuffle levers (lake1 demonstrates partition
    * pruning; this demonstrates bucketing). The events fact table and a
    * per-user profile dimension are both written as 16-bucket parquet
    * tables bucketed by `user_id` — each side pre-repartitioned on the
    * bucket key so every bucket is exactly ONE file — and the join then
    * plans as a sort-merge join with NO exchange on either input: the
    * bucket layout IS the shuffle, paid once at write time and amortized
    * over every subsequent join. At 100 TB this turns the recurring
    * fact-dim co-location shuffle (the biggest repeated cost in a
    * star-schema pipeline) into a one-time layout decision. The `merge`
    * hint pins the sort-merge path at test scale, where the planner
    * would otherwise broadcast the small dim (the regime bucketing
    * exists for is the one where BOTH sides are too big to broadcast);
    * PlanSpec pins the executed plan — both scans `Bucketed: true`, no
    * exchange or sort on the join keys — and the DuckDB oracle pins the
    * joined VALUES (all-integer aggregates, exact at any fold order). */
  def lake2Write(s: SparkSession, d: String): (String, String) = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val profile = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_user"))
    def writeBucketed(df: DataFrame, table: String, path: String): Unit =
      df.repartition(16, col("user_id"))
        .write.format("parquet").option("path", path)
        .bucketBy(16, "user_id").sortBy("user_id")
        .mode("overwrite").saveAsTable(table)
    writeBucketed(ev, "graft_lake2_events", qtmp(s, "lake2_events"))
    writeBucketed(profile, "graft_lake2_profile", qtmp(s, "lake2_profile"))
    ("graft_lake2_events", "graft_lake2_profile")
  }

  /** The read side, exposed separately so PlanSpec can pin the
    * exchange-free bucketed join on exactly the DataFrame the declared
    * entry executes. */
  def lake2Read(s: SparkSession, evTable: String, dimTable: String): DataFrame =
    s.table(evTable).hint("merge").join(s.table(dimTable), "user_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("n_user")).as("sum_user_events"))

  def lake2BucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (evT, dimT) = lake2Write(s, d)
    lake2Read(s, evT, dimT)
  }

  val lake2Sql: String =
    """WITH p AS (SELECT user_id, COUNT(*) AS n_user FROM events GROUP BY 1)
      |SELECT e.event_type, COUNT(*) AS n,
      |  CAST(SUM(p.n_user) AS BIGINT) AS sum_user_events
      |FROM events e JOIN p USING (user_id) GROUP BY 1""".stripMargin

  /** LAKE3 — SMALL-FILE COMPACTION end to end ([[graft.sources
    * .LakeMaintenance.compact]]): the maintenance lever that keeps
    * lake1's layout healthy under churn. The harness fabricates ingest
    * sprawl (32 writer tasks per partition — the shape every
    * incremental/streaming sink leaves behind), compaction rewrites it
    * as one declarative repartition-by-partition job with
    * `maxRecordsPerFile` bounding files per directory — no driver loop,
    * same plan at 10 or 10,000 partitions — and the entry reads the
    * COMPACTED lake back for per-category integer invariants (count,
    * distinct users, event-id sum) the DuckDB oracle states off the
    * original table: a dropped row-group, a partition mixed into the
    * wrong directory, or a corrupted rewrite all break the hash.
    * PlanSpec-style file-count assertions (32+ files -> 1 per
    * partition) live in the OperatorsSpec test, where the
    * environment-dependent part (file sizes) belongs. */
  def lake3Compaction(s: SparkSession, d: String): DataFrame = {
    val src = qtmp(s, "lake3_src")
    val dst = qtmp(s, "lake3_dst")
    // project EARLY (r20; guide §2/§6 — JobProfile attributed lake3's
    // task time to bytes moved through three full-width passes:
    // fabricate-write, compact read+rewrite, read-back): the declared
    // result consumes only (category, user_id, event_id), so the
    // fabricated sprawl carries exactly those — ts/value/props never
    // enter the churn. Same 32-files-per-partition sprawl shape, same
    // compaction job, same oracle-checked aggregates.
    graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        col("event_type").as("category"))
      .repartition(32)
      .write.mode("overwrite").partitionBy("category").parquet(src)
    graft.sources.LakeMaintenance.compact(s, src, dst, "category",
      maxRecordsPerFile = 1L << 20)
    s.read.parquet(dst)
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("id_sum"))
  }

  val lake3Sql: String =
    """SELECT event_type AS category, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events GROUP BY 1""".stripMargin

  private val lake8RunId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** LAKE8 — snapshot versioning / TIME TRAVEL end to end
    * ([[graft.sources.LakeMaintenance.commitVersion]]/readVersion):
    * commit v1 (one user cohort), commit v2 as an APPEND carrying v1's
    * manifest forward (a second cohort), then — with both commits on
    * disk — read BOTH versions and aggregate each. The v1 read after
    * v2's commit must see only v1's file set (snapshot isolation, the
    * reproducible-training-run property); the oracle restates both
    * snapshots' content from the source table, so a version leaking
    * newer files, losing carried ones, or double-counting an appended
    * row breaks the hash. */
  def lake8TimeTravel(s: SparkSession, d: String): DataFrame = {
    // fresh lake per invocation: versions are immutable BY CONTRACT
    // (commitVersion fails loudly on re-commit), and Bench re-runs every
    // declared query three times in one session
    val dir = qtmp(s, s"lake8_lake_${lake8RunId.incrementAndGet()}")
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 0), version = 1)
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 1), version = 2,
      carryFrom = Some(1))
    def agg(v: Int): DataFrame =
      graft.sources.LakeMaintenance.readVersion(s, dir, v)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
        .select(lit(v.toLong).as("version"), col("event_type"), col("n"),
          col("id_sum"))
    agg(1).unionByName(agg(2))
  }

  val lake8Sql: String =
    """SELECT 1 AS version, event_type, COUNT(*) AS n,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events WHERE user_id % 3 = 0 GROUP BY 2
      |UNION ALL
      |SELECT 2, event_type, COUNT(*),
      |  CAST(SUM(event_id) AS BIGINT)
      |FROM events WHERE user_id % 3 IN (0, 1) GROUP BY 2""".stripMargin


  private val lake9RunId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** LAKE9 — vacuum end to end
    * ([[graft.sources.LakeMaintenance.vacuum]], the round-10 missing
    * half of lake8's versioning contract): commit v1 (cohort A), v2 as
    * an APPEND carrying v1 (cohort B), and v3 (a doomed cohort C), then
    * vacuum retaining ONLY v2. v3's data files and the v1/v3 manifests
    * must go (the result pins manifests_deleted = 2); v1's FILES must
    * SURVIVE because v2's manifest still references them. The retained
    * snapshot is then aggregated — a vacuum that deletes carried files
    * loses cohort A's rows, one that misses v3's files leaves the count
    * wrong, and either breaks the hash. The loud-read-of-vacuumed-
    * version half of the contract is spec-pinned (OperatorsSpec), where
    * exception semantics belong. */
  def lake9Vacuum(s: SparkSession, d: String): DataFrame = {
    // fresh lake per invocation, like lake8: versions are immutable and
    // vacuumed version numbers are burned — Bench re-runs every entry
    val dir = qtmp(s, s"lake9_lake_${lake9RunId.incrementAndGet()}")
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 0), version = 1)
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 1), version = 2,
      carryFrom = Some(1))
    graft.sources.LakeMaintenance.commitVersion(
      s, dir, ev.filter(col("user_id") % 3 === 2), version = 3)
    val deleted = graft.sources.LakeMaintenance.vacuum(s, dir, Seq(2))
    val manifestsGone = deleted.filter(col("kind") === "manifest").count()
    graft.sources.LakeMaintenance.readVersion(s, dir, 2)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      .withColumn("manifests_deleted", lit(manifestsGone))
  }

  val lake9Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
      |  CAST(2 AS BIGINT) AS manifests_deleted
      |FROM events WHERE user_id % 3 IN (0, 1) GROUP BY 1""".stripMargin

  private val lake10RunId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** LAKE10 — ATOMIC targeted delete through the versioned lake
    * ([[graft.sources.LakeMaintenance.deleteWhereVersioned]], the
    * manifest-commit answer to lake5's documented delete+rename
    * window): commit v1, delete one user cohort into v2 with
    * file-level pruning, then read BOTH versions — v2 must hold
    * exactly the survivors while v1 still holds everything (snapshot
    * isolation through a delete, the recall-a-bad-batch-without-
    * losing-history operation). The oracle restates both snapshots
    * from the source table; a row leaking between versions, a survivor
    * lost from a rewritten file, or a carried file dropped from the
    * manifest all break the hash. */
  def lake10VersionedDelete(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, s"lake10_lake_${lake10RunId.incrementAndGet()}")
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    graft.sources.LakeMaintenance.commitVersion(s, dir,
      ev.repartition(4, col("user_id")), version = 1)
    graft.sources.LakeMaintenance.deleteWhereVersioned(
      s, dir, fromVersion = 1, newVersion = 2,
      predicate = col("user_id") % 5 === 2)
    def agg(v: Int): DataFrame =
      graft.sources.LakeMaintenance.readVersion(s, dir, v)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
        .select(lit(v.toLong).as("version"), col("event_type"), col("n"),
          col("id_sum"))
    agg(1).unionByName(agg(2))
  }

  val lake10Sql: String =
    """SELECT 1 AS version, event_type, COUNT(*) AS n,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events GROUP BY 2
      |UNION ALL
      |SELECT 2, event_type, COUNT(*),
      |  CAST(SUM(event_id) AS BIGINT)
      |FROM events WHERE user_id % 5 <> 2 GROUP BY 2""".stripMargin


  /** LAKE7 — format-agnostic lake layer: the same partitioned write /
    * pruned read / aggregate path as lake1-lake3, through ORC instead
    * of parquet (both columnar formats ship in Spark; a real lake mixes
    * them during migrations). The read applies a partition-pruning
    * filter (category = 'click') so the entry also gates that ORC scans
    * prune directories the way parquet scans do; the oracle restates
    * the aggregate off the original table — a row lost or duplicated in
    * the ORC round trip, or a partition mis-pruned, breaks the hash.
    * Timestamps are excluded from the round trip on purpose: the lake
    * content here is the id/user/value payload (ORC session-tz
    * timestamp semantics differ from parquet's and deserve their own
    * migration story, not a silent dependency). */
  def lake7Orc(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "lake7_orc")
    graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .withColumn("category", col("event_type"))
      .write.mode("overwrite").partitionBy("category").orc(dir)
    s.read.orc(dir)
      .filter(col("category") === "click")
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("id_sum"),
        Exact.dsum(col("value")).as("value_sum"))
  }

  val lake7Sql: String =
    s"""SELECT event_type AS category, COUNT(*) AS n,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
       |  ${Exact.dsumSql("value")} AS value_sum
       |FROM events WHERE event_type = 'click' GROUP BY 1""".stripMargin

  /** LAKE5 — TARGETED DELETE end to end ([[graft.sources.LakeMaintenance
    * .deleteWhere]], the right-to-be-forgotten / bad-batch-recall op):
    * the events lake partitioned by category, every row of the
    * user_id % 7 == 3 cohort deleted, the SURVIVING lake read back and
    * aggregated. The operator rewrites only partitions containing
    * matches (here all of them — user ids are uncorrelated with
    * category; the partial-rewrite evidence, untouched-partition files
    * byte-identical, is OperatorsSpec's crafted-layout test) and swaps
    * directories atomically per partition. The oracle restates the
    * surviving aggregate off the original table, so a row deleted too
    * many or too few — or a partition lost in the swap — breaks the
    * hash. */
  def lake5Delete(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "lake5_lake")
    // project EARLY (r20; the lake3 narrowing applied here — guide
    // §2.3/§6): the declared result and the delete predicate consume
    // only (event_id, user_id, category), so the fabricated lake
    // carries exactly those — the find pass, the survivor rewrite and
    // the read-back stop moving ts/value/props through three passes.
    // Same partitioned layout (writeEventsParquet), same delete
    // semantics, same oracle-checked aggregate.
    graft.sources.OsdbJson.writeEventsParquet(
      graft.Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          col("event_type").as("category")),
      dir)
    graft.sources.LakeMaintenance.deleteWhere(s, dir, "category",
      col("user_id") % 7 === 3)
    s.read.parquet(dir)
      .groupBy("category")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("id_sum"))
  }

  val lake5Sql: String =
    """SELECT event_type AS category, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events WHERE user_id % 7 <> 3 GROUP BY 1""".stripMargin

  /** LAKE6 — SCHEMA EVOLUTION under write drift: two writer generations
    * land in the same lake — the old one without, the new one WITH a
    * `fw_version` column — and `mergeSchema` reconciles the read: old
    * rows surface the new column as null (bucketed to 'legacy' here),
    * and no backfill rewrite ever runs. This is the add-a-column half
    * of the physical-drift story whose timestamp-rendition half broke
    * round 8 (Tables.normalizeTs / SchemaDriftSpec); a production lake
    * sees both as writers upgrade. Scale note: mergeSchema reconciles
    * FOOTERS (one task per file schema), not data — the read stays one
    * scan; pin the merged schema in the table catalog once it
    * stabilizes to skip even that. The oracle restates the generation
    * split by formula, so a dropped generation, a misaligned column, or
    * a non-null legacy value all break the hash. */
  def lake6SchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val dir = qtmp(s, "lake6_lake")
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    ev.filter(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(dir + "/gen=1")
    ev.filter(col("event_id") % 2 =!= 0)
      .withColumn("fw_version",
        concat(lit("v"), (col("user_id") % 3).cast("string")))
      .write.mode("overwrite").parquet(dir + "/gen=2")
    s.read.option("mergeSchema", "true").parquet(dir)
      .groupBy(coalesce(col("fw_version"), lit("legacy")).as("fw_version"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
  }

  val lake6Sql: String =
    """SELECT CASE WHEN event_id % 2 = 0 THEN 'legacy'
      |            ELSE 'v' || CAST(user_id % 3 AS VARCHAR) END AS fw_version,
      |  COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events GROUP BY 1""".stripMargin

  /** LAKE4 — Z-ORDER LAYOUT end to end ([[graft.sources.LakeMaintenance
    * .writeZOrdered]]): the events table rewritten along the Morton
    * curve of (user_id, ts), then read back through a TWO-dimension box
    * predicate (a user band AND a time band) and aggregated. Z-order is
    * the multi-column data-skipping lever — a user_id-sorted layout
    * leaves every file spanning the full time range, so ts predicates
    * skip nothing; the curve keeps each file a localized (user, time)
    * box and parquet min/max stats prune on EITHER dimension (the
    * OperatorsSpec test measures exactly that: bounding-box hit
    * fraction under a ts-only predicate, z-ordered vs user-sorted).
    * The oracle restates the box aggregate off the original table, so
    * the rewrite is also content-gated: a row lost or duplicated in the
    * re-layout breaks the hash. */
  def lake4ZOrder(s: SparkSession, d: String): DataFrame = {
    val dst = qtmp(s, "lake4_z")
    // project EARLY (r20; the lake3 narrowing — guide §2.3/§6): the
    // box read consumes only (event_id, user_id, event_type, ts_us),
    // so the Morton rewrite re-lays exactly those instead of dragging
    // value/props through the full-table sort+write. Same curve, same
    // box pruning demonstration, same oracle-checked aggregate.
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    graft.sources.LakeMaintenance.writeZOrdered(
      ev, dst, col("user_id"), col("ts_us"), numFiles = 16)
    val mm = ev.agg(min("ts_us"), max("ts_us"), min("user_id"),
      max("user_id")).head()
    val (tLo, tHi, uLo, uHi) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    val (tA, tB) = (tLo + (tHi - tLo) / 4, tLo + (tHi - tLo) / 2)
    val (uA, uB) = (uLo + (uHi - uLo) / 4, uLo + (uHi - uLo) / 2)
    s.read.parquet(dst)
      .filter(col("user_id").between(uA, uB) &&
        col("ts_us").between(tA, tB))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
  }

  /** The same box bounds re-derived from the raw table: quartile
    * arithmetic on BIGINT min/max is exact on both engines. */
  val lake4Sql: String =
    """WITH mm AS (
      |  SELECT MIN(epoch_us(ts)) AS tlo, MAX(epoch_us(ts)) AS thi,
      |         MIN(user_id) AS ulo, MAX(user_id) AS uhi
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM events, mm
      |WHERE user_id BETWEEN ulo + (uhi - ulo) // 4 AND ulo + (uhi - ulo) // 2
      |  AND epoch_us(ts) BETWEEN tlo + (thi - tlo) // 4
      |                       AND tlo + (thi - tlo) // 2
      |GROUP BY 1""".stripMargin

}
