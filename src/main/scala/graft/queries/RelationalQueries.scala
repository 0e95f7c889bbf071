package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** SURVEY.md §2 relational operator inventory over the driver testdata.
  *
  * Each query demonstrates one reference operator family (F=filter,
  * J=join, A=aggregate, W=window, O=sort/limit, U=set op, C=scalar,
  * M=ML-dataset op — ids match SURVEY.md §2 tables) re-expressed
  * Spark-first, with a DuckDB oracle for the driver's t2 hash gate.
  *
  * Scale notes are inline per query: what shuffles, what broadcasts, what
  * prunes — the plan we'd want against 100 TB, not just what passes at
  * sf0.01.
  */
object RelationalQueries {

  // ---------------------------------------------------------------- F: filters

  /** F2 (osdDbConnection.getEvent point lookup): predicate pushed to the
    * parquet scan — at scale this is a partition-pruned point read. */
  def f2PointLookup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") === 4242L)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))

  val f2Sql: String =
    """SELECT event_id, user_id, event_type, value,
      | strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM events WHERE event_id = 4242""".stripMargin

  /** F3 (id-list semi-filter, osdDbConnection.getEventsLst): IN-list stays
    * in the scan's pushed filters; no shuffle before the small agg. */
  def f3IdFilter(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id").isin(7L, 42L, 99L, 123L, 777L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))

  val f3Sql: String =
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      |FROM events WHERE user_id IN (7, 42, 99, 123, 777)
      |GROUP BY event_type""".stripMargin

  /** F4 (remove-events anti-filter, invalid-id exclusion). */
  def f4AntiIds(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(!col("doc_id").isin(0L, 1L, 2L, 3L, 4L))
      .groupBy("lang").agg(count(lit(1)).as("n"))

  val f4Sql: String =
    """SELECT lang, COUNT(*) AS n FROM documents
      |WHERE doc_id NOT IN (0, 1, 2, 3, 4) GROUP BY lang""".stripMargin

  /** F5+F6+C10 (include/exclude composite filter with case-insensitive
    * substring semantics): one Column predicate — OR of includes AND NOT
    * OR of excludes AND require-flags, exactly the reference shape. */
  def f5IncludeExclude(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(
        (lower(col("text")).contains("spark") || col("lang") === "en") &&
        !lower(col("text")).contains("slow") &&
        col("n_chars") >= 150L)
      .select("doc_id", "lang", "source", "n_chars")

  val f5Sql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE (contains(lower(text), 'spark') OR lang = 'en')
      |  AND NOT contains(lower(text), 'slow')
      |  AND n_chars >= 150""".stripMargin

  /** F8 (pandas-query date-range + category predicates): partition-prunable
    * time-range scan, then a tiny per-day rollup. */
  def f8TimeRange(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-20 00:00:00").cast("timestamp") &&
        col("event_type").isin("error", "view"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  val f8Sql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
      |  AND event_type IN ('error', 'view')
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- J: joins

  /** J1 (small-side lookup enrichment): part is a dimension — broadcast
    * explicitly so the 100 TB fact side never shuffles for the join. */
  def j1BroadcastDim(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))

  val j1Sql: String =
    s"""SELECT p_brand,
       | ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       | COUNT(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand""".stripMargin

  /** J3 (fold-assignment semi join): left_semi keeps the probe side lean —
    * no payload columns from the build side ever materialize. */
  def j3SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(
        broadcast(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  val j3Sql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       | ${dsumSql("o_totalprice")} AS sum_price
       |FROM orders
       |WHERE o_custkey IN (SELECT c_custkey FROM customer
       |                    WHERE c_mktsegment = 'BUILDING')
       |GROUP BY o_orderstatus""".stripMargin

  /** J4/F14 (training-exclusion anti join): customers with no URGENT
    * orders — left_anti keeps only probe-side columns, no payload shuffle
    * from the build side. */
  def j4AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))

  val j4Sql: String =
    """SELECT c_nationkey, COUNT(*) AS n FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey""".stripMargin

  /** J5 (event<->datapoints relational join shape, TPC-H Q3 skeleton):
    * two large-fact joins shuffle on their keys; customer filter prunes
    * before the join; final top-10 is TakeOrderedAndProject (no global
    * sort materialization). */
  def j5Multiway(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val j5Sql: String =
    s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
       | ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY o_orderkey, odate
       |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** J6 (interval/as-of labelling): equi key + time-range predicate —
    * Catalyst plans the equi part as the join and the range as a pushed
    * post-join filter, so no cartesian anywhere. */
  def j6RangeJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

  val j6Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderpriority""".stripMargin

  /** J7 (as-of join): each alarm ('error') event gets the latest
    * at-or-before 'view' reading by the same user, null if none within
    * one day — [[graft.operators.AsOf]]'s union+window form: ONE hash
    * partitioning on user_id over |L|+|R| slim rows, no candidate-pair
    * blowup. The oracle states the same semantics the expensive way
    * (pair join + ROW_NUMBER argmax) — structurally independent of the
    * implementation, which is the point of the check. */
  def j7AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val alarms = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("alarm_id"), col("user_id"),
        col("ts"), col("value").as("alarm_value"))
    val reads = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    graft.operators.AsOf.asOfJoin(
        alarms, reads, Seq("user_id"), "ts", "event_id", Seq("value"),
        toleranceUs = Some(86400000000L)) // 1 day
      .select(col("alarm_id"), col("user_id"),
        unix_micros(col("ts")).as("alarm_us"), col("alarm_value"),
        col("asof_event_id").as("read_id"),
        unix_micros(col("asof_ts")).as("read_us"),
        col("asof_value").as("read_value"))
  }

  val j7Sql: String =
    """WITH l AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'error'),
      |     r AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'view'),
      |     pairs AS (
      |  SELECT l.event_id AS alarm_id, l.user_id,
      |         epoch_us(l.ts) AS alarm_us, l.value AS alarm_value,
      |         r.event_id AS read_id, epoch_us(r.ts) AS read_us,
      |         r.value AS read_value,
      |         ROW_NUMBER() OVER (PARTITION BY l.event_id
      |                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
      |  FROM l LEFT JOIN r
      |    ON l.user_id = r.user_id AND r.ts <= l.ts
      |   AND r.ts >= l.ts - INTERVAL 1 DAY)
      |SELECT alarm_id, user_id, alarm_us, alarm_value,
      |       read_id, read_us, read_value
      |FROM pairs WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- A: aggs

  /** A2 (worst-alarm-state rollup): per-key max-of-encoded-severity, the
    * reference's tidy_db event-state derivation. Partial agg map-side. */
  def a2WorstState(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        max(when(col("event_type") === "error", 3)
          .when(col("event_type") === "purchase", 2)
          .when(col("event_type") === "signup", 1)
          .otherwise(0)).cast("int").as("severity"),
        count(lit(1)).as("n"))

  val a2Sql: String =
    """SELECT user_id,
      | CAST(MAX(CASE event_type WHEN 'error' THEN 3 WHEN 'purchase' THEN 2
      |          WHEN 'signup' THEN 1 ELSE 0 END) AS INTEGER) AS severity,
      | COUNT(*) AS n
      |FROM events GROUP BY user_id""".stripMargin

  /** A5 (per-event per-alg status counts → pivot): groupBy + pivot with
    * explicit values (no extra distinct-values job at scale). */
  def a5Pivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))

  val a5Sql: String =
    """SELECT l_returnflag,
      | COUNT(*) FILTER (WHERE l_linestatus = 'F') AS "F",
      | COUNT(*) FILTER (WHERE l_linestatus = 'O') AS "O"
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** A6 (detection stats TP/FP/TN/FN + rates, results.py): conditional-sum
    * family collapsing to one row — classic sum(when) with one final
    * division per rate. */
  def a6Confusion(s: SparkSession, d: String): DataFrame = {
    val pred = col("value") >= 0.5
    val act = col("event_type").isin("purchase", "signup")
    Tables.events(s, d).agg(
      sum(when(pred && act, 1L).otherwise(0L)).as("tp"),
      sum(when(pred && !act, 1L).otherwise(0L)).as("fp"),
      sum(when(!pred && !act, 1L).otherwise(0L)).as("tn"),
      sum(when(!pred && act, 1L).otherwise(0L)).as("fn"))
      .withColumn("tpr", col("tp").cast("double") / (col("tp") + col("fn")))
      .withColumn("fpr", col("fp").cast("double") / (col("fp") + col("tn")))
  }

  val a6Sql: String =
    """SELECT tp, fp, tn, fn,
      | CAST(tp AS DOUBLE) / (tp + fn) AS tpr,
      | CAST(fp AS DOUBLE) / (fp + tn) AS fpr
      |FROM (SELECT
      |  CAST(SUM(CASE WHEN value >= 0.5 AND event_type IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |  CAST(SUM(CASE WHEN value >= 0.5 AND event_type NOT IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |  CAST(SUM(CASE WHEN value < 0.5 AND event_type NOT IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS tn,
      |  CAST(SUM(CASE WHEN value < 0.5 AND event_type IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS fn
      | FROM events)""".stripMargin

  /** A7 (time-bucketed counts + zero-fill reindex): counts per (type, day)
    * left-joined onto a generated calendar x type grid — the grid is
    * generated, never scanned, and broadcast against the counts. */
  def a7DailyZeroFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val days = s.range(1).select(explode(expr(
      "sequence(DATE'2024-01-01', DATE'2024-01-30', INTERVAL 1 DAY)")).as("dday"))
      .select(date_format(col("dday"), "yyyy-MM-dd").as("day"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev.groupBy(
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    days.crossJoin(types)
      .join(counts, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  val a7Sql: String =
    """SELECT g.day, t.event_type, COALESCE(c.cnt, 0) AS cnt
      |FROM (SELECT strftime(d, '%Y-%m-%d') AS day FROM
      |      generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) AS s(d)) g
      |CROSS JOIN (SELECT DISTINCT event_type FROM events) t
      |LEFT JOIN (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS cnt
      |           FROM events GROUP BY 1, 2) c
      |  ON g.day = c.day AND t.event_type = c.event_type""".stripMargin

  /** A8 (10-minute tumbling max-alarm dedupe agg): Spark window() is
    * epoch-aligned, matching DuckDB time_bucket. Pure groupBy — one
    * shuffle keyed (user, bucket); max/count are order-independent. */
  def a8Tumbling10Min(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), window(col("ts"), "10 minutes").as("w"))
      .agg(max("value").as("max_value"), count(lit(1)).as("n"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("max_value"), col("n"))

  val a8Sql: String =
    """SELECT user_id,
      | strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
      | MAX(value) AS max_value, COUNT(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  /** CEP1 — SEQUENCE-PATTERN DETECTION ([[graft.operators.Pattern
    * .sequencePattern]], the MATCH_RECOGNIZE core Spark lacks): every
    * per-user "view, click, purchase" run completed within a day —
    * the corpus-level query form of the per-datapoint FSM the reference
    * hardcodes (W10). One key-hash shuffle, then a LEAD chain sharing
    * one window sort; overlapping matches permitted (SKIP TO NEXT ROW
    * semantics); (ts, event_id) tie-break keeps the sequence total.
    * The oracle restates the lead chain — a mis-ordered window, a lost
    * label, or an off-by-one on the time bound all break the hash. */
  def cep1SeqPattern(s: SparkSession, d: String): DataFrame =
    graft.operators.Pattern.sequencePattern(
        Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"), withinSec = 86400)
      .select(col("user_id"),
        date_format(col("match_start"), "yyyy-MM-dd HH:mm:ss")
          .as("match_start"),
        date_format(col("match_end"), "yyyy-MM-dd HH:mm:ss").as("match_end"))

  val cep1Sql: String =
    """SELECT user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS match_start,
      |  strftime(e, '%Y-%m-%d %H:%M:%S') AS match_end
      |FROM (SELECT user_id, ts, event_type,
      |        lead(event_type, 1) OVER w AS l1,
      |        lead(event_type, 2) OVER w AS l2,
      |        lead(ts, 2) OVER w AS e
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |WHERE event_type = 'view' AND l1 = 'click' AND l2 = 'purchase'
      |  AND epoch_us(e) - epoch_us(ts) <= 86400::BIGINT * 1000000""".stripMargin

  /** G1 (beyond-ref: PageRank over the user interaction graph) — the
    * graph-centrality companion to d6's connected components. Edges are
    * CONSECUTIVE-ACTOR pairs per event_type stream (lag over (ts,
    * event_id) — linear in events BY CONSTRUCTION, never the quadratic
    * all-pairs co-occurrence blowup), collapsed to weighted distinct
    * (src,dst) with self-loops dropped; then 3 unrolled power-iteration
    * rounds of pr' = 0.15/N + 0.85·Σ pr·w/out (the leaky-dangling
    * variant — dangling mass is not redistributed, identically on both
    * engines).
    *
    * Exactness and the iteration's scale shape live in
    * [[graft.operators.Graph.pageRank]] (tie-free floor-grid sums, Pregel
    * decomposition); this entry builds the fixture's edge list — one
    * windowed lag (shuffle by event_type, sort by time — same shape as
    * w7) collapsed to weighted distinct (src,dst). */
  def g1PageRank(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"), col("user_id"))
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    val ed = ev
      .withColumn("src", lag(col("user_id"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("user_id"))
      .groupBy(col("src"), col("user_id").as("dst"))
      .agg(count(lit(1)).as("w"))
    val nodes = ev.select(col("user_id").as("node")).distinct()
    graft.operators.Graph.pageRank(ed, nodes, iters = 3)
      .select(col("node").as("user_id"), col("pr"))
  }

  val g1Sql: String = {
    def step(prev: String, k: Int): String =
      s""" s$k AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |         CAST(SUM(CAST(FLOOR($prev.pr * e.ratio * 1.0e10) AS BIGINT))
         |              AS DOUBLE) / 1.0e10 AS sc
         |  FROM e JOIN $prev ON $prev.node = e.src GROUP BY 1),
         | pr$k AS MATERIALIZED (
         |  SELECT nodes.node,
         |         0.15e0 / CAST(n AS DOUBLE)
         |           + 0.85e0 * COALESCE(s$k.sc, 0.0e0) AS pr
         |  FROM nodes LEFT JOIN s$k USING (node) CROSS JOIN nn)""".stripMargin
    s"""WITH lagd AS (
       |  SELECT user_id AS dst,
       |         LAG(user_id) OVER (PARTITION BY event_type
       |                            ORDER BY ts, event_id) AS src
       |  FROM events),
       | ed AS MATERIALIZED (
       |  SELECT src, dst, COUNT(*) AS w FROM lagd
       |  WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
       | outd AS (SELECT src, SUM(w) AS o FROM ed GROUP BY 1),
       | e AS MATERIALIZED (
       |  SELECT ed.src, ed.dst, CAST(ed.w AS DOUBLE) / CAST(outd.o AS DOUBLE)
       |    AS ratio
       |  FROM ed JOIN outd USING (src)),
       | nodes AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events),
       | nn AS (SELECT COUNT(*) AS n FROM nodes),
       | pr0 AS MATERIALIZED (
       |  SELECT node, 1.0e0 / CAST(n AS DOUBLE) AS pr
       |  FROM nodes CROSS JOIN nn),
       |${step("pr0", 1)},
       |${step("pr1", 2)},
       |${step("pr2", 3)}
       |SELECT node AS user_id, pr FROM pr3""".stripMargin
  }

  /** G2 (beyond-ref: triangle counting by degree orientation) — the
    * third graph primitive beside d6's connected components and g1's
    * PageRank; per-user triangle participation over the same
    * consecutive-actor interaction graph (undirected, deduplicated).
    *
    * The degree-orientation scale design (O(m^1.5) wedge bound) lives in
    * [[graft.operators.Graph.triangleCounts]]; this entry builds the
    * fixture's deduplicated undirected edge list from the same lag
    * chain as g1. */
  def g2Triangles(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"), col("user_id"))
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    val und = ev
      .withColumn("p", lag(col("user_id"), 1).over(w))
      .filter(col("p").isNotNull && col("p") =!= col("user_id"))
      .select(least(col("p"), col("user_id")).as("u"),
        greatest(col("p"), col("user_id")).as("v"))
      .distinct()
    graft.operators.Graph.triangleCounts(und)
      .select(col("node").as("user_id"), col("triangles"))
  }

  val g2Sql: String =
    """WITH lagd AS (
      |  SELECT user_id AS c,
      |         LAG(user_id) OVER (PARTITION BY event_type
      |                            ORDER BY ts, event_id) AS p
      |  FROM events),
      | und AS MATERIALIZED (
      |  SELECT DISTINCT LEAST(p, c) AS u, GREATEST(p, c) AS v
      |  FROM lagd WHERE p IS NOT NULL AND p <> c),
      | deg AS MATERIALIZED (
      |  SELECT x, COUNT(*) AS deg
      |  FROM (SELECT u AS x FROM und UNION ALL SELECT v FROM und)
      |  GROUP BY 1),
      | ori AS MATERIALIZED (
      |  SELECT CASE WHEN du.deg < dv.deg
      |              OR (du.deg = dv.deg AND und.u < und.v)
      |         THEN und.u ELSE und.v END AS a,
      |         CASE WHEN du.deg < dv.deg
      |              OR (du.deg = dv.deg AND und.u < und.v)
      |         THEN und.v ELSE und.u END AS b,
      |         CASE WHEN du.deg < dv.deg
      |              OR (du.deg = dv.deg AND und.u < und.v)
      |         THEN dv.deg ELSE du.deg END AS bd
      |  FROM und JOIN deg du ON du.x = und.u JOIN deg dv ON dv.x = und.v),
      | tris AS MATERIALIZED (
      |  SELECT e1.a, e1.b AS b1, e2.b AS b2
      |  FROM ori e1 JOIN ori e2 ON e1.a = e2.a
      |  JOIN ori e3 ON e3.a = e1.b AND e3.b = e2.b
      |  WHERE e1.bd < e2.bd OR (e1.bd = e2.bd AND e1.b < e2.b))
      |SELECT user_id, COUNT(*) AS triangles
      |FROM (SELECT a AS user_id FROM tris
      |      UNION ALL SELECT b1 FROM tris
      |      UNION ALL SELECT b2 FROM tris)
      |GROUP BY 1""".stripMargin

  /** G3 (beyond-ref: label-propagation community detection) — the third
    * graph primitive beside g1's PageRank and g2's triangles, over the
    * same consecutive-actor interaction graph. Fully integer-exact
    * (counts + smallest-label tie-breaks), fixed 3 synchronous rounds —
    * [[graft.operators.Graph.labelPropagation]] carries the algorithm
    * and scale shape; the oracle unrolls the 3 rounds as MATERIALIZED
    * CTEs. */
  def g3Communities(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"), col("user_id"))
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    val und = ev
      .withColumn("p", lag(col("user_id"), 1).over(w))
      .filter(col("p").isNotNull && col("p") =!= col("user_id"))
      .select(least(col("p"), col("user_id")).as("u"),
        greatest(col("p"), col("user_id")).as("v"))
      .distinct()
    graft.operators.Graph.labelPropagation(und, rounds = 3)
      .select(col("node").as("user_id"), col("lbl").as("community"))
  }

  val g3Sql: String = {
    def step(prev: String, k: Int): String =
      s""" c$k AS MATERIALIZED (
         |  SELECT b.x AS node, l.lbl, COUNT(*) AS c
         |  FROM bi b JOIN $prev l ON l.node = b.y GROUP BY 1, 2),
         | l$k AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |           row_number() OVER (PARTITION BY node
         |                              ORDER BY c DESC, lbl) AS rn
         |    FROM c$k)
         |  WHERE rn = 1)""".stripMargin
    s"""WITH lagd AS (
       |  SELECT user_id AS c,
       |         LAG(user_id) OVER (PARTITION BY event_type
       |                            ORDER BY ts, event_id) AS p
       |  FROM events),
       | und AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(p, c) AS u, GREATEST(p, c) AS v
       |  FROM lagd WHERE p IS NOT NULL AND p <> c),
       | bi AS MATERIALIZED (
       |  SELECT u AS x, v AS y FROM und
       |  UNION ALL SELECT v, u FROM und),
       | l0 AS MATERIALIZED (
       |  SELECT DISTINCT x AS node, x AS lbl FROM bi),
       |${step("l0", 1)},
       |${step("l1", 2)},
       |${step("l2", 3)}
       |SELECT node AS user_id, lbl AS community FROM l3""".stripMargin
  }

  /** A19 (beyond-ref: equi-width histogram) — the summariseData
    * distribution-plot aggregation as a first-class operator: 20 bins
    * over [min,max] of events.value, zero-filled so every bin row
    * exists (the a7 calendar-grid pattern applied to value space).
    *
    * Shape: one all-column-pruned scan for the (min,max) scalar
    * (broadcast), then the binning is a NARROW map — the groupBy on a
    * 20-value key collapses map-side to ≤20 rows per partition before
    * the exchange; the bins axis is a broadcast 20-row range. Binning
    * arithmetic ((x−lo)/(hi−lo)·20, floored, clamped) is the same IEEE
    * sequence in both engines — floor is tie-free on identical inputs
    * (the g1 lesson). Degenerate guards: NULL values are excluded (they
    * would otherwise ride LEAST's null-skipping into the top bin), and
    * a single-valued column (hi = lo, division 0/0 → NaN, where Spark's
    * long-cast floor says 0 but DuckDB's NaN-is-greatest LEAST says 19)
    * short-circuits every row to bin 0 on both engines. */
  def a19Histogram(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
    val st = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val counts = ev.crossJoin(broadcast(st))
      .select(when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(floor((col("value") - col("lo")) /
          (col("hi") - col("lo")) * lit(20.0)), lit(19.0)).cast("long"))
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val bins = s.range(20)
      .select(col("id").as("bin")).crossJoin(broadcast(st))
      .select(col("bin"),
        (col("lo") + col("bin").cast("double") * (col("hi") - col("lo")) /
          lit(20.0)).as("bin_lo"))
    bins.join(counts, Seq("bin"), "left")
      .select(col("bin"), col("bin_lo"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  val a19Sql: String =
    """WITH ev AS (SELECT value FROM events WHERE value IS NOT NULL),
      | st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM ev),
      | c AS (SELECT CASE WHEN hi = lo THEN 0
      |              ELSE CAST(LEAST(FLOOR((value - lo) / (hi - lo) * 20.0e0),
      |                              19.0e0) AS BIGINT) END AS bin,
      |              COUNT(*) AS cnt
      |       FROM ev CROSS JOIN st GROUP BY 1),
      | bins AS (SELECT i AS bin, lo + CAST(i AS DOUBLE) * (hi - lo) / 20.0e0
      |            AS bin_lo
      |          FROM range(20) r(i) CROSS JOIN st)
      |SELECT bins.bin, bins.bin_lo, COALESCE(c.cnt, 0) AS cnt
      |FROM bins LEFT JOIN c USING (bin)""".stripMargin

  /** A13 (dp-gap statistics): per-key lag diff in floor-seconds (identical
    * under Spark's micro vs DuckDB's nano precision), conditional count.
    * One shuffle on user_id; the window sort is within-partition. */
  def a13GapStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("gap_s",
        col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
      .groupBy("user_id")
      .agg(sum(when(col("gap_s") > 3600L, 1L).otherwise(0L)).as("n_gaps"),
        count(lit(1)).as("n"))
  }

  // NOTE: integer SUM must be CAST AS BIGINT — DuckDB SUM(int) yields
  // HUGEINT, which the driver's pandas bridge turns into float64 and the
  // value hash then misses Spark's int64 (round-1 a13/a6/c9 failures).
  // epoch_us//1000000 avoids double rounding of epoch() near whole
  // seconds; caveat: DuckDB `//` truncates toward zero while Spark's
  // cast(ts as long) floor-divides, so they agree only for POST-1970
  // timestamps (all of this dataset) — pre-1970 sub-second values would
  // diverge by 1.
  val a13Sql: String =
    """SELECT user_id,
      | CAST(SUM(CASE WHEN gap_s > 3600 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
      | COUNT(*) AS n
      |FROM (SELECT user_id,
      |        epoch_us(ts) // 1000000
      |        - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
      |      FROM events)
      |GROUP BY user_id""".stripMargin

  /** A14 (distinct users/types): count-distinct goes through Spark's
    * two-phase partial distinct — no driver-side collect. */
  def a14DistinctStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n"),
        davg(col("value")).as("avg_value"))

  val a14Sql: String =
    s"""SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n,
       | ${davgSql("value")} AS avg_value
       |FROM events GROUP BY event_type""".stripMargin

  /** SKETCH1 — HLL++ cardinality estimation gated against the exact
    * count (the d5 truth-vs-scale-path gate pattern): per event type,
    * the exact distinct-user count and a flag that Spark's
    * `approx_count_distinct` (HyperLogLog++, rsd 0.05) lands within a
    * 15% band of it. At 100 TB the EXACT count is the expensive side —
    * a two-phase distinct aggregation whose first shuffle carries every
    * (type, user) pair — while the sketch aggregates in O(registers)
    * memory per group with a single pass and merge-by-register-max;
    * cardinality estimation is how a corpus pipeline sizes vocabularies,
    * dedup keyspaces, and join selectivities without paying for exact
    * distinct. The gate is DETERMINISTIC: Spark's HLL++ buffer is a
    * dense register array and merge is elementwise max (commutative,
    * associative), so the estimate is a pure function of the data
    * regardless of partitioning or merge order, and the 15% band is 3x
    * the configured rsd. (percentile_approx gets NO such entry by
    * design: its QuantileSummaries compaction is merge-order-sensitive,
    * so a cross-engine hash gate would flake.) */
  def sketch1HllDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("n_exact"),
        approx_count_distinct("user_id", 0.05).as("__est"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("__est") - col("n_exact")) <= col("n_exact") * 0.15)
          .as("hll_ok"))

  val sketch1Sql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact, TRUE AS hll_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** A15 — EXACT quantiles by rank selection (the deterministic
    * counterpart to the sketch family): per event type, p50/p90 of
    * `value` as the ELEMENT at rank ⌈p·n⌉ — discrete selection, no
    * interpolation, so the result is an actual data value and the
    * cross-engine hash compare is bit-exact (an interpolated quantile
    * is one float formula away from flaking; a selected one cannot).
    * The rank threshold ⌈p·n⌉ is computed as the same IEEE double
    * product on both engines, so even its representation error is
    * consistent.
    *
    * Scale story, stated honestly: exact quantiles need a per-group
    * sort — one range-free window shuffle on event_type, each group
    * sorted within its partition. That is the expensive-but-correct
    * path; `approx_percentile` is the cheap path whose merge-order
    * sensitivity rules out a VALUE oracle — sketch3 pins its rank-error
    * guarantee instead. A 100 TB caller picks per column: sketches for
    * monitoring, rank selection for anything a training cutoff depends
    * on. */
  def a15ExactQuantiles(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(
        max(col("n")).as("n"),
        min(when(col("rn") === ceil(col("n") * 0.5), col("value"))).as("p50"),
        min(when(col("rn") === ceil(col("n") * 0.9), col("value"))).as("p90"))
  }

  val a15Sql: String =
    """SELECT event_type, MAX(n) AS n,
      | MIN(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS p50,
      | MIN(CASE WHEN rn = CEIL(n * 0.9) THEN value END) AS p90
      |FROM (SELECT event_type, value,
      |        row_number() OVER (PARTITION BY event_type
      |                           ORDER BY value, event_id) AS rn,
      |        COUNT(*) OVER (PARTITION BY event_type) AS n
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** A17 — EXACT distributed correlation + regression line (the
    * [[Exact.dsum]] pattern extended to second-order statistics):
    * Spark's native `corr`/`covar_samp` are merge-order-dependent
    * float accumulations — useless for a cross-engine hash gate and
    * irreproducible run-to-run at scale — so every moment (Σx, Σy,
    * Σxy, Σx², Σy²) is summed EXACTLY through DECIMAL (the products
    * carry ≤4 decimals, so the decimal cast loses nothing), and the
    * closed forms are then ONE identical IEEE expression tree over
    * identical operands on both engines. The aggregation is a single
    * map-side-collapsed pass — the same shuffle shape as any groupBy
    * — so exactness costs nothing over the native float path at any
    * scale. */
  def a17ExactCorr(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity"); val y = col("l_extendedprice")
    // five DECIMAL product-sums per row are the registry's heaviest
    // partial aggregation — spread the few-split scan so the map-side
    // partials parallelize (no-op on a many-split lake scan; r19)
    val g = Tables.spread(Tables.lineitem(s, d)).groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      dsum(x).as("sx"), dsum(y).as("sy"),
      dsum(x * y).as("sxy"), dsum(x * x).as("sxx"), dsum(y * y).as("syy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    // the moments are exact; the CLOSED FORMS are a·b − c·d chains that
    // DuckDB's compiled code may FMA-contract where Java never does
    // (measured 1 ulp on corr at sf0.001 ONLY — a latent hazard the
    // r15 cross-SF audit surfaced), so the outputs go on ROUND grids
    // (the ml5 discipline): corr ∈ [−1,1] on ×1e9; slope/intercept
    // (≤ ~3·10⁴ here) on ×1e6 — both far inside 2^53
    g.select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
      round(cov / (sqrt(vx) * sqrt(vy)) * 1e9).cast("long")
        .as("corr_x1e9"),
      round((cov / vx) * 1e6).cast("long").as("slope_x1e6"),
      round((col("sy") - (cov / vx) * col("sx")) / col("n") * 1e6)
        .cast("long").as("intercept_x1e6"))
  }

  val a17Sql: String =
    s"""WITH g AS (SELECT l_returnflag,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${dsumSql("l_quantity")} AS sx,
       |    ${dsumSql("l_extendedprice")} AS sy,
       |    ${dsumSql("l_quantity * l_extendedprice")} AS sxy,
       |    ${dsumSql("l_quantity * l_quantity")} AS sxx,
       |    ${dsumSql("l_extendedprice * l_extendedprice")} AS syy
       |  FROM lineitem GROUP BY 1)
       |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       |  CAST(ROUND((n*sxy - sx*sy)
       |    / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) * 1e9) AS BIGINT)
       |    AS corr_x1e9,
       |  CAST(ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx) * 1e6) AS BIGINT)
       |    AS slope_x1e6,
       |  CAST(ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n
       |    * 1e6) AS BIGINT) AS intercept_x1e6
       |FROM g""".stripMargin

  /** SKETCH3 — approx quantiles gated by the RANK-ERROR BAND (closing
    * the loop a15's docblock leaves open: `percentile_approx` can't be
    * value-oracled because Greenwald-Khanna summary merges are
    * order-sensitive, but its GUARANTEE — rank error ≤ n/accuracy —
    * holds under EVERY merge order, so the guarantee is what gets
    * pinned, the sketch1/sketch2 pattern). Per event type: the exact
    * elements at ranks ⌈p·n⌉ ± slack (a15's bit-exact rank selection,
    * slack = 2·⌈n/accuracy⌉ — double the single-summary bound, because
    * partial-summary merges may compound error up to the sum of the
    * parts' bounds) bracket the approx value; the gate emits the
    * bracket values plus the in-band booleans, which are deterministic
    * TRUE however Spark schedules the partial aggregates. At 100 TB
    * this is the cheap path the a15 docblock names: one pass, O(acc)
    * state per group, no per-group sort — and this entry is the proof
    * it stays inside its contract. */
  def sketch3ApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    val acc = 1000
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val slack = ceil(col("n") / acc) * 2
    def edge(p: Double, sign: Int): org.apache.spark.sql.Column = {
      val r = ceil(col("n") * p) + (if (sign < 0) -slack else slack)
      min(when(col("rn") === greatest(lit(1L), least(col("n"), r)), col("value")))
    }
    val bands = Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max(col("n")).as("n"),
        edge(0.5, -1).as("p50_lo"), edge(0.5, 1).as("p50_hi"),
        edge(0.9, -1).as("p90_lo"), edge(0.9, 1).as("p90_hi"))
    val approx = Tables.events(s, d).groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9)), lit(acc)).as("ap"))
    bands.join(approx, "event_type")
      .select(col("event_type"), col("n"),
        col("p50_lo"), col("p50_hi"), col("p90_lo"), col("p90_hi"),
        (col("ap")(0) >= col("p50_lo") && col("ap")(0) <= col("p50_hi"))
          .as("p50_in_band"),
        (col("ap")(1) >= col("p90_lo") && col("ap")(1) <= col("p90_hi"))
          .as("p90_in_band"))
  }

  val sketch3Sql: String =
    """SELECT event_type, MAX(n) AS n,
      | MIN(CASE WHEN rn = GREATEST(1, LEAST(n, CEIL(n * 0.5) - CEIL(n / 1000) * 2))
      |          THEN value END) AS p50_lo,
      | MIN(CASE WHEN rn = GREATEST(1, LEAST(n, CEIL(n * 0.5) + CEIL(n / 1000) * 2))
      |          THEN value END) AS p50_hi,
      | MIN(CASE WHEN rn = GREATEST(1, LEAST(n, CEIL(n * 0.9) - CEIL(n / 1000) * 2))
      |          THEN value END) AS p90_lo,
      | MIN(CASE WHEN rn = GREATEST(1, LEAST(n, CEIL(n * 0.9) + CEIL(n / 1000) * 2))
      |          THEN value END) AS p90_hi,
      | TRUE AS p50_in_band, TRUE AS p90_in_band
      |FROM (SELECT event_type, value,
      |        row_number() OVER (PARTITION BY event_type
      |                           ORDER BY value, event_id) AS rn,
      |        COUNT(*) OVER (PARTITION BY event_type) AS n
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** BLOOM1 — Bloom-prefiltered exact semi join ([[graft.operators.Bloom]]):
    * lineitems of high-value orders, with the order keyset shipped as a
    * 1 MB Bloom fingerprint probed on the fact scan BEFORE the join's
    * exchange (~80% of lineitem rows never enter the shuffle at this
    * threshold), then an exact LeftSemi join removes Bloom false
    * positives — the manual form of Spark's `InjectRuntimeFilter`, for
    * when the filter side is too big to broadcast as a hash relation
    * but its Bloom fits anywhere. Results are exact for any fpp, so the
    * oracle is the plain IN-subquery; PlanSpec pins `might_contain` on
    * the fact side. */
  def bloom1SemiFilter(s: SparkSession, d: String): DataFrame = {
    val hot = Tables.orders(s, d)
      .filter(col("o_totalprice") > lit(400000.0))
      .select("o_orderkey")
    graft.operators.Bloom
      .bloomSemiJoin(Tables.lineitem(s, d), "l_orderkey", hot, "o_orderkey")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
  }

  val bloom1Sql: String =
    s"""SELECT l_returnflag, COUNT(*) AS n_rows,
       | ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem
       |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
       |                     WHERE o_totalprice > 400000.0)
       |GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- W: windows

  /** W2 (best-of-group selection via ranking window): row_number over a
    * total order (unique tiebreak), filter rn=1 — the curation "pick the
    * representative event" pattern. */
  def w2Top1PerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("event_id"), col("value"))
  }

  val w2Sql: String =
    """SELECT event_type, event_id, value FROM (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY value DESC, event_id) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  /** W3 (session-window grouping, gap >= 30 min starts a new session):
    * gaps-and-islands — lag to find session starts, running sum to assign
    * session ids, then a plain groupBy. One shuffle on user_id; both
    * window passes share the same partitioning+sort. This deliberately
    * avoids `session_window`: its merging ObjectHashAggregate measured
    * 15x slower here (9.2 s vs <1 s at sf0.1, round 2) and the analytic
    * form is the predictable plan at scale. */
  def w3Session(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .withColumn("sid", sum(
        when(col("prev").isNull ||
          col("ts").cast("double") - col("prev").cast("double") >= 1800.0, 1L)
          .otherwise(0L)).over(byUser))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .select("user_id", "session_start", "n")
  }

  val w3Sql: String =
    """SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       COUNT(*) AS n
      |FROM (SELECT user_id, ts,
      |        SUM(CASE WHEN prev IS NULL
      |                 OR epoch(ts) - epoch(prev) >= 1800 THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      |      FROM (SELECT user_id, ts, event_id,
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |            FROM events))
      |GROUP BY user_id, sid""".stripMargin

  /** W7 (lag/feature-history columns, addFeatureHistory): per-key analytic
    * lags + exact rolling sum over a 3-row frame; rows without full
    * history dropped, exactly the reference's drop-first-(n-1) rule. */
  def w7LagFeatures(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("v1", lag(col("value"), 1).over(w))
      .withColumn("v2", lag(col("value"), 2).over(w))
      .filter(col("v2").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"), col("v1"), col("v2"),
        (dec10(col("value")) + dec10(col("v1")) + dec10(col("v2")))
          .cast("double").as("sum3"))
  }

  val w7Sql: String =
    """SELECT user_id, event_id, value, v1, v2,
      | CAST(CAST(value AS DECIMAL(28,10)) + CAST(v1 AS DECIMAL(28,10))
      |      + CAST(v2 AS DECIMAL(28,10)) AS DOUBLE) AS sum3
      |FROM (SELECT user_id, event_id, value,
      |        lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v1,
      |        lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v2
      |      FROM events)
      |WHERE v2 IS NOT NULL""".stripMargin

  /** W9 (HR moving average ignoring sentinel values): conditional rolling
    * mean over a 4-row frame — sum/count both conditioned, exact via
    * decimal, one final division. */
  def w9CondMovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-3, 0)
    val valid = col("value") >= 0.2
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        (sum(when(valid, dec10(col("value")))).over(w).cast("double") /
          sum(when(valid, 1L).otherwise(0L)).over(w)).as("mavg"))
  }

  val w9Sql: String =
    """SELECT user_id, event_id,
      | CAST(SUM(CASE WHEN value >= 0.2 THEN CAST(value AS DECIMAL(28,10)) END)
      |        OVER w AS DOUBLE)
      |  / SUM(CASE WHEN value >= 0.2 THEN 1 ELSE 0 END) OVER w AS mavg
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin

  /** W11/A9/A10 (rolling(3) mean over time-grouped counts): daily counts
    * then an integer-exact rolling average per type. */
  def w11Rolling3(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-2, 0)
    daily.select(col("day"), col("event_type"), col("cnt"),
      avg(col("cnt")).over(w).as("roll3"))
  }

  val w11Sql: String =
    """SELECT day, event_type, cnt,
      | AVG(cnt) OVER (PARTITION BY event_type ORDER BY day
      |                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll3
      |FROM (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS cnt
      |      FROM events GROUP BY 1, 2)""".stripMargin

  /** W12 (beyond-ref: exponential smoothing): per-user EMA of `value`
    * ordered by (ts, event_id), α = 1/4 — the recursive-window class
    * (state_i = f(state_{i−1}, x_i)) that frame-based SQL windows cannot
    * express (every frame re-evaluation would be O(n²)); the reference's
    * moving-average smoothing generalised to exponential decay.
    *
    * The fold shape and exactness contract (binary-fraction α, identical
    * IEEE multiply-add sequence, per-key-fold scaling) live in
    * [[graft.operators.FeatureHistory.ema]]; DuckDB's list_reduce seeds
    * from the first element exactly as the operator does. */
  def w12Ema(s: SparkSession, d: String): DataFrame =
    graft.operators.FeatureHistory.ema(
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value")),
      keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
      valueCol = "value", alpha = 0.25)

  val w12Sql: String =
    """SELECT user_id, COUNT(*) AS n,
      | list_reduce(list(value ORDER BY ts, event_id),
      |             (acc, x) -> acc * 0.75e0 + x * 0.25e0) AS ema
      |FROM events GROUP BY user_id""".stripMargin

  /** W1+W2 (unique-event curation dedup): tumbling window per user, pick
    * ONE representative by the reference's priority rule (ALARM-ish rows
    * first, then strength, then id) via a ranking window — the
    * makeOsdDb 3-minute grouping re-expressed on the events table. */
  def w1CurationDedup(s: SparkSession, d: String): DataFrame = {
    val priority = when(col("event_type") === "error", 0)
      .when(col("event_type") === "purchase", 1).otherwise(2)
    val w = Window
      .partitionBy(col("user_id"), window(col("ts"), "1 hour"))
      .orderBy(priority, col("value").desc, col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        date_format(window(col("ts"), "1 hour").getField("start"),
          "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_id"), col("event_type"), col("value"))
  }

  val w1Sql: String =
    """SELECT user_id,
      |  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
      |  event_id, event_type, value
      |FROM (SELECT *,
      |        row_number() OVER (
      |          PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
      |          ORDER BY CASE event_type WHEN 'error' THEN 0
      |                   WHEN 'purchase' THEN 1 ELSE 2 END,
      |                   value DESC, event_id) AS rn
      |      FROM events)
      |WHERE rn = 1""".stripMargin

  /** A9 (daily seizure-day spacing): per-user active days, gap in days
    * to the previous active day (lag), rolling(3) mean of the gap —
    * integer-exact average. */
  def a9DailySpacing(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("user_id").orderBy("day")
    val wr = Window.partitionBy("user_id").orderBy("day").rowsBetween(-2, 0)
    daily
      .withColumn("gap_days",
        datediff(to_date(col("day")), lag(to_date(col("day")), 1).over(w)))
      .withColumn("roll3", avg(col("gap_days")).over(wr))
      .filter(col("gap_days").isNotNull)
      .select("user_id", "day", "n", "gap_days", "roll3")
  }

  val a9Sql: String =
    """SELECT user_id, day, n, gap_days, roll3 FROM (
      |  SELECT user_id, day, n, gap_days,
      |    AVG(gap_days) OVER (PARTITION BY user_id ORDER BY day
      |                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll3
      |  FROM (SELECT user_id, day, n,
      |          date_diff('day',
      |            lag(CAST(day AS DATE)) OVER (PARTITION BY user_id ORDER BY day),
      |            CAST(day AS DATE)) AS gap_days
      |        FROM (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
      |              FROM events GROUP BY 1, 2)))
      |WHERE gap_days IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------- O: sort/limit

  /** O2+O6 (order-by-limit): TakeOrderedAndProject — per-partition top-k
    * then a k-row merge on the driver; never a global sort of 100 TB. */
  def o2TopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
      .select(col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))

  val o2Sql: String =
    """SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS odate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  // ---------------------------------------------------------------- U: set ops

  /** U1 (union-distinct of id lists): union + distinct = one shuffle. */
  def u1UnionDistinct(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "error").select("user_id")
      .union(ev.filter(col("event_type") === "purchase").select("user_id"))
      .distinct()
  }

  val u1Sql: String =
    """SELECT user_id FROM events WHERE event_type = 'error'
      |UNION
      |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin

  /** U2 (except / removeEntriesFromLst): EXCEPT DISTINCT semantics. */
  def u2Except(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      .except(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey")))

  val u2Sql: String =
    """SELECT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT c_custkey AS custkey FROM customer
      |WHERE c_mktsegment = 'BUILDING'""".stripMargin

  /** U5 (intersect — completing the set-op family beside u1/u2):
    * INTERSECT DISTINCT semantics, planned as a LeftSemi + aggregate —
    * users who BOTH errored and purchased. */
  def u5Intersect(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "error").select("user_id")
      .intersect(ev.filter(col("event_type") === "purchase")
        .select("user_id"))
  }

  val u5Sql: String =
    """SELECT user_id FROM events WHERE event_type = 'error'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin

  /** U4 (unpivot/melt — a5's inverse): wide per-user event-type counts
    * back to long (user_id, event_type, n) rows via `Dataset.unpivot`,
    * nulls (absent combos) dropped. The oracle is the ROUND-TRIP LAW:
    * pivot then unpivot must equal the plain long `GROUP BY` — stated
    * directly as that groupBy, so the gate pins the algebra, not a
    * re-description of the plumbing. Scale shape: unpivot is a narrow
    * per-row expansion (`Expand` node — no shuffle, no join); the only
    * exchange here belongs to the upstream pivot's groupBy. */
  def u4Unpivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .groupBy("user_id").pivot("event_type", types).count()
      .unpivot(Array(col("user_id")), types.map(col).toArray,
        "event_type", "n")
      .filter(col("n").isNotNull)
  }

  val u4Sql: String =
    """SELECT user_id, event_type, COUNT(*) AS n
      |FROM events GROUP BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- C: scalars

  /** C2+C1 (multi-format timestamp parsing, the reference's legacy
    * day-first formats): round-trip through two formats, re-parse with a
    * coalesce-of-try_to_timestamp chain — the SURVEY §1.3 parser shape. */
  def c2MultiFormatTs(s: SparkSession, d: String): DataFrame = {
    val raw = when(col("event_id") % 2 === 0,
        date_format(col("ts"), "dd-MM-yyyy HH:mm:ss"))
      .otherwise(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
    Tables.events(s, d)
      .withColumn("raw", raw)
      .select(col("event_id"), col("raw"),
        date_format(coalesce(
          try_to_timestamp(col("raw"), lit("dd-MM-yyyy HH:mm:ss")),
          try_to_timestamp(col("raw"), lit("yyyy-MM-dd'T'HH:mm:ss"))),
          "yyyy-MM-dd HH:mm:ss").as("parsed"))
  }

  val c2Sql: String =
    """SELECT event_id, raw,
      | strftime(COALESCE(try_strptime(raw, '%d-%m-%Y %H:%M:%S'),
      |                   try_strptime(raw, '%Y-%m-%dT%H:%M:%S')),
      |          '%Y-%m-%d %H:%M:%S') AS parsed
      |FROM (SELECT event_id,
      |        CASE WHEN event_id % 2 = 0 THEN strftime(ts, '%d-%m-%Y %H:%M:%S')
      |             ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END AS raw
      |      FROM events)""".stripMargin

  /** C4 (type2id label encoding): when/otherwise chain. */
  def c4LabelEncode(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(when(col("event_type").isin("purchase", "signup"), 1)
        .when(col("event_type") === "error", 2)
        .otherwise(0).cast("int").as("label"))
      .groupBy("label").agg(count(lit(1)).as("n"))

  val c4Sql: String =
    """SELECT CAST(CASE WHEN event_type IN ('purchase','signup') THEN 1
      |           WHEN event_type = 'error' THEN 2 ELSE 0 END AS INTEGER) AS label,
      |       COUNT(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  /** C9 (JSON extraction from the legacy dataJSON-style payload column):
    * get_json_object stays inside codegen; sum of extracted ints is
    * exact. */
  def c9JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))

  val c9Sql: String =
    """SELECT event_type,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       COUNT(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  /** C11 (guarded ratio with sentinel, roiRatio=999 semantics): ANSI-safe
    * division behind a when-guard. */
  def c11SafeRatio(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        when(col("l_tax") =!= 0.0, col("l_discount") / col("l_tax"))
          .otherwise(999.0).as("ratio"))
      .groupBy("l_returnflag")
      .agg(dsum(col("ratio")).as("sum_ratio"), count(lit(1)).as("n"))

  val c11Sql: String =
    s"""SELECT l_returnflag,
       | ${dsumSql("CASE WHEN l_tax <> 0.0 THEN l_discount / l_tax ELSE 999.0 END")} AS sum_ratio,
       | COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- M: ML ops

  /** M1 (deterministic stratified train/test split): salted multiplicative
    * hash — engine-native determinism replacing sklearn's seeded
    * shuffle (SURVEY §7.4.5). No collect, no global sort: a pure map. */
  def m1HashSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = knuthHash32(col("event_id"))
    Tables.events(s, d)
      .withColumn("split",
        when(bucket < lit(3435973836L), "train").otherwise("test"))
      .groupBy("split", "event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
  }

  val m1Sql: String =
    s"""SELECT CASE WHEN ${knuthHash32Sql("event_id")} < 3435973836
      |            THEN 'train' ELSE 'test' END AS split,
      |       event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin

  /** M2 (k-fold assignment): hash-mod fold ids, fold sizes as invariant. */
  def m2KFold(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("fold",
        (knuthHash32(col("event_id")) % 5L).cast("long"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))

  val m2Sql: String =
    s"""SELECT CAST(${knuthHash32Sql("event_id")} % 5 AS BIGINT) AS fold,
      |       COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1""".stripMargin

  /** M3+C17 (random-oversampling with synthetic ids): deterministic xN
    * replication via explode(sequence) — a generator, not a driver loop —
    * plus the reference's "{id}-{k}" synthetic-id scheme. */
  def m3Oversample(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .withColumn("copy", explode(expr("sequence(1L, 3L)")))
      .select(col("event_id"), col("copy"),
        concat(col("event_id").cast("string"), lit("-"), col("copy").cast("string"))
          .as("synth_id"))

  val m3Sql: String =
    """SELECT event_id, g.copy AS copy,
      |       CAST(event_id AS VARCHAR) || '-' || CAST(g.copy AS VARCHAR) AS synth_id
      |FROM events CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS copy) g
      |WHERE event_type = 'purchase'""".stripMargin

  /** J8 (interval join, NO equi key): every 'view' event inside ±5 min
    * of ANY 'error' event, across all users — the join class Spark
    * plans as a nested-loop because there is nothing to hash on.
    * [[graft.operators.IntervalJoin.pointInInterval]] buckets time
    * (10-min buckets; each ±5-min window explodes to ≤ 2 rows) and
    * equi-joins on the bucket id, so the plan is an ordinary shuffled
    * join inheriting AQE/skew/broadcast levers. The oracle states the
    * raw range predicate and lets DuckDB's IEJoin handle it — again a
    * structurally different evaluation of the same semantics. */
  def j8IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        unix_micros(col("ts")).as("view_us"))
    val windows = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"),
        (unix_micros(col("ts")) - 300000000L).as("lo_us"),
        (unix_micros(col("ts")) + 300000000L).as("hi_us"))
    graft.operators.IntervalJoin.pointInInterval(
        views, "view_us", windows, "lo_us", "hi_us", bucketUs = 600000000L)
      .select("view_id", "view_us", "err_id")
  }

  val j8Sql: String =
    """SELECT p.event_id AS view_id, epoch_us(p.ts) AS view_us,
      |       i.event_id AS err_id
      |FROM (SELECT * FROM events WHERE event_type = 'view') p
      |JOIN (SELECT * FROM events WHERE event_type = 'error') i
      |  ON epoch_us(p.ts) BETWEEN epoch_us(i.ts) - 300000000
      |                        AND epoch_us(i.ts) + 300000000""".stripMargin

  /** J9 (full outer join — completing the join family beside inner/
    * broadcast/semi/anti/range/as-of/interval): the reconciliation
    * query — per-(user, day) click activity full-outer-joined against
    * purchase activity, so days with only one side still surface
    * (funnel drop-off on either end). Spark's using-columns full outer
    * coalesces the keys natively; counts zero-fill.
    *
    * Shape: both sides pre-aggregate BEFORE the join (map-side partial
    * collapse, then the join input is per-key rows, not raw events) and
    * share the (user_id, day) shuffle key — at 100 TB the two exchanges
    * co-partition and the full outer is a single sort-merge pass, never
    * a row-level events×events join. */
  def j9FullOuter(s: SparkSession, d: String): DataFrame = {
    def daily(t: String, as: String) = Tables.events(s, d)
      .filter(col("event_type") === t)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as(as))
    daily("click", "clicks")
      .join(daily("purchase", "purchases"), Seq("user_id", "day"), "full_outer")
      .select(col("user_id"), col("day"),
        coalesce(col("clicks"), lit(0L)).as("clicks"),
        coalesce(col("purchases"), lit(0L)).as("purchases"))
  }

  val j9Sql: String =
    """WITH c AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
      |                  COUNT(*) AS clicks
      |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      | p AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
      |              COUNT(*) AS purchases
      |       FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
      |       COALESCE(c.day, p.day) AS day,
      |       COALESCE(c.clicks, 0) AS clicks,
      |       COALESCE(p.purchases, 0) AS purchases
      |FROM c FULL OUTER JOIN p
      |  ON c.user_id = p.user_id AND c.day = p.day""".stripMargin

  /** M10 (exact stratified sample, beyond-reference): exactly 10 docs per source — the k
    * smallest `(knuthHash32(doc_id), doc_id)` per stratum via
    * [[graft.operators.Splits.stratifiedExactK]]'s two-phase selection
    * (bucket histogram → boundary-only sort). The oracle states the
    * same bottom-k the expensive way (full per-stratum ROW_NUMBER) —
    * the naive shape the operator exists to avoid at scale. */
  def m10StratifiedK(s: SparkSession, d: String): DataFrame =
    graft.operators.Splits.stratifiedExactK(
        Tables.documents(s, d), "source",
        knuthHash32(col("doc_id")), col("doc_id"), k = 10)
      .select(col("source"), col("doc_id"),
        knuthHash32(col("doc_id")).as("hv"))

  val m10Sql: String =
    s"""WITH h AS (SELECT source, doc_id,
       |             ${knuthHash32Sql("doc_id")} AS hv FROM documents),
       |     r AS (SELECT source, doc_id, hv,
       |             ROW_NUMBER() OVER (PARTITION BY source
       |                                ORDER BY hv, doc_id) AS rn
       |           FROM h)
       |SELECT source, doc_id, hv FROM r WHERE rn <= 10""".stripMargin

  // ---------------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f2_point_lookup"    -> (f2PointLookup _),
    "f3_id_filter"       -> (f3IdFilter _),
    "f4_anti_ids"        -> (f4AntiIds _),
    "f5_include_exclude" -> (f5IncludeExclude _),
    "f8_time_range"      -> (f8TimeRange _),
    "j1_broadcast_dim"   -> (j1BroadcastDim _),
    "j3_semi_join"       -> (j3SemiJoin _),
    "j4_anti_join"       -> (j4AntiJoin _),
    "j5_multiway"        -> (j5Multiway _),
    "j6_range_join"      -> (j6RangeJoin _),
    "j7_asof_join"       -> (j7AsofJoin _),
    "j8_interval_join"    -> (j8IntervalJoin _),
    "j9_full_outer"       -> (j9FullOuter _),
    "m10_stratified_k"    -> (m10StratifiedK _),
    "a2_worst_state"     -> (a2WorstState _),
    "a5_pivot"           -> (a5Pivot _),
    "a6_confusion"       -> (a6Confusion _),
    "a7_daily_zero_fill" -> (a7DailyZeroFill _),
    "a8_tumbling_10min"  -> (a8Tumbling10Min _),
    "cep1_seq_pattern"   -> (cep1SeqPattern _),
    "g1_pagerank"        -> (g1PageRank _),
    "g2_triangles"       -> (g2Triangles _),
    "a19_histogram"      -> (a19Histogram _),
    "g3_communities"     -> (g3Communities _),
    "a9_daily_spacing"   -> (a9DailySpacing _),
    "a13_gap_stats"      -> (a13GapStats _),
    "a14_distinct_stats" -> (a14DistinctStats _),
    "sketch1_hll_distinct" -> (sketch1HllDistinct _),
    "sketch3_approx_quantiles" -> (sketch3ApproxQuantiles _),
    "a15_exact_quantiles" -> (a15ExactQuantiles _),
    "a17_exact_corr" -> (a17ExactCorr _),
    "bloom1_semi_filter" -> (bloom1SemiFilter _),
    "w1_curation_dedup"  -> (w1CurationDedup _),
    "w2_top1_per_group"  -> (w2Top1PerGroup _),
    "w3_session"         -> (w3Session _),
    "w7_lag_features"    -> (w7LagFeatures _),
    "w9_cond_moving_avg" -> (w9CondMovingAvg _),
    "w11_rolling3"       -> (w11Rolling3 _),
    "w12_ema"            -> (w12Ema _),
    "o2_topk"            -> (o2TopK _),
    "u1_union_distinct"  -> (u1UnionDistinct _),
    "u2_except"          -> (u2Except _),
    "u5_intersect"       -> (u5Intersect _),
    "u4_unpivot"         -> (u4Unpivot _),
    "c2_multiformat_ts"  -> (c2MultiFormatTs _),
    "c4_label_encode"    -> (c4LabelEncode _),
    "c9_json_extract"    -> (c9JsonExtract _),
    "c11_safe_ratio"     -> (c11SafeRatio _),
    "m1_hash_split"      -> (m1HashSplit _),
    "m2_kfold"           -> (m2KFold _),
    "m3_oversample"      -> (m3Oversample _)
  )

  val oracles: Map[String, String] = Map(
    "f2_point_lookup"    -> f2Sql,
    "f3_id_filter"       -> f3Sql,
    "f4_anti_ids"        -> f4Sql,
    "f5_include_exclude" -> f5Sql,
    "f8_time_range"      -> f8Sql,
    "j1_broadcast_dim"   -> j1Sql,
    "j3_semi_join"       -> j3Sql,
    "j4_anti_join"       -> j4Sql,
    "j5_multiway"        -> j5Sql,
    "j6_range_join"      -> j6Sql,
    "j7_asof_join"       -> j7Sql,
    "j8_interval_join"    -> j8Sql,
    "j9_full_outer"       -> j9Sql,
    "m10_stratified_k"    -> m10Sql,
    "a2_worst_state"     -> a2Sql,
    "a5_pivot"           -> a5Sql,
    "a6_confusion"       -> a6Sql,
    "a7_daily_zero_fill" -> a7Sql,
    "a8_tumbling_10min"  -> a8Sql,
    "cep1_seq_pattern"   -> cep1Sql,
    "g1_pagerank"        -> g1Sql,
    "g2_triangles"       -> g2Sql,
    "a19_histogram"      -> a19Sql,
    "g3_communities"     -> g3Sql,
    "a9_daily_spacing"   -> a9Sql,
    "a13_gap_stats"      -> a13Sql,
    "a14_distinct_stats" -> a14Sql,
    "sketch1_hll_distinct" -> sketch1Sql,
    "sketch3_approx_quantiles" -> sketch3Sql,
    "a15_exact_quantiles" -> a15Sql,
    "a17_exact_corr" -> a17Sql,
    "bloom1_semi_filter" -> bloom1Sql,
    "w1_curation_dedup"  -> w1Sql,
    "w2_top1_per_group"  -> w2Sql,
    "w3_session"         -> w3Sql,
    "w7_lag_features"    -> w7Sql,
    "w9_cond_moving_avg" -> w9Sql,
    "w11_rolling3"       -> w11Sql,
    "w12_ema"            -> w12Sql,
    "o2_topk"            -> o2Sql,
    "u1_union_distinct"  -> u1Sql,
    "u2_except"          -> u2Sql,
    "u5_intersect"       -> u5Sql,
    "u4_unpivot"         -> u4Sql,
    "c2_multiformat_ts"  -> c2Sql,
    "c4_label_encode"    -> c4Sql,
    "c9_json_extract"    -> c9Sql,
    "c11_safe_ratio"     -> c11Sql,
    "m1_hash_split"      -> m1Sql,
    "m2_kfold"           -> m2Sql,
    "m3_oversample"      -> m3Sql
  )
}
