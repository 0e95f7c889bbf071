package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the "pre-shuffle once, join many times
  * free" layout for repeated event↔datapoint joins at 100 TB. Writing
  * both sides bucketed by the join key lets SortMergeJoin consume the
  * bucket layout directly: NO Exchange on either side of the join.
  * (Bucketing needs a table catalog, so this lives as a spec against the
  * session's embedded warehouse rather than a path-based writer.) */
class BucketingSpec extends SparkSpec {

  test("joining two tables bucketed on the key runs with zero exchanges") {
    import spark.implicits._
    // force the shuffle-join path: at toy sizes Spark would broadcast,
    // which proves nothing about the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // the catalog is in-memory per JVM but the warehouse dir persists: a
    // stale location from a previous run must go before saveAsTable
    def rmrf(name: String): Unit = {
      val p = java.nio.file.Paths.get("spark-warehouse", name)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    try {
    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_dps")
    rmrf("b_events"); rmrf("b_dps")
    (1L to 1000L).map(i => (i, s"ev$i")).toDF("event_id", "name")
      .write.bucketBy(8, "event_id").sortBy("event_id")
      .mode("overwrite").saveAsTable("b_events")
    (1L to 5000L).map(i => (i % 1000 + 1, i * 2.0)).toDF("event_id", "value")
      .write.bucketBy(8, "event_id").sortBy("event_id")
      .mode("overwrite").saveAsTable("b_dps")

    val joined = spark.table("b_events")
      .join(spark.table("b_dps"), "event_id")
      .groupBy("event_id").agg(sum("value").as("s"))
    assert(joined.count() == 1000)

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself consumes the bucket layout: the only exchange-free
    // join marker is SortMergeJoin with no Exchange between it and the
    // scans. The groupBy on the same key is ALSO exchange-free — the
    // bucketing satisfies its distribution too.
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n${plan.take(3000)}")
    assert(plan.contains("Bucketed: true"), plan.take(3000))

    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_dps")
    rmrf("b_events"); rmrf("b_dps")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
