package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level wall-clock breakdown of g3_communities (round-12
  * verdict item 8: 2.66 s against a 2.7 s target — before spending on
  * a constant factor, find out WHERE the time is). Times the edge
  * derivation (window lag + distinct), the bi/lbl0 materialization,
  * and each LPA round separately, plus the full query for reference.
  *
  * `runMain graft.tools.G3Profile [sfDir] [reps]`
  */
object G3Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def und() = {
      val ev = graft.Tables.events(spark, dir)
        .select(col("event_type"), col("ts"), col("event_id"), col("user_id"))
      val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      ev.withColumn("p", lag(col("user_id"), 1).over(w))
        .filter(col("p").isNotNull && col("p") =!= col("user_id"))
        .select(least(col("p"), col("user_id")).as("u"),
          greatest(col("p"), col("user_id")).as("v"))
        .distinct()
    }

    def t(tag: String)(body: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      System.err.println(f"[g3] $tag%-28s min ${runs.map(_._1).min}%6.2f s " +
        f"(reps ${runs.map(r => f"${r._1}%.2f").mkString(",")}; rows ${runs.head._2})")
    }

    t("edge build (und)") { und().queryExecution.toRdd.count() }
    t("full g3 (3 rounds)") {
      graft.operators.Graph.labelPropagation(und(), rounds = 3)
        .queryExecution.toRdd.count()
    }
    t("1 round") {
      graft.operators.Graph.labelPropagation(und(), rounds = 1)
        .queryExecution.toRdd.count()
    }
    t("2 rounds") {
      graft.operators.Graph.labelPropagation(und(), rounds = 2)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
