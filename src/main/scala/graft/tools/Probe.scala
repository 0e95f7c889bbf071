package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch probe for cross-engine (Spark vs DuckDB oracle) semantics. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(tag: String)(f: => Unit): Unit =
      try f catch { case e: Throwable => println(s"!! $tag: ${e.getMessage.take(300)}") }
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    t("events") {
      val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      ev.printSchema()
      ev.selectExpr("min(unix_micros(ts)) lo", "max(unix_micros(ts)) hi",
        "count(*) n").show(false)
      ev.selectExpr("ts", "date_format(ts,'yyyy-MM-dd HH:mm:ss')",
        "window(ts, '10 minutes').start").orderBy("event_id").show(3, false)
    }
    t("avg-int") {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.createOrReplaceTempView("ev")
      spark.sql("SELECT avg(cnt) a, sum(cnt) s FROM (SELECT user_id, count(*) cnt FROM ev GROUP BY 1)").show(false)
    }
    t("lineitem") {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      li.printSchema()
      li.createOrReplaceTempView("li")
      spark.sql("SELECT DISTINCT l_returnflag, l_linestatus FROM li ORDER BY 1,2").show(false)
      spark.sql("SELECT typeof(l_shipdate) FROM li LIMIT 1").show(false)
    }
    t("orders") {
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      o.createOrReplaceTempView("ord")
      spark.sql("SELECT DISTINCT o_orderstatus FROM ord ORDER BY 1").show(false)
      spark.sql("SELECT DISTINCT o_orderpriority FROM ord ORDER BY 1").show(false)
      spark.sql("SELECT min(o_orderdate), max(o_orderdate), typeof(o_orderdate) FROM ord GROUP BY typeof(o_orderdate)").show(false)
    }
    t("region") { spark.read.parquet("/root/testdata/sf0.001/region.parquet").show(false) }
    spark.stop()
  }
}
