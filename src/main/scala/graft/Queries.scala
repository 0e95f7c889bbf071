package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Exact._
import graft.queries.{DomainQueries, RelationalQueries, StreamQueries, TextQueries}

/** The operator-inventory demonstration queries (SURVEY.md §2) over the
  * driver testdata, each with a DuckDB oracle. Registry merges the
  * per-category modules; cross-engine exactness rules live in
  * [[graft.queries.Exact]].
  */
object Queries {

  /** A2/A6-shaped pricing rollup: group-by with sums, conditional sums,
    * and an exact average. Catalyst does partial aggregation map-side, so
    * at 100 TB this shuffles only (flag,status) x partitions rows. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        count(lit(1)).as("count_order"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  COUNT(*) AS count_order,
       |  ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty
       |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // registry
  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TextQueries.all ++ DomainQueries.all ++
      StreamQueries.all ++ Map(
      "q1_agg" -> ((s, d) => q1Agg(s, d))
    )

  val oracles: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++ DomainQueries.oracles ++
      StreamQueries.oracles ++ Map(
      "q1_agg" -> q1AggSql
    )
}
