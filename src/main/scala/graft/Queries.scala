package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator-inventory demonstration queries (SURVEY.md §2) over the
  * driver testdata, each with a DuckDB oracle.
  *
  * Cross-engine exactness rules used throughout:
  *   - SUM over DOUBLE goes through DECIMAL (exact, order-independent),
  *     then casts back to DOUBLE — Spark's partial/final agg order vs
  *     DuckDB's sequential order cannot change the result.
  *   - AVG is expressed as exact decimal SUM cast to double, divided by
  *     COUNT — one IEEE division of identical operands on both engines.
  *   - Window orderings always end in a unique key so ranking is total.
  */
object Queries {

  /** sum(double) made order-independent: cast to decimal, sum exactly,
    * cast back. 18,4 holds |x| < 10^14 at 4dp — plenty for testdata. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")
  private def dsumExpr(sql: String): String =
    s"CAST(SUM(CAST($sql AS DECIMAL(18,4))) AS DOUBLE)"

  // ---------------------------------------------------------------------
  // A-series: aggregations (SURVEY §2.4)
  // ---------------------------------------------------------------------

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
       |  ${dsumExpr("l_quantity")} AS sum_qty,
       |  ${dsumExpr("l_extendedprice")} AS sum_base_price,
       |  COUNT(*) AS count_order,
       |  ${dsumExpr("l_quantity")} / COUNT(*) AS avg_qty
       |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // registry
  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) => q1Agg(s, d))
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
