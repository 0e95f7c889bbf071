package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{ArrayDot, GraftSqlBridge}

/** Public surface for the native codegen expressions (the expressions
  * themselves live in [[org.apache.spark.sql.graft]] — see the package
  * note there). Three ways in, matching how a cluster would deploy:
  * Column API for Scala pipelines, runtime registry for an existing
  * session, `spark.sql.extensions=graft.plans.GraftExtensions` for
  * fleet-wide injection.
  */
object GraftExpressions {

  /** Codegen'd dot product of two array<double> columns (array<float>
    * casts implicitly). */
  def arrayDot(a: Column, b: Column): Column = GraftSqlBridge.arrayDot(a, b)

  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    arrayDot(a, b) / (sqrt(arrayDot(a, a)) * sqrt(arrayDot(b, b)))
  }

  private[plans] val arrayDotEntry = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"array_dot expects 2 arguments, got ${children.length}")
      ArrayDot(children(0), children(1)): Expression
    })

  /** Runtime registration: makes `array_dot(a, b)` available to
    * `spark.sql` / `expr` in an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      arrayDotEntry._1, arrayDotEntry._2, arrayDotEntry._3)
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — the
  * SparkSessionExtensions injection point, so every session on a cluster
  * gets the native functions without per-session registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExpressions.arrayDotEntry)
}
