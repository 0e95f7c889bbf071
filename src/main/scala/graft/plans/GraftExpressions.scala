package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{ArrayDot, ArrayMag3D, GraftSqlBridge}
import org.apache.spark.sql.types.StringType

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

  /** Codegen'd per-sample magnitude of an interleaved 3D accel array
    * (mode "V2" euclidean / "V1" manhattan — see [[ArrayMag3D]]). */
  def arrayMag3D(a: Column, mode: String = "V2"): Column =
    GraftSqlBridge.arrayMag3D(a, mode)

  /** Distributed Bloom-filter build over a LongType (pre-hashed) key
    * column — Spark's runtime-filter aggregate as a Column; see
    * [[graft.operators.Bloom]] for the key-typed public API. */
  def bloomAgg(hashedKey: Column, estimatedItems: Long, numBits: Long): Column =
    GraftSqlBridge.bloomFilterAgg(hashedKey, estimatedItems, numBits)

  /** Constant-Bloom membership probe (codegen'd `might_contain`). */
  def bloomMightContain(bloomBytes: Array[Byte], hashedKey: Column): Column =
    GraftSqlBridge.bloomMightContain(bloomBytes, hashedKey)

  private[plans] val arrayMag3DEntry = (
    FunctionIdentifier("array_mag3d"),
    new ExpressionInfo(classOf[ArrayMag3D].getName, "array_mag3d"),
    (children: Seq[Expression]) => {
      require(children.nonEmpty && children.length <= 2,
        s"array_mag3d expects 1 or 2 arguments, got ${children.length}")
      val mode = children match {
        case Seq(_) => "V2"
        case Seq(_, Literal(s, StringType)) => s.toString
        case _ => throw new IllegalArgumentException(
          "array_mag3d mode must be a string literal ('V1' or 'V2')")
      }
      ArrayMag3D(children.head, mode): Expression
    })

  /** Runtime registration: makes `array_dot(a, b)` and
    * `array_mag3d(xyz[, mode])` available to `spark.sql` / `expr` in an
    * existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      arrayDotEntry._1, arrayDotEntry._2, arrayDotEntry._3)
    spark.sessionState.functionRegistry.registerFunction(
      arrayMag3DEntry._1, arrayMag3DEntry._2, arrayMag3DEntry._3)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — the
  * SparkSessionExtensions injection point, so every session on a cluster
  * gets the native functions without per-session registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExpressions.arrayDotEntry)
    ext.injectFunction(GraftExpressions.arrayMag3DEntry)
  }
}
