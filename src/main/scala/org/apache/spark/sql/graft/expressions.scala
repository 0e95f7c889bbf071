package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the hot array kernels — the tier
  * between built-in functions and Scala UDFs (SURVEY §7.3): unlike a UDF
  * they participate in whole-stage codegen (no Row boxing, no
  * serialization boundary); unlike array HOFs (CodegenFallback, lambda
  * dispatch per element) they compile to a tight Java loop.
  *
  * Lives under `org.apache.spark.sql` because the expression-extension
  * surface (`AbstractDataType` for ImplicitCastInputTypes,
  * `ExpressionUtils` for Expression↔Column bridging) is `private[sql]`
  * — the normal arrangement for out-of-tree native expressions. The
  * public API is re-exported from [[graft.plans.GraftExpressions]].
  *
  * `array_dot` is the kernel under every cosine-similarity operator (the
  * embedding near-dup and ANN paths; see [[graft.operators.Similarity]]).
  * The index-order accumulation matches `Similarity.dotUdf` and DuckDB's
  * `list_dot_product` bit-for-bit, so it is drop-in for oracle-checked
  * queries.
  *
  * Permissive-SQL semantics, by design: ragged arrays fold over the
  * common prefix (same as `dotUdf`'s min-length loop), and null ELEMENTS
  * read as 0.0 through ArrayData (a null top-level array still returns
  * null). Embedding pipelines should validate dimensions upstream —
  * this kernel will not reject a wrong-dim vector for them.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Expression↔Column bridge (the `private[sql]` side of the API). */
object GraftSqlBridge {
  def arrayDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ArrayDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
