package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** The SILENT-FALLBACK tripwire — the round-15 Janino lesson made an
  * auditable invariant: when a whole-stage pipeline's generated
  * `processNext` grows past Janino's 64 KB per-method limit, Spark
  * catches the compile error (or trips `spark.sql.codegen
  * .hugeMethodLimit`) and SILENTLY runs the stage interpreted —
  * correct answers, ~15× slower, the only symptom a WARN in the
  * executor log (ml4i measured 21.9 s vs 1.59 s). This object
  * re-compiles every WholeStageCodegen stage of a query's FINAL
  * (post-AQE) physical plan and reports each stage's max generated
  * method size, so a spec can fail RED the day an expression stack
  * crosses the cliff instead of shipping a 15× regression that bench
  * noise can hide.
  *
  * Lives in the `org.apache.spark.sql` tree for the `private[sql]`
  * plan internals (AQE final plan, query-stage bodies), the same
  * keyhole pattern as the graft native expressions. */
object CodegenAudit {

  /** One whole-stage codegen stage's compile outcome: the stage's head
    * operator, the largest generated method's bytecode size, and the
    * compile error if Janino rejected it (the ml4i failure mode). */
  case class StageReport(stage: String, maxMethodCodeSize: Int,
                         error: Option[String]) {
    /** Below BOTH cliffs: Janino's hard 64 KB limit (compile fails) and
      * Spark's hugeMethodLimit fallback (compiles, then interpreted). */
    def healthy(hugeMethodLimit: Int): Boolean =
      error.isEmpty && maxMethodCodeSize <= hugeMethodLimit
  }

  /** Every WholeStageCodegenExec in the plan, INCLUDING inside AQE
    * query stages (QueryStageExec is a leaf node whose materialized
    * body hides from TreeNode.collect), stages nested under
    * InputAdapters, AND stages hosted in SUBQUERY plans
    * (ScalarSubquery/InSubquery bodies are a separate traversal from
    * `children` — without it a subquery's oversized stage would escape
    * the tripwire and silently run interpreted). */
  private def collectStages(p: SparkPlan): Seq[WholeStageCodegenExec] = {
    val sub = p.subqueries.flatMap(collectStages)
    (p match {
      case a: AdaptiveSparkPlanExec => collectStages(a.executedPlan)
      case q: QueryStageExec => collectStages(q.plan)
      case w: WholeStageCodegenExec =>
        w +: w.children.flatMap(collectStages)
      case other => other.children.flatMap(collectStages)
    }) ++ sub
  }

  /** Execute `df` (RDD-level count, so the audited plan IS the query's
    * own plan — a Dataset count would wrap it in a new aggregate),
    * then re-generate and compile each whole-stage body. Compilation
    * hits Spark's generated-class cache for stages the execution
    * already compiled; a stage that failed and fell back re-fails here
    * with the error CAPTURED instead of WARN-logged. */
  def audit(df: DataFrame, execute: Boolean = true): Seq[StageReport] = {
    val qe = df.queryExecution
    if (execute) qe.toRdd.count()
    collectStages(qe.executedPlan).map { w =>
      val label = w.child.nodeName
      val (_, src) = w.doCodeGen()
      try {
        val (_, stats) = CodeGenerator.compile(src)
        StageReport(label, stats.maxMethodCodeSize, None)
      } catch {
        case e: Exception =>
          // Janino wraps the real failure (e.g. "Code of method ...
          // grows beyond 64 KB") several causes deep — report the
          // ROOT message, which is the actionable one
          var root: Throwable = e
          while (root.getCause != null && root.getCause != root)
            root = root.getCause
          StageReport(label, Int.MaxValue,
            Some(Option(root.getMessage).getOrElse(root.toString).take(500)))
      }
    }
  }
}
