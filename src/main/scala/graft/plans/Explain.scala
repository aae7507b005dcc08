package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CodegenMode, CostMode, ExtendedMode, FormattedMode}

/** Plan introspection surface (reference:
  * /root/reference/src/operators/format.rs:1 format_operator_tree —
  * keenwa renders optimized operator trees; graft exposes Catalyst's
  * explain modes plus the AQE-final executed plan).
  */
object Explain {
  def formatted(df: DataFrame): String = df.queryExecution.explainString(FormattedMode)
  def extended(df: DataFrame): String = df.queryExecution.explainString(ExtendedMode)
  def codegen(df: DataFrame): String = df.queryExecution.explainString(CodegenMode)
  def cost(df: DataFrame): String = df.queryExecution.explainString(CostMode)

  /** AQE-final physical plan; materializes the query if not yet run. */
  def executedFinal(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }
}
