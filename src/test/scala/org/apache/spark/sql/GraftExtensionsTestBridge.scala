package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge into the `private[sql]` extension-application step the
  * session builder runs — lets ExtensionsSpec exercise the injection
  * plumbing without rebuilding the shared test SparkContext.
  */
object GraftExtensionsTestBridge {
  def registerFunctions(ext: SparkSessionExtensions, registry: FunctionRegistry): Unit =
    ext.registerFunctions(registry)

  /** Execute a logical plan (e.g. a parsed maintenance command) the way
    * `spark.sql(...)` would — `Dataset.ofRows` is `private[sql]`.
    */
  def execute(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[Row] =
    classic.Dataset.ofRows(
      classic.ClassicConversions.castToImpl(spark), plan).collect().toSeq
}
