package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge into the `private[sql]` extension-application step the
  * session builder runs — lets ExtensionsSpec exercise the injection
  * plumbing without rebuilding the shared test SparkContext.
  */
object GraftExtensionsTestBridge {
  def registerFunctions(ext: SparkSessionExtensions, registry: FunctionRegistry): Unit =
    ext.registerFunctions(registry)
}
