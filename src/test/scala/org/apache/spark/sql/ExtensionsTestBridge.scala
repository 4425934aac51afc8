package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge: `SparkSessionExtensions.registerFunctions` is
  * `private[sql]`, but the spec needs to see what an injected session
  * would register without building a new SparkContext.
  */
object ExtensionsTestBridge {
  def registeredFunctions(ext: SparkSessionExtensions): FunctionRegistry =
    ext.registerFunctions(FunctionRegistry.builtin.clone())
}
