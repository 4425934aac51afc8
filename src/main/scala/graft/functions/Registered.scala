package graft.functions

import org.apache.spark.sql.SparkSession

/** Per-session once-guard for FunctionRegistry registration: queries
  * call `register(spark)` defensively, and re-registering on every
  * query both wastes work and emits a "replaced a previously registered
  * function" WARN per call. Keyed weakly so dropped sessions don't pin.
  */
private[functions] object Registered {
  private val done = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  def once(spark: SparkSession, key: String)(body: => Unit): Unit = {
    val s = done.computeIfAbsent(spark,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    if (s.add(key)) body
  }
}
