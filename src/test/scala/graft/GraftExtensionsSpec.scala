package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` entry point registers every shipped
  * function. A live-session drive isn't possible here (the shared test
  * SparkContext predates any extensions conf), so assert the injection
  * wiring directly and the builder outputs against the imperative path.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkTest {

  test("injects every shipped function name") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val injected =
      org.apache.spark.sql.ExtensionsTestBridge.registeredFunctions(ext)
    for ((name, _) <- GraftExtensions.all)
      assert(injected.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"function $name not injected")
  }

  test("injected builders produce working expressions") {
    val strp = GraftExtensions.all.toMap.apply("strptime")
    val e = strp(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal("2024-03-05"),
      org.apache.spark.sql.catalyst.expressions.Literal("%Y-%m-%d")))
    assert(e.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.ParseToTimestamp])
  }
}
