package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass regex capture: match once, return ALL capture groups as
  * an array (NULL array when the line doesn't match; NULL elements for
  * unmatched optional groups). Spark's `regexp_extract` re-executes the
  * pattern per requested group, so a k-field grok projection costs k+1
  * matches per row — this expression makes it exactly one, which is
  * the difference on a 100 TB log scan.
  */
object RegexFns {

  /** Static entry point called from generated code. The compiled
    * Pattern is passed by reference (ctx.addReferenceObj) — compiled
    * once per task, not per row.
    */
  def capture(text: UTF8String, pattern: Pattern): ArrayData = {
    val m: Matcher = pattern.matcher(text.toString)
    if (!m.find()) return null
    val n = m.groupCount()
    val out = new Array[AnyRef](n)
    var i = 1
    while (i <= n) {
      val g = m.group(i)
      out(i - 1) = if (g == null) null else UTF8String.fromString(g)
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registered.once(spark, "regex") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_capture_groups",
        exprs => CaptureGroups(exprs(0), exprs(1)), "built-in")
    }

  /** Column wrapper; requires [[register]] on the active session. */
  def captureGroups(
      spark: org.apache.spark.sql.SparkSession, text: Column,
      regex: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_capture_groups", text, org.apache.spark.sql.functions.lit(regex))
  }
}

/** `graft_capture_groups(text, regex)` — one regex execution per row,
  * all groups out. The regex must be a foldable literal (it is
  * compiled once at plan time).
  */
case class CaptureGroups(left: Expression, right: Expression)
    extends BinaryExpression {
  require(right.foldable, "capture_groups regex must be a literal")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  @transient private lazy val compiled: Pattern =
    Pattern.compile(right.eval(null).asInstanceOf[UTF8String].toString)

  override def nullSafeEval(text: Any, regex: Any): Any =
    RegexFns.capture(text.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef = ctx.addReferenceObj("graftPattern", compiled,
      classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, (text, _) => s"""
      ${ev.value} = graft.functions.RegexFns.capture($text, $patternRef);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CaptureGroups =
    copy(left = newLeft, right = newRight)
}
