package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * rolling polynomial hash over byte k-grams, minimum per sliding window,
  * fingerprint = combined hash of the selected minima. Two documents
  * sharing enough content share fingerprint minima; the single-long
  * digest here is the cheap "same boilerplate family" variant.
  */
object Fingerprints {
  final val K = 8   // k-gram length in bytes
  final val W = 16  // winnow window

  /** Static entry point — called from generated Java code, so the whole
    * stage stays inside WholeStageCodegen.
    */
  def winnow(s: UTF8String): Long = {
    val bytes = s.getBytes
    if (bytes.length < K) return Aggregators.mix64(bytes.length.toLong)
    val nGrams = bytes.length - K + 1
    val hashes = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    // rolling polynomial hash, base 257 (POW = 257^(K-1) precomputed)
    while (i < K) { h = h * 257 + (bytes(i) & 0xff); i += 1 }
    hashes(0) = Aggregators.mix64(h)
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xff) * POW) * 257 + (bytes(i + K - 1) & 0xff)
      hashes(i) = Aggregators.mix64(h)
      i += 1
    }
    // winnow: min of each window of W; combine selected minima
    var fp = 0L
    var w = 0
    val lastStart = math.max(0, nGrams - 1)
    while (w <= lastStart) {
      var min = Long.MaxValue
      var j = w
      val end = math.min(w + W, nGrams)
      while (j < end) { if (hashes(j) < min) min = hashes(j); j += 1 }
      fp = Aggregators.mix64(fp ^ min)
      w += W
    }
    fp
  }

  private final val POW: Long = {
    var p = 1L
    var i = 0
    while (i < K - 1) { p *= 257; i += 1 }
    p
  }

  /** SQL surface: registers `graft_fingerprint(text)` in the session's
    * function registry — the same extension mechanism the reference's
    * DuckDB-extension functions use (SURVEY §2B UDF row).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fingerprint", exprs => Fingerprint(exprs.head), "built-in")

  /** Column wrapper; requires [[register]] on the active session. */
  def fingerprint(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_fingerprint", c)
  }
}

/** `fingerprint(text)` scalar expression: LongType, null-safe, with real
  * `doGenCode` (a static call — no codegen fallback, no UDF overhead).
  */
case class Fingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Fingerprints.winnow(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprints.winnow($c)")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}
