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

  /** Full winnowing fingerprint SET (Schleimer/Wilkerson/Aiken §4,
    * SIGMOD'03): sliding window of `w` consecutive k-gram hashes, step
    * 1; per window select the MINIMUM (rightmost on ties); record each
    * selected position once. Guarantee: two documents sharing any
    * substring of length >= w + k - 1 share at least one fingerprint —
    * the property that makes this an exhaustive-candidate generator for
    * contiguous-overlap near-dups.
    *
    * Static entry point called from generated Java code.
    */
  def winnowSet(s: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    if (bytes.length < k) {
      out += Aggregators.mix64(bytes.length.toLong)
    } else {
      val nGrams = bytes.length - k + 1
      var pw = 1L
      var t = 0
      while (t < k - 1) { pw *= 257; t += 1 }
      val hashes = new Array[Long](nGrams)
      var h = 0L
      var i = 0
      while (i < k) { h = h * 257 + (bytes(i) & 0xff); i += 1 }
      hashes(0) = Aggregators.mix64(h)
      i = 1
      while (i < nGrams) {
        h = (h - (bytes(i - 1) & 0xff) * pw) * 257 + (bytes(i + k - 1) & 0xff)
        hashes(i) = Aggregators.mix64(h)
        i += 1
      }
      var lastSel = -1
      var start = 0
      val lastWindow = math.max(0, nGrams - w)
      while (start <= lastWindow) {
        val end = math.min(start + w, nGrams)
        var minIdx = start
        var j = start + 1
        while (j < end) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
        if (minIdx != lastSel) { out += hashes(minIdx); lastSel = minIdx }
        start += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.distinct.toArray)
  }

  /** Column wrapper for the winnowing fingerprint set; requires
    * [[register]] on the active session.
    */
  def winnowSetCol(
      spark: org.apache.spark.sql.SparkSession, c: Column,
      k: Int = K, w: Int = W): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_winnow_set", c,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
  }

  /** SQL surface: registers `graft_fingerprint(text)` in the session's
    * function registry — the same extension mechanism the reference's
    * DuckDB-extension functions use (SURVEY §2B UDF row).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registered.once(spark, "fingerprint") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_fingerprint", exprs => Fingerprint(exprs.head), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_winnow_set", exprs => WinnowSet(exprs(0), exprs(1), exprs(2)),
        "built-in")
    }

  /** Column wrapper; requires [[register]] on the active session. */
  def fingerprint(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_fingerprint", c)
  }
}

/** `graft_winnow_set(text, k, w)` scalar expression: full winnowing
  * fingerprint set as ArrayType(LongType), null-safe, codegen'd via a
  * static call (no UDF serialization).
  */
case class WinnowSet(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(s: Any, k: Any, w: Any): Any =
    Fingerprints.winnowSet(s.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k, w) =>
      s"graft.functions.Fingerprints.winnowSet($s, $k, $w)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowSet =
    copy(first = newFirst, second = newSecond, third = newThird)
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
