package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH signatures as a real codegen'd Catalyst
  * expression.
  *
  * The previous formulation (nested `transform`/`zip_with`/`aggregate`
  * in [[graft.operators.Similarity]]) was semantically right but
  * higher-order functions evaluate their lambdas INTERPRETED — tables
  * × bits × dim expression evaluations per row (6k+ at the default
  * shape) dominated every LSH query's runtime. This expression runs
  * the same arithmetic as one compiled loop behind a static call, so
  * the signature stays inside WholeStageCodegen like any builtin.
  *
  * Bit-compatibility contract with the old column formulation (pinned
  * by LshFnsSpec): hyperplane (t·bits+i), dimension d draws its
  * Rademacher sign from bit 0 of `xxhash64(p·1000003 + d)` (seed 42 —
  * Spark's default), the projection accumulates left-to-right in
  * double, and bucket_t packs the bits MSB-first via
  * `acc·2 + (sum >= 0)`.
  */
object LshFns {

  /** Static entry point — called from generated Java code. */
  def buckets(vec: ArrayData, elemIsDouble: Boolean,
      tables: Int, bits: Int): ArrayData = {
    val dim = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < bits) {
        val p = t.toLong * bits + i
        var sum = 0.0
        var d = 0
        while (d < dim) {
          val x = if (elemIsDouble) vec.getDouble(d)
                  else vec.getFloat(d).toDouble
          val h = XXH64.hashLong(p * 1000003L + d, 42L)
          sum += (if ((h & 1L) == 0L) x else -x)
          d += 1
        }
        bucket = bucket * 2 + (if (sum >= 0) 1L else 0L)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    Registered.once(spark, "lsh") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_lsh_buckets",
        es => LshBuckets(es(0), es(1), es(2)), "built-in")
    }

  /** Column wrapper; requires [[register]] on the active session. */
  def lshBucketsCol(spark: SparkSession, vec: Column,
      tables: Int, bits: Int): Column = {
    register(spark)
    call_function("graft_lsh_buckets", vec, lit(tables), lit(bits))
  }
}

/** `graft_lsh_buckets(vec, tables, bits)` scalar expression:
  * ArrayType(LongType) of per-table sign-sketch buckets, null-safe,
  * codegen'd via a static call.
  */
case class LshBuckets(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  private def elemIsDouble: Boolean = first.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any, t: Any, b: Any): Any =
    LshFns.buckets(v.asInstanceOf[ArrayData], elemIsDouble,
      t.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, t, b) =>
      s"graft.functions.LshFns.buckets($v, $elemIsDouble, $t, $b)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LshBuckets =
    copy(first = newFirst, second = newSecond, third = newThird)
}
