package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Double-precision vector dot product as a codegen'd Catalyst
  * expression — the same move [[LshFns]] made for LSH signatures: the
  * higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` in
  * [[graft.operators.Similarity.dotD]]) is semantically right but
  * evaluates its lambdas INTERPRETED, one closure call per element per
  * pair — at |Q|·|C| scored pairs the r8 bench measured brute-force
  * classify spending its whole budget there. This runs the identical
  * arithmetic as one compiled loop behind a static call.
  *
  * Bit-compatibility contract with the HOF formulation (pinned by
  * VectorFnsSpec): elements cast to double, products accumulated
  * left-to-right in double; a NULL element or a length mismatch yields
  * NULL (zip_with pads the shorter side with nulls, and null poisons
  * the HOF sum).
  */
object VectorFns {

  /** Element-kind codes for the static call (resolved at analysis). */
  private def kindOf(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _)   => 0
    case ArrayType(DoubleType, _)  => 1
    case ArrayType(LongType, _)    => 2
    case ArrayType(IntegerType, _) => 3
    case other =>
      throw new IllegalArgumentException(s"graft_dot: unsupported $other")
  }

  /** Static entry point — called from generated Java code. */
  def dot(a: ArrayData, aKind: Int, b: ArrayData, bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = aKind match {
        case 0 => a.getFloat(i).toDouble
        case 1 => a.getDouble(i)
        case 2 => a.getLong(i).toDouble
        case _ => a.getInt(i).toDouble
      }
      val y = bKind match {
        case 0 => b.getFloat(i).toDouble
        case 1 => b.getDouble(i)
        case 2 => b.getLong(i).toDouble
        case _ => b.getInt(i).toDouble
      }
      sum += x * y
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }

  /** Static entry point for L2 distance — same contract as [[dot]]
    * (null on mismatch/null element) but accumulating (x−y)² directly:
    * the sqrt(aa − 2ab + bb) composition would cancel catastrophically
    * for the near-identical vectors distance queries care most about.
    */
  def l2(a: ArrayData, aKind: Int, b: ArrayData, bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = aKind match {
        case 0 => a.getFloat(i).toDouble
        case 1 => a.getDouble(i)
        case 2 => a.getLong(i).toDouble
        case _ => a.getInt(i).toDouble
      }
      val y = bKind match {
        case 0 => b.getFloat(i).toDouble
        case 1 => b.getDouble(i)
        case 2 => b.getLong(i).toDouble
        case _ => b.getInt(i).toDouble
      }
      val d = x - y
      sum += d * d
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(sum))
  }

  def register(spark: SparkSession): Unit =
    Registered.once(spark, "vector") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", es => DotProduct(es(0), es(1)), "built-in")
    }

  /** Column wrapper; requires [[register]] on the active session. */
  def dotCol(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }

  private[functions] def kinds(l: Expression, r: Expression): (Int, Int) =
    (kindOf(l.dataType), kindOf(r.dataType))
}

/** `graft_dot(a, b)` scalar expression: double dot product, null-safe,
  * codegen'd via a static call.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null even for non-null inputs: length mismatch / null element
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (ak, bk) = VectorFns.kinds(left, right)
    VectorFns.dot(a.asInstanceOf[ArrayData], ak, b.asInstanceOf[ArrayData], bk)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ak, bk) = VectorFns.kinds(left, right)
      val r = ctx.freshName("dotRes")
      s"""
        java.lang.Double $r = graft.functions.VectorFns.dot($a, $ak, $b, $bk);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `list_distance(a, b)` scalar expression: double Euclidean distance,
  * null-safe, codegen'd via a static call — [[DotProduct]]'s twin with
  * direct (x−y)² accumulation (see [[VectorFns.l2]]).
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "list_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (ak, bk) = VectorFns.kinds(left, right)
    VectorFns.l2(a.asInstanceOf[ArrayData], ak, b.asInstanceOf[ArrayData], bk)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ak, bk) = VectorFns.kinds(left, right)
      val r = ctx.freshName("l2Res")
      s"""
        java.lang.Double $r = graft.functions.VectorFns.l2($a, $ak, $b, $bk);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}
