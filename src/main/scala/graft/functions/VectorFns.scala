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
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_argmax_cell", es => ArgmaxDotCell(es(0), es(1)), "built-in")
    }

  /** Column wrapper; requires [[register]] on the active session. */
  def dotCol(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }

  /** Column wrapper for [[ArgmaxDotCell]]: `cents` must be a FOLDABLE
    * literal of `array<struct<_1:int,_2:array<double>>>` (a
    * `typedLit(Seq[(Int, Seq[Double])])`).
    */
  def argmaxCellCol(spark: SparkSession, vec: Column, cents: Column): Column = {
    register(spark)
    call_function("graft_argmax_cell", vec, cents)
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

/** `graft_argmax_cell(vec, cents)` — the IVF cell-assignment argmax as
  * ONE blocked expression: the id of the centroid with the maximum dot
  * product against `vec`, ties to the HIGHEST id (the `array_max` over
  * `struct(score, id)` tie-break).
  *
  * This replaces the per-centroid HOF pipeline
  * `array_max(transform(centsLit, c → struct(graft_dot(vec, c._2),
  * c._1)))`, whose cost at build time was dominated by plumbing, not
  * FLOPs: per corpus row × per centroid it extracted a struct field
  * into ArrayData, made a static dot call with per-element kind
  * dispatch and null checks, and allocated a result struct — at
  * N=2M × nlist=1414 that was 29.7–51.6 s of wall (PERF.md r12
  * ivf_scaled) for what is arithmetically ~180 GFLOP. Here the
  * centroid matrix is flattened ONCE per executor into a primitive
  * `double[]` (row-major, `nlist × dim`) and each row runs a tight
  * two-level loop — same multiply-add sequence in the same
  * left-to-right order as [[VectorFns.dot]], so scores and therefore
  * assignments are BIT-IDENTICAL (VectorFnsSpec pins this against the
  * HOF formulation, IvfIndexSpec's contract is unchanged).
  *
  * Degenerate-input contract (matches the HOF formulation exactly):
  * a vec whose length ≠ dim, or containing a null element, nulled
  * every dot, and `array_max` over all-null scores fell through to
  * the id tie-break → the MAX id. NaN elements propagate NaN scores,
  * and `java.lang.Double.compare` ranks NaN above every real score —
  * the same ordering Spark's struct comparison uses.
  *
  * `cents` must be FOLDABLE (a `typedLit`) — enforced at construction;
  * the centroid matrix is evaluated once lazily, not per row.
  */
case class ArgmaxDotCell(left: Expression, right: Expression)
    extends BinaryExpression {
  require(right.foldable,
    "graft_argmax_cell: centroid literal must be foldable")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable

  @transient private lazy val vecKind: Int = left.dataType match {
    case ArrayType(FloatType, _)   => 0
    case ArrayType(DoubleType, _)  => 1
    case ArrayType(LongType, _)    => 2
    case ArrayType(IntegerType, _) => 3
    case other =>
      throw new IllegalArgumentException(s"graft_argmax_cell: $other")
  }

  // (ids, flat row-major matrix, dim, max id) — parsed once per
  // executor from the foldable literal
  @transient private lazy val parsed: (Array[Int], Array[Double], Int, Int) = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(n > 0, "graft_argmax_cell: empty centroid list")
    val rows = (0 until n).map { i =>
      val s = arr.getStruct(i, 2)
      (s.getInt(0), s.getArray(1).toDoubleArray())
    }
    val dim = rows.head._2.length
    require(rows.forall(_._2.length == dim),
      "graft_argmax_cell: ragged centroid matrix")
    val ids = rows.map(_._1).toArray
    val flat = new Array[Double](n * dim)
    var i = 0
    while (i < n) {
      System.arraycopy(rows(i)._2, 0, flat, i * dim, dim); i += 1
    }
    (ids, flat, dim, ids.max)
  }

  /** Tight-loop argmax; called from both eval and generated code. */
  def compute(v: ArrayData): Int = {
    val (ids, flat, dim, maxId) = parsed
    if (v.numElements() != dim) return maxId
    val vd = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return maxId
      vd(j) = vecKind match {
        case 0 => v.getFloat(j).toDouble
        case 1 => v.getDouble(j)
        case 2 => v.getLong(j).toDouble
        case _ => v.getInt(j).toDouble
      }
      j += 1
    }
    var best = Double.NegativeInfinity
    var bestId = Int.MinValue
    var first = true
    var c = 0
    val n = ids.length
    while (c < n) {
      var s = 0.0
      val off = c * dim
      var k = 0
      while (k < dim) { s += vd(k) * flat(off + k); k += 1 }
      val cmp = java.lang.Double.compare(s, best)
      if (first || cmp > 0 || (cmp == 0 && ids(c) > bestId)) {
        best = s; bestId = ids(c); first = false
      }
      c += 1
    }
    bestId
  }

  override protected def nullSafeEval(v: Any, c: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the right child is a Literal — its genCode is a plan-constant
    // reference, so "evaluating" it per row below costs nothing
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val self = ctx.addReferenceObj("argmaxCell", this,
        classOf[ArgmaxDotCell].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgmaxDotCell =
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
