package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** `graft_quantile(col, p)` — approximate quantile with DEFINED
  * estimator semantics: a KLL doubles sketch at k = [[KllFns.DefaultK]]
  * (±~1.65% rank error at 99% confidence), INCLUSIVE search, NaN
  * skipped — exactly the sketch the `_graft_colstats` sidecar
  * maintains per (file, numeric column) for the CBO histograms. That
  * shared definition lets [[graft.lake.MetadataAggregateRule]] answer
  * `SELECT graft_quantile(value, 0.5) FROM t` by MERGING the per-file
  * sidecar KLL blobs — zero data-file reads — while the scanned
  * fallback builds the same sketch over the rows: both paths estimate
  * the same quantity within the sketch's published rank error. The
  * `ndv`/HLL twin for distributions (see [[NdvFns]] for the
  * scan-derived-estimator argument: Spark's own `percentile_approx`
  * names a different estimator and is never rewritten).
  */
object QuantileFns {

  private def heap(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Quantile of a serialized KLL blob; None when the sketch is empty
    * (SQL: quantile of no rows is null).
    */
  def blobQuantile(blob: Array[Byte], p: Double): Option[Double] = {
    val sk = heap(blob)
    if (sk.isEmpty) None
    else Some(sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE))
  }

  /** Driver-side merge of per-file blobs → one blob (the metadata
    * partial for band hybrids and the pure-metadata answer).
    */
  def mergeBlobs(blobs: Iterable[Array[Byte]]): Array[Byte] = {
    val acc = KllDoublesSketch.newHeapInstance(KllFns.DefaultK)
    blobs.foreach(b => acc.merge(heap(b)))
    acc.toByteArray
  }

  private def numericToDouble(v: Any, dt: DataType): Double = dt match {
    case DoubleType => v.asInstanceOf[Double]
    case FloatType => v.asInstanceOf[Float].toDouble
    case LongType => v.asInstanceOf[Long].toDouble
    case IntegerType => v.asInstanceOf[Int].toDouble
    case ShortType => v.asInstanceOf[Short].toDouble
    case ByteType => v.asInstanceOf[Byte].toDouble
    case _: DecimalType => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalStateException(
      s"graft_quantile: non-numeric input $other")
  }

  /** The user-facing aggregate: scan-path twin of the sidecar KLL. */
  case class QuantileAgg(
      left: Expression, right: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with BinaryLike[Expression] {

    override def prettyName: String = "graft_quantile"
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    /** Fail at ANALYSIS, not mid-scan: the value operand must be
      * numeric and the probability a foldable numeric constant.
      */
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      if (!left.dataType.isInstanceOf[NumericType])
        TypeCheckFailure(
          s"graft_quantile: value must be numeric, got ${left.dataType.sql}")
      else if (!right.foldable ||
        !right.dataType.isInstanceOf[NumericType])
        TypeCheckFailure(
          "graft_quantile: p must be a numeric constant in [0, 1]")
      else TypeCheckSuccess
    }

    /** The probability operand must fold to a constant — the sketch
      * is rank-agnostic, but a per-row p has no aggregate meaning.
      */
    lazy val prob: Double = {
      require(right.foldable,
        "graft_quantile: p must be a constant")
      val v = right.eval(InternalRow.empty)
      require(v != null, "graft_quantile: p must not be null")
      val p = numericToDouble(v, right.dataType)
      require(p >= 0.0 && p <= 1.0,
        s"graft_quantile: p must be in [0, 1], got $p")
      p
    }

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(KllFns.DefaultK)

    override def update(
        buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = left.eval(input)
      if (v != null) {
        val d = numericToDouble(v, left.dataType)
        if (!d.isNaN) buf.update(d) // sidecar KLL skips NaN too
      }
      buf
    }

    override def merge(
        a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }

    override def eval(buf: KllDoublesSketch): Any =
      if (buf.isEmpty) null
      else buf.getQuantile(prob, QuantileSearchCriteria.INCLUSIVE)

    override def serialize(buf: KllDoublesSketch): Array[Byte] =
      buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      heap(bytes)

    override def withNewMutableAggBufferOffset(n: Int): QuantileAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): QuantileAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): QuantileAgg =
      copy(left = newLeft, right = newRight)
  }

  /** Union a column of KLL BLOBS into the quantile — the band
    * hybrid's final merge (local merged blob ∪ straddler sketch from
    * [[KllFns.KllSketchAgg]]).
    */
  case class QuantileUnionAgg(
      left: Expression, right: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with BinaryLike[Expression] {

    override def prettyName: String = "graft_quantile_union"
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    lazy val prob: Double =
      numericToDouble(right.eval(InternalRow.empty), right.dataType)

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(KllFns.DefaultK)

    override def update(
        buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = left.eval(input)
      if (v != null) buf.merge(heap(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(
        a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }

    override def eval(buf: KllDoublesSketch): Any =
      if (buf.isEmpty) null
      else buf.getQuantile(prob, QuantileSearchCriteria.INCLUSIVE)

    override def serialize(buf: KllDoublesSketch): Array[Byte] =
      buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      heap(bytes)

    override def withNewMutableAggBufferOffset(n: Int): QuantileUnionAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): QuantileUnionAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): QuantileUnionAgg =
      copy(left = newLeft, right = newRight)
  }

  def register(spark: SparkSession): Unit =
    Registered.once(spark, "graft_quantile") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_quantile",
        es => QuantileAgg(es.head, es(1)).toAggregateExpression(),
        "built-in")
    }

  /** Column-API face: `graft_quantile(col, p)`. */
  def quantile(spark: SparkSession, value: Column, p: Double): Column = {
    register(spark)
    call_function("graft_quantile", value,
      org.apache.spark.sql.functions.lit(p))
  }
}
