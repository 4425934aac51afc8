package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** KLL quantile sketches as Catalyst aggregates — the per-file
  * equi-height-histogram feed for the colstats sidecar (r16 verdict
  * task 4). Same engineering shape as Spark's own `HllSketchAgg`
  * (a `TypedImperativeAggregate` over a DataSketches heap sketch:
  * per-row `update` mutates the buffer object in memory; the byte
  * serialization runs only at shuffle/spill boundaries), and the same
  * registration/exposure pattern as [[BloomFns]].
  *
  * Why KLL rather than per-file `percentile_approx` arrays: KLL
  * sketches MERGE with proven error bounds, so the table-level
  * histogram at `syncCatalogColumnStats` is a true union of the
  * per-file distributions — per-file quantile arrays can only be
  * re-sampled, which compounds error per merge and breaks on skewed
  * file row counts. DataSketches ships on every Spark classpath
  * (Spark's HLL functions use the same family).
  */
object KllFns {

  /** Sketch accuracy parameter: k=200 ⇒ ~1.65% rank error (99% conf),
    * ~few KB serialized — far finer than the 64-bin histogram it
    * feeds, at a per-(file, column) metadata cost.
    */
  val DefaultK = 200

  /** `graft_kll_agg(numericCol)` → binary KLL sketch of the non-null
    * values (doubles — same cast the zone maps use).
    */
  case class KllSketchAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

    override def prettyName: String = "graft_kll_agg"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(DefaultK)

    override def update(
        buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) {
        val d = child.dataType match {
          case DoubleType => v.asInstanceOf[Double]
          case FloatType => v.asInstanceOf[Float].toDouble
          case LongType => v.asInstanceOf[Long].toDouble
          case IntegerType => v.asInstanceOf[Int].toDouble
          case ShortType => v.asInstanceOf[Short].toDouble
          case ByteType => v.asInstanceOf[Byte].toDouble
          case _: DecimalType => v.asInstanceOf[Decimal].toDouble
          case dt => throw new IllegalStateException(
            s"graft_kll_agg: non-numeric input $dt")
        }
        if (!d.isNaN) buf.update(d)
      }
      buf
    }

    override def merge(
        a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    override def serialize(buf: KllDoublesSketch): Array[Byte] =
      buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(
        newChild: Expression): KllSketchAgg = copy(child = newChild)
  }

  /** `graft_kll_merge(sketchBinary)` → binary union of KLL sketches —
    * the sync-time rollup of per-file sketches into one table-level
    * distribution (the `hll_union_agg` twin).
    */
  case class KllMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

    override def prettyName: String = "graft_kll_merge"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(DefaultK)

    override def update(
        buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null)
        buf.merge(KllDoublesSketch.heapify(
          Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }

    override def merge(
        a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    override def serialize(buf: KllDoublesSketch): Array[Byte] =
      buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(
        newChild: Expression): KllMergeAgg = copy(child = newChild)
  }

  /** `graft_kll_quantile(sketchBinary, p)` → the sketch's INCLUSIVE
    * quantile at `p`; null for an empty sketch. Scalar (rollup rows
    * and sidecar rows are metadata-sized — interpreted eval is fine).
    */
  case class KllQuantile(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_kll_quantile"

    override protected def nullSafeEval(blob: Any, p: Any): Any = {
      val sk = KllDoublesSketch.heapify(
        Memory.wrap(blob.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null
      else {
        val prob = p match {
          case d: Double => d
          case f: Float => f.toDouble
          case dec: Decimal => dec.toDouble
          case n: Number => n.doubleValue
        }
        sk.getQuantile(prob, QuantileSearchCriteria.INCLUSIVE)
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): KllQuantile =
      copy(left = newLeft, right = newRight)
  }

  def register(spark: SparkSession): Unit =
    Registered.once(spark, "kll") {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_kll_agg",
        es => KllSketchAgg(es.head).toAggregateExpression(), "built-in")
      reg.createOrReplaceTempFunction("graft_kll_merge",
        es => KllMergeAgg(es.head).toAggregateExpression(), "built-in")
      reg.createOrReplaceTempFunction("graft_kll_quantile",
        es => KllQuantile(es(0), es(1)), "built-in")
    }

  /** Quantile of a sketch-binary column. */
  def kllQuantile(spark: SparkSession, sketch: Column, p: Double): Column = {
    register(spark)
    call_function("graft_kll_quantile", sketch,
      org.apache.spark.sql.functions.lit(p))
  }

  /** Aggregate a numeric column into a KLL sketch (binary). */
  def kllAgg(spark: SparkSession, value: Column): Column = {
    register(spark)
    call_function("graft_kll_agg", value)
  }

  /** Union a column of KLL sketch binaries into one sketch. */
  def kllMerge(spark: SparkSession, sketch: Column): Column = {
    register(spark)
    call_function("graft_kll_merge", sketch)
  }

  /** Catalyst equi-height histogram from a merged sketch: `numBins`
    * bins of ~`n/numBins` rows each, boundaries at the sketch's
    * inclusive quantiles. Per-bin NDV is approximated (the sketch
    * orders values, it doesn't count distincts): a bin whose bounds
    * coincide holds ONE hot value (ndv 1 — the skew case histograms
    * exist for); otherwise the column's total NDV spreads evenly,
    * capped by the bin's row height. `None` when the sketch is empty.
    */
  def equiHeightHistogram(
      bytes: Array[Byte], numBins: Int,
      totalNdv: Long): Option[Histogram] = {
    require(numBins > 0, s"numBins must be positive: $numBins")
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) return None
    val n = sk.getN
    val height = n.toDouble / numBins
    val bounds = (0 to numBins).map(i =>
      sk.getQuantile(i.toDouble / numBins,
        QuantileSearchCriteria.INCLUSIVE)).toArray
    val spreadNdv = math.max(1L, math.min(math.round(height),
      math.max(1L, totalNdv / numBins)))
    val bins = (0 until numBins).map { i =>
      val lo = bounds(i)
      val hi = bounds(i + 1)
      HistogramBin(lo, hi, if (lo == hi) 1L else spreadNdv)
    }.toArray
    Some(Histogram(height, bins))
  }
}
