package graft.functions

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** `ndv(col)` — approximate distinct count with DEFINED estimator
  * semantics: a DataSketches HLL sketch at lgConfigK = [[NdvFns.LgK]],
  * the same family and parameter the `_graft_colstats` sidecar
  * maintains per file (Lake.appendColStats). That shared definition is
  * the point: [[graft.lake.MetadataAggregateRule]] can answer
  * `SELECT ndv(c) FROM t` by UNIONING the per-file sidecar sketches —
  * zero data-file reads — and the scanned fallback computes the same
  * sketch over the rows, so both paths estimate the same quantity
  * within the sketch's published error (±~1.6% at lgK 12, 2σ).
  *
  * Deliberately NOT a rewrite of Spark's `approx_count_distinct` or
  * `hll_sketch_estimate(hll_sketch_agg(..))`: those name a specific
  * estimator over a specific traversal and their values must stay
  * scan-derived (a sketch built by streaming rows keeps a history-
  * dependent HIP estimate that a union of parts cannot reproduce
  * bit-for-bit). `ndv` names the mergeable quantity instead — the
  * reference surfaces the same NDV through `tailpipe table analyze`
  * style introspection (DuckDB's approx stats), here exposed as a
  * first-class aggregate.
  *
  * Value hashing mirrors Spark's `HllSketchAgg` (int/long → the long
  * slot, string → UTF8 bytes, binary → bytes) so per-file sidecar
  * sketches built by `hll_sketch_agg` and scan-path sketches built
  * here agree on what "a value" is; other types hash their string
  * form (the sidecar casts the same way).
  */
object NdvFns {

  /** Must match the sidecar's `hll_sketch_agg` default (lgConfigK=12):
    * the metadata path unions sidecar sketches, and HLL unions require
    * compatible K.
    */
  val LgK = 12

  /** Round exactly as Spark's `hll_sketch_estimate` does, so the two
    * surfaces report identically-shaped numbers.
    */
  def estimate(sk: HllSketch): Long = Math.round(sk.getEstimate)

  /** Union per-file sketch blobs → the table/group estimate; the
    * metadata-answer path of the rule.
    */
  def unionEstimate(blobs: Iterable[Array[Byte]]): Long = {
    val u = new Union(LgK)
    blobs.foreach(b => u.update(HllSketch.heapify(Memory.wrap(b))))
    Math.round(u.getResult(TgtHllType.HLL_8).getEstimate)
  }

  /** Estimate of one serialized sketch/union blob. */
  def blobEstimate(blob: Array[Byte]): Long =
    Math.round(HllSketch.heapify(Memory.wrap(blob)).getEstimate)

  case class NdvAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

    import org.apache.spark.sql.types._

    override def prettyName: String = "ndv"
    override def dataType: DataType = LongType
    override def nullable: Boolean = false

    // a Union as the buffer (not a raw HllSketch): merges are then
    // native, and a union of unions equals a union of the parts
    override def createAggregationBuffer(): Union = new Union(LgK)

    override def update(buf: Union, input: InternalRow): Union =
      NdvFns.updateUnion(buf, child, input)

    override def merge(a: Union, b: Union): Union = {
      a.update(b.getResult(TgtHllType.HLL_8)); a
    }

    override def eval(buf: Union): Any =
      Math.round(buf.getResult(TgtHllType.HLL_8).getEstimate)

    override def serialize(buf: Union): Array[Byte] =
      buf.getResult(TgtHllType.HLL_8).toUpdatableByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = new Union(LgK)
      u.update(HllSketch.heapify(Memory.wrap(bytes)))
      u
    }

    override def withNewMutableAggBufferOffset(n: Int): NdvAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): NdvAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(
        newChild: Expression): NdvAgg = copy(child = newChild)
  }

  /** Union blob of per-file sketch blobs — driver-side twin of the
    * plan-side [[NdvUnionAgg]], used by the band hybrid's LOCAL slot.
    */
  def unionBlob(blobs: Iterable[Array[Byte]]): Array[Byte] = {
    val u = new Union(LgK)
    blobs.foreach(b => u.update(HllSketch.heapify(Memory.wrap(b))))
    u.getResult(TgtHllType.HLL_8).toUpdatableByteArray
  }

  /** [[NdvAgg]] that evals to the sketch BYTES instead of the
    * estimate — the band hybrid's straddler-scan partial (sketches
    * union exactly; estimates don't add).
    */
  case class NdvSketchAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

    import org.apache.spark.sql.types._

    override def prettyName: String = "ndv_sketch"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Union = new Union(LgK)
    override def update(buf: Union, input: InternalRow): Union =
      NdvFns.updateUnion(buf, child, input)
    override def merge(a: Union, b: Union): Union = {
      a.update(b.getResult(TgtHllType.HLL_8)); a
    }
    override def eval(buf: Union): Any =
      buf.getResult(TgtHllType.HLL_8).toUpdatableByteArray
    override def serialize(buf: Union): Array[Byte] =
      buf.getResult(TgtHllType.HLL_8).toUpdatableByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = new Union(LgK)
      u.update(HllSketch.heapify(Memory.wrap(bytes)))
      u
    }
    override def withNewMutableAggBufferOffset(n: Int): NdvSketchAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): NdvSketchAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(
        newChild: Expression): NdvSketchAgg = copy(child = newChild)
  }

  /** Union a column of sketch BLOBS into the estimate — the band
    * hybrid's final merge over (local union blob ∪ straddler blob).
    */
  case class NdvUnionAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

    import org.apache.spark.sql.types._

    override def prettyName: String = "ndv_union"
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Union = new Union(LgK)
    override def update(buf: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null)
        buf.update(HllSketch.heapify(
          Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }
    override def merge(a: Union, b: Union): Union = {
      a.update(b.getResult(TgtHllType.HLL_8)); a
    }
    override def eval(buf: Union): Any =
      Math.round(buf.getResult(TgtHllType.HLL_8).getEstimate)
    override def serialize(buf: Union): Array[Byte] =
      buf.getResult(TgtHllType.HLL_8).toUpdatableByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = new Union(LgK)
      u.update(HllSketch.heapify(Memory.wrap(bytes)))
      u
    }
    override def withNewMutableAggBufferOffset(n: Int): NdvUnionAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): NdvUnionAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(
        newChild: Expression): NdvUnionAgg = copy(child = newChild)
  }

  /** Shared per-row update (NdvAgg + NdvSketchAgg): the hashing
    * contract documented on the object.
    */
  private[functions] def updateUnion(
      buf: Union, child: Expression, input: InternalRow): Union = {
    import org.apache.spark.sql.types._
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case ByteType => buf.update(v.asInstanceOf[Byte].toLong)
      case ShortType => buf.update(v.asInstanceOf[Short].toLong)
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case LongType => buf.update(v.asInstanceOf[Long])
      case StringType => buf.update(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => buf.update(v.asInstanceOf[Array[Byte]])
      case _ => buf.update(v.toString)
    }
    buf
  }

  def register(spark: SparkSession): Unit =
    Registered.once(spark, "ndv") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "ndv", es => NdvAgg(es.head).toAggregateExpression(), "built-in")
    }

  /** Column-API face: `ndv(col)`. */
  def ndv(spark: SparkSession, value: Column): Column = {
    register(spark)
    call_function("ndv", value)
  }
}
