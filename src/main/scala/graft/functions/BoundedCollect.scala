package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `graft_bounded_collect(v, maxPlusOne)` — collect_list that stops
  * accumulating past `maxPlusOne` elements.
  *
  * The building block of single-pass bucket capping
  * ([[graft.operators.BucketCap.cappedBuckets]]): a degenerate inverted-
  * index bucket (the billion-posting empty-string shingle) must be
  * DETECTED without ever being HELD. A plain `collect_list` holds the
  * whole bucket in one aggregation buffer before the size check can
  * run; this aggregate's buffer is capped at `maxPlusOne` elements
  * (`update` and `merge` both stop appending at the cap), so per-key
  * state is O(maxPlusOne) regardless of bucket size, and
  * `size(result) = maxPlusOne` is the overflow signal — the caller
  * filters `size <= max` to drop oversized buckets exactly.
  *
  * Which elements survive in an overflowing bucket is input-order-
  * dependent (first-seen wins per partial buffer) — irrelevant to the
  * capping use, where overflowing buckets are dropped whole. NULL
  * values are skipped, like `collect_list`.
  */
case class BoundedCollect(
    child: Expression,
    limitExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  private lazy val limit: Int = limitExpr.eval(InternalRow.empty) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_bounded_collect limit must be an integer literal, got $other")
  }
  require(limitExpr.foldable, "graft_bounded_collect limit must be a literal")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_collect"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(
      buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length < limit) {
      val v = child.eval(input)
      // copy: unsafe-backed values (UTF8String, arrays) are reused
      // across rows by the scan
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buf.length < limit && it.hasNext) buf += it.next()
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    mutable.ArrayBuffer.from(row.getArray(0).toObjectArray(child.dataType))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollect =
    copy(child = newChild)
}

object BoundedCollect {

  def register(spark: SparkSession): Unit =
    Registered.once(spark, "bounded_collect") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bounded_collect",
        exprs => BoundedCollect(exprs(0), exprs(1)), "built-in")
    }

  /** Column wrapper; registers on the value's session lazily via the
    * caller-supplied session.
    */
  def boundedCollect(spark: SparkSession, v: Column, maxPlusOne: Int): Column = {
    register(spark)
    call_function("graft_bounded_collect", v, lit(maxPlusOne))
  }
}
