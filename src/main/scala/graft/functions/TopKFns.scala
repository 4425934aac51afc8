package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (Misra-Gries / space-saving) sketches as Catalyst
  * aggregates — the "top talkers" feed: top event types, top error
  * codes, top source hosts. Reference behavior: the engine's users run
  * `GROUP BY c ORDER BY count(*) DESC LIMIT k` over the whole corpus
  * (e.g. /root/reference docs' top-IP examples); at 100 TB that is a
  * full shuffle of every distinct value. A per-file mergeable sketch
  * in the colstats sidecar answers the same report from metadata.
  *
  * Same engineering shape as [[KllFns]] (DataSketches heap sketch in a
  * `TypedImperativeAggregate`), same registration pattern. DataSketches'
  * `ItemsSketch` guarantees: counts are exact while the internal map
  * has never evicted (`getMaximumError == 0`), and sketches MERGE with
  * summed error bounds — so "merged error == 0" proves the merged
  * counts exact, which is [[graft.lake.MetadataAggregateRule]]'s
  * serve gate (decline-unless-provably-exact, like every estimator in
  * the sidecar). In the exact regime the result is also independent of
  * partitioning/merge order, so the scan path and the metadata path
  * compute the identical array.
  */
object TopKFns {

  /** Max internal map size (power of 2). Tracks ~3/4·this many
    * distinct items exactly; past that the sketch goes lossy (error
    * bounds > 0) and the metadata serve gate declines.
    */
  val DefaultMapSize = 1024

  private val serde = new ArrayOfStringsSerDe()

  private[graft] def emptySketch(): ItemsSketch[String] =
    new ItemsSketch[String](DefaultMapSize)

  private[graft] def fromBlob(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  private[graft] def toBlob(sk: ItemsSketch[String]): Array[Byte] =
    sk.toByteArray(serde)

  /** Driver-side merge of per-file sidecar blobs. */
  private[graft] def mergeBlobs(
      blobs: Seq[Array[Byte]]): ItemsSketch[String] =
    blobs.foldLeft(emptySketch())((acc, b) => acc.merge(fromBlob(b)))

  /** Counts provably exact (no eviction anywhere in the merge tree). */
  private[graft] def isExact(sk: ItemsSketch[String]): Boolean =
    sk.getMaximumError == 0L

  /** Deterministic top-k: estimate DESC, then item ASC — the same
    * tie-break a `GROUP BY c ORDER BY count(*) DESC, c LIMIT k`
    * produces, so exact-regime results hash-match a SQL oracle.
    */
  private[graft] def topK(
      sk: ItemsSketch[String], k: Int): Seq[(String, Long)] =
    sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (item, est) => (-est, item) }
      .take(k).toSeq

  /** The result array as Catalyst internal data:
    * `array<struct<item string, cnt bigint>>`.
    */
  private[graft] def topKInternal(
      sk: ItemsSketch[String], k: Int): GenericArrayData =
    new GenericArrayData(topK(sk, k).map { case (item, cnt) =>
      InternalRow(UTF8String.fromString(item), cnt)
    }.toArray[Any])

  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  private def itemOf(dt: DataType, v: Any): String = dt match {
    case StringType => v.asInstanceOf[UTF8String].toString
    case LongType => v.asInstanceOf[Long].toString
    case IntegerType => v.asInstanceOf[Int].toString
    case ShortType => v.asInstanceOf[Short].toString
    case ByteType => v.asInstanceOf[Byte].toString
    case BooleanType => v.asInstanceOf[Boolean].toString
    case dt0 => throw new IllegalStateException(
      s"graft_topk: unsupported input type $dt0")
  }

  /** `graft_topk_sketch(col)` → binary frequent-items sketch of the
    * non-null values — the per-file sidecar feed.
    */
  case class TopKSketchAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

    override def prettyName: String = "graft_topk_sketch"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): ItemsSketch[String] =
      emptySketch()

    override def update(
        buf: ItemsSketch[String],
        input: InternalRow): ItemsSketch[String] = {
      val v = child.eval(input)
      if (v != null) buf.update(itemOf(child.dataType, v))
      buf
    }

    override def merge(
        a: ItemsSketch[String],
        b: ItemsSketch[String]): ItemsSketch[String] = { a.merge(b); a }

    override def eval(buf: ItemsSketch[String]): Any = toBlob(buf)
    override def serialize(buf: ItemsSketch[String]): Array[Byte] =
      toBlob(buf)
    override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
      fromBlob(bytes)

    override def withNewMutableAggBufferOffset(n: Int): TopKSketchAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): TopKSketchAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(
        newChild: Expression): TopKSketchAgg = copy(child = newChild)
  }

  /** `graft_topk(col, k)` → `array<struct<item, cnt>>`, the k most
    * frequent non-null values by estimated count (exact while the
    * sketch never evicts), ordered count DESC then item ASC.
    */
  case class TopKAgg(
      left: Expression, right: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with BinaryLike[Expression] {

    override def prettyName: String = "graft_topk"
    override def dataType: DataType = resultType
    override def nullable: Boolean = false

    def k: Int = right match {
      case Literal(v: Int, IntegerType) if v > 0 => v
      case _ => throw new IllegalArgumentException(
        "graft_topk: k must be a positive integer literal")
    }

    override def createAggregationBuffer(): ItemsSketch[String] = {
      k // validate eagerly: bad k fails at planning, not mid-scan
      emptySketch()
    }

    override def update(
        buf: ItemsSketch[String],
        input: InternalRow): ItemsSketch[String] = {
      val v = left.eval(input)
      if (v != null) buf.update(itemOf(left.dataType, v))
      buf
    }

    override def merge(
        a: ItemsSketch[String],
        b: ItemsSketch[String]): ItemsSketch[String] = { a.merge(b); a }

    override def eval(buf: ItemsSketch[String]): Any =
      topKInternal(buf, k)
    override def serialize(buf: ItemsSketch[String]): Array[Byte] =
      toBlob(buf)
    override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
      fromBlob(bytes)

    override def withNewMutableAggBufferOffset(n: Int): TopKAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): TopKAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TopKAgg =
      copy(left = newLeft, right = newRight)
  }

  private object Registered {
    private val done =
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
    def once(spark: SparkSession, key: String)(body: => Unit): Unit =
      done.synchronized { if (done.add(spark)) body }
  }

  def register(spark: SparkSession): Unit =
    Registered.once(spark, "graft_topk") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_topk",
        es => TopKAgg(es(0), es(1)).toAggregateExpression(), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_topk_sketch",
        es => TopKSketchAgg(es.head).toAggregateExpression(), "built-in")
    }

  /** Column-API faces. */
  def topk(spark: SparkSession, value: Column, k: Int): Column = {
    register(spark)
    call_function("graft_topk", value,
      org.apache.spark.sql.functions.lit(k))
  }

  def topkSketchAgg(spark: SparkSession, value: Column): Column = {
    register(spark)
    call_function("graft_topk_sketch", value)
  }
}
