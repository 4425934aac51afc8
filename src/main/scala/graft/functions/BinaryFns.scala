package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static byte-level helpers for multimodal binary columns, called from
  * generated code (whole-stage codegen, no UDF serialization). Magic
  * signatures and image-header layouts are public format knowledge
  * (PNG: RFC 2083 §3.1/§4.1.1; GIF: GIF89a spec; JPEG: ISO/IEC 10918
  * marker structure; BMP/RIFF/PDF/ZIP/GZIP magic bytes).
  */
object BinaryUtil {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def starts(b: Array[Byte], sig: Int*): Boolean =
    b.length >= sig.length && sig.indices.forall(i => u8(b, i) == sig(i))

  /** Container sniff from magic bytes; "unknown" when unrecognized. */
  def magic(b: Array[Byte]): UTF8String = UTF8String.fromString {
    if (b == null || b.length < 4) "unknown"
    else if (starts(b, 0x89, 0x50, 0x4e, 0x47)) "png"
    else if (starts(b, 0x47, 0x49, 0x46, 0x38)) "gif"
    else if (starts(b, 0xff, 0xd8, 0xff)) "jpeg"
    else if (starts(b, 0x42, 0x4d)) "bmp"
    else if (starts(b, 0x52, 0x49, 0x46, 0x46)) "riff"
    else if (starts(b, 0x25, 0x50, 0x44, 0x46)) "pdf"
    else if (starts(b, 0x50, 0x4b, 0x03, 0x04)) "zip"
    else if (starts(b, 0x1f, 0x8b)) "gzip"
    else if (starts(b, 0x4f, 0x67, 0x67, 0x53)) "ogg"
    else if (b.length >= 12 && starts(b, 0x00, 0x00, 0x00) &&
      u8(b, 4) == 0x66 && u8(b, 5) == 0x74 && u8(b, 6) == 0x79 &&
      u8(b, 7) == 0x70) "mp4"
    else "unknown"
  }

  /** Image width from the container header; -1 if not parseable. */
  def imageWidth(b: Array[Byte]): Int = dims(b)._1

  /** Image height from the container header; -1 if not parseable. */
  def imageHeight(b: Array[Byte]): Int = dims(b)._2

  private def dims(b: Array[Byte]): (Int, Int) = {
    if (b == null || b.length < 10) return (-1, -1)
    if (starts(b, 0x89, 0x50, 0x4e, 0x47)) {
      // PNG: IHDR must be first chunk; width/height big-endian at 16/20
      if (b.length >= 24) (be32(b, 16), be32(b, 20)) else (-1, -1)
    } else if (starts(b, 0x47, 0x49, 0x46, 0x38)) {
      // GIF: logical screen descriptor, little-endian at 6/8
      (le16(b, 6), le16(b, 8))
    } else if (starts(b, 0x42, 0x4d)) {
      // BMP: BITMAPINFOHEADER, little-endian at 18/22
      if (b.length >= 26) (le32(b, 18), le32(b, 22)) else (-1, -1)
    } else if (starts(b, 0xff, 0xd8, 0xff)) {
      // JPEG: scan markers for SOF0/1/2 (not C4/C8/CC); dims big-endian
      var i = 2
      while (i + 9 < b.length) {
        if (u8(b, i) != 0xff) return (-1, -1)
        val m = u8(b, i + 1)
        if (m == 0xff) { i += 1 } // fill byte
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
          m != 0xcc) {
          return (be16(b, i + 7), be16(b, i + 5))
        } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) { i += 2 }
        else i += 2 + be16(b, i + 2)
      }
      (-1, -1)
    } else (-1, -1)
  }

  // ---- column API ------------------------------------------------------

  /** Register `graft_magic(bin)`, `graft_image_width(bin)`,
    * `graft_image_height(bin)` in the session function registry (the
    * same extension surface as the fingerprint functions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registered.once(spark, "binary") {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction(
        "graft_magic", exprs => MagicType(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_image_width", exprs => ImageWidth(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_image_height", exprs => ImageHeight(exprs.head), "built-in")
    }

  def magicCol(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_magic", c)
  }
  def widthCol(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_image_width", c)
  }
  def heightCol(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_image_height", c)
  }
}

/** `graft_magic(binary)` — container type sniff, codegen'd. */
case class MagicType(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    BinaryUtil.magic(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BinaryUtil.magic($c)")
  override protected def withNewChildInternal(newChild: Expression): MagicType =
    copy(child = newChild)
}

/** `graft_image_width(binary)` — header-parsed width, NULL when the
  * container has no parseable dimensions.
  */
case class ImageWidth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val w = BinaryUtil.imageWidth(input.asInstanceOf[Array[Byte]])
    if (w < 0) null else w
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      int graftW = graft.functions.BinaryUtil.imageWidth($c);
      if (graftW < 0) { ${ev.isNull} = true; } else { ${ev.value} = graftW; }
    """)
  override protected def withNewChildInternal(newChild: Expression): ImageWidth =
    copy(child = newChild)
}

/** `graft_image_height(binary)` — header-parsed height, NULL when the
  * container has no parseable dimensions.
  */
case class ImageHeight(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val h = BinaryUtil.imageHeight(input.asInstanceOf[Array[Byte]])
    if (h < 0) null else h
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      int graftH = graft.functions.BinaryUtil.imageHeight($c);
      if (graftH < 0) { ${ev.isNull} = true; } else { ${ev.value} = graftH; }
    """)
  override protected def withNewChildInternal(newChild: Expression): ImageHeight =
    copy(child = newChild)
}
