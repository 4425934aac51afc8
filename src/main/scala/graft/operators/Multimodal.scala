package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BinaryUtil

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: payloads are opaque `binary` columns with typed,
  * oracle-checkable metadata; per-row stats are codegen'd Catalyst
  * expressions (graft.functions.BinaryFns); heavier decode/feature
  * stages are partition-parallel batch transforms.
  *
  * 100 TB design: stats are one narrow projection over the payload
  * column (no shuffle, whole-stage codegen); feature extraction is
  * `mapPartitions` so a real decoder amortizes model/codec init once
  * per partition and streams rows — the Scala analogue of a
  * `mapInPandas` batch UDF. Payload bytes never shuffle unless the
  * caller asks for them.
  */
object Multimodal {

  /** Append per-row binary stats: `size_bytes`, `sha256` (raw-byte
    * digest, hex), `magic` (container sniff), `width`/`height`
    * (header-parsed, NULL for non-image payloads).
    */
  def withBinaryStats(
      spark: SparkSession, df: DataFrame, binCol: String): DataFrame =
    df.withColumn("size_bytes", length(col(binCol)))
      .withColumn("sha256", lower(sha2(col(binCol), 256)))
      .withColumn("magic", BinaryUtil.magicCol(spark, col(binCol)))
      .withColumn("width", BinaryUtil.widthCol(spark, col(binCol)))
      .withColumn("height", BinaryUtil.heightCol(spark, col(binCol)))

  /** One extracted feature batch row. */
  final case class Feature(id: Long, magic: String, features: Array[Float])

  /** Feature extraction over binary payloads, partition-parallel.
    *
    * The Spark plumbing here is real (schema, batch shape, partition
    * iteration); the DECODER IS A DETERMINISTIC STUB — this container
    * has no image/audio codecs, so `decode` mixes payload bytes into a
    * fixed-dim vector. Swap [[stubDecode]] for a real codec (JNI
    * decoder, ONNX runtime, …) without touching the dataflow: init
    * happens once per PARTITION (the `mapPartitions` closure), rows
    * stream through it.
    *
    * @param dim feature vector dimension
    */
  def extractFeatures(
      spark: SparkSession, df: DataFrame, idCol: String, binCol: String,
      dim: Int = 16): DataFrame = {
    val ds = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it =>
      // per-partition init of a real decoder would go here
      it.map { case (id, bytes) =>
        Feature(id, BinaryUtil.magic(bytes).toString,
          stubDecode(bytes, dim))
      }
    }(Encoders.product[Feature]).toDF()
  }

  /** STUB decoder: deterministic byte-mixing in place of a codec.
    * Real decode (image resize, audio frames, video frame-sampling)
    * requires codec libraries not present in this environment.
    */
  private[operators] def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < bytes.length) {
      out(i % dim) = out(i % dim) + (bytes(i) & 0xff) / 255f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / (bytes.length.toFloat / dim); j += 1 }
    out
  }

  /** Fixed-offset frame sampling over a binary payload: `n` evenly
    * spaced slices of `frameLen` bytes — the dataflow shape of video
    * frame extraction (real frame boundaries need a demuxer; the
    * slicing is the deterministic stand-in). Row-local, no shuffle.
    */
  def sampleFrames(df: DataFrame, binCol: String, n: Int,
      frameLen: Int): DataFrame = {
    val total = length(col(binCol))
    val frames = sequence(lit(0), lit(n - 1)).cast("array<int>")
    df.withColumn("frames",
      transform(frames, i => {
        val off = (i * greatest(total - frameLen, lit(0)) /
          math.max(n - 1, 1)).cast("int")
        struct(off.as("offset"),
          substring(col(binCol), off + 1, lit(frameLen)).as("bytes"))
      }))
  }
}
