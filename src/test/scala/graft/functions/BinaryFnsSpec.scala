package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.operators.Multimodal

class BinaryFnsSpec extends AnyFunSuite with SparkTest {

  private def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // a 33x17 PNG: sig + IHDR(len, tag, w=0x21, h=0x11, meta)
  private val png = hexBytes(
    "89504e470d0a1a0a0000000d49484452" + "00000021" + "00000011" +
      "0806000000" + "deadbeef")
  // a 300x200 GIF89a (LE: 0x012c, 0x00c8)
  private val gif = hexBytes("474946383961" + "2c01" + "c800" + "f70000" + "00")
  // a JPEG with SOF0 h=0x0100(256), w=0x0180(384)
  private val jpeg = hexBytes(
    "ffd8" + "ffc0" + "0011" + "08" + "0100" + "0180" +
      "03011100021101031101" + "ffd9")
  private val pdf = "%PDF-1.4 stub".getBytes("UTF-8")

  test("magic sniffs containers from leading bytes") {
    assert(BinaryUtil.magic(png).toString == "png")
    assert(BinaryUtil.magic(gif).toString == "gif")
    assert(BinaryUtil.magic(jpeg).toString == "jpeg")
    assert(BinaryUtil.magic(pdf).toString == "pdf")
    assert(BinaryUtil.magic(Array[Byte](1, 2, 3, 4)).toString == "unknown")
  }

  test("image dims parse from PNG/GIF/JPEG headers; -1 otherwise") {
    assert(BinaryUtil.imageWidth(png) == 33 && BinaryUtil.imageHeight(png) == 17)
    assert(BinaryUtil.imageWidth(gif) == 300 && BinaryUtil.imageHeight(gif) == 200)
    assert(BinaryUtil.imageWidth(jpeg) == 384 && BinaryUtil.imageHeight(jpeg) == 256)
    assert(BinaryUtil.imageWidth(pdf) == -1)
  }

  test("expressions run codegen'd over a DataFrame, null dims for pdf") {
    import spark.implicits._
    val df = Seq(("png", png), ("gif", gif), ("jpeg", jpeg), ("pdf", pdf))
      .toDF("kind", "payload")
    val out = Multimodal.withBinaryStats(spark, df, "payload")
      .select("kind", "magic", "width", "height", "size_bytes", "sha256")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3))))
      .toMap
    assert(out("png") == (("png", Some(33), Some(17))))
    assert(out("gif") == (("gif", Some(300), Some(200))))
    assert(out("jpeg") == (("jpeg", Some(384), Some(256))))
    assert(out("pdf") == (("pdf", None, None)))
  }

  test("sha256 stat matches MessageDigest over raw bytes") {
    import spark.implicits._
    val df = Seq(Tuple1(png)).toDF("payload")
    val got = Multimodal.withBinaryStats(spark, df, "payload")
      .select("sha256").collect().head.getString(0)
    val want = MessageDigest.getInstance("SHA-256").digest(png)
      .map("%02x".format(_)).mkString
    assert(got == want)
  }

  test("extractFeatures: partition-parallel stub decode, stable schema") {
    import spark.implicits._
    val df = Seq((1L, png), (2L, gif)).toDF("id", "payload")
    val feats = Multimodal.extractFeatures(spark, df, "id", "payload", dim = 8)
    assert(feats.columns.toSeq == Seq("id", "magic", "features"))
    val rows = feats.orderBy("id").collect()
    assert(rows(0).getAs[String]("magic") == "png")
    assert(rows(0).getAs[scala.collection.Seq[Float]]("features").length == 8)
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, df, "id", "payload", dim = 8)
      .orderBy("id").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("sampleFrames slices n evenly spaced frames row-locally") {
    import spark.implicits._
    val payload = (0 until 100).map(_.toByte).toArray
    val df = Seq(Tuple1(payload)).toDF("payload")
    val frames = Multimodal.sampleFrames(df, "payload", n = 4, frameLen = 10)
      .select(explode(col("frames")).as("f"))
      .select("f.offset", "f.bytes").collect()
    assert(frames.length == 4)
    assert(frames.map(_.getInt(0)).toSeq == Seq(0, 30, 60, 90))
    assert(frames.forall(_.getAs[Array[Byte]](1).length == 10))
  }
}
