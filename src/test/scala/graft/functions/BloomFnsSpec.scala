package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The two bloom guarantees the decontamination prefilter leans on:
  * NO false negatives (soundness — a miss would silently drop a
  * contaminated document) and a bounded false-positive rate at the
  * sized bits/item (efficiency — fps only cost wasted exact checks).
  */
class BloomFnsSpec extends AnyFunSuite with SparkTest {

  test("bloom has no false negatives and bounded false positives") {
    import spark.implicits._
    val members = (0L until 1000L).map(i => s"member-$i").toDF("v")
    val sketch = members
      .agg(BloomFns.bloomAgg(spark, col("v"), 1000L, 10000L))
      .head().getAs[Array[Byte]](0)

    val hits = members
      .select(BloomFns.mightContain(spark, lit(sketch), col("v")).as("hit"))
      .where(col("hit")).count()
    assert(hits === 1000L, "false negative: bloom missed a member")

    val others = (0L until 1000L).map(i => s"other-$i").toDF("v")
    val fps = others
      .select(BloomFns.mightContain(spark, lit(sketch), col("v")).as("hit"))
      .where(col("hit")).count()
    assert(fps < 100L, s"fp rate ${fps / 10.0}% too high for 10 bits/item")
  }

  test("probe works inside a higher-order lambda (the zero-shuffle shape)") {
    import spark.implicits._
    val sketch = Seq("a", "b").toDF("v")
      .agg(BloomFns.bloomAgg(spark, col("v"), 2L, 1024L))
      .head().getAs[Array[Byte]](0)
    val n = Seq(Seq("a", "x", "b", "y")).toDF("arr")
      .select(size(filter(col("arr"),
        g => BloomFns.mightContain(spark, lit(sketch), g))).as("n"))
      .head().getInt(0)
    assert(n === 2)
  }
}
