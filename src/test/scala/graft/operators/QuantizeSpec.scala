package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class QuantizeSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def statsOf(vecs: (Long, Seq[Double])*) =
    Quantize.int8Stats(vecs.toSeq.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap

  test("scale is max|x|/127; extremes land exactly on ±127") {
    val m = statsOf(1L -> Seq(127.0, -127.0, 63.5, 0.0))
    val r = m(1L)
    assert(r.getAs[Double]("scale") === 1.0)
    // q = [127, -127, 64, 0] (63.5 rounds half-up to 64)
    assert(r.getAs[Long]("sum_q") === 64L)
    assert(r.getAs[Int]("n_sat") === 2)
  }

  test("all-zero vector quantizes to zeros with zero error, no div-by-zero") {
    val r = statsOf(2L -> Seq(0.0, 0.0, 0.0))(2L)
    assert(r.getAs[Long]("sum_q") === 0L)
    assert(r.getAs[Int]("n_sat") === 0)
    assert(r.getAs[Double]("rmse") === 0.0)
  }

  test("reconstruction error is bounded by scale/2 per element") {
    val v = Seq(0.93, -0.11, 0.4027, 0.77, -0.5901, 0.001)
    val r = statsOf(3L -> v)(3L)
    val scale = v.map(math.abs).max / 127
    assert(r.getAs[Double]("rmse") <= scale / 2 + 1e-9)
    assert(r.getAs[Double]("rmse") > 0)
  }

  test("map-side only: no exchange in the plan") {
    val df = Quantize.int8Stats(
      Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "quantization must not shuffle")
  }
}
