package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class DiversitySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("kCenterSample walks to the farthest point each round") {
    // colinear points at 0, 1, 10: wherever the md5 seed lands, the
    // second pick is the farthest end of the line, and the third is
    // the remaining point — always distance-maximal given the chosen
    val df = Seq(
      (1L, vec(0.0, 0)), (2L, vec(1.0, 0)), (3L, vec(10.0, 0))
    ).toDF("id", "v")
    val picks = Similarity.kCenterSample(df, "id", "v", k = 3)
      .collect().sortBy(_.getAs[Int]("pick"))
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("dist")))
    assert(picks.length == 3)
    assert(picks(0)._2 == 0.0)
    val ids = picks.map(_._1).toSet
    assert(ids == Set(1L, 2L, 3L), ids)
    // the middle point (id 2, within 1.0 of an endpoint) can never be
    // pick 2: both endpoints are farther from any seed
    assert(picks(1)._1 != 2L, picks.mkString(","))
    // distances are non-increasing after the seed (farthest-first)
    assert(picks(1)._2 >= picks(2)._2)
    // deterministic under repartition
    val again = Similarity.kCenterSample(df.repartition(5), "id", "v",
      k = 3).collect().sortBy(_.getAs[Int]("pick")).map(_.getLong(0))
    assert(again.toSeq == picks.map(_._1).toSeq)
  }
}
