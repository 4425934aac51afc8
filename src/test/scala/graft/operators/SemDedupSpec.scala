package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class SemDedupSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("drops the larger id of each within-cluster duplicate pair") {
    val df = Seq(
      (1L, vec(1.0, 0.0)), (2L, vec(1.0, 0.0)),   // exact dup of 1
      (3L, vec(0.9, 0.3)),                         // same cluster, distinct
      (4L, vec(0.0, 1.0)), (5L, vec(0.0, 1.0)))    // exact dup of 4
      .toDF("id", "v")
    val got = Similarity.semDedup(df, "id", "v", k = 2, iters = 2,
        tau = 0.999)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("cell"),
        r.getAs[Boolean]("keep")))
    val keep = got.filter(_._3).map(_._1).toSet
    assert(got.length == 5)
    assert(keep === Set(1L, 3L, 4L))
    // duplicates share their original's cell
    val cells = got.map(t => t._1 -> t._2).toMap
    assert(cells(1L) == cells(2L) && cells(4L) == cells(5L))
  }

  test("tau gates the drop: below-threshold neighbors all survive") {
    val df = Seq(
      (1L, vec(1.0, 0.0)), (2L, vec(0.9, 0.3)), (3L, vec(0.0, 1.0)))
      .toDF("id", "v")
    val got = Similarity.semDedup(df, "id", "v", k = 2, iters = 1,
        tau = 0.999)
      .collect().map(r => r.getAs[Boolean]("keep"))
    assert(got.forall(identity))
  }
}
