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

  test("kCenterSample keeps the id column generic (string ids work)") {
    val df = Seq(
      ("a", vec(0.0, 0)), ("b", vec(1.0, 0)), ("c", vec(10.0, 0))
    ).toDF("id", "v")
    val picks = Similarity.kCenterSample(df, "id", "v", k = 3)
      .collect().sortBy(_.getAs[Int]("pick"))
      .map(r => (r.getAs[String]("id"), r.getAs[Double]("dist")))
    assert(picks.length == 3)
    assert(picks.map(_._1).toSet == Set("a", "b", "c"))
    assert(picks(0)._2 == 0.0)
    assert(picks(1)._1 != "b") // the middle point is never pick 2
  }

  test("kCenterSample stops at max min-distance 0 instead of duplicating") {
    // 5 rows but only 2 distinct vectors: asking for k=5 must yield
    // exactly 2 picks (one per distinct location), never a re-pick of
    // an already-covered point
    val df = Seq(
      (1L, vec(0.0, 0)), (2L, vec(0.0, 0)), (3L, vec(0.0, 0)),
      (4L, vec(5.0, 0)), (5L, vec(5.0, 0))
    ).toDF("id", "v")
    val picks = Similarity.kCenterSample(df, "id", "v", k = 5).collect()
    assert(picks.length == 2, picks.mkString(","))
    val dists = picks.sortBy(_.getAs[Int]("pick")).map(_.getAs[Double]("dist"))
    assert(dists(0) == 0.0 && dists(1) == 5.0)
  }

  test("each k-center round folds exactly ONE new distance (O(k·N) shape)") {
    // the running-min refactor: a round's plan must contain a single
    // zip_with/aggregate distance no matter how many centers were
    // already chosen — the prior form rebuilt least() over ALL of them
    val df = Seq((1L, vec(0.0, 0)), (2L, vec(3.0, 4))).toDF("id", "v")
    val cur = df.select(org.apache.spark.sql.functions.col("id").as("__id"),
        KMeans.quantize(org.apache.spark.sql.functions.col("v"), 100)
          .as("__qv"))
      .withColumn("__md2", org.apache.spark.sql.functions.lit(Long.MaxValue))
    val round = Similarity.kCenterRound(cur, Seq(0L, 0L))
    val plan = round.queryExecution.analyzed.toString
    val nZip = "zip_with".r.findAllIn(plan.toLowerCase).length
    assert(nZip == 1, s"expected exactly one zip_with, plan:\n$plan")
    // and the fold is a least() against the carried state
    assert(plan.toLowerCase.contains("least"), plan)
  }
}
