package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class KnnClassifySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("majority of k nearest labeled neighbors wins") {
    // two clean clusters on orthogonal axes
    val seeds = Seq(
      (10L, vec(1, 0.0), 0), (11L, vec(1, 0.1), 0), (12L, vec(1, -0.1), 0),
      (20L, vec(0, 1.0), 1), (21L, vec(0.1, 1), 1), (22L, vec(-0.1, 1), 1))
      .toDF("cid", "cvec", "label")
    val queries = Seq((1L, vec(0.9, 0.05)), (2L, vec(0.05, 0.9)))
      .toDF("qid", "qvec")
    val got = Similarity.knnClassify(queries, seeds, k = 3)
      .collect().map(r => (r.getAs[Long]("qid"),
        r.getAs[Int]("pred_label"), r.getAs[Long]("n_votes"))).toSet
    assert(got === Set((1L, 0, 3L), (2L, 1, 3L)))
  }

  test("vote ties break toward the smallest label") {
    // k=2: one neighbor of each label at identical similarity
    val seeds = Seq(
      (10L, vec(1, 1), 7), (11L, vec(1, 1), 3))
      .toDF("cid", "cvec", "label")
    val queries = Seq((1L, vec(1, 1))).toDF("qid", "qvec")
    val got = Similarity.knnClassify(queries, seeds, k = 2).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Int]("pred_label") == 3 &&
      got(0).getAs[Long]("n_votes") == 1L)
  }

  test("majorityVote composes with any candidate source") {
    val neighbors = Seq(
      (1L, "spam"), (1L, "ham"), (1L, "spam"),
      (2L, "ham")).toDF("qid", "label")
    val got = Similarity.majorityVote(neighbors, "label")
      .collect().map(r => (r.getAs[Long]("qid"),
        r.getAs[String]("pred_label"), r.getAs[Long]("n_votes"))).toSet
    assert(got === Set((1L, "spam", 2L), (2L, "ham", 1L)))
  }
}
