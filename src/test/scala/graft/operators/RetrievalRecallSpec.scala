package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class RetrievalRecallSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("recall counts hits per query; total misses keep the row") {
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L)).toDF("qid", "cid")
    val approx = Seq(
      (1L, 10L), (1L, 12L), (1L, 99L), (1L, 98L),
      // qid 2: approximate retriever returned nothing relevant
      (2L, 97L), (2L, 96L)).toDF("qid", "cid")
    val got = Similarity.retrievalRecall(exact, approx)
      .collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("recall"))).toMap
    assert(got(1L) == ((4L, 2L, 0.5)))
    assert(got(2L) == ((2L, 0L, 0.0)))
    assert(got.size == 2)
  }

  test("extra approx columns and perfect recall") {
    val exact = Seq((5L, 1L), (5L, 2L)).toDF("qid", "cid")
    val approx = Seq((5L, 2L, 0.9), (5L, 1L, 0.8))
      .toDF("qid", "cid", "sim")
    val got = Similarity.retrievalRecall(exact, approx).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Double]("recall") == 1.0)
  }
}
