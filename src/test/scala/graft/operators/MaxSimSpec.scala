package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class MaxSimSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // 2 subvectors × 2 dims. Query q = [1,0 | 0,1].
  private val q = Seq((0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)))
    .toDF("qid", "qvec")

  test("token-level matching: a doc matching both subvectors " +
    "(in swapped positions) beats a doc matching only one") {
    val c = Seq(
      // doc 1 holds BOTH query subvectors, swapped: maxsim = 1 + 1
      1L -> Seq(0.0f, 1.0f, 1.0f, 0.0f),
      // doc 2 matches only the first query subvector: 1 + 0
      2L -> Seq(1.0f, 0.0f, 1.0f, 0.0f),
      // doc 3 orthogonal-ish mix
      3L -> Seq(0.0f, 1.0f, 0.0f, 1.0f))
      .toDF("cid", "cvec")
    val got = Similarity.maxSim(q, c, k = 3, m = 2, subDim = 2,
        excludeSelf = false)
      .collect()
      .map(r => r.getAs[Long]("cid") ->
        (r.getAs[Double]("maxsim"), r.getAs[Int]("rank"))).toMap
    assert(got(1L) == ((2.0, 1)))
    // docs 2 and 3 each match exactly one query subvector (score 1);
    // the tie breaks by cid
    assert(got(2L) == ((1.0, 2)))
    assert(got(3L) == ((1.0, 3)))
  }

  test("per-query top-k compiles to WindowGroupLimit") {
    val c = spark.range(50).select(
      $"id".as("cid"),
      org.apache.spark.sql.functions.expr(
        "array(cast(id as float), 1.0f, 2.0f, cast(id % 7 as float))")
        .as("cvec"))
    val plan = Similarity.maxSim(q, c, k = 3, m = 2, subDim = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }
}
