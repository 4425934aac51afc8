package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class MmrSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // q = x-axis. c2 is a near-duplicate of c1; c3 is less relevant but
  // diverse. Pure-sim order: c1, c2, c3. MMR at λ=0.5 must demote the
  // near-dup: c1, c3, c2.
  private lazy val q = Seq((0L, Array(1f, 0f, 0f)))
    .toDF("qid", "qvec")
  private lazy val c = Seq(
    (1L, Array(0.99f, 0.141f, 0f)),   // sim ≈ .99
    (2L, Array(0.98f, 0.199f, 0f)),   // sim ≈ .98, cos(c2,c1) ≈ .998
    (3L, Array(0.8f, 0f, 0.6f))       // sim = .80, cos(c3,c1) ≈ .79
  ).toDF("cid", "cvec")

  test("demotes near-duplicates of earlier picks") {
    val picks = Similarity
      .mmrDiversify(q, c, k = 3, lam = 0.5, pool = 3,
        excludeSelf = false)
      .orderBy("pick").select("cid").as[Long].collect().toSeq
    assert(picks == Seq(1L, 3L, 2L),
      s"expected diversity-aware order c1,c3,c2, got $picks")
    // pure relevance at λ=1 restores sim order — the knob works
    val rel = Similarity
      .mmrDiversify(q, c, k = 3, lam = 1.0, pool = 3,
        excludeSelf = false)
      .orderBy("pick").select("cid").as[Long].collect().toSeq
    assert(rel == Seq(1L, 2L, 3L))
  }

  test("exactly k picks per query, 1-based contiguous pick order") {
    val q2 = Seq((0L, Array(1f, 0f, 0f)), (9L, Array(0f, 1f, 0f)))
      .toDF("qid", "qvec")
    val out = Similarity
      .mmrDiversify(q2, c, k = 2, lam = 0.5, pool = 3,
        excludeSelf = false)
      .select("qid", "pick").as[(Long, Int)].collect()
    assert(out.length == 4)
    assert(out.groupBy(_._1).values.forall(
      _.map(_._2).sorted.toSeq == Seq(1, 2)))
  }

  test("rejects bad parameters") {
    intercept[IllegalArgumentException] {
      Similarity.mmrDiversify(q, c, k = 5, lam = 0.5, pool = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrDiversify(q, c, k = 1, lam = 1.5, pool = 3)
    }
  }
}
