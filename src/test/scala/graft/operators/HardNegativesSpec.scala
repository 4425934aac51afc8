package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class HardNegativesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // axis-aligned unit vectors: cosine is 1 on the same axis, 0 across.
  // anchor 1 (label 0, x-axis) has same-axis rows 2 (label 0) and
  // 3 (label 1), plus off-axis 4 (label 1).
  private lazy val vecs = Seq(
    (1L, Array(1f, 0f), 0),
    (2L, Array(1f, 0f), 0),  // same label: must never appear
    (3L, Array(1f, 0f), 1),  // the hard negative (sim 1.0)
    (4L, Array(0f, 1f), 1)   // easy negative (sim 0.0)
  ).toDF("vec_id", "embedding", "label")

  private def anchors = vecs.where($"vec_id" === 1L)
    .selectExpr("vec_id as qid", "embedding as qvec", "label as qlabel")
  private def cands = vecs
    .selectExpr("vec_id as cid", "embedding as cvec", "label as clabel")

  test("returns wrong-label neighbors only, hardest first") {
    val out = Similarity.hardNegatives(anchors, cands, k = 2)
      .select("cid", "sim", "rank").as[(Long, Double, Int)]
      .collect().sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(3L, 4L)) // same-label 2 excluded
    assert(out(0)._2 == 1.0 && out(1)._2 == 0.0)
  }

  test("label filter applies before scoring; anchors broadcast") {
    val df = Similarity.hardNegatives(anchors, cands, k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"anchor side must broadcast:\n$plan")
    // the join condition carries the label inequality — wrong-label
    // pairs are dropped at the join, before any dot product runs
    assert(plan.contains("clabel") && plan.contains("qlabel"))
  }

  test("NULL-labeled candidates count as negatives for labeled anchors") {
    val withNull = cands.unionByName(
      Seq((9L, Array(1f, 0f))).toDF("cid", "cvec")
        .selectExpr("cid", "cvec", "cast(null as int) as clabel"))
    val out = Similarity.hardNegatives(anchors, withNull, k = 3)
      .select("cid").as[Long].collect().toSet
    assert(out.contains(9L)) // null <=> 0 is false ⇒ kept as negative
  }
}
