package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class TruncatedRerankSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def q1 = Seq((0L, Array(1f, 0f, 0f, 0f)))
    .toDF("qid", "qvec")

  // prefix (first 2 dims) ranks c2 above c3; the full cosine ranks
  // c3 above c2 — the pair that makes the two stages distinguishable
  private def cands = Seq(
    (2L, Array(0.9f, 0f, 0.5f, 0f)),  // psim 1.0,   full sim 0.8742
    (3L, Array(1f, 0.5f, 0f, 0f)))    // psim 0.8944, full sim 0.8944
    .toDF("cid", "cvec")

  test("with all candidates surviving, rerank equals brute-force kNN") {
    val got = Similarity.truncatedRerank(q1, cands, k = 2,
        prefixDim = 2, m = 10, excludeSelf = false)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Double]("sim")))
    val brute = Similarity.bruteForceKnn(q1, cands, k = 2,
        excludeSelf = false)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Double]("sim")))
    assert(got.toSeq == brute.toSeq)
    assert(got.head._1 == 3L) // full cosine wins: c3 first
  }

  test("a tight prefix cut excludes the true nearest neighbor") {
    // m=1 keeps only the prefix winner c2; the rerank can then never
    // surface c3 — the approximation the operator trades for reading
    // half the vector bytes, pinned so the semantics stay explicit
    val got = Similarity.truncatedRerank(q1, cands, k = 1,
        prefixDim = 2, m = 1, excludeSelf = false).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("cid") == 2L)
    assert(got.head.getAs[Double]("sim") == 0.8742)
  }

  test("excludeSelf drops the identity pair before the prefix cut") {
    val self = Seq((0L, Array(1f, 0f, 0f, 0f))).toDF("cid", "cvec")
    val got = Similarity.truncatedRerank(q1, self.union(cands), k = 3,
        prefixDim = 2, m = 3)
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(!got.contains(0L) && got == Set(2L, 3L))
  }
}
