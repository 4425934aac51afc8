package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class NaiveBayesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("seed-vocabulary documents score positive, alien ones negative") {
    val df = Seq(
      (1L, "good clean prose here", true),
      (2L, "good clean text again", true),
      (3L, "zz xx qq vv spam spam", false),
      (4L, "qq zz vv xx spam junk", false),
      // held-out docs drawn from each side's vocabulary
      (5L, "clean prose text", false),
      (6L, "spam qq zz", true)
    ).toDF("doc_id", "text", "seed")
    val out = NaiveBayes.scoreBySeed(df, "doc_id", "text", col("seed"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("log_odds"), r.getAs[Boolean]("pred")))).toMap
    assert(out(5L)._1 > 0 && out(5L)._2,
      s"seed-like doc should score positive: ${out(5L)}")
    assert(out(6L)._1 < 0 && !out(6L)._2,
      s"alien-vocab doc should score negative: ${out(6L)}")
    // pred is exactly log_odds > 0 for every row
    assert(out.values.forall { case (lo, p) => p == (lo > 0) })
  }

  test("log-odds matches hand math on a one-token corpus") {
    // seed doc "a", other doc "b": V=2, Tpos=Tneg=1, Npos=Nneg=1
    // p(a|pos)=2/3, p(a|neg)=1/3 -> score("a") = ln 2; prior = ln 1 = 0
    val df = Seq((1L, "a", true), (2L, "b", false))
      .toDF("doc_id", "text", "seed")
    val out = NaiveBayes.scoreBySeed(df, "doc_id", "text", col("seed"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("log_odds")).toMap
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ln2)
    assert(out(2L) == -ln2)
  }

  test("n_tokens counts the doc's tokens; empty docs are absent") {
    val df = Seq(
      (1L, "one two three", true),
      (2L, "   ", false),
      (3L, "x", false)
    ).toDF("doc_id", "text", "seed")
    val out = NaiveBayes.scoreBySeed(df, "doc_id", "text", col("seed"))
    val rows = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(rows == Map(1L -> 3L, 3L -> 1L))
  }

  test("requires documents in both classes") {
    val df = Seq((1L, "a", true), (2L, "b", true))
      .toDF("doc_id", "text", "seed")
    intercept[IllegalArgumentException] {
      NaiveBayes.scoreBySeed(df, "doc_id", "text", col("seed"))
    }
  }
}
