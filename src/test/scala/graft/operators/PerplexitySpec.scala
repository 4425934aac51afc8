package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class PerplexitySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("add-1 unigram perplexity matches hand math") {
    // counts: a->3, b->1; N=4, V=2 -> p(a)=4/6, p(b)=2/6
    val df = Seq((1L, "a a b"), (2L, "a")).toDF("id", "text")
    val got = Perplexity(df, "id", "text").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("ppl")))).toMap
    // doc 2: single token 'a' -> ppl = 1/p(a) = 1.5 exactly
    assert(got(2L) == ((1L, 1.5)))
    // doc 1: ((2/3)^2 * (1/3))^(-1/3) = (27/4)^(1/3)
    assert(got(1L)._1 == 3L)
    assert(got(1L)._2 == BigDecimal(math.cbrt(27.0 / 4.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("common text scores lower perplexity than rare text") {
    val common = (1 to 40).map(i => (i.toLong, "the cat sat on the mat"))
    val rare = Seq((99L, "zyx wvu tsr qpo nml kji"))
    val df = (common ++ rare).toDF("id", "text")
    val out = Perplexity(df, "id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("ppl")).toMap
    assert(out(1L) < out(99L))
    // whitespace-only docs (no tokens) are absent, not NaN
    val e = Perplexity(Seq((1L, "x y"), (2L, "   ")).toDF("id", "text"),
      "id", "text")
    assert(e.count() == 1)
  }
}
