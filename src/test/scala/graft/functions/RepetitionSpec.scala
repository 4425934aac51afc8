package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Pins the sorted-run mode-count trick and the bigram builder behind
  * qt17's repetition metrics against hand-computed values.
  */
class RepetitionSpec extends AnyFunSuite with SparkTest {

  private def top(xs: Seq[String]): Int = {
    import spark.implicits._
    Seq(xs).toDF("arr")
      .select(TextFunctions.topElementCount(col("arr")).as("n"))
      .head().getInt(0)
  }

  test("topElementCount is the count of the most frequent element") {
    assert(top(Seq("a", "b", "a", "c", "a")) === 3)
    assert(top(Seq("x")) === 1)
    assert(top(Seq.empty) === 0)
    assert(top(Seq("t", "t", "t", "t")) === 4)
    // runs must not merge across distinct values adjacent after sort
    assert(top(Seq("aa", "ab", "ab", "b")) === 2)
  }

  test("bigrams: adjacent pairs, empty below two tokens") {
    import spark.implicits._
    def bg(xs: Seq[String]): Seq[String] =
      Seq(xs).toDF("t")
        .select(TextFunctions.bigrams(col("t")).as("b"))
        .head().getSeq[String](0)
    assert(bg(Seq("a", "b", "c")) === Seq("a b", "b c"))
    assert(bg(Seq("solo")) === Seq.empty)
    // repeated bigram counted by topElementCount
    assert(top(bg(Seq("x", "y", "x", "y", "x"))) === 2)
  }
}
