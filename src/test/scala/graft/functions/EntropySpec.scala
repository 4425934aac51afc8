package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class EntropySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def h(s: String): Double =
    Seq(s).toDF("t")
      .select(round(TextFunctions.charEntropy(col("t")), 6))
      .as[Double].head()

  test("uniform alphabet gives log2(k) bits") {
    assert(h("abcd") === 2.0)
    assert(h("ab") === 1.0)
    assert(h("abcdefgh") === 3.0)
  }

  test("constant run has zero entropy; empty text has zero entropy") {
    assert(h("aaaaaaa") === 0.0)
    assert(h("") === 0.0)
  }

  test("case folding merges upper/lower before counting") {
    assert(h("aAaA") === 0.0)
    assert(h("aAbB") === 1.0)
  }

  test("matches the frequency-table definition on mixed text") {
    // "abca": p = (2/4, 1/4, 1/4) → H = 1.5
    assert(h("abca") === 1.5)
    // direct check against -Σ p log2 p for a longer string
    val s = "the quick brown fox jumps over the lazy dog"
    val counts = s.toLowerCase.groupBy(identity).map(_._2.length)
    val n = s.length.toDouble
    val want = counts.map { c =>
      val p = c / n; -p * math.log(p) / math.log(2)
    }.sum
    assert(math.abs(h(s) - want) < 1e-4)
  }

  test("row-local: no exchange in the plan") {
    val plan = Seq("x").toDF("t")
      .select(TextFunctions.charEntropy(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
