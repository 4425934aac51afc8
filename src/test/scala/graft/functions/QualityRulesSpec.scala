package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class QualityRulesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def run(docs: (Long, String)*) =
    QualityRules(docs.toSeq.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

  test("gopher word-level gates: length, mean word length, stopwords") {
    val good = (("the data " * 30) + "pipeline runs with care and " +
      "that should have been fine to be honest").trim
    val out = run(
      1L -> good,                       // ~70 words, many stopwords
      2L -> "too short to keep",        // < 50 words
      3L -> ("ab " * 60).trim,          // mean word length 2 < 3
      4L -> ("explanatory " * 60).trim) // no 2 required stopwords
    assert(out(1L).getAs[Boolean]("keep_gopher"))
    assert(!out(2L).getAs[Boolean]("keep_gopher"))
    assert(!out(3L).getAs[Boolean]("keep_gopher"))
    assert(out(3L).getAs[Double]("mean_word_len") == 2.0)
    assert(!out(4L).getAs[Boolean]("keep_gopher"))
    assert(out(4L).getAs[Int]("stopword_hits") == 0)
  }

  test("line-level fractions: bullets, ellipses, terminal punctuation") {
    val bullety = (1 to 10).map(i => s"- item $i with words").mkString("\n")
    val out = run(
      1L -> bullety,
      2L -> "First line ends well.\nsecond trails off...\nthird has no ending")
    assert(out(1L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(!out(1L).getAs[Boolean]("keep_gopher")) // 1.0 >= 0.9 cap
    assert(out(2L).getAs[Double]("ellipsis_line_frac") == 0.3333)
    // '...' also ends in '.', so it counts as terminal punctuation too
    assert(out(2L).getAs[Double]("term_punct_line_frac") == 0.6667)
  }

  test("c4 document gates: sentences, braces, lorem ipsum") {
    val out = run(
      1L -> "One sentence here. Two now! Is that three? Yes.",
      2L -> "Full sentences. With punctuation. Three of them. body { x }",
      3L -> "Lorem Ipsum dolor sit amet. And more. And more.",
      4L -> "no terminal punctuation at all in this document")
    assert(out(1L).getAs[Boolean]("keep_c4"))
    assert(out(2L).getAs[Boolean]("has_brace") &&
      !out(2L).getAs[Boolean]("keep_c4"))
    assert(out(3L).getAs[Boolean]("has_lorem") &&
      !out(3L).getAs[Boolean]("keep_c4"))
    assert(out(4L).getAs[Int]("n_sentences") == 0 &&
      !out(4L).getAs[Boolean]("keep_c4"))
  }

  test("symbol ratio counts hashes and both ellipsis forms") {
    val out = run(1L -> "a # b ... c … d e f g h i")
    // 3 symbols over 12 words (the '...' token also counts as a word)
    assert(out(1L).getAs[Double]("symbol_ratio") == 0.25)
  }
}
