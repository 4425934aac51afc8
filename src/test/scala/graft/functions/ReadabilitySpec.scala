package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.functions.{TextFunctions => TF}

class ReadabilitySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def metrics(text: String) = {
    val r = Seq((1L, text)).toDF("id", "text").select(
      TF.tokenCount(col("text")).as("w"),
      TF.sentenceCount(col("text")).as("s"),
      TF.syllableCount(col("text")).as("y")).head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("sentence and syllable heuristics on hand-counted text") {
    // "the cat sat. it sat on a mat! did it?" — 3 sentences; every
    // word monosyllabic → 10 syllables for 10 words
    val (w, s, y) = metrics("the cat sat. it sat on a mat! did it?")
    assert(w == 10 && s == 3 && y == 10, ((w, s, y)))
    // vowel-group runs: "beautiful" = eau|i|u → 3; "rhythm" has no
    // aeiouy-vowel... y counts: rh-y-thm → 1; "qt" floors at 1
    assert(metrics("beautiful") == ((1, 1, 3)))
    assert(metrics("rhythm") == ((1, 1, 1)))
    assert(metrics("qt") == ((1, 1, 1)))
    // no terminal punctuation → one sentence, never divide-by-zero
    assert(metrics("words without any stops")._2 == 1)
  }

  test("flesch/fk formulas match the hand calculation under trunc4") {
    // W=10, S=3, Syl=10: ease = 206.835 − 1.015·(10/3) − 84.6·1
    //                    grade = 0.39·(10/3) + 11.8·1 − 15.59
    // expectation computed with the identical IEEE operand tree +
    // floor-truncation (trunc4 — round() ties are engine-dependent)
    val expF = math.floor((206.835 - 1.015 * 10 / 3.0
      - 84.6 * 10 / 10.0) * 10000) / 10000
    val expG = math.floor((0.39 * 10 / 3.0
      + 11.8 * 10 / 10.0 - 15.59) * 10000) / 10000
    val df = Seq((10, 3, 10)).toDF("w", "s", "y")
    val r = df.select(
      TF.trunc4(TF.fleschEase(col("w"), col("s"), col("y"))).as("f"),
      TF.trunc4(TF.fkGrade(col("w"), col("s"), col("y"))).as("g")).head()
    assert(r.getDouble(0) == expF, s"${r.getDouble(0)} vs $expF")
    assert(r.getDouble(1) == expG, s"${r.getDouble(1)} vs $expG")
    // the truncated values sit within 1e-4 of the textbook numbers
    assert(math.abs(r.getDouble(0) - 118.8517) < 1e-3)
    assert(math.abs(r.getDouble(1) - (-2.49)) < 1e-3)
  }
}
