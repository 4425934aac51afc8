package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The named heuristic quality gates of the two canonical web-corpus
  * cleaning recipes — C4 (Raffel et al. 2020, §2.2) and Gopher
  * (Rae et al. 2021, appendix A1.1) — as one per-document rule pack.
  * Beyond-reference: the reference has no corpus-quality surface; this
  * is the standard pre-training filter a 100 TB pipeline runs first,
  * distinct from the generic ratio metrics (TextFunctions.qualityScore)
  * in that every output column is a NAMED published rule with its
  * published threshold, and `keep` is the conjunction the papers ship.
  *
  * Everything is pure column algebra over one row — split / filter /
  * aggregate on arrays with document-bounded state, no UDF, no
  * shuffle; the whole pack rides a single whole-stage-codegen'd
  * projection over the scan, so at any scale its cost is the scan.
  */
object QualityRules {

  /** Gopher's required-stopword set (A1.1: "contains at least two of
    * the following English words").
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule metrics + the keep conjunction.
    *
    * Output columns (fractions rounded to 4dp):
    *  - n_words, mean_word_len, symbol_ratio, alpha_word_frac,
    *    stopword_hits                          (Gopher word-level)
    *  - bullet_line_frac, ellipsis_line_frac,
    *    term_punct_line_frac                   (Gopher/C4 line-level)
    *  - n_sentences, has_brace, has_lorem      (C4 document-level)
    *  - keep_gopher: the Gopher word+line conjunction
    *  - keep_c4: the C4 document gates (≥3 sentences, no brace, no
    *    lorem ipsum) — kept separate so a punctuation-free corpus
    *    (like the synthetic one) still exercises a meaningful split
    *    on keep_gopher while keep_c4 acts as the negative control
    */
  def apply(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    val lines = filter(split(col(textCol), "\n"), l => trim(l) =!= "")
    val nWords = size(words)
    val nLines = size(lines)
    val meanLen = aggregate(words, lit(0L),
      (acc, w) => acc + length(w)).cast("double") / nWords
    // Gopher counts '#' and ellipsis as symbols; both counted
    // non-overlapping via split
    val nSymbols = (size(split(col(textCol), "#")) - 1) +
      (size(split(col(textCol), "\\.\\.\\.")) - 1) +
      (size(split(col(textCol), "…")) - 1)
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    // count of DISTINCT required stopwords present — iterate the
    // lowered-distinct word set once against the 8-literal array, not
    // the literal array against a per-element recomputed transform
    val stopHits = size(filter(
      array_distinct(transform(words, lower _)),
      w => array_contains(typedLit(GopherStopwords), w)))
    def lineFrac(pred: Column => Column): Column =
      when(nLines === 0, 0.0)
        .otherwise(size(filter(lines, pred)).cast("double") / nLines)
    val bulletFrac = lineFrac(l => ltrim(l).rlike("^[-*•]"))
    val ellipsisFrac = lineFrac(l => rtrim(l).rlike("(\\.\\.\\.|…)$"))
    val termPunctFrac = lineFrac(l => rtrim(l).rlike("[.!?]$"))
    val nSentences = length(regexp_replace(col(textCol), "[^.!?]", ""))
    val hasBrace = col(textCol).contains("{")
    val hasLorem = lower(col(textCol)).contains("lorem ipsum")

    df.select(
      col(idCol),
      nWords.cast("int").as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(nSymbols.cast("double") / nWords, 4).as("symbol_ratio"),
      round(alphaWords.cast("double") / nWords, 4).as("alpha_word_frac"),
      stopHits.cast("int").as("stopword_hits"),
      round(bulletFrac, 4).as("bullet_line_frac"),
      round(ellipsisFrac, 4).as("ellipsis_line_frac"),
      round(termPunctFrac, 4).as("term_punct_line_frac"),
      nSentences.cast("int").as("n_sentences"),
      hasBrace.as("has_brace"),
      hasLorem.as("has_lorem"),
      (nWords.between(50, 100000) &&
        meanLen.between(3.0, 10.0) &&
        (nSymbols.cast("double") / nWords) < 0.1 &&
        (alphaWords.cast("double") / nWords) > 0.8 &&
        stopHits >= 2 &&
        bulletFrac < 0.9 &&
        ellipsisFrac < 0.3).as("keep_gopher"),
      (nSentences >= 3 && !hasBrace && !hasLorem).as("keep_c4"))
  }
}
