package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID (stopword heuristic).
  *
  * All are compositions of codegen'd `org.apache.spark.sql.functions`
  * (split / higher-order array functions / regexp) — no UDFs — so they
  * stay inside WholeStageCodegen and scale linearly with no shuffle.
  * Ratios are exact integer-count divisions (bit-identical across
  * engines), which is what makes them oracle-testable.
  */
object TextFunctions {

  /** Lowercased whitespace tokens. */
  /** Let-binding for Column expressions: evaluates `v` ONCE per row
    * and hands the bound value to `body` as a lambda variable.
    *
    * Why it exists: higher-order functions (`transform`/`aggregate`/
    * `filter`) evaluate their lambda bodies interpreted, with no
    * common-subexpression elimination — an outer expression referenced
    * inside a lambda is RECOMPUTED per array element. Tokenizing a
    * document once vs once-per-shingle is a ~gram-count-fold win on
    * every text operator, which is the difference between one and
    * sixty regex passes over each of 100 TB worth of rows. The
    * single-element `transform` is the only per-row binding construct
    * the expression language offers.
    */
  def letBind(v: Column, body: Column => Column): Column =
    element_at(transform(array(v), x => body(x)), 1)

  def tokens(text: Column): Column =
    // full whitespace trim (tabs/newlines too — `trim` strips only
    // spaces, leaving a phantom empty first token on "\thello")
    split(regexp_replace(lower(text), "(^\\s+)|(\\s+$)", ""), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: alphanumeric runs + individual
    * non-alphanumeric, approximating byte-pair token counts without a
    * vocab (the usual len/4-style heuristic is cruder).
    */
  def wordPieceCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Characters that are not letters/digits/whitespace, as a ratio of
    * total length (0 for empty).
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(lower(text), lit("[^a-z0-9\\s]"), lit(0)))
        .cast("double") / length(text))

  /** Sentence count: runs of terminal punctuation, floored at 1 so
    * unpunctuated text (transcripts, logs, title-cased fragments)
    * counts as one sentence instead of dividing by zero.
    */
  def sentenceCount(text: Column): Column =
    greatest(lit(1), size(regexp_extract_all(text, lit("[.!?]+"), lit(0))))

  /** Heuristic syllable count: vowel-group runs per word, floored at 1
    * per word (every word has at least one spoken syllable — "qt",
    * "b2"). The standard dictionary-free approximation readability
    * formulas are calibrated against.
    */
  def syllableCount(text: Column): Column =
    letBind(tokens(text), toks =>
      aggregate(
        transform(filter(toks, w => w =!= ""), w =>
          greatest(lit(1),
            size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))))),
        lit(0), (acc, x) => acc + x))

  /** Deterministic 4dp truncation: floor(x·10⁴)/10⁴. Unlike
    * `round(_, 4)`, floor of a given double is engine-independent —
    * `round` ties at the 4th decimal resolve differently between
    * Spark (HALF_UP over the shortest decimal string) and DuckDB
    * (arithmetic on the binary value), which the qt54 sf0.1 check
    * caught in the wild. Use this for derived continuous scores whose
    * operand tree can land on a decimal tie.
    */
  def trunc4(c: Column): Column =
    floor(c * 10000).cast("double") / 10000.0

  /** Flesch reading ease: 206.835 − 1.015·(W/S) − 84.6·(Syl/W).
    * All three inputs are exact integers and the formula is one pinned
    * double-operand tree; present via [[trunc4]], not `round` (see
    * there). Higher = easier; unpunctuated synthetic text scores
    * deeply negative (one "sentence" of W words), which is itself the
    * signal a quality gate keys on.
    */
  def fleschEase(words: Column, sentences: Column,
      syllables: Column): Column =
    lit(206.835) -
      lit(1.015) * words.cast("double") / sentences.cast("double") -
      lit(84.6) * syllables.cast("double") / words.cast("double")

  /** Flesch–Kincaid grade level:
    * 0.39·(W/S) + 11.8·(Syl/W) − 15.59.
    */
  def fkGrade(words: Column, sentences: Column,
      syllables: Column): Column =
    lit(0.39) * words.cast("double") / sentences.cast("double") +
      lit(11.8) * syllables.cast("double") / words.cast("double") -
      lit(15.59)

  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "this", "that", "be")
  val DeStopwords: Seq[String] = Seq(
    "der", "die", "das", "und", "oder", "von", "zu", "im", "ist", "es",
    "für", "auf", "mit", "als", "bei", "aus", "dies", "dass", "sein", "ein")
  val FrStopwords: Seq[String] = Seq(
    "le", "la", "les", "et", "ou", "de", "à", "dans", "est", "il",
    "pour", "sur", "avec", "comme", "chez", "par", "ce", "que", "être", "un")

  /** Fraction of tokens found in `stopwords` (exact count/count division
    * — deterministic across engines).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    letBind(tokens(text), toks => stopwordRatioOf(toks, stopwords))

  /** Same ratio over an ALREADY-TOKENIZED array column — use this when
    * the caller binds the token array once for several metrics.
    */
  def stopwordRatioOf(toks: Column, stopwords: Seq[String]): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))
        .cast("double") / size(toks))

  /** Composite quality score in [0,1]: rewards natural stopword density
    * and mid-length documents, penalizes punctuation soup. The exact
    * weights are heuristic; the shape follows public quality-filtering
    * practice (C4/Gopher-style length+stopword+symbol rules).
    */
  def qualityScore(text: Column): Column = {
    val punct = punctRatio(text)
    letBind(tokens(text), toks => {
      val stop = stopwordRatioOf(toks, EnStopwords)
      val nTok = size(toks)
      val lengthOk = when(nTok >= 10 && nTok <= 10000, lit(1.0))
        .otherwise(lit(0.0))
      least(lit(1.0), greatest(lit(0.0),
        lit(0.4) * lengthOk + lit(0.4) * least(lit(1.0), stop * 4) +
          lit(0.2) * (lit(1.0) - least(lit(1.0), punct * 5))))
    })
  }

  /** Count of the most frequent element in a string-array column,
    * computed as the longest equal-run in the sorted array — one
    * codegen'd higher-order `aggregate` per row, no explode, no
    * shuffle. This is the per-row mode-count that repetition-quality
    * filters (Gopher-style "fraction of tokens in the top token")
    * need; at 100 TB the whole metric stays inside the scan
    * projection.
    */
  def topElementCount(arr: Column): Column =
    aggregate(
      sort_array(arr),
      struct(lit(null).cast("string").as("prev"),
        lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Shannon entropy (bits/char) of the lowercased character stream —
    * the classic gibberish/byte-noise detector quality filters pair
    * with the stopword and repetition metrics: natural language sits
    * ~3.5–4.5 bits, base64/hex soup higher, "aaaa…" runs near 0.
    *
    * Row-local like [[topElementCount]]: one sorted-run `aggregate`
    * computes Σ n_c·ln(n_c) without exploding characters into a
    * shuffle, then H = (ln N − Σ/N)/ln 2 — algebraically the
    * frequency-table entropy, but derived from integer run lengths so
    * any engine reproduces it from the same counts (oracle rounds to
    * 4dp to absorb summation-order ulps).
    */
  def charEntropy(text: Column): Column =
    letBind(sort_array(filter(split(lower(text), ""), c => c =!= "")),
      chars =>
      letBind(size(chars), n => {
        val folded = aggregate(
          chars,
          struct(lit(null).cast("string").as("prev"),
            lit(0L).as("run"), lit(0.0).as("s")),
          (acc, x) => {
            val same = x <=> acc.getField("prev")
            struct(
              x.as("prev"),
              when(same, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
              when(same, acc.getField("s")).otherwise(
                acc.getField("s") +
                  when(acc.getField("run") > 0,
                    acc.getField("run").cast("double") *
                      log(acc.getField("run").cast("double")))
                    .otherwise(lit(0.0))).as("s"))
          },
          acc => acc.getField("s") +
            when(acc.getField("run") > 0,
              acc.getField("run").cast("double") *
                log(acc.getField("run").cast("double"))).otherwise(lit(0.0)))
        when(n === 0, lit(0.0)).otherwise(
          (log(n.cast("double")) - folded / n.cast("double")) / log(lit(2.0)))
      }))

  /** Adjacent-token bigram strings; empty array below 2 tokens. */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Language-ID heuristic: argmax of per-language stopword density over
    * en/de/fr, 'und' (undetermined) when every score is zero. Ties break
    * en > de > fr (>= comparisons), identically in the oracle.
    */
  def langId(text: Column): Column =
    letBind(tokens(text), toks =>
      // the argmax references each density 2-3 times — bind the three
      // filter passes once as well
      letBind(array(
        stopwordRatioOf(toks, EnStopwords),
        stopwordRatioOf(toks, DeStopwords),
        stopwordRatioOf(toks, FrStopwords)), r => {
        val en = element_at(r, 1)
        val de = element_at(r, 2)
        val fr = element_at(r, 3)
        when(en === 0.0 && de === 0.0 && fr === 0.0, lit("und"))
          .when(en >= de && en >= fr, lit("en"))
          .when(de >= fr, lit("de"))
          .otherwise(lit("fr"))
      }))
}
