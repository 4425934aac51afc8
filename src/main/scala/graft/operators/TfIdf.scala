package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus — the classic
  * "characteristic terms per document" primitive a training-data
  * pipeline uses for topic tagging, corpus profiling, and
  * cluster labeling (beyond-reference operator; builder brief's
  * text-analysis family alongside `functions/TextFunctions`).
  *
  * Dataflow (all relational, nothing driver-side):
  *
  *   tokens (map-side explode) → tf = count per (doc, term) [shuffle 1]
  *   → df = count per term over tf [shuffle 2, (doc,term)-sized input]
  *   → N  = distinct ids over the raw corpus [broadcast 1-row]
  *   → score = tf · ln(N/df) → top-k per doc [window PARTITIONED by
  *     doc + WindowGroupLimit, so no single-partition window ever]
  *
  * Scale notes for 100 TB:
  *   - df comes from `groupBy(term).count`, not a window over term:
  *     partial aggregation absorbs hot-term skew map-side, where a
  *     term-partitioned window would put every ("the", doc) row in
  *     one task.
  *   - [[topTerms]] tokenizes the corpus twice (once under tf, once
  *     under df — Catalyst column-prunes the two branches differently,
  *     so they cannot share an exchange). N costs only a doc-id-pruned
  *     scan, no explode. At 100 TB, materialize the (doc, term, tf)
  *     relation ONCE — `termFrequencies` written to a lake table — and
  *     run [[topTermsFromTf]] over it: one tokenize pass total, and tf
  *     is usually wanted as an artifact anyway.
  *   - ranking orders by the 4-decimal-rounded score first, then the
  *     integer pair (tf DESC, df ASC) + term: the rounding absorbs the
  *     1-ulp `ln` differences a raw-float order could flip across
  *     engines/libms, and the integer tiebreak makes equal-score rows
  *     platform-exact.
  */
object TfIdf {

  /** The (doc_id, term, tf) relation. Tokenization: lowercase, runs of
    * `[a-z0-9]` (cross-engine exact).
    */
  def termFrequencies(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpus.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .where(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Top-`k` terms per document with their tf-idf scores.
    * Output: (doc_id, term, tf, df, score), ≤`k` rows per document,
    * deterministic under ties.
    */
  def topTerms(corpus: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val nDocs = corpus.agg(countDistinct(col(idCol)).as("n_docs"))
    topTermsFromTf(termFrequencies(corpus, idCol, textCol), nDocs, k)
  }

  /** Corpus-frequency document score — the unigram-LM proxy behind
    * CCNet/Gopher-style frequency filtering: documents whose tokens
    * are unusually RARE corpus-wide (gibberish, OCR noise, foreign
    * scripts) score low `mean_freq`; boilerplate-heavy docs score
    * high. The real pipelines use a KenLM perplexity; the unigram
    * mean-frequency is the vocab-free equivalent with the same
    * dataflow (token → corpus LM stats → per-doc score).
    *
    * Output per doc: n_tokens, sum_freq (Σ corpus count of each token
    * occurrence), mean_freq = sum_freq / (n_tokens · total_tokens).
    *
    * Exactness by construction: every aggregate is an integer sum
    * (order-independent, engine-exact) and the single double division
    * happens once per output row on identical operands — no
    * float-accumulation ordering anywhere, so the oracle hash-matches
    * bit-for-bit.
    *
    * Scale: reuses the (doc, term, tf) relation, so the term-keyed
    * join fans out one row per DISTINCT (doc, term), not per token
    * occurrence; term counts partial-aggregate map-side. Same 100 TB
    * note as [[topTerms]]: materialize `termFrequencies` once and
    * feed [[unigramFreqFromTf]].
    */
  def unigramFreqScore(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    unigramFreqFromTf(termFrequencies(corpus, idCol, textCol))

  /** Score from a precomputed (doc_id, term, tf) relation. */
  def unigramFreqFromTf(tf: DataFrame): DataFrame = {
    val counts = tf.groupBy("term").agg(sum("tf").as("cnt"))
      // vocabulary-sized, but its lineage is tf (a corpus tokenize
      // unless the caller materialized it) and BOTH `total` and the
      // term join reference it — pin it so the lineage runs once
      // (the Dsir lesson; vocab rows ≪ corpus rows at any scale)
      .localCheckpoint()
    val total = counts.agg(sum("cnt").as("total"))
    tf.join(counts, "term")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("cnt")).as("sum_freq"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"), col("sum_freq"),
        (col("sum_freq").cast("double") /
          (col("n_tokens").cast("double") * col("total").cast("double")))
          .as("mean_freq"))
  }

  /** Per-group vocabulary-growth / lexical-diversity report — the
    * corpus-health numbers (type-token ratio, hapax share) a data
    * curator reads before and after dedup/filtering: a falling TTR or
    * hapax ratio across pipeline stages means the filters are
    * collapsing lexical diversity, a rising one that boilerplate was
    * removed (Heaps'-law-style diagnostics, beyond-reference).
    *
    * Output per `groupCol` value: n_docs, n_tokens, n_types (distinct
    * terms), n_hapax (terms occurring exactly once in the group), and
    * the two exact ratios ttr = types/tokens, hapax_ratio =
    * hapax/types.
    *
    * Scale shape: tokenize → `groupBy(group, term).count` — the ONLY
    * per-token shuffle, with map-side combine collapsing each mapper's
    * repeats of a term to one row, so hot terms ("the") cost one row
    * per mapper, never a skewed reduce — then a (group, term)-sized
    * second aggregate down to |groups| rows. Distinct-doc counts ride
    * the same first aggregate (`countDistinct(doc)` per (group, term)
    * would be wrong AND heavy; a separate map-side `groupBy(group)
    * .agg(countDistinct)` over just (group, doc_id) columns is exact
    * and scan-pruned).
    */
  def vocabStats(corpus: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    val terms = corpus.select(col(groupCol).as("group"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .where(col("term") =!= "")
      .groupBy("group", "term").agg(count(lit(1)).as("cnt"))
    val byGroup = terms.groupBy("group").agg(
      sum("cnt").as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
    val docs = corpus.select(col(groupCol).as("group"), col(idCol))
      .groupBy("group").agg(countDistinct(col(idCol)).as("n_docs"))
    docs.join(byGroup, Seq("group"))
      .select(col("group"), col("n_docs"), col("n_tokens"),
        col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 4)
          .as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types"), 4)
          .as("hapax_ratio"))
  }

  /** Top-`k` from a precomputed (doc_id, term, tf) relation — the one-
    * tokenize-pass path for corpora where `tf` is materialized as a
    * table. `nDocs` is a 1-row (n_docs) frame, kept in-plan (no
    * driver-side collect).
    */
  def topTermsFromTf(tf: DataFrame, nDocs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(round(col("score"), 4).desc,
        col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"))
  }
}
