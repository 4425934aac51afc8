package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Apply trained BPE merges ([[BpeMerges]]) to a corpus — the
  * tokenization step between quality filtering and sequence packing in
  * a pre-training pipeline (the chain this engine now covers
  * end-to-end: quality rules → dedup → BPE encode → packing → export).
  * Beyond-reference.
  *
  * Scale shape — encode the VOCABULARY, join the corpus:
  *  - Greedy merge application is inherently sequential per word, but
  *    it is a function of the word alone, so it runs once per DISTINCT
  *    word (the trained vocabulary [[BpeMerges.train]] already holds,
  *    with every merge already applied — encoding a known word is a
  *    lookup, zero re-computation).
  *  - The corpus side explodes to (doc, word) and joins the
  *    vocabulary-sized (word → token count) table. At any corpus size
  *    the vocab side is orders of magnitude smaller (Heaps' law), so
  *    AQE picks a broadcast join; no hint is forced (the BucketCap
  *    lesson: only AQE knows the size).
  *  - Per-doc roll-up is a plain map-side-combined groupBy. Nothing in
  *    the plan holds a document's token sequence in one task unless
  *    the caller asks for sequences.
  *
  * Out-of-vocabulary words (encoding a NEW corpus against a frozen
  * tokenizer) fall back to character count + 1 (`</w>`) — every char
  * its own symbol, exactly what zero applicable merges produce.
  *
  * @return one row per document: (idCol, n_words, n_tokens)
  */
object BpeEncode {

  def apply(
      df: DataFrame, idCol: String, textCol: String,
      trained: BpeMerges.Trained): DataFrame = {
    val perWord = trained.vocab
      .select(col("w"), size(BpeMerges.symbols(col("seq"))).as("__n_tok"))
    val words = df
      .select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .where(col("w") =!= "")
    words.join(perWord, Seq("w"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("__n_tok"),
          length(col("w")) + lit(1))).as("n_tokens"))
  }

  /** Train-and-encode over one corpus: learn `rounds` merges from `df`
    * itself, then encode it. The common profiling call.
    */
  def apply(
      df: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val trained = BpeMerges.train(df, textCol, rounds)
    val out = apply(df, idCol, textCol, trained)
    // NOTE: vocab stays persisted until the returned plan executes —
    // the join references it. Release is safe (Spark recomputes from
    // lineage) but wasteful mid-query; callers that materialize the
    // result may release afterwards. Here the vocab is tiny and the
    // persist is dropped with the session's block manager.
    out
  }
}
