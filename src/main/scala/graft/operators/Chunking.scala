package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sliding-window document chunking — the "split long documents into
  * training sequences / retrieval passages" primitive every pretraining
  * and RAG pipeline runs between cleaning and tokenization (beyond-
  * reference operator; builder brief's training-data-pipeline family).
  *
  * Semantics: tokenize (lowercased whitespace tokens, the corpus-wide
  * tokenizer from [[graft.functions.TextFunctions.tokens]]), then emit
  * one chunk per window start `0, stride, 2·stride, …` while
  * `start < n_tokens`. Tail chunks are short (no padding — the trainer
  * pads); `stride < chunkSize` yields overlapping chunks for retrieval,
  * `stride == chunkSize` yields a partition of the document.
  *
  * Scale: the whole operator is one codegen'd projection + generator
  * (`posexplode` over a `sequence` of starts) — row-local, zero
  * shuffles, zero joins. At 100 TB it streams through the scan with
  * output ∝ n_tokens/stride per document; each output row carries the
  * md5 of the chunk text rather than the text itself, so downstream
  * chunk-level dedup ([[Dedup.passageDuplication]]-style) shuffles
  * 16-byte digests, not passages. Callers that need the text join back
  * by (doc_id, start_tok) or re-slice at write time.
  */
object Chunking {

  /** Chunk index relation: (doc_id, chunk_id, start_tok, chunk_tokens,
    * chunk_hash). `chunk_id` is the 0-based window index within the
    * document; `start_tok` its 0-based token offset
    * (= chunk_id·stride); `chunk_hash` = md5 of the space-joined chunk
    * tokens (cross-engine exact: md5 of an identical string).
    */
  def slidingChunks(
      corpus: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    val starts: Column = {
      val n = size(col("__toks"))
      // sequence() throws on an empty range with a positive step, so
      // guard the degenerate all-whitespace document (0 tokens) to an
      // explicit empty array → the doc simply emits no chunks
      when(n > 0, sequence(lit(0), n - 1, lit(stride)))
        .otherwise(array().cast("array<int>"))
    }
    corpus
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        posexplode(starts).as(Seq("chunk_id", "start_tok")))
      .select(
        col("doc_id"), col("chunk_id"), col("start_tok"),
        least(lit(chunkSize), size(col("__toks")) - col("start_tok"))
          .as("chunk_tokens"),
        md5(concat_ws(" ",
          slice(col("__toks"), col("start_tok") + 1, lit(chunkSize))))
          .as("chunk_hash"))
  }

  /** Content-defined chunking (CDC): a chunk boundary opens AFTER any
    * token whose md5 lands in a 1/`divisor` hash bucket, so boundaries
    * are anchored to CONTENT, not positions — the property that makes
    * chunk-level dedup robust to insertions (public technique: rolling-
    * hash CDC as in LBFS/rsync; token-granular here so the oracle can
    * reproduce boundaries with the same cross-engine md5). An edit
    * shifts every fixed-stride window after it, but only the one CDC
    * chunk containing the edit changes — all other chunk hashes still
    * match, which is what passage-level dedup at 100 TB needs.
    *
    * Expected chunk length = `divisor` tokens (geometric). Dataflow:
    * map-side posexplode of tokens → per-doc running boundary count
    * (window PARTITIONED by doc — parallel across docs, never a
    * single-partition window) → one (doc, chunk) aggregate. Output
    * mirrors [[slidingChunks]]: (doc_id, chunk_id, start_tok,
    * chunk_tokens, chunk_hash).
    */
  def contentDefinedChunks(
      corpus: DataFrame, idCol: String, textCol: String,
      divisor: Int): DataFrame = {
    require(divisor > 1, s"divisor must be > 1, got $divisor")
    import org.apache.spark.sql.expressions.Window
    val toks = corpus
      .select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "tok")))
    // boundary OPENS a new chunk after a matching token, so the chunk
    // id of a token counts the boundaries STRICTLY BEFORE it
    val isBoundary =
      (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
        % divisor === 0).cast("long")
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("chunk_id",
        coalesce(sum(isBoundary).over(w), lit(0L)).cast("int"))
      .groupBy("doc_id", "chunk_id")
      .agg(min("pos").cast("int").as("start_tok"),
        count(lit(1)).cast("int").as("chunk_tokens"),
        // struct-sort pins token order inside the unordered aggregate
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok")))).as("chunk_hash"))
  }
}
