package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Aggregators

/** Exact corpus-wide top-k terms via a Misra–Gries candidate sketch —
  * the "most frequent tokens / domains / n-grams" profiling query every
  * training-data pipeline runs, built sketch-then-verify like the dedup
  * family (beyond-reference operator).
  *
  * Why not a plain `groupBy(term).count().orderBy(...).limit(k)`: at
  * web scale the distinct-term cardinality is billions, so the full
  * groupBy shuffles the entire vocabulary to produce 20 rows. Here the
  * dataflow is
  *
  *   tokens → MG sketch (fixed m-entry buffers map-side, one global
  *   merge of ≤ m·partitions entries)            [shuffle: m·P rows]
  *   → candidate terms (≤ m)                     [broadcast]
  *   → exact counts of candidates only           [shuffle: ≤ m·P rows]
  *   → rank + limit k                            [window over ≤ m rows]
  *
  * so no stage ever shuffles vocabulary-sized data. The result is
  * EXACT (not approximate) whenever the k-th true frequency exceeds
  * N/(m+1) — the MG guarantee that every such term reaches the
  * candidate set; exact counting then makes the ranking sketch-
  * independent, which is why the DuckDB oracle (a full exact top-k)
  * hash-matches. Callers choose m ≫ k·(N/f_k bound); the default 256
  * covers any corpus whose top-k terms hold > 0.4% of tokens.
  *
  * The final ranking window runs over ≤ m candidate rows
  * (metadata-sized) — the corpus-sized-window prohibition doesn't
  * apply.
  */
object HeavyHitters {

  /** (term, cnt, rank) for the k most frequent terms, ranked by exact
    * count desc then term asc (deterministic under ties). Tokenizer:
    * lowercase runs of [a-z0-9] — identical to [[TfIdf]].
    */
  def topK(corpus: DataFrame, textCol: String, k: Int,
      capacity: Int = 256): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(capacity >= k,
      s"sketch capacity $capacity must be >= k=$k")
    val terms = corpus
      .select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .where(col("term") =!= "")
    val candidates = terms
      .agg(Aggregators.misraGries(capacity)(col("term")).as("cand"))
      .select(explode(col("cand")).as("term"))
    val counted = terms.join(broadcast(candidates), "term")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    // bare global window is safe HERE ONLY: `counted` has at most
    // `capacity` rows (the Misra-Gries candidate set), so the single
    // partition WindowExec warns about holds a bounded sketch, not data
    val rank = Window.orderBy(col("cnt").desc, col("term").asc)
    counted
      .withColumn("rank", row_number().over(rank))
      .where(col("rank") <= k)
      .select(col("term"), col("cnt"), col("rank"))
  }
}
