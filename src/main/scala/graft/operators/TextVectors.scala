package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Feature-hashed bag-of-tokens document vectors (Weinberger et al.
  * 2009, "Feature Hashing for Large Scale Multitask Learning") — the
  * embedding-free bridge from text to the vector operators: corpora
  * without model embeddings can still run [[KMeans]] topic cells,
  * [[Similarity.semDedup]], or kNN over hashed count vectors.
  * Beyond-reference.
  *
  * Each token hashes to one of `dim` buckets (md5 → first 8 hex chars
  * → mod dim — the same engine-replayable hash device as
  * [[Sampling]]); component b = count of the document's tokens in
  * bucket b. Counts are exact integers (float-exact below 2^24), so
  * every downstream dot product inherits [[KMeans]]'s deterministic
  * exact arithmetic with `scale = 1`.
  *
  * Scale shape: explode → map-side-combined (id, bucket) count →
  * per-doc dense assembly from at most `dim` entries (bounded
  * per-group state, one shuffle on id). Documents with zero tokens
  * produce no row — same contract as [[Perplexity]].
  *
  * @return (idCol, vector) — vector is Array[Float] of length `dim`
  */
object TextVectors {

  def hashed(
      df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"hashed: dim must be >= 1, got $dim")
    val toks = df.select(col(idCol),
        explode(TF.tokens(col(textCol))).as("__tok"))
      .where(col("__tok") =!= "")
    val bucketed = toks
      .withColumn("__b",
        (conv(substring(md5(col("__tok")), 1, 8), 16, 10)
          .cast("long") % dim).cast("int"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
    bucketed.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__c"))))
        .as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("float"))
          .as("vector"))
  }
}
