package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Length-bucketed batch shaping for training/inference pipelines —
  * the "how much compute does padding burn" report every serving and
  * training stack runs before choosing bucket boundaries
  * (beyond-reference; sibling of [[Packing]], which ELIMINATES padding
  * by concatenation — this operator MEASURES it for the
  * pad-to-bucket-max strategy used when sequences cannot be packed,
  * e.g. inference batching or contrastive training).
  *
  * Documents are assigned to fixed-width length buckets
  * (`bucket_lo = floor(len / width) * width`); within a bucket every
  * sequence is padded to the bucket's OBSERVED max, so the waste of a
  * bucket is `n_docs · max_len − sum_len` padding tokens. The report
  * yields, per (group, bucket): doc count, token sum, observed max,
  * and the padding-waste fraction of the padded token volume.
  *
  * Scale shape: one map-side length computation (codegen'd split —
  * no UDF, no explode: the LENGTH of the token array, never its
  * elements) feeding one `groupBy` with map-side partial aggregation —
  * a single metadata-light shuffle of (group, bucket) keys at any
  * corpus size. Waste arithmetic is exact integer counts divided once,
  * so the result is bit-identical on any engine.
  */
object Batching {

  /** Per-(group, bucket) padding-waste report.
    *
    * @param df       corpus
    * @param lenCol   sequence length (token count) column
    * @param groupCol coarse grouping column (e.g. lang); batches are
    *                 formed within a group
    * @param width    bucket width in tokens
    * @return (group, bucket_lo, n_docs, sum_tokens, max_tokens,
    *         pad_waste_pct) — waste as a fraction of the padded volume
    *         `n_docs · max_tokens`, 4dp
    */
  def lengthBuckets(
      df: DataFrame, lenCol: Column, groupCol: Column,
      width: Int): DataFrame = {
    require(width > 0, s"lengthBuckets: width must be positive, got $width")
    df.select(groupCol.as("group"),
        (floor(lenCol.cast("long") / width) * width).cast("int")
          .as("bucket_lo"),
        lenCol.cast("long").as("__len"))
      .groupBy("group", "bucket_lo")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__len")).as("sum_tokens"),
        max(col("__len")).cast("int").as("max_tokens"))
      .withColumn("pad_waste_pct",
        round((col("n_docs") * col("max_tokens") - col("sum_tokens"))
          .cast("double") / (col("n_docs") * col("max_tokens")), 4))
  }
}
