package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe "drop oversized buckets" for inverted-index candidate
  * generation (LSH bands, SimHash blocks, winnowing fingerprints,
  * n-gram postings).
  *
  * The obvious formulation — `count(1).over(Window.partitionBy(key))`
  * then filter — is wrong at scale: WindowExec gets no partial
  * aggregation, so EVERY posting of the most degenerate bucket (the
  * billion-row empty-string bucket the cap exists to drop) is shuffled
  * into ONE task and sorted there before being discarded. This helper
  * computes the same row set with bounded per-task state:
  *
  *   1. `groupBy(keys).count()` — map-side partial combine collapses a
  *      hot key to one row per mapper; no task ever holds a bucket.
  *   2. filter to the oversized keys — few by definition (each carries
  *      more than `max` postings, so at most |postings|/max keys).
  *   3. broadcast LEFT ANTI join the postings against that key set —
  *      a map-only pass, no shuffle of the postings at all.
  *
  * The input is evaluated twice (once to count, once to probe), both
  * times as a streaming map-side pass — the right trade against a
  * single-task straggler/OOM.
  */
object BucketCap {

  /** Rows of `df` whose (keys) group has at most `max` rows. */
  def dropOversized(df: DataFrame, max: Long, keys: String*): DataFrame = {
    val oversized = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .where(col("__bucket_n") > max)
      .select(keys.map(col): _*)
    df.join(broadcast(oversized), keys.toSeq, "left_anti")
  }
}
