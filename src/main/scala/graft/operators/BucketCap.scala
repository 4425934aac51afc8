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
  *   3. LEFT ANTI join the postings against that key set. No broadcast
  *      hint: a forced `broadcast()` overrides AQE's size check, and on
  *      a low-entropy 100 TB corpus (boilerplate-heavy web text — the
  *      exact input dedup is run on) |postings|/max can be millions of
  *      keys, enough to OOM the driver. AQE converts the anti join to
  *      broadcast at runtime when the aggregated key set is actually
  *      small (the common case), and falls back to a shuffle anti-join
  *      when it is not — both are correct; only AQE knows the size.
  *
  * Keys are compared null-safely (`<=>`): the degenerate buckets this
  * cap exists for include NULL-keyed ones (a failed parse yielding a
  * NULL fingerprint lands every bad row in one bucket), and a plain
  * equality anti-join would pass every NULL-keyed row through the cap
  * untouched.
  *
  * The input is evaluated twice (once to count, once to probe), both
  * times as a streaming map-side pass — the right trade against a
  * single-task straggler/OOM. When the input itself contains a shuffle
  * (the usual case: postings built from an upstream aggregate), the
  * second evaluation resumes from the exchange files rather than
  * re-scanning the corpus — Catalyst's ReuseExchange / AQE stage reuse
  * dedupes the identical exchange subtrees (pinned by PlanAuditSpec).
  *
  * ==Tuning `max` (the `maxBucket = 1000` defaults in Dedup/Similarity)==
  * The cap bounds per-bucket pair generation, which is QUADRATIC in
  * bucket size: a bucket of n postings emits ~n²/2 candidate pairs, so
  * max=1000 bounds any one bucket at ~500k pairs — a single task's
  * worth of work. Crucially the right value does NOT grow with corpus
  * size: under a well-mixed 64-bit band/block hash, expected bucket
  * size stays small at any N (collisions are genuine near-duplicates);
  * what grows with N is the NUMBER of degenerate buckets dropped, and
  * that side scales fine (step 1 is a map-side combine, step 3 an AQE-
  * sized anti-join). Raise `max` only when legitimate duplicate
  * clusters larger than it must be LINKED rather than sampled —
  * e.g. boilerplate pages repeated >1000× that all need one canonical
  * survivor — and then prefer running exact/normalized dedup first so
  * those collapse before LSH ever sees them; lower it (100–500) when a
  * skew-heavy corpus makes even 500k-pair tasks straggle. The recall
  * cost of the cap is confined to pairs whose EVERY colliding band is
  * oversized; with the default b=16 bands a pair is lost only if all
  * its collisions land in >max buckets — boilerplate by definition.
  */
object BucketCap {

  /** Rows of `df` whose (keys) group has at most `max` rows. */
  def dropOversized(df: DataFrame, max: Long, keys: String*): DataFrame = {
    val oversized = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .where(col("__bucket_n") > max)
      .select(keys.zipWithIndex.map { case (k, i) =>
        col(k).as(s"__oversized_k$i") }: _*)
    val cond = keys.zipWithIndex.map { case (k, i) =>
      df(k) <=> oversized(s"__oversized_k$i") }.reduce(_ && _)
    df.join(oversized, cond, "left_anti")
  }

  /** ONE-PASS bucket capping for postings `(keys…, idCol)`: per-key id
    * arrays with oversized buckets dropped, computed in a single
    * aggregation over a single evaluation of `df`.
    *
    * This is the preferred form for inverted-index candidate
    * generation. [[dropOversized]] preserves the input's row shape but
    * evaluates `df` twice (count + probe), and when the caller then
    * self-joins the capped postings the whole upstream — corpus scan,
    * shingling, signature aggregation — is planned FOUR times (two
    * probe sides, each with its own count subplan; the r7 bench
    * measured the cluster of consumers 1.2–1.6× slower for exactly
    * this reason). Collecting each bucket's ids with
    * [[graft.functions.BoundedCollect]] instead needs one aggregation:
    * per-key buffers are capped at `max + 1` elements (bounded task
    * state even for the billion-posting degenerate bucket — overflow
    * is DETECTED, never HELD), then `size <= max` drops oversized
    * buckets exactly, and downstream pair generation explodes the
    * arrays — no anti-join, no self-join, no second evaluation.
    *
    * NULL keys form a normal group (and are capped like any other —
    * the null-fingerprint bucket of a failed parse is precisely the
    * degenerate case); NULL ids are skipped.
    *
    * @return one row per surviving bucket: (keys…, __ids)
    */
  def cappedBuckets(
      df: DataFrame, max: Long, idCol: String, keys: String*): DataFrame = {
    require(max + 1 <= Int.MaxValue, s"max out of range: $max")
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.BoundedCollect
        .boundedCollect(df.sparkSession, col(idCol), (max + 1).toInt)
        .as("__ids"))
      .where(size(col("__ids")) <= max)
  }

  /** [[cappedBuckets]] exploded back to posting shape `(keys…, idCol)`
    * — the same row set `dropOversized` returns (id order within a
    * bucket may differ; sets are equal), from one pass.
    */
  def cappedPostings(
      df: DataFrame, max: Long, idCol: String, keys: String*): DataFrame =
    cappedBuckets(df, max, idCol, keys: _*)
      .select(keys.map(col) :+ explode(col("__ids")).as(idCol): _*)

  /** Within-bucket candidate pairs `(id_a, id_b)` with `id_a < id_b`,
    * one output row PER shared bucket (callers `.distinct()` for the
    * candidate set or `groupBy.count` for co-occurrence counts — both
    * identical to what the capped self-join produced). The two nested
    * explodes stream C(n,2) ≤ C(max,2) pairs per bucket through the
    * downstream operator without materializing them.
    */
  def cappedPairs(
      df: DataFrame, max: Long, idCol: String, keys: String*): DataFrame =
    cappedBuckets(df, max, idCol, keys: _*)
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
}
