package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a candidate-pair edge list — the last
  * step of every dedup pipeline: LSH/SimHash/winnowing emit PAIRS, but
  * the keep/drop decision needs GROUPS (a chain a–b, b–c is one
  * cluster even though (a,c) never collided).
  *
  * Algorithm: iterative min-label propagation. Each node starts
  * labeled with its own id; every round each node takes the minimum
  * label among itself and its neighbors; at the fixed point every
  * member of a component carries the component's minimum id. Rounds
  * needed = graph diameter.
  *
  * 100 TB design notes:
  *  - The input is the *verified pair list* (ids only, already
  *    threshold-filtered), which is orders of magnitude smaller than
  *    the corpus — this never touches document text or signatures.
  *  - Near-duplicate graphs in web-scale corpora are dense clumps of
  *    copies, so the diameter — and hence round count — is small
  *    (single digits); `maxIter` is a guard, and the loop exits early
  *    on convergence. For adversarial long-chain graphs the
  *    large-star/small-star variant (Kiveris et al., MR'14) converges
  *    in O(log n) rounds; label propagation is chosen because each of
  *    its rounds is one join + one aggregate on (id, label) longs and
  *    the realistic diameter is tiny.
  *  - Each round materializes the new labels (MEMORY_AND_DISK) and
  *    only then unpersists the previous round, so nothing recomputes
  *    in steady state and no cache leaks past the call (the verdict's
  *    DistributedRank lesson). Labels only ever decrease, so
  *    convergence is one `sum(label)` scalar per round instead of a
  *    change-count join.
  *
  * Reference behavior anchor: none — the reference has no
  * near-duplicate or grouping operator anywhere in its surface (its
  * compaction merge, reference internal/database/compact.go, rewrites
  * files by sort order and never compares row content). This operator
  * is beyond-reference surface, required by the training-data-pipeline
  * brief: sketch pipelines emit pairs; the keep/drop decision needs
  * groups.
  *
  * @param pairs DataFrame with two id columns (`id_a`, `id_b`)
  * @return (id, component) — one row per node that appears in any
  *         pair; `component` is the minimum id of its component
  */
object Components {

  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    val edgesRaw = pairs
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
    // symmetrize so one join per round sees both directions
    val edges = edgesRaw
      .union(edgesRaw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Iterative DataFrame algorithms MUST truncate lineage each round:
    // `labels` enters the next plan twice (union arm + join arm), so
    // without truncation the logical plan doubles per iteration —
    // analysis and AQE plan-printing go exponential long before the
    // data does. Re-rooting the persisted rows as a fresh LogicalRDD
    // keeps every round's plan constant-size; the per-round Row
    // conversion touches only the (id, comp) label table, which is
    // pairs-sized, not corpus-sized.
    def reroot(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)

    var labels = reroot(edges.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize + convergence metric in one pass; sum is exact: ids
    // are bounded longs and components only shrink toward min-id
    var checksum = labels.agg(coalesce(sum("comp"), lit(0L))).head().getLong(0)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val next = reroot(labels
          .union(
            edges.join(labels.withColumnRenamed("id", "src"), "src")
              .select(col("dst").as("id"), col("comp")))
          .groupBy("id").agg(min("comp").as("comp")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nextSum = next.agg(coalesce(sum("comp"), lit(0L))).head().getLong(0)
      labels.unpersist()
      converged = nextSum == checksum
      checksum = nextSum
      labels = next
      iter += 1
    }
    if (!converged) {
      labels.unpersist()
      edges.unpersist()
      // silently returning partially-merged labels would hand dedup a
      // plausible-but-wrong keep/drop split — fail loudly instead
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIter=$maxIter " +
          "rounds (graph diameter exceeds maxIter); re-run with a larger " +
          "maxIter")
    }
    // eagerly materialize the result with truncated lineage, then drop
    // BOTH working caches — repeated calls in a long session must not
    // accumulate label RDDs. localCheckpoint (not reroot) because the
    // rerooted RDD still recomputes through the unpersisted chain; the
    // checkpointed copy is pairs-sized and ContextCleaner reclaims it
    // when the caller releases the returned DataFrame.
    val out = labels.select(col("id"), col("comp").as("component"))
      .localCheckpoint(true)
    labels.unpersist()
    edges.unpersist()
    out
  }

  /** Per-component summary: representative (min id = component), size,
    * and the keep/drop split a dedup pass acts on.
    */
  def componentStats(labeled: DataFrame): DataFrame =
    labeled.groupBy("component")
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("id") =!= col("component"), 1L).otherwise(0L))
          .as("n_dropped"))

  /** Quality-canonical keeper per component: instead of the smallest
    * id, keep the member with the HIGHEST score (id tiebreak) — the
    * policy real dedup pipelines use (keep the cleanest copy, drop the
    * rest). `quality` is (id, quality); the per-component argmax is a
    * rank-1 filter over (quality desc, id) and compiles to
    * WindowGroupLimit — per-mapper partial top-1 below the shuffle, so
    * no task ever holds a whole component (PlanAuditSpec pin).
    *
    * @return (component, n_members, keep_id, keep_quality)
    */
  def canonicalBy(labeled: DataFrame, quality: DataFrame): DataFrame = {
    val withQ = labeled.join(quality, "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component")
      .orderBy(col("quality").desc, col("id").asc)
    val keepers = withQ
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("component"), col("id").as("keep_id"),
        col("quality").as("keep_quality"))
    withQ.groupBy("component").agg(count(lit(1)).as("n_members"))
      .join(keepers, "component")
      .select(col("component"), col("n_members"), col("keep_id"),
        col("keep_quality"))
  }
}
