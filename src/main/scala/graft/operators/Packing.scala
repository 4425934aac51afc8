package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data export: lay documents out in a
  * deterministic order and cut the concatenated token stream into
  * fixed-budget blocks — the "concatenate then chunk" step every
  * LLM pretraining pipeline runs between corpus and dataloader
  * (beyond-reference operator; Sampling.withShard's sibling).
  *
  * The core is a GLOBAL running token count. A naive
  * `sum() OVER (ORDER BY id)` moves the whole corpus into one task
  * (the single-partition-window anti-pattern [[DistributedRank]]
  * exists to kill); here the prefix sum is two-pass:
  *
  *   1. range-partition by the order key; per-partition running sums
  *      (P-way parallel window);
  *   2. driver folds the P partition TOTALS (metadata-sized) into
  *      offsets, added back as a literal CASE chain.
  *
  * Block assignment is then pure column arithmetic:
  * `block_id = floor(tokens_before / budget)` — blocks are contiguous
  * token ranges, documents crossing a boundary span two (or more)
  * blocks, exactly like the physical pack. The output is
  * oracle-exact: DuckDB reproduces it with an ordinary window sum.
  */
object Packing {

  /** df + (`tokens_before`, `block_id`, `n_blocks`) by packing
    * `tokenCol` in `orderCol` order into `budget`-token blocks.
    * `orderCol` must be a total order (unique); token counts must be
    * non-negative.
    */
  def pack(df: DataFrame, orderCol: String, tokenCol: String,
      budget: Long,
      numPartitions: Int = DistributedRank.SessionDefault): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val before = prefixSum(df, col(orderCol), col(tokenCol), numPartitions)
    before
      .withColumn("block_id", floor(col("tokens_before") / budget))
      // a doc spans ceil over the budget grid: blocks touched by
      // [tokens_before, tokens_before + tokens). A zero-token doc sits
      // at its block with no extent — span 1 regardless of position
      // (the raw formula would say 0 exactly on a budget boundary)
      .withColumn("n_blocks",
        when(col(tokenCol) === 0, lit(1)).otherwise(
          (floor((col("tokens_before") + col(tokenCol) - 1) / budget)
            - col("block_id") + 1).cast("int")))
  }

  /** df + `tokens_before` = exclusive global prefix sum of `valueCol`
    * in `orderCol` order, with no single-partition stage (two-pass
    * range-partitioned, same shape as [[DistributedRank]]).
    */
  def prefixSum(df: DataFrame, orderCol: Column, valueCol: Column,
      numPartitions: Int = DistributedRank.SessionDefault): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = DistributedRank.resolvePartitions(df, numPartitions)
    // localCheckpoint pins the range partitioning between the totals
    // pass and the output pass (repartitionByRange samples); blocks are
    // cleaner-reclaimed when the result is dropped — see
    // DistributedRank.rankedWithTotal for the full rationale.
    val parted = df.repartitionByRange(p, orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = parted.groupBy("__pid")
      .agg(sum(valueCol.cast("long")).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p)
      .scanLeft(0L)((acc, pid) => acc + totals.getOrElse(pid, 0L))
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    DistributedRank.withOffset(parted, offsets.init.toIndexedSeq)
      .withColumn("tokens_before",
        sum(valueCol.cast("long")).over(w) - valueCol.cast("long")
          + col("__off"))
      .drop("__pid", "__off")
  }
}
