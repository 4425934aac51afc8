package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ranking primitives without the single-partition window
  * anti-pattern (`Window.orderBy` with no partition moves ALL rows to
  * one task — the exact failure mode flagged for q28 at sf0.1, fatal at
  * 100 TB).
  *
  * Technique (the standard two-pass distributed rank):
  *  1. `repartitionByRange` on the sort key → P range partitions, each
  *     internally unordered but globally ordered across partitions;
  *  2. per-partition `row_number` (window partitioned by partition id —
  *     P-way parallel, no global shuffle to one task);
  *  3. driver collects the P partition counts (P rows — metadata-sized)
  *     and turns them into prefix offsets;
  *  4. global row number = offset(pid) + local row number; ntile/rank
  *     formulas are then pure column arithmetic.
  *
  * Requires the sort key to be a total order (include a tiebreaker
  * column) so results are deterministic and oracle-exact: equal keys
  * may straddle range-partition boundaries, and only a total order
  * makes their global numbering unique.
  */
object DistributedRank {

  /** Sentinel: derive P from `spark.sql.shuffle.partitions` — sized per
    * deployment (32 locally, thousands on a cluster), so a fixed literal
    * would mean multi-TB range partitions at 100 TB.
    */
  val SessionDefault: Int = -1

  /** The per-pid offset is applied as a literal CASE chain up to this
    * many partitions (one codegen stage, zero joins). The chain is
    * LINEAR in P — analysis and codegen degrade past a few thousand
    * branches — so above the bound the offsets (still only P rows)
    * are applied with a broadcast hash join instead.
    */
  private[operators] val ChainMax = 1024

  private[operators] def resolvePartitions(df: DataFrame, p: Int): Int =
    if (p > 0) p
    else df.sparkSession.sessionState.conf.numShufflePartitions

  /** parted + `__off` (long): the partition's global offset, looked up
    * by `__pid`. `perPid(i)` = offset of partition i.
    */
  private[operators] def withOffset(
      parted: DataFrame, perPid: IndexedSeq[Long]): DataFrame =
    if (perPid.length <= ChainMax) {
      val chain = perPid.zipWithIndex.foldLeft(lit(0L)) {
        case (acc, (off, pid)) =>
          when(col("__pid") === pid, lit(off)).otherwise(acc)
      }
      parted.withColumn("__off", chain)
    } else {
      val spark = parted.sparkSession
      import spark.implicits._
      val offsets = perPid.zipWithIndex
        .map { case (off, pid) => (pid, off) }.toDF("__pid", "__off")
      parted.join(broadcast(offsets), "__pid")
    }

  /** df + "__rn" (1-based global row number by `sortCols`), computed
    * with P-way parallelism. `sortCols` must be a total order.
    */
  def withGlobalRowNumber(
      df: DataFrame, sortCols: Seq[Column],
      numPartitions: Int = SessionDefault): DataFrame =
    rankedWithTotal(df, sortCols, numPartitions)._1

  /** (ranked df, total row count) — total comes from the same pass that
    * computed the offsets, so no extra job over the data.
    */
  private def rankedWithTotal(
      df: DataFrame, sortCols: Seq[Column],
      requestedPartitions: Int): (DataFrame, Long) = {
    // loud failure instead of silently overwriting-then-dropping a
    // caller column that collides with the internal working names
    for (reserved <- Seq("__pid", "__off"))
      require(!df.columns.contains(reserved),
        s"DistributedRank: input already has a '$reserved' column — " +
          "rename it before ranking")
    val numPartitions = resolvePartitions(df, requestedPartitions)
    // localCheckpoint (eager) pins the partitioning — the count pass and
    // the rank pass must see identical pids, and repartitionByRange
    // samples nondeterministically across recomputation. Unlike
    // persist(), the checkpoint blocks are NOT registered in the
    // CacheManager: they are reclaimed by the ContextCleaner as soon as
    // the returned DataFrame is dropped, so repeated calls in a
    // long-lived service cannot accumulate executor memory.
    val parted = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = parted.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until numPartitions)
      .scanLeft(0L)((acc, pid) => acc + counts.getOrElse(pid, 0L))
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val ranked = withOffset(parted, offsets.init.toIndexedSeq)
      .withColumn("__rn", row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__off")
    (ranked, offsets.last)
  }

  /** Exact SQL `ntile(n) OVER (ORDER BY sortCols)` — first `total % n`
    * tiles get `ceil(total/n)` rows, the rest `floor(total/n)` — with no
    * single-partition stage. Adds column `tile` (int).
    */
  def ntile(
      df: DataFrame, n: Int, sortCols: Seq[Column],
      numPartitions: Int = SessionDefault): DataFrame = {
    val (ranked, total) = rankedWithTotal(df, sortCols, numPartitions)
    val q = total / n
    val r = total % n
    val cut = r * (q + 1) // rows in the first r (larger) tiles
    val tile =
      if (q == 0) col("__rn") - 1 // fewer rows than tiles: tile = row number
      else when(col("__rn") <= cut, (col("__rn") - 1) / lit(q + 1))
        .otherwise(lit(r) + (col("__rn") - 1 - cut) / lit(q))
    ranked
      .withColumn("tile", (floor(tile) + 1).cast("int"))
      .drop("__rn")
  }

  /** Exact SQL `ntile(n) OVER (PARTITION BY groupCols ORDER BY
    * sortCols)` with neither a single-partition stage NOR a per-group
    * task: one global range-partitioned rank over
    * (groupCols ++ sortCols), then each group's local rank and size
    * derived from a group-stats aggregate joined back (AQE broadcasts
    * it when the group count is small; any group cardinality works —
    * nothing is collected). A hot group still never lands in one task:
    * its rows stay spread across the range partitions they fell into.
    *
    * `sortCols` must totally order rows WITHIN a group (include a
    * tiebreaker). Adds column `tile` (int).
    */
  def ntileBy(
      df: DataFrame, n: Int, groupCols: Seq[String], sortCols: Seq[Column],
      numPartitions: Int = SessionDefault): DataFrame = {
    require(n >= 1, s"ntileBy: n must be >= 1, got $n")
    val ranked = withGlobalRowNumber(
      df, groupCols.map(col) ++ sortCols, numPartitions)
    val stats = ranked.groupBy(groupCols.map(col): _*)
      .agg(min("__rn").as("__first"), count(lit(1)).as("__gn"))
    val lr = col("__rn") - col("__first") + 1 // 1-based rank in group
    val q = floor(col("__gn") / n)            // base tile size
    val r = col("__gn") % n                   // tiles one row larger
    val cut = r * (q + 1)                     // rows in the larger tiles
    val tile = when(col("__gn") < n, lr)      // fewer rows than tiles
      .otherwise(when(lr <= cut, floor((lr - 1) / (q + 1)))
        .otherwise(r + floor((lr - cut - 1) / q)) + 1)
    ranked.join(stats, groupCols)
      .withColumn("tile", tile.cast("int"))
      .drop("__rn", "__first", "__gn")
  }
}
