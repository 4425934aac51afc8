package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.PartitionSpec

/** MERGE/upsert into a lake table — latest-wins by key, the CDC
  * "apply a changelog batch" primitive lakehouse pipelines run between
  * ingest and query (beyond-reference surface: the reference's lake is
  * append+compact only; SURVEY §2A rows 12/16-18 cover those halves).
  *
  * Semantics: within each (tp_date, tp_index, key) the row with the
  * highest tp_timestamp wins; on a tie the incoming batch beats the
  * stored row (so re-applying the same batch is idempotent, and a
  * same-event-time correction replaces the stored row). Keys are
  * PARTITION-SCOPED (the non-global-index behavior of public lakehouse
  * engines): an update lands in the partition its own timestamp and
  * index enrich to, and a batch row whose index-deriving column
  * differs from the stored row's is a DIFFERENT partition-scoped key —
  * the stored row survives, deterministically, regardless of which
  * directories the rest of the batch happens to touch. (A global-key
  * upsert would need a full-table key index — by design out of scope.)
  *
  * Scale shape: the batch's distinct (tp_index, tp_year, tp_month)
  * triples — exactly the physical partition directories dynamic
  * overwrite will swap — prune the existing-table read to the touched
  * directories. Up to [[Upsert.ChainMax]] triples that is an OR-chain
  * over partition columns (Catalyst prunes at planning time, zero
  * joins); past it — a backfill touching thousands of directories —
  * the chain would be an O(dirs) boolean tree that analysis/codegen
  * choke on (the DistributedRank.ChainMax hazard), so the scope
  * becomes a broadcast semi-join on the partition columns instead:
  * the dirs frame is dirs-sized, and because the join keys ARE the
  * partition columns, dynamic partition pruning keeps the scan from
  * reading untouched directories. The winner-per-key window
  * partitions by (date, key) — parallel across keys, never a
  * single-partition window; the write is the same dynamic partition
  * overwrite compaction uses. Cost scales with touched partitions,
  * not table size.
  */
object Upsert {

  /** Above this many touched directories the pruning predicate
    * switches from a literal OR-chain to a broadcast semi-join —
    * same bound and reasoning as DistributedRank.ChainMax (a linear
    * boolean tree degrades analysis/codegen past a few thousand
    * branches).
    */
  private[lake] val ChainMax = 1024

  /** Restrict `df` to the touched (index, year, month) directories —
    * OR-chain below [[ChainMax]], broadcast semi-join above it.
    */
  private[lake] def scopeToTouched(
      df: DataFrame, touched: Seq[(String, Int, Int)]): DataFrame =
    if (touched.size <= ChainMax) {
      val pred = touched.map { case (i, y, m) =>
        col(TpSchema.Index).cast("string") === i &&
          col(TpSchema.Year) === y && col(TpSchema.Month) === m
      }.reduce(_ || _)
      df.where(pred)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val dirs = touched.toDF("__ti", "__ty", "__tm")
      df.join(broadcast(dirs),
        col(TpSchema.Index).cast("string") === col("__ti") &&
          col(TpSchema.Year) === col("__ty") &&
          col(TpSchema.Month) === col("__tm"),
        "left_semi")
    }

  /** Apply `updates` (source-schema rows, like an ingest batch) to
    * `table`. With `report=true` returns (rowsBefore, rowsAfter) over
    * the touched partition directories — two extra counting jobs over
    * those directories, so reporting is opt-in for pipeline use;
    * `report=false` returns (-1, -1) and runs only the merge itself.
    */
  def upsert(
      spark: SparkSession, lake: Lake, table: String, updates: DataFrame,
      spec: PartitionSpec, keyCols: Seq[String],
      timestampColumn: String = TpSchema.Timestamp,
      report: Boolean = false): (Long, Long) = {
    require(keyCols.nonEmpty, "upsert requires at least one key column")
    val enriched = TpSchema.enrich(updates, spec, timestampColumn)
    keyCols.foreach(k => require(enriched.columns.contains(k),
      s"upsert: key column '$k' not in batch (columns: " +
        s"${enriched.columns.mkString(", ")})"))
    // the directories this batch lands in = the directories dynamic
    // overwrite will replace = the rows that must ride along unchanged
    val touched = enriched
      .select(col(TpSchema.Index).cast("string").as("i"),
        col(TpSchema.Year).as("y"), col(TpSchema.Month).as("m"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    require(touched.nonEmpty, "upsert: empty update batch")
    val current = scopeToTouched(lake.read(spark, table), touched)
    val before = if (report) current.count() else -1L
    val cols = current.columns.toSeq
    val combined = current.select(cols.map(col): _*)
      .withColumn("__src", lit(0))
      .unionByName(enriched.select(cols.map(col): _*)
        .withColumn("__src", lit(1)))
    // enrich() renames the source timestamp to tp_timestamp — version
    // comparisons happen on the enriched column for both sides.
    // The window includes tp_index so key scope = physical partition:
    // rows in different index directories never compete.
    val w = Window
      .partitionBy((Seq(col(TpSchema.Date), col(TpSchema.Index))
        ++ keyCols.map(col)): _*)
      .orderBy(col(TpSchema.Timestamp).desc, col("__src").desc)
    val winners = combined
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__src")
    lake.overwritePartitions(spark, table, winners)
    val after =
      if (report) scopeToTouched(lake.read(spark, table), touched).count()
      else -1L
    (before, after)
  }
}
