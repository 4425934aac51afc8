package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.RollupSpec

/** Materialized rollup maintenance (beyond-reference; see
  * [[graft.config.RollupSpec]] for the model and the month-grain
  * incremental contract).
  *
  * Storage: parquet under `<table>/_graft_rollup_<name>` — an
  * underscore-prefixed sibling of the data, invisible to table scans
  * like the manifest — partitioned by (tp_year, tp_month), the lake's
  * own physical grain.
  *
  * Scale shape: a collect triggers [[refreshTouched]] with the batch's
  * touched partition dirs; the recompute is one PRUNED scan of those
  * months (partition pruning on tp_year/tp_month — the same pruned-read
  * discipline as Maintenance), one map-side-combined aggregate, and a
  * dynamic partition overwrite that atomically swaps exactly the
  * recomputed month slices. History is never read, never rewritten.
  * [[refresh]] (full rebuild) exists for bootstrap and for group-key
  * changes, and costs one full scan — the thing the incremental path
  * exists to avoid.
  */
object Rollup {

  def dir(lake: Lake, spec: RollupSpec): String =
    s"${lake.tableDir(spec.table)}/_graft_rollup_${spec.name}"

  private def aggColumns(spec: RollupSpec): Seq[Column] =
    spec.aggs.flatMap { a =>
      a.function match {
        case "count"          => Seq(count(lit(1)).as(a.name))
        case "sum"            => Seq(sum(col(a.column.get)).as(a.name))
        case "min"            => Seq(min(col(a.column.get)).as(a.name))
        case "max"            => Seq(max(col(a.column.get)).as(a.name))
        // mergeable AVG (r17 verdict task 5): averages don't average —
        // a stored per-month avg can never combine across rollup rows.
        // Store the sum+count PAIR instead (the metadata rule's
        // two-slot scheme, MetadataAggregateRule slotTypesOf): read()
        // surfaces `<name>` = <name>_sum / <name>_n per row, and a
        // cross-range avg is sum(<name>_sum) / sum(<name>_n) over the
        // rollup rows — exact for integral columns, no raw-table scan
        // at any range length
        case "avg"            => Seq(
          sum(col(a.column.get)).as(a.name + "_sum"),
          count(col(a.column.get)).as(a.name + "_n"))
        case "count_distinct" =>
          Seq(countDistinct(col(a.column.get)).as(a.name))
        // mergeable NDV: the stored column is the binary sketch —
        // read() surfaces the per-row estimate under the agg name
        // (RollupAggSpec scaladoc)
        case "ndv" =>
          Seq(hll_sketch_agg(col(a.column.get)).as(a.name + "_sketch"))
        // mergeable MEDIAN: a KLL quantile sketch per rollup row —
        // cross-range medians merge sketches instead of being
        // uncombinable like a stored plain percentile
        case "median" =>
          Seq(graft.functions.KllFns.kllAgg(
            org.apache.spark.sql.SparkSession.active,
            col(a.column.get)).as(a.name + "_sketch"))
      }
    }

  private def aggregate(rows: DataFrame, spec: RollupSpec): DataFrame = {
    val aggs = aggColumns(spec)
    rows.groupBy(
        (Seq(TpSchema.Year, TpSchema.Month) ++ spec.groupBy).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Full rebuild: one table scan → overwrite every rollup partition.
    * @return rollup rows written
    */
  def refresh(spark: SparkSession, lake: Lake, spec: RollupSpec): Long = {
    val out = aggregate(lake.read(spark, spec.table), spec)
      .localCheckpoint() // count + write below share one evaluation
    out.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(TpSchema.Year, TpSchema.Month)
      .parquet(dir(lake, spec))
    out.count()
  }

  /** Month-scoped incremental refresh: recompute rollup rows for
    * exactly the (tp_year, tp_month) months covered by `touchedDirs`
    * (the relative partition dirs a collect's append returned) and
    * dynamically overwrite those rollup partitions. A fresh rollup
    * (no dir yet) bootstraps with a full [[refresh]].
    *
    * @return number of month partitions recomputed
    */
  def refreshTouched(
      spark: SparkSession, lake: Lake, spec: RollupSpec,
      touchedDirs: Seq[String]): Long = {
    val p = new Path(dir(lake, spec))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) { refresh(spark, lake, spec); return -1L }
    // layout-migration guard: avg rollups written before the mergeable
    // sum/count-pair layout stored a single `<name>` column. A dynamic
    // overwrite of only the touched months would leave OLDER month
    // partitions in the old layout — read() would then either fail to
    // resolve `<name>_n` or silently surface null avgs depending on
    // which footer schema inference lands on. Detect the old layout in
    // the existing dir and rebuild the whole rollup once instead.
    val avgNames = spec.aggs.filter(_.function == "avg").map(_.name)
    if (avgNames.nonEmpty) {
      val existing = scala.util.Try(
        spark.read.parquet(dir(lake, spec)).schema.fieldNames.toSet)
        .getOrElse(Set.empty[String])
      if (existing.nonEmpty && avgNames.exists(n =>
        !existing.contains(n + "_sum") || !existing.contains(n + "_n"))) {
        refresh(spark, lake, spec); return -1L
      }
    }
    val months = touchedDirs
      .map(lake.partitionValues)
      .flatMap(vs => for {
        y <- vs.get(TpSchema.Year); m <- vs.get(TpSchema.Month)
      } yield (y, m))
      .distinct
    if (months.isEmpty) return 0L
    val pruned = months
      .map { case (y, m) =>
        col(TpSchema.Year) === y.toInt && col(TpSchema.Month) === m.toInt
      }
      .reduce(_ || _)
    aggregate(lake.read(spark, spec.table).where(pruned), spec)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(TpSchema.Year, TpSchema.Month)
      .parquet(dir(lake, spec))
    months.length.toLong
  }

  /** The rollup as a DataFrame (empty-schema-safe: throws if never
    * refreshed — callers register views only for existing dirs).
    * `ndv` aggregates surface both the per-row estimate (`<name>`,
    * bigint) and the raw mergeable sketch (`<name>_sketch`, binary)
    * so range queries can `hll_union_agg` across rollup rows.
    */
  def read(spark: SparkSession, lake: Lake, spec: RollupSpec): DataFrame = {
    val base = spark.read.parquet(dir(lake, spec))
    val withNdv =
      spec.aggs.filter(_.function == "ndv").foldLeft(base) { (df, a) =>
        df.withColumn(a.name,
          hll_sketch_estimate(col(a.name + "_sketch")))
      }
    val withMedian =
      spec.aggs.filter(_.function == "median").foldLeft(withNdv) { (df, a) =>
        df.withColumn(a.name,
          graft.functions.KllFns.kllQuantile(spark,
            col(a.name + "_sketch"), 0.5))
      }
    // avg surfaces the per-row quotient AND keeps the mergeable
    // sum/count pair visible for cross-range queries; an all-null
    // month (count 0) reads NULL, SQL's avg-of-no-rows
    spec.aggs.filter(_.function == "avg").foldLeft(withMedian) { (df, a) =>
      df.withColumn(a.name,
        when(col(a.name + "_n") === 0L, lit(null))
          .otherwise(col(a.name + "_sum").cast("double") /
            col(a.name + "_n")))
    }
  }

  def exists(spark: SparkSession, lake: Lake, spec: RollupSpec): Boolean = {
    val p = new Path(dir(lake, spec))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
