package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join (DuckDB `ASOF JOIN` surface inherited by the reference via
  * SQL pass-through — SURVEY.md §2B "Joins"; tailpipe exposes the whole
  * DuckDB dialect, `/root/reference/internal/query/execute.go:45-77`).
  *
  * Spark has no native as-of join, so we implement the scalable
  * union-and-window technique rather than an O(N×M) range cross-join:
  *
  *  1. tag left rows 1, right rows 0, align schemas with a struct payload;
  *  2. union — a single dataset partitioned by the join key;
  *  3. window `last(payload, ignoreNulls)` ordered by (time, tag): each
  *     left row sees the latest right payload with rightTime <= leftTime
  *     (right rows sort before left rows at equal timestamps → inclusive);
  *  4. keep only left rows.
  *
  * Cost at scale: ONE hash shuffle of (|L|+|R|) rows on the key plus a
  * per-partition sort — the same shape as a sort-merge join, with no
  * blow-up on duplicate keys. Skewed keys behave like any skewed window
  * (AQE-visible). Right side should be unique per (key, time); callers
  * dedupe first (matching the determinism caveat of DuckDB ASOF on ties).
  */
object AsofJoin {

  /** Backward as-of left join: for each left row, the most recent right
    * row with `right(timeR) <= left(timeL)` and equal key, else nulls.
    *
    * @param rightCols right-side columns to carry into the output
    */
  def backward(
      left: DataFrame, right: DataFrame,
      keyL: String, timeL: String,
      keyR: String, timeR: String,
      rightCols: Seq[String]): DataFrame =
    // ascending time: each left row sees the LATEST right row at or
    // before its time. Left rows with a null time sort before all
    // right rows -> correctly match nothing.
    joined(left, right, keyL, timeL, keyR, timeR, rightCols,
      w => w.orderBy(col("__t"), col("__tag")))

  /** Forward as-of left join (DuckDB `ASOF JOIN … ON t1.ts >= t2.ts`
    * mirrored: here the NEAREST FOLLOWING right row, `right(timeR) >=
    * left(timeL)`): same union-and-window machinery with the window
    * ordered descending and left rows sorting AFTER right rows at equal
    * timestamps (inclusive bound). Identical one-shuffle cost shape to
    * [[backward]].
    */
  def forward(
      left: DataFrame, right: DataFrame,
      keyL: String, timeL: String,
      keyR: String, timeR: String,
      rightCols: Seq[String]): DataFrame =
    // descending time: each left row sees the EARLIEST right row at or
    // after its time; nulls first, so a null-time left row precedes
    // every right row and correctly matches nothing
    joined(left, right, keyL, timeL, keyR, timeR, rightCols,
      w => w.orderBy(col("__t").desc_nulls_first, col("__tag")))

  /** Shared union-and-window machinery; `order` supplies the direction
    * (the ONLY thing backward and forward differ in). Right rows with a
    * NULL key or NULL timestamp never match anything (SQL ASOF
    * semantics — ADVICE r1): they are filtered before the union, and
    * the per-direction null placement of LEFT times is handled by the
    * ordering each direction passes in.
    */
  private def joined(
      left: DataFrame, right: DataFrame,
      keyL: String, timeL: String,
      keyR: String, timeR: String,
      rightCols: Seq[String],
      order: org.apache.spark.sql.expressions.WindowSpec =>
        org.apache.spark.sql.expressions.WindowSpec): DataFrame = {
    val leftCols = left.columns.toSeq
    val lPayload = struct(leftCols.map(col): _*)
    val rPayload = struct(rightCols.map(col): _*)
    val rightClean = right
      .where(col(keyR).isNotNull && col(timeR).isNotNull)

    val l2 = left.select(
      col(keyL).as("__k"), col(timeL).as("__t"), lit(1).as("__tag"),
      lPayload.as("__lp"), lit(null).cast(right.select(rPayload).schema.head.dataType).as("__rp"))
    val r2 = rightClean.select(
      col(keyR).as("__k"), col(timeR).as("__t"), lit(0).as("__tag"),
      lit(null).cast(left.select(lPayload).schema.head.dataType).as("__lp"), rPayload.as("__rp"))

    val w = order(Window.partitionBy("__k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__lp.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
