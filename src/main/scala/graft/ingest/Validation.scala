package graft.ingest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Required-column null validation (SURVEY §2A rows 10-11; reference
  * convertor_validate.go:11-110 runs a union-all-per-column aggregate
  * then a DELETE).
  *
  * Spark-first shape: ONE pass computing every per-column null count as
  * conditional aggregates (map-side partial agg, no union-all
  * explosion, no row ids), and the "delete" is a filter — the invalid
  * rows simply never reach the lake write. At 100 TB this is one scan
  * instead of the reference's scan-per-required-column union.
  */
object Validation {

  /** Per-column null counts + total/invalid row counts for a batch,
    * all from ONE aggregate — the caller gets the ingested-row count
    * as `totalRows - invalidRows` without a second pass.
    *
    * @return (cleanRows, report) where report has one row per violated
    *         column: (column, null_rows), plus total/invalid counts
    */
  def validate(batch: DataFrame, requiredCols: Seq[String]): ValidationResult = {
    val present = requiredCols.filter(batch.columns.contains)
    val tsCol = graft.lake.TpSchema.Timestamp
    val hasTs = batch.columns.contains(tsCol)
    if (present.isEmpty) {
      val maxTs = if (!hasTs) None else
        Option(batch.agg(max(col(tsCol))).head().getTimestamp(0))
      return ValidationResult(batch, Map.empty, 0L, batch.count(), maxTs)
    }
    val nullCounts = present.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(c))
    val anyNull = present.map(col(_).isNull).reduce(_ || _)
    // max ingested tp_timestamp rides the same single aggregate — it is
    // the collection-state high-water mark (plugin_manager.go:260-274)
    val maxTsAgg =
      if (hasTs) Seq(max(when(!anyNull, col(tsCol))).as("__max_ts"))
      else Seq(max(lit(null).cast("timestamp")).as("__max_ts"))
    val aggRow: Row = batch.agg(
      sum(when(anyNull, 1L).otherwise(0L)).as("__invalid"),
      (count(lit(1)).as("__total") +: nullCounts) ++ maxTsAgg: _*).head()
    val invalid = if (aggRow.isNullAt(0)) 0L else aggRow.getLong(0)
    val total = aggRow.getLong(1)
    val perCol = present.zipWithIndex.collect {
      case (c, i) if !aggRow.isNullAt(i + 2) && aggRow.getLong(i + 2) > 0 =>
        c -> aggRow.getLong(i + 2)
    }.toMap
    val maxTs = Option(aggRow.getTimestamp(2 + present.size))
    val clean = if (invalid == 0) batch else batch.where(!anyNull)
    ValidationResult(clean, perCol, invalid, total, maxTs)
  }
}

/** @param clean        rows passing required-not-null
  * @param nullsByColumn violated column → null-row count (the
  *                      reference's per-column report,
  *                      convertor_validate.go:55-91)
  * @param invalidRows  rows dropped
  * @param totalRows    batch size before the filter
  * @param maxTimestamp max `tp_timestamp` among CLEAN rows — the
  *                     collection-state high-water mark
  */
final case class ValidationResult(
    clean: DataFrame,
    nullsByColumn: Map[String, Long],
    invalidRows: Long,
    totalRows: Long,
    maxTimestamp: Option[java.sql.Timestamp] = None)
