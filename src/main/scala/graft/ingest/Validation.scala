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

  /** Per-column null counts + total invalid rows for a batch.
    *
    * @return (cleanRows, report) where report has one row per violated
    *         column: (column, null_rows), plus total invalid row count
    */
  def validate(batch: DataFrame, requiredCols: Seq[String]): ValidationResult = {
    val present = requiredCols.filter(batch.columns.contains)
    if (present.isEmpty) return ValidationResult(batch, Map.empty, 0L)
    val nullCounts = present.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(c))
    val anyNull = present.map(col(_).isNull).reduce(_ || _)
    val aggRow: Row = batch.agg(
      sum(when(anyNull, 1L).otherwise(0L)).as("__invalid"),
      nullCounts: _*).head()
    val invalid = if (aggRow.isNullAt(0)) 0L else aggRow.getLong(0)
    val perCol = present.zipWithIndex.collect {
      case (c, i) if !aggRow.isNullAt(i + 1) && aggRow.getLong(i + 1) > 0 =>
        c -> aggRow.getLong(i + 1)
    }.toMap
    val clean = if (invalid == 0) batch else batch.where(!anyNull)
    ValidationResult(clean, perCol, invalid)
  }
}

/** @param clean        rows passing required-not-null
  * @param nullsByColumn violated column → null-row count (the
  *                      reference's per-column report,
  *                      convertor_validate.go:55-91)
  * @param invalidRows  rows dropped
  */
final case class ValidationResult(
    clean: DataFrame,
    nullsByColumn: Map[String, Long],
    invalidRows: Long)
