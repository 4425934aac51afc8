package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.{ColumnSpec, TableSpec}

/** Declared-schema conversion (SURVEY §2A rows 2-4; reference
  * read_json_query.go:108-176): maps raw source columns to the table's
  * declared columns with rename (`source`), cast (`type`), computed
  * expressions (`transform`), `null_if` sentinels, and NULL-preserving
  * recursive struct reconstruction.
  *
  * All of it is column algebra over one projection — Catalyst folds it
  * into the scan, so conversion costs nothing beyond the expressions
  * themselves and never shuffles.
  */
object Conversion {

  /** Build the typed projection for a batch.
    *
    * Column resolution order per declared column (table.go:76-127):
    *   1. `transform` expression (arbitrary SQL over source columns)
    *   2. `source` rename
    *   3. same-name source column
    * then `null_if` (value → NULL), then cast to the declared type with
    * NULL-preserving struct reconstruction for struct/array-of-struct.
    *
    * Undeclared source columns are automapped when they match
    * `map_fields` patterns (default `*`), keeping their inferred type.
    */
  def project(batch: DataFrame, spec: TableSpec): DataFrame = {
    val declared = spec.columns.map(c => convertColumn(batch, spec, c))
    val declaredNames = spec.columns.map(_.name).toSet
    val consumedSources = spec.columns.flatMap(_.source).toSet
    val automapped = batch.columns.toSeq
      .filterNot(declaredNames)
      .filterNot(consumedSources)
      .filter(n => spec.mapFields.exists(glob(_, n)))
      .map { n =>
        val c = applyNullIf(col(n), batch.schema(n).dataType, spec.nullIf)
        c.as(n)
      }
    batch.select(declared ++ automapped: _*)
  }

  private def convertColumn(
      batch: DataFrame, table: TableSpec, c: ColumnSpec): Column = {
    val srcName = c.source.getOrElse(c.name)
    val raw: Column = c.transform match {
      case Some(t) => expr(t)
      case None =>
        if (!batch.columns.contains(srcName))
          lit(null) // missing source field → typed NULL column
        else col(srcName)
    }
    val srcType: Option[DataType] =
      if (c.transform.isEmpty && batch.columns.contains(srcName))
        Some(batch.schema(srcName).dataType)
      else None
    val nulled = applyNullIf(raw, srcType.getOrElse(StringType),
      c.nullIf.orElse(table.nullIf))
    c.dataType match {
      case Some(target) => castTo(nulled, srcType, target).as(c.name)
      case None         => nulled.as(c.name)
    }
  }

  /** `null_if` sentinel: equal values become NULL. Applied only to
    * string-typed sources (the reference's null_if is a string match).
    */
  private def applyNullIf(
      c: Column, srcType: DataType, nullIf: Option[String]): Column =
    nullIf match {
      case Some(s) if srcType == StringType => when(c === lit(s), lit(null).cast(StringType)).otherwise(c)
      case _ => c
    }

  /** Cast with NULL-preserving recursive struct reconstruction
    * (SURVEY §7.4 hard part; reference read_json_query.go:122-176).
    *
    * A plain `.cast(struct)` on a struct-typed source already preserves
    * NULL structs, but when the source field set differs from the
    * declared set (subset/superset/reordering) we must rebuild the
    * struct field-by-field — and a naive `struct(children...)` turns a
    * NULL source struct into a struct of NULLs. The reference wraps
    * every level in `case when src is null then null else struct_pack`;
    * we do the same with `when(isNull, null).otherwise(struct(...))`,
    * recursively.
    */
  private[ingest] def castTo(
      c: Column, srcType: Option[DataType], target: DataType): Column =
    (srcType, target) match {
      case (Some(s: StructType), t: StructType) => rebuildStruct(c, s, t)
      case (Some(ArrayType(s: StructType, _)), ArrayType(t: StructType, _)) =>
        transform(c, e => rebuildStruct(e, s, t))
      case _ => c.cast(target)
    }

  private def rebuildStruct(
      c: Column, src: StructType, target: StructType): Column = {
    val children = target.fields.map { f =>
      val childSrc = src.fields.find(_.name == f.name).map(_.dataType)
      val child = childSrc match {
        case Some(_) => c.getField(f.name)
        case None    => lit(null)
      }
      castTo(child, childSrc, f.dataType).as(f.name)
    }
    when(c.isNull, lit(null).cast(target))
      .otherwise(struct(children.toIndexedSeq: _*))
  }

  /** `*`-glob match (map_fields patterns; table.go:30-31). */
  private[ingest] def glob(pattern: String, s: String): Boolean =
    java.util.regex.Pattern
      .matches(pattern.flatMap {
        case '*' => ".*"
        case c if "\\.[]{}()+-^$|?".contains(c) => "\\" + c
        case c => c.toString
      }, s)
}
