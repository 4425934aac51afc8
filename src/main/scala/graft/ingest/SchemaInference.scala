package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.config.Types

/** Schema inference + drift detection (SURVEY §2A rows 21 + §1.4;
  * reference convertor_schema.go:47-172).
  *
  * Inference: Spark's JSON reader samples the chunk files — the same
  * role as the reference's `DESCRIBE (SELECT * FROM read_json_auto(?))`
  * with the `json_structure` fallback.
  *
  * Drift: the reference FAILS FAST when a later chunk's inferred type
  * differs from the conversion schema for columns not pinned by config,
  * raising a structured error that lists the changed columns
  * (convertor_schema.go:135-172). We reproduce exactly that — no silent
  * widening/casting (SURVEY §7.4: "match fail-fast; don't over-build").
  */
object SchemaInference {

  /** Infer the schema of JSONL chunk files. */
  def inferJson(spark: SparkSession, paths: Seq[String]): StructType =
    spark.read.json(paths: _*).schema

  /** One changed column: name + the two engine-vocabulary type names. */
  final case class SchemaChange(column: String, was: String, now: String)

  /** Typed fail-fast drift error (reference SchemaChangeError,
    * convertor_schema.go:135-143).
    */
  final class SchemaChangeError(val changes: Seq[SchemaChange])
      extends RuntimeException(
        "schema drift detected: " + changes.map(c =>
          s"${c.column} (${c.was} -> ${c.now})").mkString(", "))

  /** Compare a chunk's inferred schema against the established
    * conversion schema; columns in `pinned` (declared in config) are
    * exempt — config wins over inference, as in the reference.
    *
    * New columns appearing later are drift too (the row set no longer
    * fits the table), as are type changes; columns missing from a later
    * chunk are fine (they read as NULL).
    *
    * @throws SchemaChangeError when any unpinned column changed type or
    *         is new
    */
  def checkDrift(
      established: StructType, chunk: StructType,
      pinned: Set[String] = Set.empty): Unit = {
    val changes = chunk.fields.toSeq.filterNot(f => pinned(f.name)).flatMap { f =>
      established.fields.find(_.name == f.name) match {
        case None =>
          Some(SchemaChange(f.name, "<absent>", Types.name(f.dataType)))
        case Some(e) if e.dataType != f.dataType =>
          Some(SchemaChange(f.name, Types.name(e.dataType),
            Types.name(f.dataType)))
        case _ => None
      }
    }
    if (changes.nonEmpty) throw new SchemaChangeError(changes)
  }

  /** Evolution-mode drift handling (`table { evolution = true }`):
    * NEW unpinned columns are adopted into the conversion schema as
    * nullable fields — the batch that introduces them writes them,
    * earlier files simply lack them and read as NULL via the lake's
    * footer-merging read. Type CHANGES on existing columns still
    * throw: silently widening `integer -> varchar` would corrupt every
    * reader that bound the old type.
    *
    * @return the (possibly wider) established schema and the names of
    *         the columns adopted by this batch
    */
  def evolve(
      established: StructType, chunk: StructType,
      pinned: Set[String] = Set.empty): (StructType, Seq[String]) = {
    val typeChanges = chunk.fields.toSeq
      .filterNot(f => pinned(f.name)).flatMap { f =>
        established.fields.find(_.name == f.name) match {
          case Some(e) if e.dataType != f.dataType =>
            Some(SchemaChange(f.name, Types.name(e.dataType),
              Types.name(f.dataType)))
          case _ => None
        }
      }
    if (typeChanges.nonEmpty) throw new SchemaChangeError(typeChanges)
    val have = established.fieldNames.toSet
    val added = chunk.fields.toSeq.filterNot(f => have(f.name))
    (StructType(established.fields.toSeq ++
      added.map(_.copy(nullable = true))), added.map(_.name))
  }
}
