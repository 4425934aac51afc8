package graft.ingest

import org.apache.spark.sql.SparkSession

import graft.config.{PartitionSpec, TableSpec}
import graft.lake.{Lake, TpSchema}

/** Legacy / foreign-parquet import — the engine's counterpart of the
  * reference's one-time migration of pre-DuckLake workspaces
  * (reference internal/migration/migration.go:39-247: discover legacy
  * `tp_table=*` parquet directories, schema-check them against the
  * known table schemas, and INSERT each directory's files into the new
  * lake catalog; run from the startup hooks in
  * internal/cmdconfig/cmd_hooks.go).
  *
  * The Spark-native shape is a command, not a startup hook: `graft
  * import <parquet-dir> <table.partition>` adopts an existing parquet
  * directory — legacy lake data or any foreign export — into a managed
  * lake table. The read is one distributed parquet scan (Hive-style
  * `k=v` subdirectories become partition columns automatically, which
  * is exactly the reference's legacy layout), then the STANDARD ingest
  * pipeline runs: tp_ enrichment where missing (reserved columns are
  * regenerated, never trusted), required-column validation, partitioned
  * append, per-file manifest stats. Import is therefore append-shaped
  * and idempotence is the caller's choice, same as collect.
  *
  * 100 TB note: nothing here is driver-side — the scan, enrichment and
  * partitioned write all distribute, so importing a petabyte legacy
  * lake is one Spark job, not a file-by-file loop (the reference
  * migrates leaf directory by leaf directory because DuckDB is
  * single-node; migration.go:518-541).
  */
object Importer {

  /** Adopt `srcDir`'s parquet into `spec.table`. Fails loudly when the
    * timestamp column is absent or, for an existing table, when the
    * imported columns don't match the table's non-tp schema (the
    * reference archives unmatched directories rather than guessing —
    * migration.go:160-167).
    */
  def importParquet(
      spark: SparkSession,
      lake: Lake,
      srcDir: String,
      spec: PartitionSpec,
      timestampColumn: String = TpSchema.Timestamp,
      tableSpec: TableSpec = TableSpec("")): Ingest.IngestResult = {
    val raw = spark.read.parquet(srcDir)
    require(raw.columns.contains(timestampColumn),
      s"import: column '$timestampColumn' not found in $srcDir " +
        s"(columns: ${raw.columns.mkString(", ")}); " +
        "pass --timestamp-column to name the event-time column")

    if (lake.tableExists(spark, spec.table)) {
      val existingSchema = lake.schemaOf(spark, spec.table)
      val existing = existingSchema
        .fieldNames.filterNot(TpSchema.reserved).toSet - TpSchema.Timestamp
      val incoming = raw.columns
        .filterNot(TpSchema.reserved).toSet - timestampColumn
      val missing = existing -- incoming
      val extra = incoming -- existing
      // name match is not enough: appending a string column into a
      // bigint column would poison every later read of the table
      val retyped = (existing & incoming).toSeq.sorted.flatMap { c =>
        val want = existingSchema(c).dataType
        val got = raw.schema(c).dataType
        if (want == got) None
        else Some(s"$c (table: ${want.simpleString}, import: ${got.simpleString})")
      }
      require(missing.isEmpty && extra.isEmpty && retyped.isEmpty,
        s"import: schema mismatch with existing table '${spec.table}'" +
          (if (missing.nonEmpty) s"; missing: ${missing.toSeq.sorted.mkString(", ")}" else "") +
          (if (extra.nonEmpty) s"; extra: ${extra.toSeq.sorted.mkString(", ")}" else "") +
          (if (retyped.nonEmpty) s"; type mismatch: ${retyped.mkString(", ")}" else ""))
    }

    Ingest.collectBatch(spark, lake, spec, raw, tableSpec, timestampColumn)
  }
}
