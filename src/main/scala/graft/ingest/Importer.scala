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

    if (lake.hasData(spark, spec.table)) {
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

  /** One legacy workspace migration outcome. */
  case class LegacyMigration(
      migrated: Seq[(String, Long)], // (table, rows)
      archived: Seq[String])         // tp_table dirs without a view

  /** Whole-workspace legacy migration — the reference's pre-DuckLake
    * startup migration (internal/migration/migration.go:39-247) as an
    * explicit `import --legacy` command. The legacy layout is a
    * workspace directory of Hive-style `tp_table=<name>/` parquet
    * trees plus a view catalog; the reference discovers the view list
    * from the legacy `tailpipe.db` (DuckDB file,
    * internal/database/tables.go:70-132) — the Spark-native stand-in
    * is a `views.sql` of CREATE VIEW statements, same discovery
    * contract, no embedded-DuckDB dependency.
    *
    * Reference semantics preserved:
    *  - only `tp_table=` dirs WITH a discovered view are migrated
    *    (migration.go:151-167); each runs the standard import
    *    pipeline (tp_ regeneration, validation, partitioned append)
    *    into table `<name>`, partition `legacy`
    *  - dirs with parquet but NO view are moved aside to
    *    `unmigrated/` rather than guessed at (archiveUnmatchedDirs)
    *  - each successfully-migrated dir is moved to `migrated/`, so a
    *    crashed run RESUMES from where it stopped instead of
    *    double-appending (the reference's leaf-by-leaf move,
    *    migration.go:518-541, done per-table here because the import
    *    itself is one distributed job, not a per-leaf loop); the
    *    append→move window is closed by a `.migrate_done_<table>`
    *    marker written between the committed append and the move —
    *    a rerun that finds the marker finishes the move without
    *    re-importing
    *  - a `migration_status.json` summary lands in the workspace
    *    (status.go's WriteStatusToFile)
    */
  def importLegacyWorkspace(
      spark: SparkSession,
      lake: Lake,
      workspace: String,
      timestampColumn: String = TpSchema.Timestamp): LegacyMigration = {
    import java.io.File
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ws = new File(workspace)
    require(ws.isDirectory, s"import --legacy: '$workspace' is not a directory")
    val viewsSql = new File(ws, "views.sql")
    require(viewsSql.isFile,
      s"import --legacy: no views.sql in $workspace — the legacy view " +
        "catalog names the tables to migrate; without it every " +
        "tp_table directory is unmatched (refusing to guess)")
    val sql = new String(Files.readAllBytes(viewsSql.toPath), "UTF-8")
    // the view name may be schema-qualified (CREATE VIEW main.audit_log
    // AS ...) — capture the LAST identifier of the dotted name, else the
    // schema would register as the view and the real table's dir would
    // be silently archived as unmatched (ADVICE r12)
    val views =
      ("""(?i)CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+""" +
        """(?:"?[A-Za-z0-9_]+"?\.)?"?([A-Za-z0-9_]+)"?""")
        .r.findAllMatchIn(sql).map(_.group(1)).toSet

    def hasParquet(d: File): Boolean = {
      val kids = Option(d.listFiles()).getOrElse(Array.empty)
      kids.exists(f => f.isFile && f.getName.endsWith(".parquet")) ||
        kids.exists(f => f.isDirectory && hasParquet(f))
    }
    val tableDirs = Option(ws.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("tp_table="))
      .filter(hasParquet)
      .sortBy(_.getName)

    def moveTo(d: File, bucket: String): Unit = {
      val destDir = new File(ws, bucket)
      destDir.mkdirs()
      Files.move(d.toPath, Paths.get(destDir.getPath, d.getName),
        StandardCopyOption.ATOMIC_MOVE)
      ()
    }

    val (matched, unmatched) = tableDirs.partition { d =>
      views.contains(d.getName.stripPrefix("tp_table="))
    }
    unmatched.foreach(moveTo(_, "unmigrated"))
    // Crash-safety, two markers per table (ADVICE r12 + r13). The
    // migration is IDEMPOTENT under a crash at any point:
    //  - `.migrate_intent_<t>` records the table's live rowcount
    //    BEFORE the import starts. On rerun its presence means a prior
    //    attempt crashed somewhere past this line; comparing the
    //    current count against the recorded one tells whether that
    //    attempt's append COMMITTED (count grew → skip the re-import
    //    that would double the rows — the r13 residual window) or not
    //    (count unchanged → import fresh).
    //  - `.migrate_done_<t>` is written after the commit and before
    //    the dir moves to migrated/, so a crash between the two
    //    resumes as just-finish-the-move.
    // The count probe reads the actual table (not the manifest —
    // append commits data before its manifest row, so a crash between
    // them would make a manifest-based count under-read and re-import
    // anyway). Recovery assumes the rerun happens before unrelated
    // appends land on the same table, the normal single-writer
    // migration discipline; both markers are deleted on success.
    def markerOf(table: String) = new File(ws, s".migrate_done_$table")
    def intentOf(table: String) = new File(ws, s".migrate_intent_$table")
    def liveRows(table: String): Long =
      if (!lake.hasData(spark, table)) 0L
      else lake.read(spark, table).count()
    val migrated = matched.toSeq.map { d =>
      val table = d.getName.stripPrefix("tp_table=")
      val marker = markerOf(table)
      val intent = intentOf(table)
      val rows =
        if (marker.isFile) {
          new String(Files.readAllBytes(marker.toPath), "UTF-8").trim.toLong
        } else {
          val resuming = intent.isFile
          val preCount =
            if (resuming)
              new String(Files.readAllBytes(intent.toPath), "UTF-8")
                .trim.toLong
            else {
              val c = liveRows(table)
              Files.write(intent.toPath, c.toString.getBytes("UTF-8"))
              c
            }
          val committed = if (resuming) liveRows(table) - preCount else 0L
          val ingested =
            if (committed > 0L) {
              // crashed AFTER the data commit — but possibly BEFORE
              // its manifest append, which would leave listing-free
              // planning (fileStats, compact, retention) under-reading
              // the table forever (r14 advice). vacuum's forced
              // listing reconciliation re-syncs the manifest to data
              // truth before the done marker declares recovery clean.
              graft.lake.Maintenance.vacuum(spark, lake, table)
              committed
            } else importParquet(spark, lake, d.getPath,
              graft.config.PartitionSpec(table, "legacy"),
              timestampColumn = timestampColumn).rowsIngested
          Files.write(marker.toPath, ingested.toString.getBytes("UTF-8"))
          ingested
        }
      moveTo(d, "migrated")
      Files.deleteIfExists(marker.toPath)
      Files.deleteIfExists(intent.toPath)
      (table, rows)
    }
    // sweep markers orphaned by a crash after the move: their dir is
    // already in migrated/, the work is done, only the markers remain
    Option(ws.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && (f.getName.startsWith(".migrate_done_") ||
        f.getName.startsWith(".migrate_intent_")))
      .foreach(f => Files.deleteIfExists(f.toPath))

    val status =
      s"""{"migrated_tables":${migrated.size},""" +
        s""""migrated_rows":${migrated.map(_._2).sum},""" +
        s""""archived_dirs":${unmatched.length},""" +
        s""""outcome":"${if (migrated.nonEmpty) "COMPLETED" else "NOTHING_TO_MIGRATE"}"}"""
    Files.write(Paths.get(ws.getPath, "migration_status.json"),
      status.getBytes("UTF-8"))
    LegacyMigration(migrated, unmatched.map(_.getName).toSeq)
  }
}
