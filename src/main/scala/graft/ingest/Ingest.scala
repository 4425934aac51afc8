package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{PartitionSpec, TableSpec}
import graft.lake.{Lake, TpSchema}

/** The collect pipeline (SURVEY §3.2; reference collector.go +
  * convertor_convert.go): chunked JSONL → typed rows → declared-schema
  * conversion → tp_ enrichment → ingest-time filters → required-column
  * validation → partitioned lake append.
  *
  * Spark-first shape: each batch is ONE lazy plan — typed scan,
  * conversion/enrichment projections, filter — ending in a partitioned
  * write plus one aggregate for the validation report. The reference's
  * temp-table staging, row_number bookkeeping, and DELETE of invalid
  * rows (convertor_convert.go:162-217, convertor_validate.go) collapse
  * into Catalyst projections and a filter; nothing is materialized
  * between steps and nothing shuffles before the write.
  *
  * Chunk files are processed in batches of ≤ `maxChunksPerBatch`
  * (reference caps at 2000 files per conversion query,
  * convertor.go:144-170); the first batch establishes the inferred
  * schema, later batches fail fast on drift (convertor_schema.go).
  */
object Ingest {

  /** Cumulative result of one collect run (the reference's status
    * events, rolled up).
    */
  final case class IngestResult(
      rowsIngested: Long,
      rowsInvalid: Long,
      nullsByColumn: Map[String, Long],
      chunksProcessed: Int,
      maxTimestamp: Option[Timestamp] = None,
      // relative partition dirs the appends wrote into — incremental
      // consumers (rollup refresh) scope their recompute to these
      touchedDirs: Seq[String] = Seq.empty) {
    def merge(o: IngestResult): IngestResult = IngestResult(
      rowsIngested + o.rowsIngested,
      rowsInvalid + o.rowsInvalid,
      (nullsByColumn.keySet ++ o.nullsByColumn.keySet).map(k =>
        k -> (nullsByColumn.getOrElse(k, 0L) +
          o.nullsByColumn.getOrElse(k, 0L))).toMap,
      chunksProcessed + o.chunksProcessed,
      // full Timestamp ordering — getTime alone is millisecond-
      // truncated, and a backwards high-water mark re-ingests rows
      // within the same millisecond on resume
      (maxTimestamp.toSeq ++ o.maxTimestamp.toSeq)
        .reduceOption((a, b) => if (a.compareTo(b) >= 0) a else b),
      (touchedDirs ++ o.touchedDirs).distinct)
  }

  /** Ingest JSONL chunk files into `lake`/`spec.table`.
    *
    * @param tableSpec       declared columns (empty = fully inferred)
    * @param timestampColumn source column providing `tp_timestamp`
    * @param from/to         collection window: rows outside
    *                        `[from, to)` are filtered before the lake
    *                        (collector.go:228-240)
    * @param deleteProcessed remove each batch's chunk files after its
    *                        lake append commits (the reference's inbox
    *                        discipline, convertor_convert.go:64-73).
    *                        A crash mid-collect re-runs only the
    *                        still-present chunks; the guarantee is
    *                        at-least-once at the commit boundary (a
    *                        crash BETWEEN append and delete re-ingests
    *                        that one batch — the at-rest dedup
    *                        operators are the backstop, same division
    *                        as the reference's late/duplicate handling)
    */
  def collectJsonl(
      spark: SparkSession,
      lake: Lake,
      spec: PartitionSpec,
      chunkFiles: Seq[String],
      tableSpec: TableSpec = TableSpec(""),
      timestampColumn: String = "tp_timestamp",
      from: Option[Timestamp] = None,
      to: Option[Timestamp] = None,
      maxChunksPerBatch: Int = 2000,
      deleteProcessed: Boolean = false): IngestResult = {
    require(chunkFiles.nonEmpty, "no chunk files to ingest")
    val batches = chunkFiles.grouped(maxChunksPerBatch).toSeq
    var established: Option[org.apache.spark.sql.types.StructType] = None
    val pinned = tableSpec.columns.map(c => c.source.getOrElse(c.name)).toSet
    batches.zipWithIndex.map { case (files, i) =>
      // infer from the FIRST chunk of the batch only — the reference's
      // exact behavior (convertor_schema.go: DESCRIBE over the first
      // chunk; the conversion query then pins columns= for the whole
      // batch). Saves a full JSON parse of every other file.
      val inferred = SchemaInference.inferJson(spark, files.take(1))
      established match {
        case None =>
          established = Some(inferred)
          // cross-COLLECT evolution: a later collect whose source grew
          // a column appends files the existing table lacks — mark so
          // reads merge footers (within-collect evolution marks below)
          if (tableSpec.evolution && lake.hasData(spark, spec.table)) {
            val existing = lake.schemaOf(spark, spec.table).fieldNames.toSet
            if (inferred.fieldNames.exists(!existing(_)))
              lake.markEvolved(spark, spec.table)
          }
        case Some(e) if tableSpec.evolution =>
          // evolution mode: adopt new columns (nullable), still fail
          // on type changes; mark the table so lake reads merge
          // footers (SchemaInference.evolve scaladoc)
          val (wider, added) = SchemaInference.evolve(e, inferred, pinned)
          if (added.nonEmpty) {
            established = Some(wider)
            lake.markEvolved(spark, spec.table)
          }
        case Some(e) => SchemaInference.checkDrift(e, inferred, pinned)
      }
      // read with the ESTABLISHED schema, not the batch's own: drift
      // checking allows later batches to MISS columns (they must read
      // as NULLs), and a per-batch schema would instead write parquet
      // files without those columns — heterogeneous footers the lake
      // reader then reconciles nondeterministically
      val raw = spark.read.schema(established.get).json(files: _*)
      val res = processBatch(spark, lake, spec, raw, tableSpec,
        timestampColumn, from, to, files.size)
      if (deleteProcessed)
        files.foreach(f => new java.io.File(f).delete())
      res
    }.reduce(_ merge _)
  }

  /** Ingest an already-loaded DataFrame batch (the entry point for
    * non-JSONL sources: delimited/grok formats, synthetic, streaming
    * foreachBatch).
    */
  def collectBatch(
      spark: SparkSession,
      lake: Lake,
      spec: PartitionSpec,
      raw: DataFrame,
      tableSpec: TableSpec = TableSpec(""),
      timestampColumn: String = "tp_timestamp",
      from: Option[Timestamp] = None,
      to: Option[Timestamp] = None): IngestResult =
    processBatch(spark, lake, spec, raw, tableSpec, timestampColumn,
      from, to, chunks = 1)

  private def processBatch(
      spark: SparkSession,
      lake: Lake,
      spec: PartitionSpec,
      raw: DataFrame,
      tableSpec: TableSpec,
      timestampColumn: String,
      from: Option[Timestamp],
      to: Option[Timestamp],
      chunks: Int): IngestResult = {
    val converted =
      if (tableSpec.columns.isEmpty && tableSpec.nullIf.isEmpty) raw
      else Conversion.project(raw, tableSpec)
    val enriched = TpSchema.enrich(converted, spec, timestampColumn)

    // ingest-time filters: partition filter + collection window.
    // NULL timestamps pass the window filters so they reach validation
    // and get REPORTED, not silently excluded (collector.go:228-240).
    val filters = Seq(
      spec.filter.map(expr),
      from.map(f => col(TpSchema.Timestamp).isNull ||
        col(TpSchema.Timestamp) >= lit(f)),
      to.map(t => col(TpSchema.Timestamp).isNull ||
        col(TpSchema.Timestamp) < lit(t))).flatten
    val filtered = filters.foldLeft(enriched)(_ where _)

    val required = (TpSchema.required ++
      tableSpec.columns.filter(_.required).map(_.name)).distinct

    // ONE pass (r19 optimization round, guide §1.2 "remove passes"):
    // the validation report rides the lake WRITE itself as observed
    // metrics (CollectMetrics sits below the invalid-row filter, so it
    // sees every row while only clean rows reach the files). r1-r18
    // staged the batch in the block cache and ran validation and write
    // as two jobs over it — at 100 TB that is a full extra
    // materialization of the batch (cache encode + likely disk spill)
    // plus a second read; here the source is parsed exactly once, by
    // the write. Values are identical by construction — same aggregate
    // expressions over the same filtered rows (IngestSpec pins the
    // report; every qi oracle row gates the data).
    val present = required.filter(filtered.columns.contains)
    if (present.isEmpty) {
      // no validatable columns (no tp enrichment): keep the staged
      // two-job shape — validate (count/maxTs) over the cached batch +
      // append reading the same cache
      val staged = filtered.persist()
      try {
        val v = Validation.validate(staged, required)
        val touched = lake.append(spark, spec.table, v.clean)
        return IngestResult(v.totalRows - v.invalidRows, v.invalidRows,
          v.nullsByColumn, chunks, v.maxTimestamp, touched)
      } finally { staged.unpersist() }
    }
    val anyNull = present.map(col(_).isNull).reduce(_ || _)
    val tsCol = TpSchema.Timestamp
    val hasTs = filtered.columns.contains(tsCol)
    val maxTsAgg =
      if (hasTs) max(when(!anyNull, col(tsCol))).as("__max_ts")
      else max(lit(null).cast("timestamp")).as("__max_ts")
    val aggs: Seq[Column] =
      Seq(sum(when(anyNull, 1L).otherwise(0L)).as("__invalid"),
        count(lit(1)).as("__total")) ++
        present.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)) ++
        Seq(maxTsAgg)
    val obs = new org.apache.spark.sql.Observation(
      "graft_ingest_" + java.util.UUID.randomUUID().toString)
    val clean = filtered.observe(obs, aggs.head, aggs.tail: _*)
      .where(!anyNull)
    val touched = lake.append(spark, spec.table, clean)
    val m = obs.get
    def asLong(k: String): Long = m.get(k) match {
      case Some(v: java.lang.Number) => v.longValue()
      case _ => 0L
    }
    val invalid = asLong("__invalid")
    val total = asLong("__total")
    val perCol = present.flatMap { c =>
      val n = asLong(c)
      if (n > 0) Some(c -> n) else None
    }.toMap
    val maxTs = m.get("__max_ts").flatMap {
      case t: Timestamp => Some(t)
      case i: java.time.Instant => Some(Timestamp.from(i))
      case _ => None
    }
    IngestResult(total - invalid, invalid, perCol, chunks, maxTs, touched)
  }
}
