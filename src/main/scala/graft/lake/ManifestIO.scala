package graft.lake

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, MessageTypeParser, PrimitiveType}
import org.apache.spark.sql.catalyst.util.DateTimeUtils

/** Driver-side parquet I/O for the lake's METADATA plane (r19
  * optimization round, guide §1.2 "the distributed algorithm" + §6).
  *
  * The manifest is metadata-sized by design (one row per data file,
  * self-compacted at a threshold) and every consumer collects it to the
  * driver promptly — yet until r19 every manifest append ran a Spark
  * write job, every floor-seq/fileStats read ran a Spark read+shuffle
  * job, and every append re-SCANNED its new files to compute per-file
  * row counts and tp_timestamp ranges. Per lake mutation that is 3-4
  * distributed jobs whose inputs and outputs are kilobytes. This object
  * replaces them with direct parquet reads/writes on the driver:
  *
  *  - [[footerStats]]: per-file (rows, min_ts, max_ts) from parquet
  *    FOOTERS — the stats the writer already computed — instead of
  *    re-scanning the data. At 100 TB an append's stats cost drops from
  *    a full read of the new files' timestamp column to one ~KB footer
  *    read per file. Falls back (None) when a footer cannot prove the
  *    answer (INT96 timestamps carry no stats; unexpected types), in
  *    which case the caller keeps the old scan path — fail-open, never
  *    wrong.
  *  - [[writeManifest]]: one snappy parquet file written directly into
  *    the manifest dir (tmp-name + rename, same crash contract as the
  *    committer's rename), byte-compatible with the Spark-written
  *    manifest schema so old and new files mix freely.
  *  - [[readManifest]] / [[maxSeq]]: direct reads of the manifest rows
  *    (both INT96- and INT64-timestamp vintages); maxSeq comes from
  *    footer stats alone — no data pages touched.
  *
  * Everything here is exact-equivalence plumbing: ManifestIOSpec pins
  * footer stats == scan stats (including all-null and null-mixed
  * timestamp files) and write→Spark-read round-trips.
  */
private[lake] object ManifestIO {

  final case class MRow(
      file: String, rows: Long,
      minTs: Option[Timestamp], maxTs: Option[Timestamp], seq: Long)

  private val ManifestSchema: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional binary file (UTF8);
      |  required int64 rows;
      |  optional int64 min_ts (TIMESTAMP(MICROS,true));
      |  optional int64 max_ts (TIMESTAMP(MICROS,true));
      |  required int64 seq;
      |}""".stripMargin)

  /** Write one manifest parquet file with `rows` into `dir` (created if
    * absent). Tmp-name + rename so readers never observe a partial file
    * — the same visibility contract as Spark's commit rename.
    */
  def writeManifest(
      conf: Configuration, dir: String,
      rows: Seq[MRow]): Unit = {
    val uuid = java.util.UUID.randomUUID().toString
    val tmp = new Path(s"$dir/.part-$uuid.snappy.parquet.tmp")
    val dst = new Path(s"$dir/part-$uuid-graft.snappy.parquet")
    val writer = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(tmp, conf))
      .withConf(conf)
      .withType(ManifestSchema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(ManifestSchema)
    try rows.foreach { r =>
      val g = gf.newGroup()
      g.append("file", Binary.fromString(r.file))
      g.append("rows", r.rows)
      r.minTs.foreach(t => g.append("min_ts", DateTimeUtils.fromJavaTimestamp(t)))
      r.maxTs.foreach(t => g.append("max_ts", DateTimeUtils.fromJavaTimestamp(t)))
      g.append("seq", r.seq)
      writer.write(g)
    } finally writer.close()
    val fs = dst.getFileSystem(conf)
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"manifest rename failed: $tmp -> $dst")
    }
    // preserve the Spark-writer invariant that a COMPLETE manifest dir
    // carries a _SUCCESS marker — healSwapAsides discriminates a
    // finished `_new` from a partial one by exactly this file
    val marker = new Path(s"$dir/_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker, true).close()
  }

  /** Data-file names within `dir` eligible as manifest parts (the same
    * hidden-file rule every Spark scan applies).
    */
  private def manifestParts(conf: Configuration, dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq.collect {
      case st if st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      } => st.getPath
    }
  }

  /** All manifest rows under `dir` (no reconciliation — callers fold).
    * Handles both timestamp vintages: INT96 (Spark's historical
    * default) and INT64 TIMESTAMP(MICROS) (direct-written).
    */
  def readManifest(conf: Configuration, dir: String): Seq[MRow] =
    manifestParts(conf, dir).flatMap(readManifestFile(conf, _))

  private def readManifestFile(conf: Configuration, file: Path): Seq[MRow] = {
    val reader = ParquetReader.builder(new GroupReadSupport(), file)
      .withConf(conf).build()
    val out = Seq.newBuilder[MRow]
    try {
      var g: Group = reader.read()
      while (g != null) {
        out += MRow(
          if (g.getFieldRepetitionCount("file") == 0) null
          else g.getString("file", 0),
          g.getLong("rows", 0),
          tsField(g, "min_ts"),
          tsField(g, "max_ts"),
          g.getLong("seq", 0))
        g = reader.read()
      }
    } finally reader.close()
    out.result()
  }

  private def tsField(g: Group, name: String): Option[Timestamp] = {
    if (g.getFieldRepetitionCount(name) == 0) return None
    val t = g.getType.getType(name).asPrimitiveType()
    t.getPrimitiveTypeName match {
      case PrimitiveType.PrimitiveTypeName.INT64 =>
        // convert by the DECLARED unit, never by assumption (r19
        // ADVICE-medium): a manifest part written by a Spark session
        // pinned to TIMESTAMP_MILLIS would otherwise be read 1000×
        // off, silently corrupting data-skipping ranges. Unannotated
        // int64 (shouldn't exist for this column) fails loudly.
        val raw = g.getLong(name, 0)
        val micros = t.getLogicalTypeAnnotation match {
          case a: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            a.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS => raw
              case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
              case LogicalTypeAnnotation.TimeUnit.NANOS  => raw / 1000L
            }
          case other => throw new IllegalStateException(
            s"manifest $name: int64 without a timestamp annotation " +
              s"($other) — refusing to guess the unit")
        }
        Some(DateTimeUtils.toJavaTimestamp(micros))
      case PrimitiveType.PrimitiveTypeName.INT96 =>
        val bb = g.getInt96(name, 0).toByteBuffer
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanosOfDay = bb.getLong
        val julianDay = bb.getInt
        val micros = (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
        Some(DateTimeUtils.toJavaTimestamp(micros))
      case other =>
        throw new IllegalStateException(s"manifest $name: unexpected $other")
    }
  }

  /** max(seq) across the manifest dir from FOOTER STATS alone (seq is a
    * required int64 — stats always present). None = no rows.
    */
  def maxSeq(conf: Configuration, dir: String): Option[Long] = {
    val parts = manifestParts(conf, dir)
    // pooled footer reads like footerStats (r19 verdict: the serial
    // loop was the one remaining unpooled footer path — bounded by the
    // self-compaction threshold, but object-store open latency ×64
    // serial is still a visible stall). Per part: Some(max) from
    // stats, None for an empty part, or a thrown MissingStats to
    // trigger the row-read fallback.
    final case class MissingStats() extends RuntimeException
    val perPart: Seq[Option[Long]] =
      try parMap(parts) { p =>
        val in = HadoopInputFile.fromPath(p, conf)
        val r = ParquetFileReader.open(in)
        try {
          var best: Option[Long] = None
          r.getFooter.getBlocks.asScala.foreach { b =>
            if (b.getRowCount > 0) {
              val col = b.getColumns.asScala
                .find(_.getPath.toDotString == "seq")
                .getOrElse(throw new IllegalStateException(
                  s"manifest file $p lacks seq column"))
              val st = col.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue)
                // stats unexpectedly absent: fall back to reading rows
                throw MissingStats()
              val mx = st.genericGetMax
                .asInstanceOf[java.lang.Long].longValue()
              if (!best.exists(_ >= mx)) best = Some(mx)
            }
          }
          best
        } finally r.close()
      } catch {
        case _: MissingStats =>
          return readManifest(conf, dir) match {
            case rs if rs.isEmpty => None
            case rs => Some(rs.map(_.seq).max)
          }
      }
    perPart.flatten.reduceOption((a, b) => math.max(a, b))
  }

  /** The Spark catalyst schema a Spark-written parquet file carries in
    * its footer key-value metadata (`org.apache.spark.sql.parquet.row.
    * metadata`) — the exact StructType `spark.read` would infer, read
    * driver-side without a 1-task Spark job. None when the file was
    * not written by Spark (caller falls back to the job path).
    */
  def sparkSchemaOf(
      conf: Configuration, file: Path)
      : Option[org.apache.spark.sql.types.StructType] =
    try {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        Option(r.getFooter.getFileMetaData.getKeyValueMetaData
            .get("org.apache.spark.sql.parquet.row.metadata"))
          .map(org.apache.spark.sql.types.DataType.fromJson)
          .collect { case s: org.apache.spark.sql.types.StructType => s }
      } finally r.close()
    } catch { case _: Exception => None }

  /** Per-file (rows, min/max of `tsCol`) from parquet footers — the
    * exact values the old scan computed (row count includes null-ts
    * rows; min/max over non-null values; all-null file → (None, None)).
    * Returns None when ANY file's footer cannot prove the answer
    * (missing column, non-INT64-micros physical type, absent or
    * untrustworthy stats) — the caller then scans, as before. Files
    * with zero rows are skipped, matching the scan's groupBy semantics.
    */
  /** Run `body` over `items` on a bounded thread pool (footer reads
    * are ~ms of CPU + one small I/O each, but a local ChecksumFS open
    * costs ~10 ms of latency — 84 serial opens after a compaction
    * rewrite measured 1.0 s; 16-way parallel they are ~0.1 s, and on
    * an object store the latency argument is stronger still).
    */
  private def parMap[A, B](items: Seq[A])(body: A => B): Seq[B] = {
    if (items.size <= 2) return items.map(body)
    // daemon threads: a hung filesystem open must not keep the JVM
    // alive after main exits (r19 ADVICE-low)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, items.size),
      new java.util.concurrent.ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, "graft-manifest-io")
          t.setDaemon(true)
          t
        }
      })
    try {
      val futures = items.map(a => pool.submit(
        new java.util.concurrent.Callable[B] { def call(): B = body(a) }))
      futures.map { f =>
        // surface the worker's real exception, not the Execution-
        // Exception wrapper (callers of statsFor used to see the
        // underlying IO/Spark failure from the scan path)
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }

  def footerStats(
      conf: Configuration, files: Seq[String], tsCol: String)
      : Option[Seq[(String, Long, Option[Timestamp], Option[Timestamp])]] = {
    // per-file result: Right(Some(row)) served, Right(None) = 0-row
    // file (skipped), Left = cannot prove → caller falls back
    val results = parMap(files)(f => footerStatsOne(conf, f, tsCol))
    if (results.exists(_.isEmpty)) None
    else Some(results.flatMap(_.get))
  }

  private def footerStatsOne(
      conf: Configuration, f: String, tsCol: String)
      : Option[Option[(String, Long, Option[Timestamp], Option[Timestamp])]] = {
    val out = Seq.newBuilder[(String, Long, Option[Timestamp], Option[Timestamp])]
    Seq(f).foreach { f =>
      val r = try ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), conf))
      catch { case _: Exception => return None }
      try {
        val footer = r.getFooter
        val schema = footer.getFileMetaData.getSchema
        if (!schema.containsField(tsCol)) return None
        val fld = schema.getType(schema.getFieldIndex(tsCol))
        val micros = fld.isPrimitive &&
          fld.asPrimitiveType.getPrimitiveTypeName ==
            PrimitiveType.PrimitiveTypeName.INT64 &&
          (fld.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS &&
                t.isAdjustedToUTC
            case _ => false
          })
        if (!micros) return None
        var rows = 0L
        var mn: Option[Long] = None
        var mx: Option[Long] = None
        val blocks = footer.getBlocks.asScala
        for (b <- blocks; if b.getRowCount > 0) {
          rows += b.getRowCount
          val col = b.getColumns.asScala
            .find(_.getPath.toDotString == tsCol).getOrElse(return None)
          val st = col.getStatistics
          if (st == null || st.isEmpty) return None
          if (st.hasNonNullValue) {
            val lo = st.genericGetMin.asInstanceOf[java.lang.Long].longValue()
            val hi = st.genericGetMax.asInstanceOf[java.lang.Long].longValue()
            if (!mn.exists(_ <= lo)) mn = Some(lo)
            if (!mx.exists(_ >= hi)) mx = Some(hi)
          } else if (!st.isNumNullsSet || st.getNumNulls != b.getRowCount) {
            // no values and can't prove all-null: don't guess
            return None
          }
        }
        if (rows > 0)
          out += ((f, rows,
            mn.map(DateTimeUtils.toJavaTimestamp),
            mx.map(DateTimeUtils.toJavaTimestamp)))
      } finally r.close()
    }
    Some(out.result().headOption)
  }
}
