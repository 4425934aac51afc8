package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.{FormatSpec, SourceSpec}

/** Source-adapter SPI — the engine's counterpart of the reference's
  * plugin system (SURVEY §7.3: "model sources as a Scala SPI (trait
  * RowSource), keep gRPC as future work"; reference plugin boundary
  * /root/reference/internal/plugin/plugin_manager.go:74-166, CLI
  * surface cmd/plugin.go:36-212).
  *
  * An adapter turns a `source` config block into a raw DataFrame; the
  * shared pipeline (conversion → enrichment → validation → partitioned
  * append) is identical for every adapter, exactly as every reference
  * plugin feeds the same JSONL→parquet converter. Most adapters are
  * in-process (a plugin binary boundary adds nothing to DISTRIBUTION on
  * a Spark cluster, where the executors are the parallelism mechanism);
  * [[ProcessSource]] provides the out-of-process boundary where it does
  * earn its keep — crash isolation of untrusted acquisition commands.
  */
trait SourceAdapter {
  /** Registry key, matched against `source "<kind>" { … }` blocks. */
  def kind: String
  def version: String
  def description: String

  /** Produce the raw batch for one collect run. `progress` receives
    * human-readable status lines DURING acquisition (the reference's
    * Started/Chunk/Complete event stream, collector.go:408-461) —
    * adapters whose read is one lazy plan emit nothing; staging
    * adapters ([[ProcessSource]]) emit per-chunk lines.
    */
  def read(
      spark: SparkSession, source: SourceSpec, format: Option[FormatSpec],
      from: Option[Timestamp], to: Option[Timestamp],
      progress: String => Unit): DataFrame

  /** Progress-less convenience overload. */
  final def read(
      spark: SparkSession, source: SourceSpec, format: Option[FormatSpec],
      from: Option[Timestamp], to: Option[Timestamp]): DataFrame =
    read(spark, source, format, from, to, _ => ())
}

/** The `file` source: paths + optional `file_layout` filename pattern,
  * parsed by the declared format (jsonl / delimited / grok) — reference
  * file source + format blocks (core_formats.bats fixtures).
  */
object FileSource extends SourceAdapter {
  val kind = "file"
  val version = "1.0.0"
  val description = "Collect from local files (jsonl, delimited, grok)"

  def read(
      spark: SparkSession, source: SourceSpec, format: Option[FormatSpec],
      from: Option[Timestamp], to: Option[Timestamp],
      progress: String => Unit): DataFrame = {
    val files = Formats.resolveFiles(source.paths, source.fileLayout)
    require(files.nonEmpty,
      s"no files matched paths=${source.paths.mkString(",")}" +
        source.fileLayout.map(l => s" layout=$l").getOrElse(""))
    Formats.read(spark, format.getOrElse(FormatSpec("jsonl", "default")), files)
  }
}

/** The `synthetic` load-harness source (collector_synthetic.go): kind
  * is the full spec string, e.g. `synthetic_50cols_2000000rows_…`.
  */
object SyntheticSource extends SourceAdapter {
  val kind = "synthetic"
  val version = "1.0.0"
  val description = "Generate deterministic synthetic load-test data"

  def read(
      spark: SparkSession, source: SourceSpec, format: Option[FormatSpec],
      from: Option[Timestamp], to: Option[Timestamp],
      progress: String => Unit): DataFrame = {
    val specStr = source.paths.headOption.getOrElse(
      throw new IllegalArgumentException(
        "synthetic source needs its spec string as the path, " +
          "e.g. synthetic_10cols_1000rows_100chunk_10ms"))
    val spec = Synthetic.parseSpec(specStr).getOrElse(
      throw new IllegalArgumentException(s"bad synthetic spec: $specStr"))
    val toTs = to.getOrElse(new Timestamp(System.currentTimeMillis()))
    val fromTs = from.getOrElse(
      new Timestamp(toTs.getTime - 7L * 24 * 3600 * 1000))
    Synthetic.dataFrame(spark, spec, specStr, "synthetic", fromTs, toTs)
  }
}

/** Adapter registry — `plugin list/show` reads it; collect resolves
  * source kinds through it. Thread-safe; `register` lets library users
  * install custom adapters (S3 listings, API pagers, …).
  */
object SourceRegistry {
  private val adapters =
    new java.util.concurrent.ConcurrentHashMap[String, SourceAdapter]()

  register(FileSource)
  register(SyntheticSource)
  register(ProcessSource)

  def register(a: SourceAdapter): Unit = adapters.put(a.kind, a)

  /** Remove a dynamically-registered adapter (plugin uninstall). */
  def unregister(kind: String): Unit = adapters.remove(kind)

  def get(kind: String): Option[SourceAdapter] = Option(adapters.get(kind))

  def list: Seq[SourceAdapter] =
    adapters.values().toArray(Array.empty[SourceAdapter]).toSeq
      .sortBy(_.kind)
}
