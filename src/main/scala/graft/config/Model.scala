package graft.config

import org.apache.spark.sql.types._

/** Configuration model for the engine — the Scala shape of the
  * reference's HCL blocks (`partition`/`table`/`format`/`source`;
  * /root/reference/internal/config/partition.go:31-81, table.go:19-34,
  * format.go, source.go). Parsed from HCL-subset text by
  * [[graft.config.Hcl]] or constructed directly by library users.
  */

/** One declared column of a custom table
  * (reference internal/config/table.go:76-127):
  *
  * @param name      column name in the lake table
  * @param typeName  declared type (engine vocabulary, §1.3 of SURVEY:
  *                  varchar/integer/bigint/double/float/boolean/
  *                  timestamp/date/uuid/json/struct definitions);
  *                  None = inferred (allowed only for required columns
  *                  in the reference; we keep the same rule)
  * @param source    source-field name if different from `name`
  * @param transform SQL scalar expression computed over the source row
  *                  (mutually exclusive with `source`)
  * @param required  row is dropped (and reported) when NULL
  * @param nullIf    value that should be read as NULL (e.g. "-")
  */
final case class ColumnSpec(
    name: String,
    typeName: Option[String] = None,
    source: Option[String] = None,
    transform: Option[String] = None,
    required: Boolean = false,
    nullIf: Option[String] = None,
    description: Option[String] = None) {
  require(source.isEmpty || transform.isEmpty,
    s"column $name: source and transform are mutually exclusive")

  /** Declared Spark type, if any. */
  def dataType: Option[DataType] = typeName.map(Types.parse)
}

/** A custom-table block (reference internal/config/table.go:19-34).
  *
  * @param mapFields glob patterns of source fields to automap when not
  *                  explicitly declared; default "*" (all)
  * @param nullIf    table-wide null sentinel applied to automapped
  *                  string fields
  */
final case class TableSpec(
    name: String,
    columns: Seq[ColumnSpec] = Seq.empty,
    mapFields: Seq[String] = Seq("*"),
    nullIf: Option[String] = None,
    format: Option[String] = None, // "<kind>.<name>" format reference
    description: Option[String] = None,
    // `evolution = true`: NEW source columns are adopted as nullable
    // instead of raising the drift error (type CHANGES still fail —
    // silent widening corrupts readers). Beyond-reference, the Delta
    // mergeSchema trade: reads of an evolved table merge parquet
    // footers (see Lake.read), paying planning cost for flexibility.
    evolution: Boolean = false,
    // `stats_columns = ["c1", ...]`: per-column stats (HLL NDV + KLL
    // histogram + zone maps) maintained from the table's FIRST append
    // — no post-hoc `table analyze --columns` + backfill scan needed.
    // None (attr absent) = the HCL collect path derives a default
    // (the partition filter's columns + tp_index); Some(Nil)
    // (`stats_columns = []`) disables auto-stats explicitly.
    // Programmatic TableSpec construction leaves None and the ingest
    // layer applies NO default (library callers opt in via
    // Lake.enableColumnStats).
    statsColumns: Option[Seq[String]] = None) {
  def column(n: String): Option[ColumnSpec] = columns.find(_.name == n)
}

/** A partition block binding a table to a source
  * (reference internal/config/partition.go:31-81).
  *
  * @param tpIndexColumn bare column name whose value becomes `tp_index`
  *                      (validated to be a plain identifier, like the
  *                      reference's normalize step partition.go:195-246);
  *                      None → literal 'default'
  * @param filter        ingest-time SQL predicate; rows failing it never
  *                      reach the lake (sanitized — see [[Sanitize]])
  */
final case class PartitionSpec(
    table: String,
    name: String,
    tpIndexColumn: Option[String] = None,
    filter: Option[String] = None,
    source: Option[SourceSpec] = None) {
  tpIndexColumn.foreach { c =>
    require(Sanitize.isIdentifier(c),
      s"tp_index must be a bare column name, got: $c")
  }
  filter.foreach(Sanitize.checkFilter)
  /** `<table>.<name>` — the unique partition identifier. */
  def id: String = s"$table.$name"
}

/** A source block: where raw rows come from (reference file source +
  * format reference; internal/config/source.go).
  *
  * @param paths      file paths / globs
  * @param format     name of a [[FormatSpec]] describing how to parse
  * @param command    for `source "process"`: the plugin command line,
  *                   run as a CHILD PROCESS streaming JSONL rows on
  *                   stdout (the reference's out-of-process plugin
  *                   boundary, plugin_manager.go:74-166)
  * @param chunkRows  rows per staged chunk file for process sources
  *                   (the reference SDK chunks at 1000)
  */
final case class SourceSpec(
    kind: String, // "file" | "synthetic" | "process"
    paths: Seq[String] = Seq.empty,
    format: Option[String] = None,
    // grok-ish filename pattern selecting files under `paths`
    // (reference source.go file_layout)
    fileLayout: Option[String] = None,
    command: Option[String] = None,
    chunkRows: Int = 1000,
    // `connection = connection.<type>.<name>` — named credential block
    // applied to the session's Hadoop conf before this source reads
    // (reference source.go `connection` attr + connection.go:27-67)
    connection: Option[String] = None)

/** A named credential/endpoint block (reference
  * internal/config/connection.go:27-67: `connection "<type>" "<name>"`
  * carrying opaque plugin HCL). The Spark-native target of those
  * properties is the session Hadoop configuration — see
  * [[Connections.hadoopEntries]] for the `s3` property vocabulary and
  * the `hadoop.*` passthrough every type supports.
  */
final case class ConnectionSpec(
    kind: String, // "s3" | anything with hadoop.* passthrough
    name: String,
    props: Map[String, String]) {
  def id: String = s"$kind.$name"
}

/** One aggregate column of a [[RollupSpec]]: `aggregate "<name>" {
  * function = "count|sum|min|max|avg|count_distinct" [column = "c"] }`.
  */
final case class RollupAggSpec(
    name: String,
    function: String,
    column: Option[String]) {
  require(RollupAggSpec.Functions.contains(function),
    s"aggregate '$name': unknown function '$function' " +
      s"(${RollupAggSpec.Functions.mkString(", ")})")
  require(function == "count" || column.isDefined,
    s"aggregate '$name': function '$function' requires column = \"...\"")
}

object RollupAggSpec {
  /** `ndv` stores a MERGEABLE DataSketches HLL sketch per rollup row
    * (binary `<name>_sketch` column) and surfaces the per-row estimate
    * as `<name>` at read time — unlike `count_distinct` (exact within
    * a month slice, not combinable across rows), sketches union: a
    * cross-month distinct count is
    * `hll_sketch_estimate(hll_union_agg(<name>_sketch))` over the
    * rollup rows, no raw-table scan at any range length.
    *
    * `median` is the distribution twin: a MERGEABLE KLL quantile
    * sketch per rollup row (same `<name>_sketch` binary convention),
    * surfaced as the p50 estimate at read time; a cross-month median
    * is `graft_kll_quantile(graft_kll_merge(<name>_sketch), 0.5)` —
    * no raw-table scan at any range length, where a stored plain
    * median can NEVER combine across rows.
    *
    * `avg` stores the MERGEABLE sum+count pair per rollup row
    * (`<name>_sum`, `<name>_n`) and surfaces the quotient as `<name>`
    * at read time: a cross-month avg is
    * `sum(<name>_sum) / sum(<name>_n)` over the rollup rows — exact
    * for integral columns — where a stored plain average can NEVER
    * combine across rows (averages don't average).
    */
  val Functions: Set[String] =
    Set("count", "sum", "min", "max", "avg", "count_distinct", "ndv",
      "median")
}

/** A materialized rollup over a lake table, maintained incrementally
  * at collect time (beyond-reference: the reference re-aggregates from
  * raw rows on every dashboard query; at 100 TB the aggregate must be
  * maintained, not recomputed).
  *
  * Maintenance grain is the lake's physical partition month
  * (tp_year/tp_month are implicit leading group keys): a collect
  * recomputes ONLY the months its batch touched — a pruned scan of
  * those months, never history — and atomically swaps those rollup
  * partitions. Cross-month totals are a query-time aggregate over the
  * (tiny) rollup rows. Arbitrary aggregate functions are therefore
  * safe, including non-mergeable ones (avg, count_distinct): each
  * month slice is recomputed from its data, not merged.
  */
final case class RollupSpec(
    table: String,
    name: String,
    groupBy: Seq[String],
    aggs: Seq[RollupAggSpec]) {
  require(groupBy.nonEmpty, s"rollup $id: group_by must be non-empty")
  require(aggs.nonEmpty, s"rollup $id: needs at least one aggregate block")
  require(!groupBy.exists(Set("tp_year", "tp_month")),
    s"rollup $id: tp_year/tp_month are implicit group keys")
  private val dup = (groupBy ++ aggs.map(_.name))
    .groupBy(identity).collectFirst { case (k, vs) if vs.length > 1 => k }
  require(dup.isEmpty, s"rollup $id: duplicate output column '${dup.get}'")
  def id: String = s"$table.$name"
  /** View name the query surface registers for this rollup. */
  def viewName: String = s"${table}_rollup_$name"
}

/** A format block (reference internal/config/format.go): `delimited`
  * (header/delimiter → csv reader) or `grok` (pattern → regex
  * projection) or `jsonl`.
  */
final case class FormatSpec(
    kind: String, // "jsonl" | "delimited" | "grok"
    name: String,
    // delimited:
    delimiter: String = ",",
    header: Boolean = true,
    // grok:
    pattern: Option[String] = None,
    description: Option[String] = None)

/** Engine type vocabulary ↔ Spark types (SURVEY §1.3 mapping table). */
object Types {
  /** Parse an engine type name (DuckDB-flavored, lower-cased) into a
    * Spark type. Supports nested `struct(name type, ...)` and `T[]`
    * array suffixes — the same type-string shapes the reference's
    * DDL builder walks (internal/database/tables.go:134-175).
    */
  def parse(t: String): DataType = {
    val s = t.trim
    if (s.endsWith("[]")) ArrayType(parse(s.dropRight(2)))
    else if (s.toLowerCase.startsWith("struct(")) {
      val inner = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      StructType(splitTop(inner).map { f =>
        val (n, ty) = f.trim.span(c => !c.isWhitespace)
        StructField(unquote(n), parse(ty.trim))
      })
    } else s.toLowerCase match {
      case "varchar" | "string" | "text" | "uuid" | "json" => StringType
      case "integer" | "int" | "int32"                     => IntegerType
      case "bigint" | "long" | "int64" | "hugeint"         => LongType
      case "double" | "float8"                             => DoubleType
      case "float" | "float4" | "real"                     => FloatType
      case "boolean" | "bool"                              => BooleanType
      case "timestamp" | "datetime"                        => TimestampType
      case "date"                                          => DateType
      case "tinyint" | "smallint" | "int16"                => ShortType
      case "blob" | "binary" | "bytea"                     => BinaryType
      case other => throw new IllegalArgumentException(
        s"unsupported column type: $other")
    }
  }

  /** Engine-vocabulary name for a Spark type (used by `.inspect` and
    * DESCRIBE surfaces, matching the reference's lower-cased DuckDB
    * names — internal/database/convertor.go:87).
    */
  def name(dt: DataType): String = dt match {
    case StringType          => "varchar"
    case IntegerType         => "integer"
    case LongType            => "bigint"
    case DoubleType          => "double"
    case FloatType           => "float"
    case BooleanType         => "boolean"
    case TimestampType       => "timestamp"
    case DateType            => "date"
    case ShortType           => "smallint"
    case ByteType            => "tinyint"
    case BinaryType          => "blob"
    case ArrayType(e, _)     => name(e) + "[]"
    case st: StructType =>
      st.fields.map(f => s"${f.name} ${name(f.dataType)}")
        .mkString("struct(", ", ", ")")
    case d: DecimalType      => s"decimal(${d.precision},${d.scale})"
    case other               => other.simpleString
  }

  /** Split on top-level commas (not inside parens/brackets). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case c @ ('(' | '[') => depth += 1; cur += c
      case c @ (')' | ']') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  private def unquote(s: String): String =
    s.stripPrefix("\"").stripSuffix("\"")
}

/** Filter/identifier sanitization, mirroring the reference's rules for
  * partition filters (internal/config/partition.go:139-193): a filter
  * is a bare predicate — no statement separators, comments, or DML/DDL
  * keywords that would break out of the generated query.
  */
object Sanitize {
  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r
  def isIdentifier(s: String): Boolean = Ident.matches(s)

  private val banned = Seq(
    ";", "--", "/*", "*/",
    "insert ", "update ", "delete ", "drop ", "create ", "alter ",
    "attach ", "detach ", "pragma ", "call ", "copy ")

  /** @throws IllegalArgumentException on disallowed content */
  def checkFilter(f: String): Unit = {
    val lower = f.toLowerCase
    banned.foreach { b =>
      require(!lower.contains(b), s"disallowed token in filter: '$b'")
    }
  }
}
