package graft.config

import scala.collection.immutable.ListMap
import scala.util.chaining._

/** Hand-rolled parser for the HCL subset the reference's config files
  * use (`partition`/`table`/`format`/`source` blocks — reference
  * /root/reference/internal/parse/load_config.go, block shapes
  * internal/config/partition.go:31-81, table.go:19-34, format.go;
  * fixture syntax tests/acceptance/test_files/table_block.bats:26-48,
  * core_formats.bats:1-50).
  *
  * Supported grammar (all the fixtures need, nothing more):
  *
  * {{{
  * file    := (block)*
  * block   := IDENT STRING* '{' (attr | block)* '}'
  * attr    := IDENT '=' value
  * value   := STRING | `raw` | NUMBER | true | false
  *          | '[' [value (',' value)*] [','] ']'
  *          | IDENT ('.' IDENT)*          // reference, e.g. format.grok.x
  * }}}
  *
  * Comments: hash, double-slash, and C-style block comments. Backtick
  * strings are raw (no escape processing) — the reference uses them
  * for grok layouts.
  */
object Hcl {

  // ---- value AST -------------------------------------------------------

  sealed trait Value
  final case class HString(s: String) extends Value
  final case class HNumber(n: Double) extends Value
  final case class HBool(b: Boolean) extends Value
  final case class HArray(items: Seq[Value]) extends Value
  /** Dotted reference like `format.delimited.access_log`. */
  final case class HRef(path: Seq[String]) extends Value

  final case class Block(
      kind: String,
      labels: Seq[String],
      attrs: ListMap[String, Value],
      blocks: Seq[Block]) {
    def str(name: String): Option[String] = attrs.get(name).map {
      case HString(s) => s
      case HRef(p)    => p.mkString(".")
      case other => throw new IllegalArgumentException(
        s"$kind: attribute '$name' is not a string: $other")
    }
    def bool(name: String): Option[Boolean] = attrs.get(name).map {
      case HBool(b) => b
      case other => throw new IllegalArgumentException(
        s"$kind: attribute '$name' is not a bool: $other")
    }
    def int(name: String): Option[Int] = attrs.get(name).map {
      // isValidInt guards the silent Double→Int truncation of
      // out-of-range whole numbers (chunk_rows = 10000000000 must be a
      // config error, not a wrapped negative)
      case HNumber(n) if n.isWhole && n.isValidInt => n.toInt
      case other => throw new IllegalArgumentException(
        s"$kind: attribute '$name' is not a 32-bit integer: $other")
    }
    def strings(name: String): Option[Seq[String]] = attrs.get(name).map {
      case HArray(items) => items.map {
        case HString(s) => s
        case other => throw new IllegalArgumentException(
          s"$kind: '$name' element is not a string: $other")
      }
      case other => throw new IllegalArgumentException(
        s"$kind: attribute '$name' is not an array: $other")
    }
  }

  // ---- tokenizer -------------------------------------------------------

  private sealed trait Tok
  private final case class TIdent(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TNum(n: Double) extends Tok
  private final case class TPunct(c: Char) extends Tok

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    def err(msg: String) = throw new IllegalArgumentException(
      s"HCL parse error at offset $i: $msg")
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '#' || (c == '/' && i + 1 < n && src(i + 1) == '/')) {
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src(i + 1) == '*') {
        val end = src.indexOf("*/", i + 2)
        if (end < 0) err("unterminated block comment")
        i = end + 2
      } else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != '"') {
          if (src(i) == '\\' && i + 1 < n) {
            src(i + 1) match {
              case 'n'   => sb += '\n'
              case 't'   => sb += '\t'
              case '"'   => sb += '"'
              case '\\'  => sb += '\\'
              case other => sb += other
            }
            i += 2
          } else { sb += src(i); i += 1 }
        }
        if (i >= n) err("unterminated string")
        i += 1
        out += TStr(sb.result())
      } else if (c == '`') {
        val end = src.indexOf('`', i + 1)
        if (end < 0) err("unterminated raw string")
        out += TStr(src.substring(i + 1, end))
        i = end + 1
      } else if (c.isDigit || (c == '-' && i + 1 < n && src(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (src(i).isDigit || src(i) == '.' ||
          src(i) == 'e' || src(i) == 'E' ||
          ((src(i) == '+' || src(i) == '-') &&
            (src(i - 1) == 'e' || src(i - 1) == 'E')))) i += 1
        out += TNum(src.substring(start, i).toDouble)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        out += TIdent(src.substring(start, i))
      } else if ("{}[]=,.".indexOf(c) >= 0) {
        out += TPunct(c); i += 1
      } else err(s"unexpected character '$c'")
    }
    out.result()
  }

  // ---- parser ----------------------------------------------------------

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = {
      val t = toks.lift(pos).getOrElse(
        throw new IllegalArgumentException("HCL parse error: unexpected EOF"))
      pos += 1; t
    }
    private def expect(c: Char): Unit = next() match {
      case TPunct(`c`) => ()
      case other => throw new IllegalArgumentException(
        s"HCL parse error: expected '$c', got $other")
    }

    def file(): Seq[Block] = {
      val bs = Seq.newBuilder[Block]
      while (peek.isDefined) bs += block()
      bs.result()
    }

    private def block(): Block = {
      val kind = next() match {
        case TIdent(s) => s
        case other => throw new IllegalArgumentException(
          s"HCL parse error: expected block type, got $other")
      }
      val labels = Seq.newBuilder[String]
      var go = true
      while (go) peek match {
        case Some(TStr(s))        => labels += s; pos += 1
        case Some(TPunct('{'))    => go = false
        case other => throw new IllegalArgumentException(
          s"HCL parse error: expected label or '{' after '$kind', got $other")
      }
      expect('{')
      var attrs = ListMap.empty[String, Value]
      val blocks = Seq.newBuilder[Block]
      var open = true
      while (open) peek match {
        case Some(TPunct('}')) => pos += 1; open = false
        case Some(TIdent(name)) =>
          // dotted attribute names (hadoop.fs.s3a.endpoint = …): scan
          // the maximal ident('.'ident)* run; it is an attribute iff
          // '=' follows. Nested blocks never have dotted kinds, and
          // dotted VALUES (format.delimited.x) still parse as HRef.
          var look = pos + 1
          val dotted = new StringBuilder(name)
          var scanning = true
          while (scanning) (toks.lift(look), toks.lift(look + 1)) match {
            case (Some(TPunct('.')), Some(TIdent(part))) =>
              dotted.append('.').append(part); look += 2
            case _ => scanning = false
          }
          if (toks.lift(look).contains(TPunct('='))) {
            pos = look + 1 // past '='
            attrs = attrs.updated(dotted.result(), value())
          } else blocks += block()
        case other => throw new IllegalArgumentException(
          s"HCL parse error in block '$kind': unexpected $other")
      }
      Block(kind, labels.result(), attrs, blocks.result())
    }

    private def peek2: Option[Tok] = toks.lift(pos + 1)

    private def value(): Value = next() match {
      case TStr(s)         => HString(s)
      case TNum(d)         => HNumber(d)
      case TIdent("true")  => HBool(true)
      case TIdent("false") => HBool(false)
      case TIdent(head) =>
        val path = Seq.newBuilder[String]
        path += head
        while (peek.contains(TPunct('.'))) {
          pos += 1
          next() match {
            case TIdent(s) => path += s
            case other => throw new IllegalArgumentException(
              s"HCL parse error: expected identifier after '.', got $other")
          }
        }
        HRef(path.result())
      case TPunct('[') =>
        val items = Seq.newBuilder[Value]
        var open = true
        while (open) peek match {
          case Some(TPunct(']')) => pos += 1; open = false
          case _ =>
            items += value()
            peek match {
              case Some(TPunct(',')) => pos += 1
              case Some(TPunct(']')) => ()
              case other => throw new IllegalArgumentException(
                s"HCL parse error in array: unexpected $other")
            }
        }
        HArray(items.result())
      case other => throw new IllegalArgumentException(
        s"HCL parse error: unexpected value token $other")
    }
  }

  /** Parse HCL-subset text into raw blocks. */
  def parse(src: String): Seq[Block] = new Parser(tokenize(src)).file()

  // ---- decode into the config model -----------------------------------

  /** A fully decoded config file: the Scala counterpart of the
    * reference's `TailpipeConfig` (internal/config/tailpipe_config.go).
    */
  final case class Config(
      formats: Map[String, FormatSpec],
      tables: Map[String, TableSpec],
      partitions: Map[String, PartitionSpec],
      connections: Map[String, ConnectionSpec] = Map.empty,
      rollups: Map[String, RollupSpec] = Map.empty)

  /** Decode `partition`/`table`/`format` blocks, with the reference's
    * validation rules (table.go:110-117: source+transform mutually
    * exclusive — enforced by [[ColumnSpec]]; optional columns without a
    * transform must declare a type; partition requires 2 labels,
    * partition.go:61-67).
    */
  /** Duplicate-block detection (reference internal/parse decode:
    * "partition X already exists for table Y"). Within one file a
    * repeated id is a config error; ACROSS files later files still win
    * (ConfigLoader's documented merge order).
    */
  private def unique[T](
      pairs: Seq[(String, T)], msg: (String, T) => String): Map[String, T] = {
    val seen = scala.collection.mutable.HashSet[String]()
    pairs.foreach { case (k, v) =>
      if (!seen.add(k)) throw new IllegalArgumentException(msg(k, v))
    }
    pairs.toMap
  }

  def decode(src: String): Config = {
    val blocks = parse(src)
    val formats = blocks.filter(_.kind == "format").map { b =>
      require(b.labels.length == 2,
        "'format' block requires 2 labels, 'type' and 'name'")
      val Seq(kind, name) = b.labels
      val f = FormatSpec(
        kind = kind,
        name = name,
        delimiter = b.str("delimiter").getOrElse(","),
        header = b.bool("header").getOrElse(true),
        pattern = b.str("layout").orElse(b.str("pattern")),
        description = b.str("description"))
      s"$kind.$name" -> f
    }.pipe(ps => unique(ps, (k, _: FormatSpec) => s"format $k already exists"))

    val tables = blocks.filter(_.kind == "table").map { b =>
      require(b.labels.length == 1, "'table' block requires 1 label, 'name'")
      val cols = b.blocks.filter(_.kind == "column").map { c =>
        require(c.labels.length == 1, "'column' block requires 1 label")
        val spec = ColumnSpec(
          name = c.labels.head,
          typeName = c.str("type"),
          source = c.str("source"),
          transform = c.str("transform"),
          required = c.bool("required").getOrElse(false),
          nullIf = c.str("null_if"),
          description = c.str("description"))
        // reference rule (table.go:110-117): an optional non-tp column
        // with no transform must declare a type, so the column can be
        // typed even when absent from the source data
        require(spec.required || spec.transform.isDefined ||
          spec.typeName.isDefined || TpSchemaNames.contains(spec.name),
          s"column '${spec.name}': type must be specified if column is optional")
        spec.dataType // force type-name validation at decode time
        spec
      }
      val t = TableSpec(
        name = b.labels.head,
        columns = cols,
        mapFields = b.strings("map_fields").getOrElse(Seq("*")),
        nullIf = b.str("null_if"),
        format = b.str("format"),
        description = b.str("description"),
        evolution = b.bool("evolution").getOrElse(false),
        statsColumns = b.strings("stats_columns"))
      t.name -> t
    }.pipe(ps => unique(ps, (k, _: TableSpec) => s"table $k already exists"))

    val connections = blocks.filter(_.kind == "connection").map { b =>
      require(b.labels.length == 2,
        "'connection' block requires 2 labels, 'type' and 'name'")
      val props = b.attrs.map { case (k, v) =>
        k -> (v match {
          case HString(s) => s
          case HNumber(n) => if (n.isWhole) n.toLong.toString else n.toString
          case HBool(x)   => x.toString
          case other => throw new IllegalArgumentException(
            s"connection: property '$k' must be a scalar, got $other")
        })
      }
      val c = ConnectionSpec(b.labels(0), b.labels(1), props.toMap)
      Connections.hadoopEntries(c) // vocabulary-check at load, not collect
      c.id -> c
    }.pipe(ps => unique(ps, (k, _: ConnectionSpec) => s"connection $k already exists"))

    val partitions = blocks.filter(_.kind == "partition").map { b =>
      require(b.labels.length == 2,
        "'partition' block requires 2 labels, 'type' and 'name'")
      val Seq(table, name) = b.labels
      val source = b.blocks.find(_.kind == "source").map { s =>
        require(s.labels.length == 1, "'source' block requires 1 label")
        val spec = SourceSpec(
          kind = s.labels.head,
          paths = s.strings("paths").getOrElse(Seq.empty),
          format = s.str("format"),
          fileLayout = s.str("file_layout"),
          command = s.str("command"),
          chunkRows = s.int("chunk_rows").getOrElse(1000),
          connection = s.str("connection"))
        require(spec.chunkRows > 0,
          s"source '${spec.kind}': chunk_rows must be positive, got ${spec.chunkRows}")
        // fail at config load, not at collect time (ADVICE r7)
        require(spec.kind != "process" || spec.command.exists(_.trim.nonEmpty),
          "source 'process' requires command = \"<shell command>\"")
        // connection refs resolve at collect time (Connections.resolve):
        // like format refs, the target may live in a sibling config file
        spec
      }
      val p = PartitionSpec(
        table = table,
        name = name,
        tpIndexColumn = b.str("tp_index"),
        filter = b.str("filter"),
        source = source)
      p.id -> p
    }.pipe(ps => unique(ps, (_, p: PartitionSpec) => s"partition ${p.name} already exists for table ${p.table}"))

    val rollups = blocks.filter(_.kind == "rollup").map { b =>
      require(b.labels.length == 2,
        "'rollup' block requires 2 labels, 'table' and 'name'")
      val Seq(table, name) = b.labels
      val aggs = b.blocks.filter(_.kind == "aggregate").map { a =>
        require(a.labels.length == 1, "'aggregate' block requires 1 label")
        RollupAggSpec(
          name = a.labels.head,
          function = a.str("function").getOrElse(throw
            new IllegalArgumentException(
              s"aggregate '${a.labels.head}': function = \"...\" required")),
          column = a.str("column"))
      }
      val r = RollupSpec(
        table = table,
        name = name,
        groupBy = b.strings("group_by").getOrElse(Seq.empty),
        aggs = aggs)
      r.id -> r
    }.pipe(ps => unique(ps,
      (k, _: RollupSpec) => s"rollup $k already exists"))

    Config(formats, tables, partitions, connections, rollups)
  }

  /** `tp_` common-field names whose types are known a priori (reference
    * schema.IsCommonField, used by the optional-column rule).
    */
  private val TpSchemaNames = Set(
    "tp_timestamp", "tp_date", "tp_index", "tp_partition", "tp_table",
    "tp_id", "tp_source_type", "tp_ingest_timestamp", "tp_source_ip",
    "tp_destination_ip", "tp_source_name", "tp_source_location",
    "tp_akas", "tp_ips", "tp_tags", "tp_domains", "tp_emails",
    "tp_usernames")
}
