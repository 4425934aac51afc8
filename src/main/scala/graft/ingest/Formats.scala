package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.FormatSpec

/** Grok pattern compilation: `%{NAME:field}` tokens over a base library
  * of named sub-patterns → one Java regex with capture groups in field
  * order (reference: grok `format` blocks,
  * /root/reference/internal/config/format.go; acceptance fixture
  * tests/acceptance/test_files/core_formats.bats:5-8).
  *
  * The base patterns are the standard public logstash definitions,
  * rewritten with non-capturing groups only — so the i-th declared
  * field is exactly capture group i+1, which is what
  * `regexp_extract(value, re, i+1)` needs.
  */
object Grok {

  /** Base pattern library (public logstash vocabulary, non-capturing). */
  val base: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    m += "INT" -> """(?:[+-]?(?:[0-9]+))"""
    m += "NUMBER" -> """(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?))"""
    m += "BASE16NUM" -> """(?:0[xX])?[0-9a-fA-F]+"""
    m += "WORD" -> """\b\w+\b"""
    m += "NOTSPACE" -> """\S+"""
    m += "SPACE" -> """\s*"""
    m += "DATA" -> """.*?"""
    m += "GREEDYDATA" -> """.*"""
    m += "QUOTEDSTRING" -> """(?:"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')"""
    m += "UUID" -> """[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}"""
    m += "YEAR" -> """(?:\d\d){1,2}"""
    m += "MONTHNUM" -> """(?:0?[1-9]|1[0-2])"""
    m += "MONTHDAY" -> """(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])"""
    m += "HOUR" -> """(?:2[0123]|[01]?[0-9])"""
    m += "MINUTE" -> """(?:[0-5][0-9])"""
    m += "SECOND" -> """(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)"""
    m += "TIME" -> """(?:2[0123]|[01]?[0-9]):(?:[0-5][0-9])(?::(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?"""
    m += "ISO8601_TIMEZONE" -> """(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9])))"""
    m += "TIMESTAMP_ISO8601" -> ("""(?:\d\d){1,2}-(?:0?[1-9]|1[0-2])-""" +
      """(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[T ]""" +
      """(?:2[0123]|[01]?[0-9]):?(?:[0-5][0-9])""" +
      """(?::?(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?""" +
      """(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9])))?""")
    m += "LOGLEVEL" -> ("""(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|""" +
      """[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|""" +
      """[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|""" +
      """[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)""")
    m += "IPV4" -> ("""(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}""" +
      """(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)""")
    m += "HOSTNAME" -> ("""\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})""" +
      """(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b""")
    m += "USERNAME" -> """[a-zA-Z0-9._-]+"""
    m += "MONTH" -> ("""\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|""" +
      """[Mm]ar(?:ch)?|[Aa]pr(?:il)?|[Mm]ay|[Jj]un(?:e)?|[Jj]ul(?:y)?|""" +
      """[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo]ct(?:ober)?|""" +
      """[Nn]ov(?:ember)?|[Dd]ec(?:ember)?)\b""")
    m.result()
  }

  private val Token = """%\{([A-Z0-9_]+)(?::([A-Za-z0-9_]+))?\}""".r

  /** A compiled grok pattern: the expanded Java regex and the declared
    * field names — field i corresponds to capture group i+1.
    */
  final case class Compiled(regex: String, fields: Seq[String])

  /** Expand `%{NAME[:field]}` tokens. Named tokens become capture
    * groups; bare tokens expand non-capturing. Text between tokens is
    * passed through verbatim (it is already regex — the reference's
    * grok layouts embed `\[`, `\s+` etc.).
    */
  def compile(pattern: String): Compiled = {
    val fields = Seq.newBuilder[String]
    val regex = Token.replaceAllIn(pattern, m => {
      val name = m.group(1)
      val fieldOpt = Option(m.group(2))
      val sub = base.getOrElse(name,
        throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
      val expanded = fieldOpt match {
        case Some(f) => fields += f; s"($sub)"
        case None    => s"(?:$sub)"
      }
      java.util.regex.Matcher.quoteReplacement(expanded)
    })
    val out = Compiled(regex, fields.result())
    require(out.fields.distinct.size == out.fields.size,
      s"duplicate grok field names: ${out.fields.mkString(", ")}")
    out
  }

  /** Does `name` match the layout pattern (used for `file_layout`
    * file selection, core_formats.bats:27)?
    */
  def matchesLayout(layout: String, name: String): Boolean =
    ("^" + compile(layout).regex + "$").r.matches(name)
}

/** Format readers: turn raw source files into the untyped DataFrame
  * that [[Ingest.collectBatch]] converts and enriches — the Spark
  * counterpart of the reference's format plugins feeding conversion
  * (internal/config/format.go; SURVEY §2B scans row).
  */
object Formats {

  /** Read `files` according to `format`. The result is schema-dynamic;
    * declared-table conversion (TableSpec) applies types downstream.
    */
  def read(
      spark: SparkSession, format: FormatSpec,
      files: Seq[String]): DataFrame = format.kind match {
    case "jsonl" =>
      spark.read.json(files: _*)

    case "delimited" =>
      // DuckDB-style CSV sniffing ≈ Spark inferSchema; both read the
      // header when declared (format.go delimited options)
      spark.read
        .option("header", format.header.toString)
        .option("delimiter", format.delimiter)
        .option("inferSchema", "true")
        .csv(files: _*)

    case "grok" =>
      val pattern = format.pattern.getOrElse(
        throw new IllegalArgumentException(
          s"grok format '${format.name}' needs a layout"))
      readGrok(spark, pattern, files)

    // columnar drop formats: logs exported by warehouses/ETL arrive as
    // parquet or ORC files just like JSONL drops — schema comes from
    // the file footer, so no inference pass; declared-table conversion
    // still applies downstream like any other format
    case "parquet" =>
      spark.read.parquet(files: _*)
    case "orc" =>
      spark.read.orc(files: _*)

    case other =>
      throw new IllegalArgumentException(s"unknown format kind: $other")
  }

  /** Grok scan: `spark.read.text` + ONE regex execution per row — the
    * codegen'd `graft_capture_groups` expression matches once and
    * returns every field (built-in `regexp_extract` would re-match per
    * field: k+1 executions/row for a k-field layout — the difference
    * on a 100 TB log scan). Non-matching lines are dropped (logstash
    * `_grokparsefailure` semantics); unmatched optional groups are
    * NULL. No shuffle; embarrassingly parallel over file splits.
    */
  def readGrok(
      spark: SparkSession, pattern: String,
      files: Seq[String]): DataFrame = {
    val c = Grok.compile(pattern)
    require(c.fields.nonEmpty, "grok layout declares no fields")
    val anchored = "^" + c.regex
    val groups = graft.functions.RegexFns.captureGroups(
      spark, col("value"), anchored)
    val cols: Seq[Column] = c.fields.zipWithIndex.map { case (f, i) =>
      element_at(col("__g"), i + 1).as(f)
    }
    spark.read.text(files: _*)
      .select(groups.as("__g"))
      .where(col("__g").isNotNull)
      .select(cols: _*)
  }

  /** Expand source paths: directories are listed (non-recursive) and
    * filtered by `fileLayout` when present — the reference's
    * `file_layout` grok filename matching (source.go, file_layout).
    */
  def resolveFiles(
      paths: Seq[String], fileLayout: Option[String]): Seq[String] = {
    val all = paths.flatMap { p =>
      val f = new java.io.File(p)
      if (f.isDirectory) {
        // listFiles contracts to null on an unreadable/vanished dir —
        // name the path instead of NPE-ing
        val listed = f.listFiles()
        require(listed != null, s"cannot list source directory '$p'")
        listed.toSeq.filter(_.isFile).map(_.getPath)
      } else Seq(p)
    }
    fileLayout match {
      case None => all.sorted
      case Some(layout) =>
        // layout may be a plain file name (delimited fixtures) or a
        // grok pattern (plugin-%{YEAR:year}-….log)
        all.filter { p =>
          val name = new java.io.File(p).getName
          name == layout || Grok.matchesLayout(layout, name)
        }.sorted
    }
  }
}
