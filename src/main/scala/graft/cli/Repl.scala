package graft.cli

import java.io.{BufferedReader, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.config.{ConfigWatcher, Hcl}
import graft.query.{Metaquery, Render, Views}

/** Interactive query shell (reference
  * /root/reference/internal/interactive/interactive_client.go:99-145,
  * query_history.go): prompt loop with
  *
  *  - dot-command metaqueries (`.inspect`, `.output`, …)
  *  - multiline accumulation — a SQL statement runs when it ends with
  *    `;` (always-on when `.multi on`)
  *  - persistent query history (JSON-lines file, newest last, capped)
  *  - table/keyword autocompletion candidates ([[complete]] — the data
  *    source for any line editor; plain stdin has no keybindings)
  *  - mid-query cancellation: queries run in a job group and
  *    [[cancel]] aborts the running group
  *    (`interactive_client.go:528-549` ↔ `cancelJobGroup`)
  *  - live config reload: when `configDir` is given, a
  *    [[graft.config.ConfigWatcher]] re-decodes the workspace on every
  *    `*.tpc`/`*.hcl` edit, so `.inspect` sees partitions added
  *    mid-session (reference connection_watcher.go:1-62).
  *
  * The loop reads from an injected `BufferedReader` and writes to a
  * `PrintStream`, so tests drive a full session in-process.
  */
final class Repl(
    spark: SparkSession,
    lake: graft.lake.Lake,
    config: Hcl.Config,
    in: BufferedReader,
    out: PrintStream,
    historyPath: Option[Path] = Repl.defaultHistoryPath,
    filters: Views.Filters = Views.Filters(),
    configDir: Option[Path] = None) {

  val state = new Metaquery.QueryState()
  private val history = scala.collection.mutable.ArrayBuffer.empty[String]
  private val jobGroup = s"graft-repl-${System.identityHashCode(this)}"
  @volatile private var currentConfig: Hcl.Config = config
  private val watcher: Option[ConfigWatcher] = configDir.map(d =>
    new ConfigWatcher(d, reload _, m => out.println(s"Warning: $m")))

  loadHistory()

  /** Swap in a freshly decoded config (called by the watcher thread;
    * also directly usable by an embedding application).
    */
  def reload(c: Hcl.Config): Unit = currentConfig = c

  /** Completion candidates for a prefix: dot-commands, lake tables,
    * and common SQL keywords (interactive_client.go autocomplete;
    * candidates from the catalog like `spark.catalog.listTables`).
    */
  def complete(prefix: String): Seq[String] = {
    val p = prefix.toLowerCase
    val dots = Seq(".autocomplete", ".clear", ".exit", ".explain",
      ".header", ".help", ".inspect", ".multi", ".output", ".quit",
      ".separator")
    val keywords = Seq("select", "from", "where", "group by", "order by",
      "limit", "join", "left join", "inner join", "union", "with",
      "having", "distinct", "count", "sum", "min", "max", "avg")
    val tables = lake.listTables(spark)
    (dots ++ tables ++ keywords).filter(_.toLowerCase.startsWith(p)).sorted
  }

  def historyEntries: Seq[String] = history.toSeq

  /** ANSI-highlighted rendering of a buffer line ([[Highlighter]]) —
    * like [[complete]], the data source for a terminal line editor
    * (reference highlighter.go runs per keystroke on the document).
    */
  def highlight(line: String): String = Highlighter.highlight(line)

  /** Cancel the currently running query (if any). Safe to call from
    * another thread — e.g. a SIGINT handler.
    */
  def cancel(): Unit =
    spark.sparkContext.cancelJobGroup(jobGroup)

  /** Run the session to EOF or `.exit`. */
  def loop(): Unit = {
    Views.register(spark, lake, filters, config.rollups.values.toSeq)
    val buf = new StringBuilder
    var line = prompt(buf.nonEmpty)
    while (line != null && !state.done) {
      val trimmed = line.trim
      if (buf.isEmpty && Metaquery.isMetaquery(trimmed)) {
        try {
          val res = Metaquery.handle(spark, lake, state, trimmed,
            currentConfig)
          if (res.nonEmpty) out.println(res)
        } catch {
          case e: Exception => out.println(s"Error: ${e.getMessage}")
        }
        record(trimmed)
      } else if (trimmed.nonEmpty) {
        buf.append(line).append('\n')
        val complete = trimmed.endsWith(";") ||
          (!state.multi && buf.toString.trim.endsWith(";"))
        if (complete || !state.multi) {
          val sql = buf.toString.trim.stripSuffix(";")
          buf.clear()
          if (sql.nonEmpty) {
            // `select 1; select 2` runs as two statements, matching
            // batch mode (Main.splitStatements is quote-aware)
            Main.splitStatements(sql).foreach(execute)
            record(sql)
          }
        }
      }
      line = if (state.done) null else prompt(buf.nonEmpty)
    }
    watcher.foreach(_.close())
    saveHistory()
  }

  private def prompt(continuation: Boolean): String = {
    out.print(if (continuation) "  ... " else "graft> ")
    out.flush()
    in.readLine()
  }

  private def execute(sql: String): Unit =
    try {
      spark.sparkContext.setJobGroup(jobGroup, sql.take(120),
        interruptOnCancel = true)
      try {
        val df = spark.sql(sql)
        state.output match {
          case "csv"  => Render.csvTo(out, df, state.header, state.separator)
            out.println()
          case "json" => Render.jsonTo(out, df); out.println()
          case "line" => Render.lineTo(out, df); out.println()
          case _      => out.println(Render.table(df))
        }
      } finally spark.sparkContext.clearJobGroup()
    } catch {
      case e: Exception =>
        out.println(s"Error: ${Option(e.getMessage).getOrElse(e.toString)
          .linesIterator.take(3).mkString(" ")}")
    }

  private def record(entry: String): Unit = {
    if (entry == ".exit" || entry == ".quit") return
    history -= entry // de-dup: move repeats to the end
    history += entry
    while (history.length > Repl.MaxHistory) history.remove(0)
  }

  private def loadHistory(): Unit =
    historyPath.filter(Files.exists(_)).foreach { p =>
      history ++= Files.readAllLines(p, StandardCharsets.UTF_8).asScala
        .takeRight(Repl.MaxHistory)
    }

  private def saveHistory(): Unit =
    historyPath.foreach { p =>
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.write(p, history.asJava, StandardCharsets.UTF_8)
    }
}

object Repl {
  val MaxHistory = 500

  def defaultHistoryPath: Option[Path] =
    sys.props.get("user.home").map(h => Paths.get(h, ".graft_history"))
}
