package graft.ingest

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.FormatSpec

class FormatsSpec extends AnyFunSuite with SparkTest {

  private def tmpFile(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_fmt").toFile
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f)
    try lines.foreach(w.println) finally w.close()
    f.getPath
  }

  test("grok compile: field order maps to capture groups") {
    val c = Grok.compile(
      """%{TIMESTAMP_ISO8601:timestamp} \[%{LOGLEVEL:severity}\] %{GREEDYDATA:message}""")
    assert(c.fields == Seq("timestamp", "severity", "message"))
    val m = ("^" + c.regex).r.findFirstMatchIn(
      "2024-05-01T10:30:45Z [INFO] RequestID: req-1234, Service: s3")
    assert(m.isDefined)
    assert(m.get.group(1) == "2024-05-01T10:30:45Z")
    assert(m.get.group(2) == "INFO")
    assert(m.get.group(3) == "RequestID: req-1234, Service: s3")
  }

  test("grok compile: optional non-capturing sections (reference layout)") {
    // the shape of the core_formats.bats steampipe layout: an optional
    // plugin prefix before the message
    val c = Grok.compile(
      """%{TIMESTAMP_ISO8601:timestamp} %{WORD:timezone} \[%{LOGLEVEL:severity}\]\s+(?:%{NOTSPACE:plugin_name}: \[%{LOGLEVEL:plugin_severity}\]\s+%{NUMBER:plugin_timestamp}:\s+)?%{GREEDYDATA:message}""")
    assert(c.fields == Seq("timestamp", "timezone", "severity",
      "plugin_name", "plugin_severity", "plugin_timestamp", "message"))
    val re = ("^" + c.regex).r
    val withPlugin = re.findFirstMatchIn(
      "2025-04-28 15:16:35.733 UTC [DEBUG] my-plugin.x: [DEBUG] 1744125262935: retrying request, attempt 8")
    assert(withPlugin.get.group(4) == "my-plugin.x:".stripSuffix(":"))
    assert(withPlugin.get.group(6) == "1744125262935")
    val noPlugin = re.findFirstMatchIn(
      "2025-04-28 15:16:35.733 UTC [INFO]  plain message here")
    assert(noPlugin.isDefined && noPlugin.get.group(4) == null)
  }

  test("grok rejects unknown patterns and duplicate fields") {
    intercept[IllegalArgumentException](Grok.compile("%{NOPE:x}"))
    intercept[IllegalArgumentException](Grok.compile("%{WORD:x} %{WORD:x}"))
  }

  test("file_layout grok matching selects dated files") {
    val layout = """plugin-%{YEAR:year}-%{MONTHNUM:month}-%{MONTHDAY:day}\.log"""
    assert(Grok.matchesLayout(layout, "plugin-2025-05-01.log"))
    assert(!Grok.matchesLayout(layout, "plugin-2025-05-01.log.bak"))
    assert(!Grok.matchesLayout(layout, "other-2025-05-01.log"))
  }

  test("readGrok extracts typed-ready columns, drops garbage lines") {
    val p = tmpFile("app.log", Seq(
      "2024-05-01T10:30:45Z [INFO] svc=s3 dur=150",
      "not a log line at all",
      "2024-05-01T10:31:00Z [ERROR] svc=ec2 dur=45"))
    val df = Formats.readGrok(spark,
      """%{TIMESTAMP_ISO8601:ts} \[%{LOGLEVEL:level}\] svc=%{WORD:svc} dur=%{INT:dur}""",
      Seq(p))
    val rows = df.orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "INFO" && rows(0).getString(2) == "s3")
    assert(rows(1).getString(3) == "45")
  }

  test("readGrok: optional groups come back NULL when absent") {
    val p = tmpFile("opt.log", Seq(
      "2024-05-01T10:30:45Z [INFO] plugin-x: starting",
      "2024-05-01T10:31:00Z [WARN] no plugin prefix here"))
    val df = Formats.readGrok(spark,
      """%{TIMESTAMP_ISO8601:ts} \[%{LOGLEVEL:level}\] (?:%{NOTSPACE:plugin}: )?%{GREEDYDATA:msg}""",
      Seq(p))
    val rows = df.orderBy("ts").collect()
    assert(rows(0).getString(2) == "plugin-x" && rows(0).getString(3) == "starting")
    assert(rows(1).isNullAt(2) && rows(1).getString(3) == "no plugin prefix here")
  }

  test("delimited read honors header and delimiter") {
    val p = tmpFile("metrics.psv", Seq(
      "name|value|ok",
      "alpha|3|true",
      "beta|7|false"))
    val df = Formats.read(spark,
      FormatSpec("delimited", "psv", delimiter = "|", header = true), Seq(p))
    assert(df.columns.toSeq == Seq("name", "value", "ok"))
    assert(df.count() == 2)
    assert(df.where(org.apache.spark.sql.functions.col("ok")).count() == 1)
  }

  test("resolveFiles lists directories and applies file_layout") {
    val dir = Files.createTempDirectory("graft_layout").toFile
    Seq("plugin-2025-05-01.log", "plugin-2025-05-02.log", "notes.txt")
      .foreach { n =>
        val w = new java.io.PrintWriter(new java.io.File(dir, n))
        try w.println("x") finally w.close()
      }
    val picked = Formats.resolveFiles(Seq(dir.getPath),
      Some("""plugin-%{YEAR:y}-%{MONTHNUM:m}-%{MONTHDAY:d}\.log"""))
    assert(picked.map(new java.io.File(_).getName) ==
      Seq("plugin-2025-05-01.log", "plugin-2025-05-02.log"))
  }
}
