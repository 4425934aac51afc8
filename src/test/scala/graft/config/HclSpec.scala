package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Parses the same HCL shapes the reference's acceptance fixtures use
  * (tests/acceptance/test_files/table_block.bats:26-48,
  * core_formats.bats:1-50).
  */
class HclSpec extends AnyFunSuite {

  val delimitedFixture: String =
    """format "delimited" "access_log" {
      |  delimiter = ","
      |  header = true
      |}
      |
      |table "access_log" {
      |  format = format.delimited.access_log
      |
      |  column "tp_timestamp" {
      |    source = "timestamp"
      |  }
      |
      |  column "ip_address" {
      |    type = "varchar"
      |  }
      |
      |  column "status_code" {
      |    type = "integer"
      |  }
      |}
      |
      |partition "access_log" "local" {
      |  source "file" {
      |    format = format.delimited.access_log
      |    paths = ["/data/custom_logs/"]
      |    file_layout = "access_log.csv"
      |  }
      |}
      |""".stripMargin

  test("decodes the delimited-format acceptance fixture") {
    val cfg = Hcl.decode(delimitedFixture)
    val f = cfg.formats("delimited.access_log")
    assert(f.kind == "delimited" && f.delimiter == "," && f.header)

    val t = cfg.tables("access_log")
    assert(t.format.contains("format.delimited.access_log"))
    assert(t.column("tp_timestamp").get.source.contains("timestamp"))
    assert(t.column("status_code").get.typeName.contains("integer"))

    val p = cfg.partitions("access_log.local")
    assert(p.table == "access_log" && p.name == "local")
    val s = p.source.get
    assert(s.kind == "file")
    assert(s.paths == Seq("/data/custom_logs/"))
    assert(s.fileLayout.contains("access_log.csv"))
  }

  test("decodes a grok format with backtick raw layout") {
    val cfg = Hcl.decode(
      """format "grok" "steampipe_plugin" {
        |  layout = `%{TIMESTAMP_ISO8601:timestamp} %{WORD:timezone} \[%{LOGLEVEL:severity}\]\s+%{GREEDYDATA:message}`
        |}
        |partition "steampipe_plugin" "local" {
        |  source "file" {
        |    format = format.grok.steampipe_plugin
        |    paths = ["/logs/"]
        |    file_layout = `plugin-%{YEAR:year}-%{MONTHNUM:month}-%{MONTHDAY:day}.log`
        |  }
        |}
        |""".stripMargin)
    val f = cfg.formats("grok.steampipe_plugin")
    assert(f.pattern.get.startsWith("%{TIMESTAMP_ISO8601:timestamp}"))
    // raw string: backslashes survive unprocessed
    assert(f.pattern.get.contains("""\[%{LOGLEVEL:severity}\]"""))
    assert(cfg.partitions("steampipe_plugin.local").source.get
      .fileLayout.get.startsWith("plugin-%{YEAR"))
  }

  test("decodes transform columns with embedded SQL (table_block fixture)") {
    val cfg = Hcl.decode(
      """table "transform_test" {
        |  column "status_category" {
        |    type = "varchar"
        |    transform = "CASE WHEN status_code < 300 THEN 'success' ELSE 'other' END"
        |  }
        |  column "value_doubled" {
        |    type = "integer"
        |    transform = "raw_value * 2"
        |  }
        |}
        |""".stripMargin)
    val t = cfg.tables("transform_test")
    assert(t.column("status_category").get.transform.get.contains("CASE WHEN"))
    assert(t.column("value_doubled").get.transform.contains("raw_value * 2"))
  }

  test("partition-level filter and tp_index decode and validate") {
    val cfg = Hcl.decode(
      """partition "events" "errors" {
        |  filter = "status_code >= 500"
        |  tp_index = "region"
        |}
        |""".stripMargin)
    val p = cfg.partitions("events.errors")
    assert(p.filter.contains("status_code >= 500"))
    assert(p.tpIndexColumn.contains("region"))
  }

  test("comments, numbers, booleans, trailing commas parse") {
    val blocks = Hcl.parse(
      """# leading comment
        |format "delimited" "x" { // trailing comment
        |  /* block
        |     comment */
        |  header = false
        |  max_depth = 3
        |  names = ["a", "b",]
        |}
        |""".stripMargin)
    val b = blocks.head
    assert(b.bool("header").contains(false))
    assert(b.attrs("max_depth") == Hcl.HNumber(3))
    assert(b.strings("names").contains(Seq("a", "b")))
  }

  test("reference validation: optional non-tp column must declare a type") {
    val bad =
      """table "t" {
        |  column "plain" {
        |    source = "p"
        |  }
        |}
        |""".stripMargin
    val e = intercept[IllegalArgumentException](Hcl.decode(bad))
    assert(e.getMessage.contains("type must be specified"))
    // but required columns and tp_ columns may omit the type
    Hcl.decode(
      """table "t" {
        |  column "tp_timestamp" { source = "ts" }
        |  column "must_exist" { required = true }
        |}
        |""".stripMargin)
  }

  test("malformed input fails with a parse error, not silently") {
    intercept[IllegalArgumentException](Hcl.parse("""table "t" {"""))
    intercept[IllegalArgumentException](Hcl.parse("""table { a = }"""))
    intercept[IllegalArgumentException](
      Hcl.decode("""partition "only_one_label" { }"""))
  }
}
