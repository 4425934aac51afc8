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

  test("duplicate blocks within a file are config errors") {
    // partition_tests.bats:30-55: "partition X already exists for
    // table Y"
    val e = intercept[IllegalArgumentException] {
      Hcl.decode(
        """partition "t" "p1" { }
          |partition "t" "p1" { }
          |""".stripMargin)
    }
    assert(e.getMessage == "partition p1 already exists for table t")
    val e2 = intercept[IllegalArgumentException] {
      Hcl.decode(
        """format "delimited" "f" { }
          |format "delimited" "f" { }
          |""".stripMargin)
    }
    assert(e2.getMessage == "format delimited.f already exists")
    val e3 = intercept[IllegalArgumentException] {
      Hcl.decode("table \"x\" { }\ntable \"x\" { }\n")
    }
    assert(e3.getMessage == "table x already exists")
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

  test("connection blocks decode with typed s3 vocabulary and refs") {
    val cfg = Hcl.decode(
      """connection "s3" "prod" {
        |  access_key = "AKIAXXXX"
        |  secret_key = "shhh"
        |  endpoint = "https://minio.local:9000"
        |  path_style = true
        |}
        |
        |table "t" { column "tp_timestamp" { source = "ts" } }
        |
        |partition "t" "p" {
        |  source "file" {
        |    connection = connection.s3.prod
        |    paths = ["s3a://bucket/logs/"]
        |  }
        |}
        |""".stripMargin)
    val conn = cfg.connections("s3.prod")
    assert(conn.kind == "s3" && conn.name == "prod")
    assert(conn.props("path_style") == "true")
    assert(cfg.partitions("t.p").source.get.connection
      .contains("connection.s3.prod"))
    val entries = Connections.hadoopEntries(conn).toMap
    assert(entries("fs.s3a.access.key") == "AKIAXXXX")
    assert(entries("fs.s3a.secret.key") == "shhh")
    assert(entries("fs.s3a.endpoint") == "https://minio.local:9000")
    assert(entries("fs.s3a.path.style.access") == "true")
  }

  test("s3 connection with bucket scopes keys per-bucket") {
    val conn = ConnectionSpec("s3", "scoped",
      Map("access_key" -> "AK", "bucket" -> "my-logs"))
    assert(Connections.hadoopEntries(conn).toMap ==
      Map("fs.s3a.bucket.my-logs.access.key" -> "AK"))
  }

  test("anonymous s3 maps to the anonymous credentials provider") {
    val conn = ConnectionSpec("s3", "anon", Map("anonymous" -> "true"))
    assert(Connections.hadoopEntries(conn).head ==
      ("fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"))
  }

  test("unknown s3 property is a load-time error (typo safety)") {
    val e = intercept[IllegalArgumentException](Hcl.decode(
      """connection "s3" "typo" { secret_ky = "oops" }"""))
    assert(e.getMessage.contains("unknown s3 property 'secret_ky'"), e.getMessage)
  }

  test("dotted attribute names: hadoop.* passthrough for any type") {
    val cfg = Hcl.decode(
      """connection "gcs" "lake" {
        |  hadoop.fs.gs.project.id = "my-project"
        |  hadoop.fs.gs.auth.type = "SERVICE_ACCOUNT_JSON_KEYFILE"
        |}
        |""".stripMargin)
    val entries = Connections.hadoopEntries(cfg.connections("gcs.lake")).toMap
    assert(entries("fs.gs.project.id") == "my-project")
    assert(entries("fs.gs.auth.type") == "SERVICE_ACCOUNT_JSON_KEYFILE")
  }

  test("non-s3 connection rejects typed properties with a hint") {
    val e = intercept[IllegalArgumentException](Hcl.decode(
      """connection "gcs" "bad" { access_key = "nope" }"""))
    assert(e.getMessage.contains("hadoop.<key> passthrough"), e.getMessage)
  }

  test("connection requires two labels") {
    val e = intercept[IllegalArgumentException](
      Hcl.decode("""connection "s3" { }"""))
    assert(e.getMessage.contains("2 labels"), e.getMessage)
  }

  test("stats_columns decodes: explicit list, explicit empty opt-out, " +
      "absent = None (collect-time default)") {
    val cfg = Hcl.decode(
      """table "a" { stats_columns = ["v", "src"] }
        |table "b" { stats_columns = [] }
        |table "c" { }
        |""".stripMargin)
    assert(cfg.tables("a").statsColumns.contains(Seq("v", "src")))
    assert(cfg.tables("b").statsColumns.contains(Seq.empty))
    assert(cfg.tables("c").statsColumns.isEmpty)
  }

  test("malformed input fails with a parse error, not silently") {
    intercept[IllegalArgumentException](Hcl.parse("""table "t" {"""))
    intercept[IllegalArgumentException](Hcl.parse("""table { a = }"""))
    intercept[IllegalArgumentException](
      Hcl.decode("""partition "only_one_label" { }"""))
  }

  test("rollup blocks decode; invalid functions/keys fail at load") {
    val cfg = Hcl.decode(
      """rollup "access_log" "status_daily" {
        |  group_by = ["tp_date", "status_code"]
        |  aggregate "n" { function = "count" }
        |  aggregate "max_ts" {
        |    function = "max"
        |    column = "tp_timestamp"
        |  }
        |}
        |""".stripMargin)
    val r = cfg.rollups("access_log.status_daily")
    assert(r.groupBy == Seq("tp_date", "status_code"))
    assert(r.aggs.map(a => (a.name, a.function)) ==
      Seq(("n", "count"), ("max_ts", "max")))
    assert(r.viewName == "access_log_rollup_status_daily")
    // median (r17: mergeable KLL sketch aggregate) decodes
    val med = Hcl.decode(
      """rollup "t" "m" {
        |  group_by = ["k"]
        |  aggregate "vmed" {
        |    function = "median"
        |    column = "v"
        |  }
        |}""".stripMargin).rollups("t.m")
    assert(med.aggs.map(a => (a.name, a.function)) ==
      Seq(("vmed", "median")))
    // avg (r18: mergeable sum+count pair) decodes
    val av = Hcl.decode(
      """rollup "t" "a" {
        |  group_by = ["k"]
        |  aggregate "vavg" {
        |    function = "avg"
        |    column = "v"
        |  }
        |}""".stripMargin).rollups("t.a")
    assert(av.aggs.map(a => (a.name, a.function)) ==
      Seq(("vavg", "avg")))
    // unknown function
    val e1 = intercept[IllegalArgumentException](Hcl.decode(
      """rollup "t" "r" {
        |  group_by = ["k"]
        |  aggregate "m" {
        |    function = "mode"
        |    column = "v"
        |  }
        |}""".stripMargin))
    assert(e1.getMessage.contains("unknown function"))
    // non-count aggregates need a column
    val e2 = intercept[IllegalArgumentException](Hcl.decode(
      """rollup "t" "r" {
        |  group_by = ["k"]
        |  aggregate "s" { function = "sum" }
        |}""".stripMargin))
    assert(e2.getMessage.contains("requires column"))
    // tp_year/tp_month are implicit — declaring them is an error
    val e3 = intercept[IllegalArgumentException](Hcl.decode(
      """rollup "t" "r" {
        |  group_by = ["tp_year"]
        |  aggregate "n" { function = "count" }
        |}""".stripMargin))
    assert(e3.getMessage.contains("implicit"))
    // empty group_by / no aggregates / duplicate names
    intercept[IllegalArgumentException](Hcl.decode(
      """rollup "t" "r" { aggregate "n" { function = "count" } }"""))
    intercept[IllegalArgumentException](Hcl.decode(
      """rollup "t" "r" { group_by = ["k"] }"""))
    val e4 = intercept[IllegalArgumentException](Hcl.decode(
      """rollup "t" "r" {
        |  group_by = ["k"]
        |  aggregate "k" { function = "count" }
        |}""".stripMargin))
    assert(e4.getMessage.contains("duplicate output column"))
  }
}
