package graft.query

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.PartitionSpec
import graft.ingest.Ingest
import graft.lake.Lake

class MetaquerySpec extends AnyFunSuite with SparkTest {

  private lazy val lake: Lake = {
    val root = Files.createTempDirectory("graft_meta").toString
    val l = Lake(s"$root/lake")
    import spark.implicits._
    val src = Seq(
      (1L, "2024-03-01 10:00:00", "eu", 3.5),
      (2L, "2024-03-02 11:00:00", "us", 1.25))
      .toDF("id", "ts", "region", "score")
    Ingest.collectBatch(spark, l,
      PartitionSpec("metrics", "p0", tpIndexColumn = Some("region")),
      src, timestampColumn = "ts")
    l
  }

  test(".inspect lists lake tables") {
    val out = Metaquery.inspectTables(spark, lake)
    assert(out.contains("| Table "))
    assert(out.contains("| metrics "))
    assert(out.contains("| core "))
  }

  test(".inspect <table> sorts tp_ columns last, engine type names") {
    val out = Metaquery.inspectSchema(spark, lake, "metrics")
    val lines = out.linesIterator.filter(_.startsWith("|")).toSeq.tail
    val cols = lines.map(_.split("\\|")(1).trim)
    assert(cols.takeWhile(!_.startsWith("tp_")) == cols.filterNot(_.startsWith("tp_")),
      s"tp_ columns must come last, got: $cols")
    assert(out.contains("| score ") && out.contains("| double "))
    assert(out.contains("| tp_timestamp ") && out.contains("| timestamp "))
  }

  test(".inspect unknown table errors like the reference") {
    val e = intercept[IllegalArgumentException](
      Metaquery.inspectSchema(spark, lake, "nope"))
    assert(e.getMessage.contains("could not find a view named 'nope'"))
  }

  test("describe resolves column defs without executing") {
    import spark.implicits._
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("t_desc")
    val defs = Metaquery.describe(spark,
      "select a + 1 as a2, upper(b) as ub, count(*) over () as n from t_desc;")
    assert(defs == Seq("a2" -> "integer", "ub" -> "varchar", "n" -> "bigint"))
  }

  test("state commands mutate QueryState") {
    val st = Metaquery.QueryState()
    Metaquery.handle(spark, lake, st, ".output csv")
    Metaquery.handle(spark, lake, st, ".header off")
    Metaquery.handle(spark, lake, st, ".separator ;")
    Metaquery.handle(spark, lake, st, ".multi on")
    assert(st.output == "csv" && !st.header && st.separator == ";" && st.multi)
    Metaquery.handle(spark, lake, st, ".exit")
    assert(st.done)
    intercept[IllegalArgumentException](
      Metaquery.handle(spark, lake, st, ".output xml"))
    intercept[IllegalArgumentException](
      Metaquery.handle(spark, lake, st, ".bogus"))
  }

  test(".explain prints the physical plan; clean queries get no warnings") {
    Views.register(spark, lake, Views.Filters())
    val st = Metaquery.QueryState()
    val out = Metaquery.handle(spark, lake, st,
      ".explain select region, count(*) from metrics group by region")
    assert(out.contains("HashAggregate"), out)
    assert(!out.contains("WARNING"), out)
  }

  test(".explain flags cartesian joins and single-partition windows") {
    Views.register(spark, lake, Views.Filters())
    val st = Metaquery.QueryState()
    val cart = Metaquery.handle(spark, lake, st,
      ".explain select * from metrics a, metrics b where a.score < b.score")
    // plans CartesianProduct or BroadcastNestedLoopJoin depending on
    // size estimates — both are per-row-pair shapes and both warn
    assert(cart.contains("WARNING") && cart.contains("row pair"), cart)
    val win = Metaquery.handle(spark, lake, st,
      ".explain select id, row_number() over (order by id) rn from metrics")
    assert(win.contains("WARNING") && win.contains("PARTITION BY"), win)
    // the empty statement errors loudly
    intercept[IllegalArgumentException](
      Metaquery.handle(spark, lake, st, ".explain"))
  }
}
