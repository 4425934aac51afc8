package graft.cli

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.{Hcl, PartitionSpec}
import graft.ingest.Ingest
import graft.lake.Lake

class ReplSpec extends AnyFunSuite with SparkTest {

  private lazy val lake: Lake = {
    val root = Files.createTempDirectory("graft_repl").toString
    val l = Lake(s"$root/lake")
    import spark.implicits._
    Ingest.collectBatch(spark, l,
      PartitionSpec("metrics", "p0", tpIndexColumn = Some("region")),
      Seq((1L, "2024-03-01 10:00:00", "eu", 2.5),
        (2L, "2024-03-02 11:00:00", "us", 4.0))
        .toDF("id", "ts", "region", "score"),
      timestampColumn = "ts")
    l
  }

  private val emptyConfig = Hcl.Config(Map.empty, Map.empty, Map.empty)

  private def session(
      input: String,
      history: Option[java.nio.file.Path] = None): (Repl, String) = {
    val bos = new ByteArrayOutputStream()
    val repl = new Repl(spark, lake, emptyConfig,
      new BufferedReader(new StringReader(input)),
      new PrintStream(bos, true, "UTF-8"), historyPath = history)
    repl.loop()
    (repl, new String(bos.toByteArray, "UTF-8"))
  }

  test("runs SQL, honors .output csv, exits on .exit") {
    val (_, out) = session(
      """.output csv
        |select id, region from metrics order by id;
        |.exit
        |""".stripMargin)
    assert(out.contains("id,region\n1,eu\n2,us"))
  }

  test("multiline statements accumulate until the terminating semicolon") {
    val (_, out) = session(
      """.output csv
        |.multi on
        |select count(*) as n
        |from metrics
        |where score > 3;
        |.exit
        |""".stripMargin)
    assert(out.contains("n\n1"))
    assert(out.contains("  ... ")) // continuation prompt shown
  }

  test("errors are printed, loop continues") {
    val (_, out) = session(
      """select * from missing_table;
        |.output csv
        |select 1 as ok;
        |.exit
        |""".stripMargin)
    assert(out.contains("Error:"))
    assert(out.contains("ok\n1"))
  }

  test("completion candidates cover dot-commands, tables, keywords") {
    val (repl, _) = session(".exit\n")
    assert(repl.complete(".ou") == Seq(".output"))
    assert(repl.complete("metr") == Seq("metrics"))
    assert(repl.complete("sel") == Seq("select"))
  }

  test("history persists across sessions, deduped and ordered") {
    val h = Files.createTempDirectory("graft_hist").resolve("history")
    session(".output csv\nselect 1 as a;\nselect 2 as b;\n.exit\n", Some(h))
    val (repl2, _) = session("select 1 as a;\n.exit\n", Some(h))
    // 'select 1 as a' moved to the end, not duplicated
    assert(repl2.historyEntries.count(_ == "select 1 as a") == 1)
    assert(repl2.historyEntries.last == "select 1 as a")
    assert(repl2.historyEntries.contains(".output csv"))
  }

  test("cancel() is safe while idle and aborts the job group") {
    val (repl, _) = session(".exit\n")
    repl.cancel() // must not throw
  }
}
