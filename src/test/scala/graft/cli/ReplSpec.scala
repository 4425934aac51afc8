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

  test("highlight colors keywords, strings, numbers, comments, dot-cmds") {
    val esc = ""
    // goldens pin the exact ANSI layout the line editor would render
    assert(Highlighter.highlight("select 'a' from t -- hi") ==
      s"$esc[94mselect$esc[0m $esc[32m'a'$esc[0m $esc[94mfrom$esc[0m t " +
        s"$esc[90m-- hi$esc[0m")
    assert(Highlighter.highlight("where x = 42;") ==
      s"$esc[94mwhere$esc[0m x = $esc[36m42$esc[0m;")
    assert(Highlighter.highlight(".output csv") ==
      s"$esc[35m.output$esc[0m csv")
    // a keyword-named function call stays plain: left('ab', 1)
    assert(Highlighter.highlight("left('ab', 1)") ==
      s"left($esc[32m'ab'$esc[0m, $esc[36m1$esc[0m)")
    // escaped quote inside a SQL string stays inside the string token
    assert(Highlighter.highlight("select 'it''s'") ==
      s"$esc[94mselect$esc[0m $esc[32m'it''s'$esc[0m")
    // invariant: stripping colors recovers the buffer byte-for-byte
    val samples = Seq("select * from t where a like 'x%' -- c",
      ".inspect metrics", "with c as (select 1) select 2.5, \"q\" from c")
    samples.foreach(s =>
      assert(Highlighter.stripAnsi(Highlighter.highlight(s)) == s))
  }

  test("config watcher surfaces workspace edits mid-session in .inspect") {
    val cfgDir = Files.createTempDirectory("graft_cfg")
    Files.write(cfgDir.resolve("a.tpc"),
      """partition "aws_logs" "p0" {
        |  source "file" {
        |  }
        |}
        |""".stripMargin.getBytes("UTF-8"))

    val pipeOut = new java.io.PipedOutputStream()
    val reader = new BufferedReader(new java.io.InputStreamReader(
      new java.io.PipedInputStream(pipeOut), "UTF-8"))
    val bos = new ByteArrayOutputStream()
    val repl = new Repl(spark, lake,
      graft.config.ConfigLoader.loadDir(cfgDir.toString), reader,
      new PrintStream(bos, true, "UTF-8"), historyPath = None,
      configDir = Some(cfgDir))
    val t = new Thread(() => repl.loop())
    t.start()
    def send(s: String): Unit = {
      pipeOut.write((s + "\n").getBytes("UTF-8")); pipeOut.flush()
    }
    def outText = new String(bos.toByteArray, "UTF-8")

    send(".inspect")
    val d0 = System.currentTimeMillis() + 10000
    while (!outText.contains("aws_logs") && System.currentTimeMillis() < d0)
      Thread.sleep(50)
    assert(outText.contains("aws_logs"), "initial config partition missing")
    assert(!outText.contains("gcp_logs"))

    // edit the workspace mid-session: a new file declares a partition
    Files.write(cfgDir.resolve("b.tpc"),
      """partition "gcp_logs" "p0" {
        |  source "file" {
        |  }
        |}
        |""".stripMargin.getBytes("UTF-8"))
    // the watcher debounces; keep re-inspecting until the reload lands
    val d1 = System.currentTimeMillis() + 15000
    while (!outText.contains("gcp_logs") && System.currentTimeMillis() < d1) {
      send(".inspect")
      Thread.sleep(100)
    }
    assert(outText.contains("gcp_logs"),
      "watcher did not surface the new partition within 15s")
    send(".exit")
    t.join(10000)
    assert(!t.isAlive)
  }
}
