package graft.config

import java.io.{File, PrintWriter}
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, TimeUnit}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Live-reload semantics of the config watcher: a change to a *.tpc
  * file re-decodes the merged config; a file that fails to parse
  * reports an error and KEEPS the previous config (reference
  * connection_watcher.go:40-43 logs and continues). Pure JVM — no
  * SparkSession.
  */
class ConfigWatcherSpec extends AnyFunSuite {

  private def write(f: File, text: String): Unit = {
    val w = new PrintWriter(f)
    try w.print(text) finally w.close()
  }

  /** Poll until `cond` or ~10 s — inotify delivery is prompt but async. */
  private def eventually(cond: => Boolean, what: String): Unit = {
    val deadline = System.nanoTime + TimeUnit.SECONDS.toNanos(10)
    while (!cond && System.nanoTime < deadline) Thread.sleep(50)
    assert(cond, s"timed out waiting for $what")
  }

  test("reload on change; parse failure keeps previous config") {
    val dir = Files.createTempDirectory("graft_watch").toFile
    write(new File(dir, "a.tpc"), """format "delimited" "f1" { }""")
    val reloads = new ConcurrentLinkedQueue[Hcl.Config]()
    val errors = new ConcurrentLinkedQueue[String]()
    val w = new ConfigWatcher(dir.toPath, reloads.add(_), errors.add(_))
    try {
      // a new config file triggers a reload containing both formats
      write(new File(dir, "b.tpc"), """format "delimited" "f2" { }""")
      eventually(reloads.asScala.exists(
        _.formats.keySet == Set("delimited.f1", "delimited.f2")),
        "reload with both formats")
      // non-config files are ignored
      val before = reloads.size()
      write(new File(dir, "notes.txt"), "not config")
      Thread.sleep(500)
      assert(reloads.size() == before, "reloaded on a non-config file")
      // a broken file reports an error instead of a config
      write(new File(dir, "b.tpc"), """format "delimited" {""")
      eventually(!errors.isEmpty, "parse-error report")
      assert(errors.peek().nonEmpty)
    } finally w.close()
  }

  test("watcher on a missing directory is a no-op; close is idempotent") {
    val w = new ConfigWatcher(
      new File("/nonexistent_graft_dir").toPath, _ => (), _ => ())
    w.close(); w.close()
  }

}
