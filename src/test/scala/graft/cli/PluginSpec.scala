package graft.cli

import java.io.{ByteArrayOutputStream, File, PrintStream, PrintWriter}
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.{FormatSpec, SourceSpec}
import graft.ingest.{SourceAdapter, SourceRegistry}
import graft.plugin.Plugins

/** Fixture adapter loaded through the plugin `adapter_class` path. */
object DemoPluginAdapter extends SourceAdapter {
  val kind = "demo"
  val version = "0.1.5"
  val description = "Demo plugin source"
  def read(
      spark: SparkSession, source: SourceSpec, format: Option[FormatSpec],
      from: Option[Timestamp], to: Option[Timestamp],
      progress: String => Unit): DataFrame =
    spark.range(3).toDF("n")
}

/** Plugin lifecycle against a local versioned registry — the
  * reference's install→list→show→update→uninstall flow
  * (cmd/plugin.go:76-238) with digest verification
  * (internal/ociinstaller semantics).
  */
class PluginSpec extends AnyFunSuite with SparkTest
    with org.scalatest.BeforeAndAfterAll {

  // suites share one JVM-global SourceRegistry: snapshot it and restore
  // on exit so suite order never leaks a plugin adapter (e.g. "demo")
  // into other specs
  private var preexisting: Set[String] = Set.empty

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    preexisting = SourceRegistry.list.map(_.kind).toSet
  }

  override protected def afterAll(): Unit = {
    try SourceRegistry.list.map(_.kind)
      .filterNot(preexisting).foreach(SourceRegistry.unregister)
    finally super.afterAll()
  }

  private def write(f: File, text: String): Unit = {
    f.getParentFile.mkdirs()
    val w = new PrintWriter(f)
    try w.print(text) finally w.close()
  }

  private def cli(root: File, args: String*): (Int, String) = {
    val bos = new ByteArrayOutputStream()
    val rc = Main.run(spark,
      args.toSeq ++ Seq(
        "--lake-dir", s"${root.getPath}/lake",
        "--config-dir", s"${root.getPath}/config"),
      new PrintStream(bos, true, "UTF-8"))
    (rc, new String(bos.toByteArray, "UTF-8").trim)
  }

  /** Registry entry: payload + descriptor with its true sha256. */
  private def publish(
      registry: File, org: String, name: String, version: String,
      description: String = "Demo plugin source",
      adapterClass: Option[String] = None,
      corruptDigest: Boolean = false): Unit = {
    val dir = new File(registry, s"$org/$name/$version")
    val payload = new File(dir, "plugin.bin")
    write(payload, s"payload of $org/$name@$version")
    val digest =
      if (corruptDigest) "0" * 64 else Plugins.sha256Hex(payload)
    val cls = adapterClass.map(c => s""", "adapter_class": "$c"""").getOrElse("")
    write(new File(dir, "plugin.json"),
      s"""{"org": "$org", "name": "$name", "version": "$version",
         | "description": "$description",
         | "tables": ["${name}_log"], "sha256": "$digest"$cls}""".stripMargin)
  }

  private lazy val root: File = {
    val dir = Files.createTempDirectory("graft_plugin").toFile
    new File(dir, "config").mkdirs()
    dir
  }
  private lazy val registry = new File(root, "config/registry")

  test("install resolves a version constraint and digest-verifies") {
    publish(registry, "graft", "demo", "0.1.0")
    publish(registry, "graft", "demo", "0.1.5",
      adapterClass = Some("graft.cli.DemoPluginAdapter"))
    val (rc, msg) = cli(root, "plugin", "install", "demo@0.1")
    assert(rc == 0, msg)
    assert(msg == "Installed graft/demo@0.1.5")
    // artifact + version file landed
    assert(new File(root, "config/plugins/graft/demo/plugin.bin").isFile)
    assert(Plugins.installedList(s"${root.getPath}/config") ==
      Seq(Plugins.Installed("graft", "demo", "0.1.5", "0.1")))
  }

  test("installed plugin appears in list and show; adapter_class joins the SPI registry") {
    val (_, list) = cli(root, "plugin", "list")
    assert(list.contains("graft/demo") && list.contains("0.1.5"), list)
    val (_, show) = cli(root, "plugin", "show", "demo")
    assert(show.contains("demo_log") && show.contains("0.1.5"), show)
    // the CLI invocation above ran registerInstalled → adapter is live
    assert(SourceRegistry.get("demo").exists(_.version == "0.1.5"))
    val (_, sources) = cli(root, "source", "list")
    assert(sources.contains("demo"), sources)
  }

  test("update is a no-op within the recorded constraint, upgrades when it satisfies") {
    // 0.2.0 exists but the recorded constraint is 0.1 — no upgrade
    publish(registry, "graft", "demo", "0.2.0")
    val (_, same) = cli(root, "plugin", "update", "demo")
    assert(same == "Plugin graft/demo is up to date (0.1.5)")
    // reinstall on the latest stream, then a newer publish updates
    cli(root, "plugin", "install", "demo")
    publish(registry, "graft", "demo", "0.3.0")
    val (_, upd) = cli(root, "plugin", "update", "--all")
    assert(upd == "Updated graft/demo 0.2.0 -> 0.3.0")
  }

  test("checksum mismatch aborts the install") {
    publish(registry, "graft", "bad", "1.0.0", corruptDigest = true)
    val (rc, msg) = cli(root, "plugin", "install", "bad")
    assert(rc == 1)
    assert(msg.contains("checksum mismatch"), msg)
    assert(Plugins.installedList(s"${root.getPath}/config")
      .forall(_.name != "bad"))
  }

  test("uninstall removes artifact, version entry, and live adapter") {
    val (rc, msg) = cli(root, "plugin", "uninstall", "demo")
    assert(rc == 0, msg)
    assert(msg == "Uninstalled graft/demo@0.3.0")
    assert(!new File(root, "config/plugins/graft/demo").exists())
    assert(Plugins.installedList(s"${root.getPath}/config").isEmpty)
    val (_, list) = cli(root, "plugin", "list")
    assert(!list.contains("graft/demo"), list)
    val (rc2, _) = cli(root, "plugin", "uninstall", "demo")
    assert(rc2 == 1)
  }

  test("version resolution: numeric semver ordering, prefix and exact constraints") {
    val vs = Seq("0.9.0", "0.10.1", "0.10.2", "1.0.0", "1.2.0")
    def r(c: String) = Plugins.resolve(vs, c)
    assert(r("latest").contains("1.2.0"))
    assert(r("0.10").contains("0.10.2"))
    assert(r("^1").contains("1.2.0"))
    assert(r("0.9.0").contains("0.9.0"))
    assert(r("2").isEmpty)
  }

  test("ref parsing applies org and constraint defaults") {
    assert(Plugins.parseRef("aws") == Plugins.Ref("graft", "aws", "latest"))
    assert(Plugins.parseRef("acme/aws@0.1") == Plugins.Ref("acme", "aws", "0.1"))
    assert(Plugins.parseRef("hub.local/acme/aws@1.0.0") ==
      Plugins.Ref("acme", "aws", "1.0.0"))
  }
}
