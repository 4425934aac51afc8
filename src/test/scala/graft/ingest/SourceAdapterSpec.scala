package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.{FormatSpec, SourceSpec}

class SourceAdapterSpec extends AnyFunSuite with SparkTest {

  test("registry lists built-in adapters, resolves by kind") {
    // containment, not equality: other suites may have registered
    // plugin adapters into the shared JVM-global registry
    val kinds = SourceRegistry.list.map(_.kind).toSet
    assert(Set("file", "synthetic").subsetOf(kinds), kinds)
    assert(SourceRegistry.get("file").contains(FileSource))
    assert(SourceRegistry.get("nope").isEmpty)
  }

  test("custom adapters can be registered (SPI extension point)") {
    object Fake extends SourceAdapter {
      val kind = "zz_fake"; val version = "0.1"; val description = "test"
      def read(s: org.apache.spark.sql.SparkSession, src: SourceSpec,
          f: Option[FormatSpec], from: Option[Timestamp],
          to: Option[Timestamp], progress: String => Unit) = {
        import s.implicits._
        Seq((1, "x")).toDF("a", "b")
      }
    }
    SourceRegistry.register(Fake)
    try {
      assert(SourceRegistry.get("zz_fake").contains(Fake))
      assert(SourceRegistry.get("zz_fake").get
        .read(spark, SourceSpec("zz_fake"), None, None, None).count() == 1)
    } finally SourceRegistry.unregister("zz_fake")
  }

  test("file adapter reads via format + layout") {
    val dir = Files.createTempDirectory("graft_spi").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "d.csv"))
    try { w.println("a|b"); w.println("1|x") } finally w.close()
    val df = FileSource.read(spark,
      SourceSpec("file", paths = Seq(dir.getPath),
        fileLayout = Some("d.csv")),
      Some(FormatSpec("delimited", "t", delimiter = "|")), None, None)
    assert(df.columns.toSeq == Seq("a", "b") && df.count() == 1)
  }

  test("synthetic adapter generates from its spec string") {
    val df = SyntheticSource.read(spark,
      SourceSpec("synthetic", paths = Seq("synthetic_3cols_50rows_10chunk_1ms")),
      None,
      Some(Timestamp.valueOf("2024-01-01 00:00:00")),
      Some(Timestamp.valueOf("2024-01-02 00:00:00")))
    assert(df.count() == 50)
    assert(df.columns.length == 3 + 3)
  }
}
