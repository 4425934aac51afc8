package graft.lake

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class ArtifactsSpec extends AnyFunSuite {

  test("resetManaged wipes exactly the ensure-managed artifact dirs") {
    // a unique fake sfDir keys a private workRoot for this test
    val sfDir = s"/artifacts-spec-${System.nanoTime()}"
    val root = new File(Artifacts.workRoot(sfDir))

    // two ensure-managed artifacts + one plain fixture dir (a qi
    // lake workdir has no manifest and must survive the reset)
    var builds = 0
    assert(Artifacts.ensure(s"$root/tok", "fp-tok") { builds += 1 })
    assert(Artifacts.ensure(s"$root/lm", "fp-lm") { builds += 1 })
    val plain = new File(root, "lake")
    plain.mkdirs()
    Files.write(new File(plain, "data.parquet").toPath,
      "x".getBytes(StandardCharsets.UTF_8))
    // fresh hit: no rebuild
    assert(!Artifacts.ensure(s"$root/tok", "fp-tok") { builds += 1 })
    assert(builds == 2)

    Artifacts.resetManaged(sfDir)
    // managed dirs gone -> the next ensure retrains (Bench's between-
    // run contract: run 2 pays the same training run 1 did)
    assert(!new File(root, "tok").exists)
    assert(!new File(root, "lm").exists)
    assert(new File(plain, "data.parquet").isFile, "plain fixture wiped")
    assert(Artifacts.ensure(s"$root/tok", "fp-tok") { builds += 1 })
    assert(builds == 3)

    // a missing workRoot is a no-op, not an error
    Artifacts.resetManaged(s"/artifacts-spec-none-${System.nanoTime()}")
  }
}
